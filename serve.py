#!/usr/bin/env python
"""Batching HTTP inference server around the compiled sampler.

Beyond-reference production subsystem (the reference has no serving path;
its closest surface is re-running `sample.py` per request, paying model
reload + EMA solve + full recompile every time). Design points, TPU-first:

  * **Compile-once bucket cache**: XLA programs are specialized on static
    shapes, so requests are padded up to a fixed set of batch buckets and
    each (sampler, steps, cfg_scale, bucket) program is compiled once and
    reused. Weights are loaded and EMA-reconstructed once at startup.
  * **One device, one queue**: a lock serializes device execution (XLA
    programs are not reentrant-safe to interleave from threads); HTTP
    threads only pay JSON/PNG work concurrently.
  * Stateless request protocol (class labels + optional seed in, PNG grid
    or ADM-format npz out) so replicas can sit behind any LB.

Endpoints:
  GET  /healthz            -> {"status": "ok", ...model/config info}
  POST /v1/sample          -> image/png grid or application/x-npz
      {"class_labels": [207, 360] | "class_label": 88, "num_samples": 4,
       "steps": 20, "sampler": "ddpm|ddim|dpm++", "cfg_scale": 4.0,
       "seed": 0, "format": "png|npz"}

Example:
  python serve.py --result-dir results/000-DiT-S-2 --port 8000 &
  curl -s -X POST localhost:8000/v1/sample \
       -d '{"class_label": 88, "num_samples": 4, "steps": 20, "sampler": "dpm++"}' \
       -o grid.png
"""

import argparse
import io
import json
import os
import threading
import time

import numpy as np


class SamplerService:
    """Loads a trained experiment once; serves padded-bucket sample calls."""

    def __init__(
        self,
        result_dir: str,
        ckpt=None,
        ema_std: float = 0.05,
        use_vae: bool = False,
        vae_path=None,
        buckets=(1, 4, 8),
        seed: int = 0,
    ):
        import jax

        from mapdit_tpu.utils import load_config
        from mapdit_tpu.utils.experiment import config_from_args
        from sample import load_variables

        self.result_dir = result_dir
        self.train_args = load_config(result_dir)
        self.cfg = config_from_args(self.train_args)
        self.variables = load_variables(result_dir, self.train_args, ckpt, ema_std)
        self.use_vae = use_vae
        self.vae_path = vae_path
        self.buckets = tuple(sorted(set(buckets)))
        self._fns = {}  # (sampler, steps, cfg_scale, bucket) -> sample_fn
        self._device_lock = threading.Lock()
        self._base_key = jax.random.PRNGKey(seed)
        self._request_counter = 0
        self.started = time.time()

    # ------------------------------------------------------------------ #

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(
            f"num_samples {n} exceeds the largest batch bucket {self.buckets[-1]}"
        )

    def _get_fn(
        self, sampler: str, steps: int, cfg_scale: float, bucket: int,
        schedule: str = "uniform",
    ):
        from mapdit_tpu.diffusion import create_diffusion, respacing_string
        from mapdit_tpu.runtime import build_sample_fn

        key = (sampler, steps, float(cfg_scale), bucket, schedule)
        fn = self._fns.get(key)
        if fn is None:
            diffusion = create_diffusion(respacing_string(steps, sampler, schedule))
            fn = build_sample_fn(
                self.cfg,
                self.variables,
                diffusion,
                cfg_scale=cfg_scale if cfg_scale > 1.0 else None,
                sampler=sampler,
            )
            self._fns[key] = fn
        return fn

    def warmup(self, sampler: str, steps: int, cfg_scale: float):
        """Precompile the largest bucket so the first request is fast."""
        self.sample([0] * self.buckets[-1], steps, sampler, cfg_scale, seed=0)

    # ------------------------------------------------------------------ #

    def sample(
        self, class_labels, steps, sampler, cfg_scale, seed=None,
        schedule="uniform",
    ):
        """(labels, protocol) -> float latents/images (n, C, H, W) in [-1, 1]."""
        import jax
        import jax.numpy as jnp

        from sample import decode_latents

        n = len(class_labels)
        bucket = self._bucket(n)
        num_classes = self.cfg.num_classes
        for lab in class_labels:
            if not 0 <= int(lab) < num_classes:
                raise ValueError(f"class label {lab} outside [0, {num_classes})")

        with self._device_lock:
            if seed is None:
                self._request_counter += 1
                key = jax.random.fold_in(self._base_key, self._request_counter)
            else:
                key = jax.random.PRNGKey(int(seed))
            zkey, skey = jax.random.split(key)

            c = self.train_args["in_channels"]
            s = self.train_args["input_size"]
            z = jax.random.normal(zkey, (bucket, c, s, s))
            labels = np.zeros((bucket,), np.int32)
            labels[:n] = np.asarray(class_labels, np.int32)
            use_cfg = cfg_scale > 1.0
            if use_cfg:
                # reference CFG batch contract: [z; z], [labels; null]
                z = jnp.concatenate([z, z], axis=0)
                y = jnp.concatenate(
                    [jnp.asarray(labels), jnp.full((bucket,), num_classes, jnp.int32)]
                )
            else:
                y = jnp.asarray(labels)
            fn = self._get_fn(sampler, steps, cfg_scale, bucket, schedule)
            out = np.asarray(fn(z, y, skey))[:n]

        return decode_latents(out, self.train_args, self.use_vae, self.vae_path)

    def info(self) -> dict:
        return {
            "status": "ok",
            "model": self.train_args.get("model"),
            "num_classes": self.cfg.num_classes,
            "input_size": self.train_args["input_size"],
            "in_channels": self.train_args["in_channels"],
            "buckets": list(self.buckets),
            "compiled_programs": len(self._fns),
            "uptime_s": round(time.time() - self.started, 1),
            "decode": "vae" if self.use_vae else "latent",
        }


def make_handler(service: SamplerService, defaults: dict):
    from http.server import BaseHTTPRequestHandler

    from mapdit_tpu.utils.image import save_image_grid, to_uint8

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _bytes(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/healthz", "/info"):
                self._json(200, service.info())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/v1/sample":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                labels = req.get("class_labels")
                if labels is None:
                    labels = [int(req.get("class_label", 0))] * int(
                        req.get("num_samples", 1)
                    )
                steps = int(req.get("steps", defaults["steps"]))
                sampler = req.get("sampler", defaults["sampler"])
                if sampler not in ("ddpm", "ddim", "dpm++"):
                    raise ValueError(f"unknown sampler {sampler!r}")
                if not 1 <= steps <= 1000:
                    raise ValueError("steps must be in [1, 1000]")
                cfg_scale = float(req.get("cfg_scale", defaults["cfg_scale"]))
                schedule = req.get("schedule", "uniform")
                if schedule not in ("uniform", "karras"):
                    raise ValueError(f"unknown schedule {schedule!r}")
                fmt = req.get("format", "png")
                samples = service.sample(
                    labels, steps, sampler, cfg_scale, seed=req.get("seed"),
                    schedule=schedule,
                )
            except ValueError as e:
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — surface as a 500, keep serving
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return

            buf = io.BytesIO()
            if fmt == "npz":
                # ADM evaluator format, like sample_fid.py (arr_0 uint8 NHWC)
                np.savez(buf, arr_0=to_uint8(samples))
                self._bytes(200, buf.getvalue(), "application/x-npz")
            else:
                nrow = int(np.ceil(np.sqrt(len(samples))))
                save_image_grid(samples, buf, nrow=max(1, nrow), format="PNG")
                self._bytes(200, buf.getvalue(), "image/png")

        def log_message(self, fmt, *args):  # route through stdout, one line
            print(f"[serve] {self.address_string()} {fmt % args}", flush=True)

    return Handler


def main(args):
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_compilation")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from http.server import ThreadingHTTPServer

    service = SamplerService(
        args.result_dir,
        ckpt=args.ckpt,
        ema_std=args.ema_std,
        use_vae=args.use_vae,
        vae_path=args.vae_path,
        buckets=tuple(int(b) for b in args.buckets.split(",")),
        seed=args.seed,
    )
    defaults = {
        "steps": args.default_steps,
        "sampler": args.default_sampler,
        "cfg_scale": args.default_cfg_scale,
    }
    if args.warmup:
        t0 = time.time()
        service.warmup(defaults["sampler"], defaults["steps"], defaults["cfg_scale"])
        print(f"[serve] warmup compile done in {time.time() - t0:.1f}s", flush=True)

    server = ThreadingHTTPServer((args.host, args.port), make_handler(service, defaults))
    print(
        f"[serve] listening on http://{args.host}:{server.server_address[1]} "
        f"({service.info()['model']}, decode={service.info()['decode']})",
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result-dir", type=str, required=True)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000, help="0 = ephemeral")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--ema-std", type=float, default=0.05)
    parser.add_argument("--use-vae", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=False, metavar="BOOL")
    parser.add_argument("--vae-path", type=str, default=None)
    parser.add_argument("--buckets", type=str, default="1,4,8",
                        help="batch buckets; requests pad to the next bucket "
                             "so every (sampler, steps, bucket) compiles once")
    parser.add_argument("--default-steps", type=int, default=20)
    parser.add_argument("--default-sampler", choices=["ddpm", "ddim", "dpm++"],
                        default="dpm++")
    parser.add_argument("--default-cfg-scale", type=float, default=4.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--warmup", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=True, metavar="BOOL")
    main(parser.parse_args())
