#!/usr/bin/env python
"""In-kernel stage attribution for the whole-block Pallas megakernel.

The r03s4 jax.profiler trace shows 98.4% of headline-chain device time
inside the megakernel custom-calls — one opaque event per block, so trace
attribution stops at the kernel boundary. This tool opens the box the
only way Mosaic allows: it re-runs `bench.py` with `MAPDIT_MEGA_SKIP`
(mapdit_tpu/ops/pallas/dit_block.py:_skips) eliding one kernel stage at a
time and attributes in-kernel time from the steps/s deltas.

  python tools/kernel_ablation.py                 # full variant sweep
  python tools/kernel_ablation.py --steps 250 --repeats 2 --variants norm,mlp

Caveats (printed with the table):
  * a skip-variant's saving includes everything Mosaic can DCE behind it
    (e.g. ``attn`` removes the qkv/out GEMMs, not just the core);
  * deltas are serialized-time savings — stages that overlapped the MXU
    pipeline show less than their standalone cost;
  * outputs of skip variants are numerically meaningless; wall time is
    the only signal. One TPU process at a time (axon relay).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# variant -> what the delta vs baseline measures
VARIANTS = {
    "norm": "cosine q/k row-normalize (2 VPU passes over (G*T, D))",
    "softmax": "softmax exp/reduce (logit-scaling stand-in keeps shapes)",
    "attn-core": "norm + logits GEMM + softmax + attn-v GEMM",
    "attn": "whole attention branch (incl. qkv/out GEMMs, modulate, residual)",
    "mlp": "whole MLP branch (fc1/silu/fc2, modulate, residual)",
    "mod": "modulation-head GEMM + one-hot row select",
}


def run_bench(env_extra, steps, repeats, timeout_s):
    env = dict(os.environ, **env_extra)
    proc = subprocess.run(
        [sys.executable, "bench.py", "--steps", str(steps), "--repeats", str(repeats)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout_s,
    )
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"bench produced no JSON (rc={proc.returncode}):\n{proc.stderr[-2000:]}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--variants", type=str, default=",".join(VARIANTS),
                    help="comma-list from: " + ", ".join(VARIANTS))
    ap.add_argument("--timeout-s", type=int, default=1500,
                    help="per-variant bench timeout (first compile is slow)")
    args = ap.parse_args()

    variants = [v for v in args.variants.split(",") if v]
    unknown = [v for v in variants if v not in VARIANTS]
    if unknown:
        ap.error(f"unknown variants {unknown}; choose from {list(VARIANTS)}")

    print(f"# megakernel stage ablation ({args.steps} steps, "
          f"{args.repeats} repeats/variant, sequential)", flush=True)
    base = run_bench({}, args.steps, args.repeats, args.timeout_s)
    base_ms = 1000.0 / base["value"]
    print(f"baseline: {base['value']:.1f} steps/s = {base_ms:.3f} ms/step", flush=True)

    rows = []
    for v in variants:
        r = run_bench({"MAPDIT_MEGA_SKIP": v}, args.steps, args.repeats,
                      args.timeout_s)
        ms = 1000.0 / r["value"]
        rows.append((v, r["value"], ms, base_ms - ms))
        print(f"  skip {v:<10} {r['value']:7.1f} steps/s  "
              f"{ms:.3f} ms/step  saves {base_ms - ms:+.3f} ms", flush=True)

    print("\nstage (saving vs baseline, serialized in-kernel time)")
    print("-" * 72)
    for v, sps, ms, delta in sorted(rows, key=lambda r: -r[3]):
        pct = 100.0 * delta / base_ms
        print(f"{v:<10} {delta:+.3f} ms/step ({pct:+5.1f}%)  -- {VARIANTS[v]}")
    print("\ncaveats: savings include DCE'd producers; overlapped stages "
          "undercount;\nskip outputs are numerically meaningless (timing "
          "probe only).")


if __name__ == "__main__":
    main()
