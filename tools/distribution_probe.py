"""Distribution-recovery probe: end-to-end learning validation, no gated weights.

The reference's whole arbitration surface is FID on trained ImageNet weights
(/root/reference/sample_fid.py:104-110) — weights/network-gated here. This
probe is the in-environment stand-in: train a DiT on a fabricated
class-conditional Gaussian latent dataset whose moments are KNOWN, sample
from the trained checkpoint, and verify the sampler reproduces the per-class
moments. FID measures distribution match on Inception features; this
measures it directly on an analytically known distribution — validating the
entire learning loop (data pipeline -> q_sample/training_losses ->
Adam/EMA/weight-projection -> checkpointing -> the jitted sampling chain ->
label conditioning) against ground truth, with the untrained init as the
null baseline.

Stages (independently skippable for iteration):

  python tools/distribution_probe.py --work-dir /tmp/dprobe \
      --model DiT-XS/8 --classes 8 --examples 4096 --train-steps 600 \
      --batch-size 64 --sampler dpm++ --num-sampling-steps 25

prints ONE JSON line with per-class mean error (relative L2 of the sampled
class-mean channel vector vs truth), total-std ratio, and nearest-center
label accuracy (chance = 1/K), each for {trained, init}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mapdit_tpu.utils.experiment import percentile_arg  # noqa: E402


# ----------------------------------------------------------------- dataset


def make_data(
    out_dir: str,
    classes: int,
    examples: int,
    input_size: int,
    channels: int = 4,
    center_scale: float = 1.0,
    within_std: float = 0.3,
    seed: int = 0,
) -> dict:
    """Write a MoG posterior dataset (native artifact family, the exact
    layout train.py consumes) + ground_truth.npz.

    Per class c: center m_c ~ center_scale * N(0, I) per CHANNEL (constant
    over space, so the class signal survives spatial averaging);
    posterior mean = m_c + within_std * N(0, I) per pixel; posterior std
    ~ U[0.1, 0.15] per pixel. True latent law per class is therefore
    N(m_c, (within_std^2 + E[std^2]) I) — same construction as
    training.data.SyntheticLatentDataset, but with the truth exported.
    """
    from mapdit_tpu.training.data import save_dataset

    rng = np.random.default_rng(seed)
    labels = rng.integers(0, classes, examples).astype(np.int64)
    counts = np.bincount(labels, minlength=classes)
    assert (counts > 0).all(), (
        f"class(es) {np.nonzero(counts == 0)[0].tolist()} drew zero examples "
        f"({examples} examples over {classes} classes) — per-class ground-truth "
        "means would be NaN; raise --examples"
    )
    centers = (center_scale * rng.normal(size=(classes, channels, 1, 1))).astype(
        np.float32
    )
    means = (
        centers[labels]
        + within_std * rng.normal(size=(examples, channels, input_size, input_size))
    ).astype(np.float32)
    stds = (0.1 + 0.05 * rng.random(means.shape)).astype(np.float32)

    mean = means.mean(axis=(0, 2, 3))
    var = (stds**2).mean(axis=(0, 2, 3)) + (
        (means - mean[None, :, None, None]) ** 2
    ).mean(axis=(0, 2, 3))
    save_dataset(out_dir, means, stds, labels, {"mean": mean, "std": np.sqrt(var)})

    # Finite-sample empirical truth (what the model actually saw): per-class
    # channel mean of the latent law (posterior eps has zero mean, so the
    # posterior means average to it) and the total per-class std.
    emp_means = np.stack(
        [means[labels == c].mean(axis=(0, 2, 3)) for c in range(classes)]
    )
    total_var = within_std**2 + float((stds**2).mean())
    gt = {
        "class_means": emp_means,  # (K, C)
        "total_std": np.float32(np.sqrt(total_var)),
        "centers": centers[:, :, 0, 0],  # (K, C) analytic
    }
    np.savez(os.path.join(out_dir, "ground_truth.npz"), **gt)
    return gt


# ------------------------------------------------------------------- train


def run_train(args, data_dir: str, results_dir: str) -> str:
    cmd = [
        sys.executable,
        os.path.join(REPO, "train.py"),
        "--data-path", data_dir,
        "--results-dir", results_dir,
        "--model", args.model,
        "--num-classes", str(args.classes),
        "--num-steps", str(args.train_steps),
        "--batch-size", str(args.batch_size),
        "--seed", str(args.seed),
        "--log-every", str(max(1, args.train_steps // 10)),
        "--ckpt-every", str(args.train_steps),
        # the train.py default (num_steps//250, ref parity) would snapshot
        # every 2 steps at probe budgets and dominate wall time
        "--ema-snapshot-every", str(max(1, args.train_steps // 20)),
        "--compute-dtype", args.compute_dtype,
    ]
    if args.train_args:
        cmd += args.train_args.split()
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=args.train_timeout
    )
    if proc.returncode != 0:
        raise SystemExit(f"train.py failed:\n{proc.stdout}\n{proc.stderr}")
    runs = sorted(os.listdir(results_dir))
    return os.path.join(results_dir, runs[-1])


# ---------------------------------------------------------------- evaluate


def draw_samples(
    variables,
    train_args: dict,
    samples_per_class: int,
    sampler: str,
    num_sampling_steps: int,
    time_schedule: str,
    seed: int,
    batch_hint_cap: int = 1024,
    cache_interval: int = 0,
    # 'hold' on purpose (serve.py defaults to 'forecast'): this probe's grid
    # passes cache_mode explicitly per row to A/B both modes against the
    # same exact chain — the function default never decides a measurement.
    cache_mode: str = "hold",
    cfg_scale=None,
    cfg_interval=None,
    dynamic_threshold=None,
    pit=None,
) -> np.ndarray:
    """Run the jitted sampling chain; returns denormalized latents (K,M,C,S,S).

    Identical (z, y, chain-key) across every config at a given seed, so
    same-family configs are chain-comparable (ddpm shares the RNG stream)."""
    import jax
    import jax.numpy as jnp

    from mapdit_tpu.diffusion import create_diffusion, respacing_string
    from mapdit_tpu.runtime import build_cached_sample_fn, build_sample_fn
    from mapdit_tpu.utils.experiment import config_from_args
    from sample import decode_latents

    cfg = config_from_args(train_args)
    K = int(train_args["num_classes"])
    M = samples_per_class
    N = K * M
    if train_args.get("distill_rounds"):
        # distilled student (distill.py): only valid on its own nested DDIM
        # grid; guidance (if any) is baked so no CFG doubling
        from mapdit_tpu.diffusion.distill import student_diffusion_from_config

        assert cache_interval <= 1 and pit is None and cfg_interval is None, (
            "accelerator grid does not apply to distilled students"
        )
        diffusion = student_diffusion_from_config(train_args)
        sampler = "ddim"
        if train_args.get("distill_cfg_scale", 1.0) > 1.0:
            cfg_scale = None
    else:
        diffusion = create_diffusion(
            respacing_string(num_sampling_steps, sampler, time_schedule)
        )
    if pit is not None:
        # parallel-in-time Picard chain (runtime.build_pit_sample_fn):
        # pit=(window, sweeps_or_None, shift_or_None), ddim only
        from mapdit_tpu.runtime import build_pit_sample_fn

        window, sweeps, shift = pit
        sample_fn = build_pit_sample_fn(
            cfg,
            variables,
            diffusion,
            cfg_scale=cfg_scale,
            window=window,
            sweeps=sweeps or 2,
            shift=shift,
            dynamic_threshold=dynamic_threshold,
        )
    elif cache_interval > 1:
        sample_fn = build_cached_sample_fn(
            cfg,
            variables,
            diffusion,
            cfg_scale=cfg_scale,
            sampler=sampler,
            cache_interval=cache_interval,
            cache_mode=cache_mode,
            cfg_interval=cfg_interval,
            dynamic_threshold=dynamic_threshold,
        )
    else:
        sample_fn = build_sample_fn(
            cfg,
            variables,
            diffusion,
            cfg_scale=cfg_scale,
            sampler=sampler,
            batch_hint=min(N, batch_hint_cap),
            cfg_interval=cfg_interval,
            dynamic_threshold=dynamic_threshold,
        )
    key = jax.random.PRNGKey(seed)
    zkey, skey = jax.random.split(key)
    C, S = int(train_args["in_channels"]), int(train_args["input_size"])
    z = jax.random.normal(zkey, (N, C, S, S))
    y = jnp.repeat(jnp.arange(K, dtype=jnp.int32), M)
    if cfg_scale is not None:
        # reference-shaped CFG batch [z; z] / [y; null] (sample.py:148-153)
        z = jnp.concatenate([z, z], axis=0)
        y = jnp.concatenate([y, jnp.full((N,), cfg.num_classes, jnp.int32)])
    samples = np.asarray(sample_fn(z, y, skey))[:N]
    # clip=False: metrics run on RAW latents — the [-1,1] image clamp
    # truncates any law with mass outside the box and silently corrupts
    # moment/assignment metrics (found the hard way; see decode_latents)
    latents = decode_latents(
        samples, train_args, use_vae=False, vae_path=None, clip=False
    )
    return latents.reshape(K, M, C, S, S)


def dist_metrics(latents: np.ndarray, gt: dict) -> dict:
    """Moment-recovery metrics of (K,M,C,S,S) latents vs ground truth."""
    finite_frac = float(np.isfinite(latents).all(axis=(2, 3, 4)).mean())
    true_means = np.asarray(gt["class_means"], np.float32)  # (K, C)
    true_std = float(gt["total_std"])
    got_means = latents.mean(axis=(1, 3, 4))  # (K, C)
    mean_err = float(
        np.linalg.norm(got_means - true_means, axis=1).mean()
        / np.linalg.norm(true_means, axis=1).mean()
    )
    # total std around the class mean, pooled over classes
    centered = latents - got_means[:, None, :, None, None]
    std_ratio = float(centered.std() / true_std)
    # nearest-center assignment of each sample's channel-mean vector
    feats = latents.mean(axis=(3, 4))  # (K, M, C)
    d2 = ((feats[:, :, None, :] - true_means[None, None, :, :]) ** 2).sum(-1)
    assigned = d2.argmin(-1)  # (K, M)
    K = latents.shape[0]
    label_acc = float((assigned == np.arange(K)[:, None]).mean())
    out = {"mean_err": mean_err, "std_ratio": std_ratio, "label_acc": label_acc}
    if finite_frac < 1.0:
        out["finite_frac"] = finite_frac
    return out


def evaluate(variables, train_args: dict, gt: dict, **draw_kwargs) -> dict:
    return dist_metrics(draw_samples(variables, train_args, **draw_kwargs), gt)


# ----------------------------------------------------------- law analysis


def conditioning_signal(
    gt: dict,
    within_std: float,
    input_size: int,
    n: int = 512,
    t_stride: int = 50,
    seed: int = 7,
) -> dict:
    """Monte-Carlo the MAX extractable label-conditioning signal of the law:
    the eps-MSE gap between the optimal conditional and optimal marginal
    denoisers, per timestep (uniform-t mean = its weight in the training
    loss).

    Measured finding (r03s7 + r03s8 sweep, BENCH_NOTES): the uniform-t
    signal is pinned at ~0.13-0.19 x ln(K)/D for EVERY (center_scale,
    within_std) pairing — an information bound, not a tuning artifact: the
    t-integral of the conditional-vs-marginal MSE gap is capped by the
    label information I(x0; y) <= ln K spread over D = C*S^2 per-dim loss
    units (I-MMSE). No MoG parameterization escapes; only the DIMENSION
    moves it (S=16 -> 8 measures the predicted ~4x). At the default S=16,
    K=8 law the ceiling is ~3e-4 of the O(1) eps loss, so label_acc ~
    chance after training is the EXPECTED outcome of a correct
    implementation there; shrink --input-size (and/or raise --classes) to
    raise the ceiling — the r03s8 positive control reruns the same law at
    S=8 (results in BENCH_NOTES). (Natural
    image latents live at the other end of the bound: K=1000 classes whose
    information concentrates in far fewer effective dimensions.)
    """
    from mapdit_tpu.diffusion import create_diffusion

    acp_tab = np.asarray(create_diffusion("").alphas_cumprod)
    # normalized law, as the training pipeline sees it
    m = np.asarray(gt["class_means"], np.float64)
    k, c = m.shape
    pooled = np.sqrt(within_std**2 + m.var(axis=0).mean())
    # within_std here should be the TOTAL per-class std (incl. posterior draw)
    m = m / pooled
    s = within_std / pooled
    rng = np.random.default_rng(seed)
    S = input_size
    tg = np.arange(0, 1000, t_stride)
    gaps = []
    for t in tg:
        acp = float(acp_tab[t])
        y = rng.integers(0, k, n)
        x0 = m[y][:, :, None, None] + s * rng.normal(size=(n, c, S, S))
        xt = np.sqrt(acp) * x0 + np.sqrt(1 - acp) * rng.normal(size=(n, c, S, S))
        v = acp * s**2 + (1 - acp)
        post_c = (np.sqrt(acp) * s**2 * xt + (1 - acp) * m[y][:, :, None, None]) / v
        mm = m[:, None, :, None, None]
        d = xt[None] - np.sqrt(acp) * mm
        ll = -0.5 * (d**2).sum(axis=(2, 3, 4)) / v
        ll -= ll.max(axis=0, keepdims=True)
        w = np.exp(ll)
        w /= w.sum(axis=0, keepdims=True)
        post_m = (
            w[:, :, None, None, None]
            * (np.sqrt(acp) * s**2 * xt[None] + (1 - acp) * mm)
            / v
        ).sum(axis=0)
        gaps.append(acp / (1 - acp) * float(((post_c - post_m) ** 2).mean()))
    gaps = np.asarray(gaps)
    i = int(gaps.argmax())
    return {
        "uniform_t_mean": float(gaps.mean()),
        "max": float(gaps.max()),
        "argmax_t": int(tg[i]),
    }


# -------------------------------------------------------- accelerator grid


def rel_l2(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def finite_json(obj):
    """NaN/Infinity are not valid JSON; divergent chains (the runs this probe
    exists to diagnose) produce them — map to None so the one-line output
    stays parseable by strict consumers (jq, json.loads(allow_nan=False))."""
    if isinstance(obj, float):
        return obj if np.isfinite(obj) else None
    if isinstance(obj, dict):
        return {k: finite_json(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [finite_json(v) for v in obj]
    return obj


def run_grid(variables, train_args: dict, gt: dict, args) -> list:
    """Arbitrate the lossy/few-step accelerators on TRAINED weights.

    Every fidelity number recorded so far (BENCH_NOTES span-cache tables)
    was measured on random-init weights because trained weights were
    gated; this reruns the arbitration where it matters. Per config:
    distribution-recovery metrics vs ground truth AND final-sample rel-L2
    vs the exact chain of the same family at the same (z, y, key).
    """
    rows = []
    exact_by_family = {}
    # (family, label, sampler, steps, schedule, k, mode, cfg_scale, cfg_interval)
    # exact chains (k=0, no interval) must precede their family's variants
    grid = [
        ("ddpm250", "ddpm:250", "ddpm", 250, "uniform", 0, "hold", None, None),
        ("ddpm250", "ddpm:250:k2-hold", "ddpm", 250, "uniform", 2, "hold", None, None),
        ("ddpm250", "ddpm:250:k2-forecast", "ddpm", 250, "uniform", 2, "forecast", None, None),
        ("ddpm250", "ddpm:250:k5-hold", "ddpm", 250, "uniform", 5, "hold", None, None),
        ("ddpm250", "ddpm:250:k5-forecast", "ddpm", 250, "uniform", 5, "forecast", None, None),
        ("dpm20", "dpm++:20:karras", "dpm++", 20, "karras", 0, "hold", None, None),
        ("dpm20", "dpm++:20:karras:k2-hold", "dpm++", 20, "karras", 2, "hold", None, None),
        ("dpm20", "dpm++:20:karras:k2-forecast", "dpm++", 20, "karras", 2, "forecast", None, None),
        ("dpm10", "dpm++:10:karras", "dpm++", 10, "karras", 0, "hold", None, None),
        # guidance family: sharpening (std_ratio < 1, label_acc up) is the
        # EXPECTED deviation from the data law; arbitration is cfg-interval
        # vs the full-CFG chain of the same scale
        ("cfg4", "dpm++:20:karras:cfg4", "dpm++", 20, "karras", 0, "hold", 4.0, None),
        ("cfg4", "dpm++:20:karras:cfg4:interval", "dpm++", 20, "karras", 0, "hold", 4.0, (0.3, 3.0)),
        ("cfg1.5", "ddpm:250:cfg1.5", "ddpm", 250, "uniform", 0, "hold", 1.5, None),
        ("cfg1.5", "ddpm:250:cfg1.5:interval", "ddpm", 250, "uniform", 0, "hold", 1.5, (0.3, 3.0)),
    ]
    # parallel-in-time family (ddim; pit=(window, sweeps, shift)) — the
    # multi-chip latency axis, arbitrated on the same trained weights
    grid += [
        ("ddim50", "ddim:50", "ddim", 50, "uniform", 0, "hold", None, None, None),
        ("ddim50", "ddim:50:pit-slide-K10-S2", "ddim", 50, "uniform", 0, "hold", None, None, (10, None, 2)),
        ("ddim50", "ddim:50:pit-block-K10-J5", "ddim", 50, "uniform", 0, "hold", None, None, (10, 5, None)),
    ]
    for family, label, sampler, steps, schedule, k, mode, scale, interval, *pit in grid:
        latents = draw_samples(
            variables,
            train_args,
            samples_per_class=args.samples_per_class,
            sampler=sampler,
            num_sampling_steps=steps,
            time_schedule=schedule,
            seed=args.seed + 1,
            cache_interval=k,
            cache_mode=mode,
            cfg_scale=scale,
            cfg_interval=interval,
            dynamic_threshold=args.dynamic_threshold,
            pit=pit[0] if pit else None,
        )
        row = {"config": label, **dist_metrics(latents, gt)}
        if k == 0 and interval is None and not (pit and pit[0]):
            exact_by_family[family] = latents
        else:
            row["rel_l2_vs_exact"] = rel_l2(latents, exact_by_family[family])
        rows.append(row)
        print(json.dumps(finite_json(row)), flush=True)
    return rows


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work-dir", required=True,
                   help="holds data/ and results/; reused across stages")
    p.add_argument("--model", default="DiT-XS/8")
    p.add_argument("--classes", type=int, default=8)
    p.add_argument("--examples", type=int, default=4096)
    p.add_argument("--input-size", type=int, default=16)
    p.add_argument("--center-scale", type=float, default=1.0)
    p.add_argument("--within-std", type=float, default=0.3)
    p.add_argument("--train-steps", type=int, default=600)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--train-args", default=None,
                   help="extra flags passed through to train.py, one string")
    p.add_argument("--train-timeout", type=int, default=3600)
    p.add_argument("--sampler", default="dpm++", choices=["ddpm", "ddim", "dpm++", "unipc"])
    p.add_argument("--num-sampling-steps", type=int, default=25)
    p.add_argument("--time-schedule", default="karras",
                   choices=["uniform", "karras"])
    p.add_argument("--samples-per-class", type=int, default=128)
    p.add_argument("--ema-std", type=float, default=None,
                   help="evaluate the post-hoc EMA at this std instead of the raw final checkpoint")
    p.add_argument("--dynamic-threshold", type=percentile_arg, default=None,
                   help="Imagen dynamic thresholding percentile for every "
                        "evaluation chain (stabilizes divergent chains)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip-train", action="store_true",
                   help="reuse the existing run in work-dir/results")
    p.add_argument("--eval-dir", type=str, default=None,
                   help="evaluate THIS experiment dir (e.g. a distill.py "
                        "stage) against work-dir's ground truth instead of "
                        "the probe's own trained run (implies --skip-train)")
    p.add_argument("--skip-init-baseline", action="store_true")
    p.add_argument("--grid", action="store_true",
                   help="also arbitrate the lossy/few-step accelerator grid "
                        "(span cache hold/forecast, few-step dpm++) on the "
                        "trained weights — one JSON row per config")
    args = p.parse_args()

    from mapdit_tpu.utils.backend_guard import fail_fast_on_dead_backend
    from mapdit_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    data_dir = os.path.join(args.work_dir, "data")
    results_dir = os.path.join(args.work_dir, "results")
    gt_path = os.path.join(data_dir, "ground_truth.npz")
    if args.eval_dir:
        args.skip_train = True
    if os.path.exists(gt_path) and args.skip_train:
        gt = dict(np.load(gt_path))
    else:
        gt = make_data(
            data_dir, args.classes, args.examples, args.input_size,
            center_scale=args.center_scale, within_std=args.within_std,
            seed=args.seed,
        )

    if args.eval_dir:
        run_dir = args.eval_dir
    elif args.skip_train:
        run_dir = os.path.join(results_dir, sorted(os.listdir(results_dir))[-1])
    else:
        run_dir = run_train(args, data_dir, results_dir)

    # Attach to the accelerator only AFTER train.py (its own process) has
    # released it — never two live TPU processes (axon relay can wedge).
    fail_fast_on_dead_backend(label="distribution_probe")

    from mapdit_tpu.training.checkpoint import latest_checkpoint
    from mapdit_tpu.utils.experiment import config_from_args, load_config
    from sample import load_variables

    train_args = load_config(run_dir)
    if args.ema_std is not None:
        variables = load_variables(run_dir, train_args, ema_std=args.ema_std)
    else:
        # the reused run's actual final checkpoint, not this invocation's
        # --train-steps (they differ under --skip-train)
        ckpt_path = latest_checkpoint(run_dir)
        assert ckpt_path, f"no checkpoint under {run_dir}"
        variables = load_variables(
            run_dir, train_args,
            ckpt=os.path.splitext(os.path.basename(ckpt_path))[0],
        )

    eval_kwargs = dict(
        samples_per_class=args.samples_per_class,
        sampler=args.sampler,
        num_sampling_steps=args.num_sampling_steps,
        time_schedule=args.time_schedule,
        seed=args.seed + 1,
        dynamic_threshold=args.dynamic_threshold,
    )
    trained = evaluate(variables, train_args, gt, **eval_kwargs)

    init = {}
    if not args.skip_init_baseline:
        from mapdit_tpu.models.dit import init_model

        _, init_vars = init_model(config_from_args(train_args), seed=args.seed + 2)
        init = evaluate(init_vars, train_args, gt, **eval_kwargs)

    out = {
        "metric": "distribution_recovery",
        "model": args.model,
        "classes": args.classes,
        "train_steps": args.train_steps,
        "batch_size": args.batch_size,
        "sampler": (
            f"distilled-ddim:{train_args['distill_num_steps']}"
            if train_args.get("distill_rounds")
            else f"{args.sampler}:{args.num_sampling_steps}:{args.time_schedule}"
        ),
        "samples_per_class": args.samples_per_class,
        "chance_acc": 1.0 / args.classes,
        "mean_err_trained": trained["mean_err"],
        "std_ratio_trained": trained["std_ratio"],
        "label_acc_trained": trained["label_acc"],
        **{f"{k}_init": v for k, v in init.items()},
        # how much conditioning the law can even express (see the docstring:
        # ~<=1e-3 for every MoG law => label_acc ~ chance is expected)
        "conditioning_signal": conditioning_signal(
            gt, float(gt["total_std"]), args.input_size
        ),
        "run_dir": run_dir,
    }
    if args.grid:
        out["grid"] = run_grid(variables, train_args, gt, args)
    print(json.dumps(finite_json(out)))


if __name__ == "__main__":
    main()
