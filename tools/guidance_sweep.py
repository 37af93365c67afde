"""Guidance-knob arbitration sweep: sample a grid of (cfg_scale,
cfg_interval) protocols and score each against a reference set.

The weights-day playbook for the knobs this framework adds on top of the
reference's fixed cfg_scale (reference `sample_fid.py:30` hardcodes the
CLI value): limited-interval guidance (arXiv 2404.07724) is arbitrated by
FID in the paper, and precision/recall splits the fidelity/diversity
tradeoff that guidance moves. Each grid point runs the real sample_fid.py
CLI in a subprocess (same compiled path users run, shared persistent
compile cache), then scores with tools/fid.py's metric functions.

  python tools/guidance_sweep.py --result-dir results/000-DiT-S-2 \
      --ref-samples ref.npz --cfg-scales 1.5,4.0 \
      --cfg-intervals none,0.3:3.0 --num-samples 512 --steps 20 \
      --sampler dpm++ --time-schedule karras --features inception \
      --out sweep.jsonl

Emits one JSON line per grid point: {"cfg_scale": ..., "cfg_interval":
..., "fid": ..., "kid": ..., "kid_std": ..., "precision": ...,
"recall": ..., "sample_npz": ...}. With --features random-proj the sweep
runs weights-free (pipeline validation; not a perceptual arbitration).
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


def parse_intervals(spec: str):
    """"none,0.3:3.0,0.5:2.0" -> [None, (0.3, 3.0), (0.5, 2.0)]."""
    out = []
    for item in spec.split(","):
        item = item.strip()
        if item in ("none", ""):
            out.append(None)
        else:
            lo, hi = item.split(":")
            out.append((float(lo), float(hi)))
    return out


def run_grid_point(args, cfg_scale, interval, out_npz):
    cmd = [
        sys.executable, os.path.join(REPO, "sample_fid.py"),
        "--result-dir", args.result_dir,
        "--use-vae", "false",
        "--num-samples", str(args.num_samples),
        "--batch-size", str(args.batch_size),
        "--num-sampling-steps", str(args.steps),
        "--sampler", args.sampler,
        "--time-schedule", args.time_schedule,
        "--cfg-scale", str(cfg_scale),
        "--seed", str(args.seed),
        "--output-file", out_npz,
    ]
    if interval is not None:
        cmd += ["--cfg-interval", str(interval[0]), str(interval[1])]
    subprocess.run(cmd, check=True, cwd=REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--result-dir", required=True)
    p.add_argument("--ref-samples", required=True,
                   help="ADM-format npz (arr_0 uint8 NHWC) of the reference "
                        "set every grid point is scored against")
    p.add_argument("--cfg-scales", default="1.5,4.0")
    p.add_argument("--cfg-intervals", default="none,0.3:3.0",
                   help="comma list of none or lo:hi sigma intervals")
    p.add_argument("--num-samples", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--sampler", choices=["ddpm", "ddim", "dpm++", "unipc"], default="dpm++")
    p.add_argument("--time-schedule", choices=["uniform", "karras"], default="karras")
    p.add_argument("--features", choices=["inception", "random-proj"],
                   default="inception")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--work-dir", default=None,
                   help="where the per-point sample npz files land "
                        "(default: alongside --out)")
    p.add_argument("--out", default="sweep.jsonl")
    args = p.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "fid", os.path.join(REPO, "tools", "fid.py")
    )
    fid = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fid)

    work = args.work_dir or (os.path.dirname(os.path.abspath(args.out)) or ".")
    os.makedirs(work, exist_ok=True)

    with np.load(args.ref_samples) as f:
        ref_imgs = f["arr_0"]
    ref_feats = fid.extract_features(ref_imgs, args.features)
    ref_mu, ref_sigma = fid.activation_stats(ref_feats)

    scales = [float(s) for s in args.cfg_scales.split(",")]
    intervals = parse_intervals(args.cfg_intervals)
    rows = []
    with open(args.out, "w") as out_f:
        for cfg_scale in scales:
            for interval in intervals:
                if interval is not None and cfg_scale <= 1.0:
                    continue  # cfg_interval needs CFG
                tag = (
                    f"s{cfg_scale:g}"
                    + (f"_i{interval[0]:g}-{interval[1]:g}" if interval else "")
                )
                npz = os.path.join(work, f"samples_{tag}.npz")
                run_grid_point(args, cfg_scale, interval, npz)
                with np.load(npz) as f:
                    feats = fid.extract_features(f["arr_0"], args.features)
                mu, sigma = fid.activation_stats(feats)
                kid_m, kid_s = fid.kid_score(
                    feats, ref_feats,
                    subset_size=min(1000, len(feats), len(ref_feats)),
                    n_subsets=20,
                )
                prec, rec = fid.precision_recall(ref_feats, feats)
                row = {
                    "cfg_scale": cfg_scale,
                    "cfg_interval": list(interval) if interval else None,
                    "fid": round(fid.frechet_distance(mu, sigma, ref_mu, ref_sigma), 4),
                    "kid": round(kid_m, 6),
                    "kid_std": round(kid_s, 6),
                    "precision": round(prec, 4),
                    "recall": round(rec, 4),
                    "sample_npz": npz,
                }
                rows.append(row)
                out_f.write(json.dumps(row) + "\n")
                out_f.flush()
                print(json.dumps(row))
    best = min(rows, key=lambda r: r["fid"])
    print(f"best by FID: cfg_scale={best['cfg_scale']} "
          f"cfg_interval={best['cfg_interval']} (fid {best['fid']})")


if __name__ == "__main__":
    main()
