#!/usr/bin/env python
"""Per-stage attribution of a bench.py --profile-dir capture.

Parses the trace-viewer json jax.profiler writes (device-track op events,
each carrying `tf_op` — the jax op-name path — plus `source` file:line,
`hlo_category`, `model_flops`, `bytes_accessed`) and prints:

  * a per-model-stage table (attention / mlp / modulation / embedders /
    sampler math / ...), from the tf_op path;
  * a per-hlo-category table (convolution=MXU, fusions, copies, ...);
  * top ops per stage with achieved FLOP/s and bytes/s so
    compute-bound vs bandwidth-bound is visible per line.

Usage:
  python bench.py --profile-dir /tmp/trace ...   # on TPU
  python tools/trace_breakdown.py /tmp/trace

No jax dependency — offline analysis of the trace artifacts.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os

# stage attribution by tf_op / source substrings, first match wins
STAGE_RULES = (
    ("/attn/", "attention"),
    ("qkv", "attention"),
    ("attention", "attention"),
    ("/mlp/", "mlp"),
    ("fc1", "mlp"),
    ("fc2", "mlp"),
    ("/modulation/", "modulation"),
    ("rotate", "modulation"),
    ("t_embedder", "embedders"),
    ("y_embedder", "embedders"),
    ("x_embedder", "patch-embed"),
    ("patchify", "patch-embed"),
    ("final_layer", "final-layer"),
    ("unpatchify", "final-layer"),
    ("DiT", "block-glue"),  # modulate/residual ops between named modules
    ("threefry", "rng"),
    ("random", "rng"),
    ("gaussian.py", "sampler-math"),
    ("dpm_solver.py", "sampler-math"),
    ("runtime.py", "sampler-math"),
    ("while", "sampler-math"),
)

CONTAINER_PREFIXES = ("jit_", "while", "conditional", "region")


def find_trace(trace_dir: str) -> str:
    cands = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    ) or glob.glob(
        os.path.join(trace_dir, "**", "perfetto_trace.json.gz"), recursive=True
    )
    if not cands:
        raise SystemExit(f"no trace json under {trace_dir}")
    return max(cands, key=os.path.getmtime)


def load_events(path: str):
    with gzip.open(path, "rb") as f:
        data = json.loads(f.read())
    return data["traceEvents"] if isinstance(data, dict) else data


def device_pids(events) -> dict:
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev = {pid: n for pid, n in names.items() if "TPU" in n or "/device" in n}
    return dev or names


def classify(name: str, args: dict) -> str:
    hay = " ".join(
        (name, args.get("tf_op", ""), args.get("source", ""))
    )
    for frag, stage in STAGE_RULES:
        if frag in hay:
            return stage
    cat = args.get("hlo_category", "")
    if "conv" in cat or "dot" in name:
        return "gemm-unattributed"
    if "copy" in cat or name.startswith(("copy", "transpose", "reshape")):
        return "data-movement"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=6, help="top ops listed per stage")
    args = ap.parse_args()

    path = find_trace(args.trace_dir)
    events = load_events(path)
    devs = device_pids(events)

    per_stage = collections.defaultdict(float)
    per_cat = collections.defaultdict(float)
    per_op = collections.defaultdict(lambda: [0.0, 0, 0.0, 0.0])  # dur, n, flops, bytes
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in devs:
            continue
        name = e.get("name", "")
        a = e.get("args", {}) or {}
        # container events (the whole jitted program / while loop) nest the
        # leaf ops we count — skip them or everything double-counts
        if name.startswith(CONTAINER_PREFIXES) and "hlo_category" not in a:
            continue
        if name.startswith(("jit_", "while.")) and float(e.get("dur", 0)) > 1e5:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        stage = classify(name, a)
        per_stage[stage] += dur
        per_cat[a.get("hlo_category", "?")] += dur
        rec = per_op[(stage, name)]
        rec[0] += dur
        rec[1] += 1
        rec[2] += float(a.get("model_flops", 0) or 0)
        rec[3] += float(a.get("raw_bytes_accessed", a.get("bytes_accessed", 0)) or 0)
        total += dur

    if total == 0:
        raise SystemExit(f"no device events (tracks: {sorted(devs.values())[:8]})")

    print(f"trace: {path}")
    print(f"device tracks: {sorted(set(devs.values()))}")
    print(f"total device-op time: {total/1e3:.2f} ms\n")

    print(f"{'stage':<22}{'ms':>10}{'%':>8}")
    print("-" * 40)
    for stage, dur in sorted(per_stage.items(), key=lambda kv: -kv[1]):
        print(f"{stage:<22}{dur/1e3:>10.2f}{100*dur/total:>7.1f}%")

    print(f"\n{'hlo_category':<28}{'ms':>10}{'%':>8}")
    print("-" * 46)
    for cat, dur in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:<28}{dur/1e3:>10.2f}{100*dur/total:>7.1f}%")

    print()
    for stage, sdur in sorted(per_stage.items(), key=lambda kv: -kv[1]):
        ops = sorted(
            ((n, rec) for (s, n), rec in per_op.items() if s == stage),
            key=lambda kv: -kv[1][0],
        )[: args.top]
        print(f"[{stage}]  {sdur/1e3:.2f} ms")
        for n, (dur, cnt, flops, byts) in ops:
            tf = flops / (dur * 1e-6) / 1e12 if dur else 0.0  # TFLOP/s
            gb = byts / (dur * 1e-6) / 1e9 if dur else 0.0  # GB/s
            print(
                f"  {dur/1e3:>9.2f} ms x{cnt:<5} {tf:>6.1f} TF/s {gb:>7.0f} GB/s  {n[:70]}"
            )
        print()


if __name__ == "__main__":
    main()
