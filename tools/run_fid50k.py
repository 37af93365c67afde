"""Drive the full 50k-sample FID protocol weights-free (VERDICT r03 #4).

Runs sample_fid.py at the reference protocol scale
(`/root/reference/sample_fid.py:104-110`: 10k-50k samples, batch 128,
250-step DDPM, CFG 1.5) against a local experiment, recording wall-clock
and peak host RSS (polled from /proc — /usr/bin/time is absent in this
image), then closes the loop with tools/fid.py random-proj stats at 50k.

Usage: python tools/run_fid50k.py --result-dir <exp> [--num-samples 50000]
"""

import argparse
import os
import subprocess
import sys
import threading
import time


def peak_rss_monitor(pid, out):
    peak = 0
    while True:
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM:"):
                        peak = max(peak, int(line.split()[1]))  # kB
        except FileNotFoundError:
            break
        out[0] = peak
        time.sleep(2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--result-dir", required=True)
    p.add_argument("--num-samples", type=int, default=50000)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--output-file", default="samples_50k.npz")
    args = p.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [
        sys.executable, os.path.join(repo, "sample_fid.py"),
        "--result-dir", args.result_dir, "--use-vae", "false",
        "--num-samples", str(args.num_samples),
        "--batch-size", str(args.batch_size),
        "--num-classes", str(args.num_classes),
        "--num-sampling-steps", "250", "--cfg-scale", "1.5",
        "--clip-denoised", "true", "--output-file", args.output_file,
    ]
    t0 = time.time()
    proc = subprocess.Popen(cmd, cwd=repo)
    peak = [0]
    mon = threading.Thread(target=peak_rss_monitor, args=(proc.pid, peak), daemon=True)
    mon.start()
    rc = proc.wait()
    wall = time.time() - t0
    print(f"sample_fid rc={rc} wall={wall:.0f}s peak_rss={peak[0] / 1024:.0f} MB")
    if rc != 0:
        sys.exit(rc)

    npz = os.path.join(args.result_dir, "fid_samples", args.output_file)
    import numpy as np

    with np.load(npz) as f:
        a = f["arr_0"]
    print(f"npz: {a.shape} {a.dtype} size={os.path.getsize(npz) / 2**20:.0f} MB")
    assert a.shape[0] == args.num_samples, a.shape

    fid_tool = os.path.join(repo, "tools", "fid.py")
    subprocess.run(
        [sys.executable, fid_tool, "--make-stats", npz, "--out",
         "/tmp/stats50k.npz", "--features", "random-proj"],
        cwd=repo, check=True,
    )
    subprocess.run(
        [sys.executable, fid_tool, "--samples", npz, "--ref-stats",
         "/tmp/stats50k.npz", "--features", "random-proj"],
        cwd=repo, check=True,
    )
    print(f"fid50k protocol OK: {args.num_samples} samples, {wall:.0f}s, "
          f"{peak[0] / 1024:.0f} MB peak RSS")


if __name__ == "__main__":
    main()
