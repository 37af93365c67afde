"""In-process relay-health probe (VERDICT r04 #5).

The axon tunnel's per-dispatch latency fluctuated ~10x intra-day in r04
(BENCH_NOTES "Relay degradation + recovery": warm bucket-1 chain calls
37-46 ms -> 250-430 ms, recovered after ~20 min idle). Any wall-clock row
measured in such a window is attributable to relay state, not code — so
every recorded row must carry probe evidence, and ±5% A/B claims are only
admissible between two healthy-window probes.

The probe is the sync round-trip of a tiny jitted op (8x128 add): it
costs microseconds on-device, so its wall time IS the dispatch+fetch
overhead ("F" in the perf-probe decomposition — 12-31 ms on a healthy
tunnel, sub-ms on a direct-attached host).
"""

from __future__ import annotations

import os
import time

# Healthy ceiling for the tiny-op round-trip, in ms. Healthy-tunnel
# sessions measure 10-40 ms (BENCH_NOTES r03/r04); degraded windows are
# 100-500 ms. 60 ms splits the two observed bands with margin on both
# sides. Direct-attached hosts measure sub-ms and always pass.
DEFAULT_HEALTHY_MS = 60.0


# Healthy floor for the bulk device_get leg, in MB/s. The tunnel's bulk
# path runs ~5 MB/s healthy; the r05 wedge class (big transfers hang
# INDEFINITELY while tiny ops stay sub-ms — observed twice: an initial
# state upload and a mid-run EMA fetch, both futex-parked forever) makes
# ANY finite measurement pass, so the real protection is the timeout via
# the caller's `timeout` on the probe process. 0.5 MB/s flags the
# merely-degraded band.
DEFAULT_BULK_MIN_MBS = 0.5


def probe_relay(
    n: int = 7, healthy_ms: float | None = None, bulk_mb: float = 4.0
) -> dict:
    """Measure the per-dispatch round-trip AND the bulk-fetch bandwidth;
    return stats + health verdict.

    Two legs because the r05 wedge taught us they fail independently:
    tiny-op dispatch stayed at 0.1-0.25 ms while ~100 MB transfers hung
    forever. ``bulk_mb`` sizes the device_get leg (4 MB ≈ 1 s on a
    healthy 5 MB/s tunnel; sub-ms direct-attached); 0 disables it.

    Returns a dict designed to be embedded verbatim into bench rows:
    {p50_ms, p90_ms, min_ms, max_ms, n, healthy_ms, bulk_mb_s, healthy,
    platform}.
    """
    import jax
    import jax.numpy as jnp

    if healthy_ms is None:
        healthy_ms = float(
            os.environ.get("MAPDIT_RELAY_HEALTHY_MS", DEFAULT_HEALTHY_MS)
        )
    platform = jax.devices()[0].platform
    tiny = jax.jit(lambda a, s: a + s)
    tz = jnp.zeros((8, 128))
    tiny(tz, jnp.float32(0)).block_until_ready()  # compile outside the window
    rtts = []
    for i in range(max(n, 3)):
        # varying operand: a repeated identical call can be served from a
        # result cache on some relay paths (measured 0.02 ms "round-trips"
        # with a constant input — physically impossible through a tunnel)
        t0 = time.perf_counter()
        tiny(tz, jnp.float32(i + 1)).block_until_ready()
        rtts.append((time.perf_counter() - t0) * 1000.0)
    rtts.sort()
    k = len(rtts)
    stats = {
        "p50_ms": round(rtts[k // 2], 2),
        # index on k-1: int(k*0.9) equals k-1 for all k <= 10, which
        # would report max-of-n as "p90" at the default n=7 (r05 review)
        "p90_ms": round(rtts[min(k - 1, round((k - 1) * 0.9))], 2),
        "min_ms": round(rtts[0], 2),
        "max_ms": round(rtts[-1], 2),
        "n": k,
        "healthy_ms": healthy_ms,
        "platform": platform,
    }
    # p50, not max: a single GC/OS hiccup must not flag a healthy window,
    # but a degraded relay shifts the whole distribution (r04 evidence).
    stats["healthy"] = stats["p50_ms"] <= healthy_ms

    if bulk_mb and bulk_mb > 0:
        elems = int(bulk_mb * 2**20 // 4)
        rows = max(1, elems // 128)
        fill = jax.jit(lambda s: jnp.full((rows, 128), s, jnp.float32))
        arr = fill(jnp.float32(1.0))
        arr.block_until_ready()
        t0 = time.perf_counter()
        host = jax.device_get(arr)
        dt = time.perf_counter() - t0
        mbs = (host.nbytes / 2**20) / max(dt, 1e-9)
        stats["bulk_mb"] = round(host.nbytes / 2**20, 2)
        stats["bulk_mb_s"] = round(mbs, 2)
        min_mbs = float(
            os.environ.get("MAPDIT_RELAY_BULK_MIN_MBS", DEFAULT_BULK_MIN_MBS)
        )
        stats["healthy"] = stats["healthy"] and mbs >= min_mbs
    return stats


def main():
    import argparse
    import json

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=7)
    p.add_argument("--healthy-ms", type=float, default=None)
    p.add_argument("--watch", type=float, default=None, metavar="SECONDS",
                   help="repeat the probe every SECONDS, printing one JSON "
                        "line each time, until interrupted")
    args = p.parse_args()
    while True:
        row = probe_relay(args.n, args.healthy_ms)
        row["t"] = round(time.time(), 1)
        print(json.dumps(row), flush=True)
        if args.watch is None:
            return 0 if row["healthy"] else 3
        time.sleep(args.watch)


if __name__ == "__main__":
    raise SystemExit(main())
