#!/usr/bin/env python3
"""Host-capacity probe: aggregate md5 ops/s across N worker processes.

The sandbox's deliverable CPU drifts +/-40% over minutes (BENCH.md), so
benchmark samples are only comparable when bracketed by this probe.
Reference points measured on this VM (32 workers; the working band, from
BENCH.md section 0d's bracketed samples — round-5 correction: an earlier
13-14.5M figure here was a stale pre-calibration note that never matched
the recorded section-0d samples):
  healthy window  ~55-76M ops/s aggregate
  degraded phase  below ~40M ops/s

Usage: python3 tools/host_probe.py [workers] [seconds]
"""
import hashlib
import multiprocessing as mp
import sys
import time


def burn(seconds: float) -> int:
    deadline = time.monotonic() + seconds
    payload = b"probe" * 16
    n = 0
    while time.monotonic() < deadline:
        for _ in range(1000):
            payload = hashlib.md5(payload).digest()
        n += 1000
    return n


def main() -> None:
    workers = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    t0 = time.monotonic()
    with mp.Pool(workers) as pool:
        counts = pool.map(burn, [seconds] * workers)
    wall = time.monotonic() - t0
    total = sum(counts)
    print(f"[probe] workers={workers} wall={wall:.1f}s "
          f"aggregate={total / wall / 1e6:.2f}M md5 ops/s")


if __name__ == "__main__":
    main()
