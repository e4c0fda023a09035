"""Hardware scaling-envelope control: pure-multiprocessing CPU work
(no Spark, no JVM) at two process counts.

A single box is not N independent executors: all-core turbo drops the
per-core clock as more cores engage, and memory bandwidth is shared.
This control measures what ANY perfectly-parallel CPU workload can
achieve at lo→hi processes on this machine, so Spark's measured
scaling efficiency can be read against the hardware ceiling rather
than an idealized 4.0×.

Usage: python tools/hw_envelope.py [lo] [hi]
Prints one JSON line {"lo": .., "hi": .., "thr_lo": .., "thr_hi": ..,
"hw_envelope": speedup/(hi/lo)}.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time


def _burn(n: int) -> int:
    h = b"x"
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return 1


def measure(procs: int, chunk: int = 150_000, chunks_per_proc: int = 16) -> float:
    work = [chunk] * (procs * chunks_per_proc)
    with mp.Pool(procs) as pool:
        pool.map(_burn, [1000] * procs)  # warm
        t0 = time.monotonic()
        pool.map(_burn, work)
        dt = time.monotonic() - t0
    return sum(work) / dt  # md5/sec


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    thr_lo = max(measure(lo) for _ in range(2))
    thr_hi = max(measure(hi) for _ in range(2))
    speedup = thr_hi / thr_lo
    print(json.dumps({
        "lo": lo,
        "hi": hi,
        "thr_lo": round(thr_lo / 1e6, 3),
        "thr_hi": round(thr_hi / 1e6, 3),
        "unit": "M md5/sec",
        "hw_envelope": round(speedup / (hi / lo), 3),
    }))


if __name__ == "__main__":
    main()
