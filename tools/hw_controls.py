"""Same-hour hardware controls for the north-rule scaling evidence.

The flagship 8->32 efficiency is only interpretable next to the box's own
ceilings measured in the SAME hour (BENCH/BASELINE.md protocol):

- pure-ALU: N independent Python processes running an integer busy loop —
  the turbo/scheduling ceiling (no memory traffic).
- memory streaming: N processes each filling+summing a ~480 MB numpy
  buffer — the shared-memory-bus ceiling.

Prints one JSON line with per-parallelism throughputs and the 8->32 ratio
for both controls.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _alu_worker(dur: float, out):
    t0 = time.time()
    x, n = 1, 0
    while time.time() - t0 < dur:
        for _ in range(100_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 100_000
    out.put(n / (time.time() - t0))


def _mem_worker(dur: float, out):
    import numpy as np

    buf = np.zeros(60_000_000, dtype=np.float64)  # 480 MB
    t0 = time.time()
    passes = 0
    while time.time() - t0 < dur:
        buf.fill(passes)
        _ = float(buf.sum())
        passes += 1
    gb = passes * buf.nbytes * 2 / 1e9  # fill writes + sum reads
    out.put(gb / (time.time() - t0))


def run(worker, n: int, dur: float = 6.0) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(dur, q)) for _ in range(n)]
    for p in ps:
        p.start()
    tot = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return tot


def main():
    res = {}
    for n in (4, 8, 16, 32):
        res[f"alu_{n}"] = round(run(_alu_worker, n) / 1e6, 1)      # M ops/s
    for n in (4, 8, 16, 32):
        res[f"mem_{n}"] = round(run(_mem_worker, n), 1)            # GB/s
    res["alu_8_to_32"] = round(res["alu_32"] / (4 * res["alu_8"]), 3)
    res["mem_8_to_32"] = round(res["mem_32"] / (4 * res["mem_8"]), 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
