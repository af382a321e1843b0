"""Host throttle probe: measures sustained multi-core throughput vs a
single-thread baseline. The sandbox host caps SUSTAINED multi-core load
(burst capacity is full-width) — scaling evidence is only valid when this
probe reports near-linear sustained capacity (see NOTES.md item 10).

Usage: python tools/throttle_probe.py [seconds_per_level]
Prints one JSON line: {"t1": tasks/s at 1 proc, "t16": tasks/s at 16,
"sustained_ratio": t16/(16*t1)} — ratio ~1.0 means unthrottled.
"""

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def work(dur):
    a = np.random.default_rng(1).standard_normal(200_000)
    kern = np.ones(91) / 91
    t_end = time.time() + dur
    n = 0
    while time.time() < t_end:
        np.convolve(a, kern, mode="valid")
        n += 1
    return n


def level(procs, dur):
    t0 = time.time()
    with mp.Pool(procs) as p:
        counts = p.map(work, [dur] * procs)
    wall = time.time() - t0
    return sum(counts) / wall


def probe(dur: float = 8.0) -> dict:
    """One probe sample: single-proc and 16-proc sustained task rates plus
    their ratio (~1.0 on an unthrottled host).  Importable — bench.py
    embeds this in its artifact so suite timings are self-evidencing."""
    t1 = level(1, dur)
    t16 = level(16, dur)
    return {
        "t1_tasks_per_sec": round(t1, 1),
        "t16_tasks_per_sec": round(t16, 1),
        "sustained_ratio": round(t16 / (16 * t1), 3),
    }


def main():
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    print(json.dumps(probe(dur)))


if __name__ == "__main__":
    main()
