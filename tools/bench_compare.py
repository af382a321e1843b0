"""Compare two bench JSON lines on their COMMON query set.

Usage: python tools/bench_compare.py <ref.json> <new.json|jsonl>

Accepts the driver's BENCH_r*.json wrapper ({"parsed": {...}}) or a raw
bench.py line; for a .jsonl, the LAST line is used. Prints the common
query list, per-query deltas over 20%, and the common-subset totals —
the number the round verdicts compare (a growing query list otherwise
makes totals incomparable across rounds).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)  # single JSON document (driver wrapper)
    except json.JSONDecodeError:
        lines = [ln for ln in text.splitlines() if ln.strip()]
        d = json.loads(lines[-1])  # jsonl: last attempt wins
    if "parsed" in d:
        d = d["parsed"]
    return d


def main() -> int:
    ref, new = load(sys.argv[1]), load(sys.argv[2])
    rq, nq = ref["queries"], new["queries"]
    common = sorted(set(rq) & set(nq))
    rt = sum(rq[q] for q in common)
    nt = sum(nq[q] for q in common)
    print(f"common queries: {len(common)}")
    for q in common:
        if rq[q] > 0.2 and abs(nq[q] - rq[q]) / rq[q] > 0.2:
            print(f"  {q}: {rq[q]:.2f}s -> {nq[q]:.2f}s "
                  f"({(nq[q] / rq[q] - 1) * 100:+.0f}%)")
    print(json.dumps({
        "common_ref_sec": round(rt, 2),
        "common_new_sec": round(nt, 2),
        "ratio": round(nt / rt, 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
