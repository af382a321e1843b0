"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from usgs_geomag_algorithms_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)  # Arrow surfaces DuckDB DECIMALs as Decimal objects
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 15 significant digits: tight enough that only sub-ulp noise
        # passes (the driver hashes exact values; 9g could mask a real
        # mismatch the driver would see — VERDICT r3 "what's wrong" #3).
        # Integers, bools, strings compare exactly.
        return f"{v:.15g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def duck_views(sf_dir: str):
    """A DuckDB connection with the testdata tables registered as views
    (the driver gate's setup)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def check_one(spark, con, sf_dir: str, name: str, fn, sql: str | None):
    """Run one queries() entry on Spark and its oracle on DuckDB; returns
    (ok, message).  ``sql=None`` is the rows-only check."""
    try:
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
    except Exception as e:
        return False, f"spark error {type(e).__name__}: {e}"
    if sql is None:
        return True, f"rows={len(srows)} (no oracle; rows-only check)"
    try:
        # Arrow keeps NULL and float NaN distinct (fetchdf would fold
        # DuckDB NULL doubles into NaN, conflating the engine's two
        # different gap encodings)
        dtab = con.execute(sql).arrow()
    except Exception as e:
        return False, f"duckdb error {e}"
    dcols = sorted(dtab.column_names)
    if scols != dcols:
        return False, f"columns spark={scols} duckdb={dcols}"
    drows = dtab.to_pylist()
    if len(srows) != len(drows):
        return False, f"rowcount spark={len(srows)} duckdb={len(drows)}"
    sset = sorted(
        tuple(norm(row[c]) for c in scols) for row in (r.asDict() for r in srows)
    )
    dset = sorted(tuple(norm(row[c]) for c in dcols) for row in drows)
    if sset != dset:
        bad = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
        return False, f"values differ, first diffs: {bad}"
    return True, f"rows={len(srows)}"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_oracle", cores=8, shuffle_partitions=8)
    con = duck_views(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"FAIL unknown query names: {sorted(unknown)}")
            sys.exit(2)
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ok, msg = check_one(spark, con, sf_dir, name, fn, oracles.get(name))
        if not ok:
            print(f"FAIL {name}: {msg}")
            failures += 1
        elif name not in oracles:
            print(f"OK?  {name}: {msg}")
        else:
            print(f"PASS {name}: {msg}")
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
