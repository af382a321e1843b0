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


def check_record(spark, con, sf_dir: str, name: str, fn, sql: str | None) -> dict:
    """Run one queries() entry on Spark and its oracle on DuckDB; returns
    a CORRECTNESS_r{N}.json-shaped record: rows_match / schema_match /
    hash_match / spark_rows / oracle_rows / err (hash_match None for the
    rows-only check, err carries the first failure detail)."""
    rec = {
        "rows_match": False,
        "schema_match": False,
        "hash_match": False,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
    except Exception as e:
        rec["err"] = f"spark error {type(e).__name__}: {e}"
        return rec
    rec["spark_rows"] = len(srows)
    if sql is None:
        rec.update(rows_match=True, schema_match=True, hash_match=None,
                   err="no oracle; rows-only check")
        return rec
    try:
        # Arrow keeps NULL and float NaN distinct (fetchdf would fold
        # DuckDB NULL doubles into NaN, conflating the engine's two
        # different gap encodings)
        dtab = con.execute(sql).arrow()
    except Exception as e:
        rec["err"] = f"duckdb error {e}"
        return rec
    dcols = sorted(dtab.column_names)
    drows = dtab.to_pylist()
    rec["oracle_rows"] = len(drows)
    if scols != dcols:
        rec["err"] = f"columns spark={scols} duckdb={dcols}"
        return rec
    rec["schema_match"] = True
    if len(srows) != len(drows):
        rec["err"] = f"rowcount spark={len(srows)} duckdb={len(drows)}"
        return rec
    rec["rows_match"] = True
    sset = sorted(
        tuple(norm(row[c]) for c in scols) for row in (r.asDict() for r in srows)
    )
    dset = sorted(tuple(norm(row[c]) for c in dcols) for row in drows)
    if sset != dset:
        bad = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
        rec["err"] = f"values differ, first diffs: {bad}"
        return rec
    rec["hash_match"] = True
    return rec


def check_one(spark, con, sf_dir: str, name: str, fn, sql: str | None):
    """(ok, message) wrapper over :func:`check_record` — the shape the
    rotation test and older callers use."""
    rec = check_record(spark, con, sf_dir, name, fn, sql)
    if rec["hash_match"] is None:
        return True, f"rows={rec['spark_rows']} (no oracle; rows-only check)"
    if rec["hash_match"]:
        return True, f"rows={rec['spark_rows']}"
    return False, rec["err"] or "mismatch"


def main():
    import json
    import os

    args = [a for a in sys.argv[1:] if not a.startswith("--json")]
    json_out = None
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
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
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = check_record(spark, con, sf_dir, name, fn, oracles.get(name))
        records[name] = rec
        ok = rec["hash_match"] or rec["hash_match"] is None
        msg = rec["err"] or f"rows={rec['spark_rows']}"
        if not ok:
            print(f"FAIL {name}: {msg}")
            failures += 1
        elif name not in oracles:
            print(f"OK?  {name}: rows={rec['spark_rows']} ({rec['err']})")
        else:
            print(f"PASS {name}: {msg}")
    if json_out:
        # CORRECTNESS_r{N}.json row schema + a _meta block so the
        # artifact is self-describing (which sf, when, how many exact)
        doc = dict(records)
        doc["_meta"] = {
            "sf_dir": sf_dir,
            "n_queries": len(records),
            "n_exact": sum(1 for r in records.values() if r["hash_match"]),
            "n_rows_only": sum(
                1 for r in records.values() if r["hash_match"] is None
            ),
            "n_fail": failures,
            "generated_unix": int(__import__("time").time()),
        }
        tmp = json_out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1)
        os.replace(tmp, json_out)
        print(f"wrote {json_out}")
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
