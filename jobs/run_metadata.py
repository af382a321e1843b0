"""Metadata CLI — the ``geomag-metadata`` console script analog
(``geomagio/metadata/main.py``: create / get / update commands) over the
engine's :class:`MetadataStore` instead of the reference's HTTP API.

    python jobs/run_metadata.py --store /data/meta create --input meta.json
    python jobs/run_metadata.py --store /data/meta get --station BOU \
        --category flag --starttime 2020-02-02T00:00:00 [--getone]
    python jobs/run_metadata.py --store /data/meta update --id 3 \
        --input changes.json --updated-by alice
    python jobs/run_metadata.py --store /data/meta history --id 3

``--input -`` reads JSON from stdin like the reference's load_metadata
(main.py:47-55).  ``get`` prints a JSON array (or a single object with
``--getone``, which errors unless exactly one record matches —
main.py:151-155); ``create``/``update`` echo the stored row(s).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def load_input(path: str | None):
    if path is None:
        return None
    if path == "-":
        return json.loads(sys.stdin.read())
    with open(path) as f:
        return json.load(f)


def _iso_us(v: str | None):
    if v is None:
        return None
    from usgs_geomag_algorithms_spark.tiers import iso_to_us

    return iso_to_us(v)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", required=True, help="metadata store root")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create", help="insert metadata rows")
    c.add_argument("--input", required=True,
                   help="JSON object or array ('-' = stdin)")

    g = sub.add_parser("get", help="search metadata")
    for name in ("category", "network", "station", "channel", "location",
                 "starttime", "endtime", "created-after", "created-before"):
        g.add_argument(f"--{name}", default=None)
    g.add_argument("--data-valid", default=None, choices=["true", "false"])
    g.add_argument("--status", nargs="*", default=None)
    g.add_argument("--id", type=int, default=None)
    g.add_argument("--getone", action="store_true")
    g.add_argument("--history", action="store_true")

    u = sub.add_parser("update", help="update one row (archives history)")
    u.add_argument("--id", type=int, required=True)
    u.add_argument("--input", required=True,
                   help="JSON object of changed fields ('-' = stdin)")
    u.add_argument("--updated-by", required=True)

    h = sub.add_parser("history", help="all versions of one row, newest first")
    h.add_argument("--id", type=int, required=True)

    args = ap.parse_args(argv)

    from usgs_geomag_algorithms_spark.session import get_spark
    from usgs_geomag_algorithms_spark.sources.metadata import MetadataStore

    spark = SparkSession.getActiveSession() or get_spark(app_name="metadata")
    store = MetadataStore(spark, args.store)

    if args.cmd == "create":
        data = load_input(args.input)
        rows = data if isinstance(data, list) else [data]
        ids = store.create(rows)
        print(json.dumps([store.get_by_id(i) for i in ids]))
    elif args.cmd == "get":
        df = store.get(
            history=args.history,
            id=args.id,
            category=args.category,
            network=args.network,
            station=args.station,
            channel=args.channel,
            location=args.location,
            starttime_us=_iso_us(args.starttime),
            endtime_us=_iso_us(args.endtime),
            created_after_us=_iso_us(args.created_after),
            created_before_us=_iso_us(args.created_before),
            data_valid=(
                None if args.data_valid is None
                else args.data_valid == "true"
            ),
            status=args.status,
        )
        rows = [r.asDict() for r in df.collect()]
        if args.getone:
            if len(rows) != 1:
                raise SystemExit(f"{len(rows)} matching records")
            print(json.dumps(rows[0]))
        else:
            print(json.dumps(rows))
    elif args.cmd == "update":
        changes = load_input(args.input)
        row = store.update(args.id, changes, updated_by=args.updated_by)
        print(json.dumps(row))
    else:  # history
        rows = [r.asDict() for r in store.history_by_metadata_id(args.id).collect()]
        print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
