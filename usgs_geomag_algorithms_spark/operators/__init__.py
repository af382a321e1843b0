"""Operator registry — named DataFrame->DataFrame transforms, the analog of
the reference's algorithm plug-in dict (``geomagio/algorithm/__init__.py:21-30``:
identity, adjusted, average, dbdt, deltaf, filter, sqdist, xyz). Entries are
import paths resolved lazily so the registry costs nothing at import time."""

from __future__ import annotations

import importlib

_REGISTRY = {
    "identity": ("usgs_geomag_algorithms_spark.operators.misc", "rename_channels"),
    "adjusted": ("usgs_geomag_algorithms_spark.operators.convert", "adjusted"),
    "average": (
        "usgs_geomag_algorithms_spark.operators.average",
        "average_across_series",
    ),
    "dbdt": ("usgs_geomag_algorithms_spark.operators.dbdt", "dbdt"),
    "deltaf": ("usgs_geomag_algorithms_spark.operators.convert", "deltaf"),
    "filter": ("usgs_geomag_algorithms_spark.operators.rollup", "rollup_step"),
    "sqdist": ("usgs_geomag_algorithms_spark.operators.sqdist", "sqdist_apply"),
    "xyz": ("usgs_geomag_algorithms_spark.operators.convert", "xyz_convert"),
    # webtext extensions
    "dedup_exact": ("usgs_geomag_algorithms_spark.operators.dedup", "exact_dedup"),
    "minhash": (
        "usgs_geomag_algorithms_spark.operators.dedup",
        "minhash_signatures",
    ),
    "simhash": ("usgs_geomag_algorithms_spark.operators.dedup", "simhash"),
    "knn": ("usgs_geomag_algorithms_spark.operators.similarity", "cosine_topk"),
    "tdigest": (
        "usgs_geomag_algorithms_spark.operators.tdigest",
        "tdigest_tier",
    ),
}


def get_algorithm(name: str):
    """Look an operator up by name (the CLI/algorithm-registry surface)."""
    mod, fn = _REGISTRY[name]
    return getattr(importlib.import_module(mod), fn)


def algorithms() -> list[str]:
    return sorted(_REGISTRY)
