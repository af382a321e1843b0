"""Derived-channel view layer — the ``DerivedTimeseriesFactory`` analog
(``geomagio/DerivedTimeseriesFactory.py:23-161``): when a requested channel
is absent from the store, derive it on read from the channels that exist
(G from X/Y/Z/F; X/Y from H/D; H/D from X/Y; E from H/D), then leave
truly-missing channels absent (the reference fills empties with NaN traces;
our long format simply has no rows = gap).

``get_missing`` (``:204-207``) is a set difference of requested vs present
channel names — driver-side on the tiny channel list, never a data scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions import channels as C


def get_missing(present: Sequence[str], requested: Sequence[str]) -> list[str]:
    return [c for c in requested if c not in set(present)]


#: derivation rules: target -> (required inputs, expression builder)
def _rules(d0: float):
    return {
        "X": (("H", "D"), lambda c: C.geo_x_from_mag(c("H"), c("D"))),
        "Y": (("H", "D"), lambda c: C.geo_y_from_mag(c("H"), c("D"))),
        "H": (("X", "Y"), lambda c: C.mag_h_from_geo(c("X"), c("Y"))),
        "D": (("X", "Y"), lambda c: C.mag_d_from_geo(c("X"), c("Y"))),
        "E": (("H", "D"), lambda c: C.obs_e_from_mag(c("H"), c("D"), d0)),
        "G": (
            ("X", "Y", "Z", "F"),
            lambda c: C.deltaf(
                C.computed_f_using_squares(c("X"), c("Y"), c("Z")), c("F")
            ),
        ),
        "F": (
            ("X", "Y", "Z", "G"),
            lambda c: C.computed_f_using_squares(c("X"), c("Y"), c("Z")) - c("G"),
        ),
    }


def derive_missing_channels(
    wide: DataFrame, requested: Sequence[str], d0: float = 0.0
) -> DataFrame:
    """Add requested-but-absent channels to a wide frame when derivable.
    Iterates to a fixed point so chained derivations resolve (e.g. X,Y from
    H,D then G from X,Y,Z,F)."""
    rules = _rules(d0)
    out = wide
    changed = True
    while changed:
        changed = False
        present = set(out.columns)
        for ch in get_missing(present, requested):
            if ch not in rules:
                continue
            needs, builder = rules[ch]
            if all(n in present for n in needs):
                out = out.withColumn(ch, builder(lambda n: F.col(n)))
                changed = True
    return out
