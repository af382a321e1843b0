"""Residual-method absolutes: recalculate every session in the
reference's ``etc/residual/BOU20191001.json`` from its raw theodolite
measurements and compare against the recorded absolutes (the reference's
recalculation-test pattern, ``test/residual_test/residual_test.py``)."""

import json
import os

import numpy as np
import pytest

from usgs_geomag_algorithms_spark.functions.residual import (
    Obs,
    absolutes_by_session,
    calculate_absolutes,
)

RESID = "/root/reference/etc/residual/BOU20191001.json"

needs_ref = pytest.mark.skipif(
    not os.path.exists(RESID), reason="reference fixtures not available"
)


def load_sessions():
    with open(RESID) as f:
        raw = json.load(f)
    out = []
    for r in raw:
        exp = {a["element"]: a for a in r["absolutes"]}
        if not all(exp.get(el, {}).get("valid") for el in "DHZ"):
            continue
        ms = [
            Obs(
                mtype=m["measurement_type"],
                angle=m["angle"],
                residual=m["residual"],
                h=m["h"],
                e=m["e"],
                z=m["z"],
                f=m["f"],
            )
            for m in r["measurements"]
        ]
        out.append(
            {
                "measurements": ms,
                "azimuth": r["azimuth"],
                "hemisphere": r["hemisphere"],
                "pier_correction": r["pier_correction"],
                "expected": exp,
            }
        )
    return out


@needs_ref
class TestRecalculation:
    def test_all_sessions_match_recorded_absolutes(self):
        """Recorded absolutes in the fixture are UNADJUSTED (no WestDown
        reference shift), and their H baseline uses the legacy
        ``h_abs - mean.h`` form (the current reference code's
        ``sqrt(h_abs^2 - e^2) - mean.h``, Calculation.py:175, differs by
        e^2/2h ~ 0.2 nT). D/H/Z absolutes and D/Z baselines reproduce at
        ~1e-4; H baseline is checked against the legacy form exactly and
        against the recorded value within the e^2-correction envelope."""
        import math

        from usgs_geomag_algorithms_spark.functions.residual import (
            calculate_inclination,
        )

        sessions = load_sessions()
        assert len(sessions) > 50
        for s in sessions:
            got = calculate_absolutes(
                s["measurements"],
                azimuth=s["azimuth"],
                hemisphere=s["hemisphere"],
                pier_correction=s["pier_correction"],
                adjust_reference=False,
            )
            for el in "DHZ":
                np.testing.assert_almost_equal(
                    got["absolutes"][el]["absolute"],
                    s["expected"][el]["absolute"],
                    decimal=3,
                    err_msg=f"{el} absolute",
                )
            for el in "DZ":
                np.testing.assert_almost_equal(
                    got["absolutes"][el]["baseline"],
                    s["expected"][el]["baseline"],
                    decimal=3,
                    err_msg=f"{el} baseline",
                )
            inclination, f, mean = calculate_inclination(
                s["measurements"], s["hemisphere"]
            )
            h_abs = (f + s["pier_correction"]) * math.cos(
                math.radians(inclination)
            )
            np.testing.assert_almost_equal(
                h_abs - mean.h,
                s["expected"]["H"]["baseline"],
                decimal=3,
                err_msg="legacy H baseline",
            )
            assert (
                abs(
                    got["absolutes"]["H"]["baseline"]
                    - s["expected"]["H"]["baseline"]
                )
                < 0.5
            )

    def test_missing_measurement_raises(self):
        sessions = load_sessions()
        partial = [
            m for m in sessions[0]["measurements"] if m.mtype != "WestUp"
        ]
        with pytest.raises(ValueError, match="Missing WestUp"):
            calculate_absolutes(partial, azimuth=199.0)


@needs_ref
class TestSparkFanout:
    def test_matches_local_per_session(self, spark):
        sessions = load_sessions()[:6]
        rows = []
        for i, s in enumerate(sessions):
            for seq, m in enumerate(s["measurements"]):
                rows.append(
                    (
                        f"s{i}", seq, s["azimuth"], s["hemisphere"],
                        s["pier_correction"], m.mtype, m.angle, m.residual,
                        m.h, m.e, m.z, m.f,
                    )
                )
        df = spark.createDataFrame(
            rows,
            "session_id string, seq int, azimuth double, hemisphere int, "
            "pier_correction double, mtype string, angle double, "
            "residual double, h double, e double, z double, f double",
        )
        got = {
            (r.session_id, r.element): (r.absolute, r.baseline)
            for r in absolutes_by_session(df).collect()
        }
        assert len(got) == 3 * len(sessions)
        for i, s in enumerate(sessions):
            local = calculate_absolutes(
                s["measurements"], azimuth=s["azimuth"],
                hemisphere=s["hemisphere"],
                pier_correction=s["pier_correction"],
            )
            for el in "DHZ":
                a, b = got[(f"s{i}", el)]
                np.testing.assert_almost_equal(
                    a, local["absolutes"][el]["absolute"], decimal=10
                )
                np.testing.assert_almost_equal(
                    b, local["absolutes"][el]["baseline"], decimal=10
                )
