"""Affine calibration-matrix generation: parity with the reference's own
fixtures (loaded read-only from /root/reference/etc — the synthetic
transform vectors and the BOU real-observatory expected matrices,
``test/adjusted_test/adjusted_test.py``), plus the grouped-Arrow Spark
fan-out across observatories."""

import json
import os
from datetime import datetime, timezone

import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal

from usgs_geomag_algorithms_spark.functions.affine import (
    CalReading,
    TransformSpec,
    affines_by_observatory,
    decay_weights,
    generate_affines,
    iqr_keep_mask,
    solve_affine,
)

REF = "/root/reference/etc/adjusted"
RESID = "/root/reference/etc/residual/BOU20191001.json"

#: registry name -> reference fixture key
SYNTH_KEYS = {
    "least_sq": "LeastSq",
    "z_rotation_shear": "ZRotationShear",
    "z_rotation_hscale": "ZRotationHscale",
    "z_rotation_hscale_zbaseline": "ZRotationHscaleZbaseline",
    "svd": "SVD",
    "rescale_3d": "Rescale3D",
    "translate_origins": "TranslateOrigins",
    "shear_yz": "ShearYZ",
    "rotation_translation_xy": "RotationTranslationXY",
    "qr_factorization": "QRFactorization",
}

needs_ref = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference fixtures not available"
)


def synthetic_variables():
    with open(f"{REF}/synthetic.json") as f:
        data = json.load(f)
    v = data["variables"]
    ordinates = np.array([v["h_ord"], v["e_ord"], v["z_ord"]])
    absolutes = np.array([v["x_abs"], v["y_abs"], v["z_abs"]])
    weights = np.arange(0, len(ordinates[0]))
    return ordinates, absolutes, weights, data["results"]


def bou_readings():
    with open(RESID) as f:
        raw = json.load(f)
    out = []
    for r in raw:
        by_el = {a["element"]: a for a in r["absolutes"]}
        if not all(el in by_el for el in "DHZ"):
            continue
        if by_el["H"]["endtime"] is None:
            continue  # invalid readings (valid=False) carry no time
        t = datetime.fromisoformat(by_el["H"]["endtime"]).replace(
            tzinfo=timezone.utc
        )
        out.append(
            CalReading(
                time=t.timestamp(),
                h_abs=by_el["H"]["absolute"],
                d_abs=by_el["D"]["absolute"],
                z_abs=by_el["Z"]["absolute"],
                h_bas=by_el["H"]["baseline"],
                d_bas=by_el["D"]["baseline"],
                z_bas=by_el["Z"]["baseline"],
                pier_correction=r["pier_correction"],
                valid=all(by_el[el]["valid"] for el in "DHZ"),
            )
        )
    return out


def ts(s):
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc).timestamp()


BOU_SPAN = (ts("2019-11-01T00:00:00"), ts("2020-01-31T23:59:00"))
INF_PAIR = (
    TransformSpec("rotation_translation_xy", memory=np.inf, acausal=True),
    TransformSpec("translate_origins", memory=np.inf, acausal=True),
)


@needs_ref
class TestSyntheticParity:
    def test_all_ten_transforms_match_reference(self):
        ordinates, absolutes, weights, expected = synthetic_variables()
        for name, key in SYNTH_KEYS.items():
            got = solve_affine(name, ordinates, absolutes, weights)
            assert_array_almost_equal(
                got, expected[key], decimal=3, err_msg=name
            )

    def test_unweighted_runs(self):
        ordinates, absolutes, _w, _e = synthetic_variables()
        for name in SYNTH_KEYS:
            m = solve_affine(name, ordinates, absolutes, None)
            assert m.shape == (4, 4) and np.isfinite(m).all()

    def test_unknown_transform_raises(self):
        with pytest.raises(ValueError, match="unknown transform"):
            solve_affine("nope", np.zeros((3, 4)), np.zeros((3, 4)))


@needs_ref
class TestBouRealData:
    def test_infinite_one_interval(self):
        with open(f"{REF}/BOU_expected.json") as f:
            expected = json.load(f)["inf_one_interval"]
        res = generate_affines(
            bou_readings(), *BOU_SPAN, update_interval=None,
            transforms=INF_PAIR,
        )
        assert len(res) == 1
        assert_array_almost_equal(res[0]["matrix"], expected[0], decimal=3)

    def test_infinite_weekly(self):
        with open(f"{REF}/BOU_expected.json") as f:
            expected = json.load(f)["inf_weekly"]
        start, end = BOU_SPAN
        res = generate_affines(
            bou_readings(), start, end, update_interval=86400 * 7,
            transforms=INF_PAIR,
        )
        assert len(res) == int((end - start) // (86400 * 7)) + 1
        for i, r in enumerate(res):
            assert_array_almost_equal(
                r["matrix"], expected[i], decimal=3, err_msg=f"matrix {i}"
            )

    def test_no_readings_raises(self):
        with pytest.raises(ValueError, match="No valid observations"):
            generate_affines([], *BOU_SPAN, transforms=INF_PAIR)


class TestWeights:
    def test_causal_zeroes_future(self):
        times = np.array([0.0, 100.0, 200.0])
        w = decay_weights(times, 100.0, memory=100.0, acausal=False)
        assert w[2] == 0.0 and w[1] == 1.0 and 0 < w[0] < 1

    def test_iqr_rejects_outlier(self):
        series = np.array([1.0, 1.1, 0.9, 1.05, 50.0])
        keep = iqr_keep_mask(series, np.ones(5))
        assert list(keep) == [True, True, True, True, False]


@needs_ref
class TestSparkFanout:
    def test_matches_local_per_observatory(self, spark):
        readings = bou_readings()
        rows = []
        for obs in ("BOU", "XYZ"):
            for r in readings:
                rows.append(
                    (obs, r.time, r.h_abs, r.d_abs, r.z_abs, r.h_bas,
                     r.d_bas, r.z_bas, r.pier_correction, r.valid)
                )
        df = spark.createDataFrame(
            rows,
            "observatory string, time double, h_abs double, d_abs double, "
            "z_abs double, h_bas double, d_bas double, z_bas double, "
            "pier_correction double, valid boolean",
        )
        start, end = BOU_SPAN
        out = affines_by_observatory(
            df, start, end, update_interval=None, transforms=INF_PAIR
        ).collect()
        assert {r.observatory for r in out} == {"BOU", "XYZ"}
        local = generate_affines(
            readings, start, end, update_interval=None, transforms=INF_PAIR
        )
        for row in out:
            assert_array_almost_equal(
                np.array(row.matrix).reshape(4, 4),
                local[0]["matrix"],
                decimal=10,
            )
            np.testing.assert_almost_equal(
                row.pier_correction, local[0]["pier_correction"], decimal=10
            )
