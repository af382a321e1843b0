"""Affine calibration-matrix GENERATION: fit the 4x4 adjusted-data
matrices from absolute/ordinate reading pairs.

Replicates the math of the reference's ``geomagio/adjusted/Affine.py:38-128``
and its ``transform/`` family (LeastSq.py, SVD.py, QRFactorization.py,
Rescale3D.py, RotationTranslationXY.py, ShearYZ.py, TranslateOrigins.py,
ZRotationHScale.py, ZRotationHScaleZBaseline.py, ZRotationShear.py) —
verified against the reference's own ``etc/adjusted/synthetic.json`` and
``BOU_expected.json`` fixtures — but re-architected:

- each constrained fit is a pure function in a registry (``TRANSFORMS``),
  described by a design-matrix builder + a matrix assembler, instead of a
  10-class inheritance tree;
- NumPy-only (``np.linalg`` lstsq/svd/qr; the container has no SciPy);
- calibration is small data per observatory (dozens of readings), so the
  fit itself is driver/executor-local; :func:`affines_by_observatory`
  parallelizes ACROSS observatories as a grouped-Arrow Spark job, and the
  resulting matrices feed the engine's broadcast ``adjusted`` operator
  (operators/convert.py) — generation closes the calibration loop that
  round 1 left as application-only.

Conventions (ref ``residual/Reading.py:145-194``): absolutes arrive as
cylindrical (H, D(degrees), Z); XYZ absolutes are H·cos(D), H·sin(D), Z;
ordinates are reconstructed from absolutes minus baselines with
e = H·radians(d_ord) and h = sqrt(h_ord² − e²).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# --------------------------------------------------------------- readings


@dataclass(frozen=True)
class CalReading:
    """One absolute-measurement session: cylindrical absolutes +
    baselines (D in degrees), H-measurement end time (epoch seconds),
    pier correction, and validity flag."""

    time: float
    h_abs: float
    d_abs: float
    z_abs: float
    h_bas: float
    d_bas: float
    z_bas: float
    pier_correction: float = 0.0
    valid: bool = True


def absolutes_xyz(readings: list[CalReading]) -> np.ndarray:
    """Cartesian (X, Y, Z) absolutes, shape (3, n)."""
    h = np.array([r.h_abs for r in readings])
    d = np.radians([r.d_abs for r in readings])
    z = np.array([r.z_abs for r in readings])
    return np.vstack([h * np.cos(d), h * np.sin(d), z])


def ordinates_hez(readings: list[CalReading]) -> np.ndarray:
    """Reconstructed variometer (h, e, z) ordinates, shape (3, n)."""
    h_abs = np.array([r.h_abs for r in readings])
    h_ord = h_abs - np.array([r.h_bas for r in readings])
    d_ord = np.array([r.d_abs for r in readings]) - np.array(
        [r.d_bas for r in readings]
    )
    e_ord = h_abs * np.radians(d_ord)
    z_ord = np.array([r.z_abs for r in readings]) - np.array(
        [r.z_bas for r in readings]
    )
    return np.vstack([np.sqrt(h_ord**2 - e_ord**2), e_ord, z_ord])


# ------------------------------------------------------------- weighting
def weighted_quantile(data: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Weighted quantile by cumulative-weight interpolation (the wquantiles
    construction the reference adapted)."""
    order = np.argsort(data)
    d, w = np.asarray(data)[order], np.asarray(weights)[order]
    cum = np.cumsum(w)
    grid = (cum - 0.5 * w) / cum[-1]
    return float(np.interp(q, grid, d))


def iqr_keep_mask(
    series: np.ndarray, weights: np.ndarray, threshold: float = 3.0
) -> np.ndarray:
    """Iteratively flag values within ``threshold`` weighted quartile
    ranges of the weighted median (expectation-maximization style: the
    mask feeds back into the quantiles until it stops changing)."""
    series = np.asarray(series, dtype=float)
    weights = np.asarray(weights, dtype=float)
    good = (weights > 0).astype(bool)
    if good.size <= 1 or not good.any():
        # nothing weighted: no quantiles to take (the caller's
        # no-valid-observations guard reports it)
        return good
    prev = ~good
    while not np.array_equal(prev, good):
        prev = good
        q25 = weighted_quantile(series[good], weights[good], 0.25)
        q50 = weighted_quantile(series[good], weights[good], 0.50)
        q75 = weighted_quantile(series[good], weights[good], 0.75)
        good = (
            good
            & (series >= q50 - threshold * (q50 - q25))
            & (series <= q50 + threshold * (q75 - q50))
        )
    return good


def decay_weights(
    times: np.ndarray,
    time: float,
    memory: float,
    acausal: bool,
    outlier_series: list[np.ndarray] | None = None,
) -> np.ndarray:
    """Exponential time-decay weights around ``time`` (two-sided when
    acausal), with IQR outlier rejection over ``outlier_series`` (the
    reference rejects on the H/D/Z baselines — Transform.get_weights,
    Transform.py:39-78)."""
    times = np.asarray(times, dtype=float)
    w = np.zeros_like(times)
    past = times <= time
    w[past] = np.exp((times[past] - time) / memory)
    w[~past] = np.exp((time - times[~past]) / memory)
    if not acausal:
        w[times > time] = 0.0
    if outlier_series:
        # each series' mask is computed against the ORIGINAL decay
        # weights; the masks are then ANDed (a reading is dropped if ANY
        # baseline series flags it) — order-independent
        keep = np.ones_like(w, dtype=bool)
        for series in outlier_series:
            keep &= iqr_keep_mask(series, w)
        w = w * keep
    return w


# ------------------------------------------------- constrained LS designs
#
# A least-squares transform solves  design(o).T @ params ~= target(a, o)
# where target is the interleaved [x0,y0,z0,x1,...] absolutes vector
# (optionally with ordinates subtracted for pure-translation fits), each
# observation triple scaled by sqrt(weight). The assembler shapes the
# parameter vector into the affine 4x4.


def _interleave(a: np.ndarray) -> np.ndarray:
    return np.vstack([a[0], a[1], a[2]]).T.ravel()


def _triple_sqrt_weights(w: np.ndarray | None, n: int) -> np.ndarray:
    if w is None:
        return np.ones(3 * n)
    return np.repeat(np.sqrt(np.asarray(w, dtype=float)), 3)


def _design_affine_12(o: np.ndarray) -> np.ndarray:
    n = o.shape[1]
    d = np.zeros((12, 3 * n))
    for axis in range(3):
        d[4 * axis + 0, axis::3] = o[0]
        d[4 * axis + 1, axis::3] = o[1]
        d[4 * axis + 2, axis::3] = o[2]
        d[4 * axis + 3, axis::3] = 1.0
    return d


def _asm_affine_12(p, a, o, w):
    return np.array(
        [p[0:4], p[4:8], p[8:12], [0.0, 0.0, 0.0, 1.0]]
    )


def _design_zrot_shear(o: np.ndarray) -> np.ndarray:
    n = o.shape[1]
    d = np.zeros((8, 3 * n))
    d[0, 0::3] = o[0]
    d[1, 0::3] = o[1]
    d[2, 0::3] = 1.0
    d[3, 1::3] = o[0]
    d[4, 1::3] = o[1]
    d[5, 1::3] = 1.0
    d[6, 2::3] = o[2]
    d[7, 2::3] = 1.0
    return d


def _asm_zrot_shear(p, a, o, w):
    return np.array(
        [
            [p[0], p[1], 0.0, p[2]],
            [p[3], p[4], 0.0, p[5]],
            [0.0, 0.0, p[6], p[7]],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


def _design_zrot_hscale(o: np.ndarray) -> np.ndarray:
    n = o.shape[1]
    d = np.zeros((6, 3 * n))
    d[0, 0::3] = o[0]
    d[0, 1::3] = o[1]
    d[1, 0::3] = o[1]
    d[1, 1::3] = -o[0]
    d[2, 0::3] = 1.0
    d[3, 1::3] = 1.0
    d[4, 2::3] = o[2]
    d[5, 2::3] = 1.0
    return d


def _asm_zrot_hscale(p, a, o, w):
    return np.array(
        [
            [p[0], p[1], 0.0, p[2]],
            [-p[1], p[0], 0.0, p[3]],
            [0.0, 0.0, p[4], p[5]],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


def _design_zrot_hscale_zbase(o: np.ndarray) -> np.ndarray:
    n = o.shape[1]
    d = np.zeros((3, 3 * n))
    d[0, 0::3] = o[0]
    d[0, 1::3] = o[1]
    d[1, 0::3] = o[1]
    d[1, 1::3] = -o[0]
    d[2, 2::3] = 1.0
    return d


def _asm_zrot_hscale_zbase(p, a, o, w):
    return np.array(
        [
            [p[0], p[1], 0.0, 0.0],
            [-p[1], p[0], 0.0, 0.0],
            [0.0, 0.0, 1.0, p[2]],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


def _design_rescale3(o: np.ndarray) -> np.ndarray:
    n = o.shape[1]
    d = np.zeros((3, 3 * n))
    d[0, 0::3] = o[0]
    d[1, 1::3] = o[1]
    d[2, 2::3] = o[2]
    return d


def _asm_rescale3(p, a, o, w):
    return np.diag([p[0], p[1], p[2], 1.0])


def _design_shear_yz(o: np.ndarray) -> np.ndarray:
    n = o.shape[1]
    d = np.zeros((3, 3 * n))
    d[0, 0::3] = 1.0
    d[1, 0::3] = o[0]
    d[1, 1::3] = 1.0
    d[2, 0::3] = o[0]
    d[2, 1::3] = o[1]
    d[2, 2::3] = 1.0
    return d


def _asm_shear_yz(p, a, o, w):
    return np.array(
        [
            [1.0, 0.0, 0.0, 0.0],
            [p[0], 1.0, 0.0, 0.0],
            [p[1], p[2], 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


def _design_translate(o: np.ndarray) -> np.ndarray:
    n = o.shape[1]
    d = np.zeros((3, 3 * n))
    d[0, 0::3] = 1.0
    d[1, 1::3] = 1.0
    d[2, 2::3] = 1.0
    return d


def _asm_translate(p, a, o, w):
    return np.array(
        [
            [1.0, 0.0, 0.0, p[0]],
            [0.0, 1.0, 0.0, p[1]],
            [0.0, 0.0, 1.0, p[2]],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


#: name -> (design builder, assembler, subtract_ordinates_on: axes whose
#: target rows become (a - o), forcing a pure translation on those axes)
_LS_SPECS = {
    "least_sq": (_design_affine_12, _asm_affine_12, ()),
    "z_rotation_shear": (_design_zrot_shear, _asm_zrot_shear, ()),
    "z_rotation_hscale": (_design_zrot_hscale, _asm_zrot_hscale, ()),
    "z_rotation_hscale_zbaseline": (
        _design_zrot_hscale_zbase,
        _asm_zrot_hscale_zbase,
        (2,),
    ),
    "rescale_3d": (_design_rescale3, _asm_rescale3, ()),
    "shear_yz": (_design_shear_yz, _asm_shear_yz, ()),
    "translate_origins": (_design_translate, _asm_translate, (0, 1, 2)),
}

_NAN4 = np.full((4, 4), np.nan)


def _solve_ls(name, ordinates, absolutes, weights, ndims=3):
    design, assemble, subtract_axes = _LS_SPECS[name]
    o = np.asarray(ordinates, dtype=float)
    a = np.asarray(absolutes, dtype=float)
    target = _interleave(a)
    for axis in subtract_axes:
        target[axis::3] = a[axis] - o[axis]
    sw = _triple_sqrt_weights(weights, o.shape[1])
    d = design(o) * sw
    params, _res, rank, _sv = np.linalg.lstsq(d.T, target * sw, rcond=None)
    if rank < ndims:
        return _NAN4.copy()
    return assemble(params, a, o, weights)


# ------------------------------------------------------------ SVD family
def _wavg(values: np.ndarray, weights: np.ndarray | None) -> np.ndarray:
    if weights is None:
        weights = np.ones(values.shape[1])
    return np.average(values, axis=1, weights=weights)


def _svd_rotation(
    ordinates, absolutes, weights, ndims
) -> tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
    """Kabsch-style weighted rotation fit on the first ``ndims`` axes.
    Returns (R, abs_centroid, ord_centroid, ok)."""
    o = np.asarray(ordinates, dtype=float)
    a = np.asarray(absolutes, dtype=float)
    w = np.ones(o.shape[1]) if weights is None else np.asarray(weights, float)
    oc, ac = _wavg(o, w), _wavg(a, w)
    od = o[:ndims] - oc[:ndims, None]
    ad = a[:ndims] - ac[:ndims, None]
    cov = od @ np.diag(w) @ ad.T
    u, s, vh = np.linalg.svd(cov)
    if np.sum(s) < ndims:
        return np.eye(ndims), ac, oc, False
    sign = np.linalg.det(vh.T @ u.T)
    fix = np.diag([1.0] * (ndims - 1) + [sign])
    r = vh.T @ fix @ u.T
    return r, ac, oc, True


def _solve_svd3(ordinates, absolutes, weights):
    r, ac, oc, ok = _svd_rotation(ordinates, absolutes, weights, 3)
    if not ok:
        return _NAN4.copy()
    t = ac - r @ oc
    m = np.eye(4)
    m[:3, :3] = r
    m[:3, 3] = t
    return m


def _solve_rotation_translation_xy(ordinates, absolutes, weights):
    r, ac, oc, ok = _svd_rotation(ordinates, absolutes, weights, 2)
    if not ok:
        return _NAN4.copy()
    t = ac[:2] - r @ oc[:2]
    return np.array(
        [
            [r[0, 0], r[0, 1], 0.0, t[0]],
            [r[1, 0], r[1, 1], 0.0, t[1]],
            [0.0, 0.0, 1.0, ac[2] - oc[2]],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


def _solve_qr_factorization(ordinates, absolutes, weights):
    """2D shear+rotation via least squares then QR split (rotation x
    unit-diagonal shear), translation from weighted centroids."""
    o = np.asarray(ordinates, dtype=float)
    a = np.asarray(absolutes, dtype=float)
    w = np.ones(o.shape[1]) if weights is None else np.asarray(weights, float)
    oc, ac = _wavg(o, w), _wavg(a, w)
    od = (o[:2] - oc[:2, None]) * np.sqrt(w)
    ad = (a[:2] - ac[:2, None]) * np.sqrt(w)
    m, _res, rank, _sv = np.linalg.lstsq(od.T, ad.T, rcond=None)
    if rank < 2:
        return _NAN4.copy()
    q, r = np.linalg.qr(m.T)
    neg = np.diag(q) < 0
    q[:, neg] *= -1
    r[neg, :] *= -1
    shear = np.linalg.inv(np.diag(np.diag(r))) @ r
    qh = q @ shear
    t = ac[:2] - qh @ oc[:2]
    return np.array(
        [
            [qh[0, 0], qh[0, 1], 0.0, t[0]],
            [qh[1, 0], qh[1, 1], 0.0, t[1]],
            [0.0, 0.0, 1.0, ac[2] - oc[2]],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


#: every supported fit: name -> callable(ordinates, absolutes, weights)
TRANSFORMS = {
    **{
        name: (lambda n: (lambda o, a, w=None: _solve_ls(n, o, a, w)))(name)
        for name in _LS_SPECS
    },
    "svd": _solve_svd3,
    "rotation_translation_xy": _solve_rotation_translation_xy,
    "qr_factorization": _solve_qr_factorization,
}


def solve_affine(kind: str, ordinates, absolutes, weights=None) -> np.ndarray:
    """Fit one 4x4 affine with the named constraint family."""
    try:
        fn = TRANSFORMS[kind]
    except KeyError:
        raise ValueError(
            f"unknown transform {kind!r}; one of {sorted(TRANSFORMS)}"
        ) from None
    return np.asarray(fn(ordinates, absolutes, weights))


# -------------------------------------------------------- affine pipeline
@dataclass(frozen=True)
class TransformSpec:
    kind: str
    memory: float = np.inf
    acausal: bool = False


DEFAULT_TRANSFORMS = (
    TransformSpec("rotation_translation_xy", memory=86400 * 100, acausal=True),
    TransformSpec("translate_origins", memory=86400 * 10, acausal=True),
)


def generate_affines(
    readings: list[CalReading],
    starttime: float,
    endtime: float,
    update_interval: float | None = None,
    transforms: tuple[TransformSpec, ...] = DEFAULT_TRANSFORMS,
    bad_times: list[float] | None = None,
) -> list[dict]:
    """The reference Affine.calculate flow (``Affine.py:38-128``): for each
    update-interval start, chain the transform fits (each fit consumes the
    previous fit's transformed ordinates), compose the matrices in reverse
    order, and attach the weight-averaged pier correction plus the epoch
    bounds derived from bad readings (H absolute == 0 by default)."""
    valid = [r for r in readings if r.valid]
    bad_times = (
        bad_times
        if bad_times is not None
        else [r.time for r in valid if r.h_abs == 0]
    )
    interval = update_interval or (endtime - starttime)
    out = []
    t = starttime
    while t < endtime:
        epoch_start = max((e for e in bad_times if e < t), default=None)
        epoch_end = min((e for e in bad_times if e > t), default=None)
        # reference epoch filter (Affine.py:66-73) — an OR, kept verbatim
        rs = [
            r
            for r in valid
            if (epoch_start is None or r.time > epoch_start)
            or (epoch_end is None or r.time < epoch_end)
        ]
        a = absolutes_xyz(rs)
        o = ordinates_hez(rs)
        baselines = [
            np.array([r.h_bas for r in rs]),
            np.array([r.d_bas for r in rs]),
            np.array([r.z_bas for r in rs]),
        ]
        times = np.array([r.time for r in rs])
        inputs = o
        mats = []
        weights = None
        for spec in transforms:
            weights = decay_weights(
                times, t, spec.memory, spec.acausal, outlier_series=baselines
            )
            if np.sum(weights) == 0:
                raise ValueError(f"No valid observations for: {t}")
            m = solve_affine(spec.kind, inputs, a, weights)
            inputs = (m @ np.vstack([inputs, np.ones(inputs.shape[1])]))[0:3]
            mats.append(m)
        composed = mats[0]
        for m in mats[1:]:
            composed = m @ composed
        pier = float(
            np.average([r.pier_correction for r in rs], weights=weights)
        )
        out.append(
            {
                "matrix": composed,
                "pier_correction": pier,
                "starttime": epoch_start,
                "endtime": epoch_end,
                "time": t,
            }
        )
        t += interval
    return out


# ------------------------------------------------------------ Spark layer
def affines_by_observatory(
    df,
    starttime: float,
    endtime: float,
    update_interval: float | None = None,
    transforms: tuple[TransformSpec, ...] = DEFAULT_TRANSFORMS,
):
    """Fit calibration matrices for EVERY observatory in one grouped-Arrow
    job: input is a long readings frame
    ``(observatory, time, h_abs, d_abs, z_abs, h_bas, d_bas, z_bas,
    pier_correction, valid)``; output one row per (observatory, interval)
    with the composed 4x4 flattened row-major. Calibration per observatory
    is tiny; the parallelism worth having is across observatories."""
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        # grouped-Arrow delivery order is not guaranteed; sort so the fit
        # (lstsq row order, weighted averages, quantile tie-breaks) is
        # bit-deterministic across runs
        pdf = pdf.sort_values("time", kind="mergesort")
        rs = [
            CalReading(
                time=float(row.time),
                h_abs=float(row.h_abs),
                d_abs=float(row.d_abs),
                z_abs=float(row.z_abs),
                h_bas=float(row.h_bas),
                d_bas=float(row.d_bas),
                z_bas=float(row.z_bas),
                pier_correction=float(row.pier_correction),
                valid=bool(row.valid),
            )
            for row in pdf.itertuples()
        ]
        results = generate_affines(
            rs, starttime, endtime, update_interval, transforms
        )
        return pd.DataFrame(
            {
                "observatory": pdf["observatory"].iloc[0],
                "time": [r["time"] for r in results],
                "matrix": [list(r["matrix"].ravel()) for r in results],
                "pier_correction": [r["pier_correction"] for r in results],
            }
        )

    return df.groupBy("observatory").applyInPandas(
        fit,
        schema=(
            "observatory string, time double, matrix array<double>, "
            "pier_correction double"
        ),
    )
