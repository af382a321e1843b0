"""SqDist: Holt-Winters solar-quiet / secular-variation / disturbance
decomposition — the engine's stateful sequential operator.

Semantics match the reference ``SqDistAlgorithm``
(``geomagio/algorithm/SqDistAlgorithm.py:308-611``): additive exponential
smoothing with damped linear trend and an m-season additive component,

- spike gating: observations with ``|error| > zthresh * sigma`` update only
  sigma, not the level/trend/season (``:524,550-554``),
- gap forecasting: over NaN runs the state free-runs and sigma grows as a
  Hyndman et al. (2005) prediction interval (``:535-548``),
- seasonal error redistribution: the correction is spread over neighboring
  seasonal slots with a Gaussian kernel (White et al., USGS SIR 2014-5045;
  ``:453-472,559-574``),
- zero-mean seasonal enforcement via a running remainder folded into the
  level (``:478-480,598-600``),
- resumable state ``{yhat0, s0, l0, b0, sigma0, next_start}`` with a strict
  continuity check (``:227-256``).

The recurrence is inherently sequential per series, so Spark parallelism is
*across* series: a grouped Arrow ``applyInPandas`` runs one series per
group, emitting the four output channels (``_Dist,_SQ,_SV,_Sigma`` —
``:288-305``) plus a state row the driver persists to the checkpoint store.
This mirrors the production shape: millions of independent url channels,
each with a tiny sequential state.
"""

from __future__ import annotations

import json
from collections.abc import Sequence
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


@dataclass
class HWParams:
    m: int
    alpha: float
    beta: float
    gamma: float
    phi: float = 1.0
    zthresh: float = 6.0
    hstep: int = 0
    smooth: int = 1


@dataclass
class HWState:
    yhat0: list = None
    s0: list = None
    l0: float = None
    b0: float = None
    sigma0: list = None
    next_start_us: int = None
    delta_us: int = None

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "HWState":
        return cls(**json.loads(s))


def _season_kernel(m: int, smooth: int) -> np.ndarray:
    """Gaussian redistribution weights for the seasonal correction (White
    et al. 2014): half-power at period ``smooth`` samples."""
    half_power = 10 ** (-3 / 20.0)
    omega = np.pi / float(smooth)
    sig = np.sqrt(-2 * np.log(half_power) / omega**2) + np.finfo(float).eps
    span = 3 * np.round(sig)
    grid = np.linspace(
        max(-m, -span), min(m, span), int(np.round(min(2 * m, 2 * span) + 1))
    )
    w = np.exp(-0.5 * (grid / sig) ** 2)
    return w / w.sum()


def holt_winters_additive(
    yobs: np.ndarray,
    p: HWParams,
    state: HWState | None = None,
    fc: int = 0,
):
    """Run the recurrence over one chunk; returns (yhat, shat, sigmahat,
    new_state). All arrays aligned with yobs (plus ``fc`` forecast steps)."""
    m, alpha, beta, gamma, phi = p.m, p.alpha, p.beta, p.gamma, p.phi
    hstep = p.hstep
    yobs = np.asarray(yobs, dtype=np.float64)
    n = len(yobs)

    st = state or HWState()
    # state-shape guards (the reference's AlgorithmException checks,
    # SqDistAlgorithm.py: "yhat0/s0/sigma0 must have length ..."): a
    # mismatched resumed state would otherwise silently corrupt the
    # seasonal array or IndexError mid-recurrence
    if st.s0 is not None and len(st.s0) != m:
        raise ValueError(f"s0 must have length m={m}, got {len(st.s0)}")
    if st.yhat0 is not None and len(st.yhat0) != hstep:
        raise ValueError(f"yhat0 must have length hstep={hstep}, got {len(st.yhat0)}")
    if st.sigma0 is not None and len(st.sigma0) != hstep + 1:
        raise ValueError(
            f"sigma0 must have length hstep+1={hstep + 1}, got {len(st.sigma0)}"
        )
    level = (
        st.l0
        if st.l0 is not None
        else (0.0 if np.isnan(np.nanmean(yobs[:m])) else np.nanmean(yobs[:m]))
    )
    slope = st.b0 if st.b0 is not None else 0.0
    yhat = np.concatenate(
        [
            np.asarray(st.yhat0, dtype=np.float64)
            if st.yhat0 is not None
            else np.full(hstep, np.nan),
            np.zeros(n + fc),
        ]
    )
    season = np.concatenate(
        [
            np.asarray(st.s0, dtype=np.float64)
            if st.s0 is not None
            else np.zeros(m),
            np.zeros(n + fc),
        ]
    )
    sigma = np.concatenate(
        [
            np.asarray(st.sigma0, dtype=np.float64)
            if st.sigma0 is not None
            else np.full(hstep + 1, np.sqrt(np.nanvar(yobs))),
            np.zeros(n + fc),
        ]
    )
    # running remainder enforcing zero-mean seasonal corrections
    rem = np.concatenate([[np.nanmean(season[:m])], np.zeros(n + fc)])

    kernel = _season_kernel(m, p.smooth)
    half = kernel.size // 2

    # Hyndman prediction-interval coefficient sums for hstep-ahead forecasts
    c2_base = 1.0
    phi_h = 0.0
    for h in range(1, hstep):
        phi_h += phi ** (h - 1)
        c2_base += (alpha * (1 + phi_h * beta) + gamma * (1 if h % m == 0 else 0)) ** 2
    c2 = c2_base
    phi_j = phi_h
    j = hstep
    sigma2_anchor = 0.0

    frozen = None
    for i in range(n + fc):
        if j == hstep:
            sigma2_anchor = sigma[i] * sigma[i]
        sigma[i + hstep + 1] = np.sqrt(sigma2_anchor * c2)
        yhat[i + hstep] = level + phi_h * slope + season[i + hstep % m]

        err = yobs[i] - yhat[i] if i < n else np.nan
        gated = np.isnan(err) or abs(err) > p.zthresh * sigma[i]
        if gated:
            # free-run: state advances with zero innovation
            rem[i + 1] = rem[i]
            season[i + m] = season[i]
            level = level + phi * slope
            slope = phi * slope
            if np.isnan(err):
                # grow sigma like a widening prediction interval over gaps
                phi_j += phi**j
                j += 1
                c2 += (
                    alpha * (1 + phi_j * beta) + gamma * (1 if j % m == 0 else 0)
                ) ** 2
            else:
                # spike: sigma tracks it, nothing else does
                sigma[i + 1] = alpha * abs(err) + (1 - alpha) * sigma[i]
                j = hstep
        else:
            corr = gamma * (1 - alpha) * err
            rem[i + 1] = corr / m + rem[i]
            # distribute the correction across neighboring seasonal slots
            season[i + m] = season[i] + corr * kernel[half]
            season[i + m - half : i + m] += corr * kernel[:half]
            season[i + 1 : i + half + 1] += corr * kernel[half + 1 :]
            level = level + phi * slope + alpha * err
            slope = phi * slope + alpha * beta * err
            sigma[i + 1] = alpha * abs(err) + (1 - alpha) * sigma[i]
            c2 = c2_base
            phi_j = phi_h
            j = hstep

        if i == n - 1:
            frozen = HWState(
                yhat0=yhat[n : n + hstep].tolist(),
                s0=(season[n : n + m] - rem[i + 1]).tolist(),
                l0=float(level + rem[i + 1]),
                b0=float(slope),
                sigma0=sigma[n : n + hstep + 1].tolist(),
            )

    # fold the remainder into level/seasonals (zero-mean enforcement)
    season = season - np.concatenate([rem, np.tile(rem[-1], m - 1)])
    return (
        yhat[: n + fc],
        season[: n + fc],
        sigma[1 : n + fc + 1],
        frozen if frozen is not None else state,
    )


def sqdist_decompose(yobs: np.ndarray, p: HWParams, state: HWState | None = None):
    """One chunk -> (dist, sq, sv, sigma, new_state): the four output
    channels (ref ``process_one``, SqDistAlgorithm.py:288-305)."""
    yhat, shat, sighat, new_state = holt_winters_additive(yobs, p, state)
    dist = np.asarray(yobs, dtype=np.float64) - yhat
    sq = shat
    sv = yhat - shat
    return dist, sq, sv, sighat, new_state


def estimate_parameters(
    yobs: np.ndarray,
    m: int,
    alpha0: float = 0.3,
    beta0: float = 0.1,
    gamma0: float = 0.3,
    max_iter: int = 120,
) -> tuple[float, float, float, float]:
    """Fit (alpha, beta, gamma) by minimizing the RMSE of one-step-ahead
    errors of the recurrence — the reference fits the same objective with
    scipy L-BFGS-B (``SqDistAlgorithm.estimate_parameters``, :613-744);
    scipy is unavailable here, so this uses a bounded Nelder-Mead simplex
    (NumPy-only). Runs driver-side (or per-series in a pandas UDF) on a
    sampled chunk; parameters then broadcast to the distributed operator.

    Returns (alpha, beta, gamma, rmse)."""
    y = np.asarray(yobs, dtype=np.float64)

    def rmse(v):
        a, b, g = (float(np.clip(x, 0.0, 1.0)) for x in v)
        p = HWParams(m=m, alpha=a, beta=b, gamma=g)
        yhat, _, _, _ = holt_winters_additive(y, p)
        e = y - yhat
        e = e[~np.isnan(e)]
        return float(np.sqrt(np.mean(e * e))) if e.size else np.inf

    # standard Nelder-Mead (reflect/expand/contract/shrink)
    pts = [np.array([alpha0, beta0, gamma0])]
    for i in range(3):
        q = pts[0].copy()
        q[i] = min(1.0, q[i] + 0.2)
        pts.append(q)
    vals = [rmse(p) for p in pts]
    for _ in range(max_iter):
        order = np.argsort(vals)
        pts = [pts[i] for i in order]
        vals = [vals[i] for i in order]
        centroid = np.mean(pts[:-1], axis=0)
        refl = centroid + (centroid - pts[-1])
        fr = rmse(refl)
        if fr < vals[0]:
            exp = centroid + 2 * (centroid - pts[-1])
            fe = rmse(exp)
            pts[-1], vals[-1] = (exp, fe) if fe < fr else (refl, fr)
        elif fr < vals[-2]:
            pts[-1], vals[-1] = refl, fr
        else:
            contr = centroid + 0.5 * (pts[-1] - centroid)
            fc = rmse(contr)
            if fc < vals[-1]:
                pts[-1], vals[-1] = contr, fc
            else:
                pts = [pts[0]] + [pts[0] + 0.5 * (p - pts[0]) for p in pts[1:]]
                vals = [vals[0]] + [rmse(p) for p in pts[1:]]
        if np.max(np.abs(np.array(vals) - vals[0])) < 1e-10:
            break
    best = np.clip(pts[int(np.argmin(vals))], 0.0, 1.0)
    return float(best[0]), float(best[1]), float(best[2]), float(min(vals))


def estimate_by_series(
    df: DataFrame,
    m: int,
    series_cols: Sequence[str] = ("url", "channel"),
    ts_col: str = "t_us",
    value_col: str = "value",
    alpha0: float = 0.3,
    beta0: float = 0.1,
    gamma0: float = 0.3,
    max_iter: int = 120,
) -> DataFrame:
    """Distributed per-series parameter estimation: one bounded
    Nelder-Mead fit of (alpha, beta, gamma) per series via grouped-Arrow
    ``applyInPandas`` — the reference fits per observatory
    (``SqDistAlgorithm.estimate_parameters``, :613-744); here millions of
    url channels fit in parallel, each group running the exact same
    :func:`estimate_parameters` the driver-side call uses (groups sort by
    timestamp first, so the fp summation order — and therefore the fit —
    is bit-identical to a local run on the same series).

    Output: one row per series ``(series..., alpha, beta, gamma, rmse,
    n_obs)`` — a params table for :func:`sqdist_apply`'s ``params_df``."""
    series_cols = list(series_cols)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        y = pdf[value_col].to_numpy(dtype=np.float64)
        a, b, g, r = estimate_parameters(y, m, alpha0, beta0, gamma0, max_iter)
        out = {c: [pdf[c].iloc[0]] for c in series_cols}
        out.update(
            alpha=[a], beta=[b], gamma=[g], rmse=[r], n_obs=[len(y)]
        )
        return pd.DataFrame(out)

    prefix = ", ".join(f"{c} string" for c in series_cols)
    return df.groupBy(*series_cols).applyInPandas(
        fit,
        schema=(
            f"{prefix}, alpha double, beta double, gamma double, "
            f"rmse double, n_obs long"
        ),
    )


STATE_CHANNEL = "_state"


def sqdist_apply(
    df: DataFrame,
    params: HWParams,
    delta_s: float,
    states: dict[str, str] | DataFrame | None = None,
    series_cols: Sequence[str] = ("url", "channel"),
    ts_col: str = "t_us",
    value_col: str = "value",
    range_start_us: int | None = None,
    range_end_us: int | None = None,
    params_df: DataFrame | None = None,
) -> DataFrame:
    """Distributed SqDist: one sequential recurrence per series via grouped
    Arrow ``applyInPandas``; parallelism across series.

    ``params_df`` (optional) is a per-series smoothing-parameter table
    ``(series_cols..., alpha, beta, gamma)`` — typically the output of
    :func:`estimate_by_series` — overriding ``params``' global values for
    the series it covers (``params`` still supplies m/phi/zthresh/hstep/
    smooth and the fallback for uncovered series). It rides the SAME
    cogrouped side as the state table, so per-series parameters reach
    executors keyed by series like everything else — never a task closure,
    never the driver.

    ``states`` is either a DataFrame ``(series_cols..., state_json)`` —
    the scale path: state stays table-to-table, cogrouped on the series
    key, and never touches the driver — or (small-scale/CLI convenience) a
    dict mapping series key (series cols joined with '|') to an
    ``HWState`` JSON. Either way state reaches executors as a cogrouped
    DataFrame keyed on the series — never a task closure — so shipping
    stays proportional to per-partition series counts at
    millions-of-series scale.

    ``range_start_us``/``range_end_us`` declare the invocation window
    explicitly (grid-aligned). With them, continuity is checked against
    the WINDOW (the reference's misaligned-invocation AlgorithmException,
    ``Controller.py``), while missing data anywhere in the window —
    including at its edges — free-runs as a gap, exactly like the
    reference's NaN-padded traces. Without them, bounds are inferred from
    the present rows (in which case a gap touching a chunk edge is
    indistinguishable from a shorter chunk).

    Output: per-slot rows with channels suffixed ``_Dist/_SQ/_SV/_Sigma``
    plus one ``_state`` row per series whose ``state_json`` the caller
    persists. Off-grid input rows are dropped (the dense-grid contract)."""
    series_cols = list(series_cols)
    delta_us = int(round(delta_s * 1_000_000))
    schema_prefix = ", ".join(f"{c} string" for c in series_cols)
    out_schema = (
        f"{schema_prefix}, {ts_col} long, {value_col} double, state_json string"
    )
    chan_idx = series_cols.index("channel") if "channel" in series_cols else None

    spark = df.sparkSession
    state_schema = (
        ", ".join(f"{c} string" for c in series_cols) + ", prev_state string"
    )
    if isinstance(states, DataFrame):
        state_df = states.select(
            *series_cols, F.col("state_json").alias("prev_state")
        )
    else:
        state_rows = []
        for key, js in (states or {}).items():
            parts = key.rsplit("|", len(series_cols) - 1)
            state_rows.append((*parts, js))
        state_df = spark.createDataFrame(state_rows, state_schema)
    if params_df is not None:
        state_df = state_df.join(
            params_df.select(
                *series_cols,
                F.col("alpha").cast("double"),
                F.col("beta").cast("double"),
                F.col("gamma").cast("double"),
            ),
            series_cols,
            "full_outer",
        )

    def run(key, pdf: pd.DataFrame, spdf: pd.DataFrame) -> pd.DataFrame:
        keyvals = dict(zip(series_cols, (str(k) for k in key)))
        st = (
            HWState.from_json(spdf["prev_state"].iloc[0])
            if len(spdf) and pd.notna(spdf["prev_state"].iloc[0])
            else None
        )
        p = params
        if "alpha" in spdf.columns and len(spdf) and pd.notna(
            spdf["alpha"].iloc[0]
        ):
            from dataclasses import replace

            p = replace(
                params,
                alpha=float(spdf["alpha"].iloc[0]),
                beta=float(spdf["beta"].iloc[0]),
                gamma=float(spdf["gamma"].iloc[0]),
            )
        empty_out = pd.DataFrame(
            {
                **{c: pd.Series(dtype=object) for c in series_cols},
                ts_col: pd.Series(dtype="int64"),
                value_col: pd.Series(dtype="float64"),
                "state_json": pd.Series(dtype=object),
            }
        )
        pdf = pdf.sort_values(ts_col)
        if range_start_us is not None:
            t0 = int(range_start_us)
        elif len(pdf):
            t0 = int(pdf[ts_col].iloc[0])
        else:
            return empty_out
        if range_end_us is not None:
            t1 = int(range_end_us)
        elif len(pdf):
            t1 = int(pdf[ts_col].iloc[-1])
        else:
            return empty_out
        if st is not None and st.next_start_us is not None:
            if st.delta_us != delta_us or t0 != st.next_start_us:
                raise ValueError(
                    f"Inconsistent SqDist state for {'|'.join(keyvals.values())}: "
                    f"window starts {t0} delta {delta_us}, "
                    f"state expects {st.next_start_us} delta {st.delta_us}"
                )
        # densify to the grid (missing/edge slots -> NaN); drop off-grid
        # rows rather than snapping them onto the wrong slot
        n = (t1 - t0) // delta_us + 1
        dense = np.full(n, np.nan)
        if len(pdf):
            tvals = pdf[ts_col].to_numpy(np.int64)
            on_grid = (
                ((tvals - t0) % delta_us == 0) & (tvals >= t0) & (tvals <= t1)
            )
            idx = ((tvals[on_grid] - t0) // delta_us).astype(np.int64)
            dense[idx] = pdf[value_col].to_numpy(np.float64)[on_grid]
        dist, sq, sv, sig, new_state = sqdist_decompose(dense, p, st)
        new_state.next_start_us = t1 + delta_us
        new_state.delta_us = delta_us
        ts = t0 + np.arange(n, dtype=np.int64) * delta_us
        base_ch = keyvals["channel"] if chan_idx is not None else "X"
        frames = []
        for suffix, arr in (
            ("_Dist", dist),
            ("_SQ", sq),
            ("_SV", sv),
            ("_Sigma", sig),
        ):
            d = dict(keyvals)
            if chan_idx is not None:
                d["channel"] = f"{base_ch}{suffix}"
            frames.append(
                pd.DataFrame(
                    {**d, ts_col: ts, value_col: arr, "state_json": None}
                )
            )
        d = dict(keyvals)
        if chan_idx is not None:
            d["channel"] = f"{base_ch}{STATE_CHANNEL}"
        frames.append(
            pd.DataFrame(
                {
                    **d,
                    ts_col: [t1],
                    value_col: [np.nan],
                    "state_json": [new_state.to_json()],
                }
            )
        )
        return pd.concat(frames, ignore_index=True)

    return (
        df.groupBy(*series_cols)
        .cogroup(state_df.groupBy(*series_cols))
        .applyInPandas(run, schema=out_schema)
    )


def split_state_df(
    out: DataFrame, series_cols: Sequence[str] = ("url", "channel")
) -> tuple[DataFrame, DataFrame]:
    """Separate data rows from state rows — fully distributed.

    Returns ``(data_df, state_df)`` where ``state_df`` has columns
    ``(series_cols..., state_json)`` with the ``_state`` channel suffix
    stripped back to the base channel. Nothing is collected: at
    millions-of-series scale the state set is itself a table, persisted
    via ``TierStore.write_state`` and fed back to the next invocation's
    ``sqdist_apply(states=...)`` cogroup — the driver never holds state
    (ref statefile semantics, ``SqDistAlgorithm.py:122-167``, scaled out).
    """
    series_cols = list(series_cols)
    data = out.where(F.col("state_json").isNull()).drop("state_json")
    st = out.where(F.col("state_json").isNotNull())
    if "channel" in series_cols:
        st = st.withColumn(
            "channel",
            F.expr(
                f"substring(channel, 1, length(channel) - {len(STATE_CHANNEL)})"
            ),
        )
    return data, st.select(*series_cols, "state_json")


def split_state_rows(out: DataFrame, series_cols: Sequence[str] = ("url", "channel")):
    """Separate data rows from state rows; returns (data_df, {key: json}).

    Driver-side convenience for small series counts (CLI statefile mode);
    the scale path is ``split_state_df`` which never materializes state on
    the driver."""
    series_cols = list(series_cols)
    data = out.where(F.col("state_json").isNull()).drop("state_json")
    st_rows = out.where(F.col("state_json").isNotNull()).collect()
    states = {}
    for r in st_rows:
        key_parts = []
        for c in series_cols:
            v = r[c]
            if c == "channel" and v.endswith(STATE_CHANNEL):
                v = v[: -len(STATE_CHANNEL)]
            key_parts.append(str(v))
        states["|".join(key_parts)] = r.state_json
    return data, states
