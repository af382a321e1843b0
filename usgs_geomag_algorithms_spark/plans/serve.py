"""Serving layer: range reads over materialized tiers — the engine's analog
of the reference web service's ``/data`` endpoint
(``geomagio/api/ws/data.py:156-194``), which never recomputes: it reads the
already-materialized tier, derives missing channels, pads explicit gap rows,
and renders.

Composition: partition-pruned store read -> optional derive-on-read ->
spine pad (serving returns explicit gap rows, unlike the bulk path) ->
IMFJSON or wide frame. A request cap mirrors the reference's 345,600-sample
limit (``geomagio/api/ws/DataApiQuery.py:15,121-124``)."""

from __future__ import annotations

from collections.abc import Sequence

from ..operators.spine import pad_to_spine
from ..sources.imfjson import to_imfjson
from ..sources.store import TierStore
from ..tiers import INTERVAL_SECONDS, US

REQUEST_LIMIT_SAMPLES = 345_600


def get_timeseries(
    store: TierStore,
    tier: str,
    start_us: int,
    end_us: int,
    urls: Sequence[str] | None = None,
    channels: Sequence[str] | None = None,
    pad: bool = True,
    as_json: bool = False,
):
    """Serve one tier over [start_us, end_us] with explicit gap rows."""
    delta_s = INTERVAL_SECONDS[tier] if tier in INTERVAL_SECONDS else 60.0
    n_samples = int((end_us - start_us) / (delta_s * US)) + 1
    if n_samples > REQUEST_LIMIT_SAMPLES:
        raise ValueError(
            f"request exceeds {REQUEST_LIMIT_SAMPLES} samples ({n_samples})"
        )
    df = store.read(tier, start_us, end_us)
    if urls:
        df = df.where(df.url.isin(list(urls)))
    if channels:
        df = df.where(df.channel.isin(list(channels)))
    if pad:
        df = pad_to_spine(
            df, start_us, end_us, delta_s, series_cols=store.series_cols
        )
    if as_json:
        return to_imfjson(df, series_cols=store.series_cols)
    return df
