"""Incremental continuous-aggregate maintenance (the reference's
``Controller.run_as_update`` re-imagined for materialized tier tables).

Reference behavior (``geomagio/Controller.py:326-474``): read the OUTPUT
store over the requested window, find the merged gaps, and for each gap
(oldest first) re-read the widened input interval, recompute, and write;
when a gap touches the window start, recursively step one window earlier,
bounded by ``update_limit``. Stateless algorithms only (``:377-378``).

Engine version:

- output gaps come from one aggregate over the output tier (which output
  grid slots have NO valid value for ANY series — cross-series merged gaps)
- each gap is recomputed via the cascade step with the plan-time widened
  input scan (partition-pruned read from the input tier) and upserted
  (last-wins; deterministic recompute makes re-runs idempotent)
- every completed gap appends a lineage record {run_id, tier, gap, input
  coverage, rows} and advances a checkpoint file; a killed job resumes by
  skipping gaps the checkpoint already covers
- metrics (rows written, gaps filled, wall) are returned and persisted
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from ..operators.rollup import rollup_step
from ..sources.store import TierStore
from ..tiers import Step


def _checkpoint_path(store: TierStore, tier_out: str) -> str:
    return f"{store.root}/_checkpoint_{tier_out}.json"


def load_checkpoint(store: TierStore, tier_out: str) -> dict:
    p = _checkpoint_path(store, tier_out)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"completed": []}


def save_checkpoint(store: TierStore, tier_out: str, state: dict) -> None:
    p = _checkpoint_path(store, tier_out)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, sort_keys=True)
    os.replace(tmp, p)


def output_grid_bounds(step: Step, start_us: int, end_us: int) -> tuple[int, int]:
    """First/last expected output stamps inside [start_us, end_us]."""
    out_us = step.out_us
    grid0 = -(-(start_us - step.stamp_offset_us) // out_us) * out_us + step.stamp_offset_us
    grid1 = (end_us - step.stamp_offset_us) // out_us * out_us + step.stamp_offset_us
    return grid0, grid1


def find_output_gaps(
    store: TierStore,
    tier_out: str,
    step: Step,
    start_us: int,
    end_us: int,
    tier_in: str | None = None,
) -> list[tuple[int, int]]:
    """Gap intervals on the output grid within [start_us, end_us].

    Presence = an output ROW exists (even a masked NULL one) — the rollup
    materializes NULL rows for eligible-but-undercovered windows, so
    "computed but masked" is distinguishable from "never computed" and
    legitimately-masked slots are not recomputed on every run.

    With ``tier_in``, presence is checked PER SERIES (union semantics, the
    reference's ``get_merged_gaps`` across channels): a slot is a gap when
    any series that has input rows in the slot's window lacks an output
    row. Without it, a slot that one series already covered would hide
    another series' late-arriving data forever."""
    grid0, grid1 = output_grid_bounds(step, start_us, end_us)
    out_us = step.out_us
    if grid1 < grid0:
        return []
    expected = list(range(grid0, grid1 + 1, out_us))
    present: set[int] = set()
    if store.exists(tier_out):
        out_rows = store.read(tier_out, grid0, grid1)
        if tier_in is not None and store.exists(tier_in):
            in_lo, in_hi = step.input_interval_us(grid0, grid1)
            spark = out_rows.sparkSession
            slots_df = spark.createDataFrame(
                [(t,) for t in expected], "t_us long"
            )
            expected_pairs = (
                store.read(tier_in, in_lo, in_hi)
                .select(*store.series_cols)
                .distinct()
                .crossJoin(F.broadcast(slots_df))
            )
            missing = expected_pairs.join(
                out_rows.select(*store.series_cols, "t_us").distinct(),
                [*store.series_cols, "t_us"],
                "left_anti",
            )
            missing_slots = {r.t_us for r in missing.select("t_us").distinct().collect()}
            present = set(expected) - missing_slots
        else:
            rows = out_rows.select("t_us").distinct().collect()
            present = {r.t_us for r in rows}
    gaps: list[tuple[int, int]] = []
    cur: list[int] | None = None
    for t in expected:
        if t not in present:
            if cur is None:
                cur = [t, t]
            else:
                cur[1] = t
        elif cur is not None:
            gaps.append((cur[0], cur[1]))
            cur = None
    if cur is not None:
        gaps.append((cur[0], cur[1]))
    return gaps


def run_as_update(
    store: TierStore,
    tier_in: str,
    tier_out: str,
    step: Step,
    start_us: int,
    end_us: int,
    update_limit: int = 1,
    run_id: str | None = None,
) -> dict:
    """Fill output gaps in [start_us, end_us]; when a gap touches the window
    start, step one window earlier (up to ``update_limit`` recursions —
    ref ``Controller.py:427-448``). Oldest gaps fill first. Resumable: gaps
    already in the checkpoint are skipped."""
    run_id = run_id or f"run-{int(time.time() * 1000)}"
    ckpt = load_checkpoint(store, tier_out)
    # checkpoint granularity = output grid slot (stable across runs, unlike
    # gap extents which merge/shrink as data lands)
    done_slots: set[int] = set(ckpt.get("completed", []))
    metrics = {"run_id": run_id, "gaps_filled": 0, "rows_written": 0, "skipped": 0}

    window_us = end_us - start_us + step.out_us
    out_us = step.out_us

    def recompute_run(slots: list[int]) -> None:
        gap = (slots[0], slots[-1])
        in_lo, in_hi = step.input_interval_us(gap[0], gap[1])
        src = store.read(tier_in, in_lo, in_hi)
        out = rollup_step(
            src,
            step,
            range_start_us=in_lo,
            range_end_us=in_hi,
            series_cols=store.series_cols,
        )
        n = out.count()
        if n > 0:
            store.upsert(out, tier_out)
        store.append_lineage(
            tier_out,
            [
                {
                    "run_id": run_id,
                    "tier": tier_out,
                    "gap_start_us": gap[0],
                    "gap_end_us": gap[1],
                    "input_start_us": in_lo,
                    "input_end_us": in_hi,
                    "rows": n,
                    "ts": time.time(),
                }
            ],
        )
        done_slots.update(slots)
        ckpt["completed"] = sorted(done_slots)
        save_checkpoint(store, tier_out, ckpt)
        metrics["gaps_filled"] += 1
        metrics["rows_written"] += n

    def process_window(w_start: int, w_end: int, depth: int) -> None:
        gaps = find_output_gaps(store, tier_out, step, w_start, w_end, tier_in)
        first_slot, _ = output_grid_bounds(step, w_start, w_end)
        for gap in gaps:
            # backfill recursion: a gap at the window's FIRST expected slot
            # means older data may also be missing (ref :427-448) — compare
            # against the slot, not w_start + offset, or unaligned windows
            # never recurse
            if gap[0] <= first_slot and depth < update_limit:
                # earlier window ends at the slot before this window's
                # first slot (equals w_start - out_us when aligned)
                process_window(
                    w_start - window_us, first_slot - step.out_us, depth + 1
                )
            slots = list(range(gap[0], gap[1] + 1, out_us))
            todo = [s for s in slots if s not in done_slots]
            if not todo:
                metrics["skipped"] += 1
                continue
            # regroup remaining slots into contiguous runs
            run: list[int] = []
            for s in todo:
                if run and s - run[-1] != out_us:
                    recompute_run(run)
                    run = []
                run.append(s)
            if run:
                recompute_run(run)

    process_window(start_us, end_us, 0)
    # the slot checkpoint exists to resume a KILLED run; a completed run
    # clears it so the next run re-evaluates gaps fresh (otherwise a slot
    # attempted before its input landed would be skipped forever)
    save_checkpoint(store, tier_out, {"completed": []})
    store.append_lineage(tier_out, [{"run_id": run_id, "metrics": metrics}])
    return metrics


def _months_in_range(start_us: int, end_us: int) -> list[tuple[int, int, int]]:
    from ..operators.month import months_in_range

    return months_in_range(start_us, end_us)


def refresh_month(
    store: TierStore,
    start_us: int,
    end_us: int,
    run_id: str | None = None,
    force: bool = False,
) -> dict:
    """Month-tier ``run_as_update`` analog: recompute calendar months in
    [start_us, end_us] whose stamp is missing from the month tier (or all
    of them with ``force``) from the day tier, and upsert.

    Months are variable-width, so this skips the fixed-grid slot machinery:
    the month list is plan-time driver arithmetic, the recompute is one
    partition-pruned day-tier scan covering the affected months, and the
    upsert is the same last-wins merge — idempotent like the slot path."""
    from ..operators.month import DAY_STAMP_OFF_US, DAY_US, rollup_month

    run_id = run_id or f"run-{int(time.time() * 1000)}"
    months = _months_in_range(start_us, end_us)
    metrics = {"run_id": run_id, "gaps_filled": 0, "rows_written": 0, "skipped": 0}
    if not months:
        return metrics
    if force:
        todo = months
    else:
        have = {
            r.t_us
            for r in store.read("month", months[0][2], months[-1][2])
            .select("t_us")
            .distinct()
            .collect()
        }
        todo = [m for m in months if m[2] not in have]
        metrics["skipped"] = len(months) - len(todo)
    if not todo:
        store.append_lineage("month", [{"run_id": run_id, "metrics": metrics}])
        return metrics
    # one widened day-tier scan covering every affected month completely
    in_lo = todo[0][0] + DAY_STAMP_OFF_US
    last_m0, last_n, _ = todo[-1]
    in_hi = last_m0 + (last_n - 1) * DAY_US + DAY_STAMP_OFF_US
    day = store.read("day", in_lo, in_hi)
    out = rollup_month(day, in_lo, in_hi, series_cols=store.series_cols)
    stamps = [m[2] for m in todo]
    out = out.where(F.col("t_us").isin(stamps))
    n = out.count()
    if n > 0:
        store.upsert(out, "month")
    metrics["gaps_filled"] = len(todo)
    metrics["rows_written"] = n
    store.append_lineage("month", [{"run_id": run_id, "metrics": metrics}])
    return metrics
