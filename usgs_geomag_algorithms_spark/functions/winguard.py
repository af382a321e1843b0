"""Runtime guard for partition-less (global) window sites.

Policy (enforced by ``tests/test_plan_audit.py::TestGlobalWindowAudit``):
a ``WindowExec`` with no partition spec moves the whole relation to one
task, so it is banned on bulk paths.  The audited exceptions are
relations whose cardinality is bounded by a *domain*, not by data volume
(per-event-type aggregates, per-calendar-hour tiers, per-bucket boundary
remainders) — and every such site must either

1. sit above an explicit ``limit`` (literally bounded in the plan), or
2. wrap its output in :func:`guard_bounded`, which fails the job at run
   time if the relation ever outgrows its documented bound (instead of
   silently serializing a bulk relation through one task).

The guard is pure Catalyst: a ``count(*)`` over the same single
partition (already resident on one task — the extra pass over a bounded
relation is noise) feeding a ``raise_error`` with the :data:`MARKER`
string, which also makes guarded plans mechanically recognizable to the
plan audit.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, functions as F

#: appears in the raise_error literal of every guarded plan — the plan
#: audit accepts a partition-less Window only when its plan carries this
#: marker (or a limit below the window).  Keep in sync with
#: tests/test_plan_audit.py.
MARKER = "bounded-global-window"

#: default cardinality ceiling: far above any domain-bounded relation
#: (event types, calendar hours, merge buckets), far below anything that
#: scales with corpus volume.
DEFAULT_BOUND = 1_000_000


def guard_bounded(col: Column, bound: int = DEFAULT_BOUND, what: str = "") -> Column:
    """Wrap ``col`` (an output column of a global-window computation) so
    the job fails loudly when the windowed relation exceeds ``bound``
    rows.  Attach to ONE output column per window site — the check is
    per-row identical, Catalyst evaluates the shared count window once."""
    n = F.count(F.lit(1)).over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return F.when(
        n > int(bound),
        F.raise_error(
            F.concat(
                F.lit(f"{MARKER} overflow ({what or 'global window'}): "),
                n.cast("string"),
                F.lit(f" rows > documented bound {int(bound)}"),
            )
        ),
    ).otherwise(col)
