"""Feature-store-style point-in-time enrichment.

The canonical training-data retrieval shape (`get_historical_features`
in feature-store systems): one fact table of (entity, event-time) rows
enriched from SEVERAL feature histories, each joined AS OF the fact
timestamp with zero temporal leakage — no feature value may come from
a history row later than the fact's own time (strictly-later when
``allow_exact_matches=False``).

Built by chaining the engine's :func:`~feature_extraction_ray.stages.
asof.asof_join`: each spec is one as-of join, so each history can pick
its own plan (``broadcast=True`` for a small dimension history shipped
once via ``ray.put``; the partitioned bucketed-merge plan for a
large-large join), its own entity key, direction, tolerance and
exact-match policy. The fact table streams through the chain — k
histories cost at most k exchanges (0 for broadcast specs), never a
driver materialization.

Reference analog: the per-call metadata merges the extraction scripts
perform before feature computation (``/root/reference/analysis_util.py``
merge helpers); re-expressed as composable point-in-time joins.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from ray.data import Dataset

from ..stages.asof import asof_join


@dataclass
class FeatureSpec:
    """One feature history to enrich from.

    ``right``: the history Dataset — must be point-in-time keyed, i.e.
    at most one row per (entity, timestamp); pre-aggregate if not.
    ``right_by`` / ``right_on``: its entity and timestamp columns.
    ``value_cols``: columns to attach. ``left_by`` / ``left_on``
    default to the fact table's entity/time columns passed to
    :func:`point_in_time_enrich`. ``broadcast=True`` ships the history
    once via the zero-shuffle broadcast plan."""
    right: Dataset
    right_by: str
    right_on: str
    value_cols: Sequence[str]
    left_by: str | None = None
    left_on: str | None = None
    direction: str = "backward"
    tolerance: object = None
    allow_exact_matches: bool = True
    broadcast: bool = False
    num_buckets: int = 128
    extra: dict = field(default_factory=dict)


def point_in_time_enrich(facts: Dataset, entity_col: str, ts_col: str,
                         specs: Sequence[FeatureSpec]) -> Dataset:
    """Enrich ``facts`` from every history in ``specs``, each AS OF the
    fact's ``ts_col`` — the multi-table feature-store lookup. Returns
    all fact rows plus every spec's ``value_cols`` (null where a
    history has no admissible row). Chained joins preserve earlier
    specs' outputs, so value-column names must be distinct across
    specs (validated loudly)."""
    sch = facts.schema()
    seen: set[str] = set(sch.names) if sch is not None else set()
    out = facts
    for i, sp in enumerate(specs):
        dup = [c for c in sp.value_cols if c in seen]
        if dup:
            raise ValueError(
                f"point_in_time_enrich: spec {i} value columns {dup} "
                "collide with earlier columns — rename upstream")
        seen.update(sp.value_cols)
        out = asof_join(
            out, sp.right,
            left_by=sp.left_by or entity_col,
            right_by=sp.right_by,
            left_on=sp.left_on or ts_col,
            right_on=sp.right_on,
            right_value_cols=list(sp.value_cols),
            direction=sp.direction,
            tolerance=sp.tolerance,
            allow_exact_matches=sp.allow_exact_matches,
            broadcast=sp.broadcast,
            num_buckets=sp.num_buckets,
            **sp.extra)
    return out
