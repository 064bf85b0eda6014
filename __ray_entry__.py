"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (read tokens → as-of join → fused
sessionize/lag/sliding → per-session feature rows) on sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY §2 with DuckDB-checkable oracles where SQL-expressible.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; returns a Dataset of
    one wide feature row per (source, session)."""
    from feature_extraction_ray.pipelines.flagship import flagship
    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from feature_extraction_ray.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from feature_extraction_ray.pipelines.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
