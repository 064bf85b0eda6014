"""Sinks (S9–S13): partitioned parquet writers + column-subset re-export.

The reference's writers — one CSV per feature set
(``extract_text_features.py:126-129``), one CSV per group key
(``extract_timing_features.py:167-184``), the scatter/gather merge job
(``agg_timing_features.py:16-39``) and the column-subset re-exporter
(``timing_features/get_call_act_features.py:26-32``) — collapse into two
engine idioms:

* :func:`write_features` — partitioned parquet via ``Dataset.write_parquet``
  (many part files; resumable layout; no merge job needed because the
  shuffle key IS the group key).
* checkpointed per-partition output with lineage =
  ``state.checkpoint.run_partitioned`` (the per-key-file layout retained
  as the checkpoint unit, SURVEY §3.2).
"""

from __future__ import annotations

from typing import Sequence

from ray.data import Dataset


def write_features(ds: Dataset, out_dir: str,
                   partition_cols: Sequence[str] | None = None,
                   min_rows_per_file: int | None = None) -> None:
    """Write a feature Dataset as partitioned parquet (never one big file)."""
    kwargs = {}
    if partition_cols:
        kwargs["partition_cols"] = list(partition_cols)
    if min_rows_per_file:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(out_dir, **kwargs)


def reexport_columns(in_path: str, out_dir: str,
                     columns: Sequence[str]) -> None:
    """S13: read a feature table, keep a column subset, rewrite
    (``get_call_act_features.py:26-32`` analog)."""
    import ray.data as rd
    rd.read_parquet(in_path, columns=list(columns)).write_parquet(out_dir)


def read_manifest(path: str) -> list[str]:
    """S1: text file of input paths → list (``extract_text_features.py:
    222-227``); feed the list straight to ``ray.data.read_parquet``."""
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]
