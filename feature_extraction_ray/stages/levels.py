"""Grouping-level derivation + metadata attach (M11–M13, J1/J2).

The reference's ``group_audio_files.add_feature_id`` (``microsoft_asr_
features/group_audio_files.py:16-51``) joins a metadata table onto
segments, filters by call type, and derives the group key for the chosen
level in the ``segment < call < day < week < subject`` hierarchy. Here:

* metadata is **broadcast** (``ray.put`` once, dict lookup per batch —
  J1/J2's ``isin`` + ``Series.map`` became one vectorized pass);
* the call-type filter (M12: ``is_assessment ∈ {'t','f','all'}``, bool
  coerced to 't'/'f' like ``:31-33``) and the semi-join (M13) happen in
  the same batch fn;
* key derivation (M11): ``call → call_id``; ``day → subject_id_date``;
  ``week → subject_id_week``; ``subject → subject_id`` — date derived by
  truncating ``call_datetime``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

LEVELS = ("segment", "call", "day", "week", "subject")


def derive_level_keys(meta: pd.DataFrame) -> pd.DataFrame:
    """Add day/week/subject key columns to a metadata frame (driver-side;
    the table is small by contract)."""
    meta = meta.copy()
    dt = pd.to_datetime(meta["call_datetime"])
    meta["date"] = dt.dt.date.astype(str)
    meta["day_id"] = meta["subject_id"].astype(str) + "_" + meta["date"]
    meta["week_id"] = (meta["subject_id"].astype(str) + "_w" +
                       meta["week"].astype(str))
    return meta


def add_feature_id(ds: Dataset, metadata: pd.DataFrame, *,
                   level: str = "call", call_type: str = "all",
                   call_col: str = "audio_file_id") -> Dataset:
    """Attach ``feature_id`` per the level; drop rows whose call is not in
    the (filtered) metadata — exactly the reference's semantics."""
    if level not in LEVELS:
        raise ValueError(f"level must be one of {LEVELS}")
    meta = derive_level_keys(metadata)
    if call_type != "all":
        # bool → 't'/'f' coercion as in group_audio_files.py:31-33
        coerced = meta["is_assessment"].map(
            lambda b: "t" if b in (True, "t") else "f")
        meta = meta[coerced == call_type]
    key_col = {"segment": "call_id", "call": "call_id", "day": "day_id",
               "week": "week_id", "subject": "subject_id"}[level]
    lookup = dict(zip(meta["call_id"].astype(str), meta[key_col].astype(str)))
    ref = ray.put(lookup)

    from .partition import broadcast_get

    def attach(batch: pa.Table) -> pa.Table:
        lookup = broadcast_get(ref)        # deserialized once per worker
        calls = batch[call_col].to_pylist()
        keys = [lookup.get(str(c)) for c in calls]
        mask = pa.array([k is not None for k in keys])
        batch = batch.append_column(
            "feature_id", pa.array(
                [k if k is not None else "" for k in keys],
                type=pa.string()))
        return batch.filter(mask)          # M13 semi-join

    return ds.map_batches(attach, batch_format="pyarrow")
