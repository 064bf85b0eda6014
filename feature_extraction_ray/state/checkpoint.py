"""Per-partition checkpoints with lineage manifests — resumable output.

North-rule requirement: "resumable from per-partition checkpoints carrying
lineage manifests (partition id, input file offsets, row counts, digest)".
The reference's closest artifact is its per-key output files
(``microsoft_asr_features/extract_timing_features.py:183-184``) which a
rerun silently overwrites and a failed SLURM task silently omits
(SURVEY §4); this module makes the layout an actual checkpoint:

* each bucket/partition writes ``part-{pid}.parquet`` ATOMICALLY (tmp file
  + rename) from inside its own Ray task, plus a
  ``part-{pid}.manifest.json`` carrying
  ``{partition_id, row_count, file_sha256, file_bytes,
  input_fingerprint, schema_names}``;
* a resumed run verifies each manifest (file present, size+sha match,
  same ``input_fingerprint``) and processes ONLY the missing buckets;
* the overall run is complete when every expected partition id has a
  verified manifest (``missing_partitions``).

The unit of restart is a partition, the same unit as the shuffle — so a
crash wastes at most one bucket of work, at any scale.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable, Sequence

import pyarrow as pa
import pyarrow.parquet as pq

from ray.data import Dataset

from ..stages.partition import BUCKET_COL, with_bucket

MANIFEST_SUFFIX = ".manifest.json"


def _sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _part_paths(out_dir: str, pid: int):
    return (os.path.join(out_dir, f"part-{pid:05d}.parquet"),
            os.path.join(out_dir, f"part-{pid:05d}{MANIFEST_SUFFIX}"))


def write_partition(tbl: pa.Table, out_dir: str, pid: int,
                    input_fingerprint: str,
                    wall_sec: float | None = None) -> dict:
    """Atomically write one partition + its manifest; returns the
    manifest. ``wall_sec`` (optional) records the caller's compute+write
    wall for this partition — the per-partition metric a resumed or
    monitored run reads via :func:`checkpoint_metrics`."""
    data_path, man_path = _part_paths(out_dir, pid)
    tmp = data_path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, data_path)
    manifest = {
        "partition_id": pid,
        "row_count": len(tbl),
        "file_bytes": os.path.getsize(data_path),
        "file_sha256": _sha256_file(data_path),
        "input_fingerprint": input_fingerprint,
        "schema_names": tbl.schema.names,
    }
    if wall_sec is not None:
        manifest["wall_sec"] = round(float(wall_sec), 6)
    tmp_m = man_path + ".tmp"
    with open(tmp_m, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_m, man_path)
    return manifest


def _load_manifests(out_dir: str) -> list[dict]:
    out = []
    if not os.path.isdir(out_dir):
        return out
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith(MANIFEST_SUFFIX):
            continue
        try:
            with open(os.path.join(out_dir, name)) as f:
                out.append(json.load(f))
        except (json.JSONDecodeError, OSError):
            continue
    return out


def _file_verifies(path: str, file_bytes: int, file_sha256: str) -> bool:
    return (os.path.exists(path)
            and os.path.getsize(path) == file_bytes
            and _sha256_file(path) == file_sha256)


def verified_partitions(out_dir: str, input_fingerprint: str) -> set[int]:
    """Partition ids whose checkpoint verifies (manifest + data intact and
    produced from the same input).

    Credits BOTH per-partition ``part-*.parquet`` checkpoints and
    compacted ``compact-*.parquet`` files (whose manifests carry the
    covered partition ids + the input fingerprint they were produced
    from) — so a resume after :func:`compact_checkpoints` does not
    recompute, and re-reading never duplicates rows."""
    done: set[int] = set()
    for m in _load_manifests(out_dir):
        if "partition_id" in m:                       # per-partition
            if m.get("input_fingerprint") != input_fingerprint:
                continue
            data_path, _ = _part_paths(out_dir, m["partition_id"])
            if _file_verifies(data_path, m["file_bytes"], m["file_sha256"]):
                done.add(int(m["partition_id"]))
        elif "compact_id" in m:                       # compacted group
            if m.get("input_fingerprint") != input_fingerprint:
                continue
            data_path = os.path.join(out_dir, m["compact_id"] + ".parquet")
            if _file_verifies(data_path, m["file_bytes"], m["file_sha256"]):
                done.update(int(p) for p in m["partition_ids"])
    return done


def missing_partitions(out_dir: str, input_fingerprint: str,
                       num_buckets: int) -> list[int]:
    done = verified_partitions(out_dir, input_fingerprint)
    return [b for b in range(num_buckets) if b not in done]


def verified_files(out_dir: str, input_fingerprint: str) -> list[str]:
    """Data-file paths backing the VERIFIED partitions of a checkpoint
    directory — the Dataset-scale counterpart of :func:`read_result`:
    feed the list to ``ray.data.read_parquet`` so a downstream stage
    consumes a checkpointed stage's output without driver
    materialization. Honors compaction lineage (a ``part-*.parquet``
    named in a verified compact manifest's ``source_parts`` is a crash
    leftover and is excluded, so rows are never double-read)."""
    covered: set[str] = set()
    cands: list[str] = []
    for m in _load_manifests(out_dir):
        if m.get("input_fingerprint") != input_fingerprint:
            continue
        if "partition_id" in m:
            path, _ = _part_paths(out_dir, int(m["partition_id"]))
        elif "compact_id" in m:
            path = os.path.join(out_dir, m["compact_id"] + ".parquet")
        else:
            continue
        if _file_verifies(path, m["file_bytes"], m["file_sha256"]):
            cands.append(path)
            if "compact_id" in m:
                covered.update(m.get("source_parts", []))
    return sorted(p for p in cands if os.path.basename(p) not in covered)


def run_partitioned(ds: Dataset, out_dir: str, *, entity_col: str,
                    num_buckets: int, input_fingerprint: str,
                    process_fn: Callable[[pa.Table], pa.Table] | None = None,
                    precomputed_bucket: bool = False,
                    ) -> dict:
    """Resumable partitioned run: bucket ``ds`` by entity, process each
    bucket with ``process_fn``, write per-bucket checkpoint files; buckets
    already verified on disk are PRUNED BEFORE COMPUTE (filtered right
    after bucket assignment, so their rows never shuffle).

    ``precomputed_bucket=True``: ``entity_col`` already HOLDS the
    partition id (ints in ``[0, num_buckets)``) — no hashing, so the
    on-disk partition layout follows the caller's semantics (e.g.
    contiguous training-shard ranges) instead of a hash scatter.

    Returns ``{"written": [...], "skipped": [...], "rows": int}``.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = verified_partitions(out_dir, input_fingerprint)
    todo = [b for b in range(num_buckets) if b not in done]
    if not todo:
        return {"written": [], "skipped": sorted(done), "rows": 0}

    if precomputed_bucket:
        def assign(t: pa.Table) -> pa.Table:
            return t.append_column(
                BUCKET_COL, t[entity_col].cast(pa.int32()))
        bucketed = ds.map_batches(assign, batch_format="pyarrow")
    else:
        bucketed = with_bucket(ds, entity_col, num_buckets)
    todo_arr = pa.array(todo, type=pa.int32())
    import pyarrow.compute as pc
    pruned = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t[BUCKET_COL], value_set=todo_arr)),
        batch_format="pyarrow")

    def process_and_write(tbl: pa.Table) -> pa.Table:
        import time as _time
        t0 = _time.perf_counter()
        pid = int(tbl[BUCKET_COL][0].as_py())
        body = tbl.drop_columns([BUCKET_COL])
        if process_fn is not None:
            body = process_fn(body)
        m = write_partition(body, out_dir, pid, input_fingerprint,
                            wall_sec=_time.perf_counter() - t0)
        return pa.table({
            "partition_id": pa.array([pid], type=pa.int64()),
            "row_count": pa.array([m["row_count"]], type=pa.int64()),
        })

    stats = pruned.groupby(BUCKET_COL).map_groups(
        process_and_write, batch_format="pyarrow").to_pandas()
    # Empty-bucket resume: buckets with zero input rows never write a
    # manifest, so they stay in `todo` forever — and the pruned dataset is
    # then EMPTY, yielding a zero-column DataFrame (no "partition_id").
    return {
        "written": sorted(stats["partition_id"].tolist()) if len(stats) else [],
        "skipped": sorted(done),
        "rows": int(stats["row_count"].sum()) if len(stats) else 0,
    }


def checkpoint_metrics(out_dir: str) -> dict:
    """Roll up the per-partition manifests into run metrics: partitions
    done, total rows/bytes, and the wall-time distribution (sum, max,
    mean over manifests that recorded ``wall_sec``) — the
    'per-partition lineage + metrics' surface a monitoring or resume
    pass reads without touching the data files. Compact manifests
    contribute rows/bytes once (their sources are superseded)."""
    mans = [m for m in _load_manifests(out_dir)
            if "partition_id" in m or "compact_id" in m]
    superseded: set[str] = set()
    for m in mans:
        if "compact_id" in m:
            superseded.update(m.get("source_parts", []))
    rows = bytes_ = 0
    walls = []
    pids: set[int] = set()
    for m in mans:
        if "compact_id" in m:
            rows += m.get("row_count", 0)
            bytes_ += m.get("file_bytes", 0)
            pids.update(m.get("partition_ids", []))
            continue
        name = f"part-{m['partition_id']:05d}.parquet"
        if name in superseded:
            continue
        rows += m.get("row_count", 0)
        bytes_ += m.get("file_bytes", 0)
        pids.add(m["partition_id"])
        if "wall_sec" in m:
            walls.append(m["wall_sec"])
    return {
        "partitions": len(pids),
        "rows": rows,
        "bytes": bytes_,
        "wall_sum_sec": round(sum(walls), 6) if walls else None,
        "wall_max_sec": round(max(walls), 6) if walls else None,
        "wall_mean_sec": round(sum(walls) / len(walls), 6)
        if walls else None,
    }


def read_result(out_dir: str) -> pa.Table:
    """Read all checkpointed partitions back as one Arrow table (tests).

    Honors compaction lineage: any ``part-*.parquet`` named in a compact
    manifest's ``source_parts`` is a leftover from a crash between the
    compact write and the source-removal phase — it is skipped, so rows
    are never double-counted."""
    covered: set[str] = set()
    for m in _load_manifests(out_dir):
        if "compact_id" in m:
            covered.update(m.get("source_parts", []))
    parts = sorted(p for p in os.listdir(out_dir)
                   if p.endswith(".parquet") and p not in covered)
    return pa.concat_tables([pq.read_table(os.path.join(out_dir, p))
                             for p in parts], promote_options="default")


def input_fingerprint_of(paths: Sequence[str]) -> str:
    """Lineage fingerprint of the input files: path + size + mtime_ns."""
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def plan_compaction(sizes: dict, target_bytes: int) -> list:
    """First-fit-decreasing bin packing of partition files into
    compaction groups of ≈ ``target_bytes``: the small-files planner a
    100-TB checkpointed output needs after skewed partitions produce
    KB-scale parquet next to GB-scale ones. Files already ≥ target
    stay alone; the plan is deterministic (size desc, name asc).
    Returns a list of lists of file names — groups of length 1 need no
    rewrite."""
    items = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))
    bins: list = []          # (remaining, [names])
    for name, sz in items:
        if sz >= target_bytes:
            bins.append([target_bytes * 0, [name]])
            continue
        placed = False
        for b in bins:
            if b[0] >= sz:
                b[0] -= sz
                b[1].append(name)
                placed = True
                break
        if not placed:
            bins.append([target_bytes - sz, [name]])
    return [sorted(b[1]) for b in bins]


def repair_compaction(out_dir: str) -> int:
    """Remove leftover ``part-*`` files already covered by a verified
    compact file (a crash between the compact-write phase and the
    source-removal phase leaves both on disk). Returns the number of
    leftover data files removed. Safe to call any time — it only deletes
    a source part when its compact file verifies byte-for-byte."""
    removed = 0
    for m in _load_manifests(out_dir):
        if "compact_id" not in m:
            continue
        data_path = os.path.join(out_dir, m["compact_id"] + ".parquet")
        if not _file_verifies(data_path, m["file_bytes"], m["file_sha256"]):
            continue
        for g in m.get("source_parts", []):
            p = os.path.join(out_dir, g)
            if os.path.exists(p):
                os.remove(p)
                removed += 1
            mp = os.path.join(out_dir, g.replace(".parquet", MANIFEST_SUFFIX))
            if os.path.exists(mp):
                os.remove(mp)
    return removed


def _next_compact_index(out_dir: str) -> int:
    """First compact index never used in this directory — compact file
    names must not collide across compaction runs (an ``os.replace``
    onto an existing compact-{i}.parquet would silently discard the
    previously compacted rows)."""
    mx = -1
    for name in os.listdir(out_dir):
        if name.startswith("compact-"):
            stem = name.split(".")[0]        # compact-00003
            try:
                mx = max(mx, int(stem.split("-")[1]))
            except (IndexError, ValueError):
                continue
    return mx + 1


def compact_checkpoints(out_dir: str, target_bytes: int = 128 << 20):
    """Compact a checkpointed output directory in place: pack its
    ``part-*.parquet`` files into ≈ ``target_bytes`` groups
    (:func:`plan_compaction`), stream-rewrite each multi-file group to
    one ``compact-{i}.parquet`` (per-group Arrow concat — groups are
    ≤ target by construction, never the whole dataset), verify row
    counts, then swap. Crash-safe two-phase commit:

    1. ALL compact files + their manifests are written (atomic per file);
       each compact manifest carries the covered ``partition_ids``,
       ``input_fingerprint``, ``source_parts`` and the compact file's
       sha/bytes — so :func:`verified_partitions` keeps crediting the
       compacted buckets (resume does not recompute) and
       :func:`read_result` never double-counts leftovers.
    2. Only after the whole plan succeeds are the source parts and their
       manifests removed (a crash mid-phase-2 is healed by
       :func:`repair_compaction`, which this function runs first).

    Compact indices continue from the directory's max existing index, so
    repeated compaction passes never collide. Single-file groups are
    left untouched. Returns ``{"groups": g, "rewritten": r, "rows": n}``."""
    import glob

    repair_compaction(out_dir)
    files = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    sizes = {os.path.basename(f): os.path.getsize(f) for f in files}
    # lineage of each source part (partition id + fingerprint) rides into
    # the compact manifest so resumability survives compaction
    part_meta: dict[str, dict] = {}
    for m in _load_manifests(out_dir):
        if "partition_id" in m:
            part_meta[f"part-{int(m['partition_id']):05d}.parquet"] = m
    plan = plan_compaction(sizes, target_bytes)
    base = _next_compact_index(out_dir)
    rewritten = rows_total = 0
    staged: list[list[str]] = []    # phase-2 deletions, only on full success
    idx = base
    for group in plan:
        if len(group) < 2:
            continue
        paths = [os.path.join(out_dir, g) for g in group]
        tabs = [pq.read_table(p) for p in paths]
        merged = pa.concat_tables(tabs, promote_options="default")
        n_in = sum(len(t) for t in tabs)
        assert len(merged) == n_in
        cid = f"compact-{idx:05d}"
        idx += 1
        dst = os.path.join(out_dir, cid + ".parquet")
        tmp = dst + ".tmp"
        pq.write_table(merged, tmp)
        os.replace(tmp, dst)
        metas = [part_meta.get(g) for g in group]
        fps = {mm["input_fingerprint"] for mm in metas if mm}
        man = {
            "compact_id": cid,
            "row_count": n_in,
            "partition_ids": sorted(int(mm["partition_id"])
                                    for mm in metas if mm),
            # a group only ever packs parts from one run; if manifests
            # are missing/mixed, record no fingerprint — the buckets then
            # recompute (safe direction)
            "input_fingerprint": fps.pop() if len(fps) == 1 else None,
            "source_parts": group,
            "file_bytes": os.path.getsize(dst),
            "file_sha256": _sha256_file(dst),
            "schema_names": merged.schema.names,
        }
        tmp_m = os.path.join(out_dir, cid + MANIFEST_SUFFIX + ".tmp")
        with open(tmp_m, "w") as fh:
            json.dump(man, fh)
        os.replace(tmp_m, os.path.join(out_dir, cid + MANIFEST_SUFFIX))
        staged.append(group)
        rewritten += len(group)
        rows_total += n_in
    for group in staged:            # phase 2: all compact files landed
        for g in group:
            p = os.path.join(out_dir, g)
            if os.path.exists(p):
                os.remove(p)
            mp = os.path.join(out_dir, g.replace(".parquet", MANIFEST_SUFFIX))
            if os.path.exists(mp):
                os.remove(mp)
    return {"groups": len(plan), "rewritten": rewritten,
            "rows": rows_total}
