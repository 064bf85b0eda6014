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
                    input_fingerprint: str) -> dict:
    """Atomically write one partition + its manifest; returns the manifest."""
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
    tmp_m = man_path + ".tmp"
    with open(tmp_m, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_m, man_path)
    return manifest


def verified_partitions(out_dir: str, input_fingerprint: str) -> set[int]:
    """Partition ids whose checkpoint verifies (manifest + data intact and
    produced from the same input)."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if not name.endswith(MANIFEST_SUFFIX):
            continue
        man_path = os.path.join(out_dir, name)
        try:
            with open(man_path) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if m.get("input_fingerprint") != input_fingerprint:
            continue
        data_path, _ = _part_paths(out_dir, m["partition_id"])
        if not os.path.exists(data_path):
            continue
        if os.path.getsize(data_path) != m["file_bytes"]:
            continue
        if _sha256_file(data_path) != m["file_sha256"]:
            continue
        done.add(int(m["partition_id"]))
    return done


def missing_partitions(out_dir: str, input_fingerprint: str,
                       num_buckets: int) -> list[int]:
    done = verified_partitions(out_dir, input_fingerprint)
    return [b for b in range(num_buckets) if b not in done]


def run_partitioned(ds: Dataset, out_dir: str, *, entity_col: str,
                    num_buckets: int, input_fingerprint: str,
                    process_fn: Callable[[pa.Table], pa.Table] | None = None,
                    ) -> dict:
    """Resumable partitioned run: bucket ``ds`` by entity, process each
    bucket with ``process_fn``, write per-bucket checkpoint files; buckets
    already verified on disk are PRUNED BEFORE COMPUTE (filtered right
    after bucket assignment, so their rows never shuffle).

    Returns ``{"written": [...], "skipped": [...], "rows": int}``.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = verified_partitions(out_dir, input_fingerprint)
    todo = [b for b in range(num_buckets) if b not in done]
    if not todo:
        return {"written": [], "skipped": sorted(done), "rows": 0}

    bucketed = with_bucket(ds, entity_col, num_buckets)
    todo_arr = pa.array(todo, type=pa.int32())
    import pyarrow.compute as pc
    pruned = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t[BUCKET_COL], value_set=todo_arr)),
        batch_format="pyarrow")

    def process_and_write(tbl: pa.Table) -> pa.Table:
        pid = int(tbl[BUCKET_COL][0].as_py())
        body = tbl.drop_columns([BUCKET_COL])
        if process_fn is not None:
            body = process_fn(body)
        m = write_partition(body, out_dir, pid, input_fingerprint)
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


def read_result(out_dir: str) -> pa.Table:
    """Read all checkpointed partitions back as one Arrow table (tests)."""
    parts = sorted(p for p in os.listdir(out_dir) if p.endswith(".parquet"))
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


def compact_checkpoints(out_dir: str, target_bytes: int = 128 << 20):
    """Compact a checkpointed output directory in place: pack its
    ``part-*.parquet`` files into ≈ ``target_bytes`` groups
    (:func:`plan_compaction`), stream-rewrite each multi-file group to
    one ``compact-{i}.parquet`` (per-group Arrow concat — groups are
    ≤ target by construction, never the whole dataset), verify row
    counts, then swap: originals and their manifests are removed and
    one ``compact-{i}.manifest.json`` written per group. Single-file
    groups are left untouched. Returns
    ``{"groups": g, "rewritten": r, "rows": n}``."""
    import glob
    import json
    import os
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    sizes = {os.path.basename(f): os.path.getsize(f) for f in files}
    plan = plan_compaction(sizes, target_bytes)
    rewritten = rows_total = 0
    for i, group in enumerate(plan):
        if len(group) < 2:
            continue
        paths = [os.path.join(out_dir, g) for g in group]
        tabs = [pq.read_table(p) for p in paths]
        merged = pa.concat_tables(tabs, promote_options="default")
        n_in = sum(len(t) for t in tabs)
        assert len(merged) == n_in
        dst = os.path.join(out_dir, f"compact-{i}.parquet")
        tmp = dst + ".tmp"
        pq.write_table(merged, tmp)
        os.replace(tmp, dst)
        man = {"partition": f"compact-{i}", "rows": n_in,
               "source_parts": group,
               "bytes": os.path.getsize(dst)}
        with open(os.path.join(out_dir,
                               f"compact-{i}{MANIFEST_SUFFIX}"),
                  "w") as fh:
            json.dump(man, fh)
        for p, g in zip(paths, group):
            os.remove(p)
            mp = os.path.join(
                out_dir, g.replace(".parquet", MANIFEST_SUFFIX))
            if os.path.exists(mp):
                os.remove(mp)
        rewritten += len(group)
        rows_total += n_in
    return {"groups": len(plan), "rewritten": rewritten,
            "rows": rows_total}
