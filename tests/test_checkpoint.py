"""Resume tests: kill after k partitions, resume, byte-compare final
output and manifest digests (SURVEY §5 item 4)."""
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from feature_extraction_ray import fixtures as FX
from feature_extraction_ray.state import checkpoint as CP


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "ckpt")


def _input_ds():
    return rd.from_arrow(FX.gen_tokens(n_rows=300, n_entities=8, seed=31))


def _make_process():
    # closure (pickled by value) — a test-module function would be pickled
    # by reference and fail to import inside Ray workers
    def process(tbl):
        import pyarrow.compute as pc
        return tbl.append_column("n_tok_x2", pc.multiply(tbl["n_tok"], 2))
    return process


_process = _make_process()


def test_full_run_then_resume_is_noop(out_dir):
    stats = CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                               num_buckets=6, input_fingerprint="fp1",
                               process_fn=_process)
    assert stats["rows"] == 300
    written = stats["written"]
    assert CP.missing_partitions(out_dir, "fp1", 6) == \
        [b for b in range(6) if b not in written]
    # buckets with zero rows never produce files; rerun writes nothing new
    stats2 = CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                                num_buckets=6, input_fingerprint="fp1",
                                process_fn=_process)
    assert stats2["rows"] == 0 or set(stats2["written"]).isdisjoint(written)


def test_partial_run_resume_completes_identically(out_dir, tmp_path):
    # full reference run
    ref_dir = str(tmp_path / "ref")
    CP.run_partitioned(_input_ds(), ref_dir, entity_col="entity",
                       num_buckets=6, input_fingerprint="fp1",
                       process_fn=_process)
    ref = CP.read_result(ref_dir).sort_by(
        [("entity", "ascending"), ("doc_id", "ascending")])

    # simulate a crash: run fully, then delete 3 partitions' outputs
    CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                       num_buckets=6, input_fingerprint="fp1",
                       process_fn=_process)
    for pid in [0, 2, 4]:
        for suffix in (".parquet", CP.MANIFEST_SUFFIX):
            p = os.path.join(out_dir, f"part-{pid:05d}{suffix}")
            if os.path.exists(p):
                os.remove(p)
    missing_before = set(CP.missing_partitions(out_dir, "fp1", 6))
    assert {0, 2, 4} <= missing_before

    stats = CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                               num_buckets=6, input_fingerprint="fp1",
                               process_fn=_process)
    assert set(stats["written"]) <= missing_before
    got = CP.read_result(out_dir).sort_by(
        [("entity", "ascending"), ("doc_id", "ascending")])
    assert got.equals(ref)      # byte-identical Arrow content


def test_corrupt_partition_detected_and_rewritten(out_dir):
    CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                       num_buckets=4, input_fingerprint="fp1",
                       process_fn=_process)
    # corrupt one data file (truncate) but keep its manifest
    parts = sorted(p for p in os.listdir(out_dir) if p.endswith(".parquet"))
    victim = os.path.join(out_dir, parts[0])
    with open(victim, "r+b") as f:
        f.truncate(10)
    pid = int(parts[0].split("-")[1].split(".")[0])
    assert pid in CP.missing_partitions(out_dir, "fp1", 4)
    stats = CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                               num_buckets=4, input_fingerprint="fp1",
                               process_fn=_process)
    assert pid in stats["written"]
    assert pid not in CP.missing_partitions(out_dir, "fp1", 4)


def test_resume_with_only_empty_buckets_left(out_dir):
    # 32 buckets over 8 entities: most buckets get ZERO rows and never
    # write a manifest, so they stay "missing" forever. A resume then
    # processes an EMPTY pruned dataset — the stats frame has no columns
    # (regression: KeyError 'partition_id' in run_partitioned).
    stats = CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                               num_buckets=32, input_fingerprint="fp1",
                               process_fn=_process)
    assert stats["rows"] == 300
    assert 0 < len(stats["written"]) <= 8
    stats2 = CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                                num_buckets=32, input_fingerprint="fp1",
                                process_fn=_process)
    assert stats2 == {"written": [], "skipped": stats["written"], "rows": 0}


def test_fingerprint_change_invalidates(out_dir):
    CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                       num_buckets=4, input_fingerprint="fp1",
                       process_fn=_process)
    assert len(CP.missing_partitions(out_dir, "fp2", 4)) == 4


def test_compaction_plan_and_rewrite(tmp_path):
    import glob
    import json
    import os
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from feature_extraction_ray.state.checkpoint import (
        MANIFEST_SUFFIX, compact_checkpoints, plan_compaction)
    sizes = {f"part-{i:03d}.parquet": s for i, s in
             enumerate([500, 300, 300, 200, 100, 1500])}
    plan = plan_compaction(sizes, 1000)
    flat = [f for g in plan for f in g]
    assert sorted(flat) == sorted(sizes)            # exact partition
    assert ["part-005.parquet"] in plan             # oversize stays alone
    for g in plan:
        if len(g) > 1:
            assert sum(sizes[f] for f in g) <= 1000
    assert plan == plan_compaction(sizes, 1000)     # deterministic
    d = str(tmp_path)
    tot = 0
    for i in range(6):
        t = pa.table({"a": pa.array(np.arange(i * 10, i * 10 + 5 + i))})
        tot += len(t)
        pq.write_table(t, os.path.join(d, f"part-{i:03d}.parquet"))
        with open(os.path.join(d, f"part-{i:03d}{MANIFEST_SUFFIX}"),
                  "w") as fh:
            json.dump({"partition": i}, fh)
    res = compact_checkpoints(d, target_bytes=10 << 20)
    pqs = glob.glob(os.path.join(d, "*.parquet"))
    assert sum(len(pq.read_table(p)) for p in pqs) == tot
    assert res["rewritten"] == 6 and len(pqs) == 1
    # old manifests swapped for the compact one
    assert not glob.glob(os.path.join(d, "part-*" + MANIFEST_SUFFIX))
    assert glob.glob(os.path.join(d, "compact-*" + MANIFEST_SUFFIX))


def test_compact_then_resume_is_noop(out_dir):
    """The round-3 resumability hole: compaction must NOT make a resume
    recompute (and re-duplicate) the compacted buckets — compact
    manifests carry partition_ids + input_fingerprint, and
    verified_partitions credits them against the compact file."""
    CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                       num_buckets=6, input_fingerprint="fp1",
                       process_fn=_process)
    ref = CP.read_result(out_dir).sort_by(
        [("entity", "ascending"), ("doc_id", "ascending")])
    done_before = CP.verified_partitions(out_dir, "fp1")
    res = CP.compact_checkpoints(out_dir, target_bytes=1 << 30)
    assert res["rewritten"] > 0
    # compacted buckets still credited — resume recomputes NOTHING
    assert CP.verified_partitions(out_dir, "fp1") == done_before
    stats = CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                               num_buckets=6, input_fingerprint="fp1",
                               process_fn=_process)
    assert stats["written"] == [] and stats["rows"] == 0
    got = CP.read_result(out_dir).sort_by(
        [("entity", "ascending"), ("doc_id", "ascending")])
    assert got.equals(ref)          # no duplicated rows, identical bytes


def test_compact_crash_leftovers_never_double_count(out_dir):
    """Crash between phase 1 (compact files written) and phase 2 (source
    removal) leaves both on disk: read_result must skip covered sources,
    and repair_compaction must clean them up."""
    CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                       num_buckets=6, input_fingerprint="fp1",
                       process_fn=_process)
    ref = CP.read_result(out_dir).sort_by(
        [("entity", "ascending"), ("doc_id", "ascending")])
    CP.compact_checkpoints(out_dir, target_bytes=1 << 30)
    # resurrect the covered source parts to simulate the mid-swap crash
    man = next(m for m in CP._load_manifests(out_dir) if "compact_id" in m)
    compact_tbl = pq.read_table(
        os.path.join(out_dir, man["compact_id"] + ".parquet"))
    off = 0
    for g in man["source_parts"]:
        # any content works — covered leftovers must be ignored entirely
        pq.write_table(compact_tbl.slice(off, 2), os.path.join(out_dir, g))
        off += 2
    got = CP.read_result(out_dir).sort_by(
        [("entity", "ascending"), ("doc_id", "ascending")])
    assert got.equals(ref)
    removed = CP.repair_compaction(out_dir)
    assert removed == len(man["source_parts"])
    assert CP.read_result(out_dir).sort_by(
        [("entity", "ascending"), ("doc_id", "ascending")]).equals(ref)


def test_repeated_compaction_never_collides(out_dir):
    """A second compaction pass must pick fresh compact indices — an
    os.replace onto an existing compact file would discard rows."""
    CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                       num_buckets=8, input_fingerprint="fp1",
                       process_fn=_process)
    ref = CP.read_result(out_dir).sort_by(
        [("entity", "ascending"), ("doc_id", "ascending")])
    parts = sorted(p for p in os.listdir(out_dir) if p.endswith(".parquet"))
    assert len(parts) >= 4
    # compact only the first two parts (tiny target groups nothing; use a
    # direct plan by moving the others aside)
    import glob
    held = []
    for p in parts[2:]:
        for suf in (p, p.replace(".parquet", CP.MANIFEST_SUFFIX)):
            src = os.path.join(out_dir, suf)
            if os.path.exists(src):
                held.append((src + ".held", src))
                os.rename(src, src + ".held")
    CP.compact_checkpoints(out_dir, target_bytes=1 << 30)
    for tmp, orig in held:
        os.rename(tmp, orig)
    first = {m["compact_id"] for m in CP._load_manifests(out_dir)
             if "compact_id" in m}
    CP.compact_checkpoints(out_dir, target_bytes=1 << 30)
    second = {m["compact_id"] for m in CP._load_manifests(out_dir)
              if "compact_id" in m}
    assert first < second           # old ids intact, new ids fresh
    got = CP.read_result(out_dir).sort_by(
        [("entity", "ascending"), ("doc_id", "ascending")])
    assert got.equals(ref)
    # and resume still credits everything
    stats = CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                               num_buckets=8, input_fingerprint="fp1",
                               process_fn=_process)
    assert stats["written"] == [] and stats["rows"] == 0


def test_checkpoint_metrics_rollup(out_dir):
    stats = CP.run_partitioned(_input_ds(), out_dir, entity_col="entity",
                               num_buckets=6, input_fingerprint="fp1",
                               process_fn=_process)
    m = CP.checkpoint_metrics(out_dir)
    assert m["partitions"] == len(stats["written"])
    assert m["rows"] == 300
    assert m["bytes"] > 0
    # every fresh partition manifest records its compute+write wall
    assert m["wall_sum_sec"] is not None and m["wall_sum_sec"] > 0
    assert m["wall_max_sec"] <= m["wall_sum_sec"]
    rows_before = m["rows"]
    # compaction supersedes sources: rows/bytes count exactly once
    CP.compact_checkpoints(out_dir, target_bytes=1 << 30)
    m2 = CP.checkpoint_metrics(out_dir)
    assert m2["rows"] == rows_before
    assert m2["partitions"] == m["partitions"]
