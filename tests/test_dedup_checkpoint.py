"""Resumable minhash dedup: partial crash + resume reproduces the full
run byte-identically, and the checkpointed pipeline matches the
non-checkpointed one (round-3 verdict item 5 — a killed 100-TB dedup
must resume at bucket granularity, wasting at most one bucket per
stage)."""
import glob
import os

import ray.data as rd

from feature_extraction_ray.stages import dedup as DD
from feature_extraction_ray.state import checkpoint as CP

SF = "/root/testdata/sf0.001/documents.parquet"
KW = dict(threshold=0.7, sig_buckets=4, pair_buckets=8, assign_buckets=4)


def _assignment(ckpt_dir):
    return (CP.read_result(os.path.join(ckpt_dir, "assign")).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def test_minhash_checkpointed_resume_identical(ray_session, tmp_path):
    ref_dir = str(tmp_path / "ref")
    s1 = DD.minhash_lsh_dedup_checkpointed(SF, ref_dir, **KW)
    assert s1["sig"]["rows"] == 500
    assert len(s1["pairs"]["written"]) == 8
    assert s1["assign"]["rows"] == 500
    ref = _assignment(ref_dir)

    # parity with the non-checkpointed pipeline
    direct = DD.minhash_lsh_dedup(
        rd.read_parquet(SF, columns=["doc_id", "text"]),
        threshold=0.7, output="pandas")
    assert ref[["doc_id", "cluster_id", "is_duplicate"]].equals(
        direct[["doc_id", "cluster_id", "is_duplicate"]])
    assert ref["is_duplicate"].sum() > 0      # corpus has planted dups

    # crash simulation: kill buckets in EVERY stage (data + manifests)
    out_dir = str(tmp_path / "out")
    DD.minhash_lsh_dedup_checkpointed(SF, out_dir, **KW)
    for f in sorted(glob.glob(os.path.join(out_dir, "sig", "part-00000*"))):
        os.remove(f)
    for f in sorted(glob.glob(os.path.join(out_dir, "pairs",
                                           "part-0000[0-2]*"))):
        os.remove(f)
    for f in glob.glob(os.path.join(out_dir, "assign", "*")):
        os.remove(f)
    s2 = DD.minhash_lsh_dedup_checkpointed(SF, out_dir, **KW)
    assert s2["sig"]["written"] == [0]        # only the killed buckets
    assert s2["pairs"]["written"] == [0, 1, 2]
    assert len(s2["assign"]["written"]) > 0
    got = _assignment(out_dir)
    assert got.equals(ref)                    # byte-identical resume

    # a third run is a complete no-op across all three stages
    s3 = DD.minhash_lsh_dedup_checkpointed(SF, out_dir, **KW)
    for stage in ("sig", "pairs", "assign"):
        assert s3[stage]["written"] == [] and s3[stage]["rows"] == 0


def test_minhash_checkpointed_param_change_invalidates(ray_session,
                                                       tmp_path):
    d = str(tmp_path / "ck")
    s1 = DD.minhash_lsh_dedup_checkpointed(SF, d, **KW)
    fps1 = s1["fingerprints"]
    # a threshold change must invalidate pairs+assign but NOT signatures
    kw2 = dict(KW, threshold=0.9)
    s2 = DD.minhash_lsh_dedup_checkpointed(SF, d, **kw2)
    fps2 = s2["fingerprints"]
    assert fps2["sig"] == fps1["sig"]
    assert fps2["pairs"] != fps1["pairs"]
    assert s2["sig"]["written"] == []         # signatures reused
    assert len(s2["pairs"]["written"]) == 8   # pairs recomputed


def test_verified_files_excludes_mismatched_fingerprint(tmp_path):
    import pyarrow as pa
    d = str(tmp_path / "vf")
    os.makedirs(d)
    t = pa.table({"x": pa.array([1, 2, 3])})
    CP.write_partition(t, d, 0, "fp-a")
    CP.write_partition(t, d, 1, "fp-b")
    assert [os.path.basename(p) for p in CP.verified_files(d, "fp-a")] == \
        ["part-00000.parquet"]
    # corrupt the data file: its manifest no longer verifies
    with open(os.path.join(d, "part-00000.parquet"), "ab") as f:
        f.write(b"x")
    assert CP.verified_files(d, "fp-a") == []
