"""Resumable web-curation chain: partial crash + resume reproduces the
full run byte-identically, and the checkpointed chain matches the direct
(non-checkpointed) composition (round-4 verdict item 6)."""
import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from feature_extraction_ray.stages import curation as CU
from feature_extraction_ray.stages.dedup import exact_dedup
from feature_extraction_ray.state import checkpoint as CP

SF = "/root/testdata/sf0.001/documents.parquet"
KW = dict(boiler_buckets=8, clean_buckets=4, dedup_buckets=4,
          cap_buckets=2)


def _pages_parquet(tmp_path):
    from feature_extraction_ray.pipelines.queries import _build_pages
    t = pq.read_table(SF, columns=["doc_id", "text", "source"])
    path = str(tmp_path / "pages.parquet")
    pq.write_table(_build_pages(t), path)
    return path


def _result(ckpt_dir):
    return (CP.read_result(os.path.join(ckpt_dir, "capped"))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_web_curate_checkpointed_resume_identical(ray_session, tmp_path):
    pages = _pages_parquet(tmp_path)
    ref_dir = str(tmp_path / "ref")
    s1 = CU.web_curate_checkpointed(pages, ref_dir, **KW)
    assert len(s1["clean"]["written"]) == 4
    assert len(s1["dedup"]["written"]) == 4
    assert len(s1["capped"]["written"]) == 2
    ref = _result(ref_dir)
    assert len(ref) > 0 and ref["src_rank"].max() <= 5

    # parity with the direct (non-checkpointed) composition
    docs = rd.read_parquet(pages)
    clean = CU.remove_boilerplate_lines(docs, min_docs=2,
                                        num_buckets=8,
                                        keep_cols=["source"])
    gated = clean.map_batches(
        lambda t: t.filter(pc.greater_equal(
            pc.utf8_length(t["text"]), pa.scalar(60))),
        batch_format="pyarrow")
    dd = exact_dedup(gated, "text", "doc_id", num_buckets=4,
                     keep_cols=["source", "n_removed"])
    direct = (CU.cap_per_source(dd, cap=5, num_buckets=2).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    cols = ["doc_id", "source", "n_removed", "n_dups", "src_rank"]
    assert ref[cols].equals(direct[cols])

    # crash simulation: kill buckets in EVERY stage (data + manifests)
    out_dir = str(tmp_path / "out")
    CU.web_curate_checkpointed(pages, out_dir, **KW)
    for f in glob.glob(os.path.join(out_dir, "clean", "part-00001*")):
        os.remove(f)
    for f in glob.glob(os.path.join(out_dir, "dedup", "part-0000[0-1]*")):
        os.remove(f)
    for f in glob.glob(os.path.join(out_dir, "capped", "*")):
        os.remove(f)
    s2 = CU.web_curate_checkpointed(pages, out_dir, **KW)
    assert s2["clean"]["written"] == [1]     # only the killed buckets
    assert s2["dedup"]["written"] == [0, 1]
    assert len(s2["capped"]["written"]) == 2
    assert _result(out_dir).equals(ref)      # byte-identical resume

    # a third run is a complete no-op across all three stages
    s3 = CU.web_curate_checkpointed(pages, out_dir, **KW)
    for stage in ("clean", "dedup", "capped"):
        assert s3[stage]["written"] == [] and s3[stage]["rows"] == 0


def test_web_curate_checkpointed_param_change_invalidates(
        ray_session, tmp_path):
    pages = _pages_parquet(tmp_path)
    d = str(tmp_path / "ck")
    CU.web_curate_checkpointed(pages, d, **KW)
    # cap change must invalidate ONLY the capped stage
    s = CU.web_curate_checkpointed(pages, d, cap=3, **KW)
    assert s["clean"]["written"] == [] and s["dedup"]["written"] == []
    assert len(s["capped"]["written"]) == 2
    got = _result(d)
    assert got["src_rank"].max() <= 3


def test_web_curate_checkpointed_all_boilerplate_graceful(
        ray_session, tmp_path):
    # fully-duplicated corpus: every line crosses min_docs => all pages
    # scrubbed empty => the chain short-circuits with empty=True
    # instead of crashing on an empty read list
    t = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": pa.array(["same line\nsame line two"] * 8),
        "source": pa.array(["s"] * 8)})
    p = str(tmp_path / "dup.parquet")
    pq.write_table(t, p)
    s = CU.web_curate_checkpointed(p, str(tmp_path / "ck"),
                                   boiler_buckets=4, clean_buckets=2,
                                   dedup_buckets=2, cap_buckets=2)
    assert s.get("empty") is True
    assert s["dedup"]["rows"] == 0 and s["capped"]["rows"] == 0
