"""Legacy-CSV ingestion path (S2 + S8): recognizer CSVs with STRINGIFIED
word-timing cells → read_csv → parse-once-at-ingest → timing features
identical to the native-Arrow path."""
import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv
import pytest
import ray.data as rd

from feature_extraction_ray import fixtures as FX
from feature_extraction_ray.sources.parsers import word_timing_column
from feature_extraction_ray.stages.timing import extract_timing_features


def test_csv_roundtrip_matches_arrow_path(tmp_path):
    rec = FX.gen_recognizer(n_calls=4, segs_per_call=5, seed=13)
    # write the reference-shaped CSV (stringified word_timing cell)
    csv_tbl = rec.drop_columns(["word_timing"]).rename_columns(
        [c if c != "word_timing_str" else "word_timing"
         for c in rec.drop_columns(["word_timing"]).column_names])
    path = str(tmp_path / "recognizer.csv")
    pacsv.write_csv(csv_tbl, path)

    ds = rd.read_csv(path)

    def parse(batch: pa.Table) -> pa.Table:
        wt = word_timing_column(batch["word_timing"].to_pylist())
        i = batch.column_names.index("word_timing")
        return batch.set_column(i, pa.field("word_timing", wt.type), wt)

    parsed = ds.map_batches(parse, batch_format="pyarrow")
    durations = {c: 120_000 for c in set(rec["audio_file_id"].to_pylist())}

    got_csv = extract_timing_features(
        parsed, group_col="audio_file_id", duration_lookup=durations,
        num_buckets=2).to_pandas().set_index("group_id").sort_index()
    got_arrow = extract_timing_features(
        rd.from_arrow(rec.drop_columns(["word_timing_str"])),
        group_col="audio_file_id", duration_lookup=durations,
        num_buckets=2).to_pandas().set_index("group_id").sort_index()

    assert list(got_csv.index) == list(got_arrow.index)
    for c in got_arrow.columns:
        np.testing.assert_allclose(got_csv[c], got_arrow[c],
                                   equal_nan=True, err_msg=c)


def test_jsonl_documents_ingest(ray_session, tmp_path):
    import json as _json
    from feature_extraction_ray.sources.writers import (
        read_documents_jsonl)
    p = str(tmp_path / "docs.jsonl")
    rows = [{"doc_id": 1, "text": "alpha beta", "source": "a",
             "extra": 1},
            {"doc_id": 2, "text": "gamma delta"},          # no source
            {"doc_id": 3, "text": None, "source": "a"},    # dropped
            {"doc_id": 4, "text": "epsilon", "source": "b"}]
    with open(p, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    got = read_documents_jsonl(p).to_pandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == [1, 2, 4]
    assert got["doc_id"].dtype.kind == "i"
    assert got["source"].tolist() == ["a", "jsonl", "b"]
    assert sorted(got.columns) == ["doc_id", "source", "text"]
    # flows straight into a text stage
    from feature_extraction_ray.stages.text import ws_token_count
    import pyarrow as _pa
    n = read_documents_jsonl(p).map_batches(
        lambda t: t.append_column("n", ws_token_count(t["text"])),
        batch_format="pyarrow").to_pandas()
    assert sorted(n["n"]) == [1, 2, 2]


def test_jsonl_gz_documents_ingest(ray_session, tmp_path):
    # gzip-compressed line-delimited JSON: the Arrow reader decompresses
    # by extension, so the same normalizer path must produce identical
    # rows to the plain file
    import gzip
    import json as _json
    from feature_extraction_ray.sources.writers import (
        read_documents_jsonl)
    rows = [{"doc_id": 10, "text": "alpha beta", "source": "a"},
            {"doc_id": 11, "text": "gamma"},
            {"doc_id": 12, "text": None, "source": "x"}]
    plain = str(tmp_path / "docs.jsonl")
    gz = str(tmp_path / "docs.jsonl.gz")
    payload = "".join(_json.dumps(r) + "\n" for r in rows)
    with open(plain, "w") as f:
        f.write(payload)
    with gzip.open(gz, "wt") as f:
        f.write(payload)
    a = read_documents_jsonl(plain).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    try:
        b = read_documents_jsonl(
            gz, arrow_open_stream_args={"compression": "gzip"}
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    except TypeError:
        import pytest as _pt
        _pt.skip("reader does not forward open-stream args")
    assert a.equals(b)
