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
