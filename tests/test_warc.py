"""Goldens for sources/warc.py — WARC/1.0 resource-record sink/source:
Content-Length walking, per-record gzip members, loud malformed-input
errors."""
import gzip
import os
import tempfile

import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.sources.warc import (
    _parse_warc_blob, _record_bytes, read_warc, write_warc)


def _docs():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([7, 8, 9], pa.int64()),
        "url": ["https://a.example.com/7", "https://b.example.com/8",
                "https://c.example.com/9"],
        # payload 8 embeds the record separator; 9 is multibyte UTF-8
        "text": ["plain text", "tricky\r\n\r\nseparator inside",
                 "naïve café — ünïcode"]}))


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_byte_exact(compress):
    d = tempfile.mkdtemp(prefix="warc_t_")
    names = write_warc(_docs(), d, compress=compress)
    assert names and all(
        n.endswith(".warc.gz" if compress else ".warc") for n in names)
    got = read_warc(d).to_pandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == [7, 8, 9]
    assert got["text"].tolist() == _docs().to_pandas()["text"].tolist()
    assert got["n_bytes"].tolist() == [
        len(t.encode("utf-8")) for t in _docs().to_pandas()["text"]]
    assert got["url"].tolist()[0] == "https://a.example.com/7"


def test_payload_separator_does_not_split_records():
    # two records, first payload contains \r\n\r\n — a separator-split
    # parser would see three records / garbage headers
    blob = (_record_bytes(1, "u1", b"a\r\n\r\nb")
            + _record_bytes(2, "u2", b"c"))
    ids, urls, texts, sizes = _parse_warc_blob(blob, "t")
    assert ids == [1, 2]
    assert texts == ["a\r\n\r\nb", "c"]
    assert sizes == [6, 1]


def test_gzip_multi_member_stream():
    blob = (gzip.compress(_record_bytes(1, "u", b"x"))
            + gzip.compress(_record_bytes(2, "v", b"yy")))
    ids, _, texts, _ = _parse_warc_blob(blob, "t")
    assert ids == [1, 2] and texts == ["x", "yy"]


def test_malformed_inputs_raise_loudly():
    good = _record_bytes(1, "u", b"x")
    with pytest.raises(ValueError, match="bad WARC version"):
        _parse_warc_blob(b"HTTP/1.1 200\r\n\r\n", "t")
    with pytest.raises(ValueError, match="truncated payload"):
        _parse_warc_blob(good[:-5], "t")
    with pytest.raises(ValueError, match="lacks"):
        _parse_warc_blob(
            b"WARC/1.0\r\nWARC-Record-ID: <urn:fx:doc:1>\r\n\r\n", "t")
    bad_trailer = good[:-4] + b"XXXX"
    with pytest.raises(ValueError, match="bad record trailer"):
        _parse_warc_blob(bad_trailer, "t")


def test_empty_blocks_skipped():
    d = tempfile.mkdtemp(prefix="warc_e_")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "url": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    names = write_warc(ds, d)
    assert names == []
    assert os.listdir(d) == []


def test_arrow_ipc_roundtrip_preserves_list_columns():
    # IPC must byte-preserve nested columns (the rd.from_pandas
    # tensor-extension hazard never applies: everything stays Arrow)
    import numpy as np

    from feature_extraction_ray.sources.writers import (
        read_arrow_ipc, write_arrow_ipc)
    t = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "vector": pa.array([[1.5, -2.0], [0.0, 3.25], [7.0, 8.0]],
                           pa.list_(pa.float32())),
        "tokens": pa.array([[1, 2], [], [5]], pa.list_(pa.int32())),
        "label": ["a", "b", "c"]})
    d = tempfile.mkdtemp(prefix="ipc_t_")
    names = write_arrow_ipc(rd.from_arrow(t), d, compression="lz4")
    assert names and all(n.endswith(".arrow") for n in names)
    got = read_arrow_ipc(d).to_pandas().sort_values("vec_id")
    assert got["label"].tolist() == ["a", "b", "c"]
    assert [list(v) for v in got["vector"]] == \
        [[1.5, -2.0], [0.0, 3.25], [7.0, 8.0]]
    assert [list(v) for v in got["tokens"]] == [[1, 2], [], [5]]


def test_orc_roundtrip_preserves_list_columns():
    from feature_extraction_ray.sources.writers import (read_orc,
                                                        write_orc)
    t = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "vector": pa.array([[1.5, -2.0], [0.0, 3.25], [7.0, 8.0]],
                           pa.list_(pa.float32())),
        "tokens": pa.array([[1, 2], [], [5]], pa.list_(pa.int32())),
        "label": ["a", "b", "c"]})
    d = tempfile.mkdtemp(prefix="orc_t_")
    names = write_orc(rd.from_arrow(t), d, compression="zstd")
    assert names and all(n.endswith(".orc") for n in names)
    got = read_orc(d).to_pandas().sort_values("vec_id")
    assert got["label"].tolist() == ["a", "b", "c"]
    assert [list(v) for v in got["vector"]] == \
        [[1.5, -2.0], [0.0, 3.25], [7.0, 8.0]]
    assert [list(v) for v in got["tokens"]] == [[1, 2], [], [5]]
