"""WARC (Web ARChive, ISO 28500) source and sink.

The crawl interchange format web-scale corpora actually arrive in
(CommonCrawl ships WARC/WET). This module writes ``WARC/1.0``
*resource* records — one per document, UTF-8 payload, per-record gzip
members when ``compress=True`` (the spec's ``.warc.gz`` convention:
concatenated gzip members, one per record, so a reader can seek to any
member) — and reads them back by walking ``Content-Length`` jumps
(NEVER by splitting on the record separator: payloads may legally
contain ``\\r\\n\\r\\n``).

Scale shape: the sink writes ONE file per input block inside Ray tasks
(the driver sees only file names); the source rides
``ray.data.read_binary_files`` so each WARC file parses in its own
task — a 100-TB crawl parallelizes file-per-task with zero shuffles.
Pure stdlib; no warcio dependency.
"""
from __future__ import annotations

import gzip
import os

import pyarrow as pa
import ray
from ray.data import Dataset

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def _record_bytes(doc_id, url: str, payload: bytes) -> bytes:
    head = (b"WARC/1.0" + _CRLF
            + b"WARC-Type: resource" + _CRLF
            + b"WARC-Record-ID: <urn:fx:doc:%d>" % doc_id + _CRLF
            + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
            + b"Content-Type: text/plain; charset=utf-8" + _CRLF
            + b"Content-Length: %d" % len(payload) + _CRLF)
    return head + _CRLF + payload + _SEP


def write_warc(ds: Dataset, out_dir: str, *, id_col: str = "doc_id",
               url_col: str = "url", text_col: str = "text",
               compress: bool = True) -> list[str]:
    """Write ``ds`` as WARC files under ``out_dir`` — one
    ``part-NNNNN.warc[.gz]`` per non-empty input block, records in
    block order, serialized inside Ray tasks. Returns the sorted file
    list (relative names)."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    @ray.remote
    def write_block(tbl: pa.Table, path: str) -> str | None:
        if len(tbl) == 0:
            return None
        ids = tbl[id_col].to_pylist()
        urls = tbl[url_col].to_pylist()
        texts = tbl[text_col].to_pylist()
        parts = []
        for i, u, x in zip(ids, urls, texts):
            rec = _record_bytes(i, u, (x or "").encode("utf-8"))
            parts.append(gzip.compress(rec) if compress else rec)
        blob = b"".join(parts)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return os.path.basename(path)

    refs = ds.to_arrow_refs()
    names = ray.get([write_block.remote(
        r, os.path.join(out_dir, f"part-{i:05d}{ext}"))
        for i, r in enumerate(refs)])
    return sorted(n for n in names if n is not None)


def _parse_warc_blob(blob: bytes, what: str):
    """Parse one WARC file's bytes into (ids, urls, texts, n_bytes)
    lists. Walks records via Content-Length (payloads containing the
    record separator parse correctly); raises loudly on malformed
    headers, bad trailers, or truncation — a silently-skipped crawl
    record is corpus loss."""
    if blob[:2] == b"\x1f\x8b":        # .warc.gz: concatenated members
        blob = gzip.decompress(blob)
    ids, urls, texts, sizes = [], [], [], []
    pos, n = 0, len(blob)
    while pos < n:
        end = blob.find(_SEP, pos)
        if end < 0:
            raise ValueError(f"{what}: truncated WARC header at {pos}")
        lines = blob[pos:end].split(_CRLF)
        if lines[0] != b"WARC/1.0":
            raise ValueError(f"{what}: bad WARC version {lines[0]!r}")
        hdr = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b": ")
            hdr[k.decode("ascii")] = v.decode("utf-8")
        try:
            clen = int(hdr["Content-Length"])
            rid = hdr["WARC-Record-ID"]
            uri = hdr["WARC-Target-URI"]
        except KeyError as e:
            raise ValueError(f"{what}: record at {pos} lacks {e}")
        body = end + len(_SEP)
        if body + clen + len(_SEP) > n:
            raise ValueError(f"{what}: truncated payload at {pos}")
        payload = blob[body:body + clen]
        if blob[body + clen:body + clen + len(_SEP)] != _SEP:
            raise ValueError(f"{what}: bad record trailer at {pos}")
        if not rid.startswith("<urn:fx:doc:") or not rid.endswith(">"):
            raise ValueError(f"{what}: unrecognized record id {rid!r}")
        ids.append(int(rid[len("<urn:fx:doc:"):-1]))
        urls.append(uri)
        texts.append(payload.decode("utf-8"))
        sizes.append(clen)
        pos = body + clen + len(_SEP)
    return ids, urls, texts, sizes


def read_warc(paths, **read_kwargs) -> Dataset:
    """Read WARC files (plain or ``.gz``) back into a Dataset with
    columns ``(doc_id:int64, url, text, n_bytes:int64)``. Each file
    parses in its own task via ``read_binary_files`` — no shuffle, no
    driver materialization."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True, **read_kwargs)

    def parse(t: pa.Table) -> pa.Table:
        ids, urls, texts, sizes = [], [], [], []
        for path, blob in zip(t["path"].to_pylist(),
                              t["bytes"].to_pylist()):
            i, u, x, s = _parse_warc_blob(blob, os.path.basename(path))
            ids.extend(i)
            urls.extend(u)
            texts.extend(x)
            sizes.extend(s)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts, pa.string()),
            "n_bytes": pa.array(sizes, pa.int64())})

    return ds.map_batches(parse, batch_format="pyarrow")
