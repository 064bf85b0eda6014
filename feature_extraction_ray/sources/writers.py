"""Sinks (S9–S13): partitioned parquet writers + column-subset re-export.

The reference's writers — one CSV per feature set
(``extract_text_features.py:126-129``), one CSV per group key
(``extract_timing_features.py:167-184``), the scatter/gather merge job
(``agg_timing_features.py:16-39``) and the column-subset re-exporter
(``timing_features/get_call_act_features.py:26-32``) — collapse into two
engine idioms:

* :func:`write_features` — partitioned parquet via ``Dataset.write_parquet``
  (many part files; resumable layout; no merge job needed because the
  shuffle key IS the group key).
* checkpointed per-partition output with lineage =
  ``state.checkpoint.run_partitioned`` (the per-key-file layout retained
  as the checkpoint unit, SURVEY §3.2).
"""

from __future__ import annotations

from typing import Sequence

from ray.data import Dataset


def write_features(ds: Dataset, out_dir: str,
                   partition_cols: Sequence[str] | None = None,
                   min_rows_per_file: int | None = None) -> None:
    """Write a feature Dataset as partitioned parquet (never one big file)."""
    kwargs = {}
    if partition_cols:
        kwargs["partition_cols"] = list(partition_cols)
    if min_rows_per_file:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(out_dir, **kwargs)


def reexport_columns(in_path: str, out_dir: str,
                     columns: Sequence[str]) -> None:
    """S13: read a feature table, keep a column subset, rewrite
    (``get_call_act_features.py:26-32`` analog)."""
    import ray.data as rd
    rd.read_parquet(in_path, columns=list(columns)).write_parquet(out_dir)


def read_manifest(path: str) -> list[str]:
    """S1: text file of input paths → list (``extract_text_features.py:
    222-227``); feed the list straight to ``ray.data.read_parquet``."""
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def write_zonemapped(ds: Dataset, out_dir: str, sort_col: str) -> dict:
    """Sorted, zone-mapped parquet layout: range-partition sort on
    ``sort_col``, ONE file per sorted block, and a ``zonemap.json``
    manifest carrying each file's ``(min, max, rows)`` for the sort
    column. :func:`read_zonemapped` then prunes whole FILES whose zone
    misses the predicate before any byte leaves storage — the layout
    step that turns a full scan into a range seek at 100-TB scale
    (pair with ``partition.zorder_key`` as the sort column for
    multi-column range pruning).

    Writes happen IN the sorted tasks (driver sees one manifest row per
    file); returns the manifest dict."""
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def write_block(tbl: pa.Table, path: str, col: str):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        if len(tbl) == 0:
            return None
        pq.write_table(tbl, path)

        def item(x):
            return x.item() if hasattr(x, "item") else x

        # full zone map: (min, max) for EVERY orderable column, so
        # reads can prune on any of them (the sort column's zones are
        # disjoint ranges; secondary columns prune opportunistically)
        zones = {}
        for name in tbl.column_names:
            t = tbl.schema.field(name).type
            if pa.types.is_nested(t):
                continue
            c = tbl[name]
            if pa.types.is_timestamp(t):
                c = pc.cast(c, pa.int64())
            elif not (pa.types.is_integer(t) or pa.types.is_floating(t)
                      or pa.types.is_string(t)
                      or pa.types.is_large_string(t)):
                continue
            mm = pc.min_max(c)
            if mm["min"].as_py() is None:
                continue
            zones[name] = [item(mm["min"].as_py()),
                           item(mm["max"].as_py())]
        # sort-column bounds come from its zone entry (timestamps are
        # already normalized to int64 µs there — JSON-safe)
        mn, mx = zones[col]
        return {"file": os.path.basename(path),
                "min": mn, "max": mx,
                "rows": len(tbl), "zones": zones}

    refs = ds.sort(sort_col).to_arrow_refs()
    rows = ray.get([write_block.remote(
        r, os.path.join(out_dir, f"zone-{i:05d}.parquet"), sort_col)
        for i, r in enumerate(refs)])
    files = [r for r in rows if r is not None]
    manifest = {"sort_col": sort_col, "files": files}
    tmp = os.path.join(out_dir, "zonemap.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "zonemap.json"))
    # drop stale zone files a previous (crashed or wider) run left —
    # readers only open manifest-listed files, but the garbage bytes
    # would linger forever on 100-TB layouts
    live = {f["file"] for f in files}
    for fn in os.listdir(out_dir):
        if fn.startswith("zone-") and fn.endswith(".parquet") \
                and fn not in live:
            os.remove(os.path.join(out_dir, fn))
    return manifest


def read_zonemapped(out_dir: str, lo=None, hi=None,
                    columns: Sequence[str] | None = None,
                    pred_col: str | None = None):
    """Read a :func:`write_zonemapped` layout, PRUNING files whose
    ``[min, max]`` zone cannot intersect ``[lo, hi]`` (either bound
    optional, both inclusive — zones are value ranges, so the residual
    in-file filter still applies downstream for half-open semantics).
    ``pred_col`` selects which column's zones gate the read (default:
    the sort column, whose zones are disjoint ranges — predicates on it
    prune sharply; secondary columns prune opportunistically — only as
    well as their values correlate with the layout; timestamps compare
    as int64 µs). Returns ``(Dataset, n_files_read, n_files_total)`` so
    callers (and tests) can see the pruning actually happened."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(out_dir, "zonemap.json")) as f:
        manifest = json.load(f)
    files = manifest["files"]
    if pred_col is not None and pred_col != manifest["sort_col"]:
        def bounds(f):
            z = f.get("zones", {}).get(pred_col)
            if z is None:
                raise KeyError(
                    f"no zone recorded for column {pred_col!r} "
                    "(non-orderable, all-null, or pre-round-4 layout)")
            return z[0], z[1]
    else:
        def bounds(f):
            return f["min"], f["max"]
    keep = [f for f in files
            if (hi is None or bounds(f)[0] <= hi)
            and (lo is None or bounds(f)[1] >= lo)]
    if not keep:
        keep = files[:1]     # schema-bearing empty-ish read
        ds = rd.read_parquet(
            [os.path.join(out_dir, k["file"]) for k in keep],
            columns=columns).limit(0)
        return ds, 0, len(files)
    ds = rd.read_parquet([os.path.join(out_dir, k["file"]) for k in keep],
                         columns=columns)
    return ds, len(keep), len(files)


def zonemapped_merge_join(left_dir: str, right_dir: str, *,
                          left_key: str | None = None,
                          right_key: str | None = None,
                          right_cols: Sequence[str] | None = None,
                          suffix: str = "_r"):
    """Shuffle-FREE equi-join of two :func:`write_zonemapped` layouts
    sorted on the join key — the sort-merge-bucket join: because both
    sides are range-partitioned on the key, each left file's zone
    ``[min, max]`` selects the handful of right files it can possibly
    match; one task per left file reads exactly those right files and
    joins locally with the sorted run-pair kernel. No all-to-all, no
    re-partitioning — the LAYOUT is the shuffle, paid once at write
    time and amortized over every subsequent join/scan (the Spark SMB /
    Hive bucket-join pattern).

    Inner join, M:N fan-out, null keys never match. Returns a Dataset.
    """
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    with open(os.path.join(left_dir, "zonemap.json")) as f:
        lman = json.load(f)
    with open(os.path.join(right_dir, "zonemap.json")) as f:
        rman = json.load(f)
    lk = left_key or lman["sort_col"]
    rk = right_key or rman["sort_col"]
    if lk != lman["sort_col"] or rk != rman["sort_col"]:
        raise ValueError(
            "zonemapped_merge_join requires both layouts sorted on "
            f"their join keys (left sorted on {lman['sort_col']!r}, "
            f"right on {rman['sort_col']!r})")

    rfiles = rman["files"]

    @ray.remote
    def join_one(lfile: dict) -> pa.Table:
        import pyarrow.parquet as pq
        from ..stages.editdist import _cross_join_runs
        lt = pq.read_table(os.path.join(left_dir, lfile["file"]))
        matches = [r for r in rfiles
                   if r["min"] <= lfile["max"] and r["max"] >= lfile["min"]]
        rts = [pq.read_table(os.path.join(right_dir, r["file"]),
                             columns=(list(dict.fromkeys([rk, *right_cols]))
                                      if right_cols is not None else None))
               for r in matches]
        if rts:
            rschema = rts[0].schema
        elif rfiles:                 # zone overlap empty: schema only
            rschema = pq.read_schema(
                os.path.join(right_dir, rfiles[0]["file"]))
            if right_cols is not None:
                keep = list(dict.fromkeys([rk, *right_cols]))
                rschema = pa.schema([rschema.field(c) for c in keep])
        else:
            rschema = pa.schema([pa.field(rk, lt.schema.field(lk).type)])
        rnames = [c for c in rschema.names if c != rk]
        out_names = {c: (f"{c}{suffix}" if c in lt.column_names else c)
                     for c in rnames}
        if not rts:
            cols = {c: lt[c].slice(0, 0) for c in lt.column_names}
            for c in rnames:
                cols[out_names[c]] = pa.nulls(0, rschema.field(c).type)
            return pa.table(cols)
        rt = pa.concat_tables(rts)
        lkeys = lt[lk].combine_chunks()
        rkeys = rt[rk].combine_chunks()
        both = pa.concat_arrays([lkeys.cast(lkeys.type),
                                 rkeys.cast(lkeys.type)])
        codes = both.dictionary_encode().indices
        import pyarrow.compute as pc
        codes = pc.fill_null(codes, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cl, cr = codes[:len(lkeys)], codes[len(lkeys):]
        vl, vr = cl >= 0, cr >= 0
        li = np.flatnonzero(vl)
        ri = np.flatnonzero(vr)
        ai, bi = _cross_join_runs(cl[vl], li, cr[vr], ri)
        cols = {c: lt[c].take(pa.array(ai)) for c in lt.column_names}
        for c in rnames:
            cols[out_names[c]] = rt[c].take(pa.array(bi))
        return pa.table(cols)

    refs = [join_one.remote(f) for f in lman["files"]]
    return rd.from_arrow_refs(refs)


def scan_zonemapped(out_dir: str, col: str, lo, hi,
                    columns: Sequence[str] | None = None):
    """Pruned EXACT range scan: :func:`read_zonemapped` file pruning on
    ``col`` plus the residual in-file filter ``lo ≤ col ≤ hi`` fused
    into the read — callers get exactly the matching rows. Returns
    ``(Dataset, n_files_read, n_files_total)``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    want = columns
    if columns is not None and col not in columns:
        want = [*columns, col]
    ds, n_read, n_total = read_zonemapped(out_dir, lo=lo, hi=hi,
                                          columns=want, pred_col=col)

    def residual(t: pa.Table) -> pa.Table:
        c = t[col]
        if pa.types.is_timestamp(c.type):
            c = pc.cast(c, pa.int64())
        t = t.filter(pc.and_(pc.greater_equal(c, lo),
                             pc.less_equal(c, hi)))
        return t.select(list(columns)) if columns is not None else t

    return ds.map_batches(residual, batch_format="pyarrow"), \
        n_read, n_total


def write_bloom_indexed(ds: Dataset, out_dir: str, key_col: str,
                        fpp: float = 0.01) -> dict:
    """File-level Bloom index for EQUALITY predicates — the
    point-lookup complement to :func:`write_zonemapped`'s range zones
    (the Delta/Iceberg bloom-file-skipping pattern): one parquet file
    per input block plus a tiny ``.bloom.npy`` sidecar (uint8 bitmap,
    the double-hash probe family shared with ``stages/bloom.py``)
    sized to that file's row count at ``fpp``. Readers probe the
    KB-scale sidecars first and open only files that MAY contain the
    key — a point lookup on an UNSORTED 100-TB layout touches a
    handful of files instead of all of them, with no sort and no
    shuffle (the layout keeps the input partitioning, so it composes
    with any upstream ordering)."""
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def write_block(tbl: pa.Table, path: str, col: str, fpp: float):
        import pyarrow.parquet as pq

        from ..stages.bloom import _hash_pair, dimension_bloom
        if len(tbl) == 0:
            return None
        pq.write_table(tbl, path)
        c = tbl[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if c.null_count:
            c = c.drop_null()
        num_bits, k = dimension_bloom(len(c), fpp)
        bits = np.zeros(num_bits // 8, dtype=np.uint8)
        if len(c):
            h1, h2 = _hash_pair(c)
            mod = np.uint64(num_bits - 1)
            with np.errstate(over="ignore"):
                for i in range(k):
                    idx = (h1 + np.uint64(i) * h2) & mod
                    np.bitwise_or.at(
                        bits, (idx >> np.uint64(3)).astype(np.int64),
                        np.uint8(1) << (idx & np.uint64(7)).astype(
                            np.uint8))
        bp = path[:-len(".parquet")] + ".bloom.npy"
        with open(bp, "wb") as f:
            np.save(f, bits)
        return {"file": os.path.basename(path),
                "bloom": os.path.basename(bp), "rows": len(tbl),
                "num_bits": num_bits, "num_hashes": k}

    refs = ds.to_arrow_refs()
    rows = ray.get([write_block.remote(
        r, os.path.join(out_dir, f"bloom-{i:05d}.parquet"), key_col, fpp)
        for i, r in enumerate(refs)])
    files = [r for r in rows if r is not None]
    manifest = {"key_col": key_col, "fpp": fpp, "files": files}
    tmp = os.path.join(out_dir, "bloomindex.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "bloomindex.json"))
    live = {f["file"] for f in files} | {f["bloom"] for f in files}
    for fn in os.listdir(out_dir):
        if fn.startswith("bloom-") and fn not in live \
                and (fn.endswith(".parquet") or fn.endswith(".npy")):
            os.remove(os.path.join(out_dir, fn))
    return manifest


def read_bloom_indexed(out_dir: str, values,
                       columns: Sequence[str] | None = None,
                       exact: bool = True):
    """Point lookup over a :func:`write_bloom_indexed` layout: probe
    every file's sidecar bitmap with the wanted key values (driver-side
    — sidecars are KBs) and read ONLY files whose bloom admits at least
    one value; ``exact=True`` fuses the residual ``key IN values``
    filter so false positives never reach the caller. Returns
    ``(Dataset, n_files_read, n_files_total)``."""
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.bloom import BloomFilter

    with open(os.path.join(out_dir, "bloomindex.json")) as f:
        manifest = json.load(f)
    key_col = manifest["key_col"]
    vals = pa.array(values) if not isinstance(
        values, (pa.Array, pa.ChunkedArray)) else values
    keep = []
    for frow in manifest["files"]:
        bits = np.load(os.path.join(out_dir, frow["bloom"]))
        bf = BloomFilter(bits, frow["num_bits"], frow["num_hashes"])
        if bf.contains(vals).any():
            keep.append(frow["file"])
    want = columns
    if exact and columns is not None and key_col not in columns:
        want = [*columns, key_col]
    if not keep:
        ds = rd.read_parquet(
            [os.path.join(out_dir, manifest["files"][0]["file"])],
            columns=want).limit(0) if manifest["files"] else None
        return ds, 0, len(manifest["files"])
    ds = rd.read_parquet([os.path.join(out_dir, k) for k in keep],
                         columns=want)
    if exact:
        vset = vals

        def residual(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t[key_col], value_set=vset))
            return t.select(list(columns)) if columns is not None else t

        ds = ds.map_batches(residual, batch_format="pyarrow")
    return ds, len(keep), len(manifest["files"])


def read_documents_jsonl(paths, *, id_col: str = "doc_id",
                         text_col: str = "text",
                         source_col: str = "source",
                         **read_kwargs) -> Dataset:
    """JSONL document ingest (the raw-crawl interchange format): Ray's
    native ``read_json`` (arrow JSON reader, streams line-delimited
    records) normalized to the canonical documents schema — id cast to
    int64 when numeric (string ids pass through), missing ``source``
    defaults to ``"jsonl"``, extra keys dropped, null/absent text rows
    removed. One stateless pass; blocks parallelize like any read.
    ``read_kwargs`` forward to ``ray.data.read_json`` — e.g.
    ``arrow_open_stream_args={"compression": "gzip"}`` for ``.jsonl.gz``
    crawl dumps (web corpora ship compressed)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_json(paths, **read_kwargs)

    def normalize(t: pa.Table) -> pa.Table:
        if text_col not in t.column_names:
            raise ValueError(f"JSONL records lack {text_col!r}")
        ids = t[id_col] if id_col in t.column_names else None
        if ids is None:
            raise ValueError(f"JSONL records lack {id_col!r}")
        if pa.types.is_floating(ids.type):   # JSON numbers parse float
            ids = pc.cast(ids, pa.int64())
        # the Arrow JSON reader unions keys across records: a partially
        # present field arrives as a column WITH nulls, not missing
        src = (pc.fill_null(pc.cast(t[source_col], pa.string()), "jsonl")
               if source_col in t.column_names
               else pa.array(["jsonl"] * len(t), pa.string()))
        out = pa.table({id_col: ids,
                        text_col: pc.cast(t[text_col], pa.string()),
                        source_col: pc.cast(src, pa.string())})
        return out.filter(pc.is_valid(out[text_col]))

    return ds.map_batches(normalize, batch_format="pyarrow")


def write_arrow_ipc(ds: Dataset, out_dir: str,
                    compression: str | None = None) -> list[str]:
    """Arrow IPC (Feather V2) sink: ONE ``part-NNNNN.arrow`` per
    non-empty input block, written inside Ray tasks with
    ``pa.ipc.new_file`` (the random-access file format — footer +
    record batches, optionally lz4/zstd-compressed buffers). The
    zero-parse interchange format for handing feature tables to
    another Arrow-native system without a Parquet decode cycle; list
    and nested columns survive byte-exactly. Returns sorted relative
    file names."""
    import os

    import pyarrow as pa
    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def write_block(tbl: pa.Table, path: str) -> str | None:
        import pyarrow as pa
        if len(tbl) == 0:
            return None
        opts = pa.ipc.IpcWriteOptions(compression=compression)
        tmp = path + ".tmp"
        with pa.OSFile(tmp, "wb") as f, \
                pa.ipc.new_file(f, tbl.schema, options=opts) as w:
            w.write_table(tbl)
        os.replace(tmp, path)
        return os.path.basename(path)

    names = ray.get([write_block.remote(
        r, os.path.join(out_dir, f"part-{i:05d}.arrow"))
        for i, r in enumerate(ds.to_arrow_refs())])
    return sorted(n for n in names if n is not None)


def read_arrow_ipc(paths, **read_kwargs) -> Dataset:
    """Arrow IPC source: each ``.arrow`` file parses in its own task
    via ``read_binary_files`` + ``pa.ipc.open_file`` — zero-copy
    column reconstruction, no shuffle, no driver materialization."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(paths, **read_kwargs)

    def parse(t: pa.Table) -> pa.Table:
        import pyarrow as pa
        tables = []
        for blob in t["bytes"].to_pylist():
            with pa.ipc.open_file(pa.BufferReader(blob)) as r:
                tables.append(r.read_all())
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)

    return ds.map_batches(parse, batch_format="pyarrow")


def write_orc(ds: Dataset, out_dir: str,
              compression: str = "zstd") -> list[str]:
    """ORC sink: ONE ``part-NNNNN.orc`` per non-empty input block,
    written inside Ray tasks with ``pyarrow.orc`` — the Hive/Trino
    warehouse interchange format (columnar, striped, predicate-ready)
    for handing feature tables to a JVM lakehouse without a Parquet
    conversion step; list and nested columns round-trip exactly.
    Returns sorted relative file names."""
    import os

    import pyarrow as pa
    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def write_block(tbl: pa.Table, path: str) -> str | None:
        import pyarrow.orc as orc
        if len(tbl) == 0:
            return None
        tmp = path + ".tmp"
        orc.write_table(tbl, tmp, compression=compression)
        os.replace(tmp, path)
        return os.path.basename(path)

    names = ray.get([write_block.remote(
        r, os.path.join(out_dir, f"part-{i:05d}.orc"))
        for i, r in enumerate(ds.to_arrow_refs())])
    return sorted(n for n in names if n is not None)


def read_orc(paths, **read_kwargs) -> Dataset:
    """ORC source: each ``.orc`` file parses in its own task via
    ``read_binary_files`` + ``pyarrow.orc`` over a ``BufferReader`` —
    no shuffle, no driver materialization."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(paths, **read_kwargs)

    def parse(t: pa.Table) -> pa.Table:
        import pyarrow as pa
        import pyarrow.orc as orc
        tables = []
        for blob in t["bytes"].to_pylist():
            tables.append(orc.ORCFile(pa.BufferReader(blob)).read())
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)

    return ds.map_batches(parse, batch_format="pyarrow")
