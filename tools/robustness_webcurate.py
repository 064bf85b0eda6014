"""One-off robustness run: the resumable web-curation chain at ~×100
bench scale (sf0.1 documents amplified ×10 = 50k multi-line pages),
including a mid-run kill of one stage's partitions and a byte-identity
resume — the 100-TB operational claim exercised at the largest local
size.

Usage: cd /root/repo && PYTHONPATH=/root/repo python tools/robustness_webcurate.py
"""
import glob
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from feature_extraction_ray.pipelines.queries import _build_pages
from feature_extraction_ray.stages import curation as CU
from feature_extraction_ray.state import checkpoint as CP

SRC = "/root/testdata/sf0.1/documents.parquet"
WORK = "/tmp/webcurate_x100"
shutil.rmtree(WORK, ignore_errors=True)
os.makedirs(WORK)

t = pq.read_table(SRC, columns=["doc_id", "text", "source"])
parts = []
for r in range(10):
    ids = pc.add(t["doc_id"], pa.scalar(r * 8192, pa.int64()))
    src = t["source"] if r == 0 else pc.binary_join_element_wise(
        t["source"], pa.scalar(f"r{r}"), "#")
    # make each replica's BODY text unique (append a replica token):
    # identical bodies across replicas would cross the min_docs bar and
    # mark EVERY line boilerplate — the degenerate all-scrubbed case
    # (handled gracefully by the chain, but not the scale shape this
    # one-off measures)
    txt = t["text"] if r == 0 else pc.binary_join_element_wise(
        t["text"], pa.scalar(f"rep{r}"), " ")
    parts.append(pa.table({"doc_id": ids, "text": txt,
                           "source": src}))
pages = pa.concat_tables([_build_pages(p) for p in parts])
pages_path = os.path.join(WORK, "pages.parquet")
pq.write_table(pages, pages_path)
print(f"input: {pages.num_rows} pages")

KW = dict(boiler_buckets=64, clean_buckets=16, dedup_buckets=32,
          cap_buckets=8, cap=50)

t0 = time.perf_counter()
s1 = CU.web_curate_checkpointed(pages_path, os.path.join(WORK, "ref"),
                                **KW)
t_full = time.perf_counter() - t0
ref = (CP.read_result(os.path.join(WORK, "ref", "capped")).to_pandas()
       .sort_values("doc_id").reset_index(drop=True))
print(f"full run {t_full:.1f}s; stages "
      f"clean={len(s1['clean']['written'])} "
      f"dedup={len(s1['dedup']['written'])} "
      f"capped={len(s1['capped']['written'])}; "
      f"result rows {len(ref)}")

# crash simulation at scale: kill a quarter of the dedup partitions +
# the whole capped stage, then resume
out = os.path.join(WORK, "out")
CU.web_curate_checkpointed(pages_path, out, **KW)
for f in glob.glob(os.path.join(out, "dedup", "part-0000[0-7]*")):
    os.remove(f)
for f in glob.glob(os.path.join(out, "capped", "*")):
    os.remove(f)
t0 = time.perf_counter()
s2 = CU.web_curate_checkpointed(pages_path, out, **KW)
t_resume = time.perf_counter() - t0
got = (CP.read_result(os.path.join(out, "capped")).to_pandas()
       .sort_values("doc_id").reset_index(drop=True))
assert s2["clean"]["written"] == []            # untouched stage skipped
assert s2["dedup"]["written"] == list(range(8))
assert got.equals(ref), "resume result differs!"
print(f"resume {t_resume:.1f}s (re-did 8/32 dedup buckets + cap); "
      f"byte-identical: True")
shutil.rmtree(WORK, ignore_errors=True)
ray.shutdown()
