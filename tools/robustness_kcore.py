"""One-off robustness run (round-4 verdict item 2 'done' criterion):
partitioned k-core peeling on a ~×100 co-purchase graph (sf0.1
lineitem) WITHOUT the edge list ever landing on the driver, plus a
broadcast-plan equality check on the same graph.

Usage: cd /root/repo && PYTHONPATH=/root/repo python tools/robustness_kcore.py
"""
import time

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import ray.data as rd

from feature_extraction_ray.stages.graphrank import core_numbers
from feature_extraction_ray.stages.mining import cooccurrence_edges

SF = "/root/testdata/sf0.1"

li = rd.read_parquet(f"{SF}/lineitem.parquet",
                     columns=["l_orderkey", "l_partkey"])
edges = cooccurrence_edges(li, "l_orderkey", "l_partkey").materialize()
n_edges = edges.count()
print(f"edges: {n_edges}")

t0 = time.perf_counter()
part = core_numbers(edges, "item_a", "item_b", plan="partitioned",
                    num_buckets=64).materialize()
t_part = time.perf_counter() - t0
print(f"partitioned: {part.count()} nodes in {t_part:.1f}s")

t0 = time.perf_counter()
bc = core_numbers(edges, "item_a", "item_b").materialize()
t_bc = time.perf_counter() - t0
print(f"broadcast:   {bc.count()} nodes in {t_bc:.1f}s")

p = part.to_pandas().sort_values("node").reset_index(drop=True)
b = bc.to_pandas().sort_values("node").reset_index(drop=True)
assert p.equals(b), "plan outputs differ!"
print(f"EQUAL coreness for all {len(p)} nodes; "
      f"max core {int(p['core'].max())}")
ray.shutdown()
