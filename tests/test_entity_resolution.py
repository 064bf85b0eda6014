"""Golden for the composed entity-resolution chain (query-level)."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.cc import (assign_clusters,
                                              attach_values,
                                              connected_components_auto)
from feature_extraction_ray.stages.editdist import distance1_join


def test_planted_chain_and_singleton(ray_session):
    names = ["abcd", "abce", "abcf", "zzzz", "qqqq"]
    keys = [10, 20, 30, 40, 50]
    cust = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "name": pa.array(names)}))
    pairs = distance1_join(cust, "name")
    look = cust.map_batches(
        lambda t: pa.table({"name": t["name"], "key": t["k"]}),
        batch_format="pyarrow")
    e1 = attach_values(pairs, "name_a", look, "name", ["key"],
                       rename={"key": "a"})
    e2 = attach_values(e1, "name_b", look, "name", ["key"],
                       rename={"key": "b"})
    edges = e2.map_batches(lambda t: t.select(["a", "b"]),
                           batch_format="pyarrow").materialize()
    labels = connected_components_auto(edges,
                                       n_edges=edges.count())
    ids = cust.map_batches(
        lambda t: pa.table({"k": t["k"]}), batch_format="pyarrow")
    out = assign_clusters(ids, labels, id_col="k").to_pandas() \
        .set_index("k")
    # abcd/abce/abcf chain into one cluster rooted at min key 10
    assert out.loc[10, "cluster_id"] == 10
    assert out.loc[20, "cluster_id"] == 10
    assert out.loc[30, "cluster_id"] == 10
    assert bool(out.loc[20, "is_duplicate"])
    # zzzz and qqqq stay their own canonical records
    for k in (40, 50):
        assert out.loc[k, "cluster_id"] == k
        assert not bool(out.loc[k, "is_duplicate"])
