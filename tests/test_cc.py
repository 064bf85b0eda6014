"""Distributed connected-components + bucketed attach-join tests.

The distributed star-rounds algorithm (stages/cc.py) is validated against
the driver-side union-find oracle (`dedup._connected_components`) on
random graphs, and `attach_values` against hand-built joins including
duplicate keys and list-valued columns."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.cc import (
    assign_clusters, attach_values, connected_components)
from feature_extraction_ray.stages.dedup import _connected_components


@pytest.mark.parametrize("m,seed", [(60, 1), (250, 2), (600, 3)])
def test_connected_components_matches_union_find(m, seed):
    rng = np.random.default_rng(seed)
    n = 300
    edges_df = pd.DataFrame({
        "a": rng.integers(0, n, size=m).astype("int64"),
        "b": rng.integers(0, n, size=m).astype("int64")})
    ds = rd.from_arrow(pa.Table.from_pandas(edges_df))
    labels = connected_components(ds, num_buckets=8).to_pandas()
    got = labels.groupby("node")["label"].min()
    comp = _connected_components(edges_df)
    touched = set(edges_df["a"]) | set(edges_df["b"])
    for x in touched:
        assert got.get(x, x) == comp.get(x, x), f"node {x}"
    # fixpoint: no node carries conflicting labels
    if len(labels):
        assert labels.groupby("node")["label"].nunique().max() == 1


def test_connected_components_chain_and_star():
    # a long path (worst diameter) plus a star plus a 2-cycle of dups
    edges = pd.DataFrame({
        "a": [1, 2, 3, 4, 5, 6, 7, 20, 20, 20, 30, 31],
        "b": [2, 3, 4, 5, 6, 7, 8, 21, 22, 23, 31, 30]})
    ds = rd.from_arrow(pa.Table.from_pandas(edges.astype("int64")))
    labels = connected_components(ds, num_buckets=4).to_pandas()
    got = labels.groupby("node")["label"].min()
    for x in range(2, 9):
        assert got[x] == 1
    for x in (21, 22, 23):
        assert got[x] == 20
    assert got[31] == 30


def test_attach_values_inner_left_and_dup_min():
    fact = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 5, 2], type=pa.int64()),
        "p": pa.array(["a", "b", "c", "d", "e"])}))
    lookup = rd.from_arrow(pa.table({
        "id": pa.array([2, 3, 5, 5], type=pa.int64()),
        "val": pa.array([20, 30, 51, 50], type=pa.int64())}))
    inner = attach_values(fact, "k", lookup, "id", ["val"],
                          num_buckets=4).to_pandas().sort_values(["k", "p"])
    assert inner["k"].tolist() == [2, 2, 3, 5]
    assert inner["val"].tolist() == [20, 20, 30, 50]   # dup key -> min
    left = attach_values(fact, "k", lookup, "id", ["val"], how="left",
                         num_buckets=4).to_pandas().sort_values(["k", "p"])
    assert left["k"].tolist() == [1, 2, 2, 3, 5]
    assert pd.isna(left["val"].iloc[0]) and left["val"].iloc[1] == 20


def test_attach_values_list_column_rename():
    sig = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "sig": pa.FixedSizeListArray.from_arrays(
            pa.array(np.arange(12, dtype=np.int64)), 4)}))
    pairs = rd.from_arrow(pa.table({
        "a": pa.array([1, 3], type=pa.int64()),
        "b": pa.array([2, 2], type=pa.int64())}))
    out = attach_values(
        attach_values(pairs, "a", sig, "doc_id", ["sig"],
                      rename={"sig": "sig_a"}, num_buckets=4),
        "b", sig, "doc_id", ["sig"], rename={"sig": "sig_b"},
        num_buckets=4).to_pandas().sort_values("a")
    assert len(out) == 2
    assert list(out[out.a == 1]["sig_a"].iloc[0]) == [0, 1, 2, 3]
    assert list(out[out.a == 1]["sig_b"].iloc[0]) == [4, 5, 6, 7]


def test_assign_clusters():
    ids = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(8), type=pa.int64())}))
    labs = rd.from_arrow(pa.table({
        "node": pa.array([3, 7], type=pa.int64()),
        "label": pa.array([1, 2], type=pa.int64())}))
    out = assign_clusters(ids, labs, num_buckets=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["cluster_id"].tolist() == [0, 1, 2, 1, 4, 5, 6, 2]
    assert out["is_duplicate"].tolist() == [False] * 3 + [True] + \
        [False] * 3 + [True]


def test_compact_cc_matches_star_rounds():
    from feature_extraction_ray.stages.cc import (
        connected_components_auto, connected_components_compact)
    rng = np.random.default_rng(11)
    edges_df = pd.DataFrame({
        "a": rng.integers(0, 200, size=300).astype("int64"),
        "b": rng.integers(0, 200, size=300).astype("int64")})
    ds = rd.from_arrow(pa.Table.from_pandas(edges_df))
    star = connected_components(ds, num_buckets=8).to_pandas() \
        .groupby("node")["label"].min()
    compact = connected_components_compact(
        rd.from_arrow(pa.Table.from_pandas(edges_df))).to_pandas() \
        .set_index("node")["label"]
    touched = set(edges_df["a"]) | set(edges_df["b"])
    for x in touched:
        assert star.get(x, x) == compact.get(x, x), x
    # auto picks compact below threshold, star above
    auto = connected_components_auto(
        rd.from_arrow(pa.Table.from_pandas(edges_df)),
        compact_threshold=10**6).to_pandas().set_index("node")["label"]
    for x in touched:
        assert auto.get(x, x) == compact.get(x, x), x


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 60), st.integers(0, 60)),
                min_size=1, max_size=120))
def test_connected_components_property_random_graphs(edge_list):
    edges_df = pd.DataFrame(edge_list, columns=["a", "b"]).astype("int64")
    ds = rd.from_arrow(pa.Table.from_pandas(edges_df))
    labels = connected_components(ds, num_buckets=4).to_pandas()
    got = labels.groupby("node")["label"].min() if len(labels) else {}
    comp = _connected_components(edges_df)
    for x in set(edges_df["a"]) | set(edges_df["b"]):
        g = got.get(x, x) if len(labels) else x
        assert g == comp.get(x, x), x


def test_attach_values_outer_join():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.cc import attach_values
    fact = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 3], type=pa.int64()),
        "fx": pa.array(["a", "b", "c", "d"])}))
    lookup = rd.from_arrow(pa.table({
        "k": pa.array([2, 3, 9, 9, 7], type=pa.int64()),
        "v": pa.array([20, 30, 91, 90, 70], type=pa.int64())}))
    out = attach_values(fact, "k", lookup, "k", ["v"], how="outer",
                        num_buckets=4).to_pandas() \
        .sort_values(["k", "fx"], na_position="last").reset_index(drop=True)
    # fact rows: 1 unmatched-left (null v), 2/3/3 matched; lookup-only
    # keys 7 and 9 emitted once each with null fact cols; dup key 9
    # resolves to min v = 90
    assert out["k"].tolist() == [1, 2, 3, 3, 7, 9]
    assert out["fx"].tolist()[:4] == ["a", "b", "c", "d"]
    assert out["fx"].isna().tolist() == [False] * 4 + [True, True]
    vals = out["v"].tolist()
    assert np.isnan(vals[0]) and vals[1:] == [20, 30, 30, 70, 90]
