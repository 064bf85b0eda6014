"""Goldens for curation.balance_classes."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.curation import balance_classes


def _h(ids, seed=13):
    ids = np.asarray(ids, np.uint64)
    return ((ids % np.uint64(1 << 20)) * np.uint64(2654435761)
            + np.uint64(seed) * np.uint64(1315423911)) \
        % np.uint64(1 << 32)


def test_naive_parity_layouts_and_balance(ray_session):
    rng = np.random.default_rng(3)
    n = 2000
    cls = np.array(["a", "b", "c"])[
        rng.choice(3, n, p=[0.6, 0.3, 0.1])]
    ids = rng.permutation(10 ** 6)[:n]
    t = pa.table({"cls": pa.array(cls),
                  "id": pa.array(ids.astype(np.int64))})
    counts = {c: int((cls == c).sum()) for c in "abc"}
    k_min = min(counts.values())
    exp = set()
    for c in "abc":
        m = cls == c
        hh = _h(ids[m])
        order = np.lexsort((ids[m], hh))
        exp |= set(ids[m][order][:k_min].tolist())
    for nb in (1, 5):
        ds = rd.from_arrow(t)
        if nb > 1:
            ds = ds.repartition(nb)
        out = balance_classes(ds, "cls", "id").to_pandas()
        assert set(out["id"]) == exp
        vc = out["cls"].value_counts()
        assert (vc == k_min).all() and len(vc) == 3


def test_smallest_class_kept_whole(ray_session):
    t = pa.table({"cls": pa.array(["x"] * 10 + ["y"] * 3),
                  "id": pa.array(range(13), pa.int64())})
    out = balance_classes(rd.from_arrow(t), "cls",
                          "id").to_pandas()
    assert (out["cls"] == "y").sum() == 3
    assert (out["cls"] == "x").sum() == 3
    assert set(out[out.cls == "y"]["id"]) == {10, 11, 12}


def test_empty_rejects(ray_session):
    t = pa.table({"cls": pa.array([], pa.string()),
                  "id": pa.array([], pa.int64())})
    with pytest.raises(Exception, match="empty"):
        balance_classes(rd.from_arrow(t), "cls", "id")
