"""Exact Pearson correlation matrix (stages/groupstats.corr_matrix)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import corr_matrix


def _ds(**cols):
    return rd.from_arrow(pa.table(
        {k: pa.array(v, type=pa.int64()) for k, v in cols.items()}))


def _exp(x, y):
    n = len(x)
    x, y = np.asarray(x, dtype=np.int64), np.asarray(y, dtype=np.int64)
    num = float(n * int((x * y).sum()) - int(x.sum()) * int(y.sum()))
    vx = n * int((x * x).sum()) - int(x.sum()) ** 2
    vy = n * int((y * y).sum()) - int(y.sum()) ** 2
    if vx == 0 or vy == 0:
        return None
    return num / (np.sqrt(float(vx)) * np.sqrt(float(vy)))


def test_corr_matrix_exact_parity():
    rng = np.random.default_rng(17)
    a = rng.integers(-50, 50, size=400).tolist()
    b = (np.asarray(a) * 2 + rng.integers(0, 10, size=400)).tolist()
    c = rng.integers(0, 5, size=400).tolist()
    out = corr_matrix(_ds(a=a, b=b, c=c), ["a", "b", "c"]).to_pydict()
    got = {(x, y): v for x, y, v in zip(out["col_a"], out["col_b"],
                                        out["corr"])}
    assert len(got) == 6
    # diagonal: fl(sqrt(v)*sqrt(v)) may be 1 ulp off v, so compare to
    # the identical expression, not literal 1.0
    assert got[("a", "a")] == _exp(a, a)
    assert got[("b", "b")] == _exp(b, b)
    assert got[("a", "b")] == _exp(a, b)
    assert got[("a", "c")] == _exp(a, c)
    assert got[("b", "c")] == _exp(b, c)
    assert all(n == 400 for n in out["n"])


def test_corr_matrix_degenerate_and_rejects():
    # zero-variance column → null corr rows (incl. its diagonal)
    out = corr_matrix(_ds(a=[1, 2, 3], z=[7, 7, 7]),
                      ["a", "z"]).to_pydict()
    got = {(x, y): v for x, y, v in zip(out["col_a"], out["col_b"],
                                        out["corr"])}
    assert got[("a", "a")] == _exp([1, 2, 3], [1, 2, 3])
    assert got[("a", "z")] is None and got[("z", "z")] is None
    with pytest.raises(ValueError, match="two columns"):
        corr_matrix(_ds(a=[1]), ["a"])
    with pytest.raises(ValueError, match="empty"):
        corr_matrix(_ds(a=[], b=[]), ["a", "b"])
    with pytest.raises(Exception, match="integer-valued"):
        corr_matrix(rd.from_arrow(pa.table(
            {"a": pa.array([1.5, 2.0]),
             "b": pa.array([1.0, 2.0])})), ["a", "b"])
    big = 1 << 31
    with pytest.raises(Exception, match="bound"):
        corr_matrix(_ds(a=[big, -big], b=[big, big - 1]), ["a", "b"])


def test_corr_matrix_perfect_anticorrelation():
    a = list(range(10))
    b = [-v for v in a]
    out = corr_matrix(_ds(a=a, b=b), ["a", "b"]).to_pydict()
    got = {(x, y): v for x, y, v in zip(out["col_a"], out["col_b"],
                                        out["corr"])}
    assert got[("a", "b")] == _exp(a, b)
    assert abs(got[("a", "b")] + 1.0) < 1e-15
