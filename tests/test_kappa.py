"""Goldens for groupstats.cohens_kappa."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import cohens_kappa


def _mk(a, b):
    return pa.table({"a": pa.array(np.asarray(a, np.int64)),
                     "b": pa.array(np.asarray(b, np.int64))})


def test_textbook_case(ray_session):
    # classic 2x2: a/b agree on 20+15, disagree 5+10 (n=50)
    a = [0] * 25 + [1] * 25
    b = [0] * 20 + [1] * 5 + [0] * 10 + [1] * 15
    out = cohens_kappa(rd.from_arrow(_mk(a, b)), "a",
                       "b").to_pandas().iloc[0]
    n, agree = 50, 35
    na = [25, 25]
    nb = [30, 20]
    pe = (na[0] * nb[0] + na[1] * nb[1]) / n ** 2
    po = agree / n
    assert out["n"] == n and out["agree"] == agree
    assert out["po"] == po and out["pe"] == pe
    assert abs(out["kappa"] - (po - pe) / (1 - pe)) < 1e-15


def test_perfect_and_chance(ray_session):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 3, 3000)
    out = cohens_kappa(rd.from_arrow(_mk(a, a)).repartition(4),
                       "a", "b").to_pandas().iloc[0]
    assert out["kappa"] == 1.0
    b = rng.integers(0, 3, 3000)
    out2 = cohens_kappa(rd.from_arrow(_mk(a, b)), "a",
                        "b").to_pandas().iloc[0]
    assert abs(out2["kappa"]) < 0.05  # independent raters ~ 0


def test_degenerate_single_label_null(ray_session):
    import pandas as pd
    out = cohens_kappa(rd.from_arrow(_mk([1, 1], [1, 1])), "a",
                       "b").to_pandas().iloc[0]
    assert pd.isna(out["kappa"]) and out["po"] == 1.0


def test_rejects(ray_session):
    with pytest.raises(Exception, match="non-negative"):
        cohens_kappa(rd.from_arrow(_mk([-1], [0])), "a",
                     "b").to_pandas()
