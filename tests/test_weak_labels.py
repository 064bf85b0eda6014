"""Goldens for curation.majority_vote_labels."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.curation import majority_vote_labels


def _mk(rows):
    arr = np.asarray(rows, np.int64)
    cols = {"id": pa.array(np.arange(len(rows), dtype=np.int64))}
    for j in range(arr.shape[1]):
        cols[f"lf{j}"] = pa.array(arr[:, j])
    return pa.table(cols), [f"lf{j}" for j in range(arr.shape[1])]


def test_hand_cases(ray_session):
    t, lfs = _mk([
        [1, 1, 0],      # majority 1 (2 vs 1)
        [0, 0, 1],      # majority 0
        [1, 0, -1],     # tie -> abstain
        [-1, -1, -1],   # all abstain
        [2, 2, 1],      # multiclass majority 2
        [1, -1, -1],    # single vote wins
    ])
    out = majority_vote_labels(rd.from_arrow(t), lfs,
                               id_col="id").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert list(out["vote"]) == [1, 0, -1, -1, 2, 1]
    assert list(out["n_votes"]) == [3, 3, 2, 0, 3, 1]
    assert list(out["n_agree"]) == [2, 2, 0, 0, 2, 1]


def test_naive_parity_fuzz(ray_session):
    rng = np.random.default_rng(7)
    rows = rng.integers(-1, 4, size=(500, 5))
    t, lfs = _mk(rows.tolist())
    out = majority_vote_labels(rd.from_arrow(t).repartition(4), lfs,
                               id_col="id").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    from collections import Counter
    for i, r in enumerate(rows):
        c = Counter(x for x in r if x != -1)
        if not c:
            exp = (-1, 0, 0)
        else:
            best = max(c.values())
            winners = [k for k, v in c.items() if v == best]
            if len(winners) > 1:
                exp = (-1, sum(c.values()), 0)
            else:
                exp = (winners[0], sum(c.values()), best)
        got = out.iloc[i]
        assert (got["vote"], got["n_votes"],
                got["n_agree"]) == exp, i


def test_rejects(ray_session):
    t, lfs = _mk([[1, 0]])
    with pytest.raises(ValueError, match="labeling"):
        majority_vote_labels(rd.from_arrow(t), [], id_col="id")
    bad = pa.table({"id": pa.array([1], pa.int64()),
                    "lf0": pa.array([-2], pa.int64())})
    with pytest.raises(Exception, match="non-negative"):
        majority_vote_labels(rd.from_arrow(bad), ["lf0"],
                             id_col="id").materialize()
