"""Exact AUC / ROC points (stages/evalmetrics)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.evalmetrics import binary_auc, roc_points


def _ds(scores, labels):
    return rd.from_arrow(pa.table({
        "s": pa.array(scores, type=pa.int64()),
        "lab": pa.array(labels, type=pa.int64())}))


def test_auc_hand_computed():
    # perfect separation
    out = binary_auc(_ds([1, 2, 3, 4], [0, 0, 1, 1]), "s", "lab") \
        .to_pandas().iloc[0]
    assert out["auc"] == 1.0
    # tie: pos at s=1 (avg rank 1.5) and s=2 (rank 3) → AUC 0.75
    out = binary_auc(_ds([1, 1, 2], [0, 1, 1]), "s", "lab") \
        .to_pandas().iloc[0]
    assert (out["n_pos"], out["n_neg"], out["r2_pos"]) == (2, 1, 9)
    assert out["auc"] == 0.75
    # all scores equal → 0.5 exactly
    out = binary_auc(_ds([7, 7, 7, 7], [0, 1, 0, 1]), "s", "lab") \
        .to_pandas().iloc[0]
    assert out["auc"] == 0.5


def test_auc_fuzz_pairwise_parity():
    """Rank-sum numerator == the O(n²) pairwise count EXACTLY (both
    are the same integer), so the AUC floats are bit-equal."""
    rng = np.random.default_rng(3)
    for trial in range(6):
        n = int(rng.integers(5, 400))
        s = rng.integers(-50, 50, size=n)
        lab = rng.integers(0, 2, size=n)
        if lab.sum() in (0, n):
            lab[0] = 1 - lab[0]
        out = binary_auc(_ds(s.tolist(), lab.tolist()), "s", "lab") \
            .to_pandas().iloc[0]
        sp, sn = s[lab == 1], s[lab == 0]
        num2 = int((2 * (sp[:, None] > sn[None, :]).sum())
                   + (sp[:, None] == sn[None, :]).sum())
        assert int(out["r2_pos"]
                   - out["n_pos"] * (out["n_pos"] + 1)) == num2
        assert out["auc"] == num2 / (2.0 * len(sp) * len(sn))


def test_roc_trapezoid_equals_auc():
    rng = np.random.default_rng(9)
    s = rng.integers(0, 40, size=500)
    lab = (rng.random(500) < (s / 60)).astype(np.int64)
    if lab.sum() in (0, 500):
        lab[0] = 1 - lab[0]
    ds = _ds(s.tolist(), lab.tolist())
    auc = binary_auc(ds, "s", "lab").to_pandas().iloc[0]["auc"]
    pts = roc_points(ds, "s", "lab").to_pandas() \
        .sort_values("score", ascending=False)
    x = np.r_[0.0, pts["fpr"].to_numpy()]
    y = np.r_[0.0, pts["tpr"].to_numpy()]
    area = np.trapz(y, x)
    assert x[-1] == 1.0 and y[-1] == 1.0
    assert abs(area - auc) < 1e-12
    # cumulative counts are monotone and end at the class totals
    assert (np.diff(pts["tp"]) >= 0).all()
    assert (np.diff(pts["fp"]) >= 0).all()


def test_auc_degenerate_and_rejects():
    out = binary_auc(_ds([1, 2], [1, 1]), "s", "lab").to_pandas().iloc[0]
    assert out["n_neg"] == 0 and np.isnan(out["auc"])
    with pytest.raises(Exception):
        binary_auc(rd.from_arrow(pa.table(
            {"s": pa.array([0.5]), "lab": pa.array([1])})),
            "s", "lab").to_pandas()
    with pytest.raises(Exception):
        binary_auc(_ds([1, 2], [0, 2]), "s", "lab").to_pandas()
