"""Goldens for curation.secret_scan."""
import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.curation import secret_scan


def _ent(tok):
    from collections import Counter
    c = Counter(tok)
    L = len(tok)
    return math.log2(L) - sum(n * math.log2(n)
                              for n in c.values()) / L


def test_exact_entropy_and_flags(ray_session):
    high = "aK9xQ2mZ8pL4vB7nR3cD"      # 20 distinct-ish chars
    low = "AAAAAAAAAAAAAAAA"           # entropy 0
    mid = "ABABABABABABABAB"           # entropy 1 exactly
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": [f"hello {high} world",
                           f"x {low} y {low}",
                           f"z {mid}"]})
    out = secret_scan(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 3
    r1, r2, r3 = out.iloc[0], out.iloc[1], out.iloc[2]
    assert r1["token"] == high and r1["is_secret"] == 1
    assert abs(r1["entropy"] - _ent(high)) < 1e-12
    assert r2["token"] == low and r2["n_occ"] == 2
    assert r2["entropy"] == 0.0 and r2["is_secret"] == 0
    assert r3["entropy"] == 1.0 and r3["is_secret"] == 0


def test_candidate_class_and_min_len(ray_session):
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": ["short0123456789 has!punct0123456789x "
                           "okBase64Token+/=_-X"]})
    out = secret_scan(rd.from_arrow(t)).to_pandas()
    # 15-char token too short; punctuated token not in class;
    # the base64-class 19-char token qualifies
    assert list(out["token"]) == ["okBase64Token+/=_-X"]


def test_no_candidates_empty(ray_session):
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": ["just short words here"]})
    out = secret_scan(rd.from_arrow(t)).to_pandas()
    assert len(out) == 0


def test_random_keys_score_high_english_low(ray_session):
    rng = np.random.default_rng(3)
    chars = np.array(list(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        "0123456789"))
    keys = ["".join(rng.choice(chars, 32)) for _ in range(20)]
    english = "administration" + "implementation"  # 28 alpha chars
    t = pa.table({"doc_id": pa.array(
        list(range(20)) + [99], pa.int64()),
        "text": keys + [english]})
    out = secret_scan(rd.from_arrow(t)).to_pandas()
    keys_out = out[out.doc_id < 99]
    assert (keys_out["is_secret"] == 1).all()
    eng = out[out.doc_id == 99].iloc[0]
    assert eng["is_secret"] == 0  # repeated letters drag H below 3.5
