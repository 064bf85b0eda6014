"""Exact binary-classification evaluation metrics.

The model-eval rung of the feature/training pipeline: once a scoring
stage (`inference.py` linear probe, a quality classifier, a retrieval
ranker) has attached scores, these ops grade them against labels —
EXACTLY. Scores must be INTEGER units (the caller quantizes — e.g. the
micro-unit cosine convention of ``sketches.calibration_bins``), so
every sufficient statistic is an exact int64 and each reported float is
ONE fixed IEEE expression over exact ints; SQL twins compare STRICTLY
with no tolerance.

AUC is the tie-corrected Mann–Whitney rank-sum: with ``R`` the sum of
average ranks of the positives (ties share the average rank of their
run — exact in HALVES, so we carry ``r2 = 2·R`` as an int64),

    AUC = (r2 − n_pos·(n_pos+1)) / (2·n_pos·n_neg).

Scale shape: per-block distinct-score partials (``np.unique`` — block
rows collapse to the block's distinct scores) ride ONE
``groupby(score)`` exchange; the finish walks the DISTINCT-SCORE table
only, which is span-bounded for quantized scores (micro-units: ≤ 2e6+1
rows) — the labeled data itself never lands on the driver. Exactness
bound: ``n · n_pos < 2^62`` (rank sums are int64) — beyond that,
pre-aggregate per stratum.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Sum


def _score_label_table(ds: Dataset, score_col: str,
                       label_col: str) -> pa.Table:
    """ONE exchange: distinct score → (n, pos) exact int64. Labels must
    be 0/1-valued, scores integer-valued (loud rejects)."""

    def partial(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy(zero_copy_only=False)
        lab = t[label_col].to_numpy(zero_copy_only=False)
        si = s.astype(np.int64)
        li = lab.astype(np.int64)
        if not np.array_equal(si.astype(s.dtype), s):
            raise ValueError(f"{score_col} must be integer-valued")
        if not np.isin(li, (0, 1)).all():
            raise ValueError(f"{label_col} must be 0/1")
        u, inv, cnt = np.unique(si, return_inverse=True,
                                return_counts=True)
        p = np.zeros(len(u), dtype=np.int64)
        np.add.at(p, inv, li)
        return pa.table({"s": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64)),
                         "p": pa.array(p)})

    g = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("s").aggregate(Sum("n", alias_name="n"),
                                Sum("p", alias_name="p"))
    t = pa.Table.from_pandas(g.to_pandas(), preserve_index=False)
    if len(t) == 0 or "s" not in t.column_names:
        z = pa.array([], type=pa.int64())
        return pa.table({"s": z, "n": z, "p": z})
    return t.sort_by("s")


def binary_auc(ds: Dataset, score_col: str, label_col: str) -> Dataset:
    """Exact ROC-AUC (tie-corrected rank-sum). One row:
    ``n_pos, n_neg, r2_pos`` (exact int64 — ``r2_pos`` is twice the sum
    of the positives' average ranks) and
    ``auc = (r2_pos − n_pos·(n_pos+1)) / (2.0·n_pos·n_neg)`` as ONE
    fixed expression (null when either class is empty)."""
    t = _score_label_table(ds, score_col, label_col)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    p = t["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    cb = np.cumsum(n) - n            # rows strictly below each score
    r2 = int((p * (2 * cb + n + 1)).sum())
    n_pos = int(p.sum())
    n_neg = int((n - p).sum())
    if n_pos and n_neg:
        auc = np.float64(r2 - n_pos * (n_pos + 1)) \
            / (2.0 * np.float64(n_pos) * np.float64(n_neg))
        auc_arr = pa.array([auc], type=pa.float64())
    else:
        auc_arr = pa.array([None], type=pa.float64())
    return rd.from_arrow(pa.table({
        "n_pos": pa.array([n_pos], type=pa.int64()),
        "n_neg": pa.array([n_neg], type=pa.int64()),
        "r2_pos": pa.array([r2], type=pa.int64()),
        "auc": auc_arr}))


def roc_points(ds: Dataset, score_col: str, label_col: str) -> Dataset:
    """Exact ROC curve: one row per DISTINCT score (the threshold
    "predict positive when score ≥ s") with cumulative ``tp``/``fp``
    (exact int64) and ``tpr = tp / (1.0·n_pos)``, ``fpr = fp /
    (1.0·n_neg)`` as single divisions. Walking (fpr, tpr) score-
    descending traces the curve; the trapezoid area equals
    :func:`binary_auc` (pinned by a property test)."""
    t = _score_label_table(ds, score_col, label_col)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    p = t["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    # t is score-ascending; cumulate from the top (score descending)
    tp = np.cumsum(p[::-1])[::-1]
    fp = np.cumsum((n - p)[::-1])[::-1]
    n_pos = int(p.sum())
    n_neg = int((n - p).sum())
    tpr = tp.astype(np.float64) / (1.0 * np.float64(n_pos)) \
        if n_pos else np.full(len(n), np.nan)
    fpr = fp.astype(np.float64) / (1.0 * np.float64(n_neg)) \
        if n_neg else np.full(len(n), np.nan)
    return rd.from_arrow(pa.table({
        "score": t["s"], "n": pa.array(n), "pos": pa.array(p),
        "tp": pa.array(tp), "fp": pa.array(fp),
        "tpr": pa.array(tpr, from_pandas=True),
        "fpr": pa.array(fpr, from_pandas=True)}))


def isotonic_fit(ds: Dataset, score_col: str, label_col: str) -> Dataset:
    """Isotonic-regression probability calibration (pool-adjacent-
    violators): the non-decreasing step function over DISTINCT scores
    minimizing squared error against the 0/1 labels — the
    non-parametric sibling of :func:`calibration_bins` (it learns the
    bin edges instead of fixing them).

    Exactness contract: the labeled data rides the SAME one-exchange
    distinct-score reduction as :func:`roc_points`; PAV runs on the
    driver over the span-bounded distinct-score table with pool
    comparisons by exact int64 cross-multiplication (``p₁·n₂ ≥ p₂·n₁``
    — no float ever decides a merge; bound ``n·n_pos < 2⁶²``
    documented), and each level's calibrated probability is ONE
    division ``pool_pos / pool_n`` of exact ints. A SQL twin needs no
    PAV: the minimax identity ``iso_i = min_{k≥i} max_{j≤i}
    avg(j..k)`` holds in DOUBLES too — IEEE rounding is monotone, so
    min/max commute with fl(), and equal rationals divide to the
    identical double — hence the twin compares STRICTLY (keep the
    distinct-level count L small enough for its O(L³) join).

    Output per distinct score: ``score, n, pos, iso``."""
    t = _score_label_table(ds, score_col, label_col)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    p = t["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(n.sum())
    if total and total * max(int(p.sum()), 1) >= (1 << 62):
        raise ValueError("int64 exactness bound exceeded: n·n_pos")
    # PAV over score-ascending levels: pools as (pos, n, count) stacks
    ps, ns, width = [], [], []
    for i in range(len(n)):
        cp, cn, cw = int(p[i]), int(n[i]), 1
        # merge while the previous pool mean >= this pool mean
        while ps and ps[-1] * cn >= cp * ns[-1]:
            cp += ps.pop()
            cn += ns.pop()
            cw += width.pop()
        ps.append(cp)
        ns.append(cn)
        width.append(cw)
    iso = np.empty(len(n), dtype=np.float64)
    pos = 0
    for cp, cn, cw in zip(ps, ns, width):
        iso[pos:pos + cw] = float(cp) / float(cn)
        pos += cw
    return rd.from_arrow(pa.table({
        "score": t["s"], "n": pa.array(n), "pos": pa.array(p),
        "iso": pa.array(iso)}))


def retrieval_metrics(ds: Dataset, query_col: str, id_col: str,
                      score_col: str, rel_col: str, k: int = 10,
                      num_buckets: int = 32) -> Dataset:
    """Per-query retrieval ranking metrics — the IR-eval rung for a
    retrieval/ranking stage (BM25, ANN, hybrid RRF): rank candidates
    per query by (score desc, id asc) and report, per query,

    * ``n_cand`` / ``n_rel`` — exact int64 counts,
    * ``first_rel`` — rank of the first relevant hit (NULL if none),
    * ``rr`` — reciprocal rank, ONE division of exact ints (strict),
    * ``hits_k`` / ``p_at_k`` / ``r_at_k`` — precision/recall@k, each
      ONE division (strict; ``r_at_k`` NULL when ``n_rel = 0``),
    * ``dcg_k`` / ``ndcg_k`` — binary-gain DCG@k ``Σ 1/log2(rank+1)``
      and its ideal-normalized form; log terms are irrational so
      round-6 on BOTH sides is boundary-safe (the repo's entropy/log
      lesson), with IDCG from the same ascending prefix sums.

    Scores must be integer-valued (quantize first — micro-unit cosine
    convention) so ranking ties break identically in SQL; relevance
    must be 0/1. ONE bucketed exchange on the query key; each bucket
    ranks via one lexsort + reduceat segment pass, no per-row Python.
    """
    from .window import bucketed_apply

    if k < 1:
        raise ValueError("retrieval_metrics: k must be >= 1")
    # ascending prefix of the ideal gains: idcg[j] = sum_{i=1..j} g(i)
    gains = 1.0 / np.log2(np.arange(1, k + 1, dtype=np.float64) + 1.0)
    ideal = np.concatenate([[0.0], np.cumsum(gains)])

    def per_bucket(t: pa.Table) -> pa.Table:
        cols = {
            query_col: pa.array([], pa.int64()),
            "n_cand": pa.array([], pa.int64()),
            "n_rel": pa.array([], pa.int64()),
            "first_rel": pa.array([], pa.int64()),
            "rr": pa.array([], pa.float64()),
            "hits_k": pa.array([], pa.int64()),
            "p_at_k": pa.array([], pa.float64()),
            "r_at_k": pa.array([], pa.float64()),
            "dcg_k": pa.array([], pa.float64()),
            "ndcg_k": pa.array([], pa.float64())}
        if len(t) == 0:
            return pa.table(cols)
        q = t[query_col].to_numpy(zero_copy_only=False)
        s = t[score_col].to_numpy(zero_copy_only=False)
        if not np.all(s == np.floor(s)):
            raise ValueError("retrieval_metrics: scores must be "
                             "integer-valued; quantize first")
        s = s.astype(np.int64)
        rel = t[rel_col].to_numpy(zero_copy_only=False)
        if not np.isin(rel, (0, 1)).all():
            raise ValueError("retrieval_metrics: relevance must be "
                             "0/1-valued")
        rel = rel.astype(np.int64)
        did = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -s, q))
        q, s, rel = q[order], s[order], rel[order]
        starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]])
        n = np.diff(np.r_[starts, len(q)])
        rk = np.arange(len(q)) - np.repeat(starts, n) + 1
        n_rel = np.add.reduceat(rel, starts)
        # first relevant rank: min rank among rel==1 per group
        big = np.int64(1 << 62)
        rk_rel = np.where(rel == 1, rk, big)
        first = np.minimum.reduceat(rk_rel, starts)
        has = first < big
        topk = (rk <= k) & (rel == 1)
        hits = np.add.reduceat(topk.astype(np.int64), starts)
        dcg = np.add.reduceat(
            np.where(topk, 1.0 / np.log2(rk + 1.0), 0.0), starts)
        idcg = ideal[np.minimum(n_rel, k)]
        with np.errstate(divide="ignore", invalid="ignore"):
            rr = np.where(has, 1.0 / first, np.nan)
            ndcg = np.where(n_rel > 0, dcg / idcg, np.nan)
            r_at_k = np.where(n_rel > 0, hits / n_rel, np.nan)
        return pa.table({
            query_col: pa.array(q[starts].astype(np.int64)),
            "n_cand": pa.array(n.astype(np.int64)),
            "n_rel": pa.array(n_rel),
            "first_rel": pa.array(
                np.where(has, first, 0), mask=~has),
            "rr": pa.array(rr, mask=~has),
            "hits_k": pa.array(hits),
            "p_at_k": pa.array(hits / float(k)),
            "r_at_k": pa.array(r_at_k, mask=n_rel == 0),
            "dcg_k": pa.array(dcg),
            "ndcg_k": pa.array(ndcg, mask=n_rel == 0)})

    return bucketed_apply(ds, query_col, per_bucket, num_buckets,
                          drop_bucket=False)


def conformal_intervals(ds: Dataset, score_col: str, label_col: str,
                        id_col: str, alpha: float = 0.1,
                        calib_mod: int = 5, seed: int = 3) -> Dataset:
    """Split-conformal prediction intervals — the
    distribution-free uncertainty wrapper for any scoring stage
    (Vovk; Angelopoulos & Bates 2022): a DETERMINISTIC hash split
    carves out a calibration set (``h(id) mod calib_mod == 0`` on the
    repo's shared overflow-safe family), the conformal quantile is
    the EXACT ``ceil((1−alpha)·(n_cal+1))``-th smallest absolute
    residual ``|score − label|`` (an order statistic — no
    interpolation, so a SQL row_number twin reproduces it
    bit-for-bit; when the index exceeds n_cal the interval is
    unbounded and emitted NULL), and every NON-calibration row gets
    ``[score − q̂, score + q̂]`` plus a 0/1 coverage witness. With the
    exchangeability assumption the marginal coverage is ≥ 1−alpha
    (pinned empirically in tests).

    Scores and labels must be integer-valued (micro-unit convention)
    so residuals, q̂ and both interval ends are exact int64. Scale
    shape: calibration residuals ride ONE value-bounded
    ``groupby(resid).count`` exchange (distinct-residual histogram →
    order statistic via cumulative counts on the driver — never raw
    rows), scoring rows stream through one vectorized pass."""
    if not (0.0 < alpha < 1.0):
        raise ValueError("conformal_intervals: alpha must be in "
                         "(0, 1)")
    if calib_mod < 2:
        raise ValueError("conformal_intervals: calib_mod must be "
                         ">= 2")

    def prep(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy(zero_copy_only=False)
        y = t[label_col].to_numpy(zero_copy_only=False)
        if not (np.all(s == np.floor(s))
                and np.all(y == np.floor(y))):
            raise ValueError("conformal_intervals: scores and labels "
                             "must be integer-valued; quantize first")
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        h = ((ids % np.uint64(1 << 20)) * np.uint64(2654435761)
             + np.uint64(seed) * np.uint64(1315423911)) \
            % np.uint64(1 << 32)
        cal = (h % np.uint64(calib_mod)) == 0
        resid = np.abs(s.astype(np.int64) - y.astype(np.int64))
        return pa.table({id_col: t[id_col],
                         "s": pa.array(s.astype(np.int64)),
                         "y": pa.array(y.astype(np.int64)),
                         "resid": pa.array(resid),
                         "cal": pa.array(cal)})

    prepped = ds.map_batches(prep,
                             batch_format="pyarrow").materialize()
    hist = prepped.map_batches(
        lambda t: t.filter(t["cal"]),
        batch_format="pyarrow").groupby("resid").count().to_pandas()
    if hist.empty:
        raise ValueError("conformal_intervals: calibration split is "
                         "empty")
    hist = hist.sort_values("resid").reset_index(drop=True)
    rv = hist["resid"].to_numpy().astype(np.int64)
    rc = hist["count()"].to_numpy().astype(np.int64).cumsum()
    n_cal = int(rc[-1])
    import math
    idx = math.ceil((1.0 - alpha) * (n_cal + 1))
    if idx > n_cal:
        qhat = None
    else:
        qhat = int(rv[np.searchsorted(rc, idx, side="left")])

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t["cal"]))
        n = len(t)
        if qhat is None:
            lo = pa.nulls(n, pa.int64())
            hi = pa.nulls(n, pa.int64())
            cov = pa.array(np.ones(n, np.int64))
        else:
            s = t["s"].to_numpy(zero_copy_only=False)
            r = t["resid"].to_numpy(zero_copy_only=False)
            lo = pa.array(s - qhat)
            hi = pa.array(s + qhat)
            cov = pa.array((r <= qhat).astype(np.int64))
        return pa.table({id_col: t[id_col], "s": t["s"],
                         "y": t["y"], "lo": lo, "hi": hi,
                         "covered": cov})

    return prepped.map_batches(finish, batch_format="pyarrow")


def youden_threshold(ds: Dataset, score_col: str,
                     label_col: str) -> Dataset:
    """Optimal operating point by Youden's J — the standard
    threshold-selection rule (maximize ``tpr − fpr``) closing the
    eval family's loop from curve to DECISION: over the distinct-
    score table (same one-exchange reduction as :func:`roc_points`),
    the chosen threshold "predict positive when score ≥ s" maximizes
    the EXACT cross-multiplied integer ``j_num = tp·n_neg − fp·n_pos``
    (no float ever picks the argmax; ties → smallest threshold), and

        j = tp/n_pos − fp/n_neg      (two one-divisions, fixed)

    One row: threshold, tp, fp, n_pos, n_neg, j_num, j — the window
    twin compares STRICTLY. Empty classes yield nulls. Bound
    ``n·max(n_pos, n_neg) < 2^62`` (inherited from the table)."""
    t = _score_label_table(ds, score_col, label_col)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    p = t["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_pos = int(p.sum())
    n_neg = int((n - p).sum())
    if len(n) == 0 or n_pos == 0 or n_neg == 0:
        return rd.from_arrow(pa.table({
            "threshold": pa.array([None], pa.int64()),
            "tp": pa.array([None], pa.int64()),
            "fp": pa.array([None], pa.int64()),
            "n_pos": pa.array([n_pos], pa.int64()),
            "n_neg": pa.array([n_neg], pa.int64()),
            "j_num": pa.array([None], pa.int64()),
            "j": pa.array([None], pa.float64())}))
    tp = np.cumsum(p[::-1])[::-1]
    fp = np.cumsum((n - p)[::-1])[::-1]
    j_num = tp * n_neg - fp * n_pos
    best = int(j_num.max())
    # ties -> smallest threshold; scores ascending so first hit wins
    i = int(np.flatnonzero(j_num == best)[0])
    s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    j = (np.float64(tp[i]) / np.float64(n_pos)
         - np.float64(fp[i]) / np.float64(n_neg))
    return rd.from_arrow(pa.table({
        "threshold": pa.array([int(s[i])], pa.int64()),
        "tp": pa.array([int(tp[i])], pa.int64()),
        "fp": pa.array([int(fp[i])], pa.int64()),
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64()),
        "j_num": pa.array([best], pa.int64()),
        "j": pa.array([float(j)], pa.float64())}))


def gains_table(ds: Dataset, score_col: str, label_col: str,
                id_col: str, n_bins: int = 10) -> Dataset:
    """Gains / lift table — the marketing-model eval classic (how
    many positives does the top decile of scores capture?): rows
    ranked globally by (score desc, id), split into ``n_bins`` equal
    rank bins ``bin = ((rn−1)·n_bins) // N``; per bin, exact int64
    ``n_k`` / ``pos_k`` / cumulative ``cum_n`` / ``cum_pos``, and

        gain = cum_pos / n_pos
        lift = (cum_pos / cum_n) / (n_pos / N)

    each a fixed chain of one-divisions over exact ints — the
    row_number SQL twin compares STRICTLY. Scale shape: one
    distributed two-phase ``partition.row_number`` sort + per-block
    bin partials through ONE n_bins-bounded exchange; the finish is
    n_bins driver rows."""
    from .partition import row_number
    if n_bins < 2:
        raise ValueError("gains_table: n_bins must be >= 2")

    def neg(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy(zero_copy_only=False)
        si = s.astype(np.int64)
        if not np.array_equal(si.astype(s.dtype), s):
            raise ValueError("gains_table: scores must be "
                             "integer-valued")
        lab = t[label_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if not np.isin(lab, (0, 1)).all():
            raise ValueError("gains_table: labels must be 0/1")
        return pa.table({"__negs": pa.array(-si),
                         id_col: t[id_col],
                         "lab": pa.array(lab)})

    r = row_number(ds.map_batches(neg, batch_format="pyarrow"),
                   ["__negs", id_col], out_col="__rn", start=1)
    r = r.materialize()
    N = r.count()
    if N == 0:
        raise ValueError("gains_table: empty input")

    def partial(t: pa.Table) -> pa.Table:
        rn = t["__rn"].to_numpy(zero_copy_only=False)
        lab = t["lab"].to_numpy(zero_copy_only=False)
        b = ((rn - 1) * n_bins) // N
        nb = np.bincount(b, minlength=n_bins).astype(np.int64)
        pb = np.zeros(n_bins, np.int64)
        np.add.at(pb, b, lab)
        return pa.table({"bin": pa.array(np.arange(n_bins,
                                                   dtype=np.int64)),
                         "n_part": pa.array(nb),
                         "p_part": pa.array(pb)})

    agg = r.map_batches(partial, batch_format="pyarrow") \
        .groupby("bin").aggregate(
            Sum("n_part", alias_name="n_k"),
            Sum("p_part", alias_name="pos_k")).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    n_k = agg["n_k"].to_numpy().astype(np.int64)
    pos_k = agg["pos_k"].to_numpy().astype(np.int64)
    cum_n = np.cumsum(n_k)
    cum_pos = np.cumsum(pos_k)
    n_pos = int(pos_k.sum())
    base = np.float64(n_pos) / np.float64(N)
    with np.errstate(divide="ignore", invalid="ignore"):
        gain = np.where(n_pos > 0,
                        cum_pos / np.float64(max(n_pos, 1)), np.nan)
        lift = np.where((n_pos > 0) & (cum_n > 0),
                        (cum_pos / cum_n.astype(np.float64)) / base,
                        np.nan)
    return rd.from_arrow(pa.table({
        "bin": pa.array(agg["bin"].to_numpy().astype(np.int64)),
        "n_k": pa.array(n_k), "pos_k": pa.array(pos_k),
        "cum_n": pa.array(cum_n.astype(np.int64)),
        "cum_pos": pa.array(cum_pos.astype(np.int64)),
        "gain": pa.array(gain, mask=~np.repeat(n_pos > 0,
                                               len(n_k))),
        "lift": pa.array(lift, mask=~((n_pos > 0) & (cum_n > 0)))}))
