"""§3 pipeline parity tests over F3/F6 fixtures (naive oracles inline)."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from feature_extraction_ray import fixtures as FX
from feature_extraction_ray.pipelines import asr_features as AF
from feature_extraction_ray.sources import parsers as P


@pytest.fixture(scope="module")
def recognizer():
    return FX.gen_recognizer(n_calls=5, segs_per_call=6, seed=7)


def test_text_features_verbosity_oracle(recognizer):
    import re
    ds = rd.from_arrow(recognizer.drop_columns(["word_timing",
                                                "word_timing_str"]))
    got = AF.text_features(ds, num_buckets=3).to_pandas().set_index("id")
    pdf = recognizer.to_pandas()
    for call, g in pdf.groupby("audio_file_id"):
        g = g.sort_values("segment_number")
        # reference §3.1 verbosity prep: join cased text -> sentence split
        # -> strip punct (keep apostrophes) -> lower -> split(" ")
        joined = " ".join(g["text"])
        sents = [s for s in re.split(r"(?<=[.!?])\s+", joined.strip()) if s]
        counts = []
        for s in sents:
            ws = [w for w in
                  re.sub(r"[^\w\d'\s]+", "", s).lower().split(" ") if w]
            counts.append(len(ws))
        assert got.loc[call, "wc_mean"] == pytest.approx(np.mean(counts))
        assert got.loc[call, "wc_stdev"] == pytest.approx(np.std(counts))
        assert got.loc[call, "total_count"] == pytest.approx(sum(counts))
        # graph + lexical columns exist
        assert not np.isnan(got.loc[call, "num_nodes_naive"])
        assert not np.isnan(got.loc[call, "MATTR_10"])


def test_confidence_features_oracle(recognizer):
    ds = rd.from_arrow(recognizer.select(["audio_file_id", "confidence"]))
    got = AF.confidence_features(ds, num_buckets=2).to_pandas().set_index(
        "id")
    pdf = recognizer.to_pandas()
    for call, g in pdf.groupby("audio_file_id"):
        v = g["confidence"].to_numpy()
        assert got.loc[call, "conf_max"] == pytest.approx(v.max())
        assert got.loc[call, "conf_mean"] == pytest.approx(v.mean())
        assert got.loc[call, "conf_std"] == pytest.approx(v.std(ddof=0))
        assert got.loc[call, "conf_med"] == pytest.approx(np.median(v))


KALDI_A = '''"c01_a_0_100
0 10 x y sil
10 20 x y alpha
20 28 x y
28 40 x y beta
40 52 x y
"c01_a_200_300
0 6 x y gamma
6 14 x y'''

KALDI_B = '''"c02_a_0_50
0 4 x y sil
4 30 x y delta
30 44 x y'''


def test_kaldi_timing_features_pipeline():
    tbl = P.kaldi_timing_table([KALDI_A, KALDI_B], ["c01", "c02"])
    ds = rd.from_arrow(tbl)
    got = AF.kaldi_timing_features(
        ds, duration_lookup={"c01": 60_000, "c02": 30_000},
        num_buckets=2).to_pandas().set_index("id")
    # c01 segment 1: sil 10*25; alpha (10→28)*25, beta (28→52)*25
    # segment 2: gamma (0→14)*25
    assert got.loc["c01", "word_count"] == 3
    assert got.loc["c01", "sil_count"] == 1
    assert got.loc["c01", "phone_count"] == 7
    exp_words = [(28 - 10) * 25, (52 - 28) * 25, 14 * 25]
    assert got.loc["c01", "words_mean"] == pytest.approx(np.mean(exp_words))
    # durations: seg1 = 52*25ms = 1.3s, seg2 = 14*25 = .35s
    assert got.loc["c01", "spk_duration"] == pytest.approx(1.3 + 0.35)
    assert got.loc["c01", "total_duration"] == pytest.approx(60.0)
    assert got.loc["c02", "word_count"] == 1
    # pps: phones / spk_duration
    assert got.loc["c02", "pps"] == pytest.approx(3 / (44 * 25 * 0.001))


def test_hypotheses_mean_reduce():
    files = [
        ("call1", "c1_a_0_10 the cat sat\nc1_a_20_30 on the mat"),
        ("call1", "c1_a_0_10 a cat sat\nc1_a_20_30 on a mat today"),
    ]
    tbl = P.parse_hypotheses(files)
    got = AF.hypotheses_features(rd.from_arrow(tbl),
                                 num_buckets=1).to_pandas().set_index("id")
    # hyp0: segments [3,3] -> wc_mean 3 ; hyp1: [3,4] -> 3.5 ; mean = 3.25
    assert got.loc["call1", "wc_mean"] == pytest.approx(3.25)
    assert got.loc["call1", "total_count"] == pytest.approx((6 + 7) / 2)
