"""S5–S8 parser tests on F6-style synthetic raw text."""
import numpy as np
import pyarrow as pa

from feature_extraction_ray import fixtures as FX
from feature_extraction_ray.sources import parsers as P


def test_word_timing_cell_roundtrip():
    tbl = FX.gen_recognizer(n_calls=2, segs_per_call=3)
    cells = tbl["word_timing_str"].to_pylist()
    parsed = P.word_timing_column(cells)
    orig = tbl["word_timing"]
    assert parsed.to_pylist() == orig.to_pylist()


KALDI_SAMPLE = '''"c01_a_100_250
0 10 x y sil
10 20 x y hello
20 25 x y
25 40 x y world
40 48 x y
"c01_a_300_400
0 8 x y [noise]
8 16 x y
"c01_a_500_700
0 5 x y sil
5 30 x y token
30 44 x y'''


def test_parse_kaldi_timing_records():
    segs = P.parse_kaldi_timing(KALDI_SAMPLE)
    assert [s["segment_id"] for s in segs] == \
        ["c01_a_100_250", "c01_a_300_400", "c01_a_500_700"]
    assert segs[0]["segment_start"] == 100 and segs[0]["segment_end"] == 250
    assert len(segs[0]["timing_info"]) == 5


def test_kaldi_state_machine_semantics():
    segs = P.parse_kaldi_timing(KALDI_SAMPLE)
    # segment 1: sil(0-10), hello(10-25: ends at start of 'world' line=25?
    # semantics: word ends when the NEXT 5-field line starts
    words, sils, phones, wc, dur = P.kaldi_segment_times(
        segs[0]["timing_info"])
    assert wc == 2
    assert sils == [(10 - 0) * 25]
    # hello: starts 10, ends at 'world' start (25) -> (25-10)*25
    # world: last word, ends at last line end (48) -> (48-25)*25
    assert words == [(25 - 10) * 25, (48 - 25) * 25]
    assert len(phones) == 5
    assert dur == 48 * 25 * 0.001
    # noise-only segment: zero words
    _, _, _, wc2, _ = P.kaldi_segment_times(segs[1]["timing_info"])
    assert wc2 == 0


def test_kaldi_timing_table():
    t = P.kaldi_timing_table([KALDI_SAMPLE], ["callA"])
    assert len(t) == 3
    assert t["call_id"].to_pylist() == ["callA"] * 3


def test_confidence_parser():
    lines = [
        "c01_a_100_250 a b c d 0.91 x",
        "c01_a_100_250 a b c d 0.72 x",
        "c01_a_300_400 a b c d 0.55 x",
    ]
    t = P.parse_confidence_lines(lines)
    assert len(t) == 2
    assert t["conf_scores"].to_pylist() == [[0.91, 0.72], [0.55]]
    assert t["segment_start"].to_pylist() == [100, 300]


def test_hypotheses_parser():
    files = [
        ("call1", "c1_a_0_10 the cat\nc1_a_20_30 sat down"),
        ("call1", "c1_a_0_10 a cat\nc1_a_20_30 sat town"),
        ("call2", "c2_a_5_9 hi"),
    ]
    t = P.parse_hypotheses(files)
    assert len(t) == 3
    hyp = dict(zip([f"{c}/{s}" for c, s in
                    zip(t["call_id"].to_pylist(),
                        t["segment_id"].to_pylist())],
                   t["hypotheses"].to_pylist()))
    assert hyp["call1/c1_a_0_10"] == [["the", "cat"], ["a", "cat"]]
    assert hyp["call2/c2_a_5_9"] == [["hi"]]
