"""G10–G12 timing feature parity: engine vs a direct naive port of the
reference's get_times/get_feats (reimplemented here as the oracle —
SURVEY §5 strategy 3)."""
import numpy as np
import pytest
import ray.data as rd

from feature_extraction_ray import fixtures as FX
from feature_extraction_ray.stages import timing as T


def naive_get_times(segs):
    """Direct transliteration of extract_timing_features.get_times
    semantics for the oracle (operates on parsed dicts)."""
    out = {"segments": [], "silences": [], "words": [], "wps": []}
    for seg in segs:
        seg_dur_sec = seg["duration"] * 1e-7
        out["segments"].append(seg_dur_sec)
        for w in seg["word_timing"]:
            out["words"].append(w["Duration"] * 1e-4)
        out["wps"].append(len(seg["word_timing"]) / seg_dur_sec)
        wt = seg["word_timing"]
        for i in range(len(wt)):
            if i == 0:
                out["silences"].append((wt[0]["Offset"] - seg["offset"]) * 1e-4)
            else:
                prev_end = wt[i - 1]["Offset"] + wt[i - 1]["Duration"]
                out["silences"].append((wt[i]["Offset"] - prev_end) * 1e-4)
            if i == len(wt) - 1:
                seg_end = seg["offset"] + seg["duration"]
                w_end = wt[i]["Offset"] + wt[i]["Duration"]
                out["silences"].append((seg_end - w_end) * 1e-4)
        out["silences"] = [x for x in out["silences"] if x != 0]
    return out


def naive_pack(times, total=None):
    f = {}
    for st in ("segments", "silences", "words", "wps"):
        v = times[st]
        f[f"{st}_max"] = max(v) if v else float("nan")
        f[f"{st}_min"] = min(v) if v else float("nan")
        f[f"{st}_mean"] = np.mean(v) if v else float("nan")
        f[f"{st}_med"] = np.median(v) if v else float("nan")
        f[f"{st}_std"] = np.std(v) if v else float("nan")
    sil = np.sum(times["silences"]) * 0.001
    spk = np.sum(times["segments"])
    f["sil_duration"] = sil
    f["spk_duration"] = spk
    f["spk_sil_ratio"] = spk / sil if sil else float("nan")
    f["sps"] = len(times["silences"]) / spk if spk else float("nan")
    f["wps"] = len(times["words"]) / spk if spk else float("nan")
    f["sil_count"] = len(times["silences"])
    f["short_utt_count"] = len([x for x in times["segments"] if x <= 1])
    f["segment_count"] = len(times["segments"])
    f["word_count"] = len(times["words"])
    if total is not None:
        f["total_duration"] = total
        f["spk_ratio"] = spk / total if total else float("nan")
        f["sil_ratio"] = sil / total if total else float("nan")
        f["segs_per_min"] = len(times["segments"]) / (total / 60.0) \
            if total else float("nan")
        f["short_utts_per_min"] = f["short_utt_count"] / (total / 60.0) \
            if total else float("nan")
    return f


@pytest.fixture(scope="module")
def recognizer():
    return FX.gen_recognizer(n_calls=6, segs_per_call=8, seed=44)


def _oracle_rows(tbl, durations):
    pdf = tbl.to_pandas()
    out = {}
    for call, g in pdf.groupby("audio_file_id"):
        g = g.sort_values("segment_number")
        segs = g.to_dict("records")
        times = naive_get_times(segs)
        out[call] = naive_pack(times, durations[call] * 1e-3)
    return out


def test_timing_features_match_reference_oracle(recognizer):
    calls = sorted(set(recognizer["audio_file_id"].to_pylist()))
    durations = {c: 300_000 + i * 60_000 for i, c in enumerate(calls)}
    ds = rd.from_arrow(recognizer.drop_columns(["word_timing_str"]))
    got = T.extract_timing_features(
        ds, group_col="audio_file_id",
        duration_lookup=durations, num_buckets=3).to_pandas()
    exp = _oracle_rows(recognizer, durations)
    assert len(got) == len(exp)
    for _, row in got.iterrows():
        e = exp[row["group_id"]]
        for k, v in e.items():
            g = row[k]
            if isinstance(v, float) and np.isnan(v):
                assert np.isnan(g), (row["group_id"], k)
            else:
                np.testing.assert_allclose(g, v, rtol=1e-12,
                                           err_msg=f"{row['group_id']}.{k}")


def test_zero_length_silences_dropped(recognizer):
    # fixture plants zero gaps; naive oracle drops them — counts must agree
    calls = sorted(set(recognizer["audio_file_id"].to_pylist()))
    durations = {c: 100_000 for c in calls}
    ds = rd.from_arrow(recognizer.drop_columns(["word_timing_str"]))
    got = T.extract_timing_features(
        ds, group_col="audio_file_id",
        duration_lookup=durations, num_buckets=2).to_pandas()
    exp = _oracle_rows(recognizer, durations)
    for _, row in got.iterrows():
        assert row["sil_count"] == exp[row["group_id"]]["sil_count"]
