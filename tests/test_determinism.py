"""Run-to-run determinism of the non-SQL (rows-only) query entries: the
driver compares value hashes across rounds, so every output must be
bit-stable across fresh invocations in the same session."""
import numpy as np
import pandas as pd
import pytest

from feature_extraction_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"

NAMES = ["minhash_dedup_docs", "simhash_docs", "embedding_dedup_docs",
         "knn_embeddings_lsh", "knn_embeddings_ivf", "text_analysis_docs",
         "flagship_session_features", "media_features",
         "global_shuffle_docs", "phrase_rewrite_docs"]


def _canon(res) -> pd.DataFrame:
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    df = df[sorted(df.columns)]
    sort_cols = [c for c in df.columns
                 if df[c].dtype.kind in "iufO" and
                 not df[c].map(lambda x: isinstance(x, (list, np.ndarray,
                                                        bytes))).any()]
    return df.sort_values(by=sort_cols, kind="stable",
                          na_position="first").reset_index(drop=True)


@pytest.mark.parametrize("name", NAMES)
def test_rows_only_query_deterministic(name):
    a = _canon(QUERIES[name](SF))
    b = _canon(QUERIES[name](SF))
    assert len(a) == len(b), name
    for c in a.columns:
        va, vb = a[c], b[c]
        if va.dtype.kind == "f":
            np.testing.assert_allclose(va, vb, equal_nan=True,
                                       err_msg=f"{name}.{c}")
        elif va.map(lambda x: isinstance(x, (list, np.ndarray))).any():
            for x, y in zip(va, vb):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        else:
            assert va.tolist() == vb.tolist(), f"{name}.{c}"
