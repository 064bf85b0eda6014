"""Resumable flagship integration: partial crash + resume reproduces the
full run byte-identically (north-rule resumability on the real pipeline)."""
import os

import pyarrow as pa
import pytest

from feature_extraction_ray.pipelines.flagship import flagship_checkpointed
from feature_extraction_ray.state import checkpoint as CP

SF = "/root/testdata/sf0.001"


def test_flagship_resume_identical(tmp_path):
    ref_dir = str(tmp_path / "ref")
    out_dir = str(tmp_path / "out")
    s1 = flagship_checkpointed(SF, ref_dir, num_buckets=6)
    assert s1["rows"] > 0 and len(s1["written"]) > 0
    ref = CP.read_result(ref_dir).sort_by(
        [("source", "ascending"), ("session_id", "ascending")])

    flagship_checkpointed(SF, out_dir, num_buckets=6)
    # crash simulation: drop two partitions
    victims = [f for f in sorted(os.listdir(out_dir))][:4]
    for f in victims:
        os.remove(os.path.join(out_dir, f))
    s2 = flagship_checkpointed(SF, out_dir, num_buckets=6)
    assert 0 < len(s2["written"]) < 6
    got = CP.read_result(out_dir).sort_by(
        [("source", "ascending"), ("session_id", "ascending")])
    # NaN-aware equality (Table.equals treats NaN != NaN)
    import numpy as np
    assert got.schema == ref.schema
    for c in ref.column_names:
        g = got[c].to_pandas()
        e = ref[c].to_pandas()
        if g.dtype.kind == "f":
            np.testing.assert_allclose(g, e, equal_nan=True, err_msg=c)
        else:
            assert g.tolist() == e.tolist(), c

    # a third run is a no-op
    s3 = flagship_checkpointed(SF, out_dir, num_buckets=6)
    assert s3["written"] == [] and s3["rows"] == 0
