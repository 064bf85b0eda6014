"""Goldens for editdist.soundex_array / soundex_encode."""
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.editdist import (soundex_array,
                                                    soundex_encode)

CANON = {
    # the canonical US-Census / Knuth test vectors
    "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
    "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
    "Honeyman": "H555", "Jackson": "J250", "Washington": "W252",
    "Lee": "L000", "Gutierrez": "G362", "Wu": "W000",
    "Euler": "E460", "Gauss": "G200", "Hilbert": "H416",
    "Knuth": "K530", "Lloyd": "L300", "Lukasiewicz": "L222",
}


def test_canonical_vectors():
    names = list(CANON)
    got = soundex_array(pa.array(names)).to_pylist()
    for n, c in zip(names, got):
        assert c == CANON[n], (n, c, CANON[n])


def test_case_punct_null_empty():
    got = soundex_array(pa.array(
        ["roBERT", "o'Brien", "  Smith 2nd ", "123", "", None,
         "a"])).to_pylist()
    assert got[0] == "R163"
    assert got[1] == soundex_array(pa.array(["OBrien"])).to_pylist()[0]
    # letters-only stripping fuses words: same as 'Smithnd'
    assert got[2] == soundex_array(pa.array(["Smithnd"])).to_pylist()[0]
    assert got[3] is None and got[4] is None and got[5] is None
    assert got[6] == "A000"


def test_hw_separation_vs_vowel_separation():
    # duplicates collapse THROUGH h/w but NOT through vowels
    assert soundex_array(pa.array(["Ashcraft"])).to_pylist() == ["A261"]
    assert soundex_array(pa.array(["Tymczak"])).to_pylist() == ["T522"]


def test_encode_dataset(ray_session):
    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 3], "name": ["Robert", "Rupert", "Ashcraft"]}))
    out = soundex_encode(ds, "name").to_pandas().sort_values("id")
    assert list(out["soundex"]) == ["R163", "R163", "A261"]
