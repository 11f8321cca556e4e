import numpy as np
import pytest

from phylo_tpu.dataio import (
    encode_strings,
    dataset_from_arrays,
    dataset_from_strings,
    load_dataset,
    simulate_dna,
)


def test_dataset_from_arrays_plain():
    g = np.eye(4)[np.random.default_rng(0).integers(0, 4, (3, 7))]
    ds = dataset_from_arrays(g, taxa=["a", "b", "c"], name="mine")
    assert (ds.N, ds.S, ds.A) == (3, 7, 4)
    assert ds.taxa == ["a", "b", "c"] and ds.name == "mine"
    np.testing.assert_array_equal(ds.genome, g)


def test_dataset_from_arrays_reference_datadict_quirks():
    # 'gemome' (sic) key, one-tuple-wrapped taxa (betacorona pickles),
    # and an all-zero observation row (spikeGP.p) -> missing-data ones
    g = np.eye(4)[[[0, 1], [2, 3]]].astype(float)
    g[1, 0] = 0.0
    ds = dataset_from_arrays({"gemome": g, "taxa": (["x", "y"],)})
    assert ds.taxa == ["x", "y"]
    np.testing.assert_array_equal(ds.genome[1, 0], np.ones(4))
    np.testing.assert_array_equal(ds.genome[0], g[0])
    # taxa-count mismatch inside a reference pickle payload
    # (betacorona1.p): generated names
    ds2 = dataset_from_arrays({"genome": g, "taxa": ["only_one"]})
    assert ds2.taxa == ["S0", "S1"]
    # ... but an EXPLICIT mismatched taxa argument is a caller bug
    with pytest.raises(ValueError, match="2 names for"):
        dataset_from_arrays(np.ones((3, 2, 4)), taxa=["x", "y"])
    with pytest.raises(ValueError):
        dataset_from_arrays({"taxa": ["x"]})
    with pytest.raises(ValueError):
        dataset_from_arrays(np.zeros((2, 3)))


def test_encode_strings_one_hot():
    g = encode_strings(["ACGT", "acgt"])
    assert g.shape == (2, 4, 4)
    np.testing.assert_allclose(g[0], np.eye(4))
    np.testing.assert_allclose(g[1], np.eye(4))


def test_encode_gaps_all_ones():
    g = encode_strings(["A-?T"])
    np.testing.assert_allclose(g[0, 1], 1.0)
    np.testing.assert_allclose(g[0, 2], 1.0)


def test_encode_rejects_bad_chars():
    with pytest.raises(ValueError, match="not in alphabet"):
        encode_strings(["AXGT"])


def test_reference_strings_dataset():
    ds = dataset_from_strings(
        ["ACTTTGAGAG", "ACTTTGACAG", "ACTTTGACTG", "ACTTTGACTC"]
    )
    assert (ds.N, ds.S, ds.A) == (4, 10, 4)
    assert ds.taxa == ["S0", "S1", "S2", "S3"]


def test_simulate_dna_deterministic():
    a = simulate_dna(3, 5, seed=7)
    b = simulate_dna(3, 5, seed=7)
    np.testing.assert_allclose(a.genome, b.genome)
    assert a.genome.sum() == 15  # one-hot rows


@pytest.mark.parametrize(
    "name,shape",
    [
        ("primate_data", (12, 898, 4)),
        ("primate_data_wang", (9, 738, 4)),
        ("fish_data", (12, 1047, 4)),
        ("hohna_data_1", (27, 1949, 4)),
        ("betacorona1", (17, 3260, 4)),
        ("spike_data", (22, 1541, 7)),
    ],
)
def test_load_reference_datasets(name, shape):
    ds = load_dataset(name)
    assert ds.genome.shape == shape
    assert len(ds.taxa) == shape[0]
    # every site row is a one-hot, all-ones ambiguity row, or (spikeGP
    # ships some) all-zeros row
    sums = ds.genome.sum(-1)
    assert set(np.unique(sums)).issubset({1.0, float(ds.A)})


def test_aliases():
    assert load_dataset("DS1").name == "hohna_data_1"
    assert load_dataset("primate").name == "primate_data"


def test_missing_datasets_raise():
    with pytest.raises(FileNotFoundError, match="not shipped"):
        load_dataset("corona_data")
    with pytest.raises(FileNotFoundError, match="not shipped"):
        load_dataset("ginkgo")


def test_reference_gap_chars_reject_n():
    # Strict reference mode: '-' and '?' only (reference runner.py:91-96
    # would KeyError on N); the default extension accepts N as missing.
    import numpy as np
    import pytest

    from phylo_tpu.dataio.alphabets import (
        REFERENCE_GAP_CHARS,
        encode_strings,
    )

    enc = encode_strings(["ACNT"])          # default: N -> all-ones
    np.testing.assert_allclose(enc[0, 2], 1.0)
    with pytest.raises(ValueError, match="not in alphabet"):
        encode_strings(["ACNT"], gap_chars=REFERENCE_GAP_CHARS)


def test_vendor_data_and_env_override(tmp_path, monkeypatch):
    # vendor into a temp dir, then point PHYLO_TPU_DATA at it and load
    import importlib
    import sys

    sys.path.insert(0, "/root/repo/tools")
    try:
        import vendor_data
    finally:
        sys.path.pop(0)

    # source from the repo's own vendored data/ so a fresh clone needs
    # no reference checkout
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(
        vendor_data.__file__)))
    copied, missing = vendor_data.vendor(
        os.path.join(repo, "data"), str(tmp_path))
    assert "primate.p" in copied

    monkeypatch.setenv("PHYLO_TPU_DATA", str(tmp_path))
    import phylo_tpu.dataio.datasets as dsmod

    importlib.reload(dsmod)
    try:
        ds = dsmod.load_dataset("primate")
        assert ds.N == 12 and ds.S == 898
    finally:
        monkeypatch.delenv("PHYLO_TPU_DATA")
        importlib.reload(dsmod)
