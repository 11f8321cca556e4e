"""Protein (A=20) alignments + IUPAC ambiguity coding.

EXTENSION beyond the reference (DNA pickles only): every model is
A-generic (the reference itself relies on this for its A=7 spike
dataset, vcsmc.py:118), so amino-acid alignments flow through the same
sweep once the encoder knows the alphabet.  Ambiguity codes become
multi-hot leaf rows -- standard Felsenstein ambiguous-data handling.
"""

import jax
import jax.numpy as jnp
import numpy as np

from phylo_tpu.dataio import (
    DNA_ALPHABET,
    PROTEIN_ALPHABET,
    dataset_from_strings,
    detect_alphabet,
    encode_strings,
    load_dataset,
)
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import GTR, JC69
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies


def test_protein_encoding_multi_hot():
    g = encode_strings(["ABZ-X*"], alphabet=PROTEIN_ALPHABET)
    assert g.shape == (1, 6, 20)
    a = PROTEIN_ALPHABET
    np.testing.assert_array_equal(
        np.nonzero(g[0, 0])[0], [a.index("A")]
    )
    np.testing.assert_array_equal(
        sorted(np.nonzero(g[0, 1])[0]), [a.index("D"), a.index("N")]
    )
    np.testing.assert_array_equal(
        sorted(np.nonzero(g[0, 2])[0]), [a.index("E"), a.index("Q")]
    )
    # gaps / X / stop are missing data (all ones)
    for s in (3, 4, 5):
        np.testing.assert_array_equal(g[0, s], np.ones(20))


def test_dna_iupac_ambiguity_multi_hot():
    g = encode_strings(["ARYN"])
    np.testing.assert_array_equal(g[0, 1], [1, 0, 1, 0])   # R = A/G
    np.testing.assert_array_equal(g[0, 2], [0, 1, 0, 1])   # Y = C/T
    np.testing.assert_array_equal(g[0, 3], np.ones(4))     # N missing


def test_detect_alphabet():
    assert detect_alphabet(["ACGT-", "ACRYN"]) == DNA_ALPHABET
    assert detect_alphabet(["MKLV", "MELP"]) == PROTEIN_ALPHABET


def test_protein_fasta_roundtrip(tmp_path):
    fa = tmp_path / "toy.fasta"
    fa.write_text(
        ">t1\nMKLVINSEQ\n>t2\nMKLVLNSEQ\n>t3\nMRLVINAEQ\n>t4\nMKIVINSEX\n"
    )
    ds = load_dataset(str(fa))
    assert ds.A == 20 and ds.N == 4 and ds.S == 9
    assert ds.taxa == ["t1", "t2", "t3", "t4"]


def test_protein_sweep_end_to_end():
    rng = np.random.default_rng(0)
    strings = [
        "".join(rng.choice(list(PROTEIN_ALPHABET), size=30))
        for _ in range(5)
    ]
    ds = dataset_from_strings(strings, alphabet=PROTEIN_ALPHABET,
                              name="toy_protein")
    assert ds.A == 20
    for model in (JC69(A=20), GTR(A=20)):
        params = {
            "model": model.init_params(jnp.float64),
            "branches": init_branch_params(ds.N, dtype=jnp.float64),
        }

        def loss(p):
            return -sample_phylogenies(
                jax.random.PRNGKey(0), jnp.asarray(ds.genome),
                model, p, SweepConfig(K=4),
            ).elbo

        v, g = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(v))
        assert all(np.all(np.isfinite(np.asarray(x)))
                   for x in jax.tree.leaves(g))
        if params["model"]:
            assert any(np.any(np.asarray(x) != 0)
                       for x in jax.tree.leaves(g["model"]))


def test_detect_alphabet_tolerates_stray_unknown_bases():
    # 'X' as an unknown base must not flip a DNA alignment to protein
    assert detect_alphabet(["ACGTACGTX", "ACGTACGTA"]) == DNA_ALPHABET
    # but a genuinely amino-acid alignment still routes to protein
    assert detect_alphabet(["MKLVEFPQW", "MKLIEFPQW"]) == PROTEIN_ALPHABET


def test_detect_alphabet_ambiguous_band_raises():
    import pytest

    # 0.8 nucleotide-letter fraction: could be noisy DNA or a biased
    # protein -- must demand an explicit alphabet (ADVICE r2)
    with pytest.raises(ValueError, match="ambiguous"):
        detect_alphabet(["ACGTACGTEE"])
    # compositionally biased protein: >= 0.9 of its letters are also
    # nucleotide codes, but the 10% leucine betrays it
    with pytest.raises(ValueError, match="ambiguous"):
        detect_alphabet(["AAGGSSTTRRKKVVAAGGLL"])


def test_gap_chars_colliding_with_alphabet_raise():
    import pytest

    from phylo_tpu.dataio import one_hot_rows

    with pytest.raises(ValueError, match="collide"):
        one_hot_rows("ARN", gap_chars="-?Nn")
    # custom alphabets default to the safe '-?' gap set: N stays a state
    g = encode_strings(["ARN-"], alphabet="ARN")
    np.testing.assert_array_equal(g[0, 2], [0, 0, 1])
    np.testing.assert_array_equal(g[0, 3], [1, 1, 1])
