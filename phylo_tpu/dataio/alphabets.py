"""Alphabet handling and one-hot sequence encoding.

Conventions follow the reference loaders (reference runner.py:83-97):

* DNA alphabet A/C/G/T in a fixed column order,
* case-insensitive lookup (the reference keeps separate upper/lower dicts),
* gap / missing characters ``-`` and ``?`` encode as all-ones rows
  (the standard "missing data" convention in Felsenstein pruning),
* the alphabet size A is whatever the data says (A=7 datasets such as
  spikeGP.p work unchanged, cf. reference vcsmc.py:118).

EXTENSION beyond the reference: the default gap set also treats the
IUPAC "any base" code ``N``/``n`` as missing data.  The reference's
Alphabet_dir_blank maps only ``-`` and ``?`` (runner.py:91-96) and
would KeyError on N; on alignments containing N, likelihoods under the
default therefore differ from what the reference convention would
produce (it would crash).  Pass ``gap_chars=REFERENCE_GAP_CHARS`` for
strict reference behavior in parity comparisons.
"""

from __future__ import annotations

import numpy as np

DNA_ALPHABET = "ACGT"
REFERENCE_GAP_CHARS = "-?"   # exactly the reference's blank set
GAP_CHARS = "-?Nn"           # + IUPAC N as missing (extension, see above)


def one_hot_rows(alphabet: str = DNA_ALPHABET,
                 gap_chars: str = GAP_CHARS) -> dict:
    """Character -> one-hot row dict for ``alphabet`` plus all-ones rows
    for every character in ``gap_chars``."""
    A = len(alphabet)
    rows = {}
    for i, ch in enumerate(alphabet):
        row = np.zeros(A)
        row[i] = 1.0
        rows[ch.upper()] = row
        rows[ch.lower()] = row
    ones = np.ones(A)
    for ch in gap_chars:
        rows[ch] = ones
    return rows


def encode_strings(strings, alphabet: str = DNA_ALPHABET,
                   dtype=np.float64, gap_chars: str = GAP_CHARS):
    """Encode equal-length sequences into an (N, S, A) one-hot array.

    Equivalent to the reference's ``form_dataset_from_strings``
    (runner.py:107-115) but vectorized via a lookup table instead of a
    double Python loop.  ``gap_chars`` characters encode as all-ones
    (missing data); the default includes N/n, which the reference does
    not accept -- use ``gap_chars=REFERENCE_GAP_CHARS`` for strict
    parity.
    """
    if not strings:
        raise ValueError("need at least one sequence")
    S = len(strings[0])
    for s in strings:
        if len(s) != S:
            raise ValueError("sequences must have equal length")
    rows = one_hot_rows(alphabet, gap_chars)
    A = len(alphabet)
    # Build a 256-row lookup table indexed by character code.
    table = np.full((256, A), np.nan, dtype=dtype)
    for ch, row in rows.items():
        table[ord(ch)] = row
    codes = np.frombuffer("".join(strings).encode("latin-1"), dtype=np.uint8)
    out = table[codes].reshape(len(strings), S, A)
    if np.isnan(out).any():
        bad = sorted(
            {chr(c) for c in np.unique(codes) if np.isnan(table[c]).any()}
        )
        raise ValueError(f"characters not in alphabet {alphabet!r}: {bad}")
    return out
