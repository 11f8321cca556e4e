"""Alphabet handling and one-hot sequence encoding.

Conventions follow the reference loaders (reference runner.py:83-97):

* DNA alphabet A/C/G/T in a fixed column order,
* case-insensitive lookup (the reference keeps separate upper/lower dicts),
* gap / missing characters ``-`` and ``?`` encode as all-ones rows
  (the standard "missing data" convention in Felsenstein pruning),
* the alphabet size A is whatever the data says (A=7 datasets such as
  spikeGP.p work unchanged, cf. reference vcsmc.py:118).
"""

from __future__ import annotations

import numpy as np

DNA_ALPHABET = "ACGT"
GAP_CHARS = "-?Nn"


def one_hot_rows(alphabet: str = DNA_ALPHABET) -> dict:
    """Character -> one-hot row dict for ``alphabet`` plus all-ones gaps."""
    A = len(alphabet)
    rows = {}
    for i, ch in enumerate(alphabet):
        row = np.zeros(A)
        row[i] = 1.0
        rows[ch.upper()] = row
        rows[ch.lower()] = row
    ones = np.ones(A)
    for ch in GAP_CHARS:
        rows[ch] = ones
    return rows


def encode_strings(strings, alphabet: str = DNA_ALPHABET, dtype=np.float64):
    """Encode equal-length sequences into an (N, S, A) one-hot array.

    Equivalent to the reference's ``form_dataset_from_strings``
    (runner.py:107-115) but vectorized via a lookup table instead of a
    double Python loop.
    """
    if not strings:
        raise ValueError("need at least one sequence")
    S = len(strings[0])
    for s in strings:
        if len(s) != S:
            raise ValueError("sequences must have equal length")
    rows = one_hot_rows(alphabet)
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
