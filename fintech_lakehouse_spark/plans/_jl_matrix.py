"""FROZEN Johnson-Lindenstrauss sign matrix (Achlioptas 2001: random
±1 entries satisfy the JL lemma — "Database-friendly random
projections", PODS'01, public result).

Like plans/_ivf_codebook.py, the matrix is deterministic shared state
between the Spark plan and the DuckDB oracle: entries are derived
from md5 (hashlib, no RNG state) so both engines inline the IDENTICAL
integer literals and the driver hash check replays the full
projection pipeline. Scale note: a k×d sign matrix is a few KB of
plan literals — at 100 TB the projection is a zero-shuffle map over
the corpus, exactly the IVF-assignment shape.
"""

from __future__ import annotations

import hashlib

K = 16  # projected dimensions
DIM = 64  # source embedding dimensions


def _sign(j: int, d: int) -> int:
    h = hashlib.md5(f"jl|{j}|{d}".encode()).digest()
    return 1 if h[0] & 1 else -1


SIGNS: list[list[int]] = [[_sign(j, d) for d in range(DIM)] for j in range(K)]
