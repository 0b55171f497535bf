"""FROZEN product-quantization codebook (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011 —
public result): the 64-dim embedding space splits into M=8 contiguous
8-dim subspaces, each quantized against K=16 centroids.

Like plans/_ivf_codebook.py and plans/_jl_matrix.py, the codebook is
deterministic shared state between the Spark plan and the DuckDB
oracle: every centroid coordinate is an md5-derived integer in
MILLI-units on [-1000, 1000] (hashlib, no RNG state), so both engines
inline IDENTICAL literals, divide by the same 1000.0, and the driver
hash check replays the full encode pipeline bit-for-bit. A codebook
trained with real k-means (scripts/train_ivf_codebook.py's pattern)
swaps in without touching the plan shape — distortion numbers improve,
determinism machinery is unchanged.

Size note: M·K·SUBDIM = 1024 integer literals — a few KB of plan text,
the same order as the JL sign matrix.
"""

from __future__ import annotations

import hashlib

M = 8  # subspaces
SUBDIM = 8  # dims per subspace (M * SUBDIM = embedding dim 64)
K = 16  # centroids per subspace → 4-bit codes


def _milli(s: int, c: int, j: int) -> int:
    h = hashlib.md5(f"pq|{s}|{c}|{j}".encode()).hexdigest()
    return int(h[:12], 16) % 2001 - 1000


CODEBOOK: list[list[list[int]]] = [
    [[_milli(s, c, j) for j in range(SUBDIM)] for c in range(K)]
    for s in range(M)
]
