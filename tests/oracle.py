"""Independent O(m*n) numpy Gotoh oracle for property-testing the engine.

A deliberately boring, textbook implementation of the same cost-space
recurrence (three dense planes, explicit Python loops) used to cross-check
the wavefront engine on random inputs.  Kept free of any engine code paths.
"""

from __future__ import annotations

import numpy as np

INF = 10**9


def oracle_fill(seq_1, seq_2, costing, gap_open):
    """Dense (3, m+1, n+1) DP planes.

    Args:
        costing: object with .lookup(char_a, char_b) -> int (gap symbol '-').
    """
    m, n = len(seq_1), len(seq_2)
    M = np.full((m + 1, n + 1), INF, dtype=np.int64)
    Ix = np.full((m + 1, n + 1), INF, dtype=np.int64)
    Iy = np.full((m + 1, n + 1), INF, dtype=np.int64)
    look = costing.lookup

    M[0, 0] = Ix[0, 0] = Iy[0, 0] = 0
    acc = gap_open
    for j in range(1, n + 1):
        acc += look("-", seq_2[j - 1])
        Ix[0, j] = acc
    acc = gap_open
    for i in range(1, m + 1):
        acc += look(seq_1[i - 1], "-")
        Iy[i, 0] = acc

    for i in range(1, m + 1):
        for j in range(1, n + 1):
            sub = look(seq_1[i - 1], seq_2[j - 1])
            M[i, j] = min(M[i - 1, j - 1], Ix[i - 1, j - 1], Iy[i - 1, j - 1]) + sub
            d = look("-", seq_2[j - 1])
            Ix[i, j] = (
                min(M[i, j - 1] + gap_open, Ix[i, j - 1], Iy[i, j - 1] + gap_open)
                + d
            )
            v = look(seq_1[i - 1], "-")
            Iy[i, j] = (
                min(M[i - 1, j] + gap_open, Ix[i - 1, j] + gap_open, Iy[i - 1, j])
                + v
            )

    return np.stack([M, Ix, Iy])


def oracle_cost(seq_1, seq_2, costing, gap_open) -> int:
    planes = oracle_fill(seq_1, seq_2, costing, gap_open)
    return int(planes[:, len(seq_1), len(seq_2)].min())
