"""GotohAligner — the flagship alignment model.

Orchestrates the TPU pipeline for one pair (the role of the reference's
``find_global_alignment`` core, src/globalign/globaligner.py:132-314):

    tokenize -> device wavefront fill (ops.fill_scan / ops.fill_pallas)
             -> host traceback over move codes (ops.traceback)
             -> final cost->score transform (ops.transforms)

plus cost-only and planes-debug entry points used by the batch engine, the
benchmarks, and the tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..config import ResolvedScheme
from ..ops import fill_scan
from ..ops.traceback import Traceback, traceback_moves
from ..ops.transforms import final_cost_to_score
from ..utils.tokenize import encode_padded


@dataclass(frozen=True)
class GotohAlignment:
    seq_1_aligned: str
    middle_part: str
    seq_2_aligned: str
    cost: int
    score: int


class GotohAligner:
    """Affine-gap global aligner for a fixed resolved scheme.

    The scheme (alphabet + costing matrix + gap-open) is bound once; repeated
    ``align`` calls over same-shaped inputs reuse the jitted fill.
    """

    def __init__(self, scheme: ResolvedScheme):
        from ..utils.platform import enable_compilation_cache

        enable_compilation_cache()
        self.scheme = scheme
        self._cost_mat = jnp.asarray(scheme.costing.values, jnp.int32)
        self._gap_id = jnp.int32(scheme.alphabet.gap_id)
        self._gap_open = jnp.int32(scheme.gap_open_cost)

    # -- single pair ------------------------------------------------------

    def _encode(self, seq_1: str, seq_2: str):
        a = self.scheme.alphabet
        tok_a = jnp.asarray(encode_padded(a, seq_1, len(seq_1)))
        tok_b = jnp.asarray(encode_padded(a, seq_2, len(seq_2)))
        return tok_a, tok_b

    def fill(self, seq_1: str, seq_2: str, *, want_moves=True, want_planes=False):
        tok_a, tok_b = self._encode(seq_1, seq_2)
        return fill_scan.wavefront_fill(
            tok_a,
            tok_b,
            self._cost_mat,
            self._gap_id,
            self._gap_open,
            want_moves=want_moves,
            want_planes=want_planes,
        )

    def cost(self, seq_1: str, seq_2: str) -> int:
        """Optimal alignment cost only (O(m+n) device memory)."""
        res = self.fill(seq_1, seq_2, want_moves=False)
        return int(np.min(np.asarray(res.final3)))

    def align(self, seq_1: str, seq_2: str) -> GotohAlignment:
        """Full alignment with deterministic traceback."""
        res = self.fill(seq_1, seq_2, want_moves=True)
        tb: Traceback = traceback_moves(
            np.asarray(res.moves), seq_1, seq_2, np.asarray(res.final3)
        )
        score = final_cost_to_score(
            cost=tb.cost,
            m=len(seq_1),
            n=len(seq_2),
            max_score=self.scheme.max_score,
        )
        return GotohAlignment(
            seq_1_aligned=tb.seq_1_aligned,
            middle_part=tb.middle_part,
            seq_2_aligned=tb.seq_2_aligned,
            cost=tb.cost,
            score=score,
        )

    def dp_planes(self, seq_1: str, seq_2: str) -> np.ndarray:
        """Dense (3, m+1, n+1) DP cost planes — test/debug oracle view."""
        res = self.fill(seq_1, seq_2, want_moves=False, want_planes=True)
        return fill_scan.planes_to_dense(
            np.asarray(res.planes), len(seq_1), len(seq_2)
        )
