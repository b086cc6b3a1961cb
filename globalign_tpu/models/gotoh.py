"""GotohAligner — the flagship alignment model.

Orchestrates the TPU pipeline for one pair (the role of the reference's
``find_global_alignment`` core, src/globalign/globaligner.py:132-314):

    tokenize -> device fill (ops.fill_pallas on TPU / ops.fill_rows in JAX)
             -> host traceback over move codes (ops.traceback), switching to
                the checkpointed linear-space replay (ops.linear_tb) past a
                memory threshold
             -> final cost->score transform (ops.transforms)

plus cost-only and planes-debug entry points used by the batch engine, the
benchmarks, and the tests.

Backend policy:
  * cost-only: the meet-in-the-middle Pallas fill on accelerators (~18.3
    GCUPS at 10k, docs/PERF.md), the JAX row scan elsewhere;
  * full alignment: the Pallas moves kernel (accelerators, when its VMEM
    working set fits) or the row scan, while the O(m*n) move matrix is
    under ``moves_budget_bytes``; blocked checkpoint+replay beyond it —
    which is what removes the reference's m*n < 2e7 input cap
    (reference start.py:213).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ResolvedScheme
from ..ops import fill_rows
from ..ops.linear_tb import align_blocked
from ..ops.traceback import Traceback, traceback_moves
from ..ops.transforms import final_cost_to_score
from ..utils.tokenize import encode_padded

# Above this many bytes of move codes, align() switches to the blocked
# linear-space traceback (64 MB ~ 8k x 8k pairs).  The default bounds
# BOTH the device buffer and the host fetch of the move plane;
# deployments with more host RAM / local (non-tunnelled) devices can
# raise it per-aligner (moves_budget_bytes=...) or process-wide via
# GLOBALIGN_MOVES_BUDGET_BYTES.
import os as _os

DEFAULT_MOVES_BUDGET_BYTES = int(
    _os.environ.get("GLOBALIGN_MOVES_BUDGET_BYTES", 64 * 1024 * 1024)
)


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

    def __init__(
        self,
        scheme: ResolvedScheme,
        *,
        moves_budget_bytes: int = DEFAULT_MOVES_BUDGET_BYTES,
        use_pallas: bool | None = None,
        pad_quantum: int = 256,
    ):
        from ..utils.platform import enable_compilation_cache

        enable_compilation_cache()
        self.scheme = scheme
        self.moves_budget_bytes = moves_budget_bytes
        if use_pallas is None:
            use_pallas = jax.devices()[0].platform not in ("cpu",)
        self.use_pallas = use_pallas
        # Sequences are padded up to this grid so distinct lengths reuse one
        # compiled fill (the fills take true lengths as traced m_true /
        # n_true); a fresh XLA compile over the remote-TPU tunnel costs
        # minutes, padded cells cost microseconds.
        self.pad_quantum = max(1, pad_quantum)
        self._cost_mat = jnp.asarray(scheme.costing.values, jnp.int32)
        self._gap_id = jnp.int32(scheme.alphabet.gap_id)
        self._gap_open = jnp.int32(scheme.gap_open_cost)

    # -- single pair ------------------------------------------------------

    def _pad_len(self, length: int) -> int:
        q = self.pad_quantum
        return max(q, q * -(-length // q))

    def _encode(self, seq_1: str, seq_2: str):
        a = self.scheme.alphabet
        tok_a = jnp.asarray(encode_padded(a, seq_1, self._pad_len(len(seq_1))))
        tok_b = jnp.asarray(encode_padded(a, seq_2, self._pad_len(len(seq_2))))
        return tok_a, tok_b

    def fill(self, seq_1: str, seq_2: str, *, want_moves=True, want_planes=False):
        tok_a, tok_b = self._encode(seq_1, seq_2)
        return fill_rows.row_fill(
            tok_a,
            tok_b,
            self._cost_mat,
            self._gap_id,
            self._gap_open,
            None,
            None,
            len(seq_1),
            len(seq_2),
            want_moves=want_moves,
            want_planes=want_planes,
        )

    def _moves_kernel_fits(self, n: int) -> bool:
        """Whether the B=1 stacked moves kernel's VMEM working set fits for
        this column extent (very wide pairs fall back to the row scan)."""
        from ..ops.fill_pallas import _stacked_tile_size

        return (
            _stacked_tile_size(
                1, self._pad_len(n), self.scheme.alphabet.size, moves=True
            )
            >= 1
        )

    def cost(self, seq_1: str, seq_2: str) -> int:
        """Optimal alignment cost only (O(m+n) device memory)."""
        tok_a, tok_b = self._encode(seq_1, seq_2)
        if self.use_pallas:
            from ..ops.fill_pallas import wavefront_fill_cost

            with jax.named_scope("globalign.fill"):
                final3 = wavefront_fill_cost(
                    tok_a,
                    tok_b,
                    self._cost_mat,
                    self._gap_id,
                    self._gap_open,
                    len(seq_1),
                    len(seq_2),
                )
        else:
            final3 = self.fill(seq_1, seq_2, want_moves=False).final3
        return int(np.min(np.asarray(final3)))

    def _uniform(self):
        from ..ops.fill_pallas import uniform_scheme_params

        return uniform_scheme_params(
            self.scheme.costing.values, self.scheme.alphabet.gap_id
        )

    def _moves_bytes(self, m: int, n: int) -> int:
        """Bytes of move codes the full-matrix path would materialize —
        sized for the backend align() actually dispatches to: the lane
        kernel's skewed (wave, phase, strip) buffer for uniform schemes,
        the stacked moves kernel's 8-aligned 128-lane column padding
        when that kernel fits, else the row scan's logical width."""
        if self.use_pallas:
            from ..ops import fill_lanes

            asel = (
                0 if self._uniform() is not None
                else self.scheme.alphabet.size
            )
            if fill_lanes.lanes_alphabet_ok(
                asel, self.scheme.costing.values
            ):
                m_pad, n_pad = self._pad_len(m), self._pad_len(n)
                plan = fill_lanes.lanes_plan(
                    1, m_pad, n_pad, moves=True, asel=asel
                )
                if plan is not None and (
                    asel == 0
                    or fill_lanes.general_lanes_ok(
                        fill_lanes.general_lanes_key(
                            plan[1], m_pad, n_pad, plan[0], asel, moves=True
                        )
                    )
                ):
                    return fill_lanes.lanes_moves_bytes(
                        1, m_pad, n_pad, plan[0]
                    )
        if self.use_pallas and self._moves_kernel_fits(n):
            from ..ops.fill_pallas import LANES, _stacked_r

            return (m + 1) * _stacked_r(self._pad_len(n), moves=True) * LANES
        return (m + 1) * (self._pad_len(n) + 1)

    def align(self, seq_1: str, seq_2: str) -> GotohAlignment:
        """Full alignment with deterministic traceback."""
        m, n = len(seq_1), len(seq_2)
        if self._moves_bytes(m, n) > self.moves_budget_bytes:
            tok_a, tok_b = self._encode(seq_1, seq_2)
            tb: Traceback = align_blocked(
                np.asarray(tok_a),
                tok_b,
                self._cost_mat,
                self._gap_id,
                self._gap_open,
                seq_1,
                seq_2,
                use_pallas=self.use_pallas,
            )
        elif self.use_pallas:
            # batch_moves dispatches the moves-emitting lane kernel
            # (uniform or small-alphabet general schemes) or the stacked
            # moves kernel, and returns None when neither fits.
            from ..ops.fill_pallas import batch_moves

            tok_a, tok_b = self._encode(seq_1, seq_2)
            with jax.named_scope("globalign.fill"):
                res = batch_moves(
                    tok_a[None],
                    tok_b[None],
                    self._cost_mat,
                    self._gap_id,
                    self._gap_open,
                    jnp.asarray([m], jnp.int32),
                    jnp.asarray([n], jnp.int32),
                )
            if res is not None:
                final3_b, moves_b = res
                tb = traceback_moves(
                    moves_b[0],
                    seq_1,
                    seq_2,
                    final3_b[0],
                    layout="row",
                )
            else:  # neither kernel fits these shapes: row-scan path
                res = self.fill(seq_1, seq_2, want_moves=True)
                tb = traceback_moves(
                    np.asarray(res.moves),
                    seq_1,
                    seq_2,
                    np.asarray(res.final3),
                    layout="row",
                )
        else:
            res = self.fill(seq_1, seq_2, want_moves=True)
            tb = traceback_moves(
                np.asarray(res.moves),
                seq_1,
                seq_2,
                np.asarray(res.final3),
                layout="row",
            )
        score = final_cost_to_score(
            cost=tb.cost,
            m=m,
            n=n,
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
        return np.asarray(res.planes)[:, : len(seq_1) + 1, : len(seq_2) + 1]
