"""Linear-space traceback: row checkpoints + block replay.

The reference keeps the full O(m*n) DP array alive for its traceback
(src/globalign/globaligner.py:756-821, :395-593), which is exactly why it
caps inputs at m*n < 2e7 (start.py:213).  This module removes the cap
(SURVEY.md §7 step 5, the "block-checkpoint + on-chip tile replay" variant):

1. **Checkpoint pass** — fill the DP in row blocks of ``block_rows`` rows,
   keeping only each block-boundary row's three lanes (3, n+1).  Device
   memory: O((m / K) * n) for checkpoints, O(n) working state.
2. **Replay pass** — walk the optimal path from (m, n) upward; for each
   block (visited last-to-first) re-fill just that block *with move codes*
   seeded from its checkpoint row and the global column-0 boundary, then
   continue the deterministic predecessor walk through it.  Device memory:
   O(K * n) for one block's moves at a time.

With K ~ sqrt(m) total memory is O(n * sqrt(m)) and total fill work is 2x
the plain fill — the standard checkpointing trade.  The traced path is
bit-identical to the full-matrix traceback (same move codes, same
deterministic tie priority M > Ix > Iy), which the test-suite asserts on
random pairs.

Backends: on accelerators the checkpoint pass runs on the Pallas cost
kernel and block replays on the Pallas moves kernel (boundary-overridden,
B=1); elsewhere both use the JAX row scan.  Very wide pairs whose stacked
working set exceeds VMEM replay via the row scan.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp

from .fill_rows import row_fill
from .fill_scan import default_boundary
from .traceback import (
    GAP_CHAR,
    GAP_GLYPH,
    LEVEL_IX,
    LEVEL_M,
    MATCH_GLYPH,
    MISMATCH_GLYPH,
    Traceback,
)

DEFAULT_BLOCK_ROWS = 512

# Columns fetched per host window during the replay walk.  The walk visits
# a narrow, monotonically left-moving band of each block, so shipping the
# whole (K x n) move matrix to the host wastes nearly all of the transfer
# (at 30 kb that is ~1 GB through a ~35 ms-latency link, and it dominated
# the round-1 end-to-end wall-clock).  Windows are re-fetched leftward on
# demand; each fetch is one dynamic-slice + one host transfer.
DEFAULT_WINDOW_COLS = 2048


def _block_tokens(tok_a_ext: np.ndarray, i0: int, i1: int) -> jnp.ndarray:
    """1-origin token buffer for global rows i0+1..i1 (dummy entry 0)."""
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.asarray(tok_a_ext[i0 + 1 : i1 + 1])]
    )


@functools.partial(jax.jit, static_argnames=("width",))
def _slice_cols(arr, start, width: int):
    """Traced-start column window of a device move matrix (module-level so
    every block of every run shares one compiled slice per array shape)."""
    return jax.lax.dynamic_slice(arr, (0, start), (arr.shape[0], width))


class _WindowedMoves:
    """Host view of a device-resident block move matrix, fetched in
    fixed-width column windows as the walk moves left.

    ``j`` only decreases during a block walk, so a miss fetches the window
    ENDING at the requested column; the dynamic-slice start is traced (one
    compiled slice per array shape, not one remote compile per fetch).
    """

    def __init__(self, dev_moves, window_cols: int = DEFAULT_WINDOW_COLS):
        self._dev = dev_moves  # (K+1, W) uint8 on device
        self._w = min(window_cols, dev_moves.shape[1])
        self._w0 = -1
        self._buf: np.ndarray | None = None
        self.fetches = 0

    def code(self, ii: int, jj: int) -> int:
        if self._buf is None or not (self._w0 <= jj < self._w0 + self._w):
            start = min(max(0, jj - self._w + 1), self._dev.shape[1] - self._w)
            self._buf = np.asarray(_slice_cols(self._dev, start, self._w))
            self._w0 = start
            self.fetches += 1
        return int(self._buf[ii, jj - self._w0])


class _HostMoves:
    """Uniform accessor over an already-host-resident move matrix."""

    def __init__(self, arr: np.ndarray):
        self._arr = arr

    def code(self, ii: int, jj: int) -> int:
        return int(self._arr[ii, jj])


def align_blocked(
    tok_a_ext,
    tok_b_ext,
    cost_mat,
    gap_id,
    gap_open,
    seq_1: str,
    seq_2: str,
    *,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    use_pallas: bool | None = None,
) -> Traceback:
    """Full alignment with O(n * (m/K + K)) memory (see module docstring).

    Args:
        tok_a_ext / tok_b_ext: (m+1,) / (n+1,) int32 1-origin tokens; any
            padding past the true sequence lengths (taken from seq_1/seq_2)
            is ignored.
        cost_mat / gap_id / gap_open: the costing scheme.
        seq_1 / seq_2: the original strings (for emitting aligned text).
        block_rows: checkpoint interval K.
        use_pallas: force the checkpoint-pass backend; default auto
            (Pallas on TPU, row scan elsewhere).
    """
    m = len(seq_1)
    n = len(seq_2)
    K = max(1, block_rows)
    tok_a_np = np.asarray(tok_a_ext)[: m + 1]
    # seq_2 is padded up to a 256 grid so differently-sized inputs reuse the
    # same compiled block fills (padded columns never feed real cells; the
    # result is read at column n).
    nq = max(256, 256 * -(-(n + 1) // 256)) - 1
    tok_b_np = np.zeros((nq + 1,), np.int32)
    tok_b_np[: n + 1] = np.asarray(tok_b_ext)[: n + 1]

    cost_mat = jnp.asarray(cost_mat, jnp.int32)
    gap_id = jnp.asarray(gap_id, jnp.int32)
    gap_open = jnp.asarray(gap_open, jnp.int32)
    tok_b = jnp.asarray(tok_b_np)

    if use_pallas is None:
        import jax

        use_pallas = jax.devices()[0].platform not in ("cpu",)

    row0_g, col0_g = default_boundary(
        jnp.asarray(tok_a_np), tok_b, cost_mat, gap_id, gap_open
    )
    col0_np = np.asarray(col0_g)

    # ---- checkpoint pass -------------------------------------------------
    bounds = list(range(0, m, K)) + [m]  # block b covers rows bounds[b]..[b+1]
    nblocks = len(bounds) - 1
    checkpoints: list[jnp.ndarray] = [row0_g]  # (3, n+1) at each bounds[b]
    state = row0_g
    for b in range(nblocks):
        i0, i1 = bounds[b], bounds[b + 1]
        ta_blk = _block_tokens(tok_a_np, i0, i1)
        col0y_blk = jnp.asarray(col0_np[2, i0 : i1 + 1])
        if use_pallas:
            from .fill_pallas import row_fill_last_rows

            last = row_fill_last_rows(
                ta_blk,
                tok_b,
                cost_mat,
                gap_id,
                gap_open,
                row0=state,
                col0y=col0y_blk,
            )[:, : nq + 1]
        else:
            col0_blk = jnp.stack([col0y_blk, col0y_blk, col0y_blk])
            last = row_fill(
                ta_blk,
                tok_b,
                cost_mat,
                gap_id,
                gap_open,
                row0=state,
                col0=col0_blk,
                want_moves=False,
            ).last3
        state = last
        checkpoints.append(state)

    final3 = np.asarray(state[:, n])
    cost = int(final3.min())

    # ---- replay pass -----------------------------------------------------
    out_1: list[str] = []
    mid: list[str] = []
    out_2: list[str] = []

    i, j = m, n
    level = int(final3.argmin())

    for b in range(nblocks - 1, -1, -1):
        i0, i1 = bounds[b], bounds[b + 1]
        if i <= i0:
            continue
        ta_blk = _block_tokens(tok_a_np, i0, i1)
        if use_pallas:
            from .fill_pallas import _stacked_tile_size

            use_pallas = (
                _stacked_tile_size(1, nq, int(np.asarray(cost_mat).shape[0]),
                                   moves=True) >= 1
            )
        if use_pallas:
            # Replay at stacked-kernel speed (B=1) with the checkpoint row
            # as row 0 and the global column-0 Iy value at the block's top
            # row seeding the in-kernel accumulator.
            from .fill_pallas import stacked_fill_with_moves

            _, moves_d = stacked_fill_with_moves(
                ta_blk[None],
                tok_b[None],
                cost_mat,
                gap_id,
                gap_open,
                jnp.asarray([i1 - i0], jnp.int32),
                jnp.asarray([n], jnp.int32),
                checkpoints[b][None],
                # Accumulator seed: rows add their icost on top, so the top
                # block (whose col0[2, 0] is the 0 corner) seeds gap_open.
                jnp.asarray(
                    [int(np.asarray(gap_open)) if i0 == 0 else col0_np[2, i0]],
                    jnp.int32,
                ),
            )
            # Moves stay device-resident; the walk fetches column windows
            # on demand instead of shipping the whole block to the host.
            moves = _WindowedMoves(moves_d[0])
        else:
            col0y_blk = jnp.asarray(col0_np[2, i0 : i1 + 1])
            col0_blk = jnp.stack([col0y_blk, col0y_blk, col0y_blk])
            moves_np = np.asarray(
                row_fill(
                    ta_blk,
                    tok_b,
                    cost_mat,
                    gap_id,
                    gap_open,
                    row0=checkpoints[b],
                    col0=col0_blk,
                    want_moves=True,
                ).moves
            )
            moves = _HostMoves(moves_np)

        while i > i0:
            if j == 0:
                # Column 0: only vertical boundary moves remain
                # (reference globaligner.py:562-581).
                out_1.append(seq_1[i - 1])
                mid.append(GAP_GLYPH)
                out_2.append(GAP_CHAR)
                i -= 1
                continue
            code = moves.code(i - i0, j)
            if level == LEVEL_M:
                a, bch = seq_1[i - 1], seq_2[j - 1]
                out_1.append(a)
                mid.append(MATCH_GLYPH if a == bch else MISMATCH_GLYPH)
                out_2.append(bch)
                level = code & 3
                i -= 1
                j -= 1
            elif level == LEVEL_IX:
                out_1.append(GAP_CHAR)
                mid.append(GAP_GLYPH)
                out_2.append(seq_2[j - 1])
                level = (code >> 2) & 3
                j -= 1
            else:
                out_1.append(seq_1[i - 1])
                mid.append(GAP_GLYPH)
                out_2.append(GAP_CHAR)
                level = (code >> 4) & 3
                i -= 1

    # Row 0: only horizontal moves remain (globaligner.py:542-561).
    while j > 0:
        out_1.append(GAP_CHAR)
        mid.append(GAP_GLYPH)
        out_2.append(seq_2[j - 1])
        j -= 1

    out_1.reverse()
    mid.reverse()
    out_2.reverse()
    return Traceback("".join(out_1), "".join(mid), "".join(out_2), cost)
