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

from .fill_pallas import LANES
from .fill_rows import row_fill
from .fill_scan import BIG, default_boundary
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

# Adaptive block sizing cap: each replay block materializes (K+1) x W move
# bytes on DEVICE (streamed to HBM by the kernel, never all in VMEM), and
# each block's walk pays at least one host window fetch (~35 ms through
# the tunnelled-TPU link this repo documents).  Growing K until the block
# move buffer hits this budget minimizes blocks (host round trips) at a
# bounded HBM cost.
DEFAULT_BLOCK_MOVES_BYTES = 64 * 1024 * 1024

def _block_tokens(tok_a_ext: np.ndarray, i0: int, i1: int) -> jnp.ndarray:
    """1-origin token buffer for global rows i0+1..i1 (dummy entry 0)."""
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.asarray(tok_a_ext[i0 + 1 : i1 + 1])]
    )


# Backward-walk move ops (the per-step OUTPUT of the device walk; the
# host rebuilds the aligned strings from these alone).
OP_DIAG = 0  # consume one char of each sequence
OP_LEFT = 1  # gap in seq_1 (consume seq_2[j-1])
OP_UP = 2  # gap in seq_2 (consume seq_1[i-1])


def _walk_block_impl(moves, j_entry, level_entry, layout="row", w=0,
                     k_rows=0, width=0, strip_base=0, tape_len=None):
    """Walk one replay block's move codes ON DEVICE, bottom row to top.

    ``layout="row"``: ``moves`` is (K+1, W) row-major.  ``layout=
    "lanes"``: ``moves`` is the lane kernel's skewed buffer
    ((G_rows*w, R, 128) uint8, ops/fill_lanes.lanes_batch_moves) walked
    IN PLACE via the skew arithmetic — no unskew pass, no host traffic;
    ``w``/``k_rows``/``width`` give the strip width, block rows and
    walkable column count the shapes no longer imply, and
    ``strip_base`` the pair's first global strip lane (b * S_p) when
    the buffer holds a whole BATCH tile (vmap-compatible over
    j_entry/level_entry/k_rows/strip_base, which may be traced —
    ``tape_len`` then supplies the static op-tape bound, >= the largest
    k_rows + width of the batch).

    The move matrices are O(K x n) and the link to a tunnelled TPU is
    bandwidth-poor (~tens of MB/s measured; docs/PERF.md), so fetching
    them — even in column windows — dominates end-to-end wall clock.
    The walk itself is a trivial serial recurrence, so run it where the
    moves live: a ``lax.while_loop`` from the block's bottom row to its
    top that records one op byte per step.  Only the O(K + n) op tape
    ever crosses to the host.

    Same level semantics as the full-matrix walker
    (ops/traceback.traceback_moves): code bits [0:2]=M, [2:4]=Ix,
    [4:6]=Iy predecessor levels; column 0 forces boundary up-moves
    without consuming a code (reference globaligner.py:562-581).

    Returns ``(ops, count, j_exit, level_exit)``; entry scalars may be
    device values, so chained block walks dispatch without host syncs.
    """
    if layout == "row":
        K = moves.shape[0] - 1
        L = K + moves.shape[1]  # i decreases K times, j fewer than W
    else:
        K = k_rows
        L = tape_len if tape_len is not None else K + width

    def cond(st):
        return st[0] > 0

    def body(st):
        i_l, j, level, t, ops = st
        if layout == "row":
            code = moves[i_l, j].astype(jnp.int32)
        else:
            # Skew arithmetic: cell (i, j) lives at wave i-1 + 2q,
            # phase (j-1) % w, local strip q = (j-1)//w, global lane
            # strip_base + q (strip_base = b * S_p for pair b of a
            # batch tile).  j == 0 is the masked boundary — clamp its
            # index, the code is unread.
            jc = jnp.maximum(j, 1) - 1
            qq = jc // w
            row = (i_l - 1 + 2 * qq) * w + jc % w
            ss = strip_base + qq
            code = moves[
                jnp.minimum(row, moves.shape[0] - 1), ss // LANES,
                ss % LANES,
            ].astype(jnp.int32)
        boundary = j == 0
        is_m = level == 0
        is_x = level == 1
        op = jnp.where(
            boundary,
            OP_UP,
            jnp.where(is_m, OP_DIAG, jnp.where(is_x, OP_LEFT, OP_UP)),
        )
        nl = jnp.where(
            is_m, code & 3, jnp.where(is_x, (code >> 2) & 3, (code >> 4) & 3)
        )
        nl = jnp.where(boundary, level, nl)
        di = jnp.where(op == OP_LEFT, 0, 1)
        dj = jnp.where(op == OP_UP, 0, 1)
        ops = jax.lax.dynamic_update_index_in_dim(
            ops, op.astype(jnp.uint8), t, 0
        )
        return (i_l - di, j - dj, nl, t + 1, ops)

    _, j, level, t, ops = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(K, jnp.int32),
            jnp.asarray(j_entry, jnp.int32),
            jnp.asarray(level_entry, jnp.int32),
            jnp.int32(0),
            jnp.zeros((L,), jnp.uint8),
        ),
    )
    return ops, t, j, level


# Jitted entry point for the block-replay chain (k_rows/width static,
# one compile per block-shape class); lanes_tile_walk below vmaps the
# raw impl instead (k_rows/strip_base traced per pair).
_walk_block = jax.jit(
    _walk_block_impl,
    static_argnames=("layout", "w", "k_rows", "width", "tape_len"),
)


@functools.partial(jax.jit, static_argnames=("w", "tape_len"))
def lanes_tile_walk(
    mv, final3, m_true, n_true, strip_bases, w, tape_len, flat_base=None
):
    """Walk every pair of one lanes moves tile ON DEVICE: full-matrix
    walks from each pair's (m_true, n_true) at its argmin entry level,
    all pairs in lockstep.

    Returns ``(tapes (B, tape_len) uint8, counts (B,), j_exits (B,))``
    — only O(B * (m+n)) bytes ever cross to the host instead of the
    O(B * m * n) move matrices (the dev tunnel is bandwidth-poor, and a
    host unskew pass reads every byte; this is the batch traceback's
    device-walk fast path, measured in scratch/measure_serving.py).
    The caller appends ``j_exit`` boundary LEFT ops per pair
    (reference globaligner.py:542-561 row-0 semantics).

    Formulation (round 5): a ``fori_loop`` over tape positions, NOT a
    vmapped while_loop of per-lane updates — every still-active lane
    writes tape position ``it`` at iteration ``it`` (t advances in
    lockstep), so the tape write is ONE dynamic_update_slice at a
    scalar column and the code read is ONE flat 1-D gather.  The
    vmapped formulation's per-lane scatter/gather expanded to serial
    per-lane updates and cost ~400 us/step — 93% of traceback-mode
    serving wall-clock; this one is 22x faster, bit-identical
    (scratch/micro_walk.py, scratch/micro_tb_decompose.py).  Finished
    lanes keep writing op 0 at columns past their count — never read
    (consumers slice ``[:count]``).  Same level semantics as
    :func:`_walk_block_impl`.

    ``mv`` may carry a leading GROUP axis ((G, Gw, R, 128): several
    same-shape tile buffers stacked) with ``flat_base`` giving each
    pair's group offset in elements (tile_index * Gw * R * 128) — one
    walk then serves every tile of a sub-batch, keeping the lane count
    high where single tiles are tiny (10 kb tiles hold 2 pairs; the
    walk is latency-bound, so more lanes are nearly free —
    scratch/micro_tb_decompose.py).  Caller must keep the total group
    under int32 index range (batch.WALK_GROUP_BYTES)."""
    B = m_true.shape[0]
    levels = jnp.argmin(final3, axis=-1).astype(jnp.int32)
    R128 = mv.shape[-2] * LANES
    mv_flat = mv.reshape(-1)
    max_row = mv.shape[-3] - 1
    bases = strip_bases.astype(jnp.int32)
    if flat_base is None:
        flat_base = jnp.int32(0)
    else:
        flat_base = flat_base.astype(jnp.int32)

    def body(it, st):
        i_l, j, level, t, ops = st
        active = i_l > 0
        jc = jnp.maximum(j, 1) - 1
        qq = jc // w
        row = (i_l - 1 + 2 * qq) * w + jc % w
        flat = flat_base + jnp.minimum(row, max_row) * R128 + (bases + qq)
        code = jnp.take(mv_flat, flat, mode="clip").astype(jnp.int32)
        boundary = j == 0
        is_m = level == 0
        is_x = level == 1
        op = jnp.where(
            boundary, OP_UP,
            jnp.where(is_m, OP_DIAG, jnp.where(is_x, OP_LEFT, OP_UP)),
        )
        nl = jnp.where(
            is_m, code & 3,
            jnp.where(is_x, (code >> 2) & 3, (code >> 4) & 3),
        )
        nl = jnp.where(boundary, level, nl)
        di = jnp.where(op == OP_LEFT, 0, 1)
        dj = jnp.where(op == OP_UP, 0, 1)
        colv = jnp.where(active, op, 0).astype(jnp.uint8)
        ops = jax.lax.dynamic_update_slice(ops, colv[:, None], (0, it))
        i_l = jnp.where(active, i_l - di, i_l)
        j = jnp.where(active, j - dj, j)
        level = jnp.where(active, nl, level)
        t = jnp.where(active, t + 1, t)
        return (i_l, j, level, t, ops)

    _, j, _, t, ops = jax.lax.fori_loop(
        0, tape_len, body,
        (
            m_true.astype(jnp.int32),
            n_true.astype(jnp.int32),
            levels,
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B, tape_len), jnp.uint8),
        ),
    )
    return ops, t, j


@functools.partial(jax.jit, static_argnames=("tape_len",))
def lanes_mega_walk(mv_blob, vals_full, sel, meta, tape_len):
    """Walk pairs from MANY lane-kernel tiles (any shapes/widths) in ONE
    fori_loop — the serving fast path across a whole bucketed chunk.

    A jittered 1 kb stream splinters into ~40 (M, N) buckets per
    128-pair chunk; per-bucket walk dispatches plus per-bucket result
    slices/concats cost more tunnel/dispatch overhead than all the
    device work combined (scratch/repro_bucket_serial.py).  Here every
    tile's skewed moves buffer is flattened into one uint8 blob and
    each PAIR carries its own geometry as data, so one executable walks
    the whole chunk and the flush fetches exactly four arrays.

    Args:
      mv_blob: (T,) uint8 — concatenated flattened tile buffers (caller
        bounds T under int32 indexing via batch.WALK_GROUP_BYTES).
      vals_full: (Q, 3) int32 — concatenated tile final3 rows,
        including tile pad rows.
      sel: (P,) int32 — rows of ``vals_full`` that are real pairs
        (pad lanes point anywhere safe; their meta m == 0).
      meta: (P, 7) int32 — per pair [m, n, w, r128, maxrow, base, off]:
        strip width, lane-row stride (R*128), row clip bound, first
        strip lane within the tile, and the tile's blob element offset.
      tape_len: static op-tape bound >= max(m + n + 1) over the pairs.

    Returns ``(vals (P, 3), tapes (P, tape_len) uint8, counts (P,),
    j_exits (P,))`` — same per-pair contract as
    :func:`lanes_tile_walk` (levels from argmin(vals); finished lanes
    write op 0 past their count, never read)."""
    vals = vals_full[sel]
    P = vals.shape[0]
    levels = jnp.argmin(vals, axis=-1).astype(jnp.int32)
    m_v = meta[:, 0]
    n_v = meta[:, 1]
    w_v = meta[:, 2]
    r128_v = meta[:, 3]
    maxrow_v = meta[:, 4]
    base_v = meta[:, 5]
    off_v = meta[:, 6]

    def body(it, st):
        i_l, j, level, t, ops = st
        active = i_l > 0
        jc = jnp.maximum(j, 1) - 1
        qq = jc // w_v
        row = (i_l - 1 + 2 * qq) * w_v + (jc - qq * w_v)
        flat = off_v + jnp.minimum(row, maxrow_v) * r128_v + (base_v + qq)
        code = jnp.take(mv_blob, flat, mode="clip").astype(jnp.int32)
        boundary = j == 0
        is_m = level == 0
        is_x = level == 1
        op = jnp.where(
            boundary, OP_UP,
            jnp.where(is_m, OP_DIAG, jnp.where(is_x, OP_LEFT, OP_UP)),
        )
        nl = jnp.where(
            is_m, code & 3,
            jnp.where(is_x, (code >> 2) & 3, (code >> 4) & 3),
        )
        nl = jnp.where(boundary, level, nl)
        di = jnp.where(op == OP_LEFT, 0, 1)
        dj = jnp.where(op == OP_UP, 0, 1)
        colv = jnp.where(active, op, 0).astype(jnp.uint8)
        ops = jax.lax.dynamic_update_slice(ops, colv[:, None], (0, it))
        i_l = jnp.where(active, i_l - di, i_l)
        j = jnp.where(active, j - dj, j)
        level = jnp.where(active, nl, level)
        t = jnp.where(active, t + 1, t)
        return (i_l, j, level, t, ops)

    _, j, _, t, ops = jax.lax.fori_loop(
        0, tape_len, body,
        (
            m_v,
            n_v,
            levels,
            jnp.zeros((P,), jnp.int32),
            jnp.zeros((P, tape_len), jnp.uint8),
        ),
    )
    return vals, ops, t, j


def align_blocked(
    tok_a_ext,
    tok_b_ext,
    cost_mat,
    gap_id,
    gap_open,
    seq_1: str,
    seq_2: str,
    *,
    block_rows: int | None = None,
    use_pallas: bool | None = None,
    mesh=None,
) -> Traceback:
    """Full alignment with O(n * (m/K + K)) memory (see module docstring).

    Args:
        tok_a_ext / tok_b_ext: (m+1,) / (n+1,) int32 1-origin tokens; any
            padding past the true sequence lengths (taken from seq_1/seq_2)
            is ignored.
        cost_mat / gap_id / gap_open: the costing scheme.
        seq_1 / seq_2: the original strings (for emitting aligned text).
        block_rows: checkpoint interval K; default adaptive — grow blocks
            until one block's move buffer reaches
            ``DEFAULT_BLOCK_MOVES_BYTES`` (fewer blocks = fewer host
            round trips during the replay walk, each >= one window fetch).
        use_pallas: force the checkpoint-pass backend; default auto
            (Pallas on TPU, row scan elsewhere).
        mesh: optional multi-device ``jax.sharding.Mesh`` — the
            CHECKPOINT pass then column-shards every block fill across
            the mesh's devices (parallel/seqpar.py pipeline; SURVEY.md
            §5 long-context row), so the O(m*n) fill work of a huge
            pair scales with device count.  The replay pass (move
            emission + walk of one K-row block at a time) stays on one
            device — it is O(K*n) per block and latency-bound.
    """
    m = len(seq_1)
    n = len(seq_2)
    tok_a_np = np.asarray(tok_a_ext)[: m + 1]
    # seq_2 is padded up to a 256 grid so differently-sized inputs reuse the
    # same compiled block fills (padded columns never feed real cells; the
    # result is read at column n).
    nq = max(256, 256 * -(-(n + 1) // 256)) - 1
    if block_rows is None:
        block_rows = max(
            DEFAULT_BLOCK_ROWS,
            min(m, DEFAULT_BLOCK_MOVES_BYTES // (nq + 1)),
        )
    K = max(1, block_rows)
    tok_b_np = np.zeros((nq + 1,), np.int32)
    tok_b_np[: n + 1] = np.asarray(tok_b_ext)[: n + 1]

    cost_mat = jnp.asarray(cost_mat, jnp.int32)
    gap_id = jnp.asarray(gap_id, jnp.int32)
    gap_open = jnp.asarray(gap_open, jnp.int32)
    tok_b = jnp.asarray(tok_b_np)

    if use_pallas is None:
        use_pallas = jax.devices()[0].platform not in ("cpu",)

    row0_g, col0_g = default_boundary(
        jnp.asarray(tok_a_np), tok_b, cost_mat, gap_id, gap_open
    )
    col0_np = np.asarray(col0_g)

    # Uniform schemes ride the cell-per-lane kernel for both passes
    # (boundary-injected block fills; the replay walks the skewed moves
    # buffer in place — docs/PERF.md).
    uni = None
    asel = 0
    if use_pallas:
        from . import fill_lanes
        from .fill_pallas import uniform_scheme_params

        uni = uniform_scheme_params(np.asarray(cost_mat), int(gap_id))
        if uni is None:
            A_static = int(np.asarray(cost_mat).shape[0])
            if fill_lanes.lanes_alphabet_ok(A_static, cost_mat):
                asel = A_static  # general-matrix lane mode

    def _c0_top(i0: int) -> int:
        """Column-0 Iy seed at a block's top row: rows add their icost
        on top, so the top block (whose col0[2, 0] is the 0 corner)
        seeds gap_open."""
        return (
            int(np.asarray(gap_open)) if i0 == 0 else int(col0_np[2, i0])
        )

    # Block shapes already probed for general-lane backend failures
    # (one sync per distinct shape — jax caches successful compiles, so
    # later same-shape blocks stay lazy and chain without host syncs).
    probed: set[tuple[str, int]] = set()

    def _lanes_block_ckpt(ta_blk, state, i0, i1):
        """Checkpoint fill of one block on the lane kernel, or None."""
        from . import fill_lanes

        blk_m = i1 - i0
        plan = fill_lanes.lanes_plan(1, blk_m, nq, asel=asel)
        if plan is None:
            return None
        w_blk = plan[0]
        c0_top = _c0_top(i0)
        mt = jnp.asarray([blk_m], jnp.int32)
        nt = jnp.asarray([nq], jnp.int32)
        c0 = jnp.asarray([c0_top], jnp.int32)
        if uni is not None:
            last = fill_lanes.lanes_batch_last_rows(
                ta_blk[None], tok_b[None],
                uni[0], uni[1], uni[2], uni[3],
                int(np.asarray(gap_open)),
                mt, nt, state[None], c0, w=w_blk,
            )[0]
        else:
            gkey = fill_lanes.general_lanes_key(1, blk_m, nq, w_blk, asel)
            if (
                not fill_lanes.general_lanes_ok(gkey)
                or ("ckpt_fail", blk_m) in probed
            ):
                return None
            sb = fill_lanes.dispatch_sub_bits(cost_mat, gkey)
            try:
                last = fill_lanes.lanes_general_last_rows(
                    ta_blk[None], tok_b[None], cost_mat, gap_id, gap_open,
                    mt, nt, state[None], c0, w=w_blk, sub_bits=sb,
                )
                if ("ckpt", blk_m) not in probed:
                    last.block_until_ready()
                    probed.add(("ckpt", blk_m))
                last = last[0]
            except Exception:  # pragma: no cover - backend-specific
                fill_lanes.mark_general_lanes_failed(gkey, sub_bits=sb)
                probed.add(("ckpt_fail", blk_m))
                return None
        col0_t = jnp.asarray(
            [BIG, BIG, int(col0_np[2, i1])], jnp.int32
        )
        return jnp.concatenate([col0_t[:, None], last], axis=1)[:, : nq + 1]

    # ---- checkpoint pass -------------------------------------------------
    bounds = list(range(0, m, K)) + [m]  # block b covers rows bounds[b]..[b+1]
    nblocks = len(bounds) - 1
    checkpoints: list[jnp.ndarray] = [row0_g]  # (3, n+1) at each bounds[b]
    state = row0_g
    seqpar_ctx = None
    if mesh is not None and mesh.devices.size > 1 and nq >= (
        mesh.devices.size
    ):
        # Column-sharded checkpoint fills: each block's O(K*n) fill work
        # spreads over the mesh, consecutive blocks chain through a
        # replicated DEVICE row (no per-block host round trips), and the
        # rows are bit-identical to the single-device backends.
        from ..parallel.seqpar import ShardedCheckpointFill

        seqpar_ctx = ShardedCheckpointFill(
            mesh, tok_b, cost_mat, gap_id, gap_open,
            # Honor the caller's backend override (use_pallas is
            # resolved to a bool above): forced-off means the scan
            # backend even on accelerators.
            backend=None if use_pallas else "scan",
        )
        state_full = seqpar_ctx.pad_row0(row0_g)
    for b in range(nblocks):
        i0, i1 = bounds[b], bounds[b + 1]
        ta_blk = _block_tokens(tok_a_np, i0, i1)
        if seqpar_ctx is not None:
            state_full = seqpar_ctx.block_last_rows(
                ta_blk, state_full, col0_np[:, i0 : i1 + 1]
            )
            state = state_full[:, : nq + 1]
            checkpoints.append(state)
            continue
        if use_pallas and (uni is not None or asel > 0):
            lanes_last = _lanes_block_ckpt(ta_blk, state, i0, i1)
            if lanes_last is not None:
                state = lanes_last
                checkpoints.append(state)
                continue
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

    if seqpar_ctx is not None and jax.process_count() > 1:
        # On a multi-process (global) mesh the checkpoint rows live as
        # fully-REPLICATED global arrays; the replay pass below runs
        # process-local jits, which cannot consume cross-process arrays.
        # Localize once per checkpoint (every process holds a complete
        # copy, so the read is collective-free).
        checkpoints = [jnp.asarray(np.asarray(c)) for c in checkpoints]
        state = checkpoints[-1]

    final3 = np.asarray(state[:, n])
    cost = int(final3.min())

    # ---- replay pass -----------------------------------------------------
    # Each block is re-filled WITH move codes on its backend, then walked
    # ON DEVICE (_walk_block); consecutive walks chain through device
    # scalars, so the whole replay dispatches without a host sync and the
    # only host traffic is the final O(m + n) op tapes.
    # Stacked-kernel feasibility is checked SEPARATELY from the lanes
    # dispatch: very wide pairs can fit the lane kernel while the
    # stacked moves kernel does not.
    if use_pallas:
        from .fill_pallas import _stacked_tile_size

        stacked_ok = (
            _stacked_tile_size(
                1, nq, int(np.asarray(cost_mat).shape[0]), moves=True
            )
            >= 1
        )
    else:
        stacked_ok = False

    j_dev = jnp.int32(n)
    level_dev = jnp.int32(int(final3.argmin()))
    tapes = []  # (ops, count) per block, walk order (bottom block first)
    for b in range(nblocks - 1, -1, -1):
        i0, i1 = bounds[b], bounds[b + 1]
        ta_blk = _block_tokens(tok_a_np, i0, i1)
        if (uni is not None or asel > 0) and use_pallas:
            from . import fill_lanes

            plan = fill_lanes.lanes_plan(
                1, i1 - i0, nq, moves=True, asel=asel
            )
        else:
            plan = None
        if plan is not None:
            # Lane-kernel replay: the skewed moves buffer is walked IN
            # PLACE on device (no unskew, no host traffic).
            w_blk = plan[0]
            c0_top = _c0_top(i0)
            mt = jnp.asarray([i1 - i0], jnp.int32)
            nt = jnp.asarray([nq], jnp.int32)
            c0 = jnp.asarray([c0_top], jnp.int32)
            mv = None
            if uni is not None:
                _, mv = fill_lanes.lanes_batch_moves(
                    ta_blk[None], tok_b[None],
                    uni[0], uni[1], uni[2], uni[3],
                    int(np.asarray(gap_open)),
                    mt, nt, checkpoints[b][None], c0, w=w_blk,
                )
            elif (
                fill_lanes.general_lanes_ok(
                    fill_lanes.general_lanes_key(
                        1, i1 - i0, nq, w_blk, asel, moves=True
                    )
                )
                and ("mv_fail", i1 - i0) not in probed
            ):
                mv_key = fill_lanes.general_lanes_key(
                    1, i1 - i0, nq, w_blk, asel, moves=True
                )
                sb = fill_lanes.dispatch_sub_bits(cost_mat, mv_key)
                try:
                    _, mv = fill_lanes.lanes_general_moves(
                        ta_blk[None], tok_b[None], cost_mat, gap_id,
                        gap_open, mt, nt, checkpoints[b][None], c0,
                        w=w_blk, sub_bits=sb,
                    )
                    if ("mv", i1 - i0) not in probed:
                        mv.block_until_ready()
                        probed.add(("mv", i1 - i0))
                except Exception:  # pragma: no cover - backend-specific
                    fill_lanes.mark_general_lanes_failed(
                        mv_key, sub_bits=sb
                    )
                    probed.add(("mv_fail", i1 - i0))
                    mv = None
            if mv is not None:
                ops, count, j_dev, level_dev = _walk_block(
                    mv, j_dev, level_dev, layout="lanes", w=w_blk,
                    k_rows=i1 - i0, width=n + 1,
                )
                tapes.append((ops, count))
                continue
        if stacked_ok:
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
                jnp.asarray([_c0_top(i0)], jnp.int32),
            )
            moves_blk = moves_d[0]
        else:
            col0y_blk = jnp.asarray(col0_np[2, i0 : i1 + 1])
            col0_blk = jnp.stack([col0y_blk, col0y_blk, col0y_blk])
            moves_blk = row_fill(
                ta_blk,
                tok_b,
                cost_mat,
                gap_id,
                gap_open,
                row0=checkpoints[b],
                col0=col0_blk,
                want_moves=True,
            ).moves
        ops, count, j_dev, level_dev = _walk_block(moves_blk, j_dev, level_dev)
        tapes.append((ops, count))

    # One sync: start every tape's host copy, then materialize them all.
    for ops, count in tapes:
        try:
            ops.copy_to_host_async()
        except Exception:  # pragma: no cover - backend without async copy
            pass
    tapes_np = [
        np.asarray(ops)[: int(np.asarray(count))] for ops, count in tapes
    ]

    # ---- host assembly from the op tapes --------------------------------
    s1a, midl, s2a = assemble_from_tapes(tapes_np, seq_1, seq_2)
    return Traceback(s1a, midl, s2a, cost)


def assemble_from_tapes(
    tapes_np, seq_1: str, seq_2: str
) -> tuple[str, str, str]:
    """Aligned strings from device-walked op tapes (walk order: from
    (m, n) upward; any trailing row-0 LEFT moves are implicit —
    reference globaligner.py:542-561)."""
    out_1: list[str] = []
    mid: list[str] = []
    out_2: list[str] = []
    i, j = len(seq_1), len(seq_2)
    for ops_np in tapes_np:
        for op in ops_np:
            if op == OP_DIAG:
                a, bch = seq_1[i - 1], seq_2[j - 1]
                out_1.append(a)
                mid.append(MATCH_GLYPH if a == bch else MISMATCH_GLYPH)
                out_2.append(bch)
                i -= 1
                j -= 1
            elif op == OP_LEFT:
                out_1.append(GAP_CHAR)
                mid.append(GAP_GLYPH)
                out_2.append(seq_2[j - 1])
                j -= 1
            else:
                out_1.append(seq_1[i - 1])
                mid.append(GAP_GLYPH)
                out_2.append(GAP_CHAR)
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
    return "".join(out_1), "".join(mid), "".join(out_2)
