"""Batched many-pair alignment engine (length bucketing + vmap).

The reference aligns exactly one pair per process run
(src/globalign/globaligner.py:132-314).  On TPU the economic unit is a
*batch*: thousands of independent pairs are padded into length buckets,
tokenized into dense int32 arrays, and filled by a single vmapped wavefront
scan per bucket, so every diagonal step is a ``(B, M+1)`` vector op that
saturates the VPU.  This module is the host-side front end for that engine:

  * bucketing policy (round lengths up to a quantum -> few recompiles,
    bounded pad waste; SURVEY.md §7 step 4),
  * scheme resolution over the union alphabet of the whole batch,
  * optional deterministic traceback per pair from the batched move codes,
  * optional data-parallel sharding over a device mesh
    (:mod:`globalign_tpu.parallel.mesh`).

Results come back in input order, each with the same cost/score semantics as
the single-pair API (bit-identical to the reference's values).
"""

from __future__ import annotations

import functools
import logging
import math
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import ResolvedScheme, resolve_scheme
from .models.gotoh import GotohAlignment
from .ops import fill_rows
from .ops.traceback import traceback_moves
from .ops.transforms import final_cost_to_score
from .utils.tokenize import GAP, encode_padded

_logger = logging.getLogger(__name__)

DEFAULT_BUCKET_QUANTUM = 32

# Above this many bytes of move codes for one bucket, traceback mode
# processes that bucket pair-by-pair with the checkpointed linear-space
# replay instead of materializing the whole bucket's moves.  Bounds the
# HOST fetch on the fallback (non-device-walked) paths; overridable
# process-wide via GLOBALIGN_BATCH_MOVES_BUDGET_BYTES for deployments
# with more host RAM or local (non-tunnelled) devices.
import os as _os

DEFAULT_BATCH_MOVES_BUDGET = int(
    _os.environ.get(
        "GLOBALIGN_BATCH_MOVES_BUDGET_BYTES", 256 * 1024 * 1024
    )
)

# Sub-batch budget when the DEVICE-WALKED lane path serves the bucket:
# those move buffers never leave HBM (only O(m+n) op tapes cross to the
# host), so the bound is HBM working set, not host-fetch bytes — and
# bigger sub-batches mean more pairs per walk group (the walk is
# latency-bound at small lane counts; 10 kb fill tiles hold 2 pairs,
# scratch/micro_tb_decompose.py).
DEVICE_WALK_MOVES_BUDGET = 1536 * 1024 * 1024

# Walk GROUPS stack same-shape tile move buffers and walk them in one
# fori_loop (linear_tb.lanes_tile_walk flat_base).  Bounded so the
# stacked copy stays comfortably in HBM and flat int32 indexing holds
# (group elements < 2^31).
WALK_GROUP_BYTES = 1536 * 1024 * 1024

# General-matrix walk shape classes that survived their one blocking
# probe (see _lanes_walk_fills).
_GENERAL_WALK_PROBED: set = set()

# Fuse every bucket's fill of one align_pairs call into ONE jitted
# executable per chunk composition (the meta/shape signature): a
# jittered 1 kb chunk splinters into ~40 buckets and each eager
# dispatch costs ~6 ms through the dev tunnel — more than all the fill
# compute.  Measured with REPEATING chunk compositions: 1 kb cost
# serving 535 -> 734 pairs/s and traceback 294 -> 452
# (scratch/measure_serving.py, within-session).
#
# DEFAULT OFF: the executable is keyed by the chunk's bucket
# composition, and a stream whose compositions VARY pays a full XLA
# compile per novel composition — measured catastrophic on the remote
# toolchain (BLOSUM 1 kb cost serving fell to 4.8 pairs/s, ~200 s of
# compile per chunk).  Enable (`set_chunk_fusion(True)`, or
# `--fuse_chunks` on the batch CLI) only for workloads whose chunk
# compositions repeat — fixed-shape re-serving, quantized all-vs-all
# sweeps — where the compile amortizes and the win is large.
COST_CHUNK_JIT = False

# Same fusion for TRACEBACK mode: every bucket's moves fills AND the
# chunk-wide mega-walk run in one executable; only the four result
# arrays (finals, tapes, counts, j_exits) leave it — the move buffers
# never even materialize as separate XLA values.  Same default-off
# rationale as COST_CHUNK_JIT.
TB_CHUNK_JIT = False


def set_chunk_fusion(enabled: bool) -> None:
    """Opt in to per-chunk fused executables (see COST_CHUNK_JIT)."""
    global COST_CHUNK_JIT, TB_CHUNK_JIT
    COST_CHUNK_JIT = TB_CHUNK_JIT = bool(enabled)


@functools.partial(
    jax.jit, static_argnames=("meta", "tape_len", "interpret")
)
def _chunk_tb_jit(
    cost_mat, gap_id, gap_open, sel, meta_vec, *arrs, meta, tape_len,
    interpret=False,
):
    """Every bucket's MOVES fills plus the mega-walk in one executable.

    ``meta``: one static entry per bucket —
    ``(uniform, gap_open_static, general_plan_or_None, sub_bits, w,
    tile_l)``; ``arrs`` is the flat (tok_a, tok_b, m_true, n_true) per
    bucket; ``sel``/``meta_vec`` are the per-PAIR mega-walk vectors the
    host precomputed from the static tile geometry
    (linear_tb.lanes_mega_walk contract).  Returns (vals (P, 3), tapes
    (P, tape_len), counts, j_exits)."""
    from .ops import fill_lanes
    from .ops.fill_pallas import _tile_slice
    from .ops.linear_tb import lanes_mega_walk

    vals_parts = []
    blob_parts = []
    it = iter(arrs)
    for uniform, go_static, gplan, sb, w, tile_l in meta:
        ta, tb, mt, nt = next(it), next(it), next(it), next(it)
        Bl = ta.shape[0]
        for lo in range(0, Bl, tile_l):
            hi = min(lo + tile_l, Bl)
            tat, tbt, mtt, ntt = _tile_slice(
                (ta, tb, mt, nt), lo, hi, tile_l
            )
            if gplan is None:
                cma, cmm, dco, ico = uniform
                vals, mv = fill_lanes.lanes_batch_moves(
                    tat, tbt, cma, cmm, dco, ico, go_static, mtt, ntt,
                    w=w, interpret=interpret,
                )
            else:
                vals, mv = fill_lanes.lanes_general_moves(
                    tat, tbt, cost_mat, gap_id, gap_open, mtt, ntt,
                    w=w, sub_bits=sb, interpret=interpret,
                )
            vals_parts.append(vals)
            blob_parts.append(mv.reshape(-1))
    mv_blob = jnp.concatenate(blob_parts)
    vals_full = jnp.concatenate(vals_parts, axis=0)
    return lanes_mega_walk(mv_blob, vals_full, sel, meta_vec, tape_len)


def _tb_chunk_meta(B, M, N, scheme):
    """Static chunk-jit descriptor for a traceback bucket
    ``(uniform, gap_open_static, general_plan, sub_bits, w, tile_l)``,
    or None for the eager path (kernel-less shapes; general classes
    not yet probed clean — their first call stays eager so
    probe-and-latch sees backend rejections)."""
    from .ops import fill_lanes
    from .ops.fill_pallas import uniform_scheme_params

    cost_np = np.asarray(scheme.costing.values)
    uni = uniform_scheme_params(cost_np, scheme.alphabet.gap_id)
    asel = 0 if uni is not None else int(cost_np.shape[0])
    if not fill_lanes.lanes_alphabet_ok(asel, cost_np):
        return None
    sb = fill_lanes.sub_bits_for(cost_np) if asel else 0
    plan = fill_lanes.lanes_plan(B, M, N, moves=True, asel=asel,
                                 sub_bits=sb)
    if plan is None:
        return None
    w, tile_l = plan
    if asel > 0:
        gkey = fill_lanes.general_lanes_key(
            tile_l, M, N, w, asel, moves=True
        )
        sb2 = fill_lanes.dispatch_sub_bits(cost_np, gkey)
        if sb2 != sb:
            return None  # bitmask latched: take the eager re-plan path
        if not fill_lanes.general_lanes_ok(gkey) or (
            gkey not in _GENERAL_WALK_PROBED
        ):
            return None
        if asel > fill_lanes.LANES_MAX_ALPHABET and sb == 0:
            return None
        return (None, None, plan, sb, w, tile_l)
    return (
        tuple(int(v) for v in uni), int(scheme.gap_open_cost),
        None, 0, w, tile_l,
    )


def _drain_tb_fused(acc, pairs, cost_mat, gap_id, gap_open,
                    interpret=False):
    """Run one fused traceback segment (see _chunk_tb_jit) and return a
    walked_pending entry.  All mega-walk geometry comes from the STATIC
    tile shapes, so sel/meta build host-side with no device traffic."""
    from .ops import fill_lanes

    metas = tuple(b[0] for b in acc)
    flat_arrs: list = []
    sel: list[int] = []
    meta_rows: list[tuple] = []
    indices: list[int] = []
    row0 = 0
    off = 0
    tape_need = 1
    for (meta, ta, tb, mt, nt, idxs, M, N) in acc:
        _u, _g, _gp, _sb, w, tile_l = meta
        flat_arrs += [
            jnp.asarray(ta), jnp.asarray(tb),
            jnp.asarray(np.asarray(mt, np.int32)),
            jnp.asarray(np.asarray(nt, np.int32)),
        ]
        B = ta.shape[0]
        S_p, R = fill_lanes._lanes_geometry(tile_l, N, w, moves=True)
        elems = fill_lanes.lanes_moves_bytes(tile_l, M, N, w)
        r128 = R * 128
        maxrow = elems // r128 - 1
        tape_need = max(tape_need, M + N + 1)
        for lo in range(0, B, tile_l):
            hi = min(lo + tile_l, B)
            for slot, idx in enumerate(idxs[lo:hi]):
                indices.append(idx)
                sel.append(row0 + slot)
                meta_rows.append((
                    len(pairs[idx][0]), len(pairs[idx][1]), w, r128,
                    maxrow, slot * S_p, off,
                ))
            row0 += tile_l
            off += elems
    P = len(indices)
    P_pad = -(-P // _PAIRS_QUANTUM) * _PAIRS_QUANTUM
    sel += [0] * (P_pad - P)
    meta_rows += [(0, 0, 1, 1, 0, 0, 0)] * (P_pad - P)
    tape_len = -(-tape_need // _TAPE_QUANTUM) * _TAPE_QUANTUM
    out = _chunk_tb_jit(
        cost_mat, gap_id, gap_open,
        jnp.asarray(np.asarray(sel, np.int32)),
        jnp.asarray(np.asarray(meta_rows, np.int32)),
        *flat_arrs,
        meta=metas, tape_len=tape_len, interpret=interpret,
    )
    return out, indices


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _chunk_costs_jit(cost_mat, gap_id, gap_open, *arrs, meta,
                     interpret=False):
    """Every bucket's (B, 3) finals in one executable.

    ``meta`` is a static tuple with one entry per bucket:
    ``(uniform, gap_open_static, general_plan, sub_bits)`` — uniform
    scheme params (or None), and for general matrices the host-resolved
    lane plan + substitution mode (mesh.py's shard-body pattern: the
    matrix is a tracer here, so every dispatch decision must arrive
    static).  ``arrs`` is the flat (tok_a, tok_b, m_true, n_true) per
    bucket.  Returns the per-bucket finals concatenated in order."""
    from .ops import fill_lanes
    from .ops.fill_pallas import _tile_slice, batch_final3

    outs = []
    it = iter(arrs)
    for uniform, go_static, gplan, sb in meta:
        ta, tb, mt, nt = next(it), next(it), next(it), next(it)
        if gplan is not None:
            w, tile_l = gplan
            Bl = ta.shape[0]
            vs = []
            for lo in range(0, Bl, tile_l):
                hi = min(lo + tile_l, Bl)
                tat, tbt, mtt, ntt = _tile_slice(
                    (ta, tb, mt, nt), lo, hi, tile_l
                )
                vals = fill_lanes.lanes_general_final3(
                    tat, tbt, cost_mat, gap_id, gap_open, mtt, ntt,
                    w=w, sub_bits=sb, interpret=interpret,
                )
                vs.append(vals[: hi - lo])
            outs.append(jnp.concatenate(vs, axis=0))
        else:
            outs.append(batch_final3(
                ta, tb, cost_mat, gap_id, gap_open, mt, nt,
                uniform=uniform, gap_open_static=go_static,
                interpret=interpret,
            ))
    return jnp.concatenate(outs, axis=0)


def _cost_chunk_meta(B, M, N, scheme):
    """Static chunk-jit descriptor for a cost-only bucket, or None when
    the bucket must take the eager per-bucket path (general shape
    classes keep their first call eager so the probe-and-latch
    machinery sees any backend rejection; they join the chunk jit once
    probed clean)."""
    from .ops import fill_lanes
    from .ops.fill_pallas import uniform_scheme_params

    cost_np = np.asarray(scheme.costing.values)
    uni = uniform_scheme_params(cost_np, scheme.alphabet.gap_id)
    if uni is not None:
        return (
            tuple(int(v) for v in uni), int(scheme.gap_open_cost),
            None, 0,
        )
    A = int(cost_np.shape[0])
    if not fill_lanes.lanes_alphabet_ok(A, cost_np):
        return None
    plan = fill_lanes.lanes_plan(B, M, N, asel=A)
    if plan is None:
        return None
    gkey = fill_lanes.general_lanes_key(plan[1], M, N, plan[0], A)
    if not fill_lanes.general_lanes_ok(gkey) or (
        fill_lanes.general_probe_needed(gkey)
    ):
        return None
    sb = fill_lanes.dispatch_sub_bits(cost_np, gkey)
    if A > fill_lanes.LANES_MAX_ALPHABET and sb == 0:
        return None
    return (None, None, plan, sb)


def _use_pallas() -> bool:
    import jax

    return jax.devices()[0].platform not in ("cpu",)


def _moves_backend_estimate(
    m: int, n: int, scheme: "ResolvedScheme"
) -> tuple[int, bool]:
    """(move-code bytes per pair, device-walked-lane-path expected) for
    an (m, n) bucket, sized for the backend the bucket actually uses:
    the lane kernel's skewed uint8 buffer (amortized over a full tile —
    its footprint is (m + 2*S_p)*w*S_p cells, NOT (m+1)*(n+1)), the
    stacked moves kernel's 8-aligned chunk padding when that kernel
    runs, else the row scan's logical (m+1)*(n+1).  Sharded shard_map
    bodies dispatch the same lane kernel via host-resolved static plans
    (parallel/mesh.py), so one estimate covers both.  The flag picks
    the sub-batch budget: walked-lane buckets keep moves in HBM (bigger
    budget), everything else fetches them to the host."""
    from .ops.fill_pallas import (
        LANES, _stacked_r, _stacked_tile_size, uniform_scheme_params,
    )

    if _use_pallas():
        from .ops import fill_lanes

        uni = uniform_scheme_params(
            scheme.costing.values, scheme.alphabet.gap_id
        )
        asel = 0 if uni is not None else scheme.alphabet.size
        # Sharded bodies dispatch the lane kernel for uniform AND
        # general schemes (host-resolved statics, parallel/mesh.py).
        lanes_able = fill_lanes.lanes_alphabet_ok(
            asel, scheme.costing.values
        )
        if lanes_able:
            sb = (
                fill_lanes.sub_bits_for(np.asarray(scheme.costing.values))
                if asel
                else 0
            )
            plan = fill_lanes.lanes_plan(
                128, m, n, moves=True, asel=asel, sub_bits=sb
            )
            if plan is not None and (
                asel == 0
                or fill_lanes.general_lanes_ok(
                    fill_lanes.general_lanes_key(
                        plan[1], m, n, plan[0], asel, moves=True
                    )
                )
            ):
                w, tile = plan
                return (
                    -(-fill_lanes.lanes_moves_bytes(tile, m, n, w) // tile),
                    True,
                )
        if _stacked_tile_size(1, n, scheme.alphabet.size, moves=True) >= 1:
            return (m + 1) * _stacked_r(n, moves=True) * LANES, False
    return (m + 1) * (n + 1), False


def _moves_pair_bytes(m: int, n: int, scheme: "ResolvedScheme") -> int:
    return _moves_backend_estimate(m, n, scheme)[0]


def _pallas_moves(tok_a, tok_b, cost_mat, gap_id, gap_open, m_true, n_true):
    from .ops.fill_pallas import batch_moves

    return batch_moves(
        jnp.asarray(tok_a),
        jnp.asarray(tok_b),
        cost_mat,
        gap_id,
        gap_open,
        jnp.asarray(m_true),
        jnp.asarray(n_true),
    )


@dataclass
class _WalkTile:
    """One lane-kernel moves fill awaiting the chunk-wide mega walk."""

    vals: object  # (tile_l, 3) device final lanes (incl. pad rows)
    mv: object  # device skewed moves buffer
    elems: int  # mv element count (= bytes; uint8)
    w: int  # strip width
    S_p: int  # strips per pair
    tape_need: int  # m_pad + n_pad + 1 for this bucket
    idxs: list  # positions in `pairs` of the tile's REAL rows
    m_list: list  # their true lengths
    n_list: list


# Pad grids for the mega-walk jit signature: the blob length, tile-row
# count, pair count, and tape length all quantize up so a stream of
# varying chunk compositions reuses a handful of executables instead of
# recompiling per chunk.
_BLOB_QUANTUM = 4 * 1024 * 1024
_ROWS_QUANTUM = 64
_PAIRS_QUANTUM = 32
_TAPE_QUANTUM = 256


def _lanes_walk_fills(
    tok_a, tok_b, cost_mat, gap_id, gap_open, m_true, n_true, indices,
    pairs,
) -> "list[_WalkTile] | None":
    """Dispatch one bucket's lane-kernel MOVES fills and return the
    tiles for the chunk-wide device walk (:func:`_mega_walk_flush`), or
    None when the lane kernel does not cover these shapes (caller falls
    back).  The moves buffers stay in HBM — the host-unskew path
    (fill_pallas.batch_moves) fetches O(B*m*n) move bytes instead,
    measured ~20x the whole serving wall-clock through the dev tunnel
    (scratch/measure_serving.py)."""
    from .ops import fill_lanes
    from .ops.fill_pallas import _tile_slice, uniform_scheme_params

    B = tok_a.shape[0]
    m_pad = tok_a.shape[1] - 1
    n_pad = tok_b.shape[1] - 1
    cost_np = np.asarray(cost_mat)
    uni = uniform_scheme_params(cost_np, int(gap_id))
    asel = 0 if uni is not None else int(cost_np.shape[0])
    if not fill_lanes.lanes_alphabet_ok(asel, cost_np):
        return None
    # sub_bits from the HOST copy (the device array would cost a ~35 ms
    # tunnel round trip per align call), once per bucket; the MOVES
    # plan depends on it (bitmask general admits w=64).  The bitmask
    # failure latch is keyed by the plan's shape class, so re-resolve
    # and re-plan once if the latch downgrades the mode.
    sb = fill_lanes.sub_bits_for(cost_np) if asel else 0
    plan = fill_lanes.lanes_plan(
        B, m_pad, n_pad, moves=True, asel=asel, sub_bits=sb
    )
    if plan is None:
        return None
    w, tile_l = plan
    gkey = fill_lanes.general_lanes_key(
        tile_l, m_pad, n_pad, w, asel, moves=True
    )
    if asel > 0:
        sb2 = fill_lanes.dispatch_sub_bits(cost_np, gkey)
        if sb2 != sb:
            sb = sb2
            plan = fill_lanes.lanes_plan(
                B, m_pad, n_pad, moves=True, asel=asel, sub_bits=sb
            )
            if plan is None:
                return None
            w, tile_l = plan
            gkey = fill_lanes.general_lanes_key(
                tile_l, m_pad, n_pad, w, asel, moves=True
            )
        if not fill_lanes.general_lanes_ok(gkey):
            return None
        if asel > fill_lanes.LANES_MAX_ALPHABET and sb == 0:
            return None
    S_p, _R = fill_lanes._lanes_geometry(tile_l, n_pad, w, moves=True)

    tok_a = jnp.asarray(tok_a)
    tok_b = jnp.asarray(tok_b)
    m_t = jnp.asarray(m_true, jnp.int32)
    n_t = jnp.asarray(n_true, jnp.int32)
    tiles: list[_WalkTile] = []
    try:
        for lo in range(0, B, tile_l):
            hi = min(lo + tile_l, B)
            ta, tb, mt, nt = _tile_slice(
                (tok_a, tok_b, m_t, n_t), lo, hi, tile_l
            )
            if uni is not None:
                cma, cmm, dco, ico = (int(v) for v in uni)
                vals, mv = fill_lanes.lanes_batch_moves(
                    ta, tb, cma, cmm, dco, ico, int(gap_open), mt, nt, w=w
                )
            else:
                vals, mv = fill_lanes.lanes_general_moves(
                    ta, tb, cost_mat, gap_id, gap_open, mt, nt, w=w,
                    sub_bits=sb,
                )
            idxs = list(indices[lo:hi])
            tiles.append(_WalkTile(
                vals=vals, mv=mv, elems=int(np.prod(mv.shape)),
                w=w, S_p=S_p, tape_need=m_pad + n_pad + 1, idxs=idxs,
                m_list=[len(pairs[i][0]) for i in idxs],
                n_list=[len(pairs[i][1]) for i in idxs],
            ))
        if asel > 0 and gkey not in _GENERAL_WALK_PROBED:
            # One blocking probe per new shape class materializes a
            # Mosaic rejection so the latch can catch it; probing every
            # bucket would cost a ~35 ms sync each on the dev tunnel.
            tiles[0].vals.block_until_ready()
            _GENERAL_WALK_PROBED.add(gkey)
    except Exception:  # pragma: no cover - backend-specific
        if asel == 0:
            raise
        # Log before latching: the latch is meant for Mosaic/backend
        # rejections of a shape class, but this except also catches a
        # genuine programming error (e.g. a bad slice shape), which
        # would otherwise be silently absorbed as "backend declined".
        _logger.debug(
            "general-lane walked traceback failed for shape %s; "
            "latching fallback", gkey, exc_info=True,
        )
        fill_lanes.mark_general_lanes_failed(gkey, sub_bits=sb)
        return None
    return tiles


def _mega_walk_flush(tiles: "list[_WalkTile]"):
    """Walk every accumulated tile's pairs in ONE device executable.

    A jittered stream splinters each chunk into ~dozens of small (M, N)
    buckets; per-bucket walk dispatches plus per-bucket result slices
    and concats cost more tunnel/dispatch overhead than all the device
    work combined (scratch/repro_bucket_serial.py: serial per-bucket
    ~40 ms each while the device work is ~1 ms).  Every tile's skewed
    buffer is flattened into one uint8 blob, per-PAIR geometry rides as
    data (linear_tb.lanes_mega_walk), and the flush fetches exactly
    four arrays for the whole accumulation.  All dims pad to quanta so
    varying chunk compositions reuse a few compiled signatures.

    Returns ``((vals, tapes, counts, j_exits) device arrays (padded
    rows beyond len(indices) are junk), indices)`` — a walked_pending
    entry."""
    from .ops.linear_tb import lanes_mega_walk

    offs = []
    off = 0
    for t in tiles:
        offs.append(off)
        off += t.elems
    blob_pad = -(-off // _BLOB_QUANTUM) * _BLOB_QUANTUM - off
    parts = [t.mv.reshape(-1) for t in tiles]
    if blob_pad:
        parts.append(jnp.zeros((blob_pad,), jnp.uint8))
    mv_blob = jnp.concatenate(parts)

    rows = sum(int(t.vals.shape[0]) for t in tiles)
    rows_pad = -(-rows // _ROWS_QUANTUM) * _ROWS_QUANTUM - rows
    vparts = [t.vals for t in tiles]
    if rows_pad:
        vparts.append(jnp.zeros((rows_pad, 3), jnp.int32))
    vals_full = jnp.concatenate(vparts, axis=0)

    indices: list[int] = []
    sel = []
    meta = []
    row0 = 0
    for t, toff in zip(tiles, offs):
        r128 = int(t.mv.shape[-2]) * 128
        maxrow = int(t.mv.shape[-3]) - 1
        for slot, idx in enumerate(t.idxs):
            indices.append(idx)
            sel.append(row0 + slot)
            meta.append((
                t.m_list[slot], t.n_list[slot], t.w, r128, maxrow,
                slot * t.S_p, toff,
            ))
        row0 += int(t.vals.shape[0])
    P = len(indices)
    P_pad = -(-P // _PAIRS_QUANTUM) * _PAIRS_QUANTUM
    sel += [0] * (P_pad - P)
    meta += [(0, 0, 1, 1, 0, 0, 0)] * (P_pad - P)  # m=0: inactive lanes
    tape_need = max(t.tape_need for t in tiles)
    tape_len = -(-tape_need // _TAPE_QUANTUM) * _TAPE_QUANTUM

    out = lanes_mega_walk(
        mv_blob,
        vals_full,
        jnp.asarray(np.asarray(sel, np.int32)),
        jnp.asarray(np.asarray(meta, np.int32)),
        tape_len,
    )
    return out, indices


@dataclass
class PendingAlignments:
    """A dispatched-but-unfetched :func:`align_pairs` call.

    Returned by ``align_pairs(..., flush=False)``: every bucket's fill
    (and device walk, in traceback mode) has been DISPATCHED, but the
    coalesced device->host fetches have not run yet.  ``resolve()``
    performs them and returns the final results.  The point is chunk
    pipelining: a device fetch costs ~2 tunnel round trips (~80 ms
    measured, scratch/micro_chunk_decompose.py) and dominates serving
    wall-clock at short lengths — the runner dispatches chunk k+1
    before resolving chunk k so the fetch latency overlaps the next
    chunk's fills (SURVEY.md §5 metrics row; VERDICT r3 item 6)."""

    _flush: object

    def resolve(self) -> "list[PairResult]":
        return self._flush()


@dataclass(frozen=True)
class PairResult:
    """Result for one pair in a batch (traceback fields None in cost-only mode)."""

    cost: int
    score: int
    seq_1_aligned: str | None = None
    middle_part: str | None = None
    seq_2_aligned: str | None = None

    def cigar(self, extended: bool = True) -> str | None:
        """CIGAR of the alignment, or None in cost-only mode."""
        if self.seq_1_aligned is None:
            return None
        from .ops.traceback import alignment_to_cigar

        return alignment_to_cigar(
            self.seq_1_aligned, self.seq_2_aligned, extended=extended
        )


def bucket_length(length: int, quantum: int = DEFAULT_BUCKET_QUANTUM) -> int:
    """Round a sequence length up to the bucket grid (next multiple of quantum)."""
    return max(quantum, quantum * math.ceil(length / quantum))


def _validate_pairs(pairs: Sequence[tuple[str, str]]) -> list[tuple[str, str]]:
    out = []
    for idx, (s1, s2) in enumerate(pairs):
        if len(s1) == 0 or len(s2) == 0:
            raise RuntimeError(f"Pair {idx}: detected a sequence of length 0.")
        if GAP in s1 or GAP in s2:
            raise RuntimeError(
                f"Pair {idx}: sequences may not contain the '-' character."
            )
        out.append((s1.upper(), s2.upper()))
    return out


def align_pairs(
    pairs: Sequence[tuple[str, str]],
    *,
    scheme: ResolvedScheme | None = None,
    scoring_mat_name: str | None = None,
    scoring_mat_path=None,
    match_score=None,
    mismatch_score=None,
    mismatch_cost=None,
    gap_open_score=None,
    gap_open_cost=None,
    gap_extension_score=None,
    gap_extension_cost=None,
    with_traceback: bool = True,
    bucket_quantum: int = DEFAULT_BUCKET_QUANTUM,
    mesh=None,
    phase_seconds: dict | None = None,
    flush: bool = True,
) -> "list[PairResult] | PendingAlignments":
    """Align many independent pairs on device, in input order.

    Scheme options mirror :func:`globalign_tpu.find_global_alignment`; a
    pre-resolved ``scheme`` may be passed instead.  With ``mesh`` set (a 1-D
    ``jax.sharding.Mesh``), each bucket's batch axis is sharded data-parallel
    across the mesh devices — cost-only and traceback modes both (moves
    stay sharded per device; final lanes are all-gathered).

    ``phase_seconds`` (optional dict) accumulates wall-clock per phase
    ("fill" = device DP fill + walk dispatch, "fetch" = coalesced
    device->host transfers, "traceback" = host string assembly,
    "blocked" = linear-space per-pair path) — the runner surfaces these
    in its structured stats; device phases are also annotated with
    ``jax.named_scope`` for jax.profiler traces.

    ``flush=False`` returns a :class:`PendingAlignments` whose
    ``resolve()`` runs the coalesced device fetches and final host
    assembly — the runner's chunk-pipelining hook.  Buckets that take a
    non-deferrable path (blocked per-pair traceback, CPU row scan) are
    resolved eagerly either way.
    """
    import time as _time

    import jax as _jax

    def _phase(name):
        class _P:
            def __enter__(self):
                self._t0 = _time.perf_counter()
                self._scope = _jax.named_scope(f"globalign.{name}")
                self._scope.__enter__()
                return self

            def __exit__(self, *exc):
                self._scope.__exit__(*exc)
                if phase_seconds is not None:
                    phase_seconds[name] = phase_seconds.get(name, 0.0) + (
                        _time.perf_counter() - self._t0
                    )
                return False

        return _P()
    pairs = _validate_pairs(pairs)
    if not pairs:
        return []

    if scheme is None:
        # Union alphabet across the batch: for simple schemes the matrix
        # entries depend only on char-class (match/mismatch/gap), so a wider
        # alphabet leaves every pair's cost and score unchanged relative to
        # the reference's per-pair alphabet (start.py:355-358).
        all_1 = "".join(s1 for s1, _ in pairs)
        all_2 = "".join(s2 for _, s2 in pairs)
        scheme = resolve_scheme(
            all_1,
            all_2,
            scoring_mat_name=scoring_mat_name,
            scoring_mat_path=scoring_mat_path,
            match_score=match_score,
            mismatch_score=mismatch_score,
            mismatch_cost=mismatch_cost,
            gap_open_score=gap_open_score,
            gap_open_cost=gap_open_cost,
            gap_extension_score=gap_extension_score,
            gap_extension_cost=gap_extension_cost,
        )

    cost_mat = jnp.asarray(scheme.costing.values, jnp.int32)
    gap_id = jnp.int32(scheme.alphabet.gap_id)
    gap_open = jnp.int32(scheme.gap_open_cost)

    # Bucket by padded (M, N).
    buckets: dict[tuple[int, int], list[int]] = {}
    for idx, (s1, s2) in enumerate(pairs):
        key = (
            bucket_length(len(s1), bucket_quantum),
            bucket_length(len(s2), bucket_quantum),
        )
        buckets.setdefault(key, []).append(idx)

    results: list[PairResult | None] = [None] * len(pairs)
    # Cost-only device finals awaiting the one coalesced end-of-call
    # fetch: (device (B, 3) final lanes, pair indices) per bucket.
    deferred: list[tuple[jnp.ndarray, list[int]]] = []
    # Cost-only buckets accumulating into the per-chunk fused
    # executable: (meta, tok_a, tok_b, m_true, n_true, indices).
    cost_acc: list[tuple] = []
    # Device-walked traceback buckets awaiting the same treatment:
    # ((final3, tapes, counts, j_exits) device arrays, pair indices)
    # per mega-walk SEGMENT (tiles accumulate across buckets and walk
    # in one executable; rows past len(indices) are pad junk).
    walked_pending: list[tuple[tuple, list[int]]] = []
    walk_acc: list[_WalkTile] = []
    walk_acc_bytes = 0
    # Fused-traceback accumulator: whole buckets awaiting the one
    # fills+walk executable (_chunk_tb_jit) per segment.
    tb_acc: list[tuple] = []
    tb_acc_bytes = 0

    def _drain_walks() -> None:
        nonlocal walk_acc, walk_acc_bytes
        if walk_acc:
            with _phase("fill"):
                walked_pending.append(_mega_walk_flush(walk_acc))
            walk_acc = []
            walk_acc_bytes = 0

    def _drain_tb_acc() -> None:
        nonlocal tb_acc, tb_acc_bytes
        if tb_acc:
            with _phase("fill"):
                walked_pending.append(_drain_tb_fused(
                    tb_acc, pairs, cost_mat, gap_id, gap_open
                ))
            tb_acc = []
            tb_acc_bytes = 0
    grouped: list[tuple[tuple[int, int], list[int]]] = []
    for (M, N), indices in buckets.items():
        if not with_traceback:
            grouped.append(((M, N), indices))
            continue
        # Budget per pair on the bytes the dispatched backend REALLY
        # materializes (lane-kernel skew, stacked chunk padding, or
        # logical width) and split oversized buckets into sub-batches
        # rather than losing the batched path.  Device-walked lane
        # buckets get the HBM-bound budget (moves never reach the
        # host); fetching backends keep the host-transfer bound.
        per_pair, walky = _moves_backend_estimate(M, N, scheme)
        budget = (
            DEVICE_WALK_MOVES_BUDGET if walky else DEFAULT_BATCH_MOVES_BUDGET
        )
        max_pairs = max(0, budget // max(1, per_pair))
        if max_pairs >= 1:
            for lo in range(0, len(indices), max_pairs):
                grouped.append(((M, N), indices[lo : lo + max_pairs]))
        else:
            grouped.append(((M, N), indices))
    if with_traceback:
        bucket_items = grouped
    else:
        bucket_items = list(buckets.items())

    for (M, N), indices in bucket_items:
        if with_traceback:
            per_pair, walky = _moves_backend_estimate(M, N, scheme)
            bucket_budget = (
                DEVICE_WALK_MOVES_BUDGET
                if walky
                else DEFAULT_BATCH_MOVES_BUDGET
            )
        if with_traceback and per_pair > bucket_budget:
            # A single pair's move matrix exceeds the budget; use the
            # checkpointed linear-space traceback (same deterministic path).
            from .ops.linear_tb import align_blocked

            for idx in indices:
                s1, s2 = pairs[idx]
                tok_a = encode_padded(scheme.alphabet, s1, len(s1))
                tok_b = encode_padded(scheme.alphabet, s2, len(s2))
                with _phase("blocked"):
                    # A supplied mesh column-shards each block's
                    # checkpoint fill (parallel/seqpar.py).
                    tb = align_blocked(
                        tok_a, jnp.asarray(tok_b), cost_mat, gap_id,
                        gap_open, s1, s2, mesh=mesh,
                    )
                score = final_cost_to_score(
                    cost=tb.cost, m=len(s1), n=len(s2),
                    max_score=scheme.max_score,
                )
                results[idx] = PairResult(
                    cost=tb.cost,
                    score=score,
                    seq_1_aligned=tb.seq_1_aligned,
                    middle_part=tb.middle_part,
                    seq_2_aligned=tb.seq_2_aligned,
                )
            continue
        tok_a = np.stack(
            [encode_padded(scheme.alphabet, pairs[i][0], M) for i in indices]
        )
        tok_b = np.stack(
            [encode_padded(scheme.alphabet, pairs[i][1], N) for i in indices]
        )
        m_true = np.array([len(pairs[i][0]) for i in indices], np.int32)
        n_true = np.array([len(pairs[i][1]) for i in indices], np.int32)

        with _phase("fill"):
            if mesh is not None and with_traceback:
                from .parallel.mesh import sharded_fill_moves

                final3, moves = sharded_fill_moves(
                    mesh, tok_a, tok_b, cost_mat, gap_id, gap_open,
                    m_true, n_true,
                )
            elif mesh is not None:
                from .parallel.mesh import sharded_fill_costs

                final3 = sharded_fill_costs(
                    mesh, tok_a, tok_b, cost_mat, gap_id, gap_open,
                    m_true, n_true,
                )
                moves = None
            elif not with_traceback and _use_pallas():
                # A ~1 kb stream splinters into dozens of (M, N)
                # buckets per call; eager per-bucket dispatch costs
                # ~6 ms each through the dev tunnel.  Buckets whose
                # dispatch is fully host-resolvable accumulate into ONE
                # jitted executable per chunk composition
                # (_chunk_costs_jit); the rest (unprobed general shape
                # classes) stay eager so probe-and-latch still works.
                # All finals are coalesced below into ONE fetch.
                meta = (
                    _cost_chunk_meta(len(indices), M, N, scheme)
                    if COST_CHUNK_JIT
                    else None
                )
                if meta is not None:
                    cost_acc.append((
                        meta, tok_a, tok_b, m_true, n_true, indices,
                    ))
                    continue
                from .ops.fill_pallas import batch_final3

                deferred.append(
                    (
                        batch_final3(
                            jnp.asarray(tok_a),
                            jnp.asarray(tok_b),
                            cost_mat,
                            gap_id,
                            gap_open,
                            jnp.asarray(m_true),
                            jnp.asarray(n_true),
                        ),
                        indices,
                    )
                )
                continue
            elif (
                with_traceback
                and _use_pallas()
                and (tbm := (
                    _tb_chunk_meta(len(indices), M, N, scheme)
                    if TB_CHUNK_JIT
                    else None
                ))
                is not None
            ):
                # Fused path: the bucket's moves fills AND its share of
                # the chunk walk run inside one per-composition
                # executable; segments bounded like the mega-walk.
                _u, _g, _gp, _sb, w_b, tile_b = tbm
                ntiles = -(-len(indices) // tile_b)
                from .ops import fill_lanes as _fl

                tb_acc.append((
                    tbm, tok_a, tok_b, m_true, n_true, list(indices),
                    M, N,
                ))
                tb_acc_bytes += ntiles * _fl.lanes_moves_bytes(
                    tile_b, M, N, w_b
                )
                if tb_acc_bytes >= WALK_GROUP_BYTES:
                    _drain_tb_acc()
                continue
            elif (
                with_traceback
                and _use_pallas()
                and (tiles := _lanes_walk_fills(
                    tok_a, tok_b, cost_mat, gap_id, gap_open, m_true,
                    n_true, indices, pairs,
                ))
                is not None
            ):
                # Device-walked traceback: the move matrices never leave
                # HBM; tiles accumulate across buckets and walk in ONE
                # chunk-wide executable (bounded by WALK_GROUP_BYTES so
                # the blob keeps int32 indexing and the buffers fit).
                walk_acc.extend(tiles)
                walk_acc_bytes += sum(t.elems for t in tiles)
                if walk_acc_bytes >= WALK_GROUP_BYTES:
                    _drain_walks()
                continue
            elif (
                with_traceback
                and _use_pallas()
                and (got := _pallas_moves(
                    tok_a, tok_b, cost_mat, gap_id, gap_open, m_true, n_true
                ))
                is not None
            ):
                final3, moves = got
            else:
                res = fill_rows.row_fill_batch(
                    jnp.asarray(tok_a),
                    jnp.asarray(tok_b),
                    cost_mat,
                    gap_id,
                    gap_open,
                    jnp.asarray(m_true),
                    jnp.asarray(n_true),
                    want_moves=with_traceback,
                )
                final3 = np.asarray(res.final3)
                moves = np.asarray(res.moves) if with_traceback else None

        for row, idx in enumerate(indices):
            s1, s2 = pairs[idx]
            cost = int(final3[row].min())
            score = final_cost_to_score(
                cost=cost, m=len(s1), n=len(s2), max_score=scheme.max_score
            )
            if with_traceback:
                with _phase("traceback"):
                    tb = traceback_moves(
                        moves[row], s1, s2, final3[row], layout="row"
                    )
                assert tb.cost == cost
                results[idx] = PairResult(
                    cost=cost,
                    score=score,
                    seq_1_aligned=tb.seq_1_aligned,
                    middle_part=tb.middle_part,
                    seq_2_aligned=tb.seq_2_aligned,
                )
            else:
                results[idx] = PairResult(cost=cost, score=score)

    # Walk whatever remains accumulated (normally the whole call:
    # segments only split past WALK_GROUP_BYTES).
    _drain_tb_acc()
    _drain_walks()

    if cost_acc:
        # One fused dispatch for every accumulated cost bucket (meta is
        # the static composition signature; recurring compositions hit
        # the jit cache).
        with _phase("fill"):
            metas = tuple(b[0] for b in cost_acc)
            flat_arrs: list = []
            for _meta, ta, tb, mt, nt, _idx in cost_acc:
                flat_arrs += [
                    jnp.asarray(ta), jnp.asarray(tb),
                    jnp.asarray(mt), jnp.asarray(nt),
                ]
            fused = _chunk_costs_jit(
                cost_mat, gap_id, gap_open, *flat_arrs, meta=metas
            )
        # ONE deferred entry (per-bucket slices would re-pay the
        # per-op dispatch overhead this path exists to remove); rows
        # are already in accumulated-bucket order.
        deferred.append((
            fused,
            [i for *_rest, idx in cost_acc for i in idx],
        ))

    def _flush() -> list[PairResult]:
        _flush_pending()
        return results  # type: ignore[return-value]

    def _flush_pending() -> None:
        if walked_pending:
            _flush_walked()
        if deferred:
            _flush_deferred()

    def _flush_walked() -> None:
        from .ops.linear_tb import OP_LEFT, assemble_from_tapes
        from .utils import native

        # Four coalesced transfers for the whole call (tapes flattened
        # across buckets — their widths differ per bucket).
        with _phase("fetch"):
            vals_all = np.asarray(jnp.concatenate(
                [w[0] for w, _ in walked_pending], axis=0
            ))
            tapes_flat = np.asarray(jnp.concatenate(
                [w[1].reshape(-1) for w, _ in walked_pending]
            ))
            counts_all = np.asarray(jnp.concatenate(
                [w[2] for w, _ in walked_pending]
            ))
            jx_all = np.asarray(jnp.concatenate(
                [w[3] for w, _ in walked_pending]
            ))
        row = 0
        off = 0
        with _phase("traceback"):
            for (f3, tp, _c, _j), indices in walked_pending:
                # Segment arrays carry pad rows past len(indices)
                # (mega-walk quantization) — row/off advance by the
                # FULL shapes below.
                L = tp.shape[1]
                for k, idx in enumerate(indices):
                    s1, s2 = pairs[idx]
                    cost = int(vals_all[row + k].min())
                    score = final_cost_to_score(
                        cost=cost, m=len(s1), n=len(s2),
                        max_score=scheme.max_score,
                    )
                    cnt = int(counts_all[row + k])
                    tape = tapes_flat[off + k * L : off + k * L + cnt]
                    # Forward op order: the walk records from (m, n)
                    # upward and stops at row 0 with j_exit boundary
                    # LEFT moves remaining (reference
                    # globaligner.py:542-561) — prepend them, reverse
                    # the tape, render natively (the per-byte Python
                    # assembly measured ~260 us/pair at 1 kb).
                    jx = int(jx_all[row + k])
                    fwd = np.empty((jx + cnt,), np.uint8)
                    fwd[:jx] = OP_LEFT
                    fwd[jx:] = tape[::-1]
                    rendered = native.render_ops(fwd, s1, s2)
                    if rendered is None:  # pragma: no cover - no native
                        rendered = assemble_from_tapes([tape], s1, s2)
                    s1a, midl, s2a = rendered
                    results[idx] = PairResult(
                        cost=cost,
                        score=score,
                        seq_1_aligned=s1a,
                        middle_part=midl,
                        seq_2_aligned=s2a,
                    )
                row += f3.shape[0]
                off += tp.shape[0] * L

    def _flush_deferred() -> None:
        with _phase("fetch"):
            flat = np.asarray(
                jnp.concatenate([f for f, _ in deferred], axis=0)
            )
        row = 0
        for _, indices in deferred:
            for k, idx in enumerate(indices):
                s1, s2 = pairs[idx]
                cost = int(flat[row + k].min())
                score = final_cost_to_score(
                    cost=cost, m=len(s1), n=len(s2),
                    max_score=scheme.max_score,
                )
                results[idx] = PairResult(cost=cost, score=score)
            row += len(indices)

    if flush:
        return _flush()
    return PendingAlignments(_flush)


def alignment_to_pair_result(a: GotohAlignment) -> PairResult:
    return PairResult(
        cost=a.cost,
        score=a.score,
        seq_1_aligned=a.seq_1_aligned,
        middle_part=a.middle_part,
        seq_2_aligned=a.seq_2_aligned,
    )
