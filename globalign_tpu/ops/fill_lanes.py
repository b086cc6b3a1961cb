"""Cell-per-lane strip kernel: the latency-floor breaker for uniform schemes.

Every row-scan kernel in :mod:`fill_pallas` pays a fixed ~1 us serial
chain per DP row (the lane-doubling prefix-min: 7+ dependent cross-lane
rolls), so single-pair throughput plateaus near 18 GCUPS at 10 kb no
matter how the rows are batched or split (docs/PERF.md roofline study).
This kernel removes the prefix scan entirely:

* seq_2's columns are cut into ``w``-wide strips; strip ``s`` of every
  pair maps to one vector LANE of the ``(R, 128)`` state tiles (strip id
  = chunk * 128 + lane, same flattened order as the other kernels).
* Each strip advances ONE cell per step, row-major: an outer wave loop
  over DP rows with an unrolled inner loop over the ``w`` in-strip
  columns.  All state updates are elementwise int32 VPU ops over every
  strip at once — the only step-to-step dependency left is the
  horizontal Gotoh chain *within* a strip,

      Ix[i,j] = min(min(M, Iy)[i,j-1] + open, Ix[i,j-1]) + d,

  i.e. one ``min`` and one ``add`` of serial latency per step instead of
  a ~1 us scan per row.
* Adjacent strips exchange their one-column edges by a single lane shift
  per wave.  Strips are skewed TWO rows apart (strip s works row
  ``i - 2s`` during wave ``g = i - 1 + 2s``), so the shifted edge a strip
  consumes was produced a full wave earlier — cross-lane roll latency
  stays off the critical chain.
* The wavefront needs each strip's current seq_1 token.  Tokens enter at
  every pair's strip 0 (DMA-staged from an HBM inject table in
  ``_STAGE``-wave blocks) and ride the same per-wave lane shift down the
  strip pipeline — no gathers anywhere in the loop.
* Previous-row values (the vertical/diagonal inputs) live in two
  ``(w, R, 128)`` VMEM ring buffers indexed by the *static* unrolled
  phase — ``zbuf`` holds min(M,Ix,Iy) and ``vbuf`` holds
  min(M+open, Ix+open, Iy) of the row above, which is all the next row
  ever reads (reference recurrence: globaligner.py:366-392).

Per-pair true lengths are TRACED: a per-strip ``m_true`` splat gates a
masked read-modify-write of the output row (same idiom as the stacked
kernels), and ``n_true`` picks the final column on the host side.

Scheme support: uniform ("simple") schemes take the scalar fast path
(:func:`fill_pallas.uniform_scheme_params` family); GENERAL costing
matrices up to ``LANES_MAX_ALPHABET`` tokens (BLOSUM included) take the
select-chain mode — Mosaic has no per-lane gather, so the substitution
is an alphabet-deep chain of compare-selects over per-(phase, token)
tables, with per-row gap costs riding the inject stream (see
``_make_lane_kernel``).  Move codes stream in both modes.  Exactness is
pinned bit-for-bit against the ``fill_scan`` oracle and the row scan by
tests/test_fill_lanes.py.

Replaces the reference's interpreted fill (globaligner.py:366-392) on
the cost path for simple schemes.  Measured on v5e (within-one-run
slope A/B, docs/PERF.md): ~2x the meet-in-the-middle scan kernel on a
single 10 kb pair (~36 vs ~18 GCUPS), and 5-20x the stacked scan
kernel on the batch axis (64 x 1 kb: ~140-400 GCUPS vs 19 — the per-row
roll-throughput bound is gone; throughput scales with occupied
sublane tiles).
"""

from __future__ import annotations

import functools
import logging
import os
import weakref

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fill_scan import BIG
from .fill_pallas import LANES, _lane_ops

_logger = logging.getLogger(__name__)

DEFAULT_W = 8
_STAGE = 64  # inject rows staged per DMA block
MBLK = 8  # waves of move codes per outbound DMA block (moves mode)


# Small batches stage the inject stream as B interleaved BROADCAST
# (1, 128) planes selected by pair id in-kernel, instead of per-strip
# (R, 128) planes: the per-strip staging's dynamic-offset (R, 128) VMEM
# reads measured ~2x the whole per-wave budget at B=2 (within-run,
# docs/PERF.md), while a broadcast read + (nb-1) selects is a few ns.
INJ_BCAST_MAX_B = 4

# Hoist the (a_cur == k) token-compare masks out of the general-mode
# per-phase substitution select chain (they are phase-invariant: one set
# of asel-1 masks per wave instead of per phase).  Measured NEUTRAL on
# chip (within-run A/B 0.92-1.17x, scratch/micro_subhoist.py) — Mosaic
# already CSEs the recomputed compares; kept for the cheaper trace.
_SUB_MASK_HOIST = True

# Cost-only mode carries min(M, Iy) as ONE running value (and one fused
# left-edge ring) instead of M and Iy separately — the "my-carry"
# reformulation (round 4).  The neighbor edge triple is consumed only by
# the Ix chain as min(m, y) + go, and the cell minima regroup as
#
#     my = min(M, Iy);  z = min(my, Ix);  v = min(z + go, Iy)
#
# (the last identity needs gap_open >= 0, which cost space guarantees —
# config.SimpleCostingSettings rejects negative gap_open_cost, and the
# score->cost transform produces non-negative costs): one fewer ALU op
# per cell than the mx = min(M, Ix) grouping, one fewer cross-lane edge
# shift + ring store per wave.  Bit-exact vs the oracle at every cell
# (tests/test_fill_lanes.py pins both flag settings).  Moves mode keeps
# the (M, Ix, Iy) triple — the argmin codes compare the three levels
# individually.  Module-level toggle for within-run A/B.
_MYCARRY = True

# Drop the per-phase `where(active, ...)` strip-activity selects on
# waves where EVERY strip has started its rows (wave >= 2*(S_p - 1), a
# static bound): the wave loop splits into masked/unmasked x
# light/capture regimes — 2 selects per phase saved on ~98% of batch
# waves (fori_loop bounds are traced; empty regimes cost nothing at run
# time).  Module-level toggle for within-run A/B.
_ACTIVE_SPLIT = True

# Per-strip-staged fills (Rw == R) can carry each strip's seq_1 token
# PRE-SKEWED in the inject stream (plane[g][s] = tok_a[pair, g+1-2q])
# instead of shifting it across lanes every wave: drops one of the 4
# per-wave shift1 edge exchanges plus the ah ring traffic, for the
# same stage read the kernel already performs.  MEASURED A WASH on
# chip (scratch/micro_skew.py, slice-built inject, within-run A/B):
# 64x1kb 59.5 vs 58.0, 32x4kb 161.6 vs 157.3, 512x1kb 63.3 vs 64.1,
# general 16x4kb 79.0 vs 80.4 GCUPS — the dropped shift was hidden
# under the other three's serialization, the same
# not-actually-ALU-bound wall the dual-set kernel hit.  Kept as
# chip-validated A/B infrastructure (bit-exact in every mode,
# including the moves code stream's consumed cells); default OFF.
_SKEW_INJECT = False


# Bitmask substitution engages when the select chain is at least this
# many times the per-bit extract cost: the chain costs ~1 select per
# alphabet char, the extract ~3-4 ops per cost bit (shift, and, shl,
# add), measured 7.2 ns/select vs 28 ns/bit in isolation
# (scratch/micro_varshift.py) — so bitmask wins when asel > ~4*bits.
SUB_BITS_GAIN = 4

_sub_bits_cache: dict = {}


def sub_bits_for(cost_mat) -> int:
    """Static bitmask width for the general-substitution fast path.

    Returns ceil(log2(max_cost + 1)) when ``cost_mat`` is CONCRETE,
    non-negative, and the bitmask extract beats the select chain
    (``asel > SUB_BITS_GAIN * bits``); 0 (select chain) otherwise —
    including for traced values, where the maximum cannot be read.
    Device arrays are fetched at most once per distinct array (id-keyed
    weakref cache): dispatchers call this per align/chunk and a ~35 ms
    tunnel round trip per call would dominate small fills.  A Mosaic
    rejection of the bitmask kernel latches the shape class like any
    other general-lane failure (scan fallback; the select chain is not
    re-tried — on toolchains where variable-amount vector shifts
    compile, verified here, the two modes stand or fall together)."""
    if cost_mat is None or isinstance(cost_mat, jax.core.Tracer):
        return 0
    key = id(cost_mat)
    hit = _sub_bits_cache.get(key)
    if hit is not None and hit[0]() is cost_mat:
        return hit[1]
    arr = np.asarray(cost_mat)
    bits = 0
    if arr.size and int(arr.min()) >= 0:
        b = max(1, int(arr.max()).bit_length())
        if int(arr.shape[0]) > SUB_BITS_GAIN * b:
            bits = b
    if len(_sub_bits_cache) > 64:  # matrices are few; bound the cache
        _sub_bits_cache.clear()
    try:
        _sub_bits_cache[key] = (weakref.ref(cost_mat), bits)
    except TypeError:  # np.matrix etc. — not weakref-able; skip cache
        pass
    return bits


def _sub_mask_planes(ct, nbits):
    """Pack per-(phase, a-token) cost planes into per-(phase, bit)
    BITMASK planes: mask_j bit k = bit j of cost(k, b).  ``ct`` is
    (asel, ...); returns (nbits, ...) int32 where the kernel recovers
    cost(a, b) as sum_j ((mask_j >> a) & 1) << j — ceil(log2(maxcost))
    per-lane variable shifts instead of an asel-deep select chain
    (scratch/micro_varshift.py: Mosaic compiles vector-amount shifts;
    1.22x the chain in isolation at A=25, and the staged table shrinks
    asel/nbits-fold).  Caller must guarantee every value fits nbits
    (the dispatch layer checks the CONCRETE matrix; traced values here
    would silently truncate)."""
    asel = ct.shape[0]
    weights = (jnp.int32(1) << jnp.arange(asel, dtype=jnp.int32))
    weights = weights.reshape((asel,) + (1,) * (ct.ndim - 1))
    return jnp.stack(
        [jnp.sum(((ct >> j) & 1) * weights, axis=0) for j in range(nbits)]
    )


def _make_lane_kernel(
    w: int, R: int, S_p: int, Rw: int, clamp: bool, moves: bool = False,
    asel: int = 0, nb: int = 1, sub_bits: int = 0, npar: int = 1,
    skew: bool = False,
):
    """Build the kernel for ``w``-wide strips, ``R`` lane-chunks of
    strips, ``S_p`` strips per pair, inject tile width ``Rw``.

    ``npar`` > 1 processes that many INDEPENDENT same-shape tile sets
    per wave, their per-phase DP chains interleaved (round 5): every
    per-set ring/buffer/table gets its own planes; only the inject DMA,
    the wave loop, and the scheme scalars are shared.  Cost-only
    (moves asserts npar == 1).  MEASURED OUTCOME: a skeleton kernel
    promised ~1.77x (two interleaved chains cost 1.11-1.13x one,
    scratch/micro_wavecost.py `fullpair`), but the REAL dual kernel
    LOSES on chip — 64x4kb 145.7 vs 157.0 GCUPS for two single R=8
    calls, 512x1kb 61.2 vs 81.7, bit-exact throughout
    (scratch/micro_dual.py).  The real phase body's ~4 VMEM scratch
    accesses per phase (vbuf/zbuf/btab/out) double with the second set
    while the skeleton carried only 2: the production kernel is
    SCRATCH-BANDWIDTH-bound, not chain-latency-bound, so no interleave
    win exists (same wall the R=16 single call hit,
    scratch/micro_tilecap8.py).  npar=2 stays as chip-validated A/B
    infrastructure; dispatch never selects it.

    ``asel`` > 0 enables GENERAL costing matrices (alphabet size asel,
    any substitution/gap structure, traced values): substitution costs
    come from a per-(phase, token) table via an asel-deep select chain
    — or, with ``sub_bits`` > 0, from per-(phase, bit) BITMASK planes
    via ``sub_bits`` per-lane variable shifts (``ctab_ref``/``itab_ref``
    then hold the packed masks of :func:`_sub_mask_planes`; the
    dispatch layer guarantees every cost fits ``sub_bits`` bits) —
    the per-column gap-extension from ``dtab``, the per-ROW
    gap-extension from a select chain over the already-pipelined seq_1
    token (``itab`` scalars), and the column-0 Iy boundary from a
    per-wave accumulator seeded by ``c0t_ref`` — so the inject stream
    carries the token plane ONLY, exactly like the uniform mode (an
    earlier 4-plane inject stream measured ~4x the per-wave budget on
    the batch axis; dynamic-indexed per-strip stage reads are the
    dominant per-wave cost, docs/PERF.md).  asel == 0 is the
    uniform-scheme fast path (2 ops for substitution instead of
    2*asel, scalar gap costs).

    ``clamp`` keeps the per-phase ``min(..., BIG)`` saturation of the
    oracle recurrence; the host drops it (2 fewer VPU ops per cell)
    whenever ``BIG + path-cost headroom`` provably fits int32 — the
    clamp only ever binds on values a BIG boundary seeded, and those
    stay bit-identical at every reachable cell either way.

    ``moves`` additionally emits the packed argmin codes of every cell
    (same bit layout and M > Ix > Iy tie order as ops/fill_rows.py,
    reference traceback semantics globaligner.py:395-593): codes for a
    cell's three DP levels are assembled from (a) the diagonal
    predecessor's min3-argmin, carried in code buffers that travel
    exactly like ``zbuf``/``zh``, (b) the in-phase Ix candidate
    comparison, and (c) the above-cell's gap-open argmin carried like
    ``vbuf``.  Codes stream to HBM in ``MBLK``-wave double-buffered
    uint8 blocks in the kernel's skewed (wave, phase, strip) layout;
    the host unskews to the row-major (m+1, ncols) walk layout.  Codes
    of cells whose value involved a BIG boundary can differ from the
    clamped row kernel's (no optimal path visits one — same caveat as
    fill_pallas's stacked moves kernel)."""

    # Inject planes per wave: the seq_1 token only (both modes).  With
    # broadcast staging (Rw == 1, nb pairs) each wave carries nb rows —
    # one (1, 128) row per pair, selected by pair id in-kernel; npar
    # sets stack their rows per wave (set t at +t*IP*nb).
    assert npar == 1 or not moves, "dual-set kernel is cost-only"
    IP = 1
    IPW = IP * nb * npar  # inject rows per wave (all sets)
    wb = max(w - 1, 1)  # zbuf planes per set
    mycarry = _MYCARRY and not moves  # fused min(M, Iy) carry + edge ring

    def kernel(*refs):
        refs = list(refs)
        (params_ref, btab_ref, mtrue_ref, zrow_ref, vrow_ref,
         zj0_ref, c0t_ref) = refs[:7]
        del refs[:7]
        if asel > 0:
            ctab_ref, dtab_ref, itab_ref = refs[:3]
            del refs[:3]
        if moves:
            zcrow_ref, vcrow_ref, zcj0_ref = refs[:3]
            del refs[:3]
        inj_hbm = refs.pop(0)
        out_ref = refs.pop(0)
        if moves:
            mv_hbm = refs.pop(0)
        ah, emh, exh, eyh, zh, zbuf_s, vbuf_s = refs[:7]
        del refs[:7]
        if asel > 0:
            c0acc = refs.pop(0)  # (R, 128) column-0 Iy accumulator
        stage_s, sems = refs[:2]
        del refs[:2]
        if moves:
            zcb, vcb, zch, mst, osems = refs
        # params_ref: (1, 7) SMEM — waves G, gap_open, cmatch, cmismatch,
        #   dcost, icost, m_min
        # btab_ref: (w, R, 128) VMEM — seq_2 token of strip s, phase p
        # mtrue_ref: (R, 128) VMEM — per-strip m_true (-1 on pad strips)
        # zrow_ref / vrow_ref: (w, R, 128) VMEM — the ROW-0 boundary's
        #   min3 / gap-opened min per strip column (the host builds them
        #   from the global boundary formulas, or from an injected
        #   checkpoint row for block replays)
        # zj0_ref: (R, 128) VMEM — row-0 min3 at each strip's col j0
        #   (the phase-0 diagonal of row 1; pair corners included)
        # c0t_ref: (R, 128) VMEM — per-pair column-0 Iy seed (gap_open
        #   globally; the block-top Iy for injected blocks):
        #   Iy(i, 0) = c0t + i*icost
        # zcrow_ref / vcrow_ref / zcj0_ref (moves): argmin-code twins
        # inj_hbm: (G_rows, Rw, 128) int32 HBM — per-wave seq_1 tokens
        #   entering at each pair's strip 0
        # out_ref: (3, w, R, 128) VMEM — (M, Ix, Iy) of row m_true
        # mv_hbm (moves): (NB*MBLK*w, R, 128) uint8 HBM — packed codes,
        #   row blk*MBLK*w + grem*w + p = wave blk*MBLK+grem, phase p
        # ah: (2, R, 128) scratch ring — seq_1 token pipeline; slot g%2
        #   holds wave g-2's value until wave g overwrites it (read
        #   before write), so no per-wave copy-rotation is needed
        # emh/exh/eyh: (2, R, 128) end-of-row edge history rings
        # zh: (3, R, 128) end-of-row min3 ring (g-3 at slot g%3)
        # zbuf_s: (w-1, R, 128) — prev-row min3, slot k = local col k+1;
        #   the strip's LAST column travels via zh instead
        # vbuf_s: (w, R, 128) — prev-row min(M+go,Ix+go,Iy), same slots
        # stage_s: (2, _STAGE, Rw, 128) inject DMA double buffer
        # sems: inject DMA semaphores (2,)
        # zcb/vcb/zch (moves): argmin-code twins of zbuf/vbuf/zh
        # mst (moves): (2*MBLK*w, R, 128) uint8 outbound double buffer
        # osems (moves): outbound DMA semaphores (2,)
        G = params_ref[0, 0]
        go = params_ref[0, 1]
        cmatch = params_ref[0, 2]
        cmismatch = params_ref[0, 3]
        d = params_ref[0, 4]
        ic = params_ref[0, 5]
        m_min = params_ref[0, 6]

        lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        s_t = row * LANES + lane  # flat strip id
        q_t = jax.lax.rem(s_t, S_p)  # strip index within its pair
        if nb > 1:
            pair_t = jax.lax.div(s_t, S_p)  # broadcast-inject selector
        q0 = q_t == 0
        j0_t = q_t * w  # pair-local column before the strip's first
        mtrue = [mtrue_ref[t] for t in range(npar)]
        big = jnp.full((R, LANES), BIG, jnp.int32)

        shift1, _, _, _ = _lane_ops(lane, row)

        # Row-0 boundary seeds: z(0,j) = go + j*d, v(0,j) = 2*go + j*d
        # (j >= 1; reference make_dp_array, globaligner.py:756-821).
        for t in range(npar):
            for p in range(w):
                if p < w - 1:
                    zbuf_s[t * wb + p] = zrow_ref[t * w + p]
                    if moves:
                        zcb[p] = zcrow_ref[p]
                vbuf_s[t * w + p] = vrow_ref[t * w + p]
                if moves:
                    vcb[p] = vcrow_ref[p]
                # Row-0 output seeds (returned only for m_true == 0
                # pairs, which injected-boundary callers never pass):
                # (BIG, Ix, BIG); Ix(0, j) == min3(0, j) globally.
                out_ref[0, t * w + p] = big
                out_ref[1, t * w + p] = zrow_ref[t * w + p]
                out_ref[2, t * w + p] = big

        if asel > 0:
            # Column-0 Iy accumulator: c0y(0) = the pair's c0 seed
            # (gap_open globally, the block-top Iy when injected).
            for t in range(npar):
                c0acc[t] = c0t_ref[t]

        def dma(blk, slot):
            return pltpu.make_async_copy(
                inj_hbm.at[pl.ds(blk * _STAGE * IPW, _STAGE * IPW)],
                stage_s.at[slot],
                sems.at[slot],
            )

        dma(0, 0).start()
        dma(1, 1).start()

        if moves:

            def odma(blk, slot):
                return pltpu.make_async_copy(
                    mst.at[pl.ds(slot * MBLK * w, MBLK * w)],
                    mv_hbm.at[pl.ds(blk * MBLK * w, MBLK * w)],
                    osems.at[slot],
                )

        def make_wave(do_capture, masked=True):
            def wave(g, _):
                blk = jax.lax.div(g, _STAGE)
                slot = jax.lax.rem(blk, 2)

                @pl.when(jax.lax.rem(g, _STAGE) == 0)
                def _stage():
                    dma(blk, slot).wait()

                    @pl.when(blk >= 1)
                    def _next():
                        # Block blk-1 is fully consumed; its slot is free.
                        dma(blk + 1, jax.lax.rem(blk + 1, 2)).start()

                def plane(ts):
                    # Set ts's token plane this wave (IP == 1): rows
                    # per wave are [set0 pair0.., set1 pair0..].
                    base = jax.lax.rem(g, _STAGE) * IPW + ts * IP * nb
                    if Rw != 1:
                        return stage_s[slot, base]
                    v = jnp.broadcast_to(
                        stage_s[slot, base], (R, LANES)
                    )
                    # Broadcast staging: pair b's group of IP planes
                    # sits at rows b*IP; select each strip's pair's
                    # value.
                    for b in range(1, nb):
                        vb = jnp.broadcast_to(
                            stage_s[slot, base + b * IP], (R, LANES)
                        )
                        v = jnp.where(pair_t == b, vb, v)
                    return v

                i_t = (g + 1) - 2 * q_t  # this strip's DP row this wave
                # Unmasked regimes (wave >= 2*(S_p - 1)) have every
                # strip past row 1, so activity never gates a store.
                active = i_t >= 1 if masked else None
                g2 = jax.lax.rem(g, 2)
                g3 = jax.lax.rem(g, 3)

                if moves:
                    mblk = jax.lax.div(g, MBLK)
                    mslot = jax.lax.rem(mblk, 2)
                    mrem = jax.lax.rem(g, MBLK)

                    @pl.when((mrem == 0) & (mblk >= 2))
                    def _mv_slot_free():
                        # The copy that used this slot (block mblk-2)
                        # must have drained before we overwrite it.
                        odma(mblk - 2, mslot).wait()

                # Per-set wave-entry state: edges from the left
                # neighbor, produced >= 1 wave ago (the 2-row skew), or
                # the column-0 boundary for strip 0 of each pair:
                # (BIG, BIG, go + i*ic), diag z(i-1, 0).  Ring slot
                # 2*t+g2 still holds wave g-2's value (3*t+g3 -> g-3)
                # because this wave's store happens after the read.
                a_cur = [None] * npar
                ic_cur = [None] * npar
                amask = [None] * npar
                myp0 = [None] * npar
                mp0 = [None] * npar
                xp0 = [None] * npar
                yp0 = [None] * npar
                zdiag0 = [None] * npar
                for t in range(npar):
                    if skew:
                        # Pre-skewed inject (_SKEW_INJECT): the stage
                        # plane already carries tok_a[pair, i_t] per
                        # strip — no cross-lane shift, no ah ring.
                        a_cur[t] = plane(t)
                    else:
                        a_cur[t] = jnp.where(
                            q0, plane(t), shift1(ah[2 * t + g2], fill=0)
                        )
                    if not mycarry:
                        mp0[t] = jnp.where(
                            q0, big, shift1(emh[2 * t + g2])
                        )
                    xp0[t] = jnp.where(q0, big, shift1(exh[2 * t + g2]))
                    if asel == 0:
                        ic_cur[t] = ic
                        c0y_i = c0t_ref[t] + i_t * ic
                        c0y_im1 = c0t_ref[t] + (i_t - 1) * ic
                    else:
                        # Per-row gap-extension from the pipelined
                        # token (itab scalar chain — no extra inject
                        # plane); column-0 Iy accumulates in scratch,
                        # seeded from c0t_ref, and is consumed at q0
                        # lanes only (other lanes hold garbage sums,
                        # never read).
                        if sub_bits:
                            icc = (itab_ref[0, 0] >> a_cur[t]) & 1
                            for j in range(1, sub_bits):
                                icc = icc + (
                                    ((itab_ref[0, j] >> a_cur[t]) & 1)
                                    << j
                                )
                        else:
                            amask[t] = (
                                [a_cur[t] == k for k in range(1, asel)]
                                if _SUB_MASK_HOIST
                                else None
                            )
                            icc = jnp.full(
                                (R, LANES), itab_ref[0, 0], jnp.int32
                            )
                            for k in range(1, asel):
                                icc = jnp.where(
                                    amask[t][k - 1]
                                    if amask[t]
                                    else a_cur[t] == k,
                                    itab_ref[0, k],
                                    icc,
                                )
                        ic_cur[t] = icc
                        c0y_im1 = c0acc[t]
                        c0y_i = c0y_im1 + icc
                        c0acc[t] = c0y_i
                    if mycarry:
                        # emh holds the published min(m, y) edge; at
                        # the q0 boundary min(BIG, c0y_i) == c0y_i.
                        myp0[t] = jnp.where(
                            q0, c0y_i, shift1(emh[2 * t + g2])
                        )
                    else:
                        yp0[t] = jnp.where(
                            q0, c0y_i, shift1(eyh[2 * t + g2])
                        )
                    zdiag0[t] = jnp.where(
                        i_t == 1,
                        zj0_ref[t],
                        jnp.where(q0, c0y_im1, shift1(zh[3 * t + g3])),
                    )
                if moves:
                    # Diagonal predecessor's min3-argmin for phase 0:
                    # row 1 reads the row-0 code table (corners
                    # included), column 0's triple is (BIG, BIG, Iy) ->
                    # Iy; interior comes from the left neighbor's
                    # last-column code ring.
                    czd0 = jnp.where(
                        i_t == 1,
                        zcj0_ref[:, :],
                        jnp.where(q0, 2, shift1(zch[g3])),
                    )

                # In the unmasked regimes every strip has i_t >= 1, so
                # pad/mtrue == -1 strips still never hit and the row-0
                # seeds of m_true == 0 pairs cannot be overwritten
                # (those hit only at i_t == 0, which requires a masked
                # wave).
                hit = [
                    (i_t == mtrue[t]) & active
                    if masked
                    else i_t == mtrue[t]
                    for t in range(npar)
                ]
                # Per-set phase carries; the p-loop interleaves sets
                # (t inner) so each set's ~5-op chain issues into the
                # other's latency stalls.
                if mycarry:
                    myp, xp = list(myp0), list(xp0)
                    mp = yp = [None] * npar
                else:
                    mp, xp, yp = list(mp0), list(xp0), list(yp0)
                z_prev = list(zdiag0)  # placeholder; overwritten at p=0
                cz_prev = None
                for p in range(w):
                  for t in range(npar):
                    zdiag = (
                        zdiag0[t] if p == 0 else zbuf_s[t * wb + p - 1]
                    )
                    vprev = vbuf_s[t * w + p]
                    if asel == 0:
                        sub = jnp.where(
                            a_cur[t] == btab_ref[t * w + p],
                            cmatch, cmismatch,
                        )
                        d_p = d
                    elif sub_bits:
                        # General substitution, bitmask mode: recover
                        # cost(a_cur, b_{s,p}) bit-by-bit from the
                        # packed mask planes by per-lane variable
                        # shifts (sub_bits ops vs asel selects).
                        base_c = (t * w + p) * sub_bits
                        sub = (ctab_ref[base_c] >> a_cur[t]) & 1
                        for j in range(1, sub_bits):
                            sub = sub + (
                                ((ctab_ref[base_c + j] >> a_cur[t])
                                 & 1) << j
                            )
                        d_p = dtab_ref[t * w + p]
                    else:
                        # General substitution: select-chain over the
                        # token values (ctab[p, k] = cost(k, b_{s,p}));
                        # the compare masks are the per-wave hoisted
                        # set.
                        base_c = (t * w + p) * asel
                        sub = ctab_ref[base_c]
                        for k in range(1, asel):
                            sub = jnp.where(
                                amask[t][k - 1]
                                if amask[t]
                                else a_cur[t] == k,
                                ctab_ref[base_c + k],
                                sub,
                            )
                        d_p = dtab_ref[t * w + p]
                    m_new = zdiag + sub
                    y_new = vprev + ic_cur[t]
                    mpgo = (
                        myp[t] if mycarry else jnp.minimum(mp[t], yp[t])
                    ) + go
                    x_new = jnp.minimum(mpgo, xp[t]) + d_p
                    if mycarry:
                        # Regrouped minima: my doubles as the next
                        # phase's carry, and v = min(z + go, y) ==
                        # min(min(m, x) + go, y) for go >= 0 (when
                        # y < min(m, x) both sides reduce to y).
                        my_new = jnp.minimum(m_new, y_new)
                        z_new = jnp.minimum(my_new, x_new)
                        v_new = jnp.minimum(z_new + go, y_new)
                    else:
                        mx = jnp.minimum(m_new, x_new)
                        z_new = jnp.minimum(mx, y_new)
                        v_new = jnp.minimum(mx + go, y_new)
                    if moves:
                        czdiag = czd0 if p == 0 else zcb[p - 1]
                        cvprev = vcb[p]
                        # Ix candidates (M+go, Ix, Iy+go)+d at (i, j-1),
                        # tie order M > Ix > Iy (fill_rows.py code_x).
                        cmgo = mp[t] + go
                        cygo = yp[t] + go
                        c_x = jnp.where(
                            (cmgo <= xp[t]) & (cmgo <= cygo),
                            0,
                            jnp.where(xp[t] <= cygo, 1, 2),
                        )
                        code = czdiag + 4 * c_x + 16 * cvprev
                        mst[mslot * MBLK * w + mrem * w + p] = code.astype(
                            jnp.uint8
                        )
                        c_z = jnp.where(
                            m_new == z_new,
                            0,
                            jnp.where(x_new == z_new, 1, 2),
                        )
                        c_v = jnp.where(
                            m_new + go == v_new,
                            0,
                            jnp.where(x_new + go == v_new, 1, 2),
                        )
                        if p >= 1:
                            zcb[p - 1] = (
                                jnp.where(active, cz_prev, czdiag)
                                if masked else cz_prev
                            )
                        vcb[p] = (
                            jnp.where(active, c_v, cvprev)
                            if masked else c_v
                        )
                        cz_prev = c_z
                    if clamp:
                        z_new = jnp.minimum(z_new, BIG)
                        v_new = jnp.minimum(v_new, BIG)
                    if p >= 1:
                        # The slot just read as zdiag now takes this
                        # row's value for the same column (computed
                        # last phase).
                        zbuf_s[t * wb + p - 1] = (
                            jnp.where(active, z_prev[t], zdiag)
                            if masked else z_prev[t]
                        )
                    vbuf_s[t * w + p] = (
                        jnp.where(active, v_new, vprev)
                        if masked else v_new
                    )
                    if do_capture:
                        op = t * w + p
                        out_ref[0, op] = jnp.where(
                            hit[t], m_new, out_ref[0, op]
                        )
                        out_ref[1, op] = jnp.where(
                            hit[t], x_new, out_ref[1, op]
                        )
                        out_ref[2, op] = jnp.where(
                            hit[t], y_new, out_ref[2, op]
                        )
                    if mycarry:
                        myp[t], xp[t], z_prev[t] = my_new, x_new, z_new
                    else:
                        mp[t], xp[t], yp[t], z_prev[t] = (
                            m_new, x_new, y_new, z_new,
                        )

                # Publish wave g into the rings (read slots free now).
                for t in range(npar):
                    zh[3 * t + g3] = z_prev[t]
                    if mycarry:
                        emh[2 * t + g2] = myp[t]
                        exh[2 * t + g2] = xp[t]
                    else:
                        emh[2 * t + g2] = mp[t]
                        exh[2 * t + g2] = xp[t]
                        eyh[2 * t + g2] = yp[t]
                    if not skew:
                        ah[2 * t + g2] = a_cur[t]
                if moves:
                    zch[g3] = cz_prev

                    @pl.when(mrem == MBLK - 1)
                    def _mv_flush():
                        odma(mblk, mslot).start()

                return 0

            return wave

        # No strip can hit its m_true row before wave m_min - 1, so the
        # prefix of the wave range runs a light body with no output
        # read-modify-write at all — 3x(load, select, store) per phase
        # saved on ~(m_min / G) of the waves (~89% for a square
        # single pair).  SEQUENTIAL uniform fori_loops keep Mosaic's
        # software pipelining (a per-wave pl.when branch measured 5x
        # slower than this).  The _ACTIVE_SPLIT refinement additionally
        # separates the waves where some strip is still waiting to start
        # (g < 2*(S_p - 1), a STATIC bound) from the all-active steady
        # state, whose body drops the per-phase activity selects; the
        # four regime boundaries are traced, so empty regimes cost one
        # trip test at run time.
        cap_lo = jnp.clip(m_min - 1, 0, G)
        act = 2 * (S_p - 1)  # static: all strips active at wave >= act
        if not _ACTIVE_SPLIT or act == 0:
            # S_p == 1 starts every strip at wave 0 — the masked bodies
            # would never run, so don't trace them.  With the split
            # toggled off, keep the original always-masked bodies (the
            # A/B contender).
            masked = not _ACTIVE_SPLIT or act != 0
            jax.lax.fori_loop(0, cap_lo, make_wave(False, masked), 0)
            jax.lax.fori_loop(cap_lo, G, make_wave(True, masked), 0)
        else:
            act_c = jnp.minimum(jnp.int32(act), G)
            s1 = jnp.minimum(act_c, cap_lo)
            s3 = jnp.maximum(act_c, cap_lo)
            jax.lax.fori_loop(0, s1, make_wave(False, True), 0)
            jax.lax.fori_loop(s1, cap_lo, make_wave(False, False), 0)
            jax.lax.fori_loop(cap_lo, s3, make_wave(True, True), 0)
            jax.lax.fori_loop(s3, G, make_wave(True, False), 0)

        # Drain the last prefetched block before the kernel retires.
        lastblk = jax.lax.div(jnp.maximum(G - 1, 0), _STAGE) + 1
        dma(lastblk, jax.lax.rem(lastblk, 2)).wait()

        if moves:
            # Flush the final partial code block, then drain the up-to-
            # two outbound copies the in-loop waits never consumed (the
            # wait at block b's first wave covers block b-2).
            nfull = jax.lax.div(G, MBLK)
            nblk = jax.lax.div(G + MBLK - 1, MBLK)

            @pl.when(jax.lax.rem(G, MBLK) != 0)
            def _mv_tail():
                odma(nfull, jax.lax.rem(nfull, 2)).start()

            @pl.when(nblk >= 2)
            def _mv_drain2():
                odma(nblk - 2, jax.lax.rem(nblk - 2, 2)).wait()

            odma(nblk - 1, jax.lax.rem(nblk - 1, 2)).wait()

    return kernel


def _lanes_geometry(
    B: int, n_pad: int, w: int, moves: bool = False
) -> tuple[int, int]:
    """(strips per pair, lane-chunks R) for padded seq_2 length n_pad.

    In moves mode R is 8-aligned: Mosaic requires uint8 DMA slices to be
    tiling-aligned on the chunk axis (same constraint as
    fill_pallas._stacked_r).  Extra chunks are pad strips (pair >= B),
    masked like any other pad strip."""
    S_p = max(1, -(-n_pad // w))
    R = max(1, -(-(B * S_p) // LANES))
    if moves:
        R = -(-R // 8) * 8
    return S_p, R


def lanes_vmem_bytes(
    B: int, n_pad: int, w: int = DEFAULT_W, moves: bool = False,
    asel: int = 0, sub_bits: int = 0,
) -> int:
    """Approximate kernel VMEM working set (budget check for dispatch)."""
    S_p, R = _lanes_geometry(B, n_pad, w, moves)
    nb = B if 1 < B <= INJ_BCAST_MAX_B else 1
    Rw = 1 if (B == 1 or nb > 1) else R
    tile = R * LANES * 4
    # 11 ring/history scratch + zbuf/vbuf (2w-1) + out (3w) + btab (w)
    # + mtrue (1) + boundary-table inputs zrow/vrow/zj0/c0t (2w+2).
    total = (14 + 8 * w) * tile + 2 * _STAGE * nb * Rw * LANES * 4
    if moves:
        # Code twins of zbuf/vbuf/zh (2w+2), their boundary-table
        # inputs zcrow/vcrow/zcj0 (2w+1), and the uint8 staging.
        total += (4 * w + 3) * tile + 2 * MBLK * w * R * LANES
    if asel > 0:
        # General mode: ctab + dtab + the c0acc accumulator (the inject
        # stage carries the same single token plane as uniform mode).
        # The bitmask mode stages (w * sub_bits) packed mask planes
        # instead of the (w * asel) chain table.
        planes = sub_bits if sub_bits > 0 else asel
        total += (w * planes + w + 1) * tile
    return total


# Per-kernel VMEM allowance (same scoped-VMEM ceiling the stacked
# kernels budget against, fill_pallas.STACKED_VMEM_BUDGET rationale).
LANES_VMEM_BUDGET = 12 * 1024 * 1024


def _w_candidates(
    B: int, n_pad: int, moves: bool = False, asel: int = 0,
    sub_bits: int = 0,
) -> tuple[int, ...]:
    """Strip-width candidates: powers of two plus the width that fills
    the 8 sublanes exactly (strips ~ 1024, every VPU op one (8, 128)
    tile — the issue-bound optimum).

    Uniform cost mode allows up to w=128 (round 4): the measured
    (B, L, w) grid (scratch/micro_batch_bsweep2.py, micro_tilecap.py,
    micro_wrule*.py) shows wider strips keep winning while >= 4
    lane-chunks stay busy — 64 x 1 kb measured 27 GCUPS at the old w=32
    cap, 45 at w=64, 61 at w=128, bit-exact on ragged batches
    (scratch/micro_w64.py); Mosaic code size stays sane (w=128 compiles
    in ~7 s).  Moves mode is capped at 32 for uniform schemes and the
    select chain (the kernel unrolls w phases twice — light + capture —
    and the wider skewed buffer grows the uint8 stream), but BITMASK
    general moves admit w=64: measured 1.5x at 16 x 4 kb (51.6-56.9 vs
    35.5-36.4 GCUPS; w=32 still wins at 32 x 1 kb — the model ranks
    per shape) with code size w*sub_bits*2 = 512 phases, well under the
    chain budget (scratch/micro_moves_w_bits.py, round 5).  General
    cost mode (asel > 0): the occupancy lever transfers (A=25: w=64 at
    23.9 GCUPS vs w=32's 21; A=5: w=128 at 50-53 vs w=32's 26 —
    scratch/micro_general_w64.py, bit-exact, ~7 s compiles), but the
    unrolled select-chain code grows as w x asel (twice), so widths
    are admitted while w*asel stays within the measured-safe budget
    (128x5=640 and 64x25=1600 both compiled in seconds; 128x25=3200 is
    unmeasured and excluded)."""
    if moves:
        cap = 64 if (asel > 0 and sub_bits > 0) else 32
    elif asel > 0:
        cap = 32
        for wide in (64, 128):
            if wide * asel <= 1664:  # 64 x 26 (LANES_MAX_ALPHABET)
                cap = wide
    else:
        cap = 128
    w_full = min(cap, max(4, -(-B * n_pad // 1024)))
    cands = {4, 8, 16, 32, w_full}
    for wide in (64, 128):
        if wide <= cap:
            cands.add(wide)
    return tuple(sorted(cands))


# Perf-model constants, calibrated on ONE v5e through the dev tunnel
# (the measured w-sweeps in docs/PERF.md).  Module-level on purpose: a
# different TPU generation or toolchain may shift these ratios, so they
# are perturbable (tests pin that dispatch self-reports the change) and
# checkable against live timings via :func:`model_rank_selfcheck`.
ISSUE_PHASE_OPS = 17  # vector ops per (phase x sublane-tile)
ISSUE_SELECT_OPS = 2  # extra ops per alphabet char (general mode)
ISSUE_WAVE_OPS = 15  # per-wave overhead ops
LATENCY_WAVE_COST = 41  # fixed per-wave units (~185 ns vs ~4.5 ns/pt)

# Set GLOBALIGN_DEBUG_DISPATCH=1 to log every lanes_plan /
# lanes_split_plan decision with its model cost (INFO level).
_DEBUG_DISPATCH_ENV = "GLOBALIGN_DEBUG_DISPATCH"


def _debug_dispatch() -> bool:
    return bool(os.environ.get(_DEBUG_DISPATCH_ENV))


# Ops per cost BIT for the bitmask substitution extract (shift, and,
# shl, add — scratch/micro_varshift.py).
ISSUE_SUBBITS_OPS = 4


def _issue_cost(
    B: int, m: int, n_pad: int, w: int, moves: bool, asel: int = 0,
    sub_bits: int = 0,
) -> int:
    """Issue-bound instruction model: waves x (phases x ops x
    sublane-tiles + per-wave overhead).  Constants validated against
    the measured w-sweep at 1 kb / 10 kb on v5e (docs/PERF.md).
    General matrices add a 2-op select per alphabet character; the
    bitmask mode (``sub_bits`` > 0) replaces the chain with
    ~ISSUE_SUBBITS_OPS ops per cost bit."""
    if sub_bits > 0:
        c_phase = ISSUE_PHASE_OPS + ISSUE_SUBBITS_OPS * sub_bits
    else:
        c_phase = ISSUE_PHASE_OPS + ISSUE_SELECT_OPS * asel
    c_wave = ISSUE_WAVE_OPS
    S_p, R = _lanes_geometry(B, n_pad, w, moves)
    tiles = -(-R // 8)
    return (m + 2 * (S_p - 1)) * (w * c_phase * tiles + c_wave)


def issue_model_ops(
    B: int, m: int, n_pad: int, w: int, moves: bool = False,
    asel: int = 0, sub_bits: int = 0,
) -> int:
    """Modeled total VPU ops for ONE lane-kernel fill call — the
    numerator of the bench artifact's per-arm ``issue_efficiency``
    (modeled ops/s divided by the in-run VPU calibration rate)."""
    return _issue_cost(B, m, n_pad, w, moves, asel, sub_bits)


# Occupancy bounds for the round-4 empirical width rule (below) and the
# batch tile cap: keep at least PICKW_MIN_R lane-chunks busy when
# widening strips, and never run one kernel call past TILE_MAX_R
# lane-chunks — ONE full native (8, 128) sublane tile.  Measured twice:
# 64x1kb tile=256/w=64 read 31.7 GCUPS vs 49.2 split into tile=128
# calls (scratch/micro_tilecap.py, the original R<=16 cap), then
# R=16 calls lost to pairs of R=8 calls by 1.4-1.75x — 64x4kb 137-139
# whole vs 194-196 halved, 128x2kb 83-89 vs 146-159
# (scratch/micro_tilecap8.py, carry kernel) — so the cap is the native
# tile itself.
PICKW_MIN_R = 4
TILE_MAX_R = 8


def _pick_w_occupancy(B: int, n_pad: int, cands) -> int:
    """Round-4 empirical width rule for UNIFORM batch fills: the widest
    candidate whose lane-chunk count R stays >= PICKW_MIN_R; when every
    candidate underfills, maximize R (then width).  The measured
    (B, L, w) grid behind it (docs/PERF.md "140-400 retraction" section;
    scratch/micro_tilecap.py, micro_wrule*.py): wider strips halve an
    issue-model-invisible per-wave staging cost, and the rule matches
    the measured optimum at every grid point within 8%
    (L=1024 B=8/32/64/128/256, L=4096 B=16) — vs up to 5x losses from
    the pure issue-model rank (B=8 w=8: 4.4 GCUPS vs w=16: 22)."""
    # Widths past the row length only add pad phases (S_p is already 1).
    fit = [w for w in cands if w <= max(4, n_pad)] or list(cands)[:1]
    ok = [w for w in fit if _lanes_geometry(B, n_pad, w)[1] >= PICKW_MIN_R]
    if ok:
        return max(ok)
    # Underfilled (every width leaves R < PICKW_MIN_R): keep the most
    # lanes busy — R first, exact busy-lane count next, narrower strips
    # (less pad-phase work) as the tie-break.
    def _underfill_key(w):
        S_p, R = _lanes_geometry(B, n_pad, w)
        return (R, B * S_p, -w)

    return max(fit, key=_underfill_key)


def pick_w(B: int, m: int, n_pad: int, asel: int = 0) -> int:
    """Strip width for a (B, m, n_pad) fill.

    Batches (B >= 4, uniform or general) use the empirical occupancy
    rule (:func:`_pick_w_occupancy`).  Single/split pairs rank the
    issue-bound instruction model instead (each phase op covers all
    strips while R <= 8 sublanes, then splits into ceil(R/8) tiles;
    drain waves scale with strips-per-pair) — measured best for B <= 2
    (scratch/micro_w64.py: split w=20 ~ w=32 > w=64).
    """
    cands = _w_candidates(B, n_pad, asel=asel)
    if B >= 4:
        # The occupancy rule transfers to general mode (measured at
        # A=25 and A=5, scratch/micro_general_w64.py) — the select
        # chain scales the per-phase work but not the staging cost the
        # rule exists to shrink.
        return _pick_w_occupancy(B, n_pad, cands)
    best_cost, best_w = None, DEFAULT_W
    for w in cands:
        cost = _issue_cost(B, m, n_pad, w, False, asel)
        if best_cost is None or cost < best_cost:
            best_cost, best_w = cost, w
    return best_w


def model_rank_selfcheck(
    B: int, m: int, n_pad: int, time_fn, asel: int = 0
) -> dict:
    """Compare the issue model's strip-width ranking against LIVE
    timings — the guard against silently-wrong dispatch on a chip or
    toolchain the constants were never calibrated for (the 17/15 and
    41:1 ratios above come from one v5e through one tunnel).

    ``time_fn(w) -> seconds`` measures one fill at width ``w`` (the
    caller owns the timing protocol; slope timing recommended through
    remote tunnels).  Returns a report dict and logs a WARNING when the
    model's best width is not within 10% of the measured best — the
    model mis-ranks on this hardware and the constants need recalibration.
    Exercised by tests/test_fill_lanes.py::test_model_rank_selfcheck and
    the scratch/micro w-sweeps; call it from an ad-hoc script when
    bringing up a new TPU generation."""
    ws = _w_candidates(B, n_pad)
    model = {w: _issue_cost(B, m, n_pad, w, False, asel) for w in ws}
    measured = {w: float(time_fn(w)) for w in ws}
    model_best = min(model, key=model.get)
    measured_best = min(measured, key=measured.get)
    agree = (
        measured[model_best]
        <= 1.10 * measured[measured_best]
    )
    report = {
        "candidates": list(ws),
        "model_cost": model,
        "measured_s": measured,
        "model_best_w": model_best,
        "measured_best_w": measured_best,
        "agree": agree,
        "constants": {
            "ISSUE_PHASE_OPS": ISSUE_PHASE_OPS,
            "ISSUE_SELECT_OPS": ISSUE_SELECT_OPS,
            "ISSUE_WAVE_OPS": ISSUE_WAVE_OPS,
        },
    }
    if not agree:
        _logger.warning(
            "lanes issue model mis-ranks on this backend: model best "
            "w=%d is %.0f%% slower than measured best w=%d — dispatch "
            "constants need recalibration (%s)", model_best,
            100.0 * (measured[model_best] / measured[measured_best] - 1),
            measured_best, report,
        )
    return report


def lanes_moves_bytes(B: int, m_pad: int, n_pad: int, w: int) -> int:
    """Exact size of the skewed uint8 code buffer one moves-mode kernel
    call materializes — the single source of truth for ``_lanes_run``'s
    out_shape, the aligner's moves budget, and the batch estimator."""
    S_p, R = _lanes_geometry(B, n_pad, w, moves=True)
    g_cap = m_pad + 2 * (S_p - 1)
    nb_cap = -(-max(1, g_cap) // MBLK) + 1
    return nb_cap * MBLK * w * R * LANES


# Moves-mode dispatch guards.  The kernel runs m + 2*(S_p-1) waves for
# m useful rows, so when the drain exceeds the rows (wide-short pairs,
# e.g. m=32 x n=8192: ~6% wave efficiency) the stacked moves kernel is
# both smaller and faster — decline.  Separately, cap the ABSOLUTE
# skewed-buffer overhead: relative inflation is a bad proxy at small
# sizes, where the 8-aligned R padding can be 6x of a few megabytes and
# the lane kernel still wins 3-4x outright (measured, docs/PERF.md).
MOVES_BYTES_INFLATION_CAP = 4.0
MOVES_BYTES_ABS_FLOOR = 256 * 1024 * 1024


# Largest alphabet the general-matrix select chain stays worthwhile
# for (BLOSUM's 25 tokens included: ~67 ops/cell still beats the scan
# kernels' throughput on the batch axis, docs/PERF.md).  The BITMASK
# substitution mode (sub_bits_for) extends the cap to 31: its cost
# scales with the VALUE bit width, not the alphabet, and the per-lane
# shift indexes one int32 mask — token ids must stay below 32.
LANES_MAX_ALPHABET = 26
LANES_MAX_ALPHABET_BITMASK = 31


def lanes_alphabet_ok(asel: int, cost_mat=None) -> bool:
    """Can the lane kernel serve this alphabet?  Up to
    LANES_MAX_ALPHABET always (select chain); up to
    LANES_MAX_ALPHABET_BITMASK when the concrete matrix qualifies for
    the bitmask mode (small non-negative values, sub_bits_for > 0).
    Dispatchers that answer True for 26 < asel <= 31 MUST pass the
    matching ``sub_bits`` to the kernel wrappers — the select chain is
    not traced for those alphabets."""
    if asel <= LANES_MAX_ALPHABET:
        return True
    return (
        asel <= LANES_MAX_ALPHABET_BITMASK
        and sub_bits_for(cost_mat) > 0
    )

# Per-shape failure latch for the general-matrix mode: the first
# backend failure of a padded-shape class disables its dispatch for the
# process — remote compiles cost 30s-6min each and jax does not cache
# FAILED compiles, so re-attempting the same executable per call/block
# would multiply the damage (dispatchers fall back to the scan kernels
# instead).  Latching is per shape class, not process-wide: a transient
# failure on one odd geometry (e.g. an OOM) must not poison every
# subsequent feasible shape.  The mode is validated on real v5e
# (scratch/fuzz_tpu_lanes.py, 36-case conformance fuzz incl. BLOSUM62 —
# docs/PERF.md), so failures are expected to be shape-local if they
# happen at all.
_general_failed: set = set()


def general_lanes_key(
    B: int, m_pad: int, n_pad: int, w: int, asel: int, moves: bool = False
) -> tuple:
    """Shape-class key for the failure latch: everything that selects a
    distinct compiled executable of the general-matrix lane kernel."""
    return (B, m_pad, n_pad, w, asel, moves)


def general_lanes_ok(key: tuple | None = None) -> bool:
    """Whether general-lane dispatch should be attempted for ``key``
    (a :func:`general_lanes_key` tuple).  ``None`` asks about the mode
    overall (budget estimators) and always answers True: per-shape
    failures never disable the mode globally."""
    if key is None:
        return True
    return key not in _general_failed


def mark_general_lanes_failed(
    key: tuple | None = None, sub_bits: int = 0
) -> None:
    """Latch a general-lane failure for ``key``.

    ``sub_bits`` is the substitution mode the FAILING call used.  When
    the bitmask kernel (sub_bits > 0) fails on an alphabet the select
    chain also serves (asel <= LANES_MAX_ALPHABET, key[4]), only the
    BITMASK mode is latched for this shape class — the next call of the
    class retries the chip-validated select chain via
    :func:`dispatch_sub_bits` instead of losing the lane path outright
    (a toolchain where variable-amount vector shifts fail to compile
    must not demote qualifying matrices to the scan kernels).  Chain
    failures, and bitmask failures above the chain's alphabet cap,
    latch the whole class as before."""
    # CPU cannot run Pallas outside interpret mode at all — a failure
    # there is a platform limitation, not a kernel defect, and must not
    # poison the latch (CPU tests force use_pallas with interpret-
    # wrapped entry points; unwrapped attempts just fall back).
    if jax.default_backend() == "cpu" or key is None:
        return
    if (
        sub_bits > 0
        and key[4] <= LANES_MAX_ALPHABET
        and key not in _bitmask_failed
    ):
        _bitmask_failed.add(key)
        return
    _general_failed.add(key)


# Shape classes whose BITMASK substitution mode failed: dispatch falls
# back to the select chain for these (see mark_general_lanes_failed).
_bitmask_failed: set = set()


def dispatch_sub_bits(cost_mat, gkey: tuple | None = None) -> int:
    """:func:`sub_bits_for`, gated by the per-shape bitmask failure
    latch: a shape class whose bitmask kernel was rejected dispatches
    the select chain (0) from then on.  Only classes with
    asel <= LANES_MAX_ALPHABET are ever bitmask-latched, so a 0 here
    never violates lanes_alphabet_ok's 27-31 contract."""
    sb = sub_bits_for(cost_mat)
    if sb and gkey is not None and gkey in _bitmask_failed:
        return 0
    return sb


# Shape classes whose general-lane dispatch has completed one clean
# RUN-TIME probe this process.  Dispatchers block_until_ready the first
# call of a shape class (so a runtime fault latches the class and falls
# back gracefully) and skip the block afterwards: a ~35 ms tunnel sync
# PER CALL defeated the serving pipeline — 1 kb BLOSUM chunks measured
# ~10x slower than the same fills dispatched without the sync (the
# moves path learned this first, batch.py _GENERAL_WALK_PROBED).
_general_run_probed: set = set()


def general_probe_needed(key: tuple | None) -> bool:
    """True when this shape class still needs its one blocking probe.

    Once a class is marked probed, dispatchers stop syncing — so a
    LATER runtime fault in an already-probed class surfaces as a raw
    backend exception at whatever downstream fetch first touches the
    value, outside the dispatchers' graceful-fallback try/except.
    That is the accepted trade (runtime faults are deterministic per
    compiled executable, so a clean first run vouches for the class;
    per-call syncs measured ~10x on serving chunks)."""
    return key is not None and key not in _general_run_probed


def mark_general_probed(key: tuple | None) -> None:
    if key is not None:
        _general_run_probed.add(key)


def lanes_plan(
    B: int, m_pad: int, n_pad: int, moves: bool = False, asel: int = 0,
    sub_bits: int = 0,
) -> tuple[int, int] | None:
    """Dispatch plan ``(w, tile)`` for a (padded) batch geometry, or
    None when even a single pair's working set exceeds the VMEM budget
    (megabase-scale n — callers fall back to the scan kernels) or, in
    moves mode, when the drain-wave or buffer-size guards above fire.

    Deterministic in the padded shapes (+ the host-resolved
    ``sub_bits``) only, so a host wrapper and a shard_map body
    recompute the identical plan.  In COST mode the asel-capped width
    candidates are ALSO correct for the bitmask substitution kernel:
    its smaller staged tables would admit wider strips, but the
    measured optimum stays at the chain-era widths (w=64 beat w=128 by
    ~17% at 16x4kb A=25 bitmask, w=128 lost at 32x1kb too —
    scratch/micro_subbits_w.py), so cost plans do not vary with
    sub_bits.  MOVES mode is different: the code stream halves the
    state budget and the bitmask tables shrink the staging, so w=64
    wins 1.5x at 16x4kb (scratch/micro_moves_w_bits.py) — callers pass
    the resolved ``sub_bits`` and the candidate cap lifts to 64 for
    bitmask general moves."""
    moves_cap = 64 if (moves and asel > 0 and sub_bits > 0) else 32
    w = pick_w(B, m_pad, n_pad, asel=asel)
    if moves:
        w = min(w, moves_cap)  # moves candidates stay capped
    tile = lanes_tile_size(B, n_pad, w, moves, asel)
    if tile < B:
        # The batch splits: re-pick the width for the tile the kernel
        # actually runs, then re-fit the tile to that width.
        w = pick_w(tile, m_pad, n_pad, asel=asel)
        if moves:
            w = min(w, moves_cap)
        tile = lanes_tile_size(tile, n_pad, w, moves, asel)
    if not moves:
        # Candidates that fit VMEM at this tile; uniform batches then
        # apply the occupancy rule, general mode re-costs with asel
        # (the 2-ops-per-token select chain shifts the phase/drain
        # tradeoff, 4x at BLOSUM).
        feas = [
            wc
            for wc in sorted({*_w_candidates(tile, n_pad, asel=asel), w})
            if lanes_vmem_bytes(tile, n_pad, wc, False, asel)
            <= LANES_VMEM_BUDGET
        ]
        if not feas:
            return None
        if tile >= 4:
            wbest = _pick_w_occupancy(tile, n_pad, feas)
        else:
            wbest = min(
                feas,
                key=lambda wc: _issue_cost(tile, m_pad, n_pad, wc,
                                           False, asel),
            )
        if _debug_dispatch():
            _logger.info(
                "lanes_plan(B=%d, m=%d, n=%d, asel=%d) -> w=%d tile=%d "
                "issue_cost=%d", B, m_pad, n_pad, asel, wbest, tile,
                _issue_cost(tile, m_pad, n_pad, wbest, False, asel),
            )
        return wbest, tile

    # Moves mode: the issue-model optimum may fail the drain guard
    # (short blocks over wide rows — fewer, wider strips fix it), so
    # choose the model-best width among the FEASIBLE candidates.
    def feasible(wc):
        if lanes_vmem_bytes(
            tile, n_pad, wc, moves=True, asel=asel, sub_bits=sub_bits
        ) > LANES_VMEM_BUDGET:
            return False
        S_p, _ = _lanes_geometry(tile, n_pad, wc, moves=True)
        if 2 * (S_p - 1) > m_pad:
            return False
        bytes_l = lanes_moves_bytes(tile, m_pad, n_pad, wc)
        row_major = tile * (m_pad + 1) * (n_pad + 1)
        return not (
            bytes_l > MOVES_BYTES_INFLATION_CAP * row_major
            and bytes_l > MOVES_BYTES_ABS_FLOOR
        )

    best = None
    for wc in sorted({
        *_w_candidates(tile, n_pad, moves=True, asel=asel,
                       sub_bits=sub_bits),
        w,
    }):
        if not feasible(wc):
            continue
        cost = _issue_cost(tile, m_pad, n_pad, wc, True, asel, sub_bits)
        if best is None or cost < best[0]:
            best = (cost, wc)
    if best is None:
        return None
    if _debug_dispatch():
        _logger.info(
            "lanes_plan(B=%d, m=%d, n=%d, asel=%d, moves) -> w=%d "
            "tile=%d issue_cost=%d", B, m_pad, n_pad, asel, best[1],
            tile, best[0],
        )
    return best[1], tile


def lanes_tile_size(
    B: int, n_pad: int, w: int, moves: bool = False, asel: int = 0
) -> int:
    """Largest per-call pair count whose working set fits the VMEM
    budget (the batch dispatcher splits bigger batches into tiles).

    Cost mode also caps one call at TILE_MAX_R lane-chunks: VMEM alone
    allowed 64-chunk tiles whose issue pipeline ran 1.6x slower than
    two 16-chunk calls (scratch/micro_tilecap.py, docs/PERF.md)."""
    t = B
    if not moves:
        S_p = max(1, -(-n_pad // w))
        t = min(t, max(1, (TILE_MAX_R * LANES) // S_p))
    if lanes_vmem_bytes(t, n_pad, w, moves, asel) <= LANES_VMEM_BUDGET:
        return t
    while t > 1 and lanes_vmem_bytes(t, n_pad, w, moves, asel) \
            > LANES_VMEM_BUDGET:
        t //= 2
    return t


def _lanes_run(
    tok_a_ext,
    tok_b_ext,
    cmatch,
    cmismatch,
    dcost,
    icost,
    gap_open,
    m_true,
    n_true,
    w,
    interpret,
    force_clamp,
    moves,
    row0=None,
    col0y_top=None,
    cost_mat=None,
    gap_id=None,
    sub_bits=0,
    npar=1,
):
    """Shared kernel launch: (final3 (B, 3), skewed moves or None).

    ``row0`` ((B, 3, >= n_pad+1) int32) and ``col0y_top`` ((B,) int32)
    inject a block's boundary: the triple row above the block and the
    column-0 Iy value at its top row (the global column-0 structure,
    offset per block).  Injected callers must pass m_true >= 1 (the
    row-0 output seeds are not re-derived from the injection).

    ``cost_mat``/``gap_id`` switch to GENERAL-matrix mode (asel =
    alphabet size, any substitution/gap structure, values may be
    traced); the ``cmatch..icost`` scalars are then ignored.

    ``npar`` > 1: the inputs carry a leading SET axis ((npar, B, ...)
    tokens, (npar, B) lengths) and one kernel fills the sets with their
    per-phase chains interleaved (cost-only, no injection; see
    _make_lane_kernel).  Returns final3 (npar, B, 3) and flat None."""
    if npar > 1:
        assert not moves and row0 is None and col0y_top is None
        toks_a = [
            jnp.asarray(tok_a_ext[t], jnp.int32) for t in range(npar)
        ]
        toks_b = [
            jnp.asarray(tok_b_ext[t], jnp.int32) for t in range(npar)
        ]
        mts = [jnp.asarray(m_true[t], jnp.int32) for t in range(npar)]
        nts = [jnp.asarray(n_true[t], jnp.int32) for t in range(npar)]
    else:
        toks_a = [jnp.asarray(tok_a_ext, jnp.int32)]
        toks_b = [jnp.asarray(tok_b_ext, jnp.int32)]
        mts = [jnp.asarray(m_true, jnp.int32)]
        nts = [jnp.asarray(n_true, jnp.int32)]
    B, m1 = toks_a[0].shape
    n_pad = toks_b[0].shape[1] - 1
    m_pad = m1 - 1
    S_p, R = _lanes_geometry(B, n_pad, w, moves)
    # Small batches stage the inject stream as nb broadcast planes
    # (selected by pair id in-kernel) instead of per-strip (R, 128)
    # planes — the per-strip dynamic reads measured ~2x the per-wave
    # budget at B=2 (docs/PERF.md).
    nb = B if 1 < B <= INJ_BCAST_MAX_B else 1
    Rw = 1 if (B == 1 or nb > 1) else R
    asel = 0 if cost_mat is None else int(cost_mat.shape[0])

    if asel > 0:
        # Traced costs: no static headroom proof — keep the clamps.
        clamp = True
    else:
        # Unclamped values are BIG plus a path cost bounded by per-step
        # edge costs over at most G_cap + n_pad + 2 steps; drop the
        # clamps only when that provably fits int32 (always, for
        # realistic schemes).
        step = max(
            abs(int(cmatch)), abs(int(cmismatch)), abs(int(dcost)),
            abs(int(icost)),
        ) + abs(int(gap_open))
        worst = (m_pad + 2 * (S_p - 1) + n_pad + 2) * step
        clamp = int(BIG) + worst >= 2**31
    if force_clamp is not None:  # test hook: pin either kernel variant
        clamp = force_clamp

    go = jnp.asarray(gap_open, jnp.int32)

    s_flat = jnp.arange(R * LANES, dtype=jnp.int32)
    pair = s_flat // S_p  # pad strips (pair >= B) clip below
    valid_strip = pair < B
    pairc = jnp.minimum(pair, B - 1)
    q = s_flat % S_p

    # Per-strip seq_2 tokens per phase: btab[p, s] = tok_b[pair, q*w+p+1]
    # (clipped reads past n_pad feed garbage strips only).
    ps = jnp.arange(w, dtype=jnp.int32)
    jloc = q[None, :] * w + ps[:, None] + 1  # (w, S)
    j0 = q * w  # (S,) column before each strip's first
    jc = jnp.minimum(jloc, n_pad)
    j0c = jnp.minimum(j0, n_pad)
    if asel > 0:
        cmj = jnp.asarray(cost_mat, jnp.int32)
        gid = jnp.asarray(gap_id, jnp.int32)

    # Wave count shared across sets (same geometry; per-set m_true
    # only gates captures).  Floor of 1 keeps the DMA start/wait
    # pairing balanced at G == 0.
    G = jnp.maximum(
        functools.reduce(
            jnp.maximum, [jnp.max(mt) for mt in mts]
        ) + 2 * (S_p - 1),
        1,
    )
    G_cap = m_pad + 2 * (S_p - 1)  # static worst case
    nblocks = -(-max(1, G_cap) // _STAGE)
    G_rows = (nblocks + 2) * _STAGE

    # Pre-skewed injection only exists for per-strip staging: broadcast
    # rows (one per pair) cannot encode per-strip skew.
    skew = _SKEW_INJECT and not (B == 1 or nb > 1)

    def _inj_plane(mat):
        """(B, >= G_rows+1) per-pair values -> (G_rows, nb, Rw, LANES)
        staged rows.  Broadcast staging (Rw == 1) carries one (1, 128)
        row per (wave, pair) — every strip-0 lane of a pair takes the
        same value, the kernel selecting its pair's row by pair id;
        per-strip staging (Rw == R) carries each strip's value in its
        own lane — PRE-SKEWED when _SKEW_INJECT (plane[g][s] =
        mat[pair, clip(g+1-2q, 0)]: exactly the value the in-kernel
        shift pipeline would deliver at strip s on wave g, with the
        row-0 boundary token standing in for the pipeline's fill=0;
        early-wave reads at inactive strips previously saw
        uninitialized ring scratch and were masked — they still are)."""
        padded = jnp.pad(
            mat, ((0, 0), (0, max(0, G_rows + 1 - mat.shape[1]))),
            mode="edge",
        )
        # Broadcast staging only for B == 1 / the nb-pair groups; a B>1
        # batch that happens to fit one lane chunk (R == 1, so Rw == 1)
        # still stages per-strip rows.
        if B == 1 or nb > 1:
            return jnp.broadcast_to(
                padded[:nb, 1 : G_rows + 1].transpose(1, 0)[
                    :, :, None, None
                ],
                (G_rows, nb, 1, LANES),
            )
        if skew:
            # plane[g][s] = mat[pair, g+1-2q]: strips sharing q share a
            # contiguous WINDOW of the token sequence, so build from
            # S_p static slices over a zero-left-padded copy (zeros ==
            # the boundary token) instead of a (G_rows x S) gather —
            # XLA lowers big gathers poorly (a 512 x 1 kb A/B lost ~15%
            # to the gather build; slices are memcpy-class).
            lpad = 2 * (S_p - 1)
            p2 = jnp.pad(padded, ((0, 0), (lpad, 0)))
            wins = [
                jax.lax.slice_in_dim(
                    p2, lpad + 1 - 2 * qq, lpad + 1 - 2 * qq + G_rows,
                    axis=1,
                )
                for qq in range(S_p)
            ]
            # (S_p, B, G_rows) -> (G_rows, B, S_p) -> strip-major rows
            # (s = pair * S_p + q), padded to the (R, LANES) tile.
            mat_s = jnp.stack(wins).transpose(2, 1, 0).reshape(
                G_rows, B * S_p
            )
            mat_s = jnp.pad(
                mat_s, ((0, 0), (0, R * LANES - B * S_p))
            )
            return mat_s.reshape(G_rows, R, LANES)[:, None]
        return padded[pairc.reshape(R, LANES)[:Rw], 1 : G_rows + 1] \
            .transpose(2, 0, 1)[:, None]

    # Per-SET tables (npar == 1 is the plain single-set build; npar > 1
    # builds each set with the identical formulas and concatenates
    # along the kernel's set-major plane axes).
    per = []
    for t in range(npar):
        tok_a_i, tok_b_i = toks_a[t], toks_b[t]
        mt_t, nt_t = mts[t], nts[t]
        s: dict = {}
        s["btab"] = tok_b_i[pairc[None, :], jc].reshape(w, R, LANES)
        s["mtrue"] = jnp.where(
            valid_strip, mt_t[pairc], -1
        ).reshape(R, LANES)
        # Row-0 boundary tables (reference make_dp_array,
        # globaligner.py:756-821) — global formulas by default, or
        # derived from the injected checkpoint row.  zrow/vrow feed the
        # zbuf/vbuf seeds, zj0 is the phase-0 diagonal of row 1 (pair
        # corners at the q == 0 strips), c0t seeds the column-0 Iy
        # accumulator.
        if asel > 0:
            # Per-column gap-extension prefix D(j) = sum dcost(b_1..b_j)
            # and per-row icost / column-0 Iy accumulators (reference
            # make_dp_array boundary structure, generalized).
            dsteps = cmj[gid, tok_b_i]
            D = jnp.cumsum(dsteps.at[:, 0].set(0), axis=1)
            ics = cmj[tok_a_i, gid]  # (B, m1)
            c0_base = (
                go if col0y_top is None
                else jnp.asarray(col0y_top, jnp.int32)[:, None]
            )
            s["c0y"] = c0_base + jnp.cumsum(
                ics.at[:, 0].set(0), axis=1
            )
        if row0 is None:
            if asel > 0:
                zr = go + D[pairc[None, :], jc]
                s["zrow"] = zr.reshape(w, R, LANES)
                s["vrow"] = (zr + go).reshape(w, R, LANES)
                s["zj0"] = jnp.where(
                    q == 0, 0, go + D[pairc, j0c]
                ).reshape(R, LANES)
            else:
                dd = jnp.asarray(dcost, jnp.int32)
                s["zrow"] = (go + jloc * dd).reshape(w, R, LANES)
                s["vrow"] = (2 * go + jloc * dd).reshape(w, R, LANES)
                s["zj0"] = jnp.where(
                    q == 0, 0, go + j0 * dd
                ).reshape(R, LANES)
            s["c0t"] = jnp.full((R, LANES), go, jnp.int32)
            if moves:
                # Row 0's min3 / gap-open argmin is Ix everywhere
                # (triple (BIG, go + j*d, BIG), j >= 1); the corner
                # (0,0,0) -> M.
                one_t = jnp.ones((w, R, LANES), jnp.int32)
                s["zcrow"] = one_t
                s["vcrow"] = one_t
                s["zcj0"] = jnp.where(q == 0, 0, 1).reshape(R, LANES)
        else:
            r0 = jnp.asarray(row0, jnp.int32)[:, :, : n_pad + 1]
            z0 = jnp.min(r0, axis=1)  # (B, n_pad+1) min3 of row above
            v0 = jnp.minimum(
                jnp.minimum(r0[:, 0], r0[:, 1]) + go, r0[:, 2]
            )
            s["zrow"] = z0[pairc[None, :], jc].reshape(w, R, LANES)
            s["vrow"] = v0[pairc[None, :], jc].reshape(w, R, LANES)
            s["zj0"] = z0[pairc, j0c].reshape(R, LANES)
            s["c0t"] = jnp.asarray(col0y_top, jnp.int32)[pairc] \
                .reshape(R, LANES)
            if moves:
                # Argmin codes of the injected row, ties M > Ix > Iy.
                cz0 = jnp.where(
                    r0[:, 0] == z0, 0, jnp.where(r0[:, 1] == z0, 1, 2)
                )
                cv0 = jnp.where(
                    r0[:, 0] + go == v0,
                    0,
                    jnp.where(r0[:, 1] + go == v0, 1, 2),
                )
                s["zcrow"] = cz0[pairc[None, :], jc] \
                    .reshape(w, R, LANES)
                s["vcrow"] = cv0[pairc[None, :], jc] \
                    .reshape(w, R, LANES)
                s["zcj0"] = cz0[pairc, j0c].reshape(R, LANES)
        if asel > 0:
            # ctab[p*asel+k] = cost(k, b_{s,p}); dtab[p] = dcost(b_{s,p});
            # itab[k] = icost(k) = cost(k, gap) — SMEM scalars for the
            # in-kernel per-row gap-cost chain.  With sub_bits,
            # ctab/itab instead carry the packed per-bit masks
            # (_sub_mask_planes): w*sub_bits planes instead of w*asel.
            ct = cmj[jnp.arange(asel, dtype=jnp.int32)][:, s["btab"]]
            if sub_bits:
                ctab_t = _sub_mask_planes(ct, sub_bits)
                s["ctab"] = ctab_t.transpose(1, 0, 2, 3).reshape(
                    w * sub_bits, R, LANES
                )
            else:
                s["ctab"] = ct.transpose(1, 0, 2, 3).reshape(
                    w * asel, R, LANES
                )
            s["dtab"] = cmj[gid, s["btab"]]
        # Both modes inject the seq_1 token stream only: general mode
        # derives the per-row gap cost and column-0 Iy in-kernel
        # (select chain + accumulator) — extra inject planes measured
        # ~4x the per-wave budget on the batch axis (docs/PERF.md).
        s["inj"] = _inj_plane(tok_a_i)  # (G_rows, nb, Rw, LANES)
        per.append(s)

    # Interleave sets per wave: row g*IPW + t*nb + b.
    inj = jnp.stack([s["inj"] for s in per], axis=1).reshape(
        G_rows * npar * nb, Rw, LANES
    )
    inj = inj + jnp.zeros((1, 1, 1), jnp.int32)  # materialize broadcast

    m_min = functools.reduce(jnp.minimum, [jnp.min(mt) for mt in mts])
    params = jnp.stack(
        [
            G,
            go,
            jnp.asarray(cmatch, jnp.int32),
            jnp.asarray(cmismatch, jnp.int32),
            jnp.asarray(dcost, jnp.int32),
            jnp.asarray(icost, jnp.int32),
            m_min,
        ]
    ).reshape(1, 7)

    def _cat(key):
        return jnp.concatenate([s[key] for s in per], axis=0)

    def _stk(key):
        return jnp.stack([s[key] for s in per], axis=0)

    btab = _cat("btab")  # (npar*w, R, LANES)
    mtrue_tile = _stk("mtrue")  # (npar, R, LANES)
    zrow = _cat("zrow")
    vrow = _cat("vrow")
    zj0 = _stk("zj0")
    c0t = _stk("c0t")

    out_shapes = [
        jax.ShapeDtypeStruct((3, npar * w, R, LANES), jnp.int32)
    ]
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    wb = max(w - 1, 1)
    scratch = [
        pltpu.VMEM((2 * npar, R, LANES), jnp.int32),  # ah
        pltpu.VMEM((2 * npar, R, LANES), jnp.int32),  # emh
        pltpu.VMEM((2 * npar, R, LANES), jnp.int32),  # exh
        pltpu.VMEM((2 * npar, R, LANES), jnp.int32),  # eyh
        pltpu.VMEM((3 * npar, R, LANES), jnp.int32),  # zh
        pltpu.VMEM((npar * wb, R, LANES), jnp.int32),  # zbuf
        pltpu.VMEM((npar * w, R, LANES), jnp.int32),  # vbuf
    ]
    if asel > 0:
        scratch.append(pltpu.VMEM((npar, R, LANES), jnp.int32))  # c0acc
    ip = nb * npar
    scratch += [
        pltpu.VMEM((2, _STAGE * ip, Rw, LANES), jnp.int32),  # inj stage
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if moves:
        # Sized by lanes_moves_bytes (single source of truth; includes
        # +1 block of slack — the tail flush writes a full MBLK block).
        mv_rows = lanes_moves_bytes(B, m_pad, n_pad, w) // (R * LANES)
        out_shapes.append(
            jax.ShapeDtypeStruct((mv_rows, R, LANES), jnp.uint8)
        )
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch += [
            pltpu.VMEM((max(w - 1, 1), R, LANES), jnp.int32),  # zcb
            pltpu.VMEM((w, R, LANES), jnp.int32),  # vcb
            pltpu.VMEM((3, R, LANES), jnp.int32),  # zch
            pltpu.VMEM((2 * MBLK * w, R, LANES), jnp.uint8),  # mst
            pltpu.SemaphoreType.DMA((2,)),  # osems
        ]

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * 6
    args = [params, btab, mtrue_tile, zrow, vrow, zj0, c0t]
    if asel > 0:
        if sub_bits:
            itab = _sub_mask_planes(
                cmj[:, gid], sub_bits
            ).reshape(1, sub_bits)
        else:
            itab = cmj[:, gid].reshape(1, asel)
        in_specs += [vmem, vmem, pl.BlockSpec(memory_space=pltpu.SMEM)]
        args += [_cat("ctab"), _cat("dtab"), itab]
    if moves:
        in_specs += [vmem] * 3
        args += [per[0]["zcrow"], per[0]["vcrow"], per[0]["zcj0"]]
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(inj)

    res = pl.pallas_call(
        _make_lane_kernel(
            w, R, S_p, Rw, clamp, moves=moves, asel=asel, nb=nb,
            sub_bits=sub_bits, npar=npar, skew=skew,
        ),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*args)
    out = res[0]
    mv = res[1] if moves else None

    # out[l, t*w+p, r, lane] -> per-pair flat columns per set: strip s
    # covers pair columns q*w+1 .. q*w+w, phase p = in-strip offset.
    finals = []
    flat0 = None
    for t in range(npar):
        out_t = out[:, t * w : (t + 1) * w]
        flat = out_t.transpose(0, 2, 3, 1).reshape(3, R * LANES * w)
        flat = flat[:, : B * S_p * w].reshape(3, B, S_p * w)
        if t == 0:
            flat0 = flat
        col = jnp.clip(nts[t] - 1, 0, S_p * w - 1)
        final3 = jnp.take_along_axis(
            flat, col[None, :, None], axis=2
        )[:, :, 0].T  # (B, 3)
        # n_true == 0 reduces to the column-0 boundary of row m_true:
        # (BIG, BIG, col-0 Iy at m_true), or (0, 0, 0) when m_true == 0.
        # (Global-boundary values — injected callers pass n_true >= 1.)
        if asel > 0:
            iy_m = jnp.take_along_axis(
                per[t]["c0y"], jnp.minimum(mts[t], m_pad)[:, None],
                axis=1,
            )[:, 0]
        else:
            iy_m = go + mts[t] * jnp.asarray(icost, jnp.int32)
        m0 = mts[t] == 0
        b0 = jnp.stack(
            [
                jnp.where(m0, 0, BIG),
                jnp.where(m0, 0, BIG),
                jnp.where(m0, 0, iy_m),
            ],
            axis=-1,
        )
        finals.append(
            jnp.where((nts[t] == 0)[:, None], b0, final3)
        )
    if npar == 1:
        return finals[0], flat0, mv
    return jnp.stack(finals, axis=0), None, None


@functools.partial(
    jax.jit, static_argnames=("w", "interpret", "force_clamp", "sub_bits")
)
def lanes_general_final3(
    tok_a_ext: jax.Array,
    tok_b_ext: jax.Array,
    cost_mat: jax.Array,
    gap_id,
    gap_open,
    m_true: jax.Array,
    n_true: jax.Array,
    *,
    w: int = DEFAULT_W,
    interpret: bool = False,
    force_clamp: bool | None = None,
    sub_bits: int = 0,
) -> jax.Array:
    """(B, 3) final DP lanes — GENERAL costing matrices on the lane
    kernel (any substitution/gap structure; values may be traced, e.g.
    inside shard_map — only the alphabet size is static, via the
    matrix's shape).  Substitution pays a select chain over the
    alphabet, so this wins for small alphabets and stays ahead of the
    scan kernels up to BLOSUM-sized ones (docs/PERF.md)."""
    final3, _, _ = _lanes_run(
        jnp.asarray(tok_a_ext), jnp.asarray(tok_b_ext),
        0, 0, 0, 0, gap_open,
        m_true, n_true, w, interpret, force_clamp, moves=False,
        cost_mat=jnp.asarray(cost_mat, jnp.int32), gap_id=gap_id,
        sub_bits=sub_bits,
    )
    return final3


@functools.partial(
    jax.jit, static_argnames=("w", "interpret", "force_clamp", "sub_bits")
)
def lanes_general_last_rows(
    tok_a_ext: jax.Array,
    tok_b_ext: jax.Array,
    cost_mat: jax.Array,
    gap_id,
    gap_open,
    m_true: jax.Array,
    n_true: jax.Array,
    row0: jax.Array | None = None,
    col0y_top: jax.Array | None = None,
    *,
    w: int = DEFAULT_W,
    interpret: bool = False,
    force_clamp: bool | None = None,
    sub_bits: int = 0,
) -> jax.Array:
    """General-matrix :func:`lanes_batch_last_rows` — (B, 3, S_p*w)
    full final rows with optional boundary injection."""
    _, flat, _ = _lanes_run(
        jnp.asarray(tok_a_ext), jnp.asarray(tok_b_ext),
        0, 0, 0, 0, gap_open,
        m_true, n_true, w, interpret, force_clamp, moves=False,
        row0=row0, col0y_top=col0y_top,
        cost_mat=jnp.asarray(cost_mat, jnp.int32), gap_id=gap_id,
        sub_bits=sub_bits,
    )
    return flat.transpose(1, 0, 2)


@functools.partial(
    jax.jit, static_argnames=("w", "interpret", "force_clamp", "sub_bits")
)
def lanes_general_moves(
    tok_a_ext: jax.Array,
    tok_b_ext: jax.Array,
    cost_mat: jax.Array,
    gap_id,
    gap_open,
    m_true: jax.Array,
    n_true: jax.Array,
    row0: jax.Array | None = None,
    col0y_top: jax.Array | None = None,
    *,
    w: int = DEFAULT_W,
    interpret: bool = False,
    force_clamp: bool | None = None,
    sub_bits: int = 0,
):
    """General-matrix traceback-capable fill: (final3, skewed moves) —
    the :func:`lanes_batch_moves` contract for any costing matrix."""
    final3, _, mv = _lanes_run(
        jnp.asarray(tok_a_ext), jnp.asarray(tok_b_ext),
        0, 0, 0, 0, gap_open,
        m_true, n_true, w, interpret, force_clamp, moves=True,
        row0=row0, col0y_top=col0y_top,
        cost_mat=jnp.asarray(cost_mat, jnp.int32), gap_id=gap_id,
        sub_bits=sub_bits,
    )
    return final3, mv


@functools.partial(
    jax.jit,
    static_argnames=(
        "cmatch", "cmismatch", "dcost", "icost", "gap_open", "w", "interpret",
        "force_clamp",
    ),
)
def lanes_batch_final3(
    tok_a_ext: jax.Array,
    tok_b_ext: jax.Array,
    cmatch,
    cmismatch,
    dcost,
    icost,
    gap_open,
    m_true: jax.Array,
    n_true: jax.Array,
    *,
    w: int = DEFAULT_W,
    interpret: bool = False,
    force_clamp: bool | None = None,
) -> jax.Array:
    """(B, 3) final DP lanes per pair — same contract as
    :func:`fill_pallas.stacked_uniform_fill_last_rows` read at n_true.

    Args:
        tok_a_ext / tok_b_ext: (B, m+1) / (B, n+1) int32 1-origin tokens.
        cmatch..icost / gap_open: uniform-scheme costs (STATIC host
            ints — the scheme is part of the compiled executable, which
            lets the host prove int32 overflow headroom and drop the
            kernel's per-phase BIG clamps).
        m_true / n_true: (B,) traced true lengths (<= padded shapes).
        w: static strip width (4-16; 8 is the measured sweet spot).
    """
    final3, _, _ = _lanes_run(
        jnp.asarray(tok_a_ext), jnp.asarray(tok_b_ext),
        cmatch, cmismatch, dcost, icost, gap_open,
        m_true, n_true, w, interpret, force_clamp, moves=False,
    )
    return final3


@functools.partial(
    jax.jit,
    static_argnames=(
        "cmatch", "cmismatch", "dcost", "icost", "gap_open", "w",
        "interpret", "force_clamp",
    ),
)
def lanes_batch_final3_dual(
    tok_a2: jax.Array,
    tok_b2: jax.Array,
    cmatch,
    cmismatch,
    dcost,
    icost,
    gap_open,
    m2: jax.Array,
    n2: jax.Array,
    *,
    w: int = DEFAULT_W,
    interpret: bool = False,
    force_clamp: bool | None = None,
) -> jax.Array:
    """(2, B, 3) final DP lanes for TWO same-shape tiles filled by ONE
    dual-set kernel (npar=2): the sets' per-phase chains interleave, so
    two full R=8 tiles cost ~1.13x one instead of 2x — ~1.77x batch
    throughput where the single-call R=16 form LOST 1.4-1.75x
    (scratch/micro_wavecost.py fullpair vs micro_tilecap8.py).  Inputs
    carry a leading set axis: (2, B, m+1)/(2, B, n+1) tokens, (2, B)
    lengths.  Bit-identical per set to :func:`lanes_batch_final3`."""
    final3, _, _ = _lanes_run(
        tok_a2, tok_b2,
        cmatch, cmismatch, dcost, icost, gap_open,
        m2, n2, w, interpret, force_clamp, moves=False, npar=2,
    )
    return final3


@functools.partial(
    jax.jit, static_argnames=("w", "interpret", "force_clamp", "sub_bits")
)
def lanes_general_final3_dual(
    tok_a2: jax.Array,
    tok_b2: jax.Array,
    cost_mat: jax.Array,
    gap_id,
    gap_open,
    m2: jax.Array,
    n2: jax.Array,
    *,
    w: int = DEFAULT_W,
    interpret: bool = False,
    force_clamp: bool | None = None,
    sub_bits: int = 0,
) -> jax.Array:
    """General-matrix :func:`lanes_batch_final3_dual` — (2, B, 3)
    finals for two same-shape tiles under ONE dual-set kernel (same
    matrix/scheme for both sets)."""
    final3, _, _ = _lanes_run(
        tok_a2, tok_b2,
        0, 0, 0, 0, gap_open,
        m2, n2, w, interpret, force_clamp, moves=False,
        cost_mat=jnp.asarray(cost_mat, jnp.int32), gap_id=gap_id,
        sub_bits=sub_bits, npar=2,
    )
    return final3


@functools.partial(
    jax.jit,
    static_argnames=(
        "cmatch", "cmismatch", "dcost", "icost", "gap_open", "w", "interpret",
        "force_clamp",
    ),
)
def lanes_batch_last_rows(
    tok_a_ext: jax.Array,
    tok_b_ext: jax.Array,
    cmatch,
    cmismatch,
    dcost,
    icost,
    gap_open,
    m_true: jax.Array,
    n_true: jax.Array,
    row0: jax.Array | None = None,
    col0y_top: jax.Array | None = None,
    *,
    w: int = DEFAULT_W,
    interpret: bool = False,
    force_clamp: bool | None = None,
) -> jax.Array:
    """(B, 3, S_p*w) FULL final DP rows (columns 1..S_p*w of row
    m_true), with optional boundary injection — the checkpoint-phase
    primitive of the blocked linear-space traceback (each block's fill
    is seeded from the previous block's last row, ops/linear_tb.py).

    ``row0`` (B, 3, >= n_pad+1): the triple row above the block;
    ``col0y_top`` (B,): column-0 Iy at the block's top row.  Injected
    calls require m_true >= 1 and n_true >= 1.
    """
    _, flat, _ = _lanes_run(
        jnp.asarray(tok_a_ext), jnp.asarray(tok_b_ext),
        cmatch, cmismatch, dcost, icost, gap_open,
        m_true, n_true, w, interpret, force_clamp, moves=False,
        row0=row0, col0y_top=col0y_top,
    )
    return flat.transpose(1, 0, 2)  # (B, 3, S_p*w)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cmatch", "cmismatch", "dcost", "icost", "gap_open", "w", "interpret",
        "force_clamp",
    ),
)
def lanes_batch_moves(
    tok_a_ext: jax.Array,
    tok_b_ext: jax.Array,
    cmatch,
    cmismatch,
    dcost,
    icost,
    gap_open,
    m_true: jax.Array,
    n_true: jax.Array,
    row0: jax.Array | None = None,
    col0y_top: jax.Array | None = None,
    *,
    w: int = DEFAULT_W,
    interpret: bool = False,
    force_clamp: bool | None = None,
):
    """Traceback-capable batched fill: (final3 (B, 3), skewed moves).

    ``row0`` / ``col0y_top`` inject a block boundary exactly as in
    :func:`lanes_batch_last_rows` (the replay-phase primitive of the
    blocked traceback — codes of row-1 cells then point at the injected
    row's argmins).

    ``moves`` comes back in the kernel's skewed device layout —
    ``(G_rows * w, R, 128)`` uint8 where row ``g*w + p`` holds wave g,
    phase p, and cell (i, j) of pair b lives at wave
    ``g = i-1 + 2*((j-1)//w)``, phase ``(j-1) % w``, strip
    ``b*S_p + (j-1)//w``.  Convert to the row-major walk layout with
    :func:`lanes_moves_to_row` (plain numpy slice-copies on the host —
    a device-side unskew gather measured ~8x slower than the fill
    itself on v5e).  Codes at real cells are bit-identical to
    :func:`fill_pallas.stacked_fill_with_moves` / the row scan; cells
    beyond (m_true, n_true) or whose value involved a BIG boundary can
    differ (no optimal path visits one).
    """
    final3, _, mv = _lanes_run(
        jnp.asarray(tok_a_ext), jnp.asarray(tok_b_ext),
        cmatch, cmismatch, dcost, icost, gap_open,
        m_true, n_true, w, interpret, force_clamp, moves=True,
        row0=row0, col0y_top=col0y_top,
    )
    return final3, mv


def lanes_moves_to_row(
    mv: "np.ndarray", B: int, n_pad: int, w: int, m_pad: int
):
    """Host unskew of :func:`lanes_batch_moves` output to the row-major
    walk layout: (B, m_pad+1, 1 + S_p*w) uint8, ``out[b, i, j]`` = code
    of cell (i, j).  Row 0 / column 0 are zero-filled — the walk
    short-circuits there without reading codes, exactly like the
    reference's boundary shortcuts (globaligner.py:542-581).

    Per strip q the map is a plain shift (rows 2q .. 2q+m_pad-1 of the
    wave axis), so the whole conversion is S_p contiguous slice-copies.
    """
    import numpy as np

    S_p, R = _lanes_geometry(B, n_pad, w, moves=True)
    mv = np.asarray(mv)
    G_rows = mv.shape[0] // w
    skew = mv.reshape(G_rows, w, R * LANES)[:, :, : B * S_p]
    skew = skew.reshape(G_rows, w, B, S_p)
    out = np.zeros((B, m_pad + 1, 1 + S_p * w), np.uint8)
    for q in range(S_p):
        out[:, 1:, 1 + q * w : 1 + (q + 1) * w] = (
            skew[2 * q : 2 * q + m_pad, :, :, q].transpose(2, 0, 1)
        )
    return out


def _latency_cost(B: int, m: int, n_pad: int, w: int, asel: int = 0) -> int:
    """Single-call LATENCY model: waves x (fixed + phase-tiles).

    Unlike :func:`_issue_cost` (which ranks widths at a fixed wave
    budget), this weights the measured per-wave economics on v5e
    (docs/PERF.md): ~185 ns FIXED per wave (edge shifts, history
    rotation, DMA staging) vs ~4.5 ns per (phase x sublane-tile) — a
    ~41:1 ratio.  It decides wave-count tradeoffs such as the
    meet-in-the-middle split, where halving the waves doubles the
    strips."""
    c_wave, c_pt = LATENCY_WAVE_COST, 1 + asel // 8
    S_p, R = _lanes_geometry(B, n_pad, w)
    tiles = -(-R // 8)
    return (m + 2 * (S_p - 1)) * (c_wave + w * tiles * c_pt)


def lanes_split_plan(
    mcap: int, ncap: int, pad_quantum: int = 128, asel: int = 0
) -> tuple[int, int] | None:
    """(w, mh) for the meet-in-the-middle lanes fill of an
    (mcap, ncap)-capacity pair, or None when the split cannot win.

    The split stacks the forward top half and the reversed bottom half
    as one 2-pair call: the wave count halves (waves carry the serial
    per-wave fixed cost — the single-pair bottleneck, docs/PERF.md)
    while the strip count doubles.  It wins whenever the doubled strips
    still pack into few sublane tiles, which the per-wave latency model
    decides; a margin declines near-ties so tiny pairs keep the simpler
    direct fill."""
    q = max(1, pad_quantum)
    half_cap = -(-mcap // 2)
    mh = max(q, q * (-(-half_cap // q)))
    w1 = pick_w(1, mcap, ncap)
    direct = _latency_cost(1, mcap, ncap, w1, asel)
    best = None
    for w in _w_candidates(2, ncap):
        if lanes_vmem_bytes(2, ncap, w, asel=asel) > LANES_VMEM_BUDGET:
            continue
        cost = _latency_cost(2, mh, ncap, w, asel)
        if best is None or cost < best[0]:
            best = (cost, w)
    if _debug_dispatch():
        _logger.info(
            "lanes_split_plan(m=%d, n=%d, asel=%d): direct w=%d "
            "latency=%d, split best=%s -> %s", mcap, ncap, asel, w1,
            direct, best,
            "decline" if (best is None or best[0] * 10 >= direct * 9)
            else f"w={best[1]} mh={mh}",
        )
    if best is None or best[0] * 10 >= direct * 9:
        return None
    return best[1], mh


@functools.partial(
    jax.jit,
    static_argnames=(
        "cmatch", "cmismatch", "dcost", "icost", "gap_open", "w",
        "pad_quantum", "interpret", "force_clamp", "sub_bits",
    ),
)
def lanes_split_fill_cost(
    tok_a_ext: jax.Array,
    tok_b_ext: jax.Array,
    cmatch,
    cmismatch,
    dcost,
    icost,
    gap_open,
    m_true=None,
    n_true=None,
    *,
    cost_mat: jax.Array | None = None,
    gap_id=None,
    w: int | None = None,
    pad_quantum: int = 128,
    interpret: bool = False,
    force_clamp: bool | None = None,
    sub_bits: int = 0,
) -> jax.Array:
    """Meet-in-the-middle optimal cost on the LANE kernel (scalar int32;
    uniform schemes, any m, n >= 0, lengths traced).

    Math (identical to :func:`fill_pallas.split_fill_cost`, reference
    Myers-Miller over the Gotoh recurrence of globaligner.py:317-392):
    split seq_1 at ``mid = m // 2``; forward-fill the top half and the
    REVERSED bottom half against forward/reversed seq_2 as one stacked
    2-pair lanes call; any optimal path crosses row ``mid`` at some
    column j arriving in level L and leaving in level L', so

        cost = min_{j,L,L'} F_L(mid, j) + G_{L'}(m-mid, n-j)
                            - go * [L == L' in {Ix, Iy}]

    where the correction removes the double-charged open of a gap run
    spanning the split.  Why this beats the direct lanes fill: the
    single-pair fill is bound by the per-WAVE fixed cost (~170-200 ns of
    edge shifts, docs/PERF.md), and the wave count is m + 2*(n/w - 1);
    stacking the halves runs both in the same waves — ~m/2 + 2*(n/w - 1)
    waves for the same total cells, and at 10 kb the doubled strips
    still fit one (8, 128) sublane tile at the re-picked w.

    ``cost_mat``/``gap_id`` switch the halves to GENERAL-matrix mode
    (any substitution/gap structure; the ``cmatch..icost`` scalars are
    then ignored) — the column-0 join values come from per-character
    gap-cost prefix sums instead of ``go + i*icost``.
    """
    mcap = tok_a_ext.shape[0] - 1
    ncap = tok_b_ext.shape[0] - 1
    if m_true is None:
        m_true = mcap
    if n_true is None:
        n_true = ncap
    m_true = jnp.asarray(m_true, jnp.int32)
    n_true = jnp.asarray(n_true, jnp.int32)
    mid = m_true // 2
    go = jnp.asarray(gap_open, jnp.int32)
    ico = jnp.asarray(icost, jnp.int32)
    tok_a_i = jnp.asarray(tok_a_ext, jnp.int32)
    tok_b_i = jnp.asarray(tok_b_ext, jnp.int32)
    asel = 0 if cost_mat is None else int(cost_mat.shape[0])

    q = max(1, pad_quantum)
    half_cap = -(-mcap // 2)
    mh = max(q, q * (-(-half_cap // q)))
    if w is None:
        plan = lanes_split_plan(mcap, ncap, pad_quantum, asel)
        w = plan[0] if plan is not None else pick_w(2, mh, ncap)

    # Half extraction with traced lengths (dynamic gathers, same idiom
    # as split_fill_cost): top = rows 1..mid forward, bottom = rows
    # m..mid+1 reversed; seq_2 forward and reversed-by-true-length.
    ks = jnp.arange(mh + 1, dtype=jnp.int32)
    top_a = jnp.where(ks <= mid, tok_a_i[jnp.minimum(ks, mcap)], 0)
    bot_a = jnp.where(
        ks >= 1, tok_a_i[jnp.clip(m_true + 1 - ks, 0, mcap)], 0
    )
    js = jnp.arange(ncap + 1, dtype=jnp.int32)
    rev_b = jnp.where(
        js >= 1, tok_b_i[jnp.clip(n_true + 1 - js, 0, ncap)], 0
    )
    tok_a2 = jnp.stack([top_a, bot_a])
    tok_b2 = jnp.stack([tok_b_i, rev_b])
    m2 = jnp.stack([mid, m_true - mid])
    n2 = jnp.stack([n_true, n_true])

    if asel == 0:
        flat = lanes_batch_last_rows(
            tok_a2, tok_b2, cmatch, cmismatch, dcost, icost, gap_open,
            m2, n2, w=w, interpret=interpret, force_clamp=force_clamp,
        )  # (2, 3, S_p*w) = columns 1..S_p*w of row m2[k]
        # Column-0 Iy at each half's last row: go + i*icost.
        iy0 = go + m2 * ico  # (2,)
    else:
        flat = lanes_general_last_rows(
            tok_a2, tok_b2, cost_mat, gap_id, gap_open,
            m2, n2, w=w, interpret=interpret, force_clamp=force_clamp,
            sub_bits=sub_bits,
        )
        # Per-character gap-cost prefix sums over each half's tokens
        # (reference make_dp_array column structure generalized).
        cmj = jnp.asarray(cost_mat, jnp.int32)
        ics2 = cmj[tok_a2, jnp.asarray(gap_id, jnp.int32)]  # (2, mh+1)
        csum = jnp.cumsum(ics2.at[:, 0].set(0), axis=1)
        iy0 = go + jnp.take_along_axis(csum, m2[:, None], axis=1)[:, 0]

    # Prepend column 0: (BIG, BIG, Iy(m_k, 0)) for m_k >= 1, the
    # (0,0,0) corner for a zero-row half (reference make_dp_array
    # column structure, globaligner.py:756-821).
    def col0(mk, iy):
        z = mk == 0
        return jnp.stack(
            [
                jnp.where(z, 0, BIG),
                jnp.where(z, 0, BIG),
                jnp.where(z, 0, iy),
            ]
        )

    F_full = jnp.concatenate([col0(m2[0], iy0[0])[:, None], flat[0]], axis=1)
    G_full = jnp.concatenate([col0(m2[1], iy0[1])[:, None], flat[1]], axis=1)

    half_big = BIG // 2
    wp = F_full.shape[-1]
    jw = jnp.arange(wp, dtype=jnp.int32)
    valid = jw <= n_true
    F = jnp.where(valid, jnp.minimum(F_full, half_big), half_big)
    G = jnp.minimum(G_full, half_big)
    Gj = jnp.where(
        valid,
        jnp.take(G, jnp.clip(n_true - jw, 0, wp - 1), axis=1),
        half_big,
    )

    # A zero-row half contributes its boundary row, whose corner holds 0
    # in ALL three lanes; the Ix/Iy "levels" there are fictitious (no
    # gap run reaches the corner) — mask them so the gap-continuation
    # correction cannot undercount by gap_open (split_fill_cost's
    # identical guard).
    lane3 = jnp.arange(3, dtype=jnp.int32)[:, None]
    F = jnp.where(
        (lane3 >= 1) & (jw[None, :] == 0) & (mid == 0), half_big, F
    )
    Gj = jnp.where(
        (lane3 >= 1) & (jw[None, :] == n_true) & (m_true - mid == 0),
        half_big,
        Gj,
    )

    combo = F[:, None, :] + Gj[None, :, :]  # (L, L', j)
    corr = jnp.zeros((3, 3), jnp.int32)
    corr = corr.at[1, 1].set(go)
    corr = corr.at[2, 2].set(go)
    return jnp.min(combo - corr[:, :, None])


@functools.partial(
    jax.jit,
    static_argnames=(
        "cmatch", "cmismatch", "dcost", "icost", "gap_open", "w", "interpret",
    ),
)
def lanes_fill_cost(
    tok_a_ext: jax.Array,
    tok_b_ext: jax.Array,
    cmatch,
    cmismatch,
    dcost,
    icost,
    gap_open,
    m_true=None,
    n_true=None,
    *,
    w: int = DEFAULT_W,
    interpret: bool = False,
) -> jax.Array:
    """Scalar optimal cost of one pair (uniform schemes, any m, n >= 0).

    Single-pair entry: (m+1,) / (n+1,) token buffers, traced true
    lengths (defaulting to the buffer capacities).
    """
    mcap = tok_a_ext.shape[0] - 1
    ncap = tok_b_ext.shape[0] - 1
    if m_true is None:
        m_true = mcap
    if n_true is None:
        n_true = ncap
    final3 = lanes_batch_final3(
        jnp.asarray(tok_a_ext)[None, :],
        jnp.asarray(tok_b_ext)[None, :],
        cmatch,
        cmismatch,
        dcost,
        icost,
        gap_open,
        jnp.asarray(m_true, jnp.int32)[None],
        jnp.asarray(n_true, jnp.int32)[None],
        w=w,
        interpret=interpret,
    )
    return jnp.min(final3[0])
