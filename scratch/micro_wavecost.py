"""Itemize the single-pair per-wave FIXED cost (VERDICT r4 item 3).

The 10 kb single-pair fill sits at ~60-65 GCUPS vs the formulation's
90-115 bound; the residual was attributed to per-wave fixed work
(~4 cross-lane edge shifts, ring rotation, DMA staging) but never
measured per component.  This micro times skeleton Pallas kernels that
run G waves of (a) bare loop, (b) + w phases of representative ALU/
scratch work, then ablate IN each per-wave component on top:

  loop          fori_loop over G waves, one vector add
  phases        + w phases: scratch read, 4 mins, scratch store
  phases+shift  + 4 shift1 edge exchanges per wave (2 rolls + selects)
  phases+ring   + 4 ring reads/stores per wave ((2/3, R, 128) slots)
  phases+stage  + double-buffered HBM inject DMA + per-wave plane read
  full          all three
  phases2       TWO independent phase chains interleaved (2x the work):
                if t(phases2) << 2*t(phases), the per-phase dependency
                chain is latency-bound and interleaving independent
                tiles is the batch-throughput lever (ILP probe)
  full2         the full body with two interleaved chains

Shapes mirror the 10 kb split fill: R=8 (1024 strips), w=20.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_wavecost.py
"""

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from globalign_tpu.ops.fill_pallas import LANES, _lane_ops
    from globalign_tpu.ops.fill_scan import BIG

    import sys

    R = 8
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    # Long wave loop: the slope must clear ~35 ms tunnel noise.
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    STAGE = 256  # inject planes per DMA block (mirrors fill_lanes)

    def make(variant):
        shifts = variant in ("shift", "full", "full2", "fullpair",
                             "fullpairseq")
        rings = variant in ("ring", "full", "full2", "fullpair",
                            "fullpairseq")
        stage = variant in ("stage", "full", "full2", "fullpair",
                            "fullpairseq")
        phases = variant != "loop"
        nsets = 2 if variant in ("phases2", "full2", "fullpair",
                                 "fullpairseq") else 1
        # fullpair: EVERYTHING duplicated per set (shifts, rings, stage
        # reads, phase chains) — the honest model of one kernel
        # processing two independent R=8 tile sets per wave.
        # fullpairseq: same but sets run as SEQUENTIAL BLOCKS in the
        # written order (set 0's whole phase loop, then set 1's) — if
        # Mosaic's scheduler overlaps them anyway, the real kernel
        # change can be a mechanical outer loop over sets.
        dup_fixed = variant in ("fullpair", "fullpairseq")
        seq_sets = variant == "fullpairseq"

        def kernel(inj_hbm, out_ref, ah, emh, exh, zh, vbuf, stage_s, sems):
            lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
            shift1, _, _, _ = _lane_ops(lane, row)
            q0 = (row * LANES + lane) == 0

            if stage:
                def dma(blk, slot):
                    return pltpu.make_async_copy(
                        inj_hbm.at[pl.ds(blk * STAGE, STAGE)],
                        stage_s.at[slot],
                        sems.at[slot],
                    )

                dma(0, 0).start()
                dma(1, 1).start()

            def wave(g, _):
                g2 = jax.lax.rem(g, 2)
                g3 = jax.lax.rem(g, 3)
                if stage:
                    blk = jax.lax.div(g, STAGE)
                    slot = jax.lax.rem(blk, 2)

                    @pl.when(jax.lax.rem(g, STAGE) == 0)
                    def _stage():
                        dma(blk, slot).wait()

                        @pl.when(blk >= 1)
                        def _next():
                            dma(blk + 1, jax.lax.rem(blk + 1, 2)).start()

                    a_cur = stage_s[slot, jax.lax.rem(g, STAGE)]
                else:
                    a_cur = jnp.full((R, LANES), g, jnp.int32)

                nfix = 2 if dup_fixed else 1
                ins = []
                for t in range(nfix):
                    # Set t's ring slots: 2*t + g2 (ah/emh/exh are
                    # (4, R, 128)), 3*t + g3 (zh is (6, R, 128)) —
                    # same read-before-overwrite distances as the real
                    # kernel, per set.
                    if shifts:
                        ac = jnp.where(
                            q0, a_cur + t, shift1(ah[2 * t + g2], fill=0)
                        )
                        myp = jnp.where(q0, g, shift1(emh[2 * t + g2]))
                        xp = jnp.where(q0, BIG, shift1(exh[2 * t + g2]))
                        zd = jnp.where(q0, g, shift1(zh[3 * t + g3]))
                    elif rings or stage or phases:
                        ac = a_cur
                        myp = ah[g2] if rings else a_cur
                        xp = emh[g2] if rings else a_cur
                        zd = zh[g3] if rings else a_cur
                    else:
                        ac = a_cur
                        myp = xp = zd = a_cur
                    ins.append((ac, myp, xp, zd))

                if phases:
                    # nsets independent chains interleaved per phase:
                    # set t uses vbuf plane p for t==0, p+w for t==1.
                    st = [
                        [ins[t % nfix][3] + t, ins[t % nfix][1] + t,
                         ins[t % nfix][2], ins[t % nfix][1]]
                        for t in range(nsets)
                    ]
                    def one_phase(t, p):
                        z, my_c, xp_c, _v = st[t]
                        vprev = vbuf[t * w + p]
                        m_new = z + 1
                        y_new = vprev + 1
                        x_new = jnp.minimum(my_c + 4, xp_c) + 3
                        my = jnp.minimum(m_new, y_new)
                        z = jnp.minimum(my, x_new)
                        v = jnp.minimum(z + 4, y_new)
                        vbuf[t * w + p] = v
                        st[t] = [z, my, x_new, v]

                    if seq_sets:
                        for t in range(nsets):
                            for p in range(w):
                                one_phase(t, p)
                    else:
                        for p in range(w):
                            for t in range(nsets):
                                one_phase(t, p)
                    z, myp, xp, v = st[0]
                else:
                    z, v = ins[0][3], ins[0][1]
                    myp, xp = ins[0][1], ins[0][2]

                if rings or shifts:
                    for t in range(nfix):
                        zt, myt, xt = (
                            (z, myp, xp) if t == 0
                            else (st[1][0], st[1][1], st[1][2])
                        )
                        ah[2 * t + g2] = ins[t][0]
                        emh[2 * t + g2] = myt
                        exh[2 * t + g2] = xt
                        zh[3 * t + g3] = zt
                out_ref[0] = out_ref[0] + v
                return 0

            out_ref[0] = jnp.zeros((R, LANES), jnp.int32)
            jax.lax.fori_loop(0, G, wave, 0)
            if stage:
                lastblk = jax.lax.div(G - 1, STAGE) + 1
                dma(lastblk, jax.lax.rem(lastblk, 2)).wait()

        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, R, LANES), lambda i: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, R, LANES), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((4, R, LANES), jnp.int32),
                pltpu.VMEM((4, R, LANES), jnp.int32),
                pltpu.VMEM((4, R, LANES), jnp.int32),
                pltpu.VMEM((6, R, LANES), jnp.int32),
                pltpu.VMEM((2 * w, R, LANES), jnp.int32),
                pltpu.VMEM((2, STAGE, R, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

    inj = jnp.zeros(((-(-G // STAGE) + 3) * STAGE, R, LANES), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("variant", "k"))
    def run_k(variant, k):
        f = make(variant)
        tot = jnp.int32(0)
        for i in range(k):
            tot = tot + jnp.sum(f(inj + i))
        return tot

    variants = ["loop", "phases", "shift", "ring", "stage", "full",
                "phases2", "full2", "fullpair", "fullpairseq"]
    LO, HI = 2, 22
    for v in variants:
        np.asarray(run_k(v, LO))  # warm
        np.asarray(run_k(v, HI))

    out = {}
    for rep in range(5):
        for v in variants:
            t0 = time.perf_counter()
            np.asarray(run_k(v, LO))
            t1 = time.perf_counter()
            np.asarray(run_k(v, HI))
            t2 = time.perf_counter()
            per_wave_ns = (t2 - t1 - (t1 - t0)) / (HI - LO) / G * 1e9
            out.setdefault(v, []).append(round(per_wave_ns, 1))
    summary = {v: sorted(ts)[len(ts) // 2] for v, ts in out.items()}
    base = summary["phases"]
    print(json.dumps({"metric": "wave_fixed_cost", "R": R, "w": w, "G": G,
                      "per_wave_ns": summary,
                      "delta_vs_phases_ns": {
                          v: round(summary[v] - base, 1)
                          for v in ("shift", "ring", "stage", "full")
                      },
                      # 2x work in <2x time => chain latency-bound;
                      # the interleave factor is the headroom.
                      "ilp_x2_time_ratio": round(
                          summary["phases2"] / max(base, 1e-9), 2
                      ),
                      "ilp_full_x2_ratio": round(
                          summary["full2"] / max(summary["full"], 1e-9), 2
                      ),
                      # 2x EVERYTHING (shifts+rings+stage+chains) in one
                      # kernel vs 1x: the dual-tile-set kernel's honest
                      # per-wave cost ratio (throughput gain = 2/ratio).
                      "dual_tile_ratio": round(
                          summary["fullpair"] / max(summary["full"], 1e-9),
                          2,
                      ),
                      "dual_tile_seq_ratio": round(
                          summary["fullpairseq"]
                          / max(summary["full"], 1e-9),
                          2,
                      ),
                      "samples": out}), flush=True)


if __name__ == "__main__":
    main()
