"""Bisect the round-3 batch_gcups drop (BENCH_r03 26.98 vs round-2's 140-400).

Within ONE TPU run, interleaved (fair under tunnel/chip drift):
  - r3_w32 : current fill_lanes.lanes_batch_final3, w=32 (bench.py config)
  - r2_w32 : round-2 (f84c6c4) fill_lanes, same call — needs the round-2
             tree extracted to /tmp/r2tree/globalign_tpu_r2 (renamed pkg):
               git archive f84c6c4 globalign_tpu | tar -x -C /tmp/r2tree
               mv .../globalign_tpu .../globalign_tpu_r2 && sed rename imports
  - r3_w16 / r3_w8 : w sweep of the current kernel
  - single : current 10kb split fill (the bench.py headline config)
  - calib  : fixed VPU multiply-add loop — chip effective-speed normalizer

If r2_w32 ≈ r3_w32, the gap vs round-2's 140-400 is chip drift (calib
tells how far today's chip is from nominal).  If r2_w32 >> r3_w32, round
3's kernel changes (injection/general-mode) regressed the uniform batch.

PYTHONPATH=/root/.axon_site:/root/repo:/tmp/r2tree python scratch/ab_r2_batch.py
"""

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from globalign_tpu.ops import fill_lanes as r3

    try:
        from globalign_tpu_r2.ops import fill_lanes as r2
    except ImportError:
        r2 = None

    B, L = 64, 1024
    rng = np.random.default_rng(0)
    tok_a = np.zeros((B, L + 1), np.int32)
    tok_b = np.zeros((B, L + 1), np.int32)
    tok_a[:, 1:] = rng.integers(0, 4, (B, L))
    tok_b[:, 1:] = rng.integers(0, 4, (B, L))
    # bench.py's uniform DNA costing scheme: match 0, mismatch 5, gaps 3.
    cma, cmm, dco, ico = 0, 5, 3, 3
    m_true = jnp.full((B,), L, jnp.int32)
    n_true = jnp.full((B,), L, jnp.int32)
    tbb = jnp.asarray(tok_b)

    def batch_one(mod, w):
        def one(ta):
            vals = mod.lanes_batch_final3(
                ta, tbb, cma, cmm, dco, ico, 4, m_true, n_true, w=w
            )
            return jnp.sum(vals)

        return one

    # 10kb single-pair split (bench.py headline config).
    M1 = 10_000
    ta1 = np.zeros((M1 + 1,), np.int32)
    tb1 = np.zeros((M1 + 1,), np.int32)
    ta1[1:] = rng.integers(0, 4, M1)
    tb1[1:] = rng.integers(0, 4, M1)
    tb1j = jnp.asarray(tb1)
    sp = r3.lanes_split_plan(M1, M1)

    def single_one(ta):
        if sp is not None:
            return r3.lanes_split_fill_cost(
                ta, tb1j, cma, cmm, dco, ico, 4, M1, M1, w=sp[0]
            )
        return r3.lanes_fill_cost(ta, tb1j, cma, cmm, dco, ico, 4, M1, M1)

    # Calibration: fixed VPU multiply-add loop, no globalign code.
    CAL_IT, CAL_SHAPE = 20_000, (256, 1024)

    def calib_one(x):
        def body(_, v):
            return v * 1.000001 + 0.5

        return jnp.sum(lax.fori_loop(0, CAL_IT, body, x))

    def make_runk(one):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k(tas, k):
            return sum(one(tas[i]) for i in range(k))

        return run_k

    def measure(run_k, tas_of, lo, hi, reps=6):
        ts = {}
        tas = {k: tas_of(k) for k in (lo, hi)}
        for k in (lo, hi):
            np.asarray(run_k(tas[k], k))  # compile
        for _ in range(reps):
            for k in (lo, hi):
                t0 = time.perf_counter()
                np.asarray(run_k(tas[k], k))
                ts.setdefault(k, []).append(time.perf_counter() - t0)
        per = (min(ts[hi]) - min(ts[lo])) / (hi - lo)
        return max(per, 1e-9), ts

    def batch_tas(k):
        return jnp.asarray(np.stack([np.roll(tok_a, i, axis=1) for i in range(k)]))

    def single_tas(k):
        return jnp.asarray(np.stack([np.roll(ta1, i) for i in range(k)]))

    def calib_tas(k):
        r = np.random.default_rng(1)
        return jnp.asarray(
            r.normal(size=(k,) + CAL_SHAPE).astype(np.float32) * 0.01
        )

    contenders = {
        "r3_w32": (make_runk(batch_one(r3, 32)), batch_tas, 2, 24,
                   lambda p: B * L * L / p / 1e9),
        "r3_w16": (make_runk(batch_one(r3, 16)), batch_tas, 2, 24,
                   lambda p: B * L * L / p / 1e9),
        "r3_w8": (make_runk(batch_one(r3, 8)), batch_tas, 2, 24,
                  lambda p: B * L * L / p / 1e9),
        "single": (make_runk(single_one), single_tas, 2, 12,
                   lambda p: M1 * M1 / p / 1e9),
        "calib": (make_runk(calib_one), calib_tas, 2, 12,
                  lambda p: CAL_IT * CAL_SHAPE[0] * CAL_SHAPE[1] * 2 / p / 1e9),
    }
    if r2 is not None:
        contenders["r2_w32"] = (
            make_runk(batch_one(r2, 32)), batch_tas, 2, 24,
            lambda p: B * L * L / p / 1e9,
        )

    # Bit-exactness cross-check first (also warms the compile cache).
    sums = {}
    for name, (run_k, tas_of, lo, _hi, _g) in contenders.items():
        if name in ("calib", "single"):
            continue
        sums[name] = int(np.asarray(run_k(tas_of(2), 2)))
    print(json.dumps({"sums": sums, "match": len(set(sums.values())) == 1}),
          flush=True)

    for rnd in range(3):
        row = {"round": rnd}
        for name, (run_k, tas_of, lo, hi, gcups) in contenders.items():
            per, _ = measure(run_k, tas_of, lo, hi)
            row[name] = round(gcups(per), 2)
            row[f"{name}_ms"] = round(per * 1e3, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
