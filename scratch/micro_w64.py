"""w=64 qualification: correctness on ragged lengths, moves-mode probe,
and a single-pair split w-sweep — the round-4 follow-up to
scratch/micro_batch_bsweep2.py's finding that w=64 runs the 64x1kb batch
1.7x faster than the dispatched w=32 (the _w_candidates cap).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_w64.py
"""

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from globalign_tpu.ops import fill_lanes as fl

    print(json.dumps({"device": jax.devices()[0].device_kind}), flush=True)
    cma, cmm, dco, ico = 0, 5, 3, 3

    # --- Correctness: ragged batch, w=64 vs the pinned w=8 ---------------
    rng = np.random.default_rng(5)
    B, Mp, Np = 8, 1024, 1024
    m_t = np.array([30, 64, 65, 1000, 128, 1, 513, 1024], np.int32)
    n_t = np.array([64, 30, 1000, 65, 1, 129, 1024, 997], np.int32)
    tok_a = np.zeros((B, Mp + 1), np.int32)
    tok_b = np.zeros((B, Np + 1), np.int32)
    for i in range(B):
        tok_a[i, 1 : m_t[i] + 1] = rng.integers(0, 4, m_t[i])
        tok_b[i, 1 : n_t[i] + 1] = rng.integers(0, 4, n_t[i])
    taj, tbj = jnp.asarray(tok_a), jnp.asarray(tok_b)
    mtj, ntj = jnp.asarray(m_t), jnp.asarray(n_t)
    ref = np.asarray(fl.lanes_batch_final3(
        taj, tbj, cma, cmm, dco, ico, 4, mtj, ntj, w=8))
    got = np.asarray(fl.lanes_batch_final3(
        taj, tbj, cma, cmm, dco, ico, 4, mtj, ntj, w=64))
    print(json.dumps({"w64_ragged_match": bool((ref == got).all()),
                      "ref": ref.min(axis=1).tolist(),
                      "got": got.min(axis=1).tolist()}), flush=True)

    # --- Moves-mode probe at w=64 (compile cost + match vs w=8) ----------
    try:
        t0 = time.perf_counter()
        v8, mv8 = fl.lanes_batch_moves(
            taj, tbj, cma, cmm, dco, ico, 4, mtj, ntj, w=8)
        v64, mv64 = fl.lanes_batch_moves(
            taj, tbj, cma, cmm, dco, ico, 4, mtj, ntj, w=64)
        jax.block_until_ready((v8, v64))
        # Move codes live in different skewed layouts; compare finals.
        print(json.dumps({
            "moves_w64_final_match": bool(
                (np.asarray(v8) == np.asarray(v64)).all()),
            "moves_probe_s": round(time.perf_counter() - t0, 1),
        }), flush=True)
    except Exception as e:  # noqa: BLE001 - probe
        print(json.dumps({"moves_w64_error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)

    # --- Single-pair 10kb: split w sweep + direct, interleaved ----------
    M1 = 10_000
    ta1 = np.zeros((M1 + 1,), np.int32)
    tb1 = np.zeros((M1 + 1,), np.int32)
    ta1[1:] = rng.integers(0, 4, M1)
    tb1[1:] = rng.integers(0, 4, M1)
    tb1j = jnp.asarray(tb1)

    def split_at(w):
        def one(ta):
            return fl.lanes_split_fill_cost(
                ta, tb1j, cma, cmm, dco, ico, 4, M1, M1, w=w)

        return one

    def direct(w):
        def one(ta):
            return fl.lanes_fill_cost(
                ta, tb1j, cma, cmm, dco, ico, 4, M1, M1, w=w)

        return one

    def make_runk(one):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k(tas, k):
            return sum(one(tas[i]) for i in range(k))

        return run_k

    def tas_of(k):
        return jnp.asarray(np.stack([np.roll(ta1, i) for i in range(k)]))

    cases = {
        "split_w20": make_runk(split_at(20)),
        "split_w32": make_runk(split_at(32)),
        "split_w64": make_runk(split_at(64)),
        "direct_w10": make_runk(direct(10)),
        "direct_w16": make_runk(direct(16)),
    }
    sums = {}
    built = {}
    for name, run_k in cases.items():
        try:
            sums[name] = int(np.asarray(run_k(tas_of(2), 2)))
            built[name] = run_k
        except Exception as e:  # noqa: BLE001 - probe
            sums[name] = f"{type(e).__name__}"[:80]
    print(json.dumps({"single_sums": sums,
                      "match": len({v for v in sums.values()
                                    if isinstance(v, int)}) == 1}),
          flush=True)

    def measure(run_k, lo=2, hi=12, reps=5):
        tas = {k: tas_of(k) for k in (lo, hi)}
        for k in (lo, hi):
            np.asarray(run_k(tas[k], k))
        best = {lo: float("inf"), hi: float("inf")}
        for _ in range(reps):
            for k in (lo, hi):
                t0 = time.perf_counter()
                np.asarray(run_k(tas[k], k))
                best[k] = min(best[k], time.perf_counter() - t0)
        return max((best[hi] - best[lo]) / (hi - lo), 1e-9)

    for rnd in range(2):
        row = {"round": rnd}
        for name, run_k in built.items():
            per = measure(run_k)
            row[name] = round(M1 * M1 / per / 1e9, 2)
            row[f"{name}_ms"] = round(per * 1e3, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
