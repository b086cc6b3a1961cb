"""General-matrix (select-chain) lane kernel: does the round-4
occupancy lever (wider strips) transfer?  Sweeps w in {16, 32, 64} at
A=25 (BLOSUM-sized) and A=5, batch and single-split, within one run.
Also times the w=64 Mosaic compile (the select chain multiplies the
unrolled code by A — the reason general mode was capped at 32).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_general_w64.py
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

    def costmat(A, seed):
        rng = np.random.default_rng(seed)
        m = rng.integers(1, 9, (A, A)).astype(np.int32)
        m = np.minimum(m, m.T)
        np.fill_diagonal(m, 0)
        m[-1, :] = 3
        m[:, -1] = 3
        m[-1, -1] = 0
        return m

    def make_batch(B, L, A, w):
        rng = np.random.default_rng(0)
        tok_a = np.zeros((B, L + 1), np.int32)
        tok_b = np.zeros((B, L + 1), np.int32)
        tok_a[:, 1:] = rng.integers(0, A - 1, (B, L))
        tok_b[:, 1:] = rng.integers(0, A - 1, (B, L))
        cm = jnp.asarray(costmat(A, 1))
        m_true = jnp.full((B,), L, jnp.int32)
        n_true = jnp.full((B,), L, jnp.int32)
        tbb = jnp.asarray(tok_b)

        def one(ta):
            return jnp.sum(fl.lanes_general_final3(
                ta, tbb, cm, A - 1, 4, m_true, n_true, w=w
            ))

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k(tas, k):
            return sum(one(tas[i]) for i in range(k))

        def tas_of(k):
            return jnp.asarray(
                np.stack([np.roll(tok_a, i, axis=1) for i in range(k)])
            )

        return run_k, tas_of

    cases = [
        ("A25_B32_w16", 32, 1024, 25, 16),
        ("A25_B32_w32", 32, 1024, 25, 32),
        ("A25_B32_w64", 32, 1024, 25, 64),
        ("A5_B64_w32", 64, 1024, 5, 32),
        ("A5_B64_w64", 64, 1024, 5, 64),
        ("A5_B64_w128", 64, 1024, 5, 128),
    ]
    built = {}
    sums = {}
    for name, B, L, A, w in cases:
        t0 = time.perf_counter()
        try:
            run_k, tas_of = make_batch(B, L, A, w)
            s = int(np.asarray(run_k(tas_of(2), 2)))
            key = (B, L, A)
            if key in sums and sums[key] != s:
                print(json.dumps({"MISMATCH": name}), flush=True)
            sums[key] = s
            built[name] = (run_k, tas_of, B, L)
            print(json.dumps({"compiled": name,
                              "compile_s": round(time.perf_counter() - t0, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 - probe
            print(json.dumps({name: f"{type(e).__name__}: {e}"[:150]}),
                  flush=True)

    def measure(run_k, tas_of, lo=2, hi=10, reps=5):
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
        for name, (run_k, tas_of, B, L) in built.items():
            per = measure(run_k, tas_of)
            row[name] = round(B * L * L / per / 1e9, 2)
            row[f"{name}_ms"] = round(per * 1e3, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
