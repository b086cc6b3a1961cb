"""Round-4 batch headroom map: GCUPS vs B (tile count) and w=64 probe.

The issue model says batch GCUPS is flat in B (ops scale with sublane
tiles), so if measured GCUPS GROWS with B the per-wave fixed cost is
under-modeled; if flat at ~27 the kernel is ~0.5 vector-issue-efficient
and the lever is ops/cell, not batching.  w=64 halves the tile count at
B=64/L=1024 (R=8 -> one (8,128) tile) — probes whether fewer, wider
strips beat the w=32 dispatch despite Mosaic code-size growth.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_batch_bsweep2.py
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

    L = 1024
    cma, cmm, dco, ico = 0, 5, 3, 3

    def make(B, w):
        rng = np.random.default_rng(0)
        tok_a = np.zeros((B, L + 1), np.int32)
        tok_b = np.zeros((B, L + 1), np.int32)
        tok_a[:, 1:] = rng.integers(0, 4, (B, L))
        tok_b[:, 1:] = rng.integers(0, 4, (B, L))
        m_true = jnp.full((B,), L, jnp.int32)
        n_true = jnp.full((B,), L, jnp.int32)
        tbb = jnp.asarray(tok_b)

        def one(ta):
            return jnp.sum(fl.lanes_batch_final3(
                ta, tbb, cma, cmm, dco, ico, 4, m_true, n_true, w=w
            ))

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k(tas, k):
            return sum(one(tas[i]) for i in range(k))

        def tas_of(k):
            return jnp.asarray(
                np.stack([np.roll(tok_a, i, axis=1) for i in range(k)])
            )

        return run_k, tas_of

    cases = [(64, 32), (128, 32), (256, 32), (512, 32), (64, 64), (128, 64)]
    built = {}
    for B, w in cases:
        try:
            run_k, tas_of = make(B, w)
            np.asarray(run_k(tas_of(2), 2))  # compile lo
            built[(B, w)] = (run_k, tas_of)
        except Exception as e:  # noqa: BLE001 - probe
            print(json.dumps({"B": B, "w": w,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
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
        for (B, w), (run_k, tas_of) in built.items():
            per = measure(run_k, tas_of)
            model = fl._issue_cost(B, L, L, w, False) / 0.94e9
            row[f"B{B}_w{w}"] = round(B * L * L / per / 1e9, 2)
            row[f"B{B}_w{w}_ms"] = round(per * 1e3, 3)
            row[f"B{B}_w{w}_xmodel"] = round(per / model, 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
