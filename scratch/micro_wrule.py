"""Validate the round-4 empirical width rule at other lengths before it
ships: "largest candidate w with R >= 4 lane-chunks, tile capped at
R <= 16".  Derived from the L=1024 sweeps (micro_batch_bsweep2,
micro_tilecap); this probes L=128 and L=4096, re-measures the degenerate
B8_w32 point, and probes w=128 (not yet a candidate).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_wrule.py
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

    def make(B, L, w):
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

    # (label, B, L, w)
    cases = [
        ("L128_B64_w8", 64, 128, 8),     # old model pick
        ("L128_B64_w16", 64, 128, 16),   # new rule pick (R=4)
        ("L128_B64_w32", 64, 128, 32),   # R=2 (beyond the rule)
        ("L4096_B16_w16", 16, 4096, 16), # old model pick? R=32
        ("L4096_B16_w32", 16, 4096, 32), # R=16
        ("L4096_B16_w64", 16, 4096, 64), # new rule pick (R=8)
        ("B8_w32_redo", 8, 1024, 32),    # degenerate slope last run
        ("B128_w128", 128, 1024, 128),   # beyond-candidate probe
    ]
    built = {}
    for name, B, L, w in cases:
        try:
            run_k, tas_of = make(B, L, w)
            np.asarray(run_k(tas_of(2), 2))
            built[name] = (run_k, tas_of, B, L)
        except Exception as e:  # noqa: BLE001 - probe
            print(json.dumps({name: f"{type(e).__name__}: {e}"[:150]}),
                  flush=True)

    def measure(run_k, tas_of, lo, hi, reps=5):
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
            # Short pairs need longer chains for a clean slope.
            lo, hi = (2, 40) if L <= 128 else (2, 10)
            per = measure(run_k, tas_of, lo, hi)
            row[name] = round(B * L * L / per / 1e9, 2)
            row[f"{name}_us"] = round(per * 1e6, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
