"""Real-TPU single-chip batch-size curve: pairs/s and GCUPS vs B through
the production cost-only dispatch (fill_pallas.batch_final3 — lane
kernel, lanes_plan width, VMEM tile splitting).  One measured point per
scaling dimension for BASELINE.md's pairs/s axis (VERDICT r3 item 4).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/bench_bcurve.py [L]
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from globalign_tpu.ops import fill_lanes, fill_pallas

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print(json.dumps({"device": jax.devices()[0].device_kind, "L": L}),
          flush=True)
    cma, cmm, dco, ico = 0, 5, 3, 3
    uni = (cma, cmm, dco, ico)

    def make(B):
        rng = np.random.default_rng(0)
        tok_a = np.zeros((B, L + 1), np.int32)
        tok_b = np.zeros((B, L + 1), np.int32)
        tok_a[:, 1:] = rng.integers(0, 4, (B, L))
        tok_b[:, 1:] = rng.integers(0, 4, (B, L))
        m_true = jnp.full((B,), L, jnp.int32)
        n_true = jnp.full((B,), L, jnp.int32)
        tbb = jnp.asarray(tok_b)
        cost_mat = jnp.zeros((5, 5), jnp.int32)  # placeholder; uniform= wins

        def one(ta):
            return jnp.sum(fill_pallas.batch_final3(
                ta, tbb, cost_mat, jnp.int32(4), jnp.int32(4),
                m_true, n_true, uniform=uni, gap_open_static=4,
            ))

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k(tas, k):
            return sum(one(tas[i]) for i in range(k))

        def tas_of(k):
            return jnp.asarray(
                np.stack([np.roll(tok_a, i, axis=1) for i in range(k)])
            )

        return run_k, tas_of

    for B in (1, 8, 64, 256, 512):
        plan = fill_lanes.lanes_plan(B, L, L)
        try:
            run_k, tas_of = make(B)
            lo, hi = 2, max(4, min(24, 4096 // B))
            tas = {k: tas_of(k) for k in (lo, hi)}
            for k in (lo, hi):
                np.asarray(run_k(tas[k], k))
            best = {lo: float("inf"), hi: float("inf")}
            for _ in range(5):
                for k in (lo, hi):
                    t0 = time.perf_counter()
                    np.asarray(run_k(tas[k], k))
                    best[k] = min(best[k], time.perf_counter() - t0)
            per = max((best[hi] - best[lo]) / (hi - lo), 1e-9)
            print(json.dumps({
                "B": B, "plan": plan,
                "pairs_per_s": round(B / per, 1),
                "gcups": round(B * L * L / per / 1e9, 2),
                "ms_per_call": round(per * 1e3, 3),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 - probe
            print(json.dumps({"B": B,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
