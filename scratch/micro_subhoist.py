"""TPU A/B: general-mode substitution select chain with the token
compare masks HOISTED out of the w-phase loop vs recomputed per phase
(fill_lanes._SUB_MASK_HOIST).  Interleaved in one process: the toggle
changes the traced kernel, so flipping it + jax.clear_caches() retraces
(the XLA persistent cache still dedups remote compiles per variant).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_subhoist.py [A] [B] [m]
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    A = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    import jax
    import jax.numpy as jnp

    from globalign_tpu.ops import fill_lanes
    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    n = m
    rng = np.random.default_rng(11)
    gid = A - 1
    cm = rng.integers(3, 9, (A, A)).astype(np.int32)
    np.fill_diagonal(cm, 0)
    cm[gid, :] = rng.integers(2, 5, A)
    cm[:, gid] = rng.integers(2, 5, A)
    cm[gid, gid] = 0
    cmj = jnp.asarray(cm)
    go = jnp.int32(4)

    ta = np.zeros((B, m + 1), np.int32)
    tb = np.zeros((B, n + 1), np.int32)
    ta[:, 1:] = rng.integers(0, A - 1, (B, m))
    tb[:, 1:] = rng.integers(0, A - 1, (B, n))
    mtj = jnp.full((B,), m, jnp.int32)
    ntj = jnp.full((B,), n, jnp.int32)

    plan = fill_lanes.lanes_plan(B, m, n, asel=A)
    print(json.dumps({"A": A, "B": B, "m": m, "plan": plan}), flush=True)
    w = plan[0]

    K_LO, K_HI = 2, 10

    def measure(hoist: bool):
        fill_lanes._SUB_MASK_HOIST = hoist
        jax.clear_caches()

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k(tas, tbs, k):
            tot = jnp.zeros((B, 3), jnp.int32)
            for i in range(k):
                tot = tot + fill_lanes.lanes_general_final3(
                    tas[i], tbs[i], cmj, gid, go, mtj, ntj, w=w
                )
            return tot

        def t_of(k):
            tas = jnp.asarray(
                np.stack([np.roll(ta, i, axis=1) for i in range(k)])
            )
            tbs = jnp.asarray(
                np.stack([np.roll(tb, i, axis=1) for i in range(k)])
            )
            ref = np.asarray(run_k(tas, tbs, k))  # compile + sanity
            assert (ref >= 0).all()
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(run_k(tas, tbs, k))
                best = min(best, time.perf_counter() - t0)
            return best

        lo, hi = t_of(K_LO), t_of(K_HI)
        per = max((hi - lo) / (K_HI - K_LO), 1e-9)
        return B * m * n / per / 1e9

    for rnd in range(2):
        g_h = measure(True)
        g_n = measure(False)
        print(
            json.dumps(
                {
                    "round": rnd,
                    "hoist_gcups": round(g_h, 1),
                    "nohoist_gcups": round(g_n, 1),
                    "speedup": round(g_h / g_n, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
