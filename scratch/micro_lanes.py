"""TPU check + slope timing for the cell-per-lane strip kernel.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_lanes.py [m] [w]
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    from globalign_tpu.utils.platform import enable_compilation_cache
    from globalign_tpu.ops import fill_lanes

    enable_compilation_cache()
    n = m
    rng = np.random.default_rng(11)
    ta = np.zeros((m + 1,), np.int32)
    ta[1:] = rng.integers(0, 4, m)
    tb = np.zeros((n + 1,), np.int32)
    tb[1:] = rng.integers(0, 4, n)

    # Correctness vs the split kernel on the same pair.
    from globalign_tpu.ops.fill_pallas import split_fill_cost

    t0 = time.perf_counter()
    got = int(
        fill_lanes.lanes_fill_cost(
            jnp.asarray(ta), jnp.asarray(tb), 0, 5, 3, 3, 4, m, n, w=w
        )
    )
    t_compile = time.perf_counter() - t0
    A = 5
    cm = np.full((A, A), 5, np.int32)
    np.fill_diagonal(cm, 0)
    cm[4, :] = 3
    cm[:, 4] = 3
    cm[4, 4] = 0
    want = int(
        split_fill_cost(
            jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(cm), 4, 4, m, n
        )
    )
    print(
        json.dumps(
            {
                "m": m,
                "w": w,
                "lanes_cost": got,
                "split_cost": want,
                "match": got == want,
                "first_call_s": round(t_compile, 1),
            }
        ),
        flush=True,
    )
    if got != want:
        return

    # Slope timing: K chained kernels in one jit (distinct inputs via
    # cost-preserving token rolls; outputs summed).
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(ta_j, tb_j, k):
        tot = jnp.int32(0)
        for i in range(k):
            tai = ta_j.at[1:].set(jnp.roll(ta_j[1:], i))
            tot = tot + fill_lanes.lanes_fill_cost(
                tai + (tot & 0), tb_j, 0, 5, 3, 3, 4, m, n, w=w
            )
        return tot

    taj = jnp.asarray(ta)
    tbj = jnp.asarray(tb)
    lo, hi = 2, 7
    for k in (lo, hi):
        chain(taj, tbj, k=k).block_until_ready()
    best = {}
    for k in (lo, hi):
        b = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            chain(taj, tbj, k=k).block_until_ready()
            b = min(b, time.perf_counter() - t0)
        best[k] = b
    t_kernel = (best[hi] - best[lo]) / (hi - lo)
    gcups = m * n / t_kernel / 1e9
    print(
        json.dumps(
            {
                "m": m,
                "w": w,
                "t_kernel_ms": round(t_kernel * 1e3, 3),
                "gcups": round(gcups, 2),
                "t_lo_s": round(best[lo], 4),
                "t_hi_s": round(best[hi], 4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
