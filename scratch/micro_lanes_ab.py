"""Within-one-run A/B of lane-kernel variants (fair under tunnel variance).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_lanes_ab.py [m] [w]
"""

import functools
import json
import sys
import time

import numpy as np


def slope(chain, taj, tbj, lo=2, hi=7, reps=5):
    for k in (lo, hi):
        chain(taj, tbj, k=k).block_until_ready()
    best = {}
    for k in (lo, hi):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            chain(taj, tbj, k=k).block_until_ready()
            b = min(b, time.perf_counter() - t0)
        best[k] = b
    return (best[hi] - best[lo]) / (hi - lo)


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax
    import jax.numpy as jnp

    from globalign_tpu.utils.platform import enable_compilation_cache
    from globalign_tpu.ops import fill_lanes as v2
    import fill_lanes_v1 as v1

    enable_compilation_cache()
    n = m
    rng = np.random.default_rng(11)
    ta = np.zeros((m + 1,), np.int32)
    ta[1:] = rng.integers(1, 5, m)
    tb = np.zeros((n + 1,), np.int32)
    tb[1:] = rng.integers(1, 5, n)
    taj, tbj = jnp.asarray(ta), jnp.asarray(tb)

    def make_chain(fn):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(ta_j, tb_j, k):
            tot = jnp.int32(0)
            for i in range(k):
                tai = ta_j.at[1:].set(jnp.roll(ta_j[1:], i))
                tot = tot + fn(tai + (tot & 0), tb_j)
            return tot

        return chain

    from globalign_tpu.ops.fill_pallas import split_fill_cost

    A = 5
    cmat = np.full((A, A), 5, np.int32)
    np.fill_diagonal(cmat, 0)
    cmat[4, :] = 3
    cmat[:, 4] = 3
    cmat[4, 4] = 0
    cmj = jnp.asarray(cmat)

    def one_v1(ta_j, tb_j):
        return v1.lanes_fill_cost(ta_j, tb_j, 0, 5, 3, 3, 4, m, n, w=w)

    def one_v2(ta_j, tb_j):
        return v2.lanes_fill_cost(ta_j, tb_j, 0, 5, 3, 3, 4, m, n, w=w)

    def one_split(ta_j, tb_j):
        return split_fill_cost(ta_j, tb_j, cmj, 4, 4, m, n)

    chains = {
        "v1": make_chain(one_v1),
        "v2": make_chain(one_v2),
        "split": make_chain(one_split),
    }
    sums = {k: int(c(taj, tbj, k=2)) for k, c in chains.items()}
    print(json.dumps({"m": m, "w": w, "sums": sums,
                      "match": len(set(sums.values())) == 1}), flush=True)

    # Interleave the slope measurements to share any drift.
    for rnd in range(2):
        row = {"round": rnd}
        for k, c in chains.items():
            t = slope(c, taj, tbj)
            row[f"{k}_gcups"] = round(m * n / t / 1e9, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
