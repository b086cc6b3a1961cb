"""TPU A/B: lanes meet-in-the-middle vs the direct lanes fill (1 pair).

Interleaved within-run slope timing (the only trustworthy comparison on
the drifting tunnel chip, docs/PERF.md).  Also checks exactness of the
split against the direct fill's min.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_lanes_split.py [m] [n]
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else m

    import jax
    import jax.numpy as jnp

    from globalign_tpu.ops import fill_lanes
    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    ta = np.zeros((m + 1,), np.int32)
    tb = np.zeros((n + 1,), np.int32)
    ta[1:] = rng.integers(0, 4, m)
    tb[1:] = rng.integers(0, 4, n)
    taj, tbj = jnp.asarray(ta), jnp.asarray(tb)
    cma, cmm, dco, ico, go = 0, 5, 3, 3, 4

    w1 = fill_lanes.pick_w(1, m, n)
    plan = fill_lanes.lanes_split_plan(m, n)
    print(json.dumps({"w_direct": w1, "split_plan": plan}), flush=True)

    def one_direct(t):
        return fill_lanes.lanes_fill_cost(
            t, tbj, cma, cmm, dco, ico, go, m, n, w=w1
        )

    def one_split(t):
        return fill_lanes.lanes_split_fill_cost(
            t, tbj, cma, cmm, dco, ico, go, m, n,
            w=None if plan is None else plan[0],
        )

    got_d = int(one_direct(taj))
    got_s = int(one_split(taj))
    print(json.dumps({"direct": got_d, "split": got_s,
                      "match": got_d == got_s}), flush=True)
    if got_d != got_s:
        return

    def make_chain(fn):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(t, k):
            tot = jnp.int32(0)
            for i in range(k):
                ti = t.at[1:].set(jnp.roll(t[1:], i))
                tot = tot + fn(ti + (tot & 0))
            return tot

        return chain

    chains = {"direct": make_chain(one_direct),
              "split": make_chain(one_split)}

    def slope(c, lo=2, hi=10, reps=5):
        for k in (lo, hi):
            c(taj, k=k).block_until_ready()
        best = {}
        for k in (lo, hi):
            bst = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                c(taj, k=k).block_until_ready()
                bst = min(bst, time.perf_counter() - t0)
            best[k] = bst
        return (best[hi] - best[lo]) / (hi - lo)

    for rnd in range(3):
        row = {"round": rnd, "m": m, "n": n}
        for name, c in chains.items():
            t = slope(c)
            row[f"{name}_ms"] = round(t * 1e3, 3)
            row[f"{name}_gcups"] = round(m * n / t / 1e9, 1)
        row["speedup"] = round(row["direct_ms"] / row["split_ms"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
