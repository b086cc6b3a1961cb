"""TPU component timing: where does lanes_split_fill_cost's time go?

Times (a) the bare B=2 lanes_batch_last_rows call on prebuilt halves,
(b) the full split (extraction gathers + kernel + join), (c) the direct
B=1 fill — all within one run.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_split_parts.py [m] [w]
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n = m

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
    cma, cmm, dco, ico, go = 0, 5, 3, 3, 4

    mid = m // 2
    mh = 128 * (-(-(m - mid) // 128))
    top = np.zeros((mh + 1,), np.int32)
    bot = np.zeros((mh + 1,), np.int32)
    top[1 : mid + 1] = ta[1 : mid + 1]
    bot[1 : m - mid + 1] = ta[1 : m + 1][::-1][: m - mid]
    fwd = tb
    rev = np.zeros((n + 1,), np.int32)
    rev[1:] = tb[1:][::-1]
    ta2 = jnp.asarray(np.stack([top, bot]))
    tb2 = jnp.asarray(np.stack([fwd, rev]))
    m2 = jnp.asarray([mid, m - mid], jnp.int32)
    n2 = jnp.asarray([n, n], jnp.int32)
    taj, tbj = jnp.asarray(ta), jnp.asarray(tb)

    def bare(t2):
        flat = fill_lanes.lanes_batch_last_rows(
            t2, tb2, cma, cmm, dco, ico, go, m2, n2, w=w
        )
        return jnp.min(flat)  # cheap consume, no join

    def full(t):
        return fill_lanes.lanes_split_fill_cost(
            t, tbj, cma, cmm, dco, ico, go, m, n, w=w
        )

    def direct(t):
        return fill_lanes.lanes_fill_cost(
            t, tbj, cma, cmm, dco, ico, go, m, n, w=10
        )

    def chain2(fn, arg_builder):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(t, k):
            tot = jnp.int32(0)
            for i in range(k):
                tot = tot + fn(arg_builder(t, i, tot))
            return tot

        return chain

    variants = {
        "bare_b2": (
            chain2(bare, lambda t, i, tot: t.at[:, 1:].set(
                jnp.roll(t[:, 1:], i, axis=1)) + (tot & 0)),
            ta2,
        ),
        "full_split": (
            chain2(full, lambda t, i, tot: t.at[1:].set(
                jnp.roll(t[1:], i)) + (tot & 0)),
            taj,
        ),
        "direct": (
            chain2(direct, lambda t, i, tot: t.at[1:].set(
                jnp.roll(t[1:], i)) + (tot & 0)),
            taj,
        ),
    }

    def slope(c, arg, lo=2, hi=10, reps=4):
        for k in (lo, hi):
            c(arg, k=k).block_until_ready()
        best = {}
        for k in (lo, hi):
            bst = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                c(arg, k=k).block_until_ready()
                bst = min(bst, time.perf_counter() - t0)
            best[k] = bst
        return (best[hi] - best[lo]) / (hi - lo)

    for rnd in range(2):
        row = {"round": rnd, "m": m, "w": w}
        for name, (c, arg) in variants.items():
            t = slope(c, arg)
            row[f"{name}_ms"] = round(t * 1e3, 3)
            row[f"{name}_gcups"] = round(m * n / t / 1e9, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
