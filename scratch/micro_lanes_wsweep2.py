"""TPU within-run w-sweep: direct lanes fill AND meet-in-the-middle split
across strip widths at one shape (default 10 kb single pair).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_lanes_wsweep2.py [m]
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
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
    taj, tbj = jnp.asarray(ta), jnp.asarray(tb)
    cma, cmm, dco, ico, go = 0, 5, 3, 3, 4

    def direct(w):
        def one(t):
            return fill_lanes.lanes_fill_cost(
                t, tbj, cma, cmm, dco, ico, go, m, n, w=w
            )
        return one

    def split(w):
        def one(t):
            return fill_lanes.lanes_split_fill_cost(
                t, tbj, cma, cmm, dco, ico, go, m, n, w=w
            )
        return one

    variants = {}
    for w in (4, 6, 8, 10, 16):
        variants[f"direct_w{w}"] = direct(w)
    for w in (8, 10, 16, 20):
        variants[f"split_w{w}"] = split(w)

    want = None
    chains = {}
    for name, fn in variants.items():
        got = int(fn(taj))
        if want is None:
            want = got
        if got != want:
            print(json.dumps({"name": name, "got": got, "want": want,
                              "verdict": "MISMATCH"}), flush=True)
            return

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(t, k, fn=fn):
            tot = jnp.int32(0)
            for i in range(k):
                ti = t.at[1:].set(jnp.roll(t[1:], i))
                tot = tot + fn(ti + (tot & 0))
            return tot

        chains[name] = chain
        print(json.dumps({"compiled": name, "cost": got}), flush=True)

    def slope(c, lo=2, hi=10, reps=4):
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

    for rnd in range(2):
        row = {"round": rnd, "m": m}
        for name, c in chains.items():
            t = slope(c)
            row[name] = round(m * n / t / 1e9, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
