"""Within-one-run w sweep of the lane kernel (single pair).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_lanes_wsweep.py [m] [w...]
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    ws = [int(v) for v in sys.argv[2:]] or [8, 10, 16]

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
    taj, tbj = jnp.asarray(ta), jnp.asarray(tb)

    def make_chain(w):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(ta_j, tb_j, k):
            tot = jnp.int32(0)
            for i in range(k):
                tai = ta_j.at[1:].set(jnp.roll(ta_j[1:], i))
                tot = tot + fill_lanes.lanes_fill_cost(
                    tai + (tot & 0), tb_j, 0, 5, 3, 3, 4, m, n, w=w
                )
            return tot

        return chain

    chains = {w: make_chain(w) for w in ws}
    sums = {}
    for w, c in chains.items():
        t0 = time.perf_counter()
        sums[w] = int(c(taj, tbj, k=2))
        print(json.dumps({"w": w, "sum": sums[w],
                          "first_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    assert len(set(sums.values())) == 1, sums

    def slope(c, lo=2, hi=7, reps=5):
        for k in (lo, hi):
            c(taj, tbj, k=k).block_until_ready()
        best = {}
        for k in (lo, hi):
            b = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                c(taj, tbj, k=k).block_until_ready()
                b = min(b, time.perf_counter() - t0)
            best[k] = b
        return (best[hi] - best[lo]) / (hi - lo)

    for rnd in range(2):
        row = {"round": rnd, "m": m}
        for w, c in chains.items():
            t = slope(c)
            row[f"w{w}_gcups"] = round(m * n / t / 1e9, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
