"""TPU A/B: general-matrix meet-in-the-middle vs direct general lanes.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_gsplit.py [A] [m]
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    A = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    n = m

    import jax
    import jax.numpy as jnp

    from globalign_tpu.ops import fill_lanes
    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(11)
    gid = A - 1
    cm = rng.integers(3, 9, (A, A)).astype(np.int32)
    np.fill_diagonal(cm, 0)
    cm[gid, :] = rng.integers(2, 5, A)
    cm[:, gid] = rng.integers(2, 5, A)
    cm[gid, gid] = 0
    cmj = jnp.asarray(cm)

    ta = np.zeros((m + 1,), np.int32)
    tb = np.zeros((n + 1,), np.int32)
    ta[1:] = rng.integers(0, gid, m)
    tb[1:] = rng.integers(0, gid, n)
    taj, tbj = jnp.asarray(ta), jnp.asarray(tb)
    go = 4

    plan = fill_lanes.lanes_plan(1, m, n, asel=A)
    sp = fill_lanes.lanes_split_plan(m, n, asel=A)
    print(json.dumps({"A": A, "m": m, "plan": plan, "split_plan": sp}),
          flush=True)

    def direct(t):
        return jnp.min(
            fill_lanes.lanes_general_final3(
                t[None], tbj[None], cmj, gid, go,
                jnp.asarray([m], jnp.int32), jnp.asarray([n], jnp.int32),
                w=plan[0],
            )
        )

    def split(t):
        return fill_lanes.lanes_split_fill_cost(
            t, tbj, 0, 0, 0, 0, go, m, n, cost_mat=cmj, gap_id=gid,
            w=None if sp is None else sp[0],
        )

    got_d, got_s = int(direct(taj)), int(split(taj))
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

    chains = {"direct": make_chain(direct), "split": make_chain(split)}

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
        row = {"round": rnd, "A": A, "m": m}
        for name, c in chains.items():
            t = slope(c)
            row[f"{name}_gcups"] = round(m * n / t / 1e9, 1)
        row["speedup"] = round(
            row["split_gcups"] / max(row["direct_gcups"], 0.1), 2
        )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
