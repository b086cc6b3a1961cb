"""TPU A/B: general-matrix lane kernel vs scan kernels, parameterized
by alphabet size (synthetic non-uniform costing matrix), B, and length.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_lanes_general2.py [A] [B] [m]
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    A = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000

    import jax
    import jax.numpy as jnp

    from globalign_tpu.ops import fill_lanes, fill_pallas
    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    n = m
    rng = np.random.default_rng(11)
    # Non-uniform costing matrix: random mismatch costs (symmetric-ish
    # not required), random per-char gap costs -> the general mode.
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
    taj, tbj = jnp.asarray(ta), jnp.asarray(tb)
    mtj = jnp.full((B,), m, jnp.int32)
    ntj = jnp.full((B,), n, jnp.int32)

    plan = fill_lanes.lanes_plan(B, m, n, asel=A)
    print(json.dumps({"A": A, "B": B, "m": m, "plan": plan}), flush=True)
    if plan is None:
        return
    w = plan[0]

    got = np.asarray(
        fill_lanes.lanes_general_final3(taj, tbj, cmj, gid, go, mtj, ntj, w=w)
    )
    if B == 1:
        want = np.asarray(
            fill_pallas.row_fill_last_rows(
                taj[0], tbj[0], cmj, jnp.int32(gid), go
            )[:, n]
        )[None]
    else:
        want = np.asarray(
            fill_pallas.stacked_fill_last_rows(
                taj, tbj, cmj, jnp.int32(gid), go, mtj, ntj
            )[:, :, n]
        )
    print(json.dumps({"match": bool((got == want).all())}), flush=True)
    if not (got == want).all():
        return

    def one_lanes(ta_j):
        return jnp.min(
            fill_lanes.lanes_general_final3(
                ta_j, tbj, cmj, gid, go, mtj, ntj, w=w
            )
        )

    def one_scan(ta_j):
        if B == 1:
            return fill_pallas.split_fill_cost(
                ta_j[0], tbj[0], cmj, jnp.int32(gid), go, m, n
            )
        return jnp.min(
            fill_pallas.stacked_fill_last_rows(
                ta_j, tbj, cmj, jnp.int32(gid), go, mtj, ntj
            )
        )

    def make_chain(fn):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(t, k):
            tot = jnp.int32(0)
            for i in range(k):
                ti = t.at[:, 1:].set(jnp.roll(t[:, 1:], i, axis=1))
                tot = tot + fn(ti + (tot & 0))
            return tot

        return chain

    chains = {"lanes_gen": make_chain(one_lanes),
              "scan": make_chain(one_scan)}

    def slope(c, lo=2, hi=8, reps=4):
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
        row = {"round": rnd, "A": A, "B": B, "m": m, "w": w}
        for name, c in chains.items():
            t = slope(c)
            row[f"{name}_gcups"] = round(B * m * n / t / 1e9, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
