"""TPU A/B: moves-emitting lane kernel vs the stacked moves kernel.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_lanes_moves.py [B] [m]
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    import jax
    import jax.numpy as jnp

    from globalign_tpu.utils.platform import enable_compilation_cache
    from globalign_tpu.ops import fill_lanes, fill_pallas

    enable_compilation_cache()
    n = m
    rng = np.random.default_rng(11)
    ta = np.zeros((B, m + 1), np.int32)
    ta[:, 1:] = rng.integers(1, 5, (B, m))
    tb = np.zeros((B, n + 1), np.int32)
    tb[:, 1:] = rng.integers(1, 5, (B, n))
    taj, tbj = jnp.asarray(ta), jnp.asarray(tb)
    mtj = jnp.full((B,), m, jnp.int32)
    ntj = jnp.full((B,), n, jnp.int32)

    A = 6
    cm = np.full((A, A), 5, np.int32)
    np.fill_diagonal(cm, 0)
    cm[5, :] = 3
    cm[:, 5] = 3
    cm[5, 5] = 0
    cmj = jnp.asarray(cm)
    w = fill_lanes.pick_w(B, m, n)

    # Correctness: identical codes at real cells + identical final3.
    f_l, mv_raw = fill_lanes.lanes_batch_moves(
        taj, tbj, 0, 5, 3, 3, 4, mtj, ntj, w=w
    )
    t0 = time.perf_counter()
    mv_l = fill_lanes.lanes_moves_to_row(np.asarray(mv_raw), B, n, w, m)
    t_unskew = time.perf_counter() - t0
    last_s, mv_s = fill_pallas.stacked_fill_with_moves(
        taj, tbj, cmj, 5, 4, mtj, ntj
    )
    f_s = np.asarray(last_s)[:, :, n]
    ok_f = bool((np.asarray(f_l) == f_s).all())
    ok_m = bool(
        (
            np.asarray(mv_l)[:, 1 : m + 1, 1 : n + 1]
            == np.asarray(mv_s)[:, 1 : m + 1, 1 : n + 1]
        ).all()
    )
    print(json.dumps({"B": B, "m": m, "w": w, "final3_match": ok_f,
                      "moves_match": ok_m,
                      "host_unskew_s": round(t_unskew, 3)}), flush=True)
    if not (ok_f and ok_m):
        return

    def make_chain(fn):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(ta_j, k):
            tot = jnp.int32(0)
            for i in range(k):
                tai = jnp.roll(ta_j, i, axis=0)
                f, mv = fn(tai + (tot & 0))
                # Consume a slice of the moves so the DMA stream stays live.
                tot = tot + jnp.min(f) + jnp.sum(mv[:, 1].astype(jnp.int32))
            return tot

        return chain

    def one_lanes(ta_j):
        f, mv = fill_lanes.lanes_batch_moves(
            ta_j, tbj, 0, 5, 3, 3, 4, mtj, ntj, w=w
        )
        return f, mv[None]  # chain consumes mv[:, 1]

    def one_stacked(ta_j):
        last, mv = fill_pallas.stacked_fill_with_moves(
            ta_j, tbj, cmj, 5, 4, mtj, ntj
        )
        return last[:, :, n], mv

    chains = {"lanes": make_chain(one_lanes), "stacked": make_chain(one_stacked)}

    def slope(c, lo=2, hi=10, reps=5):
        for k in (lo, hi):
            c(taj, k=k).block_until_ready()
        best = {}
        for k in (lo, hi):
            b = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                c(taj, k=k).block_until_ready()
                b = min(b, time.perf_counter() - t0)
            best[k] = b
        return (best[hi] - best[lo]) / (hi - lo)

    for rnd in range(2):
        row = {"round": rnd, "B": B, "m": m, "w": w}
        for name, c in chains.items():
            t = slope(c)
            row[f"{name}_gcups"] = round(B * m * n / t / 1e9, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
