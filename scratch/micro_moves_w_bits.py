"""TPU sweep: strip width for the BITMASK general kernel in MOVES mode
(VERDICT r4 item 5).  scratch/micro_subbits_w.py swept cost mode only;
moves mode halves the value-state budget with the uint8 code stream and
its plan widths stayed capped at w<=32 (lanes_plan) — does the bitmask
staging shrink move the moves-mode optimum?

Workloads: 32x1kb and 16x4kb batches, A=25 bitmask, w in {16, 32, 64}.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_moves_w_bits.py
"""

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from globalign_tpu.utils.platform import enable_compilation_cache
    from globalign_tpu.ops import fill_lanes as fl

    enable_compilation_cache()
    rng = np.random.default_rng(31)

    A = 25
    gmat = rng.integers(1, 15, (A + 1, A + 1)).astype(np.int32)
    gmat = np.minimum(gmat, gmat.T)
    np.fill_diagonal(gmat, 0)
    gmat[A, A] = 3
    gid = A
    gmj = jnp.asarray(gmat)
    bits = int(gmat.max()).bit_length()

    mv_raw = fl.lanes_general_moves.__wrapped__

    def make_chain(fn):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(ta_j, tb_j, k):
            tot = jnp.int32(0)
            for i in range(k):
                tai = ta_j.at[..., 1:].set(
                    jnp.roll(ta_j[..., 1:], i, axis=-1))
                tot = tot + fn(tai + (tot & 0), tb_j)
            return tot

        return chain

    works = {}
    sums = {}
    for B, L in ((32, 1024), (16, 4096)):
        ta = np.zeros((B, L + 1), np.int32)
        ta[:, 1:] = rng.integers(0, A, (B, L))
        tb = np.zeros((B, L + 1), np.int32)
        tb[:, 1:] = rng.integers(0, A, (B, L))
        mt = jnp.full((B,), L, jnp.int32)
        for w in (16, 32, 64):

            def one(ta_j, tb_j, mt=mt, w=w):
                f3, mv = mv_raw(ta_j, tb_j, gmj, gid, 4, mt, mt,
                                w=w, sub_bits=bits)
                # Touch mv so the code stream cannot be elided; cost is
                # one (R, 128) row read.
                return (
                    jnp.sum(jnp.min(f3, axis=-1))
                    + jnp.sum(mv[0].astype(jnp.int32)) * 0
                )

            works[f"mv{B}x{L // 1024}k_w{w}"] = (
                make_chain(one), (jnp.asarray(ta), jnp.asarray(tb)),
                B * L * L,
            )

    for name, (chain, args, cells) in works.items():
        v = int(chain(*args, k=2))
        sums.setdefault(name.split("_w")[0], set()).add(v)
    print(json.dumps({
        "bits": bits,
        "match": {k: len(v) == 1 for k, v in sums.items()},
    }), flush=True)

    def slope(chain, args, lo=2, hi=6, reps=4):
        for k in (lo, hi):
            chain(*args, k=k).block_until_ready()
        best = {}
        for k in (lo, hi):
            b = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                chain(*args, k=k).block_until_ready()
                b = min(b, time.perf_counter() - t0)
            best[k] = b
        return (best[hi] - best[lo]) / (hi - lo)

    for rnd in range(2):
        row = {"round": rnd, "metric": "moves_bitmask_w_sweep"}
        for name, (chain, args, cells) in works.items():
            row[name] = round(cells / slope(chain, args) / 1e9, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
