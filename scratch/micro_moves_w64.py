"""TPU A/B: moves-mode strip width 32 (the shipped cap) vs 64, uniform
AND general-bitmask, 32x1kb batch — the serving traceback fill is the
dominant phase for protein chunks and the w=64 moves kernel was
"compiles and matches but unmeasured" until now.  Device fill time
only (unskew off-clock).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_moves_w64.py
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
    rng = np.random.default_rng(19)
    B, L = 32, 1024

    A = 25
    gmat = rng.integers(1, 15, (A + 1, A + 1)).astype(np.int32)
    gmat = np.minimum(gmat, gmat.T)
    np.fill_diagonal(gmat, 0)
    gmat[A, A] = 3
    gmj = jnp.asarray(gmat)
    bits = int(gmat.max()).bit_length()

    tau = np.zeros((B, L + 1), np.int32)
    tau[:, 1:] = rng.integers(1, 5, (B, L))
    tbu = np.zeros((B, L + 1), np.int32)
    tbu[:, 1:] = rng.integers(1, 5, (B, L))
    tag = np.zeros((B, L + 1), np.int32)
    tag[:, 1:] = rng.integers(0, A, (B, L))
    tbg = np.zeros((B, L + 1), np.int32)
    tbg[:, 1:] = rng.integers(0, A, (B, L))
    mt = jnp.full((B,), L, jnp.int32)

    mraw = fl.lanes_batch_moves.__wrapped__
    graw = fl.lanes_general_moves.__wrapped__

    works = {}
    for w in (32, 64):
        # The kernel is has_side_effects=True and streams the codes
        # to HBM in-kernel, so summing f3 alone keeps the fill live
        # while the sums stay comparable ACROSS widths (the skewed mv
        # layout is w-dependent).
        def one_u(ta_j, tb_j, w=w):
            f3, mv = mraw(ta_j, tb_j, 0, 5, 3, 3, 4, mt, mt, w=w)
            return jnp.sum(jnp.min(f3, axis=-1))

        def one_g(ta_j, tb_j, w=w):
            f3, mv = graw(ta_j, tb_j, gmj, A, 4, mt, mt,
                          w=w, sub_bits=bits)
            return jnp.sum(jnp.min(f3, axis=-1))

        for nm, fn, ta, tb in (
            ("uni", one_u, tau, tbu), ("gen", one_g, tag, tbg)
        ):
            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(ta_j, tb_j, k, fn=fn, _t=(nm, w)):
                tot = jnp.int32(0)
                for i in range(k):
                    tai = ta_j.at[:, 1:].set(
                        jnp.roll(ta_j[:, 1:], i, axis=-1))
                    tot = tot + fn(tai + (tot & 0), tb_j)
                return tot

            works[f"mv_{nm}_w{w}"] = (
                chain, (jnp.asarray(ta), jnp.asarray(tb)), B * L * L)

    sums = {}
    for name, (chain, args, cells) in works.items():
        v = int(chain(*args, k=2))
        sums.setdefault(name.rsplit("_w", 1)[0], set()).add(v)
    print(json.dumps(
        {"match_final3sum": {k: len(v) == 1 for k, v in sums.items()}}),
        flush=True)

    def slope(chain, args, lo=2, hi=8, reps=4):
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
        row = {"round": rnd}
        for name, (chain, args, cells) in works.items():
            row[name] = round(cells / slope(chain, args) / 1e9, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
