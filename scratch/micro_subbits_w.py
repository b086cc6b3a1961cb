"""TPU sweep: strip width for the BITMASK general kernel (sub_bits),
beyond the select-chain compile budget — does the staging shrink move
the general-mode optimum to wider strips, like uniform mode?

Workloads: 1x10kb split A=25 (w 20/32/64), 32x1kb batch (w 64/128),
16x4kb batch (w 64/128).  Chain contender at the planned width only.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_subbits_w.py
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
    rng = np.random.default_rng(23)

    A = 25
    gmat = rng.integers(1, 15, (A + 1, A + 1)).astype(np.int32)
    gmat = np.minimum(gmat, gmat.T)
    np.fill_diagonal(gmat, 0)
    gmat[A, A] = 3
    gid = A
    gmj = jnp.asarray(gmat)
    bits = int(gmat.max()).bit_length()

    m = n = 10000
    tag = np.zeros((m + 1,), np.int32)
    tag[1:] = rng.integers(0, A, m)
    tbg = np.zeros((n + 1,), np.int32)
    tbg[1:] = rng.integers(0, A, n)

    split_raw = fl.lanes_split_fill_cost.__wrapped__
    gen_raw = fl.lanes_general_final3.__wrapped__

    def make_chain(fn, tag_):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(ta_j, tb_j, k, _t=tag_):
            tot = jnp.int32(0)
            for i in range(k):
                tai = ta_j.at[..., 1:].set(
                    jnp.roll(ta_j[..., 1:], i, axis=-1))
                tot = tot + fn(tai + (tot & 0), tb_j)
            return tot

        return chain

    works = {}
    for w in (20, 32, 64):
        def one_split(ta_j, tb_j, w=w):
            return jnp.min(split_raw(
                ta_j, tb_j, 0, 0, 0, 0, 4, m, n,
                cost_mat=gmj, gap_id=gid, w=w, sub_bits=bits))

        works[f"split10k_w{w}.bits"] = (
            make_chain(one_split, f"s{w}"),
            (jnp.asarray(tag), jnp.asarray(tbg)), m * n)

    for B, L in ((32, 1024), (16, 4096)):
        ta = np.zeros((B, L + 1), np.int32)
        ta[:, 1:] = rng.integers(0, A, (B, L))
        tb = np.zeros((B, L + 1), np.int32)
        tb[:, 1:] = rng.integers(0, A, (B, L))
        mt = jnp.full((B,), L, jnp.int32)
        for w in (64, 128):
            def one_b(ta_j, tb_j, mt=mt, w=w):
                f3 = gen_raw(ta_j, tb_j, gmj, gid, 4, mt, mt,
                             w=w, sub_bits=bits)
                return jnp.sum(jnp.min(f3, axis=-1))

            works[f"b{B}x{L//1024}k_w{w}.bits"] = (
                make_chain(one_b, f"b{B}_{w}"),
                (jnp.asarray(ta), jnp.asarray(tb)), B * L * L)

    sums = {}
    for name, (chain, args, cells) in works.items():
        v = int(chain(*args, k=2))
        sums.setdefault(name.split("_w")[0], set()).add(v)
    print(json.dumps({
        "bits": bits,
        "match": {k: len(v) == 1 for k, v in sums.items()},
    }), flush=True)

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
