"""TPU A/B: bitmask substitution (sub_bits) vs the select chain in the
general-matrix lane kernel.  BLOSUM-sized alphabet (A=25+gap, 4-bit
costs) on the two production shapes: 1x10kb split and 32x1kb batch.
Also the first on-chip compile of vector-amount >> vector in the full
kernel (micro_varshift.py only proved scalar >> vector).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_subbits.py
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

    B, L = 32, 1024
    tab = np.zeros((B, L + 1), np.int32)
    tab[:, 1:] = rng.integers(0, A, (B, L))
    tbb = np.zeros((B, L + 1), np.int32)
    tbb[:, 1:] = rng.integers(0, A, (B, L))
    mtb = jnp.full((B,), L, jnp.int32)

    split_raw = fl.lanes_split_fill_cost.__wrapped__
    gen_raw = fl.lanes_general_final3.__wrapped__
    sp = fl.lanes_split_plan(m, n, asel=A + 1)
    wsp = sp[0] if sp else fl.pick_w(2, m // 2, n, asel=A + 1)
    plan = fl.lanes_plan(B, L, L, asel=A + 1)
    wb = plan[0] if plan else fl.pick_w(B, L, L, asel=A + 1)

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
    for nm, sb in (("chain", 0), ("bits", bits)):
        def one_split(ta_j, tb_j, sb=sb):
            return jnp.min(split_raw(
                ta_j, tb_j, 0, 0, 0, 0, 4, m, n,
                cost_mat=gmj, gap_id=gid, w=wsp, sub_bits=sb))

        def one_batch(ta_j, tb_j, sb=sb):
            f3 = gen_raw(ta_j, tb_j, gmj, gid, 4, mtb, mtb,
                         w=wb, sub_bits=sb)
            return jnp.sum(jnp.min(f3, axis=-1))

        works[f"split10k_w{wsp}.{nm}"] = (
            make_chain(one_split, nm),
            (jnp.asarray(tag), jnp.asarray(tbg)), m * n)
        works[f"b{B}x1k_w{wb}.{nm}"] = (
            make_chain(one_batch, nm),
            (jnp.asarray(tab), jnp.asarray(tbb)), B * L * L)

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
