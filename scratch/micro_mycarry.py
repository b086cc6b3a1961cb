"""TPU A/B: round-4 kernel toggles — min(M,Iy)-carry recurrence
(fill_lanes._MYCARRY) and the all-active wave-loop split
(fill_lanes._ACTIVE_SPLIT) — vs the round-3 kernel (both off).

Within-one-run interleaved slope timing (micro_lanes_ab.py pattern).
Workloads: the two bench.py arms (1x10kb split uniform, 64x1kb batch
w-dispatched) plus 16x4kb and the 1x10kb general A=25 split.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_mycarry.py
"""

import functools
import json
import time

import numpy as np


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


def main():
    import jax
    import jax.numpy as jnp

    from globalign_tpu.utils.platform import enable_compilation_cache
    from globalign_tpu.ops import fill_lanes as fl

    enable_compilation_cache()
    rng = np.random.default_rng(11)

    def make_chain(fn):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(ta_j, tb_j, k):
            tot = jnp.int32(0)
            for i in range(k):
                tai = ta_j.at[..., 1:].set(
                    jnp.roll(ta_j[..., 1:], i, axis=-1)
                )
                tot = tot + fn(tai + (tot & 0), tb_j)
            return tot

        return chain

    # --- workloads -------------------------------------------------
    m = n = 10000
    ta1 = np.zeros((m + 1,), np.int32)
    ta1[1:] = rng.integers(1, 5, m)
    tb1 = np.zeros((n + 1,), np.int32)
    tb1[1:] = rng.integers(1, 5, n)

    B, L = 64, 1024
    tab = np.zeros((B, L + 1), np.int32)
    tab[:, 1:] = rng.integers(1, 5, (B, L))
    tbb = np.zeros((B, L + 1), np.int32)
    tbb[:, 1:] = rng.integers(1, 5, (B, L))
    mtb = jnp.full((B,), L, jnp.int32)

    B4, L4 = 16, 4096
    ta4 = np.zeros((B4, L4 + 1), np.int32)
    ta4[:, 1:] = rng.integers(1, 5, (B4, L4))
    tb4 = np.zeros((B4, L4 + 1), np.int32)
    tb4[:, 1:] = rng.integers(1, 5, (B4, L4))
    mt4 = jnp.full((B4,), L4, jnp.int32)

    A = 25
    gmat = rng.integers(1, 12, (A + 1, A + 1)).astype(np.int32)
    gmat = np.minimum(gmat, gmat.T)
    np.fill_diagonal(gmat, 0)
    gid = A
    gmj = jnp.asarray(gmat)
    tag = np.zeros((m + 1,), np.int32)
    tag[1:] = rng.integers(0, A - 1, m)
    tbg = np.zeros((n + 1,), np.int32)
    tbg[1:] = rng.integers(0, A - 1, n)

    split_raw = fl.lanes_split_fill_cost.__wrapped__
    batch_raw = fl.lanes_batch_final3.__wrapped__

    def one_split(ta_j, tb_j):
        f3 = split_raw(ta_j, tb_j, 0, 5, 3, 3, 4, m, n)
        return jnp.min(f3)

    wb = fl.pick_w(B, L, L)
    def one_batch(ta_j, tb_j):
        f3 = batch_raw(
            ta_j, tb_j, 0, 5, 3, 3, 4, mtb, mtb, w=wb)
        return jnp.sum(jnp.min(f3, axis=-1))

    w4 = fl.pick_w(B4, L4, L4)
    def one_b4(ta_j, tb_j):
        f3 = batch_raw(
            ta_j, tb_j, 0, 5, 3, 3, 4, mt4, mt4, w=w4)
        return jnp.sum(jnp.min(f3, axis=-1))

    def one_gen(ta_j, tb_j):
        f3 = split_raw(
            ta_j, tb_j, 0, 0, 0, 0, 4, m, n,
            cost_mat=gmj, gap_id=gid)
        return jnp.min(f3)

    works = {
        "split10k": (one_split, (jnp.asarray(ta1), jnp.asarray(tb1)), m * n),
        f"batch{B}x{L//1024}k_w{wb}": (
            one_batch, (jnp.asarray(tab), jnp.asarray(tbb)), B * L * L),
        f"b{B4}x{L4//1024}k_w{w4}": (
            one_b4, (jnp.asarray(ta4), jnp.asarray(tb4)), B4 * L4 * L4),
        "gen25_10k": (one_gen, (jnp.asarray(tag), jnp.asarray(tbg)), m * n),
    }

    # Contenders: r3 = both off; act = split only; full = both on.
    contenders = {
        "r3": (False, False),
        "act": (False, True),
        "full": (True, True),
    }

    # jit caches don't see the module flags: build per-contender chains
    # with distinct static tags via functools.partial wrappers.
    chains = {}
    sums = {}
    for cname, (mc, asp) in contenders.items():
        fl._MYCARRY, fl._ACTIVE_SPLIT = mc, asp
        for wname, (fn, args, cells) in works.items():
            def mk(fn=fn, tag=cname):
                def f(ta_j, tb_j, _tag=tag):
                    return fn(ta_j, tb_j)
                return f
            # distinct function object -> distinct jit cache entry
            chains[(cname, wname)] = (make_chain(mk()), args, cells)
            fl._MYCARRY, fl._ACTIVE_SPLIT = mc, asp  # pick_w unaffected
            v = int(chains[(cname, wname)][0](*args, k=2))
            sums.setdefault(wname, set()).add(v)
    print(json.dumps({
        "match": {k: len(v) == 1 for k, v in sums.items()},
        "sums": {k: sorted(v) for k, v in sums.items()},
    }), flush=True)

    for rnd in range(2):
        row = {"round": rnd}
        for wname in works:
            for cname, (mc, asp) in contenders.items():
                fl._MYCARRY, fl._ACTIVE_SPLIT = mc, asp
                chain, args, cells = chains[(cname, wname)]
                t = slope(chain, args)
                row[f"{wname}.{cname}"] = round(cells / t / 1e9, 1)
        print(json.dumps(row), flush=True)
    fl._MYCARRY, fl._ACTIVE_SPLIT = True, True


if __name__ == "__main__":
    main()
