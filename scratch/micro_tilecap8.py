"""TPU A/B: TILE_MAX_R=16 (one call) vs splitting the same batch into
R=8 tiles (two calls in one jit) — does the one-full-native-tile
sweet spot (32x4kb at 151 GCUPS, R=8) beat the current 16-chunk cap
when the batch is twice that?

Workloads: 64x4kb as 1x(R=16) vs 2x(R=8); 128x2kb as 1x(R=16) vs
2x(R=8).  Uniform scheme, w=128 (the dispatched width).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_tilecap8.py
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
    rng = np.random.default_rng(17)
    raw = fl.lanes_batch_final3.__wrapped__
    w = 128

    works = {}
    for B, L in ((64, 4096), (128, 2048)):
        ta = np.zeros((B, L + 1), np.int32)
        ta[:, 1:] = rng.integers(1, 5, (B, L))
        tb = np.zeros((B, L + 1), np.int32)
        tb[:, 1:] = rng.integers(1, 5, (B, L))
        mt = jnp.full((B,), L, jnp.int32)
        mth = jnp.full((B // 2,), L, jnp.int32)

        def one_whole(ta_j, tb_j, mt=mt):
            f3 = raw(ta_j, tb_j, 0, 5, 3, 3, 4, mt, mt, w=w)
            return jnp.sum(jnp.min(f3, axis=-1))

        def one_split(ta_j, tb_j, mth=mth, B=B):
            h = B // 2
            tot = jnp.int32(0)
            for lo in (0, h):
                f3 = raw(ta_j[lo:lo + h], tb_j[lo:lo + h],
                         0, 5, 3, 3, 4, mth, mth, w=w)
                tot = tot + jnp.sum(jnp.min(f3, axis=-1))
            return tot

        for nm, fn in (("whole16", one_whole), ("half8", one_split)):
            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(ta_j, tb_j, k, fn=fn, _t=(B, L, nm)):
                tot = jnp.int32(0)
                for i in range(k):
                    tai = ta_j.at[:, 1:].set(
                        jnp.roll(ta_j[:, 1:], i, axis=-1))
                    tot = tot + fn(tai + (tot & 0), tb_j)
                return tot

            works[f"b{B}x{L}.{nm}"] = (
                chain, (jnp.asarray(ta), jnp.asarray(tb)), B * L * L)

    sums = {}
    for name, (chain, args, cells) in works.items():
        v = int(chain(*args, k=2))
        sums.setdefault(name.split(".")[0], set()).add(v)
    print(json.dumps(
        {"match": {k: len(v) == 1 for k, v in sums.items()}}), flush=True)

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
        row = {"round": rnd}
        for name, (chain, args, cells) in works.items():
            row[name] = round(cells / slope(chain, args) / 1e9, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
