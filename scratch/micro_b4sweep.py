"""TPU sweep: long-pair batch shapes around the 16x4kb sweet spot with
the round-4 carry kernel — which (B, L) stably clears 100 GCUPS?

Interleaved slope timing (micro_lanes_ab.py pattern), 2 rounds.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_b4sweep.py
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
    rng = np.random.default_rng(7)
    batch_raw = fl.lanes_batch_final3.__wrapped__

    shapes = [(16, 4096), (32, 4096), (64, 4096), (64, 2048), (128, 2048)]
    works = {}
    for B, L in shapes:
        ta = np.zeros((B, L + 1), np.int32)
        ta[:, 1:] = rng.integers(1, 5, (B, L))
        tb = np.zeros((B, L + 1), np.int32)
        tb[:, 1:] = rng.integers(1, 5, (B, L))
        mt = jnp.full((B,), L, jnp.int32)
        plan = fl.lanes_plan(B, L, L)
        w = plan[0] if plan is not None else fl.pick_w(B, L, L)
        tbj = jnp.asarray(tb)

        def one(ta_j, tb_j=tbj, mt=mt, w=w):
            f3 = batch_raw(ta_j, tb_j, 0, 5, 3, 3, 4, mt, mt, w=w)
            return jnp.sum(jnp.min(f3, axis=-1))

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(ta_j, k, one=one):
            tot = jnp.int32(0)
            for i in range(k):
                tai = ta_j.at[:, 1:].set(jnp.roll(ta_j[:, 1:], i, axis=-1))
                tot = tot + one(tai + (tot & 0))
            return tot

        works[f"b{B}x{L}_w{w}"] = (chain, jnp.asarray(ta), B * L * L)

    def slope(chain, arg, lo=2, hi=8, reps=4):
        for k in (lo, hi):
            chain(arg, k=k).block_until_ready()
        best = {}
        for k in (lo, hi):
            b = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                chain(arg, k=k).block_until_ready()
                b = min(b, time.perf_counter() - t0)
            best[k] = b
        return (best[hi] - best[lo]) / (hi - lo)

    for rnd in range(2):
        row = {"round": rnd}
        for name, (chain, arg, cells) in works.items():
            t = slope(chain, arg)
            row[name] = round(cells / t / 1e9, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
