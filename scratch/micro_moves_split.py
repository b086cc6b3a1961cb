"""TPU A/B: _ACTIVE_SPLIT on the moves-emitting lane kernel
(lanes_batch_moves) — the serving traceback fill.  _MYCARRY does not
apply in moves mode (the argmin codes compare the three levels
individually), but the active-split drops FOUR selects per phase on
steady-state waves (2 value stores + 2 code stores).

Workloads: 32x1kb batch moves, 1x4kb single-pair moves (the align()
fast path).  Device timing only (the host unskew is off-clock here);
interleaved slope, 2 rounds.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_moves_split.py
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
    rng = np.random.default_rng(3)
    raw = fl.lanes_batch_moves.__wrapped__

    shapes = [(32, 1024), (1, 4096)]
    cases = {}
    for B, L in shapes:
        ta = np.zeros((B, L + 1), np.int32)
        ta[:, 1:] = rng.integers(1, 5, (B, L))
        tb = np.zeros((B, L + 1), np.int32)
        tb[:, 1:] = rng.integers(1, 5, (B, L))
        mt = jnp.full((B,), L, jnp.int32)
        w = fl.pick_w(B, L, L)
        cases[f"mv{B}x{L}_w{w}"] = (
            jnp.asarray(ta), jnp.asarray(tb), mt, w, B * L * L)

    def make_chain(tb_j, mt, w, tag):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(ta_j, k, _tag=tag):
            tot = jnp.int32(0)
            for i in range(k):
                tai = ta_j.at[:, 1:].set(jnp.roll(ta_j[:, 1:], i, axis=-1))
                f3, mv = raw(
                    tai + (tot & 0), tb_j, 0, 5, 3, 3, 4, mt, mt, w=w)
                tot = tot + jnp.sum(jnp.min(f3, axis=-1))
                tot = tot + jnp.sum(mv[0, :1, :1].astype(jnp.int32))
            return tot

        return chain

    contenders = {"nosplit": False, "split": True}
    chains = {}
    sums = {}
    for cname, asp in contenders.items():
        fl._ACTIVE_SPLIT = asp
        for wname, (ta, tb, mt, w, cells) in cases.items():
            chains[(cname, wname)] = (
                make_chain(tb, mt, w, cname), ta, cells)
            v = int(chains[(cname, wname)][0](ta, k=2))
            sums.setdefault(wname, set()).add(v)
    print(json.dumps({
        "match": {k: len(v) == 1 for k, v in sums.items()},
    }), flush=True)

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
        for wname in cases:
            for cname, asp in contenders.items():
                fl._ACTIVE_SPLIT = asp
                chain, arg, cells = chains[(cname, wname)]
                t = slope(chain, arg)
                row[f"{wname}.{cname}"] = round(cells / t / 1e9, 1)
        print(json.dumps(row), flush=True)
    fl._ACTIVE_SPLIT = True


if __name__ == "__main__":
    main()
