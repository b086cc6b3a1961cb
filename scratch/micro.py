"""Microbenchmark: per-op latency of row-loop primitives on the TPU.

Each variant runs a T-trip fori_loop whose body applies one candidate op
chain; T is a dynamic SMEM scalar so one compile serves all T.  Slope over
T isolates per-trip cost from call overhead (the ~35 ms tunnel fetch).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from globalign_tpu.utils.platform import enable_compilation_cache

B, R, LANES = 2, 80, 128
BIG = 1 << 30


def _min_tree(terms):
    while len(terms) > 1:
        nxt = [jnp.minimum(terms[k], terms[k + 1]) for k in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def make_fn(op):
    def kernel(t_ref, x_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, R, LANES), 2)
        rcol = jax.lax.broadcasted_iota(jnp.int32, (B, R, 1), 1)
        big = jnp.full((B, R, LANES), BIG, jnp.int32)

        def apply(x):
            if op == "nop":
                return x
            if op == "rolllane":
                return pltpu.roll(x, 1, axis=2)
            if op == "rolllane4":
                for _ in range(4):
                    x = pltpu.roll(x, 1, axis=2)
                return x
            if op == "add4":
                for _ in range(4):
                    x = x + 3
                return x
            if op == "dblstep":  # roll+where+min (v1 scan step)
                sh = pltpu.roll(x, 1, axis=2)
                return jnp.minimum(x, jnp.where(lane >= 1, sh, big))
            if op == "dblstep4":
                for s in (1, 2, 4, 8):
                    sh = pltpu.roll(x, s, axis=2)
                    x = jnp.minimum(x, jnp.where(lane >= s, sh, big))
                return x
            if op == "radix8step":  # 7 parallel rolls + wheres + min tree
                shifts = list(range(1, 8))
                rolled = [pltpu.roll(x, s, axis=2) for s in shifts]
                terms = [x] + [
                    jnp.where(lane >= s, r, big) for s, r in zip(shifts, rolled)
                ]
                return _min_tree(terms)
            if op == "colchain4":  # sublane-column ops (B,R,1)
                c = x[:, :, :1]
                for s in (1, 2, 4, 8):
                    c = jnp.minimum(
                        c, jnp.where(rcol >= s, pltpu.roll(c, s, axis=1), BIG)
                    )
                return jnp.minimum(x, c)
            if op == "prefixv1":
                s = 1
                while s < LANES:
                    sh = pltpu.roll(x, s, axis=2)
                    x = jnp.minimum(x, jnp.where(lane >= s, sh, big))
                    s *= 2
                last = x[:, :, LANES - 1 :]
                c = jnp.where(rcol >= 1, pltpu.roll(last, 1, axis=1), BIG)
                s = 1
                while s < R:
                    sh = pltpu.roll(c, s, axis=1)
                    c = jnp.minimum(c, jnp.where(rcol >= s, sh, BIG))
                    s *= 2
                xs = jnp.where(lane >= 1, pltpu.roll(x, 1, axis=2), big)
                return jnp.minimum(xs, c)
            if op == "prefixv2":
                def scan_masked(z, extent, axis, idx, fill):
                    s = 1
                    while s < extent:
                        shifts = [k * s for k in range(1, 8) if k * s < extent]
                        rolled = [pltpu.roll(z, sh, axis=axis) for sh in shifts]
                        terms = [z] + [
                            jnp.where(idx >= sh, r, fill)
                            for sh, r in zip(shifts, rolled)
                        ]
                        z = _min_tree(terms)
                        s *= 8
                    return z

                y = scan_masked(x, LANES, 2, lane, big)
                t = x
                for shifts in (
                    (16, 32, 48, 64, 80, 96, 112),
                    (2, 4, 6, 8, 10, 12, 14),
                    (1,),
                ):
                    t = _min_tree([t] + [pltpu.roll(t, sh, axis=2) for sh in shifts])
                tcol = t[:, :, :1]
                c = jnp.where(rcol >= 1, pltpu.roll(tcol, 1, axis=1), BIG)
                c = scan_masked(c, R, 1, rcol, BIG)
                xs = jnp.where(lane >= 1, pltpu.roll(y, 1, axis=2), big)
                return jnp.minimum(xs, c)
            raise ValueError(op)

        def body(i, x):
            return apply(x) + 1  # +1 defeats loop-invariant folding

        out_ref[...] = jax.lax.fori_loop(0, t_ref[0, 0], body, x_ref[...])

    @functools.partial(jax.jit, static_argnames=())
    def fn(t, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, R, LANES), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, x)

    return fn


def measure(op):
    fn = make_fn(op)
    x = jnp.asarray(np.random.default_rng(0).integers(0, 1000, (B, R, LANES), np.int32))

    def run(T):
        t = jnp.full((1, 1), T, jnp.int32)
        np.asarray(fn(t, x))  # warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(t, x))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(1024)
    t2 = run(8192)
    per = (t2 - t1) / (8192 - 1024)
    print(json.dumps({"op": op, "ns_per_trip": round(per * 1e9, 2)}), flush=True)


if __name__ == "__main__":
    enable_compilation_cache()
    for op in (
        "nop",
        "add4",
        "rolllane",
        "rolllane4",
        "dblstep",
        "dblstep4",
        "radix8step",
        "colchain4",
        "prefixv1",
        "prefixv2",
    ):
        measure(op)
