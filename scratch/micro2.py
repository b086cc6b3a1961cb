"""Micro round 2 (run ALONE on the chip): roll cost by axis/shape.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro2.py
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


def make_fn(op):
    def kernel(t_ref, x_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, R, LANES), 2)
        srow = jax.lax.broadcasted_iota(jnp.int32, (B, R, LANES), 1)
        big = jnp.full((B, R, LANES), BIG, jnp.int32)

        def apply(x):
            if op == "nop":
                return x
            if op == "rolllane4":
                for s in (1, 2, 4, 8):
                    x = pltpu.roll(x, s, axis=2)
                return x
            if op == "rollsub4":
                for s in (1, 2, 4, 8):
                    x = pltpu.roll(x, s, axis=1)
                return x
            if op == "lanescan":  # 7 masked lane-roll doubling steps
                s = 1
                while s < LANES:
                    sh = pltpu.roll(x, s, axis=2)
                    x = jnp.minimum(x, jnp.where(lane >= s, sh, big))
                    s *= 2
                return x
            if op == "subscan":  # masked doubling over the 80 sublanes
                s = 1
                while s < R:
                    sh = pltpu.roll(x, s, axis=1)
                    x = jnp.minimum(x, jnp.where(srow >= s, sh, big))
                    s *= 2
                return x
            if op == "narrowlanescan":  # lane scan on a (B,1,128) strip
                c = x[:, :1, :]
                s = 1
                while s < LANES:
                    sh = pltpu.roll(c, s, axis=2)
                    c = jnp.minimum(
                        c, jnp.where(lane[:, :1, :] >= s, sh, BIG)
                    )
                    s *= 2
                return jnp.minimum(x, c)  # (B,1,128) -> broadcast sublanes
            if op == "min8":
                for _ in range(8):
                    x = jnp.minimum(x + 1, big)
                return x
            raise ValueError(op)

        def body(i, x):
            return apply(x) + 1

        out_ref[...] = jax.lax.fori_loop(0, t_ref[0, 0], body, x_ref[...])

    @jax.jit
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
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 1000, (B, R, LANES), np.int32)
    )

    def run(T):
        t = jnp.full((1, 1), T, jnp.int32)
        np.asarray(fn(t, x))
        best = float("inf")
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(fn(t, x))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(1024)
    t2 = run(16384)
    per = (t2 - t1) / (16384 - 1024)
    print(json.dumps({"op": op, "ns_per_trip": round(per * 1e9, 2)}), flush=True)


if __name__ == "__main__":
    enable_compilation_cache()
    for op in (
        "nop",
        "min8",
        "rolllane4",
        "rollsub4",
        "lanescan",
        "subscan",
        "narrowlanescan",
    ):
        measure(op)
