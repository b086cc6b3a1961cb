"""Micro round 3: strided rolls and radix-4 scan via stride.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro3.py
"""

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
        big = jnp.full((B, R, LANES), BIG, jnp.int32)

        def apply(x):
            if op == "strideroll3":
                x4 = jnp.broadcast_to(x[None], (3, B, R, LANES))
                r = pltpu.roll(x4, 1, axis=3, stride=1, stride_axis=0)
                return jnp.minimum(jnp.minimum(r[0], r[1]), jnp.minimum(r[2], x))
            if op == "plainroll3":
                a = pltpu.roll(x, 1, axis=2)
                b = pltpu.roll(x, 2, axis=2)
                c = pltpu.roll(x, 3, axis=2)
                return jnp.minimum(jnp.minimum(a, b), jnp.minimum(c, x))
            if op == "stackroll3":  # wavefront shift complex estimate
                x3 = jnp.broadcast_to(x[None], (3, B, R, LANES))
                r = pltpu.roll(x3, 1, axis=3)
                return jnp.minimum(jnp.minimum(r[0], r[1]), jnp.minimum(r[2], x))
            if op == "radix4scan":
                s = 1
                while s < LANES:
                    x3 = jnp.broadcast_to(x[None], (3, B, R, LANES))
                    r = pltpu.roll(x3, s, axis=3, stride=s, stride_axis=0)
                    terms = [x] + [
                        jnp.where(lane >= (k + 1) * s, r[k], big)
                        for k in range(3)
                    ]
                    x = _min_tree(terms)
                    s *= 4
                return x
            if op == "dblscan":
                s = 1
                while s < LANES:
                    sh = pltpu.roll(x, s, axis=2)
                    x = jnp.minimum(x, jnp.where(lane >= s, sh, big))
                    s *= 2
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
    for op in ("strideroll3", "plainroll3", "stackroll3", "radix4scan", "dblscan"):
        try:
            measure(op)
        except Exception as e:
            print(json.dumps({"op": op, "error": str(e)[:200]}), flush=True)
