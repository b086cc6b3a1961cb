"""Micro round 5: does narrower state (int16/int8) speed up the rolls?

The stacked batch kernel is roll-THROUGHPUT bound (micro4: per-row time
scales ~linearly with B; PERF.md batch plateau ~19 GCUPS).  If Mosaic
executes rolls on packed narrow types at higher element throughput, an
int16 DP state (valid when max_cost*(m+n+2) < 2^14) would ~2x the batch
axis.  This measures the same fullprefix/rollchain bodies at the batch
shape (B=64, R=8) across dtypes.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro5.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from globalign_tpu.utils.platform import enable_compilation_cache

B, R, LANES = 64, 8, 128


def make_fn(op, dtype, big_val):
    def kernel(t_ref, x_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, R, LANES), 2)
        rcol = jax.lax.broadcasted_iota(jnp.int32, (B, R, 1), 1)
        big = jnp.full((B, R, LANES), big_val, dtype)
        bigs = jnp.asarray(big_val, dtype)

        def full_prefix(x):
            s = 1
            while s < LANES:
                sh = pltpu.roll(x, s, axis=2)
                x = jnp.minimum(x, jnp.where(lane >= s, sh, big))
                s *= 2
            last = x[:, :, LANES - 1 :]
            c = jnp.where(rcol >= 1, pltpu.roll(last, 1, axis=1), bigs)
            s = 1
            while s < R:
                sh = pltpu.roll(c, s, axis=1)
                c = jnp.minimum(c, jnp.where(rcol >= s, sh, bigs))
                s *= 2
            xs = jnp.where(lane >= 1, pltpu.roll(x, 1, axis=2), big)
            return jnp.minimum(xs, c)

        def body(i, x):
            if op == "rollchain4":
                for _ in range(4):
                    x = pltpu.roll(x, 1, axis=2) + jnp.asarray(1, dtype)
                return x
            return full_prefix(x) + jnp.asarray(1, dtype)

        out_ref[...] = jax.lax.fori_loop(0, t_ref[0, 0], body, x_ref[...])

    @jax.jit
    def fn(t, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, R, LANES), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, x)

    return fn


def measure(op, dtype, big_val):
    fn = make_fn(op, dtype, big_val)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 100, (B, R, LANES)), dtype
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
    print(
        json.dumps(
            {"op": op, "dtype": str(np.dtype(dtype)), "ns_per_trip": round(per * 1e9, 2)}
        ),
        flush=True,
    )


if __name__ == "__main__":
    enable_compilation_cache()
    for op in ("rollchain4", "fullprefix"):
        for dtype, big_val in (
            (jnp.int32, 1 << 30),
            (jnp.int16, (1 << 14) - 1),
            (jnp.int8, 127),
        ):
            try:
                measure(op, dtype, big_val)
            except Exception as e:
                print(
                    json.dumps(
                        {
                            "op": op,
                            "dtype": str(np.dtype(dtype)),
                            "error": str(e)[:200],
                        }
                    ),
                    flush=True,
                )
