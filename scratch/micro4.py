"""Micro round 4: plain-parallel-roll radix scans + carry-vs-scratch state.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro4.py
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


def lane_scan_radix(x, lane, big, radix):
    s = 1
    while s < LANES:
        shifts = [k * s for k in range(1, radix) if k * s < LANES]
        rolled = [pltpu.roll(x, sh, axis=2) for sh in shifts]
        terms = [x] + [
            jnp.where(lane >= sh, r, big) for sh, r in zip(shifts, rolled)
        ]
        x = _min_tree(terms)
        s *= radix
    return x


def make_fn(op):
    use_scratch = op == "scratchstate"

    def kernel(t_ref, x_ref, out_ref, s0, s1, s2):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, R, LANES), 2)
        rcol = jax.lax.broadcasted_iota(jnp.int32, (B, R, 1), 1)
        big = jnp.full((B, R, LANES), BIG, jnp.int32)

        def full_prefix(p, radix):
            x = lane_scan_radix(p, lane, big, radix)
            last = x[:, :, LANES - 1 :]
            c = jnp.where(rcol >= 1, pltpu.roll(last, 1, axis=1), BIG)
            s = 1
            while s < R:
                sh = pltpu.roll(c, s, axis=1)
                c = jnp.minimum(c, jnp.where(rcol >= s, sh, BIG))
                s *= 2
            xs = jnp.where(lane >= 1, pltpu.roll(x, 1, axis=2), big)
            return jnp.minimum(xs, c)

        def apply(x):
            if op == "rollchain4":
                for _ in range(4):
                    x = pltpu.roll(x, 1, axis=2) + 1
                return x
            if op == "radix4scan_plain":
                return lane_scan_radix(x, lane, big, 4)
            if op == "radix8scan_plain":
                return lane_scan_radix(x, lane, big, 8)
            if op == "dblscan":
                return lane_scan_radix(x, lane, big, 2)
            if op == "fullprefix_r4":
                return full_prefix(x, 4)
            if op == "fullprefix_r2":
                return full_prefix(x, 2)
            raise ValueError(op)

        if op in ("carrystate", "scratchstate"):
            # 3-array state, ~12 elementwise ops/trip, carry vs scratch.
            def body_scratch(i, _):
                a, b2, c = s0[...], s1[...], s2[...]
                a2 = jnp.minimum(a + 1, big)
                b3 = jnp.minimum(jnp.minimum(a, b2) + 2, big)
                c2 = jnp.minimum(jnp.minimum(b2, c) + 3, big)
                s0[...], s1[...], s2[...] = a2, b3, c2
                return 0

            def body_carry(i, st):
                a, b2, c = st
                a2 = jnp.minimum(a + 1, big)
                b3 = jnp.minimum(jnp.minimum(a, b2) + 2, big)
                c2 = jnp.minimum(jnp.minimum(b2, c) + 3, big)
                return a2, b3, c2

            x = x_ref[...]
            if use_scratch:
                s0[...], s1[...], s2[...] = x, x + 1, x + 2
                jax.lax.fori_loop(0, t_ref[0, 0], body_scratch, 0)
                out_ref[...] = s0[...]
            else:
                st = jax.lax.fori_loop(
                    0, t_ref[0, 0], body_carry, (x, x + 1, x + 2)
                )
                out_ref[...] = st[0]
            return

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
            scratch_shapes=[
                pltpu.VMEM((B, R, LANES), jnp.int32),
                pltpu.VMEM((B, R, LANES), jnp.int32),
                pltpu.VMEM((B, R, LANES), jnp.int32),
            ],
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
        "rollchain4",
        "dblscan",
        "radix4scan_plain",
        "radix8scan_plain",
        "fullprefix_r2",
        "fullprefix_r4",
        "carrystate",
        "scratchstate",
    ):
        try:
            measure(op)
        except Exception as e:
            print(json.dumps({"op": op, "error": str(e)[:200]}), flush=True)
