"""Does Mosaic/TPU support per-lane VARIABLE shift amounts — the
primitive behind a bitmask-shift substitution lookup
(sub bit j = (mask_pj >> a_cur) & 1)?  Checks compile + correctness in
a minimal Pallas kernel, then slope-times shift-based 5-bit lookup vs
a 24-deep select chain on a (8, 128) working set.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_varshift.py
"""

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    A, BITS, R, LANES = 25, 5, 8, 128
    ITERS = 40_000
    ITERS_HI = 200_000

    rng = np.random.default_rng(5)
    a = rng.integers(0, A, (R, LANES)).astype(np.int32)
    table = rng.integers(0, 32, (A,)).astype(np.int32)  # 5-bit costs
    masks = np.array(
        [sum(((int(table[k]) >> j) & 1) << k for k in range(A))
         for j in range(BITS)],
        np.int32,
    )

    def mk(body, iters):
        def kernel(a_ref, t_ref, o_ref):
            def step(i, acc):
                av = a_ref[:, :] + (acc & 0)
                return acc + body(av, t_ref)

            o_ref[:, :] = jax.lax.fori_loop(
                0, iters, step, jnp.zeros((R, LANES), jnp.int32))

        return kernel

    def shift_body(av, t_ref):
        sub = (t_ref[0, 0] >> av) & 1
        for j in range(1, BITS):
            sub = sub + (((t_ref[0, j] >> av) & 1) << j)
        return sub

    def chain_body(av, t_ref):
        sub = jnp.full((R, LANES), t_ref[1, 0], jnp.int32)
        for k in range(1, A):
            sub = jnp.where(av == k, t_ref[1, k], sub)
        return sub

    tbuf = np.zeros((2, 32), np.int32)
    tbuf[0, :BITS] = masks
    tbuf[1, :A] = table

    outs = {}
    per_iter = {}
    for name, body in [("shift", shift_body), ("chain", chain_body)]:
        fs = {}
        try:
            for it in (ITERS, ITERS_HI):
                fs[it] = jax.jit(pl.pallas_call(
                    mk(body, it),
                    out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.int32),
                ))
                fs[it](jnp.asarray(a), jnp.asarray(tbuf)
                       ).block_until_ready()
        except Exception as e:  # noqa: BLE001 - probing compile support
            print(json.dumps({name: f"FAIL {type(e).__name__}: {e}"[:300]}),
                  flush=True)
            continue
        outs[name] = np.asarray(fs[ITERS](jnp.asarray(a),
                                          jnp.asarray(tbuf)))
        best = {}
        for it, f in fs.items():
            b = float("inf")
            for _ in range(6):
                t0 = time.perf_counter()
                f(jnp.asarray(a), jnp.asarray(tbuf)).block_until_ready()
                b = min(b, time.perf_counter() - t0)
            best[it] = b
        per_iter[name] = (best[ITERS_HI] - best[ITERS]) / (
            ITERS_HI - ITERS)

    want = table[a] * ITERS
    print(json.dumps({
        "shift_ok": bool((outs.get("shift") == want).all())
        if "shift" in outs else None,
        "chain_ok": bool((outs.get("chain") == want).all())
        if "chain" in outs else None,
        "ns_per_lookup": {k: round(v * 1e9, 2) for k, v in per_iter.items()},
        "ratio_chain_over_shift": round(
            per_iter["chain"] / per_iter["shift"], 2)
        if len(per_iter) == 2 else None,
    }), flush=True)


if __name__ == "__main__":
    main()
