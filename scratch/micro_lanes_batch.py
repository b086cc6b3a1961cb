"""TPU slope timing for the lane kernel's BATCH axis.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_lanes_batch.py [B] [m] [w]
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    from globalign_tpu.utils.platform import enable_compilation_cache
    from globalign_tpu.ops import fill_lanes, fill_pallas

    enable_compilation_cache()
    n = m
    rng = np.random.default_rng(11)
    ta = np.zeros((B, m + 1), np.int32)
    ta[:, 1:] = rng.integers(1, 5, (B, m))
    tb = np.zeros((B, n + 1), np.int32)
    tb[:, 1:] = rng.integers(1, 5, (B, n))
    mt = np.full((B,), m, np.int32)
    nt = np.full((B,), n, np.int32)

    got = np.asarray(
        fill_lanes.lanes_batch_final3(
            jnp.asarray(ta), jnp.asarray(tb), 0, 5, 3, 3, 4,
            jnp.asarray(mt), jnp.asarray(nt), w=w,
        )
    )
    # Oracle: the generic batch dispatcher (stacked/uniform kernels).
    A = 6
    cm = np.full((A, A), 5, np.int32)
    np.fill_diagonal(cm, 0)
    cm[5, :] = 3
    cm[:, 5] = 3
    cm[5, 5] = 0
    want = np.asarray(
        fill_pallas.batch_final3(
            jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(cm), 5, 4,
            jnp.asarray(mt), jnp.asarray(nt),
        )
    )
    print(
        json.dumps(
            {"B": B, "m": m, "w": w, "match": bool((got == want).all())}
        ),
        flush=True,
    )
    if not (got == want).all():
        print(got[:4], want[:4])
        return

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(ta_j, tb_j, mt_j, nt_j, k):
        tot = jnp.int32(0)
        for i in range(k):
            tai = jnp.roll(ta_j, i, axis=0)
            r = fill_lanes.lanes_batch_final3(
                tai + (tot & 0), tb_j, 0, 5, 3, 3, 4, mt_j, nt_j, w=w
            )
            tot = tot + jnp.min(r)
        return tot

    taj, tbj = jnp.asarray(ta), jnp.asarray(tb)
    mtj, ntj = jnp.asarray(mt), jnp.asarray(nt)
    lo, hi = 2, 7
    for k in (lo, hi):
        chain(taj, tbj, mtj, ntj, k=k).block_until_ready()
    best = {}
    for k in (lo, hi):
        b = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            chain(taj, tbj, mtj, ntj, k=k).block_until_ready()
            b = min(b, time.perf_counter() - t0)
        best[k] = b
    t_kernel = (best[hi] - best[lo]) / (hi - lo)
    gcups = B * m * n / t_kernel / 1e9
    print(
        json.dumps(
            {
                "B": B,
                "m": m,
                "w": w,
                "t_kernel_ms": round(t_kernel * 1e3, 3),
                "gcups": round(gcups, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
