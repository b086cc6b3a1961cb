"""TPU A/B: fused min(M, Iy) left-edge ring (4 cross-lane shifts per
wave) vs the separate M/Iy rings (5 shifts) in the cost-only lane
kernel (fill_lanes._FUSED_EDGE).  Measures the single-pair split
dispatch at 10 kb (the bench.py headline path) and the 64x1k batch.

SUPERSEDED (round 4): _FUSED_EDGE no longer exists — the my-carry
recurrence (fill_lanes._MYCARRY) subsumes the fused ring and adds the
regrouped minima; A/B it with scratch/micro_mycarry.py instead.  This
script's flag writes would silently no-op against the current module.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_fused_edge.py
"""

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from globalign_tpu.ops import fill_lanes
    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    m = n = 10_000
    ta = np.zeros((m + 1,), np.int32)
    tb = np.zeros((n + 1,), np.int32)
    ta[1:] = rng.integers(0, 4, m)
    tb[1:] = rng.integers(0, 4, n)
    tbj = jnp.asarray(tb)
    sp = fill_lanes.lanes_split_plan(m, n)

    B, L = 64, 1024
    tab = np.zeros((B, L + 1), np.int32)
    tbb = np.zeros((B, L + 1), np.int32)
    tab[:, 1:] = rng.integers(0, 4, (B, L))
    tbb[:, 1:] = rng.integers(0, 4, (B, L))
    tbbj = jnp.asarray(tbb)
    wb = fill_lanes.pick_w(B, L, L)
    mt = jnp.full((B,), L, jnp.int32)
    nt = jnp.full((B,), L, jnp.int32)

    K_LO, K_HI = 2, 12

    def slope(run_k, mk_args):
        def t_of(k):
            args = mk_args(k)
            np.asarray(run_k(*args, k))
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(run_k(*args, k))
                best = min(best, time.perf_counter() - t0)
            return best

        return max((t_of(K_HI) - t_of(K_LO)) / (K_HI - K_LO), 1e-9)

    def measure(flag):
        fill_lanes._FUSED_EDGE = flag
        jax.clear_caches()

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_split(tas, k):
            tot = jnp.int32(0)
            for i in range(k):
                tot = tot + fill_lanes.lanes_split_fill_cost(
                    tas[i], tbj, 0, 3, 2, 2, 4, m, n, w=sp[0]
                )
            return tot

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_batch(tas, k):
            tot = jnp.zeros((B, 3), jnp.int32)
            for i in range(k):
                tot = tot + fill_lanes.lanes_batch_final3(
                    tas[i], tbbj, 0, 3, 2, 2, 4, mt, nt, w=wb
                )
            return tot

        # Exactness pin vs the flag-independent oracle value.
        ref = int(
            fill_lanes.lanes_split_fill_cost(
                jnp.asarray(ta), tbj, 0, 3, 2, 2, 4, m, n, w=sp[0]
            )
        )

        per_s = slope(
            run_split,
            lambda k: (
                jnp.asarray(np.stack([np.roll(ta, i) for i in range(k)])),
            ),
        )
        per_b = slope(
            run_batch,
            lambda k: (
                jnp.asarray(
                    np.stack([np.roll(tab, i, axis=1) for i in range(k)])
                ),
            ),
        )
        return m * n / per_s / 1e9, B * L * L / per_b / 1e9, ref

    refs = set()
    for rnd in range(2):
        g_f, gb_f, r1 = measure(True)
        g_n, gb_n, r2 = measure(False)
        refs.update([r1, r2])
        print(
            json.dumps(
                {
                    "round": rnd,
                    "split10k_fused": round(g_f, 1),
                    "split10k_plain": round(g_n, 1),
                    "batch_fused": round(gb_f, 1),
                    "batch_plain": round(gb_n, 1),
                    "speedup_split": round(g_f / g_n, 2),
                    "speedup_batch": round(gb_f / gb_n, 2),
                }
            ),
            flush=True,
        )
    assert len(refs) == 1, refs  # both variants bit-identical
    print(json.dumps({"cost": refs.pop(), "match": True}), flush=True)


if __name__ == "__main__":
    main()
