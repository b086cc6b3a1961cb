"""TPU within-run sweep: lanes meet-in-the-middle split at 10 kb across
strip widths w — validates lanes_split_plan's latency-model choice
against measurement (per-wave ~ fixed + w * chain-step).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_split_wsweep.py [m]
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000

    import jax
    import jax.numpy as jnp

    from globalign_tpu.ops import fill_lanes
    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    n = m
    rng = np.random.default_rng(0)
    ta = np.zeros((m + 1,), np.int32)
    tb = np.zeros((n + 1,), np.int32)
    ta[1:] = rng.integers(0, 4, m)
    tb[1:] = rng.integers(0, 4, n)
    taj, tbj = jnp.asarray(ta), jnp.asarray(tb)

    plan = fill_lanes.lanes_split_plan(m, n)
    print(json.dumps({"m": m, "model_plan": plan}), flush=True)

    K_LO, K_HI = 2, 12

    def measure(w):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k(tas, k):
            tot = jnp.int32(0)
            for i in range(k):
                tot = tot + fill_lanes.lanes_split_fill_cost(
                    tas[i], tbj, 0, 3, 2, 2, 4, m, n, w=w
                )
            return tot

        def t_of(k):
            tas = jnp.asarray(np.stack([np.roll(ta, i) for i in range(k)]))
            np.asarray(run_k(tas, k))
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(run_k(tas, k))
                best = min(best, time.perf_counter() - t0)
            return best

        per = max((t_of(K_HI) - t_of(K_LO)) / (K_HI - K_LO), 1e-9)
        return m * n / per / 1e9

    for rnd in range(2):
        row = {"round": rnd}
        for w in (12, 16, 20, 26, 32):
            row[f"w{w}"] = round(measure(w), 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
