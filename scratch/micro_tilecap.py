"""Tile-size and small-B dispatch probes (round 4, after bench_bcurve):

  1. B=256 L=1k: one 256-pair call (plan) vs two 128-pair calls vs four
     64-pair calls — does capping the kernel tile at R<=16 lane-chunks
     (2 sublane tiles) beat VMEM-limited tiles?
  2. B=8 L=1k: w sweep {8,16,32,64} — bench_bcurve measured the w=8
     dispatch at 6.5x the issue model (per-pair strip staging).
  3. B=32 L=1k: w=32 (dispatch) vs w=64.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_tilecap.py
"""

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from globalign_tpu.ops import fill_lanes as fl

    print(json.dumps({"device": jax.devices()[0].device_kind}), flush=True)
    L = 1024
    cma, cmm, dco, ico = 0, 5, 3, 3

    def make(B, w, tile):
        rng = np.random.default_rng(0)
        tok_a = np.zeros((B, L + 1), np.int32)
        tok_b = np.zeros((B, L + 1), np.int32)
        tok_a[:, 1:] = rng.integers(0, 4, (B, L))
        tok_b[:, 1:] = rng.integers(0, 4, (B, L))
        m_true = jnp.full((tile,), L, jnp.int32)
        n_true = jnp.full((tile,), L, jnp.int32)

        def one(ta, tb):
            outs = []
            for lo in range(0, B, tile):
                outs.append(jnp.sum(fl.lanes_batch_final3(
                    ta[lo : lo + tile], tb[lo : lo + tile],
                    cma, cmm, dco, ico, 4, m_true, n_true, w=w
                )))
            return sum(outs)

        tbb = jnp.asarray(tok_b)

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k(tas, k):
            return sum(one(tas[i], tbb) for i in range(k))

        def tas_of(k):
            return jnp.asarray(
                np.stack([np.roll(tok_a, i, axis=1) for i in range(k)])
            )

        return run_k, tas_of

    cases = {
        "B256_w64_t256": (256, 64, 256),
        "B256_w64_t128": (256, 64, 128),
        "B256_w64_t64": (256, 64, 64),
        "B8_w8": (8, 8, 8),
        "B8_w16": (8, 16, 8),
        "B8_w32": (8, 32, 8),
        "B8_w64": (8, 64, 8),
        "B32_w32": (32, 32, 32),
        "B32_w64": (32, 64, 32),
    }
    built = {}
    sums = {}
    for name, (B, w, tile) in cases.items():
        try:
            run_k, tas_of = make(B, w, tile)
            sums[(B,)] = sums.get((B,))
            s = int(np.asarray(run_k(tas_of(2), 2)))
            if sums[(B,)] is None:
                sums[(B,)] = s
            elif sums[(B,)] != s:
                print(json.dumps({"MISMATCH": name}), flush=True)
            built[name] = (run_k, tas_of, B)
        except Exception as e:  # noqa: BLE001 - probe
            print(json.dumps({name: f"{type(e).__name__}: {e}"[:150]}),
                  flush=True)

    def measure(run_k, tas_of, lo=2, hi=10, reps=5):
        tas = {k: tas_of(k) for k in (lo, hi)}
        for k in (lo, hi):
            np.asarray(run_k(tas[k], k))
        best = {lo: float("inf"), hi: float("inf")}
        for _ in range(reps):
            for k in (lo, hi):
                t0 = time.perf_counter()
                np.asarray(run_k(tas[k], k))
                best[k] = min(best[k], time.perf_counter() - t0)
        return max((best[hi] - best[lo]) / (hi - lo), 1e-9)

    for rnd in range(2):
        row = {"round": rnd}
        for name, (run_k, tas_of, B) in built.items():
            per = measure(run_k, tas_of)
            row[name] = round(B * L * L / per / 1e9, 2)
            row[f"{name}_ms"] = round(per * 1e3, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
