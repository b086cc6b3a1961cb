"""Round-4 width-rule probe 3: does "largest w with R>=4" extrapolate?

  - B64 L1024: w128 (R=4) vs the measured-best w64 (R=8)
  - B256 L1024: w128 tile128 (R=8/call) vs w64 tile128 (R=16/call)
  - B16 L4096: w128 (R=4) vs measured-best w64 (R=8)
  - B128 L1024: w256 (R=4) vs measured-best w128 (R=8)

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_wrule2.py
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
    cma, cmm, dco, ico = 0, 5, 3, 3

    def make(B, L, w, tile=None):
        tile = tile or B
        rng = np.random.default_rng(0)
        tok_a = np.zeros((B, L + 1), np.int32)
        tok_b = np.zeros((B, L + 1), np.int32)
        tok_a[:, 1:] = rng.integers(0, 4, (B, L))
        tok_b[:, 1:] = rng.integers(0, 4, (B, L))
        m_true = jnp.full((tile,), L, jnp.int32)
        n_true = jnp.full((tile,), L, jnp.int32)
        tbb = jnp.asarray(tok_b)

        def one(ta):
            return sum(
                jnp.sum(fl.lanes_batch_final3(
                    ta[lo : lo + tile], tbb[lo : lo + tile],
                    cma, cmm, dco, ico, 4, m_true, n_true, w=w))
                for lo in range(0, B, tile)
            )

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k(tas, k):
            return sum(one(tas[i]) for i in range(k))

        def tas_of(k):
            return jnp.asarray(
                np.stack([np.roll(tok_a, i, axis=1) for i in range(k)])
            )

        return run_k, tas_of

    cases = [
        ("B64_w64", 64, 1024, 64, None),
        ("B64_w128", 64, 1024, 128, None),
        ("B256_w64_t128", 256, 1024, 64, 128),
        ("B256_w128_t128", 256, 1024, 128, 128),
        ("L4096_B16_w128", 16, 4096, 128, None),
        ("B128_w256", 128, 1024, 256, None),
    ]
    built = {}
    sums = {}
    for name, B, L, w, tile in cases:
        t0 = time.perf_counter()
        try:
            run_k, tas_of = make(B, L, w, tile)
            s = int(np.asarray(run_k(tas_of(2), 2)))
            key = (B, L)
            if key in sums and sums[key] != s:
                print(json.dumps({"MISMATCH": name}), flush=True)
            sums[key] = s
            built[name] = (run_k, tas_of, B, L)
            print(json.dumps({
                "compiled": name,
                "compile_s": round(time.perf_counter() - t0, 1),
            }), flush=True)
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
        for name, (run_k, tas_of, B, L) in built.items():
            per = measure(run_k, tas_of)
            row[name] = round(B * L * L / per / 1e9, 2)
            row[f"{name}_ms"] = round(per * 1e3, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
