"""End-to-end TPU measurements for PERF.md (run alone on the chip):

1. 30kb x 30kb full alignment (checkpoint + block replay traceback) —
   wall-clock + windowed-fetch count (round-1 baseline: ~50 s, whole-block
   fetches ~1 GB).
2. Sequence-parallel strip kernel on a 1-device mesh at 10kb — bounds the
   seqpar overhead vs the plain fill on the same hardware.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/measure_e2e.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from globalign_tpu.config import resolve_scheme
    from globalign_tpu.models.gotoh import GotohAligner
    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(7)

    # --- 30kb full alignment ------------------------------------------------
    m = n = 30_000
    s1 = "".join(rng.choice(list("ACGT"), m))
    s2 = "".join(rng.choice(list("ACGT"), n))
    scheme = resolve_scheme(s1, s2)
    aligner = GotohAligner(scheme)

    t0 = time.perf_counter()
    out = aligner.align(s1, s2)
    dt = time.perf_counter() - t0
    # Re-run (compiles cached) for the steady-state number.
    t0 = time.perf_counter()
    out = aligner.align(s1, s2)
    dt2 = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "e2e_30kb_full_alignment_s",
                "first_s": round(dt, 1),
                "steady_s": round(dt2, 1),
                "cost": out.cost,
                "score": out.score,
                "aligned_len": len(out.seq_1_aligned),
            }
        ),
        flush=True,
    )

    # --- seqpar strip kernel, 1-device mesh, 10kb ---------------------------
    from globalign_tpu.parallel.seqpar import make_strip_mesh, sharded_pair_cost
    from globalign_tpu.utils.tokenize import encode_padded

    m = n = 10_000
    s1 = "".join(rng.choice(list("ACGT"), m))
    s2 = "".join(rng.choice(list("ACGT"), n))
    scheme = resolve_scheme(s1, s2)
    ta = encode_padded(scheme.alphabet, s1, m)
    tb = encode_padded(scheme.alphabet, s2, n)
    mesh = make_strip_mesh(jax.devices()[:1])

    def run():
        return sharded_pair_cost(
            mesh, ta, tb, scheme.costing.values, scheme.alphabet.gap_id,
            scheme.gap_open_cost, block_rows=512, backend="pallas",
        )

    out1 = run()  # compile
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out2 = run()
        best = min(best, time.perf_counter() - t0)
    assert (out1 == out2).all()
    print(
        json.dumps(
            {
                "metric": "seqpar_strip_kernel_10kb_1dev",
                "wall_s": round(best, 3),
                "gcups_wall": round(m * n / best / 1e9, 2),
                "cost": int(out2.min()),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
