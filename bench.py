"""Headline benchmark: GCUPS on a 10kb affine-gap Gotoh fill (single chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (iamgiddyaboutgit/globalign) publishes no numbers and
hard-caps m*n < 2e7 (start.py:213), so 10kb x 10kb cannot even run there.  The
measured throughput of its interpreted fill is ~1e-3 GCUPS on one CPU core
(BASELINE.md); vs_baseline is computed against that.

Usage: python bench.py [--m 10000 --n 10000] [--repeats 3] [--backend auto]
"""

import argparse
import json
import sys
import time

REFERENCE_GCUPS = 1e-3  # measured interpreted-Python fill, BASELINE.md


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--m", type=int, default=10_000)
    parser.add_argument("--n", type=int, default=10_000)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument(
        "--backend", choices=["auto", "scan", "pallas"], default="auto"
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from globalign_tpu.ops import fill_scan

    platform = jax.devices()[0].platform

    # Tokenized random DNA pair at the target lengths, default simple scheme.
    rng = np.random.default_rng(0)
    tok_a = np.zeros((args.m + 1,), np.int32)
    tok_b = np.zeros((args.n + 1,), np.int32)
    tok_a[1:] = rng.integers(0, 4, size=args.m, dtype=np.int32)
    tok_b[1:] = rng.integers(0, 4, size=args.n, dtype=np.int32)

    from globalign_tpu.ops.transforms import scoring_mat_to_costing_mat
    from globalign_tpu.utils.matrices import create_scoring_mat
    from globalign_tpu.utils.tokenize import Alphabet

    alphabet = Alphabet.from_letters(("A", "C", "G", "T", "-"))
    costing = scoring_mat_to_costing_mat(
        create_scoring_mat(alphabet, 2, -3, -2), max_score=2
    )

    backend = args.backend
    if backend == "auto":
        try:
            from globalign_tpu.ops import fill_pallas  # noqa: F401

            backend = "pallas" if platform != "cpu" else "scan"
        except ImportError:
            backend = "scan"

    cost_mat = jnp.asarray(costing.values)
    gap_id = jnp.int32(alphabet.gap_id)
    gap_open = jnp.int32(4)
    ta = jnp.asarray(tok_a)
    tb = jnp.asarray(tok_b)

    if backend == "pallas":
        from globalign_tpu.ops import fill_pallas

        def run():
            return fill_pallas.wavefront_fill_cost(
                ta, tb, cost_mat, gap_id, gap_open
            )

    else:

        def run():
            return fill_scan.wavefront_fill(
                ta, tb, cost_mat, gap_id, gap_open, want_moves=False
            ).final3

    # Warm up / compile.
    out = jax.block_until_ready(run())
    cost = int(np.asarray(out).min())
    assert 0 <= cost < (1 << 30), f"implausible cost {cost}"

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        times.append(time.perf_counter() - t0)

    best = min(times)
    gcups = args.m * args.n / best / 1e9

    print(
        json.dumps(
            {
                "metric": f"GCUPS_{args.m//1000}kb_affine_fill_{platform}_{backend}",
                "value": round(gcups, 4),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / REFERENCE_GCUPS, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
