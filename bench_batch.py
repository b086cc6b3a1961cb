"""Batch-throughput benchmark: GCUPS aligning B independent pairs.

The single-pair headline (bench.py) is latency-bound by the DP's serial
row chain; production many-pair serving is throughput-bound and rides the
stacked kernel's batching.  Prints ONE JSON line like bench.py.

Usage: python bench_batch.py [--pairs 64 --len 1024] [--with_moves]
"""

import argparse
import functools
import json
import sys
import time


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pairs", type=int, default=64)
    parser.add_argument("--len", dest="length", type=int, default=1024)
    parser.add_argument("--repeats", type=int, default=4)
    parser.add_argument("--chain", type=int, default=24)
    parser.add_argument("--chain_lo", type=int, default=2)
    parser.add_argument(
        "--with_moves",
        action="store_true",
        help="Use the moves-emitting kernel (traceback-capable fill).",
    )
    parser.add_argument(
        "--uniform",
        action="store_true",
        help="Use the uniform-scheme stacked kernel (simple schemes).",
    )
    parser.add_argument(
        "--stacked",
        action="store_true",
        help="Use the scheme-generic stacked kernel (the pre-lanes "
        "cost default; kept for A/B).",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from globalign_tpu.ops import fill_pallas
    from globalign_tpu.ops.transforms import scoring_mat_to_costing_mat
    from globalign_tpu.utils.matrices import create_scoring_mat
    from globalign_tpu.utils.platform import enable_compilation_cache
    from globalign_tpu.utils.tokenize import Alphabet

    enable_compilation_cache()
    platform = jax.devices()[0].platform

    B, L = args.pairs, args.length
    rng = np.random.default_rng(0)
    tok_a = np.zeros((B, L + 1), np.int32)
    tok_b = np.zeros((B, L + 1), np.int32)
    tok_a[:, 1:] = rng.integers(0, 4, (B, L))
    tok_b[:, 1:] = rng.integers(0, 4, (B, L))

    alphabet = Alphabet.from_letters(("A", "C", "G", "T", "-"))
    costing = scoring_mat_to_costing_mat(
        create_scoring_mat(alphabet, 2, -3, -2), max_score=2
    )
    cost_mat = jnp.asarray(costing.values)
    gap_id = jnp.int32(alphabet.gap_id)
    gap_open = jnp.int32(4)
    m_true = jnp.full((B,), L, jnp.int32)
    n_true = jnp.full((B,), L, jnp.int32)
    tb = jnp.asarray(tok_b)

    if args.uniform:
        prm = fill_pallas.uniform_scheme_params(
            costing.values, alphabet.gap_id
        )
        cma, cmm, dco, ico = prm

        def one(ta):
            last = fill_pallas.stacked_uniform_fill_last_rows(
                ta, tb, cma, cmm, dco, ico, gap_open, m_true, n_true
            )
            return jnp.sum(last)

    elif args.with_moves:

        def one(ta):
            last, moves = fill_pallas.stacked_fill_with_moves(
                ta, tb, cost_mat, gap_id, gap_open, m_true, n_true
            )
            # Consume a slice of moves so the DMA stream is not dead code.
            return jnp.sum(last) + jnp.sum(moves[:, 1].astype(jnp.int32))

    elif args.stacked:

        def one(ta):
            last = fill_pallas.stacked_fill_last_rows(
                ta, tb, cost_mat, gap_id, gap_open, m_true, n_true
            )
            return jnp.sum(last)

    else:
        # Default cost mode: the cell-per-lane strip kernel (the
        # dispatched fast path for uniform schemes, docs/PERF.md).
        from globalign_tpu.ops import fill_lanes

        prm = fill_pallas.uniform_scheme_params(
            costing.values, alphabet.gap_id
        )
        cma, cmm, dco, ico = (int(v) for v in prm)
        w = fill_lanes.pick_w(B, L, L)

        def one(ta):
            vals = fill_lanes.lanes_batch_final3(
                ta, tb, cma, cmm, dco, ico, 4, m_true, n_true, w=w
            )
            return jnp.sum(vals)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_k(tas, k):
        return sum(one(tas[i]) for i in range(k))

    def measure(k):
        tas = jnp.asarray(
            np.stack([np.roll(tok_a, i, axis=1) for i in range(k)])
        )
        np.asarray(run_k(tas, k))
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(run_k(tas, k))
            best = min(best, time.perf_counter() - t0)
        return best

    # Both chain points > 1 and a wide gap: the lanes kernel finishes
    # 64 x 1 kb in ~0.3 ms, far below the ~35 ms tunnel jitter, so the
    # slope needs many kernel-dominated calls to resolve.
    t1 = measure(args.chain_lo)
    tk = measure(args.chain)
    per = max((tk - t1) / (args.chain - args.chain_lo), 1e-9)
    gcups = B * L * L / per / 1e9

    mode = (
        "uniform" if args.uniform
        else "moves" if args.with_moves
        else "stacked" if args.stacked
        else "lanes"
    )
    print(
        json.dumps(
            {
                "metric": f"GCUPS_batch{B}x{L}_{mode}_{platform}",
                "value": round(gcups, 4),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / 1e-3, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
