"""Headline benchmark: GCUPS on a 10kb affine-gap Gotoh fill (single chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (iamgiddyaboutgit/globalign) publishes no numbers and
hard-caps m*n < 2e7 (start.py:213), so 10kb x 10kb cannot even run there.  The
measured throughput of its interpreted fill is ~1e-3 GCUPS on one CPU core
(BASELINE.md); vs_baseline is computed against that.

Timing protocol: the per-call wall clock through the remote-TPU tunnel is
dominated by a ~35 ms host<->device round trip, so the kernel is timed by
slope — K chained fills (distinct inputs, summed outputs) inside one jit,
fetched once, at two chain lengths:  t_kernel = (t_hi - t_lo) / (hi - lo).
Both chain points are > 1 so each measurement is kernel-dominated and the
residual tunnel jitter (a few ms per fetch) divides by the 10-call gap;
each point takes the best of ``--repeats`` runs.

Usage: python bench.py [--m 10000 --n 10000] [--repeats 4] [--backend auto]
"""

import argparse
import functools
import json
import sys
import time

REFERENCE_GCUPS = 1e-3  # measured interpreted-Python fill, BASELINE.md


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--m", type=int, default=10_000)
    parser.add_argument("--n", type=int, default=10_000)
    parser.add_argument("--repeats", type=int, default=6)
    parser.add_argument("--chain_lo", type=int, default=2)
    parser.add_argument("--chain", type=int, default=12)
    parser.add_argument(
        "--backend", choices=["auto", "scan", "rows", "pallas"], default="auto"
    )
    parser.add_argument(
        "--kernel", choices=["lanes", "fast", "base", "wave"],
        default="lanes",
        help="Pallas kernel variant (A/B). 'lanes' = the cell-per-lane "
        "strip kernel (no prefix-scan chain; the fast path for uniform "
        "schemes); 'base'/'fast'/'wave' = the scan-based kernels.",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    platform = jax.devices()[0].platform

    backend = args.backend
    if backend == "auto":
        backend = "pallas" if platform != "cpu" else "rows"

    # Tokenized random DNA pair at the target lengths, default simple scheme.
    from globalign_tpu.ops.transforms import scoring_mat_to_costing_mat
    from globalign_tpu.utils.matrices import create_scoring_mat
    from globalign_tpu.utils.tokenize import Alphabet

    rng = np.random.default_rng(0)
    tok_a = np.zeros((args.m + 1,), np.int32)
    tok_b = np.zeros((args.n + 1,), np.int32)
    tok_a[1:] = rng.integers(0, 4, size=args.m, dtype=np.int32)
    tok_b[1:] = rng.integers(0, 4, size=args.n, dtype=np.int32)

    alphabet = Alphabet.from_letters(("A", "C", "G", "T", "-"))
    costing = scoring_mat_to_costing_mat(
        create_scoring_mat(alphabet, 2, -3, -2), max_score=2
    )

    cost_mat = jnp.asarray(costing.values)
    gap_id = jnp.int32(alphabet.gap_id)
    gap_open = jnp.int32(4)
    tb = jnp.asarray(tok_b)

    if backend == "pallas":
        from globalign_tpu.ops import fill_pallas

        if args.kernel == "lanes":
            from globalign_tpu.ops import fill_lanes

            prm = fill_pallas.uniform_scheme_params(
                costing.values, alphabet.gap_id
            )
            cma, cmm, dco, ico = (int(v) for v in prm)
            w = fill_lanes.pick_w(1, args.m, args.n)

            def one(ta):
                # Cell-per-lane strip kernel: no per-row prefix-scan
                # chain; strips advance one cell per wave with a single
                # lane shift of cross-strip edges (docs/PERF.md).
                return fill_lanes.lanes_fill_cost(
                    ta, tb, cma, cmm, dco, ico, 4, args.m, args.n, w=w
                )

        elif args.kernel == "wave":
            prm = fill_pallas.uniform_scheme_params(
                costing.values, alphabet.gap_id
            )
            cma, cmm, dco, ico = prm

            def one(ta):
                # Anti-diagonal meet-in-the-middle: wavefront halves as a
                # stacked 2-batch, joined over the crossing diagonal.
                return fill_pallas.wave_split_fill_cost(
                    ta, tb, cma, cmm, dco, ico, gap_open, args.m, args.n
                )

        else:

            def one(ta):
                # Meet-in-the-middle split: halves run as a stacked 2-batch,
                # halving the sequential row count (docs/PERF.md).
                return fill_pallas.split_fill_cost(
                    ta, tb, cost_mat, gap_id, gap_open, args.m, args.n,
                    fast=(args.kernel == "fast"),
                )

    elif backend == "rows":
        from globalign_tpu.ops import fill_rows

        def one(ta):
            return fill_rows.row_fill_impl(
                ta, tb, cost_mat, gap_id, gap_open, want_moves=False
            ).final3[0]

    else:
        from globalign_tpu.ops import fill_scan

        def one(ta):
            return fill_scan.wavefront_fill_impl(
                ta, tb, cost_mat, gap_id, gap_open, want_moves=False
            ).final3[0]

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_k(tas, k):
        return sum(one(tas[i]) for i in range(k))

    def measure(k):
        tas = jnp.asarray(
            np.stack([np.roll(tok_a, i) for i in range(k)])
        )
        val = np.asarray(run_k(tas, k))  # compile + sanity
        assert 0 <= int(val) < (1 << 31), f"implausible total {val}"
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(run_k(tas, k))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = measure(args.chain_lo)
    t_hi = measure(args.chain)
    per = max((t_hi - t_lo) / (args.chain - args.chain_lo), 1e-9)
    gcups = args.m * args.n / per / 1e9

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
