"""Headline benchmark: GCUPS on a 10kb affine-gap Gotoh fill (single chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The line is ALWAYS printed, even on device outage or deadline overrun —
the device is probed in a subprocess with a hard timeout, and a watchdog
thread emits the best-known partial state before exiting if the overall
deadline is hit (a dead TPU tunnel must produce a self-describing error
record, never an empty rc=124 artifact).

Baseline: the reference (iamgiddyaboutgit/globalign) publishes no numbers and
hard-caps m*n < 2e7 (start.py:213), so 10kb x 10kb cannot even run there.  The
measured throughput of its interpreted fill is ~1e-3 GCUPS on one CPU core
(BASELINE.md); vs_baseline is computed against that.

Timing protocol (drift-robust, round 4): the per-call wall clock through
the remote-TPU tunnel is dominated by a ~35 ms host<->device round trip,
so every contender is timed by slope — K chained fills (distinct inputs,
summed outputs) inside one jit, fetched once, at two chain lengths:
t_kernel = (t_hi - t_lo) / (hi - lo).  All contenders (single-pair fill,
batch fill, an optional w=32 batch A/B arm, and a FIXED VPU calibration
loop that involves no engine code) are measured INTERLEAVED round-robin
within the one run, best-of N rounds per chain point, so tunnel/chip
drift hits every arm equally.  The artifact carries the raw per-round
samples and the calibration number, so a slow-chip session is
quantifiable in-artifact (CLAUDE.md: effective chip speed varies up to
~4x between sessions; only within-run ratios are trustworthy).

Usage: python bench.py [--m 10000 --n 10000] [--repeats 6] [--no_ab]
"""

import argparse
import functools
import json
import os
import subprocess
import sys
import threading
import time

REFERENCE_GCUPS = 1e-3  # measured interpreted-Python fill, BASELINE.md

# Best-known results, emitted by whoever exits first (main path or
# watchdog).  "metric" is filled in once argv is parsed.
_state = {
    "metric": "GCUPS_10kb_affine_fill",
    "value": 0.0,
    "unit": "GCUPS",
    "vs_baseline": 0.0,
}
_emitted = threading.Event()


def _emit(**extra) -> None:
    """Print the ONE JSON line exactly once (main path or watchdog)."""
    if _emitted.is_set():
        return
    _emitted.set()
    _state.update(extra)
    print(json.dumps(_state), flush=True)


_PROBE_SRC = """
import os
import jax, jax.numpy as jnp
if os.environ.get("GLOBALIGN_BENCH_PLATFORM") == "cpu":
    # The axon plugin ignores JAX_PLATFORMS; config update is the
    # reliable CPU opt-out (CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")
d = jax.devices()
x = jnp.ones((8, 128), jnp.float32)
v = float(jnp.sum(x @ x.T))
assert v == 8 * 8 * 128, v
print(d[0].platform + "|" + d[0].device_kind)
"""


def probe_device(timeout_s: float) -> tuple[str, str] | None:
    """Enumerate devices + run one tiny op in a SUBPROCESS with a hard
    timeout.  Returns (platform, device_kind), or None if the backend is
    unreachable (the axon tunnel blocks forever inside native code when
    its relay is down — only a subprocess can be killed reliably)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    out = r.stdout.strip().splitlines()
    if not out or "|" not in out[-1]:
        return None
    platform, kind = out[-1].split("|", 1)
    return platform, kind


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--m", type=int, default=10_000)
    parser.add_argument("--n", type=int, default=10_000)
    parser.add_argument("--repeats", type=int, default=6,
                        help="Interleaved measurement rounds (best-of).")
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
    parser.add_argument(
        "--platform", choices=["auto", "cpu"], default="auto",
        help="'cpu' forces the CPU backend via jax.config (the axon "
        "plugin ignores the JAX_PLATFORMS env var).",
    )
    parser.add_argument(
        "--probe_timeout", type=float, default=240.0,
        help="Hard deadline (s) for the subprocess device probe.",
    )
    parser.add_argument(
        "--probe_retries", type=int, default=3,
        help="Max device-probe attempts (the tunnel has transient "
        "outages measured in minutes; retries ride them out while the "
        "overall deadline still guards the artifact).",
    )
    parser.add_argument(
        "--deadline", type=float, default=1200.0,
        help="Overall wall-clock budget (s); a watchdog emits the "
        "best-known JSON line and exits if it is exceeded.",
    )
    parser.add_argument(
        "--no_batch", action="store_true",
        help="Skip the batch-throughput arms.",
    )
    parser.add_argument(
        "--no_ab", action="store_true",
        help="Skip the batch w=32 A/B arm (saves two compiles).",
    )
    parser.add_argument(
        "--batch_pairs", type=int, default=64,
        help="B for the batch metric (batch_gcups).",
    )
    parser.add_argument(
        "--batch_len", type=int, default=1024,
        help="Per-pair length for the batch metric.",
    )
    parser.add_argument(
        "--batch_chain", type=int, default=24,
        help="High chain length for the batch arms.",
    )
    args = parser.parse_args()
    t_start = time.monotonic()

    if args.platform == "cpu":
        os.environ["GLOBALIGN_BENCH_PLATFORM"] = "cpu"

    _state["metric"] = f"GCUPS_{args.m // 1000}kb_affine_fill"

    # Watchdog: if anything below wedges (tunnel dying mid-run), emit
    # the best-known state and hard-exit before the driver's timeout
    # turns the artifact into an unparseable rc=124.
    def _watchdog():
        remaining = args.deadline - (time.monotonic() - t_start)
        if remaining > 0 and not _emitted.wait(timeout=remaining):
            _emit(error="bench_deadline_exceeded",
                  elapsed_s=round(time.monotonic() - t_start, 1))
            os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    # Probe with retries: the tunnel has transient multi-minute outages
    # (a 2026-08-20 session saw enumeration succeed while the first op
    # wedged for >20 min).  Stop retrying once another attempt would eat
    # the minimum measurement budget under the deadline.
    probed = None
    attempts = 0
    for attempt in range(max(1, args.probe_retries)):
        attempts = attempt + 1
        probed = probe_device(args.probe_timeout)
        if probed is not None:
            break
        remaining = args.deadline - (time.monotonic() - t_start)
        if remaining < args.probe_timeout + 300.0:
            break
        time.sleep(min(30.0, remaining / 10))
    if probed is None:
        _emit(error="tpu_unreachable",
              detail=f"device probe failed or exceeded "
                     f"{args.probe_timeout:.0f}s x{attempts} attempts "
                     f"(axon tunnel down?)")
        return 0
    _state["device_kind"] = probed[1]
    _state["probe_attempts"] = attempts

    # Everything past the probe still raises (compile failures, OOM,
    # implausible-total asserts): the artifact must carry a JSON error
    # record rather than a bare traceback.
    try:
        _run_measurements(args, t_start)
    except BaseException as e:  # noqa: BLE001 - the artifact IS the output
        _emit(error=f"{type(e).__name__}",
              detail=str(e)[:500],
              elapsed_s=round(time.monotonic() - t_start, 1))
    return 0


def _run_measurements(args, t_start: float) -> None:
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax import lax

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
            sp = fill_lanes.lanes_split_plan(args.m, args.n)

            def one(ta):
                # Cell-per-lane strip kernel (no per-row prefix-scan
                # chain), meet-in-the-middle when the latency model says
                # the halved wave count wins — the same dispatch
                # wavefront_fill_cost applies (docs/PERF.md).
                if sp is not None:
                    return fill_lanes.lanes_split_fill_cost(
                        ta, tb, cma, cmm, dco, ico, 4, args.m, args.n,
                        w=sp[0],
                    )
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

    def make_runk(fn):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k(tas, k):
            return sum(fn(tas[i]) for i in range(k))

        return run_k

    def single_tas(k):
        return jnp.asarray(np.stack([np.roll(tok_a, i) for i in range(k)]))

    # Contender registry: name -> (run_k, tas_of, (lo, hi), cells/call).
    contenders = {
        "single": (
            make_runk(one), single_tas, (args.chain_lo, args.chain),
            args.m * args.n,
        ),
    }

    # Modeled VPU ops per chained call, per arm (fill_lanes
    # .issue_model_ops): with the in-run calibration rate this yields a
    # per-arm issue_efficiency (% of the VPU issue bound actually
    # sustained) directly in the artifact — VERDICT r4 item 2.
    model_ops: dict = {}
    if backend == "pallas" and args.kernel == "lanes":
        from globalign_tpu.ops import fill_lanes as _fl

        if sp is not None:
            mh = sp[1]
            model_ops["single"] = _fl.issue_model_ops(2, mh, args.n, sp[0])
        else:
            model_ops["single"] = _fl.issue_model_ops(1, args.m, args.n, w)

    # Fixed VPU calibration loop — no engine code, one executable
    # forever: its slope is the in-artifact chip-speed normalizer.
    CAL_IT, CAL_R, CAL_C = 20_000, 256, 1024

    def calib_one(x):
        def body(_, v):
            return v * 1.000001 + 0.5

        return jnp.sum(lax.fori_loop(0, CAL_IT, body, x))

    def calib_tas(k):
        r = np.random.default_rng(1)
        return jnp.asarray(
            r.normal(size=(k, CAL_R, CAL_C)).astype(np.float32) * 0.01
        )

    if platform != "cpu":
        # The normalizer targets the accelerator; on the CPU fallback
        # the same loop would cost tens of seconds per chain.
        contenders["calib"] = (
            make_runk(calib_one), calib_tas, (2, 8),
            CAL_IT * CAL_R * CAL_C * 2,
        )

    if not args.no_batch and backend == "pallas":
        from globalign_tpu.ops import fill_lanes

        B, L = args.batch_pairs, args.batch_len
        brng = np.random.default_rng(0)
        btok_a = np.zeros((B, L + 1), np.int32)
        btok_b = np.zeros((B, L + 1), np.int32)
        btok_a[:, 1:] = brng.integers(0, 4, (B, L))
        btok_b[:, 1:] = brng.integers(0, 4, (B, L))
        m_true = jnp.full((B,), L, jnp.int32)
        n_true = jnp.full((B,), L, jnp.int32)
        tbb = jnp.asarray(btok_b)

        plan = fill_lanes.lanes_plan(B, L, L)
        w_plan = plan[0] if plan is not None else fill_lanes.pick_w(B, L, L)
        _state["batch_w"] = w_plan

        def batch_one(w):
            def fn(ta):
                return jnp.sum(fill_lanes.lanes_batch_final3(
                    ta, tbb, cma, cmm, dco, ico, 4, m_true, n_true, w=w
                ))

            return fn

        def batch_tas(k):
            return jnp.asarray(
                np.stack([np.roll(btok_a, i, axis=1) for i in range(k)])
            )

        contenders["batch"] = (
            make_runk(batch_one(w_plan)), batch_tas,
            (args.chain_lo, args.batch_chain), B * L * L,
        )
        model_ops["batch"] = fill_lanes.issue_model_ops(B, L, L, w_plan)
        if not args.no_ab and w_plan != 32:
            # In-run A/B arm: the round-3 dispatch width, so the
            # artifact itself proves the w choice (VERDICT r3 item 1).
            contenders["batch_w32"] = (
                make_runk(batch_one(32)), batch_tas,
                (args.chain_lo, args.batch_chain), B * L * L,
            )

        # Long-pair batch arm (64 x 4 kb as two 32-pair tiles): each
        # tile's 1024 strips fill one native (8, 128) sublane tile
        # exactly — the measured sweet spot (scratch/micro_b4sweep.py:
        # 32x4kb at 151-156 vs 16x4kb 100 and one-call 64x4kb 141;
        # scratch/micro_tilecap8.py: paired R=8 calls at 194-196 — the
        # TILE_MAX_R=8 production dispatch emits exactly this tiling).
        B4, L4 = 64, 4096
        T4 = 32
        b4tok_a = np.zeros((B4, L4 + 1), np.int32)
        b4tok_b = np.zeros((B4, L4 + 1), np.int32)
        b4tok_a[:, 1:] = brng.integers(0, 4, (B4, L4))
        b4tok_b[:, 1:] = brng.integers(0, 4, (B4, L4))
        m4 = jnp.full((T4,), L4, jnp.int32)
        tb4 = jnp.asarray(b4tok_b)
        plan4 = fill_lanes.lanes_plan(B4, L4, L4)
        w4 = plan4[0] if plan4 is not None else fill_lanes.pick_w(
            T4, L4, L4)
        _state["batch4k_w"] = w4

        def b4_one(ta):
            tot = jnp.int32(0)
            for lo in range(0, B4, T4):
                tot = tot + jnp.sum(fill_lanes.lanes_batch_final3(
                    ta[lo:lo + T4], tb4[lo:lo + T4],
                    cma, cmm, dco, ico, 4, m4, m4, w=w4
                ))
            return tot

        def b4_tas(k):
            return jnp.asarray(
                np.stack([np.roll(b4tok_a, i, axis=1) for i in range(k)])
            )

        contenders["batch4k"] = (
            make_runk(b4_one), b4_tas, (args.chain_lo, 10),
            B4 * L4 * L4,
        )
        model_ops["batch4k"] = (B4 // T4) * fill_lanes.issue_model_ops(
            T4, L4, L4, w4
        )

        # General-matrix arm: the flagship BLOSUM62 scheme (the
        # reference's headline matrix) at the single-pair headline
        # shape, riding the round-4 bitmask-shift substitution.
        from globalign_tpu.utils.matrices import load_bundled_matrix

        try:
            blosum = load_bundled_matrix("BLOSUM62")
        except Exception as e:  # noqa: BLE001 - best-effort arm
            _state["general_error"] = f"{type(e).__name__}: {e}"[:200]
        else:
            bcost = scoring_mat_to_costing_mat(
                blosum, max_score=int(np.max(blosum.values))
            )
            bcm = jnp.asarray(bcost.values)
            bgid = bcost.alphabet.gap_id
            A_b = int(bcost.values.shape[0])
            sb = fill_lanes.sub_bits_for(bcost.values)
            _state["general_sub_bits"] = sb
            gtok_a = np.zeros((args.m + 1,), np.int32)
            gtok_b = np.zeros((args.n + 1,), np.int32)
            gids = np.array(
                [t for t in range(A_b) if t != bgid], np.int32
            )
            gtok_a[1:] = gids[brng.integers(0, len(gids), args.m)]
            gtok_b[1:] = gids[brng.integers(0, len(gids), args.n)]
            gtb = jnp.asarray(gtok_b)
            gsp = fill_lanes.lanes_split_plan(args.m, args.n, asel=A_b)

            def gen_one(ta):
                if gsp is not None:
                    return fill_lanes.lanes_split_fill_cost(
                        ta, gtb, 0, 0, 0, 0, 4, args.m, args.n,
                        cost_mat=bcm, gap_id=bgid, w=gsp[0], sub_bits=sb,
                    )
                f3 = fill_lanes.lanes_general_final3(
                    ta[None], gtb[None], bcm, bgid, 4,
                    jnp.full((1,), args.m, jnp.int32),
                    jnp.full((1,), args.n, jnp.int32), sub_bits=sb,
                )
                return jnp.min(f3[0])

            def gen_tas(k):
                return jnp.asarray(
                    np.stack([np.roll(gtok_a, i) for i in range(k)])
                )

            # Short chain: compile time scales with chain length and
            # this arm's kernels are the youngest in the persistent
            # cache — a cold 12-chain compile blew the 1200 s deadline.
            contenders["general"] = (
                make_runk(gen_one), gen_tas,
                (args.chain_lo, min(8, args.chain)), args.m * args.n,
            )
            if gsp is not None:
                model_ops["general"] = fill_lanes.issue_model_ops(
                    2, gsp[1], args.n, gsp[0], asel=A_b, sub_bits=sb
                )
            else:
                model_ops["general"] = fill_lanes.issue_model_ops(
                    1, args.m, args.n,
                    fill_lanes.pick_w(1, args.m, args.n, asel=A_b),
                    asel=A_b, sub_bits=sb,
                )

    # Compile + sanity phase.  Batch/calib arms are best-effort: their
    # failure or a tight deadline never loses the headline value.
    ready = {}
    for name, (run_k, tas_of, (lo, hi), cells) in contenders.items():
        if name != "single" and (
            time.monotonic() - t_start > args.deadline * 0.6
        ):
            _state[f"{name}_error"] = "skipped_near_deadline"
            continue
        try:
            tas = {k: tas_of(k) for k in (lo, hi)}
            val = np.asarray(run_k(tas[lo], lo))
            if name != "calib":
                assert 0 <= float(val) < (1 << 31), \
                    f"implausible total {val}"
            np.asarray(run_k(tas[hi], hi))
            ready[name] = (run_k, tas, lo, hi, cells)
        except Exception as e:  # noqa: BLE001 - secondary arms
            if name == "single":
                raise
            _state[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]

    # Interleaved measurement rounds: every arm sees the same drift.
    samples: dict = {
        name: {str(k): [] for k in (lo, hi)}
        for name, (_, _, lo, hi, _) in ready.items()
    }
    for _ in range(max(4, args.repeats)):
        for name, (run_k, tas, lo, hi, _) in ready.items():
            for k in (lo, hi):
                t0 = time.perf_counter()
                np.asarray(run_k(tas[k], k))
                samples[name][str(k)].append(
                    round(time.perf_counter() - t0, 5)
                )

    def slope(name):
        _, _, lo, hi, cells = ready[name]
        t_lo = min(samples[name][str(lo)])
        t_hi = min(samples[name][str(hi)])
        return max((t_hi - t_lo) / (hi - lo), 1e-9), cells

    calib_ops_s = None
    if "calib" in ready:
        cper, ccells = slope("calib")
        calib_ops_s = ccells / cper
        _state["calib_gops"] = round(calib_ops_s / 1e9, 1)

    # Issue-efficiency normalization: the model counts (8, 128) VECTOR
    # instructions (x1024 element-ops each); the bound is the v5e VPU's
    # nominal ~3.9e12 int32 element-ops/s (docs/PERF.md roofline),
    # scaled by this session's calibration rate relative to its nominal
    # (~772 Gops/s, the repeatedly-measured near-nominal value) so a
    # slow chip/tunnel session lowers the bound rather than the score.
    VPU_NOMINAL_OPS = 3.9e12
    CALIB_NOMINAL_GOPS = 772.0

    def arm_eff(name, per_s):
        """Fraction of the session-adjusted VPU issue bound sustained:
        modeled element-ops/s over nominal x (calib / calib-nominal)."""
        if calib_ops_s is None or name not in model_ops:
            return None
        bound = VPU_NOMINAL_OPS * (
            calib_ops_s / (CALIB_NOMINAL_GOPS * 1e9)
        )
        return round(model_ops[name] * 1024.0 / per_s / bound, 3)

    per, cells = slope("single")
    gcups = cells / per / 1e9
    _state.update(
        metric=f"GCUPS_{args.m//1000}kb_affine_fill_{platform}_{backend}",
        value=round(gcups, 4),
        vs_baseline=round(gcups / REFERENCE_GCUPS, 1),
    )
    eff = arm_eff("single", per)
    if eff is not None:
        _state["single_issue_efficiency"] = eff
    # Self-diagnosis: the tunnel sometimes enters a state where wall
    # times are pure latency noise and slopes carry no signal (sampled
    # 2026-08-20: calib read 2.2x nominal and a batch chain's t24 MIN
    # undercut its t2).  Flag rather than filter — the artifact stays
    # honest and the reader knows to weigh the raw samples.
    suspect = []
    if calib_ops_s is not None and not (
        0.6 * CALIB_NOMINAL_GOPS
        <= calib_ops_s / 1e9
        <= 1.4 * CALIB_NOMINAL_GOPS
    ):
        suspect.append("calib_off_nominal")
    if gcups > 400.0:  # past any credible v5e roofline for this fill
        suspect.append("single_slope_implausible")
    for name, (_rk, _t, lo, hi, _c) in ready.items():
        if min(samples[name][str(hi)]) <= min(samples[name][str(lo)]):
            suspect.append(f"{name}_nonpositive_slope")
    if suspect:
        _state["timing_suspect"] = suspect
    if "batch" in ready:
        per, cells = slope("batch")
        _state["batch_gcups"] = round(cells / per / 1e9, 4)
        _state["batch_metric"] = (
            f"GCUPS_batch{args.batch_pairs}x{args.batch_len}"
            f"_lanes_w{_state.get('batch_w')}_{platform}"
        )
        eff = arm_eff("batch", per)
        if eff is not None:
            _state["batch_issue_efficiency"] = eff
    if "batch_w32" in ready:
        per, cells = slope("batch_w32")
        _state["batch_w32_gcups"] = round(cells / per / 1e9, 4)
    if "batch4k" in ready:
        per, cells = slope("batch4k")
        _state["batch4k_gcups"] = round(cells / per / 1e9, 4)
        _state["batch4k_metric"] = (
            f"GCUPS_batch64x4096_tiled32_lanes_w{_state.get('batch4k_w')}"
            f"_{platform}"
        )
        eff = arm_eff("batch4k", per)
        if eff is not None:
            _state["batch4k_issue_efficiency"] = eff
        # Co-headline (VERDICT r4 item 8): `value` stays the 10 kb
        # single-pair fill for round-over-round continuity, but the
        # engine's design thesis is the batch axis — surface the 64x4kb
        # number as a first-class record alongside it.
        _state["headline_batch"] = _state["batch4k_gcups"]
        _state["headline_batch_metric"] = _state["batch4k_metric"]
    if "general" in ready:
        per, cells = slope("general")
        _state["general_gcups"] = round(cells / per / 1e9, 4)
        _state["general_metric"] = (
            f"GCUPS_{args.m//1000}kb_BLOSUM62_lanes_bitmask_{platform}"
        )
        eff = arm_eff("general", per)
        if eff is not None:
            _state["general_issue_efficiency"] = eff
    _state["samples"] = samples
    _emit()


if __name__ == "__main__":
    sys.exit(main())
