"""Batched pair engine: bucketing, padding, per-pair extraction."""

import pytest

from globalign_tpu import align_pairs, find_global_alignment
from globalign_tpu.batch import bucket_length
from globalign_tpu.ops.traceback import alignment_cost
from globalign_tpu.utils.matrices import SubstitutionMatrix

PAIRS = [
    ("ACGT", "AGT"),
    ("TT", "TA"),
    ("TAAAGCTAA", "TAGCTC"),
    ("GGAGGACGTT", "GAG"),
    ("TGGATGAGGCTCCACGCACTAA", "GATTGGTGAGGCTCAGCAT"),
    ("A", "TTTTTTTT"),
    ("ACGTACGTACGTACGTACGTACGTACGTACGTACGT", "ACGT"),  # crosses a bucket edge
]


def test_bucket_length():
    assert bucket_length(1, 32) == 32
    assert bucket_length(32, 32) == 32
    assert bucket_length(33, 32) == 64
    assert bucket_length(150, 32) == 160


def test_align_pairs_matches_single_pair_api():
    batched = align_pairs(PAIRS)
    for (s1, s2), got in zip(PAIRS, batched):
        single = find_global_alignment(seq_1=s1, seq_2=s2)
        assert got.cost == single.cost
        assert got.score == single.score
        # Deterministic engine: batched and single tracebacks are identical.
        assert got.seq_1_aligned == single.seq_1_aligned
        assert got.seq_2_aligned == single.seq_2_aligned
        assert got.middle_part == single.middle_part


def test_align_pairs_cost_only():
    costs = align_pairs(PAIRS, with_traceback=False)
    full = align_pairs(PAIRS, with_traceback=True)
    for c, f in zip(costs, full):
        assert c.cost == f.cost
        assert c.score == f.score
        assert c.seq_1_aligned is None


def test_align_pairs_custom_scheme():
    batched = align_pairs(
        [("TT", "TA"), ("GGAGGACGTT", "GAG")],
        match_score=3,
        mismatch_score=-4,
        gap_open_score=-5,
        gap_extension_score=-2,
    )
    assert (batched[0].score, batched[0].cost) == (-1, 7)


def test_align_pairs_blosum():
    pairs = [("MKV", "MKV"), ("HEAGAWGHEE", "PAWHEAE")]
    out = align_pairs(pairs, scoring_mat_name="BLOSUM62")
    for (s1, s2), r in zip(pairs, out):
        single = find_global_alignment(
            seq_1=s1, seq_2=s2, scoring_mat_name="BLOSUM62"
        )
        assert (r.cost, r.score) == (single.cost, single.score)
        costing = SubstitutionMatrix.from_nested_dict(single.costing_mat)
        assert (
            alignment_cost(
                r.seq_1_aligned, r.seq_2_aligned, costing, single.gap_open_cost
            )
            == r.cost
        )


def test_align_pairs_validation():
    with pytest.raises(RuntimeError):
        align_pairs([("", "ACGT")])
    with pytest.raises(RuntimeError):
        align_pairs([("AC-T", "ACGT")])
    assert align_pairs([]) == []


def test_batch_traceback_moves_budget_fallback(monkeypatch):
    """Buckets whose move matrices exceed the budget go through the
    blocked per-pair traceback and still produce identical alignments."""
    import numpy as np

    import globalign_tpu.batch as batch_mod
    from globalign_tpu.batch import align_pairs

    rng = np.random.default_rng(3)
    pairs = [
        (
            "".join(rng.choice(list("ACGT"), 80)),
            "".join(rng.choice(list("ACGT"), 70)),
        )
        for _ in range(3)
    ]
    want = align_pairs(pairs, with_traceback=True)
    monkeypatch.setattr(batch_mod, "DEFAULT_BATCH_MOVES_BUDGET", 64)
    got = align_pairs(pairs, with_traceback=True)
    assert want == got


def test_batch_traceback_subbatch_split(monkeypatch):
    """A bucket slightly over the moves budget is split into sub-batches
    (keeping the batched path), not degraded to per-pair replay."""
    import numpy as np

    import globalign_tpu.batch as batch_mod
    from globalign_tpu.batch import align_pairs

    rng = np.random.default_rng(7)
    pairs = [
        (
            "".join(rng.choice(list("ACGT"), 30)),
            "".join(rng.choice(list("ACGT"), 30)),
        )
        for _ in range(5)
    ]
    want = align_pairs(pairs, with_traceback=True)
    # Budget fits ~1 pair per sub-batch: (31)*(128 padded cols) ~ 4k
    monkeypatch.setattr(batch_mod, "DEFAULT_BATCH_MOVES_BUDGET", 5000)
    got = align_pairs(pairs, with_traceback=True)
    assert want == got


def test_walked_traceback_flush_accounting(monkeypatch):
    """The chunk-wide mega-walk path — fills accumulating across
    buckets with DIFFERING shapes, ONE lanes_mega_walk executable,
    padded-row flush accounting, native forward-order rendering — runs
    REAL on CPU: the lane moves kernels in interpret mode (w clamped
    to 4, CLAUDE.md LLVM-JIT note), the walk and flush are pure XLA."""
    import functools

    import globalign_tpu.batch as batch_mod
    from globalign_tpu.ops import fill_lanes

    # Three buckets with distinct (M, N) — so distinct tile geometries —
    # interleaved in input order to stress the sel/meta accounting.
    pairs = PAIRS + [
        ("ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTA" * 2,
         "ACGTTACGATCGATCGTACGATCGATCGACGTACGTACGTG" * 2),
        ("TTTTGGGGCCCCAAAA", "TTGGCCAA"),
    ]
    want = batch_mod.align_pairs(pairs, with_traceback=True)

    real_plan = fill_lanes.lanes_plan

    def small_w_plan(*a, **k):
        plan = real_plan(*a, **k)
        return None if plan is None else (min(plan[0], 4), plan[1])

    monkeypatch.setattr(fill_lanes, "lanes_plan", small_w_plan)
    monkeypatch.setattr(
        fill_lanes, "lanes_batch_moves",
        functools.partial(fill_lanes.lanes_batch_moves, interpret=True),
    )
    monkeypatch.setattr(batch_mod, "_use_pallas", lambda: True)
    monkeypatch.setattr(
        batch_mod, "_drain_tb_fused",
        functools.partial(batch_mod._drain_tb_fused, interpret=True),
    )
    # FUSED path (TB_CHUNK_JIT opt-in): every bucket's fills + the walk
    # in one executable.
    monkeypatch.setattr(batch_mod, "TB_CHUNK_JIT", True)
    got = batch_mod.align_pairs(pairs, with_traceback=True)
    assert want == got

    # Eager path (_lanes_walk_fills + _mega_walk_flush, the default):
    # per-bucket fills, chunk-wide mega walk.
    monkeypatch.setattr(batch_mod, "TB_CHUNK_JIT", False)
    got_eager = batch_mod.align_pairs(pairs, with_traceback=True)
    assert want == got_eager

    # Segment split: a tiny WALK_GROUP_BYTES forces one segment per
    # bucket — multi-segment row/off bookkeeping, both paths.
    monkeypatch.setattr(batch_mod, "WALK_GROUP_BYTES", 1)
    got2 = batch_mod.align_pairs(pairs, with_traceback=True)
    assert want == got2
    monkeypatch.setattr(batch_mod, "TB_CHUNK_JIT", True)
    got3 = batch_mod.align_pairs(pairs, with_traceback=True)
    assert want == got3


def test_cost_chunk_jit_matches_eager(monkeypatch):
    """The per-chunk fused cost executable (_chunk_costs_jit: every
    bucket's fill in ONE jit, static meta signature) must reproduce the
    eager path — uniform scheme over several distinct buckets, REAL
    kernels in interpret mode on CPU."""
    import functools

    import globalign_tpu.batch as batch_mod

    pairs = PAIRS + [("TTTTGGGGCCCCAAAA", "TTGGCCAA")]
    want = batch_mod.align_pairs(pairs, with_traceback=False)
    monkeypatch.setattr(batch_mod, "_use_pallas", lambda: True)
    monkeypatch.setattr(batch_mod, "COST_CHUNK_JIT", True)
    monkeypatch.setattr(
        batch_mod, "_chunk_costs_jit",
        functools.partial(batch_mod._chunk_costs_jit, interpret=True),
    )
    got = batch_mod.align_pairs(pairs, with_traceback=False)
    assert want == got


def test_cost_chunk_jit_general_bitmask(monkeypatch):
    """General matrices join the fused chunk executable once their
    shape class is probed (host-resolved static plan + bitmask
    sub_bits, mesh.py's pattern): REAL lanes_general_final3 kernels in
    interpret mode under ONE jit, pinned against the CPU path."""
    import functools

    import numpy as np

    import globalign_tpu.batch as batch_mod
    from globalign_tpu.ops import fill_lanes

    rng = np.random.default_rng(3)
    prot = list("ARNDCQEGHILKMFPSTWYV")
    pairs = [
        (
            "".join(rng.choice(prot, int(rng.integers(5, 40)))),
            "".join(rng.choice(prot, int(rng.integers(5, 40)))),
        )
        for _ in range(8)
    ]
    want = batch_mod.align_pairs(
        pairs, scoring_mat_name="BLOSUM62", with_traceback=False
    )

    real_plan = fill_lanes.lanes_plan

    def small_w_plan(*a, **k):
        plan = real_plan(*a, **k)
        return None if plan is None else (min(plan[0], 4), plan[1])

    monkeypatch.setattr(fill_lanes, "lanes_plan", small_w_plan)
    monkeypatch.setattr(batch_mod, "_use_pallas", lambda: True)
    monkeypatch.setattr(batch_mod, "COST_CHUNK_JIT", True)
    monkeypatch.setattr(
        batch_mod, "_chunk_costs_jit",
        functools.partial(batch_mod._chunk_costs_jit, interpret=True),
    )
    # Treat every shape class as probed: the probe's purpose (latching
    # backend rejections on FIRST eager use) is covered elsewhere; here
    # the fused path itself is under test.
    monkeypatch.setattr(
        fill_lanes, "general_probe_needed", lambda k: False
    )
    got = batch_mod.align_pairs(
        pairs, scoring_mat_name="BLOSUM62", with_traceback=False
    )
    assert [(r.cost, r.score) for r in want] == [
        (r.cost, r.score) for r in got
    ]


def test_deferred_cost_flush_accounting(monkeypatch):
    """Cost-only mode's coalesced finals flush across 2+ buckets, driven
    on CPU by forcing the accelerator branch with a stubbed batch_final3
    (ADVICE r3)."""
    import jax.numpy as jnp

    import globalign_tpu.batch as batch_mod
    from globalign_tpu.ops import fill_pallas, fill_rows

    def fake_batch_final3(tok_a, tok_b, cost_mat, gap_id, gap_open,
                          m_true, n_true, **kw):
        res = fill_rows.row_fill_batch(
            tok_a, tok_b, cost_mat, gap_id, gap_open, m_true, n_true,
            want_moves=False,
        )
        return jnp.asarray(res.final3)

    want = batch_mod.align_pairs(PAIRS, with_traceback=False)
    monkeypatch.setattr(batch_mod, "_use_pallas", lambda: True)
    monkeypatch.setattr(fill_pallas, "batch_final3", fake_batch_final3)
    got = batch_mod.align_pairs(PAIRS, with_traceback=False)
    assert want == got
