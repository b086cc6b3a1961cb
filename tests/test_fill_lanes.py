"""Cell-per-lane strip kernel (ops/fill_lanes) correctness, interpret mode.

Pins ``lanes_batch_final3`` / ``lanes_fill_cost`` bit-for-bit to the
scheme-generic stacked kernel (itself pinned to the ``fill_scan`` oracle)
on uniform costing schemes, including asymmetric gap-extension costs,
traced true lengths below the padded caps, and the zero-length boundary
rows the kernel special-cases on the host side.

Replaces the reference's interpreted fill (globaligner.py:366-392) on the
uniform-scheme cost path; the semantics pinned here are the reference's.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from globalign_tpu.ops import fill_lanes, fill_pallas
from globalign_tpu.ops.fill_scan import BIG


def _uniform_costing(A, cmatch, cmismatch, dcost, icost):
    """Costing matrix over 1-origin tokens 1..A with gap id A+1."""
    gid = A + 1
    cm = np.full((A + 2, A + 2), cmismatch, np.int32)
    np.fill_diagonal(cm, cmatch)
    cm[gid, :] = dcost
    cm[:, gid] = icost
    cm[gid, gid] = 0
    return cm, gid


def _expected_final3(ta, tb, cm, gid, go, mt, nt):
    """Generic-kernel final3 with host-handled zero-length boundaries."""
    B = ta.shape[0]
    mt2 = np.maximum(mt, 1)
    nt2 = np.maximum(nt, 1)
    want = np.array(
        fill_pallas.batch_final3(
            jnp.asarray(ta),
            jnp.asarray(tb),
            jnp.asarray(cm),
            jnp.int32(gid),
            jnp.int32(go),
            jnp.asarray(mt2),
            jnp.asarray(nt2),
            interpret=True,
        )
    )
    d = int(cm[gid, 0])
    ic = int(cm[0, gid])
    for b in range(B):
        if mt[b] == 0 and nt[b] == 0:
            want[b] = (0, 0, 0)
        elif nt[b] == 0:
            want[b] = (BIG, BIG, go + mt[b] * ic)
        elif mt[b] == 0:
            want[b] = (BIG, go + nt[b] * d, BIG)
    return want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lanes_batch_matches_generic_kernel(seed):
    # Geometry is randomized but w stays small: each distinct (w, R,
    # S_p) compiles a fresh interpret-mode kernel whose code size grows
    # with w (2x w unrolled phases), and the CPU suite's cumulative
    # LLVM-JIT load must stay bounded (a full-suite run with w<=16
    # kernels here segfaulted XLA's CPU compiler later in the process).
    rng = np.random.default_rng(seed)
    for _ in range(3):
        B = int(rng.integers(1, 7))
        m_pad = int(rng.integers(1, 70))
        n_pad = int(rng.integers(1, 70))
        w = int(rng.choice([4, 8]))
        A = int(rng.integers(2, 6))
        cmatch = int(rng.integers(0, 3))
        cmis = cmatch + int(rng.integers(1, 7))
        d = int(rng.integers(1, 6))
        ic = int(rng.integers(1, 6))
        go = int(rng.integers(0, 6))
        ta = rng.integers(1, A + 1, (B, m_pad + 1)).astype(np.int32)
        tb = rng.integers(1, A + 1, (B, n_pad + 1)).astype(np.int32)
        ta[:, 0] = 0
        tb[:, 0] = 0
        mt = rng.integers(0, m_pad + 1, B).astype(np.int32)
        nt = rng.integers(0, n_pad + 1, B).astype(np.int32)
        cm, gid = _uniform_costing(A, cmatch, cmis, d, ic)
        got = np.asarray(
            fill_lanes.lanes_batch_final3(
                jnp.asarray(ta),
                jnp.asarray(tb),
                cmatch,
                cmis,
                d,
                ic,
                go,
                jnp.asarray(mt),
                jnp.asarray(nt),
                w=w,
                interpret=True,
            )
        )
        want = _expected_final3(ta, tb, cm, gid, go, mt, nt)
        assert (got == want).all(), (B, m_pad, n_pad, w, go, d, ic, got, want)


def test_lanes_multi_chunk_geometry():
    """R >= 2 lane-chunks: the cross-chunk edge-shift carry, the
    (G_rows, R, 128) inject-table layout for Rw > 1, and the B == 1
    broadcast staging with R > 1 (the production 10 kb shape) are only
    reachable past 128 strips — pin both flavors at w=4 (small unrolled
    code, see the LLVM-JIT note above)."""
    rng = np.random.default_rng(9)
    cm, gid = _uniform_costing(4, 1, 6, 2, 3)
    for B, m_pad, n_pad in [(6, 25, 96), (1, 40, 600)]:
        # B*ceil(n_pad/4) strips = 144 / 150 -> R = 2.
        ta = rng.integers(1, 5, (B, m_pad + 1)).astype(np.int32)
        tb = rng.integers(1, 5, (B, n_pad + 1)).astype(np.int32)
        ta[:, 0] = 0
        tb[:, 0] = 0
        mt = rng.integers(1, m_pad + 1, B).astype(np.int32)
        nt = rng.integers(1, n_pad + 1, B).astype(np.int32)
        got = np.asarray(
            fill_lanes.lanes_batch_final3(
                jnp.asarray(ta), jnp.asarray(tb), 1, 6, 2, 3, 5,
                jnp.asarray(mt), jnp.asarray(nt), w=4, interpret=True,
            )
        )
        want = _expected_final3(ta, tb, cm, gid, 5, mt, nt)
        assert (got == want).all(), (B, m_pad, n_pad, got, want)


def test_lanes_multi_stage_blocks():
    """m large enough that the seq_1 inject pipeline spans several DMA
    blocks (_STAGE = 64 waves per block)."""
    rng = np.random.default_rng(7)
    m, n = 200, 150
    ta = rng.integers(1, 5, (1, m + 1)).astype(np.int32)
    tb = rng.integers(1, 5, (1, n + 1)).astype(np.int32)
    ta[:, 0] = 0
    tb[:, 0] = 0
    cm, gid = _uniform_costing(4, 0, 5, 3, 2)
    got = np.asarray(
        fill_lanes.lanes_batch_final3(
            jnp.asarray(ta),
            jnp.asarray(tb),
            0,
            5,
            3,
            2,
            4,
            jnp.asarray([m], np.int32),
            jnp.asarray([n], np.int32),
            w=8,
            interpret=True,
        )
    )
    want = _expected_final3(
        ta, tb, cm, gid, 4, np.array([m]), np.array([n])
    )
    assert (got == want).all()


def test_lanes_clamped_variant_matches():
    """The BIG-clamping kernel variant (kept for schemes whose costs are
    too large to prove int32 headroom) stays bit-identical to the
    unclamped fast path on reachable cells."""
    rng = np.random.default_rng(5)
    B, m_pad, n_pad = 3, 40, 50
    ta = rng.integers(1, 5, (B, m_pad + 1)).astype(np.int32)
    tb = rng.integers(1, 5, (B, n_pad + 1)).astype(np.int32)
    ta[:, 0] = 0
    tb[:, 0] = 0
    mt = np.array([40, 17, 1], np.int32)
    nt = np.array([50, 1, 33], np.int32)
    kw = dict(w=8, interpret=True)
    args = (jnp.asarray(ta), jnp.asarray(tb), 0, 5, 3, 2, 4,
            jnp.asarray(mt), jnp.asarray(nt))
    fast = np.asarray(fill_lanes.lanes_batch_final3(*args, **kw))
    slow = np.asarray(
        fill_lanes.lanes_batch_final3(*args, force_clamp=True, **kw)
    )
    assert (fast == slow).all()
    cm, gid = _uniform_costing(4, 0, 5, 3, 2)
    assert (fast == _expected_final3(ta, tb, cm, gid, 4, mt, nt)).all()


def test_dispatchers_route_uniform_schemes_to_lanes(monkeypatch):
    """batch_final3 / wavefront_fill_cost must select the lane kernel for
    uniform schemes with concrete gap_open outside interpret mode (the
    real-accelerator path), and must NOT when the scheme is non-uniform
    or interpret=True (CPU test path).  Selection only — the stub avoids
    compiling the kernel on CPU."""
    calls = []

    def stub(ta, tb, *a, **k):
        calls.append(ta.shape)
        return jnp.zeros((ta.shape[0], 3), jnp.int32)

    monkeypatch.setattr(fill_lanes, "lanes_batch_final3", stub)

    B, m_pad, n_pad = 2, 12, 16
    ta = np.ones((B, m_pad + 1), np.int32)
    tb = np.ones((B, n_pad + 1), np.int32)
    mt = np.full(B, m_pad, np.int32)
    nt = np.full(B, n_pad, np.int32)
    cm, gid = _uniform_costing(4, 0, 5, 3, 2)

    out = fill_pallas.batch_final3(
        jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(cm), gid, 4,
        jnp.asarray(mt), jnp.asarray(nt),
    )
    assert len(calls) == 1 and out.shape == (B, 3)

    out1 = fill_pallas.wavefront_fill_cost(
        jnp.asarray(ta[0]), jnp.asarray(tb[0]), jnp.asarray(cm), gid, 4,
        m_pad, n_pad,
    )
    assert len(calls) == 2 and out1.shape == (3,)

    # batch_moves routes uniform schemes to the moves-emitting lane
    # kernel (stub the kernel + unskew; selection only).
    mv_calls = []

    def stub_moves(ta, tb, *a, **k):
        mv_calls.append(ta.shape)
        return jnp.zeros((ta.shape[0], 3), jnp.int32), jnp.zeros(
            (8, 1, 128), jnp.uint8
        )

    monkeypatch.setattr(fill_lanes, "lanes_batch_moves", stub_moves)
    monkeypatch.setattr(
        fill_lanes,
        "lanes_moves_to_row",
        lambda mv, Bq, npad, wq, mpad: np.zeros(
            (Bq, mpad + 1, npad + 1), np.uint8
        ),
    )
    resm = fill_pallas.batch_moves(
        jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(cm), gid, 4,
        jnp.asarray(mt), jnp.asarray(nt),
    )
    assert len(mv_calls) == 1 and resm is not None
    assert resm[1].shape == (B, m_pad + 1, n_pad + 1)

    # Non-uniform scheme: lanes must decline (would hit the stub).
    cm_nu = cm.copy()
    cm_nu[1, 2] = 99
    cm_nu[2, 1] = 99
    fill_pallas.batch_final3(
        jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(cm_nu), gid, 4,
        jnp.asarray(mt), jnp.asarray(nt), interpret=True,
    )
    # Interpret mode: lanes must decline even for uniform schemes.
    fill_pallas.batch_final3(
        jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(cm), gid, 4,
        jnp.asarray(mt), jnp.asarray(nt), interpret=True,
    )
    assert len(calls) == 2


def test_lanes_moves_match_row_kernel_and_walk():
    """The moves-emitting lane kernel: codes at real cells bit-identical
    to the row scan's, and the full traceback walk (alignment strings +
    cost) identical — including a multi-chunk R=2 geometry and true
    lengths below the padded caps."""
    from globalign_tpu.ops import fill_rows
    from globalign_tpu.ops.traceback import traceback_moves

    rng = np.random.default_rng(13)
    letters = np.array(list("ACGT"))
    for B, m_pad, n_pad, w in [(3, 22, 30, 4), (1, 17, 80, 4), (2, 40, 33, 8)]:
        cm, gid = _uniform_costing(4, 0, 5, 3, 2)
        go = 4
        ta = rng.integers(1, 5, (B, m_pad + 1)).astype(np.int32)
        tb = rng.integers(1, 5, (B, n_pad + 1)).astype(np.int32)
        ta[:, 0] = 0
        tb[:, 0] = 0
        mt = rng.integers(1, m_pad + 1, B).astype(np.int32)
        nt = rng.integers(1, n_pad + 1, B).astype(np.int32)
        final3, mv = fill_lanes.lanes_batch_moves(
            jnp.asarray(ta), jnp.asarray(tb), 0, 5, 3, 2, go,
            jnp.asarray(mt), jnp.asarray(nt), w=w, interpret=True,
        )
        final3 = np.asarray(final3)
        moves = fill_lanes.lanes_moves_to_row(
            np.asarray(mv), B, n_pad, w, m_pad
        )
        want = _expected_final3(ta, tb, cm, gid, go, mt, nt)
        assert (final3 == want).all()
        for b in range(B):
            m, n = int(mt[b]), int(nt[b])
            res = fill_rows.row_fill(
                jnp.asarray(ta[b, : m + 1]), jnp.asarray(tb[b, : n + 1]),
                jnp.asarray(cm), jnp.int32(gid), jnp.int32(go),
                want_moves=True,
            )
            ref_moves = np.asarray(res.moves)[: m + 1, : n + 1]
            got_moves = moves[b, : m + 1, : n + 1]
            # Codes at real cells (i, j >= 1) are bit-identical.
            assert (got_moves[1:, 1:] == ref_moves[1:, 1:]).all(), (
                B, m_pad, n_pad, w, b,
            )
            s1 = "".join(letters[ta[b, 1 : m + 1] - 1])
            s2 = "".join(letters[tb[b, 1 : n + 1] - 1])
            tb_got = traceback_moves(
                moves[b], s1, s2, final3[b], layout="row"
            )
            tb_want = traceback_moves(
                np.asarray(res.moves), s1, s2, np.asarray(res.final3),
                layout="row",
            )
            assert tb_got == tb_want


def test_lanes_boundary_injection_matches_row_fill():
    """Block fills with an injected checkpoint row + column-0 Iy seed
    (the linear_tb primitives): last rows, final3, move codes and the
    block walk all match the row scan seeded with the same boundary."""
    from globalign_tpu.ops import fill_rows
    from globalign_tpu.ops.fill_scan import default_boundary

    rng = np.random.default_rng(17)
    m, n, go = 30, 25, 4
    cm, gid = _uniform_costing(4, 0, 5, 3, 2)
    cmj = jnp.asarray(cm)
    ta = np.zeros(m + 1, np.int32)
    ta[1:] = rng.integers(1, 5, m)
    tb = np.zeros(n + 1, np.int32)
    tb[1:] = rng.integers(1, 5, n)

    planes = np.asarray(
        fill_rows.row_fill(
            jnp.asarray(ta), jnp.asarray(tb), cmj, jnp.int32(gid),
            jnp.int32(go), want_moves=False, want_planes=True,
        ).planes
    )
    _, col0_g = default_boundary(
        jnp.asarray(ta), jnp.asarray(tb), cmj, jnp.int32(gid), jnp.int32(go)
    )
    col0_g = np.asarray(col0_g)

    for i0, i1, w in [(0, 13, 4), (11, 30, 4), (17, 24, 8)]:
        blk_m = i1 - i0
        ta_blk = np.zeros(blk_m + 1, np.int32)
        ta_blk[1:] = ta[i0 + 1 : i1 + 1]
        row0 = planes[:, i0, :]  # (3, n+1) checkpoint row
        c0_top = int(go if i0 == 0 else col0_g[2, i0])

        last = np.asarray(
            fill_lanes.lanes_batch_last_rows(
                jnp.asarray(ta_blk)[None], jnp.asarray(tb)[None],
                0, 5, 3, 2, go,
                jnp.asarray([blk_m], np.int32),
                jnp.asarray([n], np.int32),
                jnp.asarray(row0)[None],
                jnp.asarray([c0_top], np.int32),
                w=w, interpret=True,
            )
        )
        assert (last[0][:, :n] == planes[:, i1, 1 : n + 1]).all(), (i0, i1)

        # Moves: pin against the row scan seeded with the same boundary.
        col0_blk = np.stack([col0_g[2, i0 : i1 + 1]] * 3)
        res = fill_rows.row_fill(
            jnp.asarray(ta_blk), jnp.asarray(tb), cmj, jnp.int32(gid),
            jnp.int32(go), row0=jnp.asarray(row0),
            col0=jnp.asarray(col0_blk), want_moves=True,
        )
        want_moves = np.asarray(res.moves)
        f3, mv = fill_lanes.lanes_batch_moves(
            jnp.asarray(ta_blk)[None], jnp.asarray(tb)[None],
            0, 5, 3, 2, go,
            jnp.asarray([blk_m], np.int32),
            jnp.asarray([n], np.int32),
            jnp.asarray(row0)[None],
            jnp.asarray([c0_top], np.int32),
            w=w, interpret=True,
        )
        got_moves = fill_lanes.lanes_moves_to_row(
            np.asarray(mv), 1, n, w, blk_m
        )[0]
        assert (
            got_moves[1 : blk_m + 1, 1 : n + 1]
            == want_moves[1 : blk_m + 1, 1 : n + 1]
        ).all(), (i0, i1, w)
        assert (np.asarray(f3)[0] == np.asarray(res.final3)).all()


def test_lanes_general_matrix_matches_row_scan():
    """GENERAL costing matrices on the lane kernel (select-chain
    substitution, per-row/column gap costs riding tables + inject
    planes): random asymmetric matrices, gap ids at any alphabet
    position, traced sub-cap lengths — values, moves and walks all
    match the row scan."""
    from globalign_tpu.ops import fill_rows
    from globalign_tpu.ops.traceback import traceback_moves

    rng = np.random.default_rng(23)
    letters = np.array(list("XABCDEFG"))
    for case in range(3):
        A = int(rng.integers(4, 8))
        gid = int(rng.integers(0, A))  # '-' can sort anywhere
        cm = rng.integers(0, 9, (A, A)).astype(np.int32)
        cm[gid, gid] = 0
        toks = [k for k in range(A) if k != gid]
        B = int(rng.integers(1, 4))
        m_pad = int(rng.integers(3, 40))
        n_pad = int(rng.integers(3, 40))
        go = int(rng.integers(0, 6))
        ta = rng.choice(toks, (B, m_pad + 1)).astype(np.int32)
        tb = rng.choice(toks, (B, n_pad + 1)).astype(np.int32)
        ta[:, 0] = 0
        tb[:, 0] = 0
        mt = rng.integers(1, m_pad + 1, B).astype(np.int32)
        nt = rng.integers(1, n_pad + 1, B).astype(np.int32)

        got = np.asarray(
            fill_lanes.lanes_general_final3(
                jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(cm), gid, go,
                jnp.asarray(mt), jnp.asarray(nt), w=4, interpret=True,
            )
        )
        want = np.asarray(
            fill_rows.row_fill_batch(
                jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(cm),
                jnp.int32(gid), jnp.int32(go),
                jnp.asarray(mt), jnp.asarray(nt),
            ).final3
        )
        assert (got == want).all(), (case, A, gid, got, want)

        f3, mv = fill_lanes.lanes_general_moves(
            jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(cm), gid, go,
            jnp.asarray(mt), jnp.asarray(nt), w=4, interpret=True,
        )
        moves = fill_lanes.lanes_moves_to_row(np.asarray(mv), B, n_pad, 4,
                                              m_pad)
        for b in range(B):
            m, n = int(mt[b]), int(nt[b])
            res = fill_rows.row_fill(
                jnp.asarray(ta[b, : m + 1]), jnp.asarray(tb[b, : n + 1]),
                jnp.asarray(cm), jnp.int32(gid), jnp.int32(go),
                want_moves=True,
            )
            assert (
                moves[b, 1 : m + 1, 1 : n + 1]
                == np.asarray(res.moves)[1 : m + 1, 1 : n + 1]
            ).all(), (case, b)
            s1 = "".join(letters[ta[b, 1 : m + 1]])
            s2 = "".join(letters[tb[b, 1 : n + 1]])
            t1 = traceback_moves(moves[b], s1, s2, np.asarray(f3)[b], "row")
            t2 = traceback_moves(
                np.asarray(res.moves), s1, s2, np.asarray(res.final3), "row"
            )
            assert t1 == t2, (case, b)


def test_lanes_fill_cost_single_pair():
    """Scalar entry point, true lengths below buffer capacity."""
    rng = np.random.default_rng(3)
    # Fixed buffer caps: every case shares one padded grid per group, so
    # the interpret-mode kernel compiles once per group, not per case.
    for m, n in [(1, 1), (40, 1), (1, 29), (9, 33), (41, 33)]:
        cap_m, cap_n = 41, 33
        ta = rng.integers(1, 5, (cap_m + 1,)).astype(np.int32)
        tb = rng.integers(1, 5, (cap_n + 1,)).astype(np.int32)
        ta[0] = 0
        tb[0] = 0
        got = int(
            fill_lanes.lanes_fill_cost(
                jnp.asarray(ta), jnp.asarray(tb), 0, 5, 3, 3, 4, m, n,
                interpret=True,
            )
        )
        cm, gid = _uniform_costing(4, 0, 5, 3, 3)
        want3 = _expected_final3(
            ta[None, : m + 1],
            tb[None, : n + 1],
            cm,
            gid,
            4,
            np.array([m]),
            np.array([n]),
        )
        assert got == int(want3[0].min())


def test_lanes_split_fill_cost_matches_oracle():
    """Meet-in-the-middle on the lane kernel (broadcast-inject 2-pair
    stack + Myers-Miller join, fill_lanes.lanes_split_fill_cost) pinned
    to the generic kernel's min over random uniform schemes, asymmetric
    d/i costs, and true lengths below the padded caps — including the
    zero-row-half corner cases mid == 0 and m - mid == 0."""
    rng = np.random.default_rng(11)
    cap_m, cap_n = 24, 20
    for trial in range(6):
        m = int(rng.integers(0, cap_m + 1))
        n = int(rng.integers(0, cap_n + 1))
        ta = rng.integers(1, 5, (cap_m + 1,)).astype(np.int32)
        tb = rng.integers(1, 5, (cap_n + 1,)).astype(np.int32)
        ta[0] = tb[0] = 0
        cmis = int(rng.integers(1, 9))
        d = int(rng.integers(1, 6))
        ic = int(rng.integers(1, 6))
        go = int(rng.integers(0, 6))
        got = int(
            fill_lanes.lanes_split_fill_cost(
                jnp.asarray(ta), jnp.asarray(tb), 0, cmis, d, ic, go,
                m, n, w=4, pad_quantum=8, interpret=True,
            )
        )
        cm, gid = _uniform_costing(4, 0, cmis, d, ic)
        want3 = _expected_final3(
            ta[None, : m + 1], tb[None, : n + 1], cm, gid, go,
            np.array([m]), np.array([n]),
        )
        assert got == int(want3[0].min()), (trial, m, n)


def test_lanes_split_fill_cost_zero_row_halves():
    """The split's half_big corner masks, exercised EXPLICITLY: m == 0
    (both halves empty), m == 1 (mid == 0, the whole problem in the
    reversed half) and m == 2 — the fictitious corner levels of an empty
    half must not leak a spurious -gap_open through the join."""
    rng = np.random.default_rng(3)
    for m in (0, 1, 2):
        for n in (0, 1, 5):
            ta = rng.integers(1, 5, (9,)).astype(np.int32)
            tb = rng.integers(1, 5, (9,)).astype(np.int32)
            ta[0] = tb[0] = 0
            got = int(
                fill_lanes.lanes_split_fill_cost(
                    jnp.asarray(ta), jnp.asarray(tb), 0, 3, 2, 2, 4,
                    m, n, w=4, pad_quantum=8, interpret=True,
                )
            )
            cm, gid = _uniform_costing(4, 0, 3, 2, 2)
            want3 = _expected_final3(
                ta[None, : m + 1], tb[None, : n + 1], cm, gid, 4,
                np.array([m]), np.array([n]),
            )
            assert got == int(want3[0].min()), (m, n)


def test_lanes_split_fill_cost_general_matches_row_scan():
    """The GENERAL-matrix branch of the split (cost_mat/gap_id: select-
    chain halves, per-character iy0 prefix join) pinned to the row scan
    (itself oracle-pinned) over random asymmetric matrices — the branch
    wavefront_fill_cost dispatches for BLOSUM/custom single pairs.
    Includes the m <= 1 zero-row-half corners."""
    from globalign_tpu.ops import fill_rows

    rng = np.random.default_rng(29)
    for case in range(4):
        A = int(rng.integers(4, 8))
        gid = int(rng.integers(0, A))
        cm = rng.integers(0, 9, (A, A)).astype(np.int32)
        cm[gid, gid] = 0
        toks = [k for k in range(A) if k != gid]
        cap_m, cap_n = 18, 14
        m = (0, 1, int(rng.integers(2, cap_m + 1)), cap_m)[case]
        n = int(rng.integers(1, cap_n + 1))
        go = int(rng.integers(0, 6))
        ta = rng.choice(toks, (cap_m + 1,)).astype(np.int32)
        tb = rng.choice(toks, (cap_n + 1,)).astype(np.int32)
        ta[0] = tb[0] = 0
        got = int(
            fill_lanes.lanes_split_fill_cost(
                jnp.asarray(ta), jnp.asarray(tb), 0, 0, 0, 0, go,
                m, n, cost_mat=jnp.asarray(cm), gap_id=gid,
                w=4, pad_quantum=8, interpret=True,
            )
        )
        want3 = np.asarray(
            fill_rows.row_fill_impl(
                jnp.asarray(ta[: m + 1]), jnp.asarray(tb[: n + 1]),
                jnp.asarray(cm), jnp.int32(gid), jnp.int32(go),
                want_moves=False,
            ).final3
        )
        assert got == int(want3.min()), (case, m, n, gid, go)


def test_lanes_split_plan_scales():
    """The split dispatches only where the halved wave count wins: big
    near-square pairs yes, tiny pairs no; the chosen width must keep the
    doubled strips within the VMEM budget."""
    assert fill_lanes.lanes_split_plan(10_000, 10_000) is not None
    assert fill_lanes.lanes_split_plan(64, 64) is None
    plan = fill_lanes.lanes_split_plan(10_000, 10_000)
    w, mh = plan
    assert mh >= 5_000
    assert (
        fill_lanes.lanes_vmem_bytes(2, 10_000, w)
        <= fill_lanes.LANES_VMEM_BUDGET
    )


def test_dispatch_self_reports_perturbed_model(monkeypatch, caplog):
    """The perf-model constants are module-level and perturbable: a
    different chip's economics must visibly change the dispatch
    (VERDICT r3: no silent mis-picks on uncalibrated hardware)."""
    import logging

    from globalign_tpu.ops import fill_lanes as fl

    base_w = fl.pick_w(1, 1024, 1024)
    # Make the per-wave overhead dominate: fewest waves (widest strips)
    # must now win.
    monkeypatch.setattr(fl, "ISSUE_WAVE_OPS", 10_000_000)
    wide_w = fl.pick_w(1, 1024, 1024)
    assert wide_w == max(fl._w_candidates(1, 1024))
    assert wide_w != base_w

    monkeypatch.setenv("GLOBALIGN_DEBUG_DISPATCH", "1")
    # B=2 stays on the model-ranked path (B >= 4 uniform batches use
    # the measured occupancy rule, which the constants don't steer).
    with caplog.at_level(logging.INFO, logger="globalign_tpu.ops.fill_lanes"):
        plan = fl.lanes_plan(2, 512, 512)
    assert plan is not None and plan[0] == wide_w
    assert any("lanes_plan" in r.message for r in caplog.records)


def test_model_rank_selfcheck(caplog):
    """model_rank_selfcheck compares model vs measured width rankings
    and warns on disagreement (the runtime guard for uncalibrated
    chips)."""
    import logging

    from globalign_tpu.ops import fill_lanes as fl

    # A timer that follows the model exactly: agreement, no warning.
    ok = fl.model_rank_selfcheck(
        1, 1024, 1024,
        lambda w: fl._issue_cost(1, 1024, 1024, w, False) * 1e-9,
    )
    assert ok["agree"] and ok["model_best_w"] == ok["measured_best_w"]

    # A timer that inverts the ranking: disagreement + WARNING.
    with caplog.at_level(
        logging.WARNING, logger="globalign_tpu.ops.fill_lanes"
    ):
        bad = fl.model_rank_selfcheck(
            1, 1024, 1024,
            lambda w: 1.0 / fl._issue_cost(1, 1024, 1024, w, False),
        )
    assert not bad["agree"]
    assert any("mis-ranks" in r.message for r in caplog.records)


@pytest.mark.parametrize("mycarry", [True, False])
@pytest.mark.parametrize("active_split", [True, False])
def test_lanes_round4_toggles_bit_identical(monkeypatch, mycarry,
                                            active_split):
    """The round-4 kernel toggles — the min(M, Iy)-carry recurrence
    (_MYCARRY: z = min(my, x), v = min(z + go, y), one fused edge ring)
    and the all-strips-active wave-loop split (_ACTIVE_SPLIT) — are pure
    reformulations: every (flag, flag) combination returns identical
    final3 values AND identical move-code streams.  Calls go through
    _lanes_run directly (unjitted) so the module flags take effect
    per-case; w stays small (LLVM-JIT note at the top of this file).
    The batch includes an m_true == 0 pair: the unmasked capture body
    must still never overwrite its row-0 output seeds."""
    from globalign_tpu.ops import fill_lanes as fl

    monkeypatch.setattr(fl, "_MYCARRY", mycarry)
    monkeypatch.setattr(fl, "_ACTIVE_SPLIT", active_split)

    rng = np.random.default_rng(13)
    B, m_pad, n_pad, w = 3, 22, 30, 4
    ta = rng.integers(1, 5, (B, m_pad + 1)).astype(np.int32)
    tb = rng.integers(1, 5, (B, n_pad + 1)).astype(np.int32)
    ta[:, 0] = 0
    tb[:, 0] = 0
    mt = np.array([22, 0, 7], np.int32)
    nt = np.array([30, 11, 1], np.int32)
    cm, gid = _uniform_costing(4, 0, 5, 3, 2)

    run = dict(w=w, interpret=True, force_clamp=None, moves=False)
    f3, _, _ = fl._lanes_run(
        jnp.asarray(ta), jnp.asarray(tb), 0, 5, 3, 2, 4,
        jnp.asarray(mt), jnp.asarray(nt), **run,
    )
    want = _expected_final3(ta, tb, cm, gid, 4, mt, nt)
    got = np.asarray(f3)
    real = (mt > 0) & (nt > 0)  # zero-length rows resolve on the host
    assert (got[real] == want[real]).all(), (mycarry, active_split, got)

    # General-matrix mode (asymmetric gaps, clamp always on).
    gm = np.array(
        [[9, 9, 9, 9, 9, 9],
         [9, 0, 6, 5, 4, 3],
         [9, 6, 1, 7, 2, 4],
         [9, 5, 7, 0, 3, 5],
         [9, 4, 2, 3, 1, 2],
         [9, 3, 4, 5, 2, 0]], np.int32)
    g3, _, _ = fl._lanes_run(
        jnp.asarray(ta), jnp.asarray(tb), 0, 0, 0, 0, 4,
        jnp.asarray(mt), jnp.asarray(nt),
        cost_mat=jnp.asarray(gm), gap_id=5, **run,
    )
    wg = np.asarray(
        fill_pallas.batch_final3(
            jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(gm),
            jnp.int32(5), jnp.int32(4),
            jnp.asarray(np.maximum(mt, 1)), jnp.asarray(np.maximum(nt, 1)),
            interpret=True,
        )
    )
    gg = np.asarray(g3)
    assert (gg[real] == wg[real]).all(), (mycarry, active_split, gg, wg)

    # Moves mode (always the 3-ring recurrence; _ACTIVE_SPLIT applies).
    run["moves"] = True
    v3, _, mv = fl._lanes_run(
        jnp.asarray(ta), jnp.asarray(tb), 0, 5, 3, 2, 4,
        jnp.asarray(mt), jnp.asarray(nt), **run,
    )
    vv = np.asarray(v3)
    assert (vv[real] == want[real]).all(), (mycarry, active_split, vv)
    key = (mycarry, active_split)
    store = test_lanes_round4_toggles_bit_identical.__dict__
    store.setdefault("mv", {})[key] = np.asarray(mv)
    base = store["mv"].get((True, True))
    if base is not None and key != (True, True):
        assert np.array_equal(store["mv"][key], base), key


def test_sub_bits_bitmask_general_mode():
    """The bitmask substitution path (sub_bits > 0: per-(phase, bit)
    mask planes + per-lane variable shifts) is a pure reformulation of
    the select chain: identical final3 / injected last-rows / split
    costs, and identical move codes at every REAL cell (the raw skewed
    stream may differ at pad cells the unskew discards).  Also pins
    sub_bits_for's gating: bit width for big concrete alphabets, 0 for
    small alphabets (chain cheaper), negatives, and tracers."""
    from globalign_tpu.ops import fill_lanes as fl

    rng = np.random.default_rng(29)
    B, m_pad, n_pad, w = 3, 21, 26, 4
    ta = rng.integers(1, 5, (B, m_pad + 1)).astype(np.int32)
    tb = rng.integers(1, 5, (B, n_pad + 1)).astype(np.int32)
    ta[:, 0] = 0
    tb[:, 0] = 0
    mt = np.array([21, 5, 7], np.int32)
    nt = np.array([26, 11, 9], np.int32)
    gm = rng.integers(0, 23, (6, 6)).astype(np.int32)
    gm = np.minimum(gm, gm.T)
    bits = int(gm.max()).bit_length()

    def both(fn):
        a = fn(0)
        b = fn(bits)
        return np.asarray(a), np.asarray(b)

    f0, f1 = both(lambda sb: fl.lanes_general_final3(
        jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(gm), 5, 4,
        jnp.asarray(mt), jnp.asarray(nt), w=w, interpret=True,
        sub_bits=sb))
    assert (f0 == f1).all()

    # Injected-boundary last rows (the blocked-traceback contract).
    row0 = rng.integers(0, 40, (B, 3, n_pad + 1)).astype(np.int32)
    c0 = rng.integers(0, 9, (B,)).astype(np.int32)
    r0, r1 = both(lambda sb: fl.lanes_general_last_rows(
        jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(gm), 5, 4,
        jnp.asarray(np.maximum(mt, 1)), jnp.asarray(np.maximum(nt, 1)),
        jnp.asarray(row0), jnp.asarray(c0), w=w, interpret=True,
        sub_bits=sb))
    assert (r0 == r1).all()

    # Moves: values everywhere, codes at real cells after unskew.
    def mv_of(sb):
        f, mv = fl.lanes_general_moves(
            jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(gm), 5, 4,
            jnp.asarray(mt), jnp.asarray(nt), w=w, interpret=True,
            sub_bits=sb)
        return np.asarray(f), fl.lanes_moves_to_row(
            np.asarray(mv), B, n_pad, w, m_pad)

    (v0, c0m), (v1, c1m) = mv_of(0), mv_of(bits)
    assert (v0 == v1).all()
    for p in range(B):
        assert (
            c0m[p, 1:mt[p] + 1, 1:nt[p] + 1]
            == c1m[p, 1:mt[p] + 1, 1:nt[p] + 1]
        ).all(), p

    s0, s1 = both(lambda sb: fl.lanes_split_fill_cost(
        jnp.asarray(ta[0]), jnp.asarray(tb[0]), 0, 0, 0, 0, 4,
        int(mt[0]), int(nt[0]), cost_mat=jnp.asarray(gm), gap_id=5,
        w=4, interpret=True, sub_bits=sb))
    assert s0 == s1

    # sub_bits_for gating.
    big_a = np.full((26, 26), 15, np.int32)
    assert fl.sub_bits_for(big_a) == 4
    assert fl.sub_bits_for(jnp.asarray(big_a)) == 4
    assert fl.sub_bits_for(np.full((6, 6), 7, np.int32)) == 0
    assert fl.sub_bits_for(np.full((26, 26), -1, np.int32)) == 0
    assert fl.sub_bits_for(None) == 0
    import jax

    traced = jax.jit(lambda cm: fl.sub_bits_for(cm))(jnp.asarray(big_a))
    assert int(traced) == 0


def test_alphabet_cap_lift_bitmask():
    """Alphabets in (LANES_MAX_ALPHABET, LANES_MAX_ALPHABET_BITMASK]
    ride the lane kernel iff the matrix qualifies for bitmask mode:
    lanes_alphabet_ok answers the dispatch question, and the kernel at
    asel=28 / sub_bits matches the stacked-kernel oracle bit-for-bit
    in interpret mode (shift indexing stays valid for token ids < 32)."""
    from globalign_tpu.ops import fill_lanes as fl

    A = 28
    rng = np.random.default_rng(31)
    gm = rng.integers(0, 23, (A, A)).astype(np.int32)
    gm = np.minimum(gm, gm.T)
    bits = int(gm.max()).bit_length()
    gid = A - 1

    assert fl.lanes_alphabet_ok(26, None)
    assert not fl.lanes_alphabet_ok(A, None)  # no matrix -> no bitmask
    assert fl.lanes_alphabet_ok(A, gm)
    assert not fl.lanes_alphabet_ok(A, np.full((A, A), -1, np.int32))
    assert not fl.lanes_alphabet_ok(32, gm[:1, :1].repeat(32, 0))

    B, m_pad, n_pad, w = 2, 14, 18, 4
    ta = rng.integers(0, A - 1, (B, m_pad + 1)).astype(np.int32)
    tb = rng.integers(0, A - 1, (B, n_pad + 1)).astype(np.int32)
    ta[:, 0] = 0
    tb[:, 0] = 0
    mt = np.array([14, 6], np.int32)
    nt = np.array([18, 5], np.int32)
    got = np.asarray(fl.lanes_general_final3(
        jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(gm), gid, 4,
        jnp.asarray(mt), jnp.asarray(nt), w=w, interpret=True,
        sub_bits=bits))
    want = np.asarray(fill_pallas.batch_final3(
        jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(gm),
        jnp.int32(gid), jnp.int32(4),
        jnp.asarray(mt), jnp.asarray(nt), interpret=True))
    assert (got == want).all(), (got, want)


def test_general_dispatch_probes_once_per_shape(monkeypatch):
    """The general-matrix cost dispatch block_until_ready-probes only
    the FIRST call of a shape class (a per-call tunnel sync measured
    ~10x on bucketed serving chunks); later calls of the same class
    stay async while a new class probes again.  Selection-level test:
    the kernel is stubbed with a block-counting array wrapper."""
    blocks = []

    class Probed:
        def __init__(self, arr, tag):
            self._arr = arr
            self._tag = tag

        def block_until_ready(self):
            blocks.append(self._tag)
            return self._arr

        def __getitem__(self, idx):
            # Slices stay probe-aware: the dispatch probes outs[0],
            # which is vals[:keep] (a jax Array in production).
            return Probed(self._arr[idx], self._tag)

        @property
        def shape(self):
            return self._arr.shape

    def stub(ta, tb, *a, **k):
        return Probed(np.zeros((ta.shape[0], 3), np.int32), ta.shape)

    monkeypatch.setattr(fill_lanes, "lanes_general_final3", stub)
    monkeypatch.setattr(fill_lanes, "_general_run_probed", set())
    # jnp.concatenate cannot take the wrapper; the dispatch returns
    # outs via concatenate only on success — patch it to unwrap
    # (binding the ORIGINAL first: the patched module attribute would
    # otherwise recurse into itself).
    orig_concat = fill_pallas.jnp.concatenate

    monkeypatch.setattr(
        fill_pallas.jnp, "concatenate",
        lambda xs, axis=0: orig_concat(
            [x._arr if isinstance(x, Probed) else np.asarray(x)
             for x in xs], axis=axis),
    )

    rng = np.random.default_rng(3)
    A = 20
    gm = rng.integers(0, 15, (A, A)).astype(np.int32)
    gm = np.minimum(gm, gm.T)
    B, m_pad, n_pad = 2, 12, 16
    ta = np.ones((B, m_pad + 1), np.int32)
    tb = np.ones((B, n_pad + 1), np.int32)
    mt = np.full(B, m_pad, np.int32)
    nt = np.full(B, n_pad, np.int32)

    def call(npad):
        tbq = np.ones((B, npad + 1), np.int32)
        return fill_pallas.batch_final3(
            jnp.asarray(ta), jnp.asarray(tbq), jnp.asarray(gm), A - 1, 4,
            jnp.asarray(mt), jnp.asarray(np.full(B, npad, np.int32)),
        )

    call(n_pad)
    assert len(blocks) == 1  # first call of the class probes
    call(n_pad)
    assert len(blocks) == 1  # same class: no further sync
    call(n_pad + 16)
    assert len(blocks) == 2  # new shape class probes once
    call(n_pad + 16)
    assert len(blocks) == 2
