"""Sequence-parallel (column-sharded) fill == single-device fill.

One pair's DP matrix is striped over the virtual 8-device CPU mesh with
pipelined wavefront + ppermute halo exchange (parallel/seqpar.py); the
final cost lanes must match the plain row fill exactly for any strip/block
geometry.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from globalign_tpu.ops import fill_rows
from globalign_tpu.ops.transforms import scoring_mat_to_costing_mat
from globalign_tpu.parallel.seqpar import make_strip_mesh, sharded_pair_cost
from globalign_tpu.utils.matrices import create_scoring_mat, load_bundled_matrix
from globalign_tpu.utils.tokenize import Alphabet, encode_padded


@pytest.fixture(scope="module")
def strip_mesh():
    return make_strip_mesh()


def _check(mesh, alpha, costing, s1, s2, block_rows, go=4, backend="scan"):
    cm = jnp.asarray(costing.values)
    gid = jnp.int32(alpha.gap_id)
    ta = np.asarray(encode_padded(alpha, s1, len(s1)))
    tb = np.asarray(encode_padded(alpha, s2, len(s2)))
    want = np.asarray(
        fill_rows.row_fill(
            jnp.asarray(ta), jnp.asarray(tb), cm, gid, jnp.int32(go),
            want_moves=False,
        ).final3
    )
    got = sharded_pair_cost(
        mesh, ta, tb, costing.values, alpha.gap_id, go,
        block_rows=block_rows, backend=backend,
    )
    assert (want == got).all(), (s1, s2, block_rows, backend, want, got)


@pytest.mark.parametrize("backend", ["scan", "pallas_interpret"])
@pytest.mark.parametrize("block_rows", [1, 3, 16, 64])
def test_seqpar_matches_single_device_dna(strip_mesh, block_rows, backend):
    alpha = Alphabet.from_letters(("A", "C", "G", "T", "-"))
    costing = scoring_mat_to_costing_mat(
        create_scoring_mat(alpha, 2, -3, -2), max_score=2
    )
    rng = np.random.default_rng(block_rows)
    for _ in range(3):
        m = int(rng.integers(1, 90))
        n = int(rng.integers(8, 120))  # n >= D so every strip is nonempty
        s1 = "".join(rng.choice(list("ACGT"), m))
        s2 = "".join(rng.choice(list("ACGT"), n))
        _check(strip_mesh, alpha, costing, s1, s2, block_rows, backend=backend)


def test_seqpar_matches_single_device_blosum(strip_mesh):
    scoring = load_bundled_matrix("BLOSUM62")
    costing = scoring_mat_to_costing_mat(
        scoring, max_score=int(scoring.values.max())
    )
    alpha = costing.alphabet
    letters = [c for c in alpha.letters if c != "-"]
    rng = np.random.default_rng(99)
    for _ in range(2):
        m = int(rng.integers(1, 70))
        n = int(rng.integers(8, 90))
        s1 = "".join(rng.choice(letters, m))
        s2 = "".join(rng.choice(letters, n))
        _check(strip_mesh, alpha, costing, s1, s2, block_rows=8)


def test_seqpar_gap_spanning_strips(strip_mesh):
    """A long horizontal gap run crossing several strip boundaries must be
    charged exactly one gap-open."""
    alpha = Alphabet.from_letters(("A", "C", "G", "T", "-"))
    costing = scoring_mat_to_costing_mat(
        create_scoring_mat(alpha, 2, -3, -2), max_score=2
    )
    s1 = "AC"
    s2 = "AC" + "G" * 60  # optimal path: 60-wide gap run across strips
    _check(strip_mesh, alpha, costing, s1, s2, block_rows=4)
    _check(strip_mesh, alpha, costing, s2, s1, block_rows=4)
    _check(strip_mesh, alpha, costing, s1, s2, block_rows=4,
           backend="pallas_interpret")


def test_seqpar_short_seq2_guard(strip_mesh):
    """n < D must not produce zero-width strips (degenerate fallback)."""
    from globalign_tpu.ops import fill_rows
    from globalign_tpu.parallel.seqpar import sharded_pair_cost

    alpha = Alphabet.from_letters(("A", "C", "G", "T", "-"))
    costing = scoring_mat_to_costing_mat(
        create_scoring_mat(alpha, 2, -3, -2), max_score=2
    )
    cm = jnp.asarray(costing.values)
    gid = jnp.int32(alpha.gap_id)
    go = jnp.int32(4)
    ta = jnp.asarray(encode_padded(alpha, "ACGTAC", 6))
    tb = jnp.asarray(encode_padded(alpha, "AGT", 3))  # n=3 < D=8
    want = np.asarray(
        fill_rows.row_fill(ta, tb, cm, gid, go, want_moves=False).final3
    )
    got = sharded_pair_cost(strip_mesh, ta, tb, cm, gid, go)
    assert (want == got).all()
