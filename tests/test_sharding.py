"""Multi-device data-parallel path on the 8-device virtual CPU mesh.

The reference has no distributed anything (SURVEY.md §2); this is the TPU
framework's pod-scaling axis, validated without hardware via
xla_force_host_platform_device_count (SURVEY.md §4 item 3).
"""

import jax
import numpy as np

from globalign_tpu import align_pairs, find_global_alignment
from globalign_tpu.parallel.mesh import make_pair_mesh


def test_virtual_mesh_has_8_devices(cpu_mesh):
    assert cpu_mesh.devices.size == 8


def test_sharded_costs_match_unsharded(cpu_mesh):
    pairs = [
        ("ACGT", "AGT"),
        ("TT", "TA"),
        ("TAAAGCTAA", "TAGCTC"),
        ("GGAGGACGTT", "GAG"),
        ("TGGATGAGGCTCCACGCACTAA", "GATTGGTGAGGCTCAGCAT"),
        ("CGGTCTTAGCATATGTTGGCATAC", "ATTAGCATCATAGTGGA"),
        ("CTGTACCG", "CGGAACAGTCCGAT"),
        ("GTAGGCGGTC", "CAGCTGC"),
        ("ACGTACGT", "ACGTACGT"),
        ("AAAA", "AA"),  # 10 pairs over 8 devices: exercises pad+drop
    ]
    sharded = align_pairs(pairs, with_traceback=False, mesh=cpu_mesh)
    local = align_pairs(pairs, with_traceback=False)
    for s, l in zip(sharded, local):
        assert s.cost == l.cost
        assert s.score == l.score


def test_sharded_matches_reference_goldens(cpu_mesh):
    pairs = [("TT", "TA"), ("GGAGGACGTT", "GAG")]
    out = align_pairs(
        pairs,
        with_traceback=False,
        mesh=cpu_mesh,
        match_score=3,
        mismatch_score=-4,
        gap_open_score=-5,
        gap_extension_score=-2,
    )
    assert (out[0].score, out[0].cost) == (-1, 7)


def test_sharded_traceback_matches_unsharded(cpu_mesh):
    """Sharded batches produce full alignments (round-1 limitation lifted):
    moves stay sharded per device, final lanes are all-gathered, and the
    deterministic traceback is bit-identical to the local path."""
    rng = np.random.default_rng(77)
    pairs = []
    for _ in range(13):  # odd count -> exercises mesh padding
        m = int(rng.integers(1, 60))
        n = int(rng.integers(1, 60))
        pairs.append(
            (
                "".join(rng.choice(list("ACGT"), m)),
                "".join(rng.choice(list("ACGT"), n)),
            )
        )
    sharded = align_pairs(pairs, with_traceback=True, mesh=cpu_mesh)
    local = align_pairs(pairs, with_traceback=True)
    for s, l in zip(sharded, local):
        assert (s.cost, s.score) == (l.cost, l.score)
        assert s.seq_1_aligned == l.seq_1_aligned
        assert s.middle_part == l.middle_part
        assert s.seq_2_aligned == l.seq_2_aligned
