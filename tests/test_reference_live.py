"""Live conformance fuzz against the actual reference implementation.

The strongest parity evidence available in this environment: run the
REAL reference package (pure Python, /root/reference/src) in a
subprocess on randomized inputs across every scheme family and assert
bit-identical (score, cost) from our engine.  Alignment strings are NOT
compared — the reference tie-breaks with unseeded random.choice
(reference globaligner.py:598-672; SURVEY.md "behavioral quirks"), so
only score/cost are deterministic there.  Skips cleanly when the
reference tree is absent (CI).

Complements test_conformance.py (the reference's own golden vectors,
which pin exact values without needing the reference installed).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REF_SRC = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not (REF_SRC / "globalign" / "globaligner.py").exists(),
    reason="reference tree not available",
)

_RUNNER = r"""
import json, sys
from globalign.globaligner import find_global_alignment

out = []
for case in json.load(sys.stdin):
    res = find_global_alignment(**case)
    out.append({"score": res.score, "cost": res.cost})
json.dump(out, sys.stdout)
"""


def _reference_results(cases: list[dict]) -> list[dict]:
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_", "TPU_"))
    }
    env["PYTHONPATH"] = str(REF_SRC)
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER],
        input=json.dumps(cases),
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout)


def _random_cases(rng: np.random.Generator, n_cases: int) -> list[dict]:
    """Randomized pairs across all four scheme-resolution branches."""
    cases = []
    for k in range(n_cases):
        m = int(rng.integers(1, 40))
        n = int(rng.integers(1, 40))
        if k % 4 == 0:
            # Protein pair on a named BLOSUM (branch a).
            letters = list("ARNDCQEGHILKMFPSTWYV")
            extra = {
                "scoring_mat_name": ["BLOSUM62", "BLOSUM50"][k % 8 == 0]
            }
        elif k % 4 == 1:
            # Simple costing scheme (branch c).
            letters = list("ACGT")
            extra = {
                "mismatch_cost": int(rng.integers(1, 9)),
                "gap_open_cost": int(rng.integers(0, 6)),
                "gap_extension_cost": int(rng.integers(1, 6)),
            }
        elif k % 4 == 2:
            # Simple scoring scheme (branch d, explicit).
            letters = list("ACGT")
            extra = {
                "match_score": int(rng.integers(1, 6)),
                "mismatch_score": -int(rng.integers(1, 6)),
                "gap_open_score": -int(rng.integers(0, 5)),
                "gap_extension_score": -int(rng.integers(1, 5)),
            }
        else:
            # All defaults (branch d).
            letters = list("ACGT")
            extra = {}
        cases.append(
            {
                "seq_1": "".join(rng.choice(letters, m)),
                "seq_2": "".join(rng.choice(letters, n)),
                **extra,
            }
        )
    return cases


def test_score_cost_parity_with_live_reference():
    from globalign_tpu import find_global_alignment

    rng = np.random.default_rng(2026)
    cases = _random_cases(rng, 24)
    want = _reference_results(cases)
    for case, ref in zip(cases, want):
        res = find_global_alignment(**case)
        assert (res.score, res.cost) == (ref["score"], ref["cost"]), (
            case,
            (res.score, res.cost),
            ref,
        )
        # Stronger than the reference's own asserts: our deterministic
        # alignment must PRICE to the reported cost (the reference cannot
        # promise this for its random tie-breaks; SURVEY.md quirk 2).
        from globalign_tpu.ops.traceback import alignment_cost
        from globalign_tpu.utils.matrices import SubstitutionMatrix

        costing = SubstitutionMatrix.from_nested_dict(res.costing_mat)
        assert (
            alignment_cost(
                res.seq_1_aligned, res.seq_2_aligned, costing,
                res.gap_open_cost,
            )
            == res.cost
        )
