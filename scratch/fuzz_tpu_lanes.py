"""TPU-side conformance fuzz of the lane-kernel product paths.

Random uniform schemes and lengths through GotohAligner.cost()/align()
ON THE REAL CHIP, pinned against the pure-numpy oracle (tests/oracle.py)
and re-priced alignments.  Exercises: lanes cost kernel across strip
widths and pad grids, lanes moves + host unskew + native walk, traced
true lengths below padded caps.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/fuzz_tpu_lanes.py [n_cases]
"""

import json
import sys

import numpy as np


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 24

    sys.path.insert(0, "/root/repo/tests")
    from oracle import oracle_cost  # tests/oracle.py

    from globalign_tpu.config import resolve_scheme
    from globalign_tpu.models.gotoh import GotohAligner
    from globalign_tpu.ops.traceback import alignment_cost
    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(2027)
    bad = 0
    for k in range(n_cases):
        m = int(rng.integers(1, 520))
        n = int(rng.integers(1, 520))
        if k % 3 == 2:
            # Protein pair on BLOSUM62: the GENERAL-matrix lane mode.
            letters = list("ARNDCQEGHILKMFPSTWYV")
            m, n = m % 200 + 1, n % 200 + 1  # oracle is O(mn) python
            s1 = "".join(rng.choice(letters, m))
            s2 = "".join(rng.choice(letters, n))
            kw = {"scoring_mat_name": "BLOSUM62"}
        else:
            s1 = "".join(rng.choice(list("ACGT"), m))
            s2 = "".join(rng.choice(list("ACGT"), n))
            kw = {}
            if k % 3:
                kw = {
                    "mismatch_cost": int(rng.integers(1, 9)),
                    "gap_open_cost": int(rng.integers(0, 6)),
                    "gap_extension_cost": int(rng.integers(1, 6)),
                }
        scheme = resolve_scheme(s1, s2, **kw)
        aligner = GotohAligner(scheme)
        want = oracle_cost(s1, s2, scheme.costing, scheme.gap_open_cost)
        got_cost = aligner.cost(s1, s2)
        al = aligner.align(s1, s2)
        priced = alignment_cost(
            al.seq_1_aligned, al.seq_2_aligned, scheme.costing,
            scheme.gap_open_cost,
        )
        ok = got_cost == want == al.cost == priced
        if not ok:
            bad += 1
            print(json.dumps({"case": k, "m": m, "n": n, "kw": kw,
                              "want": want, "cost": got_cost,
                              "align_cost": al.cost, "priced": priced}),
                  flush=True)
        if (k + 1) % 8 == 0:
            print(json.dumps({"done": k + 1, "bad": bad}), flush=True)
    print(json.dumps({"cases": n_cases, "bad": bad,
                      "verdict": "PASS" if bad == 0 else "FAIL"}),
          flush=True)


if __name__ == "__main__":
    main()
