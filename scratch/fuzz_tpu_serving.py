"""End-to-end serving conformance fuzz ON CHIP: random jagged batches
through align_pairs (traceback mode — lane moves fills, mega-walk,
native render) must reproduce the CPU row-scan engine's alignments
STRING FOR STRING.  DNA uniform + BLOSUM62 bitmask schemes.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/fuzz_tpu_serving.py
"""
import json
import subprocess
import sys

import numpy as np

CPU_REF = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
from globalign_tpu.batch import align_pairs
spec = json.load(sys.stdin)
out = []
for case in spec:
    rs = align_pairs([tuple(p) for p in case["pairs"]],
                     with_traceback=True, **case.get("kw", {}))
    out.append([[r.cost, r.score, r.seq_1_aligned, r.middle_part,
                 r.seq_2_aligned] for r in rs])
json.dump(out, sys.stdout)
"""


def main():
    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from globalign_tpu.batch import align_pairs

    rng = np.random.default_rng(99)
    cases = []
    for rep in range(4):
        letters = list("ACGT") if rep % 2 == 0 else list(
            "ARNDCQEGHILKMFPSTWYV"
        )
        kw = {} if rep % 2 == 0 else {"scoring_mat_name": "BLOSUM62"}
        pairs = []
        for _ in range(48):
            m = int(rng.integers(3, 320))
            n = int(rng.integers(3, 320))
            pairs.append(("".join(rng.choice(letters, m)),
                          "".join(rng.choice(letters, n))))
        cases.append({"pairs": pairs, "kw": kw})

    proc = subprocess.run(
        [sys.executable, "-c", CPU_REF],
        input=json.dumps(cases), capture_output=True, text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    want = json.loads(proc.stdout)

    bad = 0
    for case, wrows in zip(cases, want):
        rs = align_pairs(
            [tuple(p) for p in case["pairs"]], with_traceback=True,
            **case["kw"],
        )
        for k, (r, wr) in enumerate(zip(rs, wrows)):
            got = [r.cost, r.score, r.seq_1_aligned, r.middle_part,
                   r.seq_2_aligned]
            if got != wr:
                bad += 1
                print(json.dumps({"MISMATCH": k, "got": got,
                                  "want": wr}), flush=True)
        print(json.dumps({"case_pairs": len(wrows), "bad": bad}),
              flush=True)
    print(json.dumps({
        "metric": "serving_e2e_fuzz",
        "cases": len(cases), "pairs": sum(len(c["pairs"]) for c in cases),
        "bad": bad, "verdict": "PASS" if bad == 0 else "FAIL",
    }), flush=True)


if __name__ == "__main__":
    main()
