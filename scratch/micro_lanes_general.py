"""TPU A/B: general-matrix lane kernel vs the scan kernels (BLOSUM62).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_lanes_general.py [B] [m]
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    import jax
    import jax.numpy as jnp

    from globalign_tpu.ops import fill_lanes, fill_pallas
    from globalign_tpu.ops.transforms import scoring_mat_to_costing_mat
    from globalign_tpu.utils.matrices import load_bundled_matrix
    from globalign_tpu.utils.platform import enable_compilation_cache
    from globalign_tpu.utils.tokenize import encode_padded

    enable_compilation_cache()
    scoring = load_bundled_matrix("BLOSUM62")
    costing = scoring_mat_to_costing_mat(scoring, int(scoring.values.max()))
    alpha = costing.alphabet
    A = alpha.size
    gid = alpha.gap_id
    cm = jnp.asarray(costing.values, jnp.int32)
    n = m
    rng = np.random.default_rng(11)
    letters = [c for c in alpha.letters if c != "-"]
    seqs1 = ["".join(rng.choice(letters, m)) for _ in range(B)]
    seqs2 = ["".join(rng.choice(letters, n)) for _ in range(B)]
    ta = np.stack([encode_padded(alpha, s, m) for s in seqs1])
    tb = np.stack([encode_padded(alpha, s, n) for s in seqs2])
    taj, tbj = jnp.asarray(ta), jnp.asarray(tb)
    mtj = jnp.full((B,), m, jnp.int32)
    ntj = jnp.full((B,), n, jnp.int32)
    go = jnp.int32(costing.values.max() // 2 + 4)

    plan = fill_lanes.lanes_plan(B, m, n, asel=A)
    print(json.dumps({"A": A, "gid": gid, "plan": plan}), flush=True)
    if plan is None:
        return
    w = plan[0]

    got = np.asarray(
        fill_lanes.lanes_general_final3(
            taj, tbj, cm, gid, go, mtj, ntj, w=w
        )
    )
    # Reference = the scan kernels DIRECTLY (the dispatchers now route
    # general matrices to the lane kernel themselves).
    if B == 1:
        want = np.asarray(
            fill_pallas.row_fill_last_rows(
                taj[0], tbj[0], cm, jnp.int32(gid), go
            )[:, n]
        )[None]
    else:
        last = fill_pallas.stacked_fill_last_rows(
            taj, tbj, cm, jnp.int32(gid), go, mtj, ntj
        )
        want = np.asarray(last[:, :, n])
    print(json.dumps({"match": bool((got == want).all()),
                      "got": got[0].tolist(), "want": want[0].tolist()}),
          flush=True)
    if not (got == want).all():
        return

    def make_chain(fn):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(ta_j, k):
            tot = jnp.int32(0)
            for i in range(k):
                tai = jnp.roll(ta_j, i, axis=0) if B > 1 else \
                    ta_j.at[:, 1:].set(jnp.roll(ta_j[:, 1:], i, axis=1))
                tot = tot + jnp.min(fn(tai + (tot & 0)))
            return tot

        return chain

    def one_lanes(ta_j):
        return fill_lanes.lanes_general_final3(
            ta_j, tbj, cm, gid, go, mtj, ntj, w=w
        )

    def one_scan(ta_j):
        if B == 1:
            return fill_pallas.split_fill_cost(
                ta_j[0], tbj[0], cm, jnp.int32(gid), go, m, n
            )
        last = fill_pallas.stacked_fill_last_rows(
            ta_j, tbj, cm, jnp.int32(gid), go, mtj, ntj
        )
        return last[:, :, n]

    chains = {"lanes_gen": make_chain(one_lanes),
              "scan": make_chain(one_scan)}

    def slope(c, lo=2, hi=8, reps=5):
        for k in (lo, hi):
            c(taj, k=k).block_until_ready()
        best = {}
        for k in (lo, hi):
            bst = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                c(taj, k=k).block_until_ready()
                bst = min(bst, time.perf_counter() - t0)
            best[k] = bst
        return (best[hi] - best[lo]) / (hi - lo)

    for rnd in range(2):
        row = {"round": rnd, "B": B, "m": m, "w": w}
        for name, c in chains.items():
            t = slope(c)
            row[f"{name}_gcups"] = round(B * m * n / t / 1e9, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
