"""Decompose TRACEBACK-mode batch serving into its phases (VERDICT r4
item 1): cost-only fill vs moves fill vs device walk vs tape fetch vs
host string assembly, all WITHIN ONE RUN at the shapes the serving
table quotes (1024 x 1 kb; optionally 64 x 10 kb).

Mirrors batch.py's traceback path exactly: the bucket splits into
sub-batches under DEFAULT_BATCH_MOVES_BUDGET, each sub-batch tiles by
lanes_plan, each tile runs lanes_batch_moves then lanes_tile_walk, the
tapes are fetched coalesced and assembled on the host.

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_tb_decompose.py \
    [npairs] [len] [blosum]
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    blosum = len(sys.argv) > 3 and sys.argv[3] == "blosum"

    from globalign_tpu import batch as batch_mod
    from globalign_tpu.config import resolve_scheme
    from globalign_tpu.ops import fill_lanes
    from globalign_tpu.ops.fill_pallas import _tile_slice
    from globalign_tpu.ops.linear_tb import (
        assemble_from_tapes, lanes_tile_walk,
    )
    from globalign_tpu.utils.tokenize import encode_padded

    letters = list("ARNDCQEGHILKMFPSTWYV" if blosum else "ACGT")
    rng = np.random.default_rng(7)
    pairs = [
        ("".join(rng.choice(letters, L)), "".join(rng.choice(letters, L)))
        for _ in range(B)
    ]
    scheme = resolve_scheme(
        "".join(p[0] for p in pairs), "".join(p[1] for p in pairs),
        **({"scoring_mat_name": "BLOSUM62"} if blosum else {}),
    )
    M = batch_mod.bucket_length(L)
    N = M
    cost_mat = jnp.asarray(scheme.costing.values, jnp.int32)
    gap_id = jnp.int32(scheme.alphabet.gap_id)
    gap_open = jnp.int32(scheme.gap_open_cost)
    cost_np = np.asarray(scheme.costing.values)
    from globalign_tpu.ops.fill_pallas import uniform_scheme_params

    uni = uniform_scheme_params(cost_np, int(gap_id))
    asel = 0 if uni is not None else int(cost_np.shape[0])

    tok_a = np.stack([encode_padded(scheme.alphabet, a, M) for a, _ in pairs])
    tok_b = np.stack([encode_padded(scheme.alphabet, b, N) for _, b in pairs])
    m_true = np.full((B,), L, np.int32)
    n_true = np.full((B,), L, np.int32)

    per_pair = batch_mod._moves_pair_bytes(M, N, scheme)
    max_pairs = max(
        1, batch_mod.DEFAULT_BATCH_MOVES_BUDGET // max(1, per_pair)
    )
    sub = min(B, max_pairs)
    plan = fill_lanes.lanes_plan(sub, M, N, moves=True, asel=asel)
    w, tile_l = plan
    cplanw = fill_lanes.lanes_plan(sub, M, N)  # cost-only plan
    S_p, _R = fill_lanes._lanes_geometry(tile_l, N, w, moves=True)
    tape_len = M + N + 1
    bases = jnp.arange(tile_l, dtype=jnp.int32) * S_p
    sb = fill_lanes.dispatch_sub_bits(cost_np) if asel else 0
    print(json.dumps({
        "B": B, "L": L, "blosum": blosum, "per_pair_bytes": per_pair,
        "sub_batch": sub, "plan_w": w, "plan_tile": tile_l,
        "cost_plan": cplanw,
    }), flush=True)

    ta_d = jnp.asarray(tok_a)
    tb_d = jnp.asarray(tok_b)
    mt_d = jnp.asarray(m_true)
    nt_d = jnp.asarray(n_true)

    def stage_cost():
        """Cost-only lane fill (the 683 pairs/s reference point)."""
        from globalign_tpu.ops.fill_pallas import batch_final3

        out = batch_final3(ta_d, tb_d, cost_mat, gap_id, gap_open, mt_d, nt_d)
        out.block_until_ready()
        return None

    def _tiles():
        for lo0 in range(0, B, sub):
            hi0 = min(lo0 + sub, B)
            for lo in range(lo0, hi0, tile_l):
                hi = min(lo + tile_l, hi0)
                yield _tile_slice((ta_d, tb_d, mt_d, nt_d), lo, hi, tile_l)

    def fills():
        outs = []
        for ta, tb, mt, nt in _tiles():
            if uni is not None:
                cma, cmm, dco, ico = (int(v) for v in uni)
                vals, mv = fill_lanes.lanes_batch_moves(
                    ta, tb, cma, cmm, dco, ico, int(gap_open), mt, nt, w=w
                )
            else:
                vals, mv = fill_lanes.lanes_general_moves(
                    ta, tb, cost_mat, gap_id, gap_open, mt, nt, w=w,
                    sub_bits=sb,
                )
            outs.append((vals, mv, mt, nt))
        return outs

    def stage_fill():
        outs = fills()
        outs[-1][1].block_until_ready()
        return outs

    def stage_walk():
        outs = []
        for vals, mv, mt, nt in fills():
            tapes, counts, _jx = lanes_tile_walk(
                mv, vals, mt, nt, bases, w, tape_len
            )
            outs.append((vals, tapes, counts))
        outs[-1][1].block_until_ready()
        return outs

    def stage_fetch():
        outs = []
        for vals, mv, mt, nt in fills():
            tapes, counts, _jx = lanes_tile_walk(
                mv, vals, mt, nt, bases, w, tape_len
            )
            outs.append((vals, tapes, counts))
        vals_all = np.asarray(jnp.concatenate([o[0] for o in outs], axis=0))
        tapes_all = np.asarray(jnp.concatenate([o[1] for o in outs], axis=0))
        counts_all = np.asarray(jnp.concatenate([o[2] for o in outs], axis=0))
        return vals_all, tapes_all, counts_all

    # Warm every stage (remote compiles), then time.
    stage_cost()
    vals_np, tapes_np, counts_np = stage_fetch()

    def stage_asm():
        for k in range(B):
            s1, s2 = pairs[k]
            tape = tapes_np[k, : int(counts_np[k])]
            assemble_from_tapes([tape], s1, s2)

    def stage_e2e():
        batch_mod.align_pairs(pairs, scheme=scheme, with_traceback=True)

    stage_asm()
    stage_e2e()

    reps = 3 if B * L <= 2_000_000 else 2
    rows = {}
    for name, fn in (
        ("cost_only_fill", stage_cost),
        ("moves_fill", stage_fill),
        ("fill_plus_walk", stage_walk),
        ("fill_walk_fetch", stage_fetch),
        ("host_assembly_only", stage_asm),
        ("align_pairs_e2e", stage_e2e),
    ):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        rows[name] = round(min(ts), 3)
        print(json.dumps({name + "_s": rows[name], "all": [
            round(t, 3) for t in ts]}), flush=True)

    cells = float(B) * L * L
    print(json.dumps({
        "metric": "tb_decompose" + ("_blosum" if blosum else ""),
        "B": B, "L": L,
        "phases_s": rows,
        "derived": {
            "walk_s": round(rows["fill_plus_walk"] - rows["moves_fill"], 3),
            "fetch_s": round(
                rows["fill_walk_fetch"] - rows["fill_plus_walk"], 3
            ),
            "fill_vs_cost_s": round(
                rows["moves_fill"] - rows["cost_only_fill"], 3
            ),
        },
        "e2e_pairs_per_s": round(B / rows["align_pairs_e2e"], 1),
        "moves_fill_gcups": round(cells / rows["moves_fill"] / 1e9, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
