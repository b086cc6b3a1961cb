"""Attack the device-walk bottleneck (VERDICT r4 item 1): the vmapped
while_loop walk costs ~400 us/step at 1 kb (93% of traceback serving,
scratch/micro_tb_decompose.py).  Hypothesis: the per-lane
dynamic_update_index (tape write) and per-lane 3-D indexing (code read)
hit XLA's serial scatter/gather expanders.

Variants, all pinned bit-identical to lanes_tile_walk on [:count]:
  v1  current lanes_tile_walk (vmapped while_loop, per-lane scatter)
  v2  fori_loop + COLUMN tape write (all active lanes share t == it;
      dynamic_update_slice at scalar column) + one flat 1-D gather
  v3  v2 with K=4 steps unrolled per iteration (amortize loop overhead)

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_walk.py [B] [L]
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from globalign_tpu.ops import fill_lanes
    from globalign_tpu.ops.linear_tb import lanes_tile_walk

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    plan = fill_lanes.lanes_plan(B, L, L, moves=True)
    w, tile_l = plan
    assert tile_l == B, (plan, B)
    S_p, _R = fill_lanes._lanes_geometry(B, L, w, moves=True)
    tape_len = 2 * L + 1
    bases = jnp.arange(B, dtype=jnp.int32) * S_p

    rng = np.random.default_rng(3)
    tok_a = np.zeros((B, L + 1), np.int32)
    tok_b = np.zeros((B, L + 1), np.int32)
    tok_a[:, 1:] = rng.integers(1, 5, (B, L))
    tok_b[:, 1:] = rng.integers(1, 5, (B, L))
    m_true = jnp.full((B,), L, jnp.int32)
    n_true = jnp.full((B,), L, jnp.int32)

    vals, mv = fill_lanes.lanes_batch_moves(
        jnp.asarray(tok_a), jnp.asarray(tok_b), 0, 5, 3, 3, 4,
        m_true, n_true, w=w,
    )
    mv.block_until_ready()
    print(json.dumps({"B": B, "L": L, "w": w, "S_p": S_p,
                      "mv_shape": list(mv.shape)}), flush=True)

    OP_DIAG, OP_LEFT, OP_UP = 0, 1, 2
    LANES = 128

    @functools.partial(jax.jit, static_argnames=("w_", "tape_len_", "K"))
    def walk_v2(mv, final3, m_t, n_t, bases_, w_, tape_len_, K=1):
        Bq = m_t.shape[0]
        levels = jnp.argmin(final3, axis=-1).astype(jnp.int32)
        R128 = mv.shape[1] * LANES
        mv_flat = mv.reshape(-1)
        max_row = mv.shape[0] - 1

        def step(st, it):
            i_l, j, level, t, col = st
            active = i_l > 0
            jc = jnp.maximum(j, 1) - 1
            qq = jc // w_
            row = (i_l - 1 + 2 * qq) * w_ + jc % w_
            ss = bases_ + qq
            flat = jnp.minimum(row, max_row) * R128 + ss
            code = jnp.take(mv_flat, flat, mode="clip").astype(jnp.int32)
            boundary = j == 0
            is_m = level == 0
            is_x = level == 1
            op = jnp.where(
                boundary, OP_UP,
                jnp.where(is_m, OP_DIAG, jnp.where(is_x, OP_LEFT, OP_UP)),
            )
            nl = jnp.where(
                is_m, code & 3,
                jnp.where(is_x, (code >> 2) & 3, (code >> 4) & 3),
            )
            nl = jnp.where(boundary, level, nl)
            di = jnp.where(op == OP_LEFT, 0, 1)
            dj = jnp.where(op == OP_UP, 0, 1)
            colv = jnp.where(active, op, 0).astype(jnp.uint8)
            i_l = jnp.where(active, i_l - di, i_l)
            j = jnp.where(active, j - dj, j)
            level = jnp.where(active, nl, level)
            t = jnp.where(active, t + 1, t)
            return (i_l, j, level, t, col + (colv,))

        def body(it, st):
            i_l, j, level, t, ops = st
            sub = (i_l, j, level, t, ())
            for k in range(K):
                sub = step(sub, it * K + k)
            i_l, j, level, t, cols = sub
            block = jnp.stack(cols, axis=1)  # (B, K)
            ops = jax.lax.dynamic_update_slice(ops, block, (0, it * K))
            return (i_l, j, level, t, ops)

        nit = -(-tape_len_ // K)
        ops0 = jnp.zeros((Bq, nit * K), jnp.uint8)
        i_l, j, level, t, ops = jax.lax.fori_loop(
            0, nit, body,
            (m_t.astype(jnp.int32), n_t.astype(jnp.int32), levels,
             jnp.zeros((Bq,), jnp.int32), ops0),
        )
        return ops[:, :tape_len_], t, j

    # Reference: current implementation.
    ref_tapes, ref_counts, ref_j = lanes_tile_walk(
        mv, vals, m_true, n_true, bases, w, tape_len
    )
    ref_tapes = np.asarray(ref_tapes)
    ref_counts = np.asarray(ref_counts)
    ref_j = np.asarray(ref_j)

    variants = {
        "v2_col_flat": lambda: walk_v2(
            mv, vals, m_true, n_true, bases, w, tape_len, 1
        ),
        "v3_unroll4": lambda: walk_v2(
            mv, vals, m_true, n_true, bases, w, tape_len, 4
        ),
        "v3_unroll8": lambda: walk_v2(
            mv, vals, m_true, n_true, bases, w, tape_len, 8
        ),
    }
    for name, fn in variants.items():
        tp, ct, jx = fn()
        tp = np.asarray(tp)
        ct = np.asarray(ct)
        jx = np.asarray(jx)
        ok = (ct == ref_counts).all() and (jx == ref_j).all() and all(
            (tp[b, : ct[b]] == ref_tapes[b, : ref_counts[b]]).all()
            for b in range(B)
        )
        print(json.dumps({"variant": name, "bit_identical": bool(ok)}),
              flush=True)
        assert ok, name

    def timeit(fn, reps=3):
        fn()[0].block_until_ready()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()[0].block_until_ready()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = timeit(lambda: lanes_tile_walk(
        mv, vals, m_true, n_true, bases, w, tape_len
    ))
    out = {"v1_current_s": round(t1, 4)}
    for name, fn in variants.items():
        out[name + "_s"] = round(timeit(fn), 4)
    out["metric"] = "walk_variants"
    out["B"], out["L"] = B, L
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
