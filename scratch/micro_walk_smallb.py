"""Walk cost vs lane count, tunnel-proof: K chained walks in one jit,
fetch once; slope (t_hi - t_lo)/(hi - lo)."""
import functools, json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from globalign_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from globalign_tpu.ops import fill_lanes
    from globalign_tpu.ops import linear_tb

    rng = np.random.default_rng(3)
    L = 992
    for B in (3, 8, 119):
        plan = fill_lanes.lanes_plan(B, L, L, moves=True)
        w, tile_l = plan
        S_p, _R = fill_lanes._lanes_geometry(tile_l, L, w, moves=True)
        ta = np.zeros((tile_l, L + 1), np.int32); ta[:, 1:] = rng.integers(1, 5, (tile_l, L))
        tb = np.zeros((tile_l, L + 1), np.int32); tb[:, 1:] = rng.integers(1, 5, (tile_l, L))
        mt = jnp.full((tile_l,), L, jnp.int32)
        vals, mv = fill_lanes.lanes_batch_moves(
            jnp.asarray(ta), jnp.asarray(tb), 0, 5, 3, 3, 4, mt, mt, w=w)
        np.asarray(vals)
        bases = jnp.arange(tile_l, dtype=jnp.int32) * S_p
        tape_len = 2 * L + 1
        walk_raw = linear_tb.lanes_tile_walk.__wrapped__

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(mv_j, vals_j, k):
            tot = jnp.int32(0)
            for i in range(k):
                t, c, j = walk_raw(mv_j, vals_j + (tot & 0), mt, mt,
                                   bases, w, tape_len)
                tot = tot + jnp.sum(c) + jnp.sum(j)
            return tot

        best = {}
        for k in (1, 5):
            np.asarray(chain(mv, vals, k))
            b = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(chain(mv, vals, k))
                b = min(b, time.perf_counter() - t0)
            best[k] = b
        per = (best[5] - best[1]) / 4
        print(json.dumps({"B": B, "w": w, "walk_ms": round(per * 1e3, 1),
                          "us_per_step": round(per / tape_len * 1e6, 2)}),
              flush=True)

if __name__ == "__main__":
    main()
