"""Does padding the walk's lane axis to the uint8 sublane tile (32) fix
the tiny-B walk cost?  Consume the TAPES (sum) so DUS can't be DCE'd."""
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
    walk_raw = linear_tb.lanes_tile_walk.__wrapped__
    for B in (3, 8, 32, 119):
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

        def padded(mv_j, vals_j, mt_j, nt_j, bases_j, pad):
            if pad == 0:
                return walk_raw(mv_j, vals_j, mt_j, nt_j, bases_j, w, tape_len)
            z = jnp.zeros((pad,), jnp.int32)
            t, c, j = walk_raw(
                mv_j,
                jnp.concatenate([vals_j, jnp.zeros((pad, 3), vals_j.dtype)]),
                jnp.concatenate([mt_j, z]), jnp.concatenate([nt_j, z]),
                jnp.concatenate([bases_j, z]), w, tape_len)
            return t[:tile_l], c[:tile_l], j[:tile_l]

        for pad_to in (0, 32):
            pad = 0 if pad_to == 0 else max(0, pad_to - tile_l)

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(mv_j, vals_j, k, pad=pad):
                tot = jnp.int32(0)
                for i in range(k):
                    t, c, j = padded(mv_j, vals_j + (tot & 0), mt, mt,
                                     bases, pad)
                    # consume the TAPES so the column writes survive DCE
                    tot = tot + jnp.sum(t.astype(jnp.int32)) + jnp.sum(c)
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
            print(json.dumps({"B": B, "pad_to": pad_to, "w": w,
                              "walk_ms": round(per * 1e3, 1)}), flush=True)

if __name__ == "__main__":
    main()
