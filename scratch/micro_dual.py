"""Dual-set lane kernel (npar=2) on chip: bit-exactness vs two single
calls + within-run speed A/B at the batch shapes (VERDICT r4 item 2).

Shapes:
  64x4kb  w=128: two R=8 tiles -> one dual call (the co-headline shape)
  512x1kb w=128: four R=8 tiles -> two dual calls
  64x1kb  dual w=16 (2x32 pairs, full R=8 sets) vs single w=128 (R=4)

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_dual.py
"""
import functools, json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from globalign_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from globalign_tpu.ops import fill_lanes as fl

    rng = np.random.default_rng(9)

    def toks(B, L):
        ta = np.zeros((B, L + 1), np.int32); ta[:, 1:] = rng.integers(1, 5, (B, L))
        tb = np.zeros((B, L + 1), np.int32); tb[:, 1:] = rng.integers(1, 5, (B, L))
        return jnp.asarray(ta), jnp.asarray(tb), jnp.full((B,), L, jnp.int32)

    def chain(fn, k):
        @functools.partial(jax.jit, static_argnames=("kk",))
        def run(ta, kk):
            tot = jnp.int32(0)
            for i in range(kk):
                tot = tot + fn(jnp.roll(ta, i, axis=-1).at[..., 0].set(0) + (tot & 0))
            return tot
        return run

    def slope(run, ta, lo=2, hi=8, reps=4):
        for k in (lo, hi):
            np.asarray(run(ta, k))
        best = {}
        for k in (lo, hi):
            b = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter(); np.asarray(run(ta, k))
                b = min(b, time.perf_counter() - t0)
            best[k] = b
        return (best[hi] - best[lo]) / (hi - lo)

    out = {"metric": "dual_kernel_ab"}

    for (B, L, w, half) in ((64, 4096, 128, 32), (512, 1024, 128, 128),
                            (64, 1024, 16, 32), (64, 1024, 128, 0)):
        ta, tb, mt = toks(B, L)
        tag = f"B{B}xL{L}_w{w}"
        if half == 0:
            # single-call reference arm (current dispatch shape)
            def one(ta_j, tb_j=tb, mt_j=mt, w_=w):
                return jnp.sum(fl.lanes_batch_final3(
                    ta_j, tb_j, 0, 5, 3, 3, 4, mt_j, mt_j, w=w_))
            per = slope(chain(one, 0), ta)
            out[tag + "_single"] = round(B * L * L / per / 1e9, 1)
            continue
        # dual arm: halves stacked as sets; also bit-check once
        ta2 = jnp.stack([ta[:half], ta[half:2*half]])
        tb2 = jnp.stack([tb[:half], tb[half:2*half]])
        mt2 = jnp.stack([mt[:half], mt[half:2*half]])
        ncalls = B // (2 * half)

        d = fl.lanes_batch_final3_dual(ta2, tb2, 0, 5, 3, 3, 4, mt2, mt2, w=w)
        s0 = fl.lanes_batch_final3(ta[:half], tb[:half], 0, 5, 3, 3, 4, mt[:half], mt[:half], w=w)
        s1 = fl.lanes_batch_final3(ta[half:2*half], tb[half:2*half], 0, 5, 3, 3, 4, mt[half:2*half], mt[half:2*half], w=w)
        ok = bool((np.asarray(d[0]) == np.asarray(s0)).all()
                  and (np.asarray(d[1]) == np.asarray(s1)).all())
        out[tag + "_bitexact"] = ok

        # NOTE: for >1 call the tb slices differ; rebuild cleanly:
        tbs = [jnp.stack([tb[c*2*half:(c*2+1)*half], tb[(c*2+1)*half:(c+1)*2*half]])
               for c in range(ncalls)]
        mts = [jnp.stack([mt[c*2*half:(c*2+1)*half], mt[(c*2+1)*half:(c+1)*2*half]])
               for c in range(ncalls)]
        def one_dual2(ta_j, tbs=tbs, mts=mts, w_=w, half_=half, ncalls_=ncalls):
            tot = jnp.int32(0)
            for c in range(ncalls_):
                lo = c * 2 * half_
                t2 = jnp.stack([ta_j[lo:lo+half_], ta_j[lo+half_:lo+2*half_]])
                tot = tot + jnp.sum(fl.lanes_batch_final3_dual(
                    t2, tbs[c], 0, 5, 3, 3, 4, mts[c], mts[c], w=w_))
            return tot
        per = slope(chain(one_dual2, 0), ta)
        out[tag + "_dual"] = round(B * L * L / per / 1e9, 1)

        # matching single-call arm (two/four R=8 calls)
        def one_single(ta_j, tb_=tb, mt_=mt, w_=w, half_=half, B_=B):
            tot = jnp.int32(0)
            for lo in range(0, B_, half_):
                tot = tot + jnp.sum(fl.lanes_batch_final3(
                    ta_j[lo:lo+half_], tb_[lo:lo+half_], 0, 5, 3, 3, 4,
                    mt_[lo:lo+half_], mt_[lo:lo+half_], w=w_))
            return tot
        per = slope(chain(one_single, 0), ta)
        out[tag + "_single_tiles"] = round(B * L * L / per / 1e9, 1)
        print(json.dumps(out), flush=True)
    print(json.dumps(out), flush=True)

if __name__ == "__main__":
    main()
