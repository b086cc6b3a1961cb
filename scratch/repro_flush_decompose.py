"""Decompose the jittered-chunk traceback flush: dispatch, per-array
fetch, render — manual replication of align_pairs' walked path."""
import json, time
import numpy as np

def main():
    import jax.numpy as jnp
    from globalign_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from globalign_tpu import batch as batch_mod
    from globalign_tpu.config import resolve_scheme
    from globalign_tpu.utils.tokenize import encode_padded

    rng = np.random.default_rng(42)
    pairs = []
    for _ in range(128):
        m = int(rng.integers(800, 1001)); n = int(rng.integers(800, 1001))
        pairs.append(("".join(rng.choice(list("ACGT"), m)),
                      "".join(rng.choice(list("ACGT"), n))))
    scheme = resolve_scheme("".join(p[0] for p in pairs), "".join(p[1] for p in pairs))
    cost_mat = jnp.asarray(scheme.costing.values, jnp.int32)
    gid = jnp.int32(scheme.alphabet.gap_id); go = jnp.int32(scheme.gap_open_cost)

    buckets = {}
    for idx, (s1, s2) in enumerate(pairs):
        key = (batch_mod.bucket_length(len(s1)), batch_mod.bucket_length(len(s2)))
        buckets.setdefault(key, []).append(idx)
    print(json.dumps({"buckets": len(buckets)}), flush=True)

    def run():
        t0 = time.perf_counter()
        walked = []
        for (M, N), idxs in buckets.items():
            ta = np.stack([encode_padded(scheme.alphabet, pairs[i][0], M) for i in idxs])
            tb = np.stack([encode_padded(scheme.alphabet, pairs[i][1], N) for i in idxs])
            mt = np.array([len(pairs[i][0]) for i in idxs], np.int32)
            nt = np.array([len(pairs[i][1]) for i in idxs], np.int32)
            wk = batch_mod._lanes_walked_traceback(ta, tb, cost_mat, gid, go, mt, nt)
            walked.append(wk)
        t1 = time.perf_counter()
        vals = np.asarray(jnp.concatenate([w[0] for w in walked], axis=0))
        t2 = time.perf_counter()
        tapes = np.asarray(jnp.concatenate([w[1].reshape(-1) for w in walked]))
        t3 = time.perf_counter()
        counts = np.asarray(jnp.concatenate([w[2] for w in walked]))
        jx = np.asarray(jnp.concatenate([w[3] for w in walked]))
        t4 = time.perf_counter()
        return {"dispatch_s": round(t1-t0,2), "fetch_vals_s": round(t2-t1,2),
                "fetch_tapes_s": round(t3-t2,2), "fetch_rest_s": round(t4-t3,2)}

    for rep in range(3):
        print(json.dumps({"rep": rep, **run()}), flush=True)

if __name__ == "__main__":
    main()
