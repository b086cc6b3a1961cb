"""Per-bucket serial timing of the walked traceback path: dispatch each
bucket then fetch its counts immediately (syncs); prints the per-bucket
wall distribution."""
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

    prepped = []
    for (M, N), idxs in buckets.items():
        ta = np.stack([encode_padded(scheme.alphabet, pairs[i][0], M) for i in idxs])
        tb = np.stack([encode_padded(scheme.alphabet, pairs[i][1], N) for i in idxs])
        mt = np.array([len(pairs[i][0]) for i in idxs], np.int32)
        nt = np.array([len(pairs[i][1]) for i in idxs], np.int32)
        prepped.append((M, N, ta, tb, mt, nt))

    for rep in range(2):
        ts = []
        t00 = time.perf_counter()
        for M, N, ta, tb, mt, nt in prepped:
            t0 = time.perf_counter()
            wk = batch_mod._lanes_walked_traceback(ta, tb, cost_mat, gid, go, mt, nt)
            np.asarray(wk[2])  # counts fetch syncs this bucket
            ts.append(round((time.perf_counter() - t0) * 1e3, 1))
        total = time.perf_counter() - t00
        ts_sorted = sorted(ts)
        print(json.dumps({"rep": rep, "total_s": round(total, 2),
                          "per_bucket_ms": {"min": ts_sorted[0], "med": ts_sorted[len(ts)//2],
                                             "max": ts_sorted[-1]},
                          "all": ts}), flush=True)

if __name__ == "__main__":
    main()
