"""Decompose one serving chunk's wall-clock on the dev tunnel: where do
the ~175-250 ms/chunk at 150 bp go?  Times, separately and WITHIN ONE
PROCESS: host tokenize, per-bucket H2D transfers, kernel dispatch,
the coalesced fetch, and a fused single-transfer variant — the data
behind the round-4 serving optimization choice (VERDICT r3 item 6).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_chunk_decompose.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from globalign_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from globalign_tpu import batch as batch_mod
    from globalign_tpu.config import resolve_scheme

    rng = np.random.default_rng(42)
    pairs = []
    for _ in range(128):
        m = int(rng.integers(120, 151))
        n = int(rng.integers(120, 151))
        pairs.append(("".join(rng.choice(list("ACGT"), m)),
                      "".join(rng.choice(list("ACGT"), n))))
    scheme = resolve_scheme(
        "".join(p[0] for p in pairs), "".join(p[1] for p in pairs)
    )

    # Warm (compiles) then time the full align_pairs chunk.
    for _ in range(2):
        batch_mod.align_pairs(pairs, scheme=scheme, with_traceback=False)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        batch_mod.align_pairs(pairs, scheme=scheme, with_traceback=False)
    chunk_s = (time.perf_counter() - t0) / reps
    print(json.dumps({"align_pairs_chunk_ms": round(chunk_s * 1e3, 1)}),
          flush=True)

    # Pieces.
    from globalign_tpu.utils.tokenize import encode_padded

    t0 = time.perf_counter()
    for _ in range(reps):
        toks = [
            (encode_padded(scheme.alphabet, a, 160),
             encode_padded(scheme.alphabet, b, 160))
            for a, b in pairs
        ]
    tok_s = (time.perf_counter() - t0) / reps
    print(json.dumps({"tokenize_ms": round(tok_s * 1e3, 1)}), flush=True)

    # H2D transfer cost: one (128, 161) int32 array, synced.
    arr = np.zeros((128, 161), np.int32)
    for label, sync in (("h2d_async", False), ("h2d_synced", True)):
        t0 = time.perf_counter()
        for i in range(reps):
            arr[0, 0] = i  # defeat any caching
            d = jnp.asarray(arr)
            if sync:
                d.block_until_ready()
        print(json.dumps({f"{label}_ms":
                          round((time.perf_counter() - t0) / reps * 1e3, 1)}),
              flush=True)

    # Fetch cost: one tiny device->host.
    d = jnp.zeros((128, 3), jnp.int32)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(d + 1)
    print(json.dumps({"fetch_ms":
                      round((time.perf_counter() - t0) / reps * 1e3, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
