"""Repro: traceback-mode align_pairs on a JITTERED 128-pair chunk (the
serving regime: ~dozens of small buckets per call) — where does the
wall go?  Times each align_pairs phase via phase_seconds, twice."""
import json, time
import numpy as np

def main():
    from globalign_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from globalign_tpu import batch as batch_mod
    from globalign_tpu.config import resolve_scheme

    rng = np.random.default_rng(42)
    pairs = []
    for _ in range(128):
        m = int(rng.integers(800, 1001)); n = int(rng.integers(800, 1001))
        pairs.append(("".join(rng.choice(list("ACGT"), m)),
                      "".join(rng.choice(list("ACGT"), n))))
    scheme = resolve_scheme("".join(p[0] for p in pairs), "".join(p[1] for p in pairs))
    nb = len({(batch_mod.bucket_length(len(a)), batch_mod.bucket_length(len(b))) for a,b in pairs})
    print(json.dumps({"buckets": nb}), flush=True)
    for rep in range(3):
        ph = {}
        t0 = time.perf_counter()
        batch_mod.align_pairs(pairs, scheme=scheme, with_traceback=True, phase_seconds=ph)
        dt = time.perf_counter() - t0
        print(json.dumps({"rep": rep, "total_s": round(dt,2),
                          "phases": {k: round(v,2) for k,v in ph.items()}}), flush=True)

if __name__ == "__main__":
    main()
