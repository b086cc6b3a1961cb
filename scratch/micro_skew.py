"""Pre-skewed token injection A/B on chip (_SKEW_INJECT): drop one of
the 4 per-wave shift1 edge exchanges + the ah ring for per-strip-staged
fills.  Within-run interleaved arms; each arm's chain is traced under
its own toggle state (distinct function objects -> distinct jit cache).

PYTHONPATH=/root/.axon_site:/root/repo python scratch/micro_skew.py
"""
import functools, json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from globalign_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from globalign_tpu.ops import fill_lanes as fl

    rng = np.random.default_rng(11)

    def toks(B, L, A=4):
        ta = np.zeros((B, L + 1), np.int32); ta[:, 1:] = rng.integers(0 if A > 4 else 1, A + (0 if A > 4 else 1), (B, L))
        tb = np.zeros((B, L + 1), np.int32); tb[:, 1:] = rng.integers(0 if A > 4 else 1, A + (0 if A > 4 else 1), (B, L))
        return jnp.asarray(ta), jnp.asarray(tb), jnp.full((B,), L, jnp.int32)

    A25 = 25
    gm = rng.integers(1, 15, (A25 + 1, A25 + 1)).astype(np.int32)
    gm = np.minimum(gm, gm.T); np.fill_diagonal(gm, 0); gm[A25, A25] = 3
    gmj = jnp.asarray(gm)
    bits = int(gm.max()).bit_length()

    cases = {}
    for B, L in ((64, 1024), (32, 4096), (512, 1024)):
        ta, tb, mt = toks(B, L)
        w = fl.lanes_plan(B, L, L)[0]
        cases[f"uni{B}x{L//1024}k_w{w}"] = ("uni", ta, tb, mt, w, B * L * L)
    ta, tb, mt = toks(16, 4096, A25)
    wg = fl.lanes_plan(16, 4096, 4096, asel=A25)[0]
    cases[f"gen16x4k_w{wg}"] = ("gen", ta, tb, mt, wg, 16 * 4096 * 4096)

    def build(kind, tb_, mt_, w_, label):
        if kind == "uni":
            def one(ta_j):
                return jnp.sum(fl.lanes_batch_final3(
                    ta_j, tb_, 0, 5, 3, 3, 4, mt_, mt_, w=w_))
        else:
            def one(ta_j):
                return jnp.sum(fl.lanes_general_final3(
                    ta_j, tb_, gmj, A25, 4, mt_, mt_, w=w_, sub_bits=bits))
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(ta_j, k, _label=label):
            tot = jnp.int32(0)
            for i in range(k):
                tot = tot + one(jnp.roll(ta_j, i, axis=-1).at[..., 0].set(0) + (tot & 0))
            return tot
        return chain

    arms = {}
    sums = {}
    for name, (kind, ta, tb_, mt, w, cells) in cases.items():
        for sk in (False, True):
            fl._SKEW_INJECT = sk
            ch = build(kind, tb_, mt, w, f"{name}_{sk}")
            for k in (2, 12):
                v = int(np.asarray(ch(ta, k)))  # warm/trace under toggle
                sums.setdefault((name, k), set()).add(v)
            arms[(name, sk)] = (ch, ta, cells)
    match = {f"{n}_k{k}": len(v) == 1 for (n, k), v in sums.items()}
    print(json.dumps({"bit_match_totals": all(match.values()),
                      "detail": match}), flush=True)

    best = {key: {2: float("inf"), 12: float("inf")} for key in arms}
    for rep in range(8):
        for key, (ch, ta, cells) in arms.items():
            for k in (2, 12):
                t0 = time.perf_counter()
                np.asarray(ch(ta, k))
                best[key][k] = min(best[key][k], time.perf_counter() - t0)
    out = {"metric": "skew_inject_ab"}
    for name, (kind, ta, tb_, mt, w, cells) in cases.items():
        for sk in (False, True):
            per = (best[(name, sk)][12] - best[(name, sk)][2]) / 10
            out[f"{name}_{'skew' if sk else 'shift'}"] = round(cells / per / 1e9, 1)
    print(json.dumps(out), flush=True)

if __name__ == "__main__":
    main()
