"""Data-parallel sharding of the pair batch over a device mesh.

The reference is single-process with no parallelism of any kind (SURVEY.md
§2: no DP/TP/PP, no collectives).  The TPU engine's primary scaling axis is
the *independent-pair batch*: a 1-D ``jax.sharding.Mesh`` over all chips
(ICI within a slice, DCN across slices), the batch axis sharded with
``shard_map``, per-pair score vectors merged with ``lax.all_gather`` (and
global cell counts with ``psum``) so every host holds the full result.
No per-cell cross-device traffic is required — each pair's DP matrix lives
entirely on one chip (SURVEY.md §3.3).

Multi-host entry: :func:`globalign_tpu.parallel.multihost.initialize`
before building the mesh; everything below is host-count agnostic (inputs
go through ``jax.make_array_from_callback``, outputs come back replicated).
Exercised by the 2-process CPU harness in tests/test_multihost.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import fill_rows

BATCH_AXIS = "pairs"


def _put(a, sharding) -> jax.Array:
    """Host array -> device array under ``sharding``; works identically in
    single- and multi-host runs (each process materializes only the shards
    of its addressable devices from the host-replicated full batch)."""
    a = np.asarray(a)
    return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])


def make_pair_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, batch axis ``pairs``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def pad_batch_to_mesh(arrays, batch: int, mesh: Mesh) -> tuple[list, int]:
    """Pad every array's leading axis to a multiple of the mesh size.

    Padding replicates row 0 (a valid pair — results for pad rows are simply
    dropped by the caller).  Returns (padded_arrays, padded_batch).
    """
    size = mesh.devices.size
    padded = -(-batch // size) * size
    if padded == batch:
        return list(arrays), batch
    out = []
    for a in arrays:
        pad = np.broadcast_to(a[:1], (padded - batch,) + a.shape[1:])
        out.append(np.concatenate([a, pad], axis=0))
    return out, padded


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "use_pallas", "uniform", "gap_open_static", "general_plan",
        "sub_bits", "interpret",
    ),
)
def _sharded_costs_jit(
    mesh, tok_a, tok_b, cost_mat, gap_id, gap_open, m_true, n_true,
    use_pallas=False, uniform=None, gap_open_static=None, general_plan=None,
    sub_bits=0, interpret=False,
):
    spec_b = P(BATCH_AXIS)

    def shard_fn(ta, tb, cm, gi, go, mt, nt):
        if use_pallas and general_plan is not None:
            # GENERAL matrices on the lane kernel: the host resolved
            # the plan AND the substitution mode (``sub_bits``)
            # statically — ``cm`` is a tracer here, so sub_bits_for(cm)
            # would silently answer 0 and the bitmask mode could never
            # engage; cm/gi/go ride through as tracers — only the
            # alphabet size (the matrix shape) must be static.
            from ..ops import fill_lanes
            from ..ops.fill_pallas import _tile_slice

            w, tile_l = general_plan
            Bl = ta.shape[0]
            outs = []
            for lo in range(0, Bl, tile_l):
                hi = min(lo + tile_l, Bl)
                tat, tbt, mtt, ntt = _tile_slice(
                    (ta, tb, mt, nt), lo, hi, tile_l
                )
                vals = fill_lanes.lanes_general_final3(
                    tat, tbt, cm, gi, go, mtt, ntt, w=w,
                    sub_bits=sub_bits, interpret=interpret,
                )
                outs.append(vals[: hi - lo])
            final3 = jnp.concatenate(outs, axis=0)
        elif use_pallas:
            from ..ops.fill_pallas import batch_final3

            # cm/gi/go are tracers here, so the uniform-scheme dispatch is
            # resolved by the HOST (sharded_fill_costs) and arrives static.
            final3 = batch_final3(
                ta, tb, cm, gi, go, mt, nt, uniform=uniform,
                gap_open_static=gap_open_static, interpret=interpret,
            )
        else:
            final3 = fill_rows.row_fill_batch(
                ta, tb, cm, gi, go, mt, nt, want_moves=False
            ).final3
        # Collective merge (SURVEY.md §2 new-component row 5): every shard
        # gathers the full per-pair score vector over ICI/DCN, so the
        # result is replicated and every HOST can read all pairs without
        # fetching another host's shards — this is what makes the
        # multi-host path work (a process may only read addressable
        # shards).  Traffic is B x 3 ints — negligible next to the fills.
        gathered = jax.lax.all_gather(final3, BATCH_AXIS, axis=0, tiled=True)
        local_cells = jnp.sum(mt.astype(jnp.float32) * nt.astype(jnp.float32))
        total_cells = jax.lax.psum(local_cells, BATCH_AXIS)
        return gathered, total_cells

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_b, spec_b, P(), P(), P(), spec_b, spec_b),
        out_specs=(P(), P()),
        # pallas_call outputs carry no varying-mesh-axes annotation; skip
        # the vma check rather than thread it through the kernels.
        check_vma=False,
    )
    return fn(tok_a, tok_b, cost_mat, gap_id, gap_open, m_true, n_true)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "use_pallas", "uniform", "gap_open_static", "general_plan",
        "sub_bits", "interpret",
    ),
)
def _sharded_moves_jit(
    mesh, tok_a, tok_b, cost_mat, gap_id, gap_open, m_true, n_true,
    use_pallas=False, uniform=None, gap_open_static=None, general_plan=None,
    sub_bits=0, interpret=False,
):
    spec_b = P(BATCH_AXIS)

    def shard_fn(ta, tb, cm, gi, go, mt, nt):
        Bl = ta.shape[0]
        n = tb.shape[1] - 1
        # Uniform schemes (host-resolved statics, like the cost path)
        # and general matrices (host-resolved ``general_plan``) ride the
        # moves-emitting lane kernel; the SKEWED uint8 buffers come back
        # per tile — the host unskews addressable shards with the
        # identical lanes_plan (both sides recompute it from the padded
        # shapes alone).
        plan = general_plan
        if (
            plan is None
            and use_pallas
            and uniform is not None
            and gap_open_static is not None
        ):
            from ..ops import fill_lanes

            plan = fill_lanes.lanes_plan(
                Bl, ta.shape[1] - 1, n, moves=True
            )
        if plan is not None:
            from ..ops import fill_lanes
            from ..ops.fill_pallas import _tile_slice

            w, tile_l = plan
            finals, movess = [], []
            for lo in range(0, Bl, tile_l):
                hi = min(lo + tile_l, Bl)
                tat, tbt, mtt, ntt = _tile_slice(
                    (ta, tb, mt, nt), lo, hi, tile_l
                )
                if general_plan is not None:
                    # sub_bits is host-resolved static (cm is a tracer
                    # here — see _sharded_costs_jit).
                    vals, mv = fill_lanes.lanes_general_moves(
                        tat, tbt, cm, gi, go, mtt, ntt, w=w,
                        sub_bits=sub_bits, interpret=interpret,
                    )
                else:
                    cma, cmm, dco, ico = (int(v) for v in uniform)
                    vals, mv = fill_lanes.lanes_batch_moves(
                        tat, tbt, cma, cmm, dco, ico, gap_open_static,
                        mtt, ntt, w=w, interpret=interpret,
                    )
                finals.append(vals[: hi - lo])
                movess.append(mv[None])
            final3 = jnp.concatenate(finals, axis=0)
            # Peak HBM holds every tile's skewed buffer at once.  The
            # host dispatcher (sharded_fill_moves) bounds the TOTAL
            # across tiles by the same guards lanes_plan applies per
            # tile (skewed <= MOVES_BYTES_INFLATION_CAP x the row-major
            # batch, or below MOVES_BYTES_ABS_FLOOR outright) — when the
            # whole-shard total exceeds both, plan arrives None and this
            # branch is not taken.
            moves = jnp.concatenate(movess, axis=0)  # (T, Gw, R, 128)
            gathered = jax.lax.all_gather(
                final3, BATCH_AXIS, axis=0, tiled=True
            )
            return gathered, moves

        tile = 0
        if use_pallas:
            from ..ops.fill_pallas import _stacked_tile_size

            tile = _stacked_tile_size(Bl, n, cm.shape[0], moves=True)
        if tile:
            from ..ops.fill_pallas import stacked_fill_with_moves

            from ..ops.fill_pallas import _tile_slice

            finals, movess = [], []
            for lo in range(0, Bl, tile):
                hi = min(lo + tile, Bl)
                tat, tbt, mtt, ntt = _tile_slice(
                    (ta, tb, mt, nt), lo, hi, tile
                )
                last, moves = stacked_fill_with_moves(
                    tat, tbt, cm, gi, go, mtt, ntt, interpret=interpret
                )
                idx = ntt[:, None, None]
                vals = jnp.take_along_axis(last, idx, axis=2)[:, :, 0]
                finals.append(vals[: hi - lo])
                movess.append(moves[: hi - lo])
            final3 = jnp.concatenate(finals, axis=0)
            moves = jnp.concatenate(movess, axis=0)
        else:
            res = fill_rows.row_fill_batch(
                ta, tb, cm, gi, go, mt, nt, want_moves=True
            )
            final3 = res.final3
            moves = res.moves
        # Final lanes are tiny — gather them so every host reads all pairs;
        # move matrices are O(m*n) per pair and stay SHARDED across the
        # mesh's devices (the host fetch below reads them shard-wise).
        gathered = jax.lax.all_gather(final3, BATCH_AXIS, axis=0, tiled=True)
        return gathered, moves

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_b, spec_b, P(), P(), P(), spec_b, spec_b),
        out_specs=(P(), spec_b),
        check_vma=False,
    )
    return fn(tok_a, tok_b, cost_mat, gap_id, gap_open, m_true, n_true)


def sharded_fill_moves(
    mesh: Mesh,
    tok_a: np.ndarray,
    tok_b: np.ndarray,
    cost_mat,
    gap_id,
    gap_open,
    m_true: np.ndarray,
    n_true: np.ndarray,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Traceback-capable batched fill, batch axis sharded across ``mesh``.

    ``use_pallas`` overrides the platform auto-detection; with
    ``interpret=True`` the lane kernels run in Pallas interpret mode —
    together they let the CPU virtual mesh execute the REAL kernels
    (tests), not just stubbed dispatch plumbing.

    Returns ``(final3 (B, 3), moves (B, M+1, W))`` host numpy, pad rows
    dropped — the same contract as :func:`..ops.fill_pallas.batch_moves`
    (W is the backend's padded move-row width, >= N+1; layout "row").
    Lifts the round-1 cost-only restriction on sharded batches: a
    production many-pair run with tracebacks now uses every chip.

    Requires a PROCESS-LOCAL mesh: the O(m*n) move matrices stay sharded
    on device and the host fetch can only read addressable shards.
    Multi-host runs shard *chunks* over processes (runner + multihost)
    and give each process a mesh over its local devices — exactly what
    ``batch_cli --distributed --shard`` does.
    """
    if any(
        d.process_index != jax.process_index()
        for d in mesh.devices.flat
    ):
        raise ValueError(
            "sharded_fill_moves needs a process-local mesh (the sharded "
            "move matrices are fetched to THIS host); multi-host runs "
            "split chunks over processes and use a local mesh per host "
            "(see globalign_tpu.parallel.multihost)."
        )
    batch = tok_a.shape[0]
    (tok_a, tok_b, m_true, n_true), padded = pad_batch_to_mesh(
        (tok_a, tok_b, m_true, n_true), batch, mesh
    )
    sharding = NamedSharding(mesh, P(BATCH_AXIS))

    if use_pallas is None:
        use_pallas = jax.devices()[0].platform not in ("cpu",)
    # Resolve the uniform-scheme dispatch on the host (shard_fn sees
    # tracers) — identical to the cost path; general matrices resolve
    # the lane plan the same way (chip-validated select-chain mode).
    uniform = None
    plan = None
    general_plan = None
    gkey = None
    sub_bits = 0
    A = 0
    D = mesh.devices.size
    Bl = tok_a.shape[0] // D
    m_pad = tok_a.shape[1] - 1
    n_pad = tok_b.shape[1] - 1
    cost_np = np.asarray(cost_mat)
    if use_pallas:
        from ..ops import fill_lanes
        from ..ops.fill_pallas import uniform_scheme_params

        uniform = uniform_scheme_params(cost_np, int(gap_id))
        A = int(cost_np.shape[0])
        if uniform is not None:
            plan = fill_lanes.lanes_plan(Bl, m_pad, n_pad, moves=True)
        elif fill_lanes.lanes_alphabet_ok(A, cost_np):
            # Resolve the substitution mode HERE (the shard body sees a
            # traced matrix); the MOVES plan depends on it (bitmask
            # admits w=64), and the per-shape bitmask latch can
            # downgrade it — re-plan once if so.  Alphabets 27-31 are
            # only lane-eligible in bitmask mode.
            sub_bits = fill_lanes.sub_bits_for(cost_np)
            plan = fill_lanes.lanes_plan(
                Bl, m_pad, n_pad, moves=True, asel=A, sub_bits=sub_bits
            )
            if plan is not None:
                gkey = fill_lanes.general_lanes_key(
                    plan[1], m_pad, n_pad, plan[0], A, moves=True
                )
                sb2 = fill_lanes.dispatch_sub_bits(cost_np, gkey)
                if sb2 != sub_bits:
                    sub_bits = sb2
                    plan = fill_lanes.lanes_plan(
                        Bl, m_pad, n_pad, moves=True, asel=A,
                        sub_bits=sub_bits,
                    )
                    if plan is not None:
                        gkey = fill_lanes.general_lanes_key(
                            plan[1], m_pad, n_pad, plan[0], A, moves=True
                        )
                if plan is not None and not fill_lanes.general_lanes_ok(
                    gkey
                ):
                    plan = None
            if plan is not None and (
                A > fill_lanes.LANES_MAX_ALPHABET and sub_bits == 0
            ):
                plan = None
        if plan is not None:
            # lanes_plan guards skewed-buffer inflation PER TILE;
            # inside the shard body every tile's buffer is live at
            # once, so re-apply the same guards to the whole-shard
            # total — peak HBM stays within the documented bound
            # (<= MOVES_BYTES_INFLATION_CAP x row-major, or under
            # the absolute floor) on the lane path too.
            w_p, tile_p = plan
            T = -(-Bl // tile_p)
            total_skewed = T * fill_lanes.lanes_moves_bytes(
                tile_p, m_pad, n_pad, w_p
            )
            row_major = Bl * (m_pad + 1) * (n_pad + 1)
            if (
                total_skewed
                > fill_lanes.MOVES_BYTES_INFLATION_CAP * row_major
                and total_skewed > fill_lanes.MOVES_BYTES_ABS_FLOOR
            ):
                plan = None
        if uniform is None:
            general_plan = plan

    def _run(plan_, general_plan_, sub_bits_):
        return _sharded_moves_jit(
            mesh,
            _put(tok_a, sharding),
            _put(tok_b, sharding),
            jnp.asarray(cost_mat),
            jnp.asarray(gap_id),
            jnp.asarray(gap_open),
            _put(np.asarray(m_true, np.int32), sharding),
            _put(np.asarray(n_true, np.int32), sharding),
            use_pallas=use_pallas,
            uniform=uniform if plan_ is not None else None,
            gap_open_static=(
                int(gap_open)
                if plan_ is not None and uniform is not None
                else None
            ),
            general_plan=general_plan_,
            sub_bits=sub_bits_,
            interpret=interpret,
        )

    try:
        final3, moves = _run(plan, general_plan, sub_bits)
        final3 = np.asarray(final3)[:batch]
    except Exception:  # pragma: no cover - backend-specific
        if general_plan is None:
            raise
        from ..ops import fill_lanes

        fill_lanes.mark_general_lanes_failed(gkey, sub_bits=sub_bits)
        if sub_bits > 0 and A <= fill_lanes.LANES_MAX_ALPHABET:
            # Bitmask rejection: retry the chip-validated select chain
            # for this call before giving the shape up to the scan
            # kernels (mark bitmask-latched the class above).
            try:
                final3, moves = _run(plan, general_plan, 0)
                final3 = np.asarray(final3)[:batch]
            except Exception:
                fill_lanes.mark_general_lanes_failed(gkey)
                plan = None
                general_plan = None
                final3, moves = _run(None, None, 0)
                final3 = np.asarray(final3)[:batch]
        else:
            plan = None
            general_plan = None
            final3, moves = _run(None, None, 0)
            final3 = np.asarray(final3)[:batch]
    if plan is not None:
        # Lane-kernel moves arrive SKEWED, one (Gw, R, 128) uint8 buffer
        # per tile per shard (leading axis sharded).  Unskew each tile
        # on the host and reassemble the per-pair row-major layout.
        from ..ops import fill_lanes

        w, tile_l = plan
        T = -(-Bl // tile_l)
        mv = np.asarray(moves)  # (D*T, Gw, R, 128)
        shards = []
        for s in range(D):
            rows = [
                fill_lanes.lanes_moves_to_row(
                    mv[s * T + t], tile_l, n_pad, w, m_pad
                )
                for t in range(T)
            ]
            shards.append(np.concatenate(rows, axis=0)[:Bl])
        return final3, np.concatenate(shards, axis=0)[:batch]
    return final3, np.asarray(moves)[:batch]


def sharded_fill_costs(
    mesh: Mesh,
    tok_a: np.ndarray,
    tok_b: np.ndarray,
    cost_mat,
    gap_id,
    gap_open,
    m_true: np.ndarray,
    n_true: np.ndarray,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> np.ndarray:
    """Cost-only batched fill, batch axis sharded across ``mesh``.

    Returns (B, 3) final DP values per pair (host numpy, pad rows dropped).
    ``use_pallas``/``interpret`` as in :func:`sharded_fill_moves` (the
    CPU virtual mesh runs the real kernels in interpret mode).
    """
    batch = tok_a.shape[0]
    (tok_a, tok_b, m_true, n_true), padded = pad_batch_to_mesh(
        (tok_a, tok_b, m_true, n_true), batch, mesh
    )

    sharding = NamedSharding(mesh, P(BATCH_AXIS))

    tok_a = _put(tok_a, sharding)
    tok_b = _put(tok_b, sharding)
    m_d = _put(np.asarray(m_true, np.int32), sharding)
    n_d = _put(np.asarray(n_true, np.int32), sharding)

    if use_pallas is None:
        use_pallas = jax.devices()[0].platform not in ("cpu",)
    # The uniform-scheme kernel dispatch needs a CONCRETE matrix; resolve
    # it here (host) and ship the result through the jit statically, since
    # inside shard_map the matrix is a tracer and detection must decline.
    # General matrices resolve the lane plan the same way (round-2's
    # uniform-only host-resolved-static pattern, extended now that the
    # select-chain mode is chip-validated).
    uniform = None
    general_plan = None
    gkey = None
    sub_bits = 0
    A = 0
    cost_np = np.asarray(cost_mat)
    if use_pallas:
        from ..ops.fill_pallas import uniform_scheme_params

        uniform = uniform_scheme_params(cost_np, int(gap_id))
        if uniform is None:
            from ..ops import fill_lanes

            A = int(cost_np.shape[0])
            if fill_lanes.lanes_alphabet_ok(A, cost_np):
                Bl = tok_a.shape[0] // mesh.devices.size
                m_pad = tok_a.shape[1] - 1
                n_pad = tok_b.shape[1] - 1
                plan = fill_lanes.lanes_plan(Bl, m_pad, n_pad, asel=A)
                if plan is not None:
                    gkey = fill_lanes.general_lanes_key(
                        plan[1], m_pad, n_pad, plan[0], A
                    )
                    if fill_lanes.general_lanes_ok(gkey):
                        # Host-resolved substitution mode (the shard
                        # body sees a traced matrix); 27-31 alphabets
                        # need the bitmask — decline if it latched.
                        sub_bits = fill_lanes.dispatch_sub_bits(
                            cost_np, gkey
                        )
                        if (
                            A <= fill_lanes.LANES_MAX_ALPHABET
                            or sub_bits > 0
                        ):
                            general_plan = plan

    def _run(general_plan_, sub_bits_):
        return _sharded_costs_jit(
            mesh, tok_a, tok_b, jnp.asarray(cost_mat), jnp.asarray(gap_id),
            jnp.asarray(gap_open), m_d, n_d, use_pallas=use_pallas,
            uniform=uniform,
            gap_open_static=int(gap_open) if uniform is not None else None,
            general_plan=general_plan_,
            sub_bits=sub_bits_,
            interpret=interpret,
        )

    try:
        final3, _total_cells = _run(general_plan, sub_bits)
        return np.asarray(final3)[:batch]
    except Exception:  # pragma: no cover - backend-specific
        if general_plan is None:
            raise
        # Latch the failing shape and rebuild — select chain first when
        # only the bitmask mode failed, the scan kernels otherwise.
        from ..ops import fill_lanes

        fill_lanes.mark_general_lanes_failed(gkey, sub_bits=sub_bits)
        if sub_bits > 0 and A <= fill_lanes.LANES_MAX_ALPHABET:
            try:
                final3, _total_cells = _run(general_plan, 0)
                return np.asarray(final3)[:batch]
            except Exception:
                fill_lanes.mark_general_lanes_failed(gkey)
    final3, _total_cells = _run(None, 0)
    return np.asarray(final3)[:batch]
