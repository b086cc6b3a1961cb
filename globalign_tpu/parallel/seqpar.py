"""Sequence parallelism: one pair's DP fill column-sharded across devices.

The engine's primary scaling axis is the independent-pair batch
(:mod:`.mesh`); this module adds the optional second axis from SURVEY.md §5
(long-context row): a SINGLE huge pair whose DP matrix is split into column
strips, one per device, filled as a pipelined wavefront with halo exchange
of strip edges over the interconnect (the "wavefront-with-neighbor-exchange"
pattern playing the context-parallelism role — XLA collectives, no NCCL).

Schedule: seq_2 is split into D contiguous strips (device d owns strip d);
seq_1 is split into row blocks of ``block_rows``.  At super-step t device d
fills row block ``t - d`` of its strip — a skewed pipeline, so all D devices
are busy once the pipe fills (t >= D-1).  After each super-step every device
sends the 3-lane right-edge column of the rows it just filled to its right
neighbor via ``lax.ppermute`` — O(3 * block_rows) ints per step over
ICI/DCN, no per-cell traffic.

Correctness hinges on two fill extensions
(:func:`globalign_tpu.ops.fill_rows.row_fill_impl`):
``col0_full=True`` makes the received edge column a true interior boundary
(all three lanes; the neighbor's Ix chain continues without a fresh
gap-open), and ``want_edge`` streams the strip's own right-edge lanes per
row without materializing planes.  Strip-exactness against the
single-device fill is asserted by tests/test_seqpar.py.

Wall-clock: ceil(m/RB) + D - 1 super-steps of an (RB x n/D) block each —
near-linear speedup in D for m >> RB * D.  Cost-only (tracebacks for huge
pairs go through the checkpointed replay).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fill_rows import row_fill_impl
from ..ops.fill_scan import BIG, default_boundary

STRIP_AXIS = "strips"


def make_strip_mesh(devices=None) -> Mesh:
    """1-D mesh over devices, axis ``strips`` (one column strip each)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (STRIP_AXIS,))


@functools.partial(
    jax.jit, static_argnames=("mesh", "m", "nblocks", "block_rows")
)
def _seqpar_cost_jit(
    mesh,
    tok_a_pad,  # (nblocks*RB + 1,) replicated, 1-origin, padded
    tok_b_strips,  # (D, W+1) one padded 1-origin strip per device
    strip_row0,  # (D, 3, W+1) global row-0 boundary per strip
    n_local,  # (D, 1) true columns per strip
    cost_mat,
    gap_id,
    gap_open,
    m: int,
    nblocks: int,
    block_rows: int,
):
    D = mesh.devices.size
    RB = block_rows
    nsteps = nblocks + D - 1
    gap_open = jnp.asarray(gap_open, jnp.int32)

    def shard_fn(tok_b_s, row0_s, n_local_s):
        d = jax.lax.axis_index(STRIP_AXIS)
        tok_b_local = tok_b_s[0]  # (W+1,)
        row0 = row0_s[0].astype(jnp.int32)  # (3, W+1)
        nloc = n_local_s[0, 0]

        # Device 0's left edge is the true matrix column-0 boundary
        # (depends only on seq_1 / gap costs — computable everywhere).
        _, col0_g = default_boundary(
            tok_a_pad, tok_b_local, cost_mat, gap_id, gap_open
        )
        col0_g = col0_g.astype(jnp.int32)

        def super_step(t, carry):
            state, edges_in, final3 = carry
            b = t - d  # row block this device fills now
            active = (b >= 0) & (b < nblocks)
            bc = jnp.clip(b, 0, nblocks - 1)
            i0 = bc * RB
            rows = jnp.minimum(RB, m - i0)  # true rows in this block

            ta_blk = jax.lax.dynamic_slice(tok_a_pad, (i0,), (RB + 1,))
            ta_blk = ta_blk.at[0].set(0)

            col0_own = jax.lax.dynamic_slice(col0_g, (0, i0), (3, RB + 1))
            col0_blk = jnp.where(d == 0, col0_own, edges_in)

            res = row_fill_impl(
                ta_blk,
                tok_b_local,
                cost_mat,
                gap_id,
                gap_open,
                state,
                col0_blk,
                rows,
                nloc,
                want_moves=False,
                col0_full=True,
                want_edge=True,
                edge_col=nloc,
            )

            new_state = jnp.where(active, res.last3, state)
            final3 = jnp.where(
                active & (b == nblocks - 1), res.final3, final3
            )

            # Right-edge column over this block's rows: local row 0 = the
            # incoming state's edge value (the neighbor's diagonal read at
            # its first row), rows 1..RB from the fill's edge stream.
            edge_out = jnp.concatenate(
                [state[:, nloc][:, None], res.edge.T], axis=1
            )  # (3, RB+1)
            edge_out = jnp.where(
                active, edge_out, jnp.full_like(edge_out, BIG)
            )

            edges_next = jax.lax.ppermute(
                edge_out,
                STRIP_AXIS,
                [(k, (k + 1) % D) for k in range(D)],
            )
            return new_state, edges_next, final3

        carry0 = (
            row0,
            jnp.full((3, RB + 1), BIG, jnp.int32),
            jnp.full((3,), BIG, jnp.int32),
        )
        _, _, final3 = jax.lax.fori_loop(0, nsteps, super_step, carry0)
        # The overall optimum lives on the last device's strip.
        return jnp.where(d == D - 1, final3, jnp.zeros(3, jnp.int32))[None]

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(STRIP_AXIS), P(STRIP_AXIS), P(STRIP_AXIS)),
        out_specs=P(STRIP_AXIS),
        check_vma=False,
    )
    out = fn(tok_b_strips, strip_row0, n_local)  # (D, 3)
    return out[-1]


def sharded_pair_cost(
    mesh: Mesh,
    tok_a_ext,
    tok_b_ext,
    cost_mat,
    gap_id,
    gap_open,
    *,
    block_rows: int = 256,
) -> np.ndarray:
    """Optimal-cost lanes (3,) of ONE pair, column-sharded over ``mesh``.

    Args:
        tok_a_ext / tok_b_ext: (m+1,) / (n+1,) int32 1-origin tokens.
        block_rows: rows per pipeline super-step (pipeline fill latency is
            (D-1) * block_rows rows; halo traffic is 3*(block_rows+1) ints
            per device per step).

    ``min`` of the result is the optimal alignment cost, identical to the
    single-device fill.
    """
    tok_a_np = np.asarray(tok_a_ext, dtype=np.int32)
    tok_b_np = np.asarray(tok_b_ext, dtype=np.int32)
    m = tok_a_np.shape[0] - 1
    n = tok_b_np.shape[0] - 1
    D = mesh.devices.size
    if n < D:
        # Degenerate geometry: fewer columns than devices would collapse
        # the np.linspace strip bounds into zero-width strips.  A pair
        # this small has nothing to parallelize — fill it on one device.
        from ..ops.fill_rows import row_fill

        res = row_fill(
            jnp.asarray(tok_a_np),
            jnp.asarray(tok_b_np),
            jnp.asarray(cost_mat, jnp.int32),
            jnp.asarray(gap_id, jnp.int32),
            jnp.asarray(gap_open, jnp.int32),
            want_moves=False,
        )
        return np.asarray(res.final3)
    RB = max(1, block_rows)
    nblocks = max(1, -(-m // RB))

    tok_a_pad = np.zeros((nblocks * RB + 1,), np.int32)
    tok_a_pad[: m + 1] = tok_a_np

    # Contiguous column strips; strip d owns global columns
    # (c0_d, c0_d + w_d], its local dummy position 0 standing for global
    # column c0_d (the shared edge).
    bounds = np.linspace(0, n, D + 1).astype(np.int64)
    W = int(max(1, (bounds[1:] - bounds[:-1]).max()))
    tok_b_strips = np.zeros((D, W + 1), np.int32)
    n_local = np.zeros((D, 1), np.int32)
    strip_row0 = np.zeros((D, 3, W + 1), np.int32)

    import jax.numpy as _jnp

    row0_g, _ = default_boundary(
        _jnp.asarray(tok_a_np),
        _jnp.asarray(tok_b_np),
        _jnp.asarray(cost_mat, _jnp.int32),
        gap_id,
        jnp.asarray(gap_open, jnp.int32),
    )
    row0_g = np.asarray(row0_g)

    for dd in range(D):
        c0, c1 = int(bounds[dd]), int(bounds[dd + 1])
        w = c1 - c0
        n_local[dd, 0] = w
        tok_b_strips[dd, 1 : w + 1] = tok_b_np[c0 + 1 : c1 + 1]
        strip_row0[dd, :, : w + 1] = row0_g[:, c0 : c1 + 1]
        strip_row0[dd, :, w + 1 :] = BIG

    sharding = NamedSharding(mesh, P(STRIP_AXIS))
    tok_b_d = jax.device_put(jnp.asarray(tok_b_strips), sharding)
    row0_d = jax.device_put(jnp.asarray(strip_row0), sharding)
    nloc_d = jax.device_put(jnp.asarray(n_local), sharding)

    final3 = _seqpar_cost_jit(
        mesh,
        jnp.asarray(tok_a_pad),
        tok_b_d,
        row0_d,
        nloc_d,
        jnp.asarray(cost_mat, jnp.int32),
        jnp.asarray(gap_id, jnp.int32),
        jnp.asarray(gap_open, jnp.int32),
        m,
        nblocks,
        RB,
    )
    return np.asarray(final3)
