"""Data-parallel sharding of the pair batch over a device mesh.

The reference is single-process with no parallelism of any kind (SURVEY.md
§2: no DP/TP/PP, no collectives).  The TPU engine's primary scaling axis is
the *independent-pair batch*: a 1-D ``jax.sharding.Mesh`` over all chips
(ICI within a slice, DCN across slices), the batch axis sharded with
``shard_map``, and XLA collectives (``psum``) merging lightweight statistics.
No per-cell cross-device traffic is required — each pair's DP matrix lives
entirely on one chip (SURVEY.md §3.3).

Multi-host entry: call ``jax.distributed.initialize()`` before building the
mesh; everything below is host-count agnostic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import fill_rows

BATCH_AXIS = "pairs"


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


@functools.partial(jax.jit, static_argnames=("mesh", "use_pallas"))
def _sharded_costs_jit(
    mesh, tok_a, tok_b, cost_mat, gap_id, gap_open, m_true, n_true,
    use_pallas=False,
):
    spec_b = P(BATCH_AXIS)

    def shard_fn(ta, tb, cm, gi, go, mt, nt):
        if use_pallas:
            from ..ops.fill_pallas import batch_final3

            final3 = batch_final3(ta, tb, cm, gi, go, mt, nt)
        else:
            final3 = fill_rows.row_fill_batch(
                ta, tb, cm, gi, go, mt, nt, want_moves=False
            ).final3
        # Exercise the collective path: every shard learns the global count
        # of filled cells (the GCUPS numerator aggregated over ICI/DCN).
        local_cells = jnp.sum(mt.astype(jnp.float32) * nt.astype(jnp.float32))
        total_cells = jax.lax.psum(local_cells, BATCH_AXIS)
        return final3, total_cells

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_b, spec_b, P(), P(), P(), spec_b, spec_b),
        out_specs=(spec_b, P()),
        # pallas_call outputs carry no varying-mesh-axes annotation; skip
        # the vma check rather than thread it through the kernels.
        check_vma=False,
    )
    return fn(tok_a, tok_b, cost_mat, gap_id, gap_open, m_true, n_true)


def sharded_fill_costs(
    mesh: Mesh,
    tok_a: np.ndarray,
    tok_b: np.ndarray,
    cost_mat,
    gap_id,
    gap_open,
    m_true: np.ndarray,
    n_true: np.ndarray,
) -> np.ndarray:
    """Cost-only batched fill, batch axis sharded across ``mesh``.

    Returns (B, 3) final DP values per pair (host numpy, pad rows dropped).
    """
    batch = tok_a.shape[0]
    (tok_a, tok_b, m_true, n_true), padded = pad_batch_to_mesh(
        (tok_a, tok_b, m_true, n_true), batch, mesh
    )

    sharding = NamedSharding(mesh, P(BATCH_AXIS))
    tok_a = jax.device_put(jnp.asarray(tok_a), sharding)
    tok_b = jax.device_put(jnp.asarray(tok_b), sharding)
    m_d = jax.device_put(jnp.asarray(m_true), sharding)
    n_d = jax.device_put(jnp.asarray(n_true), sharding)

    use_pallas = jax.devices()[0].platform not in ("cpu",)
    final3, _total_cells = _sharded_costs_jit(
        mesh, tok_a, tok_b, jnp.asarray(cost_mat), jnp.asarray(gap_id),
        jnp.asarray(gap_open), m_d, n_d, use_pallas=use_pallas,
    )
    return np.asarray(final3)[:batch]
