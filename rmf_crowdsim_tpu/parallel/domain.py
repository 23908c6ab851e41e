"""Spatial domain decomposition of the fused force kernel.

The scaling dimension of a crowd sim is agent count / world area
(SURVEY.md §5: the TPU-native analog of sequence/context parallelism is
domain decomposition).  The bucketed supertile layout of
ops/zanlungo_pallas.py shards naturally: the packed feature array is a
[NUM_F, tx*ty*bucket] grid of world *columns*, so

- each device owns a contiguous block of ``tx / D`` supertile columns;
- the only remote data a device needs is ONE halo column from each
  neighbor (eyesight <= tile_size), exchanged with ``jax.lax.ppermute``
  over ICI — the crowd-sim analog of ring attention's block passing;
- the unchanged Pallas kernel then runs on the local block extended with
  the two halo columns, and the halo queries' outputs are discarded.

Per-step remote traffic per device: 2 columns x ty x bucket x NUM_F x 4 B
(a few hundred KB at 1M agents over 8 devices) versus the all-gather of
the full agent state that plain agent-sharding needs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.zanlungo_pallas import (
    BucketConfig,
    bucketize,
    sentinel_rows,
    zanlungo_forces_bucketed,
    zparams5,
)

WORLD_AXIS = "world_x"


def _sentinel_block(col_slots: int):
    return sentinel_rows(col_slots)


def forces_domain_sharded(mesh: Mesh, cfg: BucketConfig, zparams4, packed_t,
                          interpret: bool = False, int_prio: bool = False,
                          dual_row: bool = False):
    """Run the fused force kernel with the world sharded over
    ``mesh[WORLD_AXIS]``.  ``cfg.tx`` must divide by the mesh size.
    Returns [slots, 2] velocities (sharded over slots)."""
    d = mesh.shape[WORLD_AXIS]
    assert cfg.tx % d == 0, f"tx={cfg.tx} must divide over {d} devices"
    cols_per = cfg.tx // d
    col_slots = cfg.ty * cfg.bucket
    local_cfg = dataclasses.replace(cfg, tx=cols_per + 2)
    sentinel = _sentinel_block(col_slots)

    def local(z4, block):  # block: [cols_per * col_slots, NUM_F]
        i = jax.lax.axis_index(WORLD_AXIS)
        # Halo exchange: my last column -> right neighbor (their left
        # halo), my first column -> left neighbor (their right halo).
        # Devices with no sender receive zeros; overwrite with sentinels
        # (zeros would read as live agents at the origin).
        left = jax.lax.ppermute(
            block[-col_slots:], WORLD_AXIS,
            [(k, k + 1) for k in range(d - 1)],
        )
        right = jax.lax.ppermute(
            block[:col_slots], WORLD_AXIS,
            [(k + 1, k) for k in range(d - 1)],
        )
        left = jnp.where(i == 0, sentinel, left)
        right = jnp.where(i == d - 1, sentinel, right)
        ext = jnp.concatenate([left, block, right], axis=0)
        out_ext = zanlungo_forces_bucketed(local_cfg, z4, ext,
                                           interpret=interpret,
                                           int_prio=int_prio,
                                           dual_row=dual_row)
        # Drop the halo columns' (wasted) query outputs.
        return out_ext[col_slots:col_slots + cols_per * col_slots]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(WORLD_AXIS, None)),
        out_specs=P(WORLD_AXIS, None),
        check_vma=False,
    )
    return fn(zparams4.astype(jnp.float32), packed_t)


def zanlungo_fused_domain(mesh: Mesh, cfg: BucketConfig, zp, position,
                          velocity, self_pref, pref_committed, priority,
                          eyesight, alive, rec_vel, interpret: bool = False,
                          int_prio: bool = False, dual_row: bool = False):
    """Domain-sharded version of ops.zanlungo_pallas.zanlungo_fused: same
    signature + mesh; same results."""
    dtype = position.dtype
    # packed_T is unused here: each shard re-derives its own extended
    # plane (halo concat) inside shard_map, so the kernel's transpose
    # fallback runs on the shard-local ext block.
    packed_t, _packed_T, bucket_pos, max_occ, dropped = bucketize(
        cfg, position, velocity, pref_committed, self_pref, priority,
        eyesight, rec_vel, alive,
    )
    zparams4 = zparams5(zp)
    out = forces_domain_sharded(mesh, cfg, zparams4, packed_t,
                                int_prio=int_prio, dual_row=dual_row,
                                interpret=interpret)
    safe = jnp.clip(bucket_pos, 0, cfg.slots - 1)
    ok = (bucket_pos < cfg.slots) & alive
    vel = out[safe].astype(dtype)
    return jnp.where(ok[:, None], vel, rec_vel), max_occ, dropped
