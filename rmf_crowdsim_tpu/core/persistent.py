"""Persistent bucket-native rollout: skin rebinning for closed scenes.

The general step re-bucketizes every step (sort + gather + pack), although
agents move centimeters per step while supertiles span meters.  For closed
scenes (fixed population, slot-pure planners, Zanlungo forces) this
rollout keeps the *bucketed* array as the resident state:

- integration / planner passes are elementwise column updates on
  ``packed_t [slots, NUM_F]`` — no sort, no gather, no scatter;
- the layout is rebuilt (a slot-space re-bucketize, reusing
  ops/zanlungo_pallas.bucketize + the MXU pack kernel) only when some
  agent's displacement since the last rebin exceeds the *skin*
  ``(tile_size - max_eyesight) / 2`` — the classic MD neighbor-list
  criterion.

Exactness: a candidate window reaches one tile (>= tile_size) beyond the
query's rebin-time tile.  For current-position neighbors within
``eyesight`` to always be covered, drift_q + drift_c + eyesight <=
tile_size suffices; rebinning at per-agent drift > skin enforces it.  So
trajectories are bitwise-identical to rebinning every step (tested).

Scope (round 1): closed worlds — no SourceSinks, fixed alive set; HL
planners must implement ``plan_slots(params, packed) -> rec [slots, 2]``
(ConstantVelocity and ParityVelocity do).  The general step remains the
full-featured path.

Measured reality check (1M agents, v5e): the win is real only when
per-step drift is far below the skin.  With force-kicked agents moving
~10 m/s (force_cap 20, dt 1/60) rebins fire every ~2 steps and the
slot-space rebin (1.8M rows) costs more than the general step's
agent-space one — 250 ms/step vs 181.  At physical walking speeds
(~1.5 m/s, drift ~0.025 m/step, skin 1.65 m) rebins drop to ~1 per 60+
steps and the step collapses to the force kernel (~140 ms at 1M).
Choose per scene.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.zanlungo_pallas import (
    NUM_F,
    ROW_ID,
    ROW_PX,
    ROW_PY,
    ROW_RX,
    ROW_SPX,
    BucketConfig,
    bucketize,
    zanlungo_forces_bucketed,
)
from .config import SimConfig
from .state import SimState

ROW_UID = 14  # bucketize's `extra` column


@struct.dataclass
class PersistentCarry:
    packed: jax.Array       # [slots, NUM_F] f32 — THE resident state
    anchor: jax.Array       # [slots, 2] positions at last rebin
    agent_slot: jax.Array   # [N] int32 — agent row -> current slot
    sim_time: jax.Array     # []
    n_rebins: jax.Array     # [] int32
    max_occ: jax.Array      # [] int32 — worst tile occupancy seen
    dropped: jax.Array      # [] int32 — agents lost to bucket/pack
    #                         overflow across all rebins (silent physics
    #                         truncation; callers must surface nonzero)


def _rebin_from_slots(cfg: BucketConfig, packed, agent_slot,
                      use_pack_kernel: bool, interpret: bool):
    """Re-bucketize using the slot rows themselves as the agent list.
    Slot ids stay unique (old slot index becomes the new ROW_ID), and the
    agent->slot map is composed through the move."""
    slots = cfg.slots
    alive = packed[:, ROW_ID] >= 0.0
    new_packed, move, occ, dropped = bucketize(
        cfg,
        packed[:, ROW_PX:ROW_PX + 2],
        packed[:, 2:4],            # velocity
        packed[:, 4:6],            # committed pref (what neighbors see)
        packed[:, ROW_SPX:ROW_SPX + 2],
        packed[:, 6],              # priority
        packed[:, 7],              # eyesight
        packed[:, ROW_RX:ROW_RX + 2],
        alive,
        use_pack_kernel=use_pack_kernel,
        interpret=interpret,
        extra=packed[:, ROW_UID],
    )
    new_agent_slot = move[jnp.clip(agent_slot, 0, slots - 1)]
    return new_packed, new_agent_slot, occ, dropped


def build_persistent_rollout(config: SimConfig, hl_planner: Any,
                             zanlungo: Any):
    """``rollout(params_hl, params_z, state0, dt, n_steps) ->
    (SimState, info)`` — the bucket-native fast path.

    ``state0`` is a standard SimState (closed scene); the result SimState
    carries the final positions/velocities in agent order.
    """
    from ..ops.zanlungo_pallas import BucketConfig as _BC

    assert config.grid is not None
    bucket_cfg = _BC.create(
        config.grid.width, config.grid.height, config.grid.offset,
        config.max_eyesight, bucket=config.bucket_capacity,
        strip_tiles=config.strip_tiles, sub_tiles=config.sub_tiles,
        tile_size=config.bucket_tile_size or None,
    )
    skin = (bucket_cfg.tile_size - config.max_eyesight) / 2.0
    assert skin > 0, (
        "persistent rollout needs tile_size > max_eyesight (set "
        "SimConfig.bucket_tile_size) so a rebin skin exists"
    )
    interp = config.pallas_interpret
    use_pack = config.use_pack_kernel

    def init_carry(state: SimState) -> PersistentCarry:
        packed, bucket_pos, occ, dropped = bucketize(
            bucket_cfg, state.position, state.velocity,
            state.preferred_vel, state.preferred_vel, state.priority,
            state.eyesight, jnp.zeros_like(state.velocity), state.alive,
            use_pack_kernel=use_pack, interpret=interp,
            extra=state.uid.astype(jnp.float32),
        )
        return PersistentCarry(
            packed=packed,
            anchor=packed[:, ROW_PX:ROW_PX + 2],
            agent_slot=bucket_pos,
            sim_time=state.sim_time,
            n_rebins=jnp.zeros((), jnp.int32),
            max_occ=occ,
            dropped=dropped,
        )

    def rollout(params_hl, params_z, state0: SimState, dt, n_steps: int):
        f = config.jdtype
        dt = jnp.asarray(dt, jnp.float32)
        z5 = jnp.stack([
            params_z.agent_scale.astype(jnp.float32),
            params_z.force_distance.astype(jnp.float32),
            params_z.agent_mass.astype(jnp.float32),
            params_z.agent_radius.astype(jnp.float32),
            params_z.force_cap.astype(jnp.float32),
        ])
        carry0 = init_carry(state0)

        def step(c: PersistentCarry, _):
            packed = c.packed
            alive = packed[:, ROW_ID] >= 0.0

            # HL pass in slot space -> rec velocity columns (8, 9) and the
            # fresh own-pref columns (11, 12).
            rec = hl_planner.plan_slots(params_hl, packed)
            packed = packed.at[:, ROW_RX:ROW_RX + 2].set(rec)
            packed = packed.at[:, ROW_SPX:ROW_SPX + 2].set(rec)

            # Fused Zanlungo forces on the resident layout.
            out = zanlungo_forces_bucketed(
                bucket_cfg, z5, packed, interpret=interp
            )  # [slots, 2]
            vel = jnp.where(alive[:, None], out, 0.0)

            # Euler integration, elementwise on the packed columns.
            pos = packed[:, ROW_PX:ROW_PX + 2] + vel * dt
            packed = packed.at[:, ROW_PX:ROW_PX + 2].set(pos)
            packed = packed.at[:, 2:4].set(vel)

            # Skin check: rebin when any live agent drifted too far from
            # its rebin-time position.
            drift = jnp.where(
                alive,
                jnp.max(jnp.abs(pos - c.anchor), axis=-1),
                0.0,
            )
            need = jnp.max(drift) > skin

            def do_rebin(args):
                p, a_slot = args
                np_, ns_, occ, drop = _rebin_from_slots(
                    bucket_cfg, p, a_slot, use_pack, interp
                )
                return (np_, np_[:, ROW_PX:ROW_PX + 2], ns_, occ, drop,
                        jnp.int32(1))

            def no_rebin(args):
                p, a_slot = args
                return (p, c.anchor, a_slot, jnp.zeros((), jnp.int32),
                        jnp.zeros((), jnp.int32), jnp.int32(0))

            packed, anchor, agent_slot, occ, drop, did = jax.lax.cond(
                need, do_rebin, no_rebin, (packed, c.agent_slot)
            )
            c = PersistentCarry(
                packed=packed,
                anchor=anchor,
                agent_slot=agent_slot,
                sim_time=c.sim_time + dt.astype(c.sim_time.dtype),
                n_rebins=c.n_rebins + did,
                max_occ=jnp.maximum(c.max_occ, occ),
                dropped=c.dropped + drop,
            )
            return c, None

        carry, _ = jax.lax.scan(step, carry0, None, length=n_steps)

        # Unpack to agent order.
        safe = jnp.clip(carry.agent_slot, 0, bucket_cfg.slots - 1)
        ok = (carry.agent_slot < bucket_cfg.slots) & state0.alive
        pos = jnp.where(ok[:, None],
                        carry.packed[safe][:, ROW_PX:ROW_PX + 2],
                        state0.position.astype(jnp.float32)).astype(f)
        vel = jnp.where(ok[:, None], carry.packed[safe][:, 2:4],
                        0.0).astype(f)
        state = state0.replace(position=pos, velocity=vel,
                               sim_time=carry.sim_time)
        info = {"n_rebins": carry.n_rebins, "max_occupancy": carry.max_occ,
                "dropped": carry.dropped}
        return state, info

    return rollout
