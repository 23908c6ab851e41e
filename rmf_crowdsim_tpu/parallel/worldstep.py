"""Whole-step spatial domain decomposition over a device mesh.

The round-1 domain decomposition (parallel/domain.py) sharded only the
force pass; everything else ran replicated.  This module shards the
ENTIRE step — spawn, planners, the fused force kernel, integration,
waypoint bookkeeping, despawn — inside ONE ``shard_map`` over a 1D mesh
of world columns: the multi-chip analog of the reference's entire
``Simulation::step`` (lib.rs:195-383), with agents migrating between
shards as they move.

Layout
------
- The world's ``tx`` supertile columns (ops/zanlungo_pallas.BucketConfig)
  are split into ``D`` contiguous regions of ``cols_per = tx / D``
  columns; device ``i`` owns region ``i`` and the agents currently inside
  it.  The agent SoA (capacity ``N``) is sharded ``P("world_x")`` over
  the agent dim: each shard holds ``M = N / D`` slots.
- **Forces**: each shard bucketizes its own agents directly into an
  extended block (its region plus H halo columns per side, H = 2 when
  the spill patch is on, else 1), fills the halo columns from its
  neighbors via ``jax.lax.ppermute`` over ICI, and runs the unchanged
  fused kernel on the extended block.
- **Bucket overflow is exact** (``config.spill_capacity`` > 0): local
  spills are exchanged with both neighbors (a boundary hotspot's blast
  radius crosses shards), the merged list is canonically uid-sorted, and
  each spill's 3x3 neighborhood is recomputed against the extended
  block's 5x5 windows (the 2-column halos guarantee coverage) — zero
  truncation, tolerance-level consistent across device counts (tested
  with a hotspot straddling a shard boundary).
- **Migration**: after integration, agents whose x crossed a region
  boundary are compacted into fixed-capacity records and ppermuted to
  the neighboring shard, which inserts them into free slots.  World-edge
  agents stay put (flagged ``out_of_bounds`` like the single-device
  step).  An agent outstripping one full region per step settles over
  two steps (counted in ``stray`` meanwhile).
- **Spawns** (lib.rs:199-254): generator draws use the replicated PRNG
  key, so every shard sees the same per-source request vector; the 0.4 m
  clearance test is a ``psum`` of per-shard disc checks (exact — no
  restriction on source placement); uids stay globally ordered by a
  replicated scan over the per-source spawn decisions.  The spawning
  source takes a free slot on the shard that owns it.

Sharding invariance (``config.sharding_invariance``)
----------------------------------------------------
``"bitwise"`` (default): force sums are ordered by the packed slot
layout, and migration arrival order would perturb shard-local slot
order — so this engine bucketizes in canonical ``(tile, uid)`` order (a
uid pre-sort feeding the stable tile sort), making every candidate
window's content AND order independent of slot history.  An 8-device
run is BITWISE identical to a 1-device run (tested).  All other phases
are elementwise or keyed by uid.  Out-of-world agents clamp into the
world's edge tile column on the edge shards — identical to the
single-device tile clip — and uids advance by the psum'd COMMITTED
spawn count, so the uid stream matches ``build_step`` exactly.  The one
remaining capacity-pressure divergence: a spawn is dropped when its
*shard* is full even if the global array has room (exercised by a test).

``"tolerance"``: the canonical per-step double sort (plus its per-row
feature gathers) is the dominant shard tax — measured 32 vs 9.6
ms/shard-step at D=10 on the bench scene (DESIGN_NOTES.md).  In
tolerance mode each shard instead keeps its state TILE-SORTED across
steps with the skin-deferred presort (core/step.py skin_mode, applied
per shard), and population churn does not break the carry: deaths
(despawn, migration departure) pack INERT via bucketize's fresh-dead
masking, and new agents (spawns, migration arrivals) ride the EXACT
spill patch as unbinned "riders" — carried bpos == slots, carried key
== their insertion tile — until the next re-sort (requires
``spill_capacity`` > 0; without it spawns/arrivals force a re-sort).
A shard re-sorts only when an agent outruns the skin margin
``(tile_size - max_eyesight)/2`` or rider+overflow pressure exceeds
3/4 of the spill buffer.  Neighbor sets and forces stay EXACT (the
Verlet-skin argument extends across the halo seam because packed
positions are global and halo columns carry the same margin bound;
every query affected by an unpacked rider has its carried tile within
+-1 of the rider's insertion tile, so the rider's 3x3 spill window
recomputes it exactly); spill windows center on each spill's CARRIED
tile, exchanged alongside the spill payload.  Only the f32 force-sum
lane order becomes shard-history-dependent — the divergence class the
single-chip engine already accepts for presort / dual_row / int_prio —
so the 8-vs-1 tests for this mode assert allclose, not equality.
Lifecycle counters (spawns, uids, despawns, migrations) remain exact.

Scope: ``neighbor_backend == "grid_pallas"``; local planners must be
slot-free (``NoLocalPlan``) or provide the fused kernel (``Zanlungo``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import BACKEND_GRID_PALLAS, SimConfig
from ..core.state import SimState, StepEvents
from ..core.step import SimParams, payload_sort_by_key
from ..models.source_sink import GEN_CUSTOM, GEN_POISSON, SourceParams
from ..ops import grid as grid_ops
from ..ops.compact import compact_indices
from ..ops.zanlungo_pallas import (
    NUM_F,
    ROW_ID,
    ROW_PX,
    ROW_PY,
    _POS_SENTINEL,
    BucketConfig,
    bucketize,
    rank_from_sorted_key,
    sentinel_rows,
    tile_key,
    zanlungo_forces_bucketed,
    zparams5,
)

WORLD_AXIS = "world_x"

_I32_MAX = jnp.iinfo(jnp.int32).max


@struct.dataclass
class WorldDiag:
    """Per-step domain-decomposition diagnostics (all global, replicated).

    Nonzero ``migration_overflow`` / ``arrival_dropped`` mean agents were
    left in the wrong region / LOST — callers must surface both."""

    migrated: jax.Array            # [] int32 — agents that switched shards
    migration_overflow: jax.Array  # [] int32 — leavers beyond the per-step
    #                                buffer (stay put, retry next step)
    arrival_dropped: jax.Array     # [] int32 — arrivals with no free slot
    stray: jax.Array               # [] int32 — agents outside their
    #                                shard's region at force time
    resorted: jax.Array            # [] int32 — shards that re-established
    #                                their tile sort this step (== D in
    #                                bitwise mode, which sorts every step)


def _compact_rows(mask, k: int, arrays: dict):
    """Gather ``arrays[mask]`` into fixed-``k`` buffers (rank order).
    Returns (records dict with int rows -1-filled / float rows 0-filled,
    n_over); ops/compact.py has the scatter-free idiom."""
    c = compact_indices(mask, k)
    safe = jnp.clip(c.idx, 0, mask.shape[0] - 1)
    out = {}
    for name, arr in arrays.items():
        if jnp.issubdtype(arr.dtype, jnp.integer):
            fill = jnp.asarray(-1, arr.dtype)
        else:
            fill = jnp.asarray(0, arr.dtype)
        vmask = c.valid.reshape((k,) + (1,) * (arr.ndim - 1))
        out[name] = jnp.where(vmask, arr[safe], fill)
    return out, c.n_over


def _free_slot_targets(alive, k: int):
    """First ``k`` free-slot indices in ascending order (padded with M)
    plus the total free count.  compact_indices (cumsum + searchsorted)
    — a full [M] sort for a handful of ranks costs ~0.3 ms/step at
    M ~= 100k; the compaction picks the SAME slots bitwise."""
    c = compact_indices(~alive, k)
    return c.idx, c.count


def build_world_step(
    config: SimConfig,
    hl_planners: Sequence[Any],
    lp_planners: Sequence[Any],
    mesh: Mesh,
    migration_capacity: int = 0,
):
    """Construct the world-sharded ``step(params, state, dt) ->
    (state, events, diag)``, jitted over ``mesh`` (axis ``"world_x"``).

    ``state`` is a standard global SimState whose agent dim is sharded
    ``P(WORLD_AXIS)``; agents must start in the region owning their
    position (``shard_state_by_region``).  ``migration_capacity`` bounds
    per-direction leavers per shard per step (default ``max(8, M // 64)``
    — the compaction gathers are per-row-bound at ~10 ns/row, so an
    oversized buffer is a real per-step tax; leavers beyond it stay put
    and retry next step, counted loudly in ``WorldDiag
    .migration_overflow``).

    With ``config.sharding_invariance == "tolerance"`` the returned step
    takes and returns a per-shard skin carry: ``step(params, state, dt,
    skin) -> (state, events, diag, skin)``; ``build_world_rollout``
    threads it automatically (check the returned function's
    ``tolerance_mode`` attribute).
    """
    assert config.neighbor_backend == BACKEND_GRID_PALLAS, (
        "the world-sharded engine needs the grid_pallas backend"
    )
    for p in lp_planners:
        assert (not getattr(p, "needs_neighbors", True)) or hasattr(
            p, "plan_fused"
        ), "world-sharded local planners must be fused (Zanlungo) or slot-free"

    d = mesh.shape[WORLD_AXIS]
    hl_planners = tuple(hl_planners)
    lp_planners = tuple(lp_planners)

    cfg0 = BucketConfig.create(
        config.grid.width, config.grid.height, config.grid.offset,
        config.max_eyesight, bucket=config.bucket_capacity,
        strip_tiles=config.strip_tiles, sub_tiles=config.sub_tiles,
        tile_size=config.bucket_tile_size or None,
    )
    tx = cfg0.tx
    if tx % d:
        tx = (tx // d + 1) * d
    cols_per = tx // d
    # Halo width: 1 column suffices for the force kernel; EXACT bucket-
    # overflow repair (the spill patch) reads 5x5 tile windows, which
    # need 2 halo columns.  Spill support also needs neighbor spill
    # exchange and a >= 5-tile extended block.
    s_cap = ((max(16, int(config.spill_capacity)) + 15) // 16) * 16
    use_spills = (
        config.spill_capacity > 0 and cols_per >= 2 and cfg0.ty >= 5
    )
    H = 2 if use_spills else 1
    # Kernel block: my columns shifted +H, plus 2H halo columns.
    ext_cfg = dataclasses.replace(cfg0, tx=cols_per + 2 * H)
    col_slots = cfg0.ty * cfg0.bucket
    region_w = cfg0.tile_size * cols_per
    x0 = cfg0.offset[0]

    assert config.capacity % d == 0, (
        f"capacity {config.capacity} must divide over {d} devices"
    )
    m = config.capacity // d
    k_mig = int(migration_capacity) or max(8, m // 64)
    f = config.jdtype

    # Tolerance-invariance mode: per-shard skin-deferred presort (see the
    # module docstring).  The skin margin is the single-chip one.
    tol = config.sharding_invariance == "tolerance"
    skin_margin = (float(cfg0.tile_size) - float(config.max_eyesight)) / 2.0
    if tol and skin_margin <= 0.0:
        raise ValueError(
            "sharding_invariance='tolerance' needs tile_size > "
            f"max_eyesight (margin {skin_margin}); use bucket_tile_size"
        )

    def spawn_phase(sp: SourceParams, st: SimState, dt, key, i):
        """Phase A (lib.rs:199-254) with shard-local slot allocation and
        globally-ordered uids.  Mirrors core/step._spawn_phase; decisions
        (requests, clearance) are replicated via psum."""
        s = sp.source.shape[0]
        rt = sp.rate * jnp.asarray(dt, f)
        mono = jnp.floor(rt + 0.5).astype(jnp.int32)
        pois = jax.random.poisson(key, rt.astype(jnp.float32)).astype(
            jnp.int32
        )
        n_requested = jnp.where(sp.gen_kind == GEN_POISSON, pois, mono)
        n_requested = jnp.where(
            sp.gen_kind == GEN_CUSTOM, sp.custom_count, n_requested
        )
        n_requested = jnp.where(sp.active, n_requested, 0)

        # Clearance against pre-spawn state, exact across shards: each
        # shard tests its own agents, psum ORs the verdicts.
        diff = st.position[None, :, :] - sp.source[:, None, :]
        dist = jnp.linalg.norm(diff, axis=-1)
        blocked_local = jnp.any(
            st.alive[None, :]
            & (dist < jnp.asarray(config.spawn_clearance, f)),
            axis=1,
        )
        blocked = jax.lax.psum(
            blocked_local.astype(jnp.int32), WORLD_AXIS
        ) > 0
        want = (n_requested > 0) & ~blocked  # replicated

        own = jnp.clip(
            jnp.floor((sp.source[:, 0] - x0) / region_w).astype(jnp.int32),
            0, d - 1,
        )
        mine = want & (own == i)
        local_rank = jnp.cumsum(mine.astype(jnp.int32)) - 1
        slot_of_rank, n_free = _free_slot_targets(st.alive, s)
        can = mine & (local_rank < n_free)
        slot = slot_of_rank[jnp.clip(local_rank, 0, s - 1)]
        tgt = jnp.where(can, jnp.clip(slot, 0, m - 1), jnp.int32(m))

        # uids advance by the COMMITTED count, matching the single-device
        # step (core/step.py): each source is owned by exactly one shard,
        # so a psum of the per-shard commit decisions is the replicated
        # global commit vector.  The uid stream is identical to
        # build_step's unless a spawn drops because its *shard* (not the
        # global array) is full — the one remaining capacity-pressure
        # divergence (tested in tests/test_worldstep.py).
        can_global = jax.lax.psum(can.astype(jnp.int32), WORLD_AXIS) > 0
        rank_global = jnp.cumsum(can_global.astype(jnp.int32)) - 1
        new_uid = (st.next_uid + rank_global).astype(jnp.int32)

        src_idx = jnp.arange(s, dtype=jnp.int32)
        zero2 = jnp.zeros((s, 2), f)
        leg0 = sp.leg_route[:, 0]

        def scat(arr, vals):
            return arr.at[tgt].set(vals, mode="drop")

        n_spawned_global = jnp.sum(can_global.astype(jnp.int32))
        st = st.replace(
            position=scat(st.position, sp.source),
            velocity=scat(st.velocity, zero2),
            preferred_vel=scat(st.preferred_vel, zero2),
            next_waypoint=scat(st.next_waypoint, jnp.zeros((s,), jnp.int32)),
            eyesight=scat(st.eyesight, sp.eyesight),
            alive=scat(st.alive, jnp.ones((s,), jnp.bool_)),
            uid=scat(st.uid, new_uid),
            source_id=scat(st.source_id, src_idx),
            hl_idx=scat(st.hl_idx, sp.hl_idx),
            lp_idx=scat(st.lp_idx, sp.lp_idx),
            route_id=scat(st.route_id, leg0),
            route_wp=scat(st.route_wp, jnp.zeros((s,), jnp.int32)),
            priority=scat(st.priority, new_uid.astype(f)),
            next_uid=st.next_uid
            + jnp.sum(can_global.astype(jnp.int32), dtype=jnp.int32),
        )
        spawned = jnp.zeros((m,), jnp.bool_).at[tgt].set(True, mode="drop")
        dropped = jnp.sum(n_requested) - n_spawned_global
        return st, spawned, dropped

    def local_forces(st: SimState, rec_vel, self_pref, lp_params, zp_tree,
                     i, binning=None, key_c=None):
        """Per-shard canonical bucketize + halo exchange + fused kernel
        (+ exact spill repair with neighbor spill exchange when
        ``config.spill_capacity`` > 0).  Returns (vel [M,2], max_occ,
        truncated, stray) — vel only valid for fused-planner agents
        (callers select per lp_idx).

        ``binning``/``key_c`` (tolerance mode only): the carried
        (bpos, max_occ, n_over) from ``rank_from_sorted_key`` plus the
        carried sorted tile keys — state is then already tile-sorted and
        the canonical uid pre-sort, bucketize's internal sort, and every
        per-row feature gather are skipped."""
        # Shift into the extended block: my region occupies columns
        # [H, cols_per + H); the H columns on each side are halo (filled
        # below).
        shift = (i.astype(f) * cols_per - H) * jnp.asarray(cfg0.tile_size, f)
        pos_sh = st.position.at[:, 0].add(-shift)

        # World-edge clamp, matching the single-device tile clip
        # (tile_key's default (0, tx-1) — the reference instead errors
        # the whole step on out-of-grid agents, location_hash_2d.rs:61-63):
        # on the edge shards, out-of-world agents bin into the world's
        # outermost REAL column and keep all force interactions.  Interior
        # shards keep the plain ext clip — an out-of-world agent only
        # transits one mid-shard step per region while migration walks it
        # to the edge shard (counted in ``stray`` meanwhile).
        col_lo = jnp.where(i == 0, jnp.int32(H), jnp.int32(0))
        col_hi = jnp.where(
            i == d - 1, jnp.int32(cols_per + H - 1),
            jnp.int32(ext_cfg.tx - 1),
        )

        # Stray diagnostic: an agent whose binning column is NOT a real
        # column of this shard (in-world agents mid-migration, plus
        # out-of-world agents transiting an interior shard) gets clipped
        # into a halo column and then overwritten — its forces are wrong
        # for this step.  Zero after a clean migration, surfaced if not.
        colf = jnp.floor(
            (pos_sh[:, 0] - jnp.asarray(x0, f))
            / jnp.asarray(cfg0.tile_size, f)
        ).astype(jnp.int32)
        binned_col = jnp.clip(colf, col_lo, col_hi)
        stray = jnp.sum(
            (st.alive
             & ((binned_col < H) | (binned_col >= cols_per + H))
             ).astype(jnp.int32)
        )

        zp = lp_params
        # bucketize's packed_T is NOT usable here: the shard edits the
        # packed plane afterwards (global-frame PX restore, halo splice),
        # so the force kernel takes its transpose fallback on the final
        # plane.
        if binning is not None:
            # Tolerance mode: state is tile-sorted, binning carried — no
            # sorts, no gathers (the bitwise path's dominant cost).
            packed, _packed_T, bucket_pos, occ, dropped = bucketize(
                ext_cfg,
                pos_sh,
                st.velocity,
                st.preferred_vel,
                self_pref,
                st.priority,
                st.eyesight,
                rec_vel,
                st.alive,
                use_pack_kernel=config.use_pack_kernel,
                interpret=config.pallas_interpret,
                presorted=True,
                binning=binning,
            )
        else:
            # Canonical (tile, uid) candidate order: a uid pre-sort
            # feeding bucketize's stable tile sort (bitwise sharding
            # invariance — see module docstring).
            uid_key = jnp.where(st.alive, st.uid, _I32_MAX)
            ord_u = jnp.argsort(uid_key).astype(jnp.int32)
            packed, _packed_T, bpos_perm, occ, dropped = bucketize(
                ext_cfg,
                pos_sh[ord_u],
                st.velocity[ord_u],
                st.preferred_vel[ord_u],
                self_pref[ord_u],
                st.priority[ord_u],
                st.eyesight[ord_u],
                rec_vel[ord_u],
                st.alive[ord_u],
                use_pack_kernel=config.use_pack_kernel,
                interpret=config.pallas_interpret,
                col_clip=(col_lo, col_hi),
            )
            bucket_pos = (
                jnp.full((m,), ext_cfg.slots, jnp.int32)
                .at[ord_u].set(bpos_perm)
            )

        # Restore GLOBAL x in the packed rows.  Binning used the shifted
        # ext frame, but the pair math is difference-based and the halo
        # blocks exchanged below come from NEIGHBOR frames (one region
        # width apart) — keeping shard-frame PX made every cross-shard
        # candidate appear a full region away, silently zeroing all
        # boundary forces (caught by the closing-pair regression test).
        # Global PX also makes the pair math BIT-IDENTICAL across device
        # counts and vs the general engine: no per-shard (pos - shift)
        # rounding enters the kernel.
        packed = packed.at[:, ROW_PX].add(
            jnp.where(packed[:, ROW_ID] >= 0, shift.astype(jnp.float32),
                      0.0)
        )

        # Halo exchange: my LAST H real columns -> right neighbor's left
        # halo; my FIRST H real columns -> left neighbor's right halo.
        hs = H * col_slots
        sent = sentinel_rows(hs)

        last_real = packed[cols_per * col_slots:(cols_per + H) * col_slots]
        first_real = packed[hs:2 * hs]
        left_halo = jax.lax.ppermute(
            last_real, WORLD_AXIS, [(j, j + 1) for j in range(d - 1)]
        )
        right_halo = jax.lax.ppermute(
            first_real, WORLD_AXIS, [(j + 1, j) for j in range(d - 1)]
        )
        left_halo = jnp.where(i == 0, sent, left_halo)
        right_halo = jnp.where(i == d - 1, sent, right_halo)
        # Halo slot ids are the NEIGHBOR's local row indices and collide
        # with local ids; offset them so the kernel's self-pair test
        # (cid == qid) can't mask a real neighbor.  Ids stay < 3m < 2^24.
        left_halo = left_halo.at[:, ROW_ID].set(
            jnp.where(left_halo[:, ROW_ID] >= 0,
                      left_halo[:, ROW_ID] + float(m), -1.0)
        )
        right_halo = right_halo.at[:, ROW_ID].set(
            jnp.where(right_halo[:, ROW_ID] >= 0,
                      right_halo[:, ROW_ID] + float(2 * m), -1.0)
        )
        packed = packed.at[:hs].set(left_halo)
        packed = packed.at[(cols_per + H) * col_slots:].set(right_halo)

        out = zanlungo_forces_bucketed(
            ext_cfg, zp, packed, interpret=config.pallas_interpret,
            int_prio=getattr(config, "integer_priorities", False),
            dual_row=getattr(config, "dual_row", False),
        )

        if use_spills:
            out, vel_spill, sp_local_idx, n_sp, n_over = _patch_shard_spills(
                st, pos_sh, rec_vel, self_pref, bucket_pos, packed,
                out, zp_tree, i, key_c,
            )
            # bucketize's dropped = bucket overflow + pack-window
            # overflow; the patch resolves the former exactly.
            dropped = n_over + jnp.maximum(dropped - n_sp, 0)
        safe = jnp.clip(bucket_pos, 0, ext_cfg.slots - 1)
        ok = (bucket_pos < ext_cfg.slots) & st.alive
        vel = jnp.where(ok[:, None], out[safe].astype(f), rec_vel)
        if use_spills:
            # Spill agents' own exact velocities.
            vel = vel.at[sp_local_idx].set(
                vel_spill.astype(f), mode="drop"
            )
        return vel, occ, dropped, stray

    def _patch_shard_spills(st, pos_sh, rec_vel, self_pref, bucket_pos,
                            packed, out, zp_tree, i, key_c=None):
        """EXACT repair of bucket overflow on the world-sharded path:
        local spills are exchanged with both neighbors (a boundary
        hotspot's blast radius crosses shards), the merged list is
        canonically uid-sorted, and ops/zanlungo_pallas._spill_groups
        recomputes each spill's 3x3 neighborhood against the extended
        block's 5x5 windows (the 2-column halos guarantee coverage).
        Patched rows are tolerance-level (not bitwise) across device
        counts: absent far-away spills shift summation lanes.

        ``key_c`` (tolerance mode): the carried sorted tile keys — spill
        windows then center on each spill's CARRIED tile (required for
        exactness under carried binning: an affected query's STALE tile
        is adjacent to the spill's STALE tile, not necessarily its fresh
        one; same argument as the single-chip skin path,
        ops/zanlungo_pallas.zanlungo_fused).  The stale tile travels
        with the spill payload in GLOBAL column coordinates.

        Returns (out', spill velocities [s_cap, 2], their local agent
        indices [s_cap] (m for invalid), n_spill, n_beyond_cap)."""
        from ..ops.zanlungo_pallas import _spill_groups

        is_spill = st.alive & (bucket_pos >= ext_cfg.slots)
        comp = compact_indices(is_spill, s_cap)
        n_spill, sp_valid, n_over = comp.count, comp.valid, comp.n_over
        sc = jnp.clip(comp.idx, 0, m - 1)

        f32 = jnp.float32
        payload = dict(
            pos=st.position[sc].astype(f32),  # GLOBAL coords for exchange
            vel=st.velocity[sc].astype(f32),
            prefc=st.preferred_vel[sc].astype(f32),
            spref=self_pref[sc].astype(f32),
            prio=st.priority[sc].astype(f32),
            eye=st.eyesight[sc].astype(f32),
            rec=rec_vel[sc].astype(f32),
            uid=jnp.where(sp_valid, st.uid[sc], _I32_MAX).astype(f32),
            valid=sp_valid.astype(f32),
        )
        if key_c is not None:
            # Carried (stale) tile of each spill, in GLOBAL column
            # coordinates so the receiving shard can re-frame it.
            tid = jnp.where(sp_valid, key_c[sc], 0)
            payload["tcol"] = (
                (tid // jnp.int32(cfg0.ty)) - H + i * cols_per
            ).astype(f32)
            payload["trow"] = (tid % jnp.int32(cfg0.ty)).astype(f32)
        perm_r = [(j, j + 1) for j in range(d - 1)]
        perm_l = [(j + 1, j) for j in range(d - 1)]
        from_left = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, WORLD_AXIS, perm_r), payload
        )
        from_right = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, WORLD_AXIS, perm_l), payload
        )
        from_left["valid"] = from_left["valid"] * (i > 0)
        from_right["valid"] = from_right["valid"] * (i < d - 1)

        def cat(name):
            return jnp.concatenate(
                [payload[name], from_left[name], from_right[name]], axis=0
            )

        mvalid = jnp.concatenate([
            payload["valid"], from_left["valid"], from_right["valid"]
        ]) > 0
        muid = jnp.where(mvalid, cat("uid"), jnp.float32(_I32_MAX))
        # Local agent index rides along so own spills' outputs can be
        # written back (neighbors' are theirs to write).
        mlocal = jnp.concatenate([
            comp.idx, jnp.full((2 * s_cap,), m, jnp.int32)
        ])
        # Canonical uid order: identical group content/order regardless
        # of which shard evaluates a given spill's neighborhood.
        ord_s = jnp.argsort(muid).astype(jnp.int32)
        n_merged = 3 * s_cap
        shift = (i.astype(f) * cols_per - H) * jnp.asarray(
            cfg0.tile_size, f
        )
        # Spill payload positions stay GLOBAL for pair math (the packed
        # plane's ROW_PX is global too — see local_forces); only the
        # tile coords below need the shard's ext frame.
        mpos = cat("pos")[ord_s]
        mpos_ext = mpos.at[:, 0].add(-shift.astype(f32))
        mvalid = mvalid[ord_s]
        inv_tile = 1.0 / cfg0.tile_size
        # Same per-shard world-edge column clamp as local_forces'
        # bucketize, so spill windows align with the packed layout.
        col_lo = jnp.where(i == 0, jnp.int32(H), jnp.int32(0))
        col_hi = jnp.where(
            i == d - 1, jnp.int32(cols_per + H - 1),
            jnp.int32(ext_cfg.tx - 1),
        )
        if key_c is not None:
            # Carried tiles (see docstring): re-frame each spill's GLOBAL
            # stale tile column into MY extended block.  A far neighbor
            # spill clips to my halo edge; the clipped window's query
            # rows are still recomputed EXACTLY (queries = 3x3 around the
            # center, candidates = the center's 5x5 superset + the spill
            # list with the strict dist < eyesight pair mask), so a
            # mis-centered far spill is idempotent, never wrong.
            tcx = jnp.clip(
                cat("tcol")[ord_s].astype(jnp.int32)
                - i * jnp.int32(cols_per) + jnp.int32(H),
                col_lo, col_hi,
            )
            tcy = jnp.clip(
                cat("trow")[ord_s].astype(jnp.int32), 0, cfg0.ty - 1
            )
        else:
            tcx = jnp.clip(jnp.floor(
                (mpos_ext[:, 0] - cfg0.offset[0]) * inv_tile
            ).astype(jnp.int32), col_lo, col_hi)
            tcy = jnp.clip(jnp.floor(
                (mpos_ext[:, 1] - cfg0.offset[1]) * inv_tile
            ).astype(jnp.int32), 0, cfg0.ty - 1)
        tcx = jnp.where(mvalid, tcx, 1)
        tcy = jnp.where(mvalid, tcy, 1)
        sp = dict(
            pos=mpos,
            vel=cat("vel")[ord_s],
            prefc=cat("prefc")[ord_s],
            spref=cat("spref")[ord_s],
            prio=cat("prio")[ord_s],
            eye=cat("eye")[ord_s],
            rec=cat("rec")[ord_s],
            # Ids past every packed (< m) and halo (< 3m) id.
            id=jnp.where(
                mvalid,
                jnp.arange(n_merged, dtype=f32) + float(3 * m), -1.0
            ),
        )
        mlocal_sorted = mlocal[ord_s]
        n_valid = jnp.sum(mvalid.astype(jnp.int32))

        def make_patch(cap: int):
            """Evaluate only the first ``cap`` merged spills — the uid
            sort puts every valid spill first, so this is exact whenever
            n_valid <= cap.  The group machinery's cost scales with its
            STATIC cap (like spill_patch's tiers); at typical spill
            counts (a handful) the smallest tier is ~n_merged/cap times
            cheaper than evaluating the full exchange buffer."""

            def run(o):
                g_out, q_id, _q_slots = _spill_groups(
                    ext_cfg, zp_tree, packed,
                    {k_: v_[:cap] for k_, v_ in sp.items()},
                    tcx[:cap], tcy[:cap], mvalid[:cap], chunk=16,
                    interpret=config.pallas_interpret,
                    int_prio=getattr(config, "integer_priorities", False),
                )
                # Window-query outputs, written straight to their packed
                # slots.  ROW_ID < m are MY rows; halo rows (>= m) belong
                # to neighbors, who recompute them identically.
                win_id = q_id[:, :-1].astype(jnp.int32)
                win_ok = (win_id >= 0) & (win_id < m)
                tgt_slot = jnp.where(
                    win_ok, _q_slots, jnp.int32(ext_cfg.slots)
                )
                o = o.at[tgt_slot.reshape(-1)].set(
                    g_out[:, :-1].reshape(-1, 2), mode="drop"
                )
                # Own spill rows' velocities, keyed back to local agent
                # indices (same compacted order for both scatters).
                sp_vel_sorted = g_out[:, -1]
                ml = mlocal_sorted[:cap]
                own = ml < m
                own_rank = jnp.where(
                    own, jnp.cumsum(own.astype(jnp.int32)) - 1, s_cap
                )
                vel_spill = jnp.zeros((s_cap, 2), f32).at[own_rank].set(
                    sp_vel_sorted, mode="drop"
                )
                own_idx = jnp.full((s_cap,), m, jnp.int32).at[
                    own_rank
                ].set(ml, mode="drop")
                return o, vel_spill, own_idx

            return run

        def skip_patch(o):
            return (o, jnp.zeros((s_cap, 2), f32),
                    jnp.full((s_cap,), m, jnp.int32))

        tiers = sorted({min(16, n_merged), min(48, n_merged),
                        min(128, n_merged), n_merged})

        def dispatch(ti, o):
            cap = tiers[ti]
            if ti + 1 == len(tiers):
                return make_patch(cap)(o)
            return jax.lax.cond(
                n_valid <= cap, make_patch(cap),
                lambda oo: dispatch(ti + 1, oo), o,
            )

        # The group machinery has a fixed shape cost per tier; skip it
        # entirely on shards with no spill in reach (the ppermute
        # exchange above stays unconditional — collectives must run on
        # every shard).
        out, vel_spill, own_idx = jax.lax.cond(
            n_valid > 0, lambda o: dispatch(0, o), skip_patch, out
        )
        return out, vel_spill, own_idx, n_spill, n_over

    def migrate(st: SimState, i):
        """ppermute boundary-crossing agents to the neighboring shard."""
        reg_lo = jnp.asarray(x0, f) + i.astype(f) * jnp.asarray(region_w, f)
        reg_hi = reg_lo + jnp.asarray(region_w, f)
        x = st.position[:, 0]
        go_l = st.alive & (x < reg_lo) & (i > 0)
        go_r = st.alive & (x >= reg_hi) & (i < d - 1)

        fields = dict(
            position=st.position, velocity=st.velocity,
            preferred_vel=st.preferred_vel, next_waypoint=st.next_waypoint,
            eyesight=st.eyesight, uid=st.uid, source_id=st.source_id,
            hl_idx=st.hl_idx, lp_idx=st.lp_idx, route_id=st.route_id,
            route_wp=st.route_wp, priority=st.priority,
        )
        send_l, over_l = _compact_rows(go_l, k_mig, fields)
        send_r, over_r = _compact_rows(go_r, k_mig, fields)
        # Leavers beyond the buffer stay (retry next step, counted).
        rank_l = jnp.cumsum(go_l.astype(jnp.int32)) - 1
        rank_r = jnp.cumsum(go_r.astype(jnp.int32)) - 1
        left_ok = go_l & (rank_l < k_mig)
        right_ok = go_r & (rank_r < k_mig)

        perm_r = [(j, j + 1) for j in range(d - 1)]  # rightward send
        perm_l = [(j + 1, j) for j in range(d - 1)]  # leftward send
        recv_from_left = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, WORLD_AXIS, perm_r), send_r
        )
        recv_from_right = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, WORLD_AXIS, perm_l), send_l
        )
        # Edge devices receive zeros from nonexistent neighbors; uid -1
        # marks validity, so zero rows are only valid if uid == 0 leaks —
        # mask explicitly by device index.
        lv = (recv_from_left["uid"] >= 0) & (i > 0)
        rv = (recv_from_right["uid"] >= 0) & (i < d - 1)

        st = st.replace(alive=st.alive & ~(left_ok | right_ok))

        arrivals = {
            name: jnp.concatenate(
                [recv_from_left[name], recv_from_right[name]], axis=0
            )
            for name in fields
        }
        avalid = jnp.concatenate([lv, rv], axis=0)
        a_rank = jnp.cumsum(avalid.astype(jnp.int32)) - 1
        slot_of_rank, n_free = _free_slot_targets(st.alive, 2 * k_mig)
        can = avalid & (a_rank < n_free)
        tgt = jnp.where(
            can,
            jnp.clip(slot_of_rank[jnp.clip(a_rank, 0, 2 * k_mig - 1)],
                     0, m - 1),
            jnp.int32(m),
        )

        def ins(arr, vals):
            return arr.at[tgt].set(vals, mode="drop")

        st = st.replace(
            position=ins(st.position, arrivals["position"]),
            velocity=ins(st.velocity, arrivals["velocity"]),
            preferred_vel=ins(st.preferred_vel, arrivals["preferred_vel"]),
            next_waypoint=ins(st.next_waypoint, arrivals["next_waypoint"]),
            eyesight=ins(st.eyesight, arrivals["eyesight"]),
            alive=ins(st.alive, can),
            uid=ins(st.uid, arrivals["uid"]),
            source_id=ins(st.source_id, arrivals["source_id"]),
            hl_idx=ins(st.hl_idx, arrivals["hl_idx"]),
            lp_idx=ins(st.lp_idx, arrivals["lp_idx"]),
            route_id=ins(st.route_id, arrivals["route_id"]),
            route_wp=ins(st.route_wp, arrivals["route_wp"]),
            priority=ins(st.priority, arrivals["priority"]),
        )
        migrated = jax.lax.psum(
            jnp.sum((left_ok | right_ok).astype(jnp.int32)), WORLD_AXIS
        )
        overflow = jax.lax.psum(over_l + over_r, WORLD_AXIS)
        lost = jax.lax.psum(
            jnp.sum((avalid & ~can).astype(jnp.int32)), WORLD_AXIS
        )
        # Tolerance-mode bookkeeping: departures pack inert next step
        # (fresh-dead masking); arrival SLOTS become riders (or, without
        # the spill patch, invalidate the carry) — see local_step.
        arr_mask = jnp.zeros((m,), jnp.bool_).at[tgt].set(True, mode="drop")
        return st, migrated, overflow, lost, arr_mask

    def local_step(params: SimParams, st: SimState, dt, skin=None):
        """The per-shard step body (inside shard_map)."""
        i = jax.lax.axis_index(WORLD_AXIS)
        dt = jnp.asarray(dt, f)
        key, spawn_key = jax.random.split(st.rng_key)
        st = st.replace(rng_key=key)

        # ---- Phase A: spawn ----
        if params.sources is not None:
            st, spawned, spawn_dropped = spawn_phase(
                params.sources, st, dt, spawn_key, i
            )
        else:
            spawned = jnp.zeros((m,), jnp.bool_)
            spawn_dropped = jnp.zeros((), jnp.int32)

        # ---- Tolerance mode: per-shard skin-deferred presort ----------
        # Mirrors core/step.py skin_mode, per shard: keep state TILE-
        # SORTED (ext-frame keys with the world-edge col clip) and carry
        # the binning.  Population churn does NOT force a re-sort:
        # deaths (despawn / migration departure) pack inert via
        # bucketize's fresh-dead masking, and — with the spill patch on —
        # new agents (spawns here, migration arrivals in ``migrate``)
        # ride the EXACT spill patch as unbinned "riders" (carried
        # bpos == slots, carried key == their insertion tile) until the
        # next re-sort.  Re-sorts trigger only on (a) an invalid carry,
        # (b) an agent outrunning the skin margin, or (c) rider/spill
        # pressure on the spill buffer (> 3/4 of s_cap).  Without the
        # spill patch there is nowhere for new agents to ride, so spawns
        # trigger and arrivals invalidate.  Shards re-sort independently
        # — forces stay exact either way (module docstring).
        binning = None
        key_c = None
        skin_vars = None
        resorted = jnp.asarray(d, jnp.int32)  # bitwise sorts every step
        if tol:
            shift0 = (i.astype(f) * cols_per - H) * jnp.asarray(
                cfg0.tile_size, f
            )
            col_lo0 = jnp.where(i == 0, jnp.int32(H), jnp.int32(0))
            col_hi0 = jnp.where(
                i == d - 1, jnp.int32(cols_per + H - 1),
                jnp.int32(ext_cfg.tx - 1),
            )
            key_r = skin["key"]
            bpos_r = skin["bpos"]
            ref_r = skin["ref"]
            need = ~skin["valid"][0]
            if use_spills:
                # Spawn riders: carried key = insertion tile (in MY ext
                # frame), carried bpos = slots (unbinned -> spill patch).
                pos_sh0 = st.position.at[:, 0].add(-shift0)
                fresh_key = tile_key(
                    ext_cfg, pos_sh0, st.alive,
                    col_clip=(col_lo0, col_hi0),
                )
                key_r = jnp.where(spawned, fresh_key, key_r)
                bpos_r = jnp.where(
                    spawned, jnp.int32(ext_cfg.slots), bpos_r
                )
                ref_r = jnp.where(spawned[:, None], st.position, ref_r)
                n_riding = jnp.sum(
                    (st.alive & (bpos_r >= ext_cfg.slots)).astype(jnp.int32)
                )
                need = need | (n_riding > jnp.int32((3 * s_cap) // 4))
            else:
                need = need | jnp.any(spawned)
            dref = jnp.abs(st.position - ref_r)
            disp = jnp.max(
                jnp.where(st.alive[:, None], dref, jnp.zeros((), f))
            )
            need = need | (disp > jnp.asarray(skin_margin, f))

            def _do_sort(op):
                st_, spwn_ = op
                pos_sh_ = st_.position.at[:, 0].add(-shift0)
                tkey = tile_key(
                    ext_cfg, pos_sh_, st_.alive,
                    col_clip=(col_lo0, col_hi0),
                )
                st2, spwn2, key_s = payload_sort_by_key(st_, tkey, spwn_)
                bpos, occ, nover = rank_from_sorted_key(ext_cfg, key_s)
                return st2, spwn2, key_s, bpos, occ, nover, st2.position

            def _reuse(op):
                st_, spwn_ = op
                return (st_, spwn_, key_r, bpos_r,
                        skin["max_occ"][0], skin["n_over"][0], ref_r)

            (st, spawned, key_c, bpos_c, occ_c, nover_c, ref_c
             ) = jax.lax.cond(need, _do_sort, _reuse, (st, spawned))
            binning = (bpos_c, occ_c, nover_c)
            skin_vars = (key_c, bpos_c, occ_c, nover_c, ref_c,
                         shift0, col_lo0, col_hi0)
            resorted = jax.lax.psum(need.astype(jnp.int32), WORLD_AXIS)

        # ---- Phase B: HL planners (local, elementwise) ----
        vel = jnp.zeros((m, 2), f)
        self_pref = st.preferred_vel
        route_wp = st.route_wp
        for pi, planner in enumerate(hl_planners):
            res = planner.plan(params.hl[pi], st)
            sel = st.hl_idx == jnp.int32(pi)
            use = sel & res.valid & st.alive
            vel = jnp.where(use[:, None], res.vel, vel)
            self_pref = jnp.where(use[:, None], res.vel, self_pref)
            route_wp = jnp.where(sel & st.alive, res.route_wp, route_wp)
        st = st.replace(route_wp=route_wp)

        # ---- local planners: fused force pass with halo exchange ----
        max_occ = jnp.zeros((), jnp.int32)
        truncated = jnp.zeros((), jnp.int32)
        stray = jnp.zeros((), jnp.int32)
        for pi, planner in enumerate(lp_planners):
            if hasattr(planner, "plan_fused"):
                zp = params.lp[pi]
                z5 = zparams5(zp)
                v, occ, dropped, stray_i = local_forces(
                    st, vel, self_pref, z5, zp, i,
                    binning=binning, key_c=key_c,
                )
                max_occ = jnp.maximum(
                    max_occ, jax.lax.pmax(occ, WORLD_AXIS)
                )
                truncated = truncated + jax.lax.psum(dropped, WORLD_AXIS)
                stray = stray + jax.lax.psum(stray_i, WORLD_AXIS)
            else:
                v = planner.plan(params.lp[pi], st, None, vel, self_pref)
            sel = (st.lp_idx == jnp.int32(pi)) & st.alive
            vel = jnp.where(sel[:, None], v, vel)

        # ---- integration + out-of-bounds flag ----
        new_pos = st.position + vel * dt
        _, _, in_bounds = grid_ops.cell_coords(config.grid, new_pos)
        out_of_bounds = st.alive & ~in_bounds

        # ---- SourceSink waypoint bookkeeping (lib.rs:304-336) ----
        destroyed = jnp.zeros((m,), jnp.bool_)
        reached = jnp.zeros((m,), jnp.bool_)
        if params.sources is not None:
            sp = params.sources
            s = sp.source.shape[0]
            w = sp.waypoints.shape[1]
            has_ss = st.alive & (st.source_id >= 0)
            src = jnp.clip(st.source_id, 0, s - 1)
            wlen = sp.n_waypoints[src]
            rogue = has_ss & (st.next_waypoint >= wlen)
            wp_c = jnp.clip(st.next_waypoint, 0, w - 1)
            target = sp.waypoints[src, wp_c]
            dd = jnp.linalg.norm(st.position - target, axis=-1)
            reached = has_ss & ~rogue & (dd < sp.radius_sink[src])
            at_last = st.next_waypoint == wlen - 1
            looping = sp.loop_forever[src]
            despawn = reached & at_last & ~looping
            wrap = reached & at_last & looping
            advance = reached & ~at_last
            next_wp = jnp.where(
                wrap, 0,
                jnp.where(advance, st.next_waypoint + 1, st.next_waypoint),
            )
            route_id = st.route_id
            route_wp = st.route_wp
            for pi, planner in enumerate(hl_planners):
                if getattr(planner, "uses_routes", False):
                    sel = advance & (st.hl_idx == jnp.int32(pi))
                    new_rid = sp.leg_route[src, jnp.clip(next_wp, 0, w - 1)]
                    route_id = jnp.where(sel, new_rid, route_id)
                    route_wp = jnp.where(sel, 0, route_wp)
            destroyed = despawn | rogue
            st = st.replace(
                next_waypoint=jnp.where(has_ss, next_wp, st.next_waypoint),
                route_id=route_id,
                route_wp=route_wp,
            )

        # ---- commit + despawn ----
        alive_pre = st.alive
        pos_premove = st.position
        committed_pref = (
            jnp.where(alive_pre[:, None], self_pref, st.preferred_vel)
            if config.commit_preferred_vel
            else st.preferred_vel
        )
        st = st.replace(
            position=jnp.where(alive_pre[:, None], new_pos, st.position),
            velocity=jnp.where(alive_pre[:, None], vel, st.velocity),
            preferred_vel=committed_pref,
            alive=alive_pre & ~destroyed,
            sim_time=st.sim_time + dt,
        )

        events = StepEvents(
            spawned=spawned,
            destroyed=destroyed,
            waypoint_reached=reached,
            spawn_position=jnp.where(
                spawned[:, None], pos_premove, jnp.zeros((m, 2), f)
            ),
            destroyed_uid=jnp.where(destroyed, st.uid, -1),
            waypoint_position=jnp.where(
                reached[:, None], pos_premove, jnp.zeros((m, 2), f)
            ),
            out_of_bounds=out_of_bounds,
            spawn_dropped=spawn_dropped.astype(jnp.int32),
            max_cell_occupancy=max_occ,
            neighbor_truncated=truncated,
        )

        # ---- migration ----
        # NOTE: the StepEvents above are keyed to PRE-migration slots
        # (uids/positions are already resolved into the masks'
        # companion arrays, so counter consumers are exact), but a
        # consumer correlating event masks with post-migration
        # ``state.uid`` by SLOT would mis-attribute agents that migrated
        # this step.  Current consumers (rollout counters, WorldDiag)
        # only reduce; slot-correlating host dispatch runs on the
        # single-device engine.
        st, migrated, overflow, lost, arr_mask = migrate(st, i)
        diag = WorldDiag(
            migrated=migrated,
            migration_overflow=overflow,
            arrival_dropped=lost,
            stray=stray,
            resorted=resorted,
        )
        if tol:
            (key_c2, bpos_c2, occ_c2, nover_c2, ref_c2,
             shift0, col_lo0, col_hi0) = skin_vars
            if use_spills:
                # Arrival riders: carried key = their insertion tile in
                # MY ext frame (post-integration position — that IS the
                # rider's Verlet reference), bpos = slots (-> spill
                # patch), ref = insertion position.  Departures/despawns
                # need nothing: fresh-dead masking packs them inert.
                pos_sh2 = st.position.at[:, 0].add(-shift0)
                fresh_key2 = tile_key(
                    ext_cfg, pos_sh2, st.alive,
                    col_clip=(col_lo0, col_hi0),
                )
                key_c2 = jnp.where(arr_mask, fresh_key2, key_c2)
                bpos_c2 = jnp.where(
                    arr_mask, jnp.int32(ext_cfg.slots), bpos_c2
                )
                ref_c2 = jnp.where(arr_mask[:, None], st.position, ref_c2)
                valid = jnp.ones((), jnp.bool_)
            else:
                # No spill patch: arrivals have nowhere to ride.
                valid = ~jnp.any(arr_mask)
            skin_out = dict(
                key=key_c2, bpos=bpos_c2, ref=ref_c2,
                max_occ=occ_c2[None], n_over=nover_c2[None],
                valid=valid[None],
            )
            return st, events, diag, skin_out
        return st, events, diag

    def spec_of(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == config.capacity:
            return P(WORLD_AXIS)
        return P()

    # Per-agent event leaves are shard-local [m]; the scalar diagnostics
    # are replicated (psum/pmax'd inside the body).
    ev_specs = StepEvents(
        spawned=P(WORLD_AXIS),
        destroyed=P(WORLD_AXIS),
        waypoint_reached=P(WORLD_AXIS),
        spawn_position=P(WORLD_AXIS),
        destroyed_uid=P(WORLD_AXIS),
        waypoint_position=P(WORLD_AXIS),
        out_of_bounds=P(WORLD_AXIS),
        spawn_dropped=P(),
        max_cell_occupancy=P(),
        neighbor_truncated=P(),
    )
    diag_specs = WorldDiag(P(), P(), P(), P(), P())
    # Every skin leaf is leading-axis sharded: per-agent rows are [m]
    # per shard; the per-shard flags/counters are [1] per shard ([D]
    # global).
    skin_specs = dict(
        key=P(WORLD_AXIS), bpos=P(WORLD_AXIS), ref=P(WORLD_AXIS),
        max_occ=P(WORLD_AXIS), n_over=P(WORLD_AXIS), valid=P(WORLD_AXIS),
    )

    if tol:
        def step(params, state: SimState, dt, skin):
            in_state_spec = jax.tree_util.tree_map(spec_of, state)
            fn = jax.shard_map(
                local_step,
                mesh=mesh,
                in_specs=(
                    jax.tree_util.tree_map(lambda _: P(), params),
                    in_state_spec,
                    P(),
                    skin_specs,
                ),
                out_specs=(in_state_spec, ev_specs, diag_specs,
                           skin_specs),
                check_vma=False,
            )
            return fn(params, state, dt, skin)
    else:
        def step(params, state: SimState, dt):
            in_state_spec = jax.tree_util.tree_map(spec_of, state)
            fn = jax.shard_map(
                local_step,
                mesh=mesh,
                in_specs=(
                    jax.tree_util.tree_map(lambda _: P(), params),
                    in_state_spec,
                    P(),
                ),
                out_specs=(in_state_spec, ev_specs, diag_specs),
                check_vma=False,
            )
            return fn(params, state, dt)

    step.tolerance_mode = tol
    return step


def init_world_skin(config: SimConfig, mesh: Mesh):
    """Fresh (everywhere-invalid) skin carry for a tolerance-mode world
    step — the first step re-sorts every shard.  Returns the carry dict
    sharded for ``build_world_step``'s 4-argument variant."""
    d = mesh.shape[WORLD_AXIS]
    n = config.capacity
    skin = dict(
        key=jnp.zeros((n,), jnp.int32),
        bpos=jnp.zeros((n,), jnp.int32),
        ref=jnp.zeros((n, 2), config.jdtype),
        max_occ=jnp.zeros((d,), jnp.int32),
        n_over=jnp.zeros((d,), jnp.int32),
        valid=jnp.zeros((d,), jnp.bool_),
    )
    shard = NamedSharding(mesh, P(WORLD_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, shard), skin
    )


def shard_state_by_region(config: SimConfig, mesh: Mesh,
                          state: SimState) -> SimState:
    """Re-pack a global SimState so each shard's slot block holds exactly
    the agents inside its world region (required before
    build_world_step), then device_put with the engine's shardings."""
    import dataclasses as _dc

    import numpy as np

    from ..core.state import make_state

    d = mesh.shape[WORLD_AXIS]
    cfg0 = BucketConfig.create(
        config.grid.width, config.grid.height, config.grid.offset,
        config.max_eyesight, bucket=config.bucket_capacity,
        strip_tiles=config.strip_tiles, sub_tiles=config.sub_tiles,
        tile_size=config.bucket_tile_size or None,
    )
    tx = cfg0.tx
    if tx % d:
        tx = (tx // d + 1) * d
    region_w = cfg0.tile_size * (tx // d)
    n = config.capacity
    m = n // d
    host = jax.device_get(state)
    pos = np.asarray(host.position)
    alive = np.asarray(host.alive)
    region = np.clip(
        np.floor((pos[:, 0] - cfg0.offset[0]) / region_w).astype(np.int64),
        0, d - 1,
    )
    fresh = jax.device_get(make_state(config))
    per_agent = [
        fld.name for fld in _dc.fields(SimState)
        if np.asarray(getattr(host, fld.name)).ndim >= 1
        and np.asarray(getattr(host, fld.name)).shape[0] == n
        and fld.name != "rng_key"
    ]
    updates = {}
    for name in per_agent:
        arr = np.array(np.asarray(getattr(fresh, name)))
        src = np.asarray(getattr(host, name))
        for dev in range(d):
            rows = np.flatnonzero(alive & (region == dev))
            assert len(rows) <= m, (
                f"region {dev} holds {len(rows)} agents > shard capacity {m}"
            )
            arr[dev * m:dev * m + len(rows)] = src[rows]
        updates[name] = jnp.asarray(arr)
    out = host.replace(**updates)

    shard = NamedSharding(mesh, P(WORLD_AXIS))
    repl = NamedSharding(mesh, P())

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n:
            return jax.device_put(x, shard)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(put, out)


@struct.dataclass
class WorldCounters:
    """Per-step global counters from the world-sharded rollout."""

    n_alive: jax.Array
    n_spawned: jax.Array
    n_destroyed: jax.Array
    n_waypoint_reached: jax.Array
    spawn_dropped: jax.Array
    out_of_bounds: jax.Array
    max_cell_occupancy: jax.Array
    neighbor_truncated: jax.Array
    migrated: jax.Array
    migration_overflow: jax.Array
    arrival_dropped: jax.Array
    stray: jax.Array
    resorted: jax.Array


def build_world_rollout(
    config: SimConfig,
    hl_planners: Sequence[Any],
    lp_planners: Sequence[Any],
    mesh: Mesh,
    migration_capacity: int = 0,
):
    """Multi-step world-sharded rollout: ``rollout(params, state, dt,
    n_steps) -> (state, WorldCounters)`` with the scan inside the
    shard_map (one compiled SPMD program, no per-step re-entry)."""
    step = build_world_step(
        config, hl_planners, lp_planners, mesh,
        migration_capacity=migration_capacity,
    )
    tol = bool(getattr(step, "tolerance_mode", False))
    d = mesh.shape[WORLD_AXIS]
    # The shard_map'd step nests under scan (specs are loop-invariant).

    def _counters(st, ev, diag):
        return WorldCounters(
            n_alive=jnp.sum(st.alive.astype(jnp.int32)),
            n_spawned=jnp.sum(ev.spawned.astype(jnp.int32)),
            n_destroyed=jnp.sum(ev.destroyed.astype(jnp.int32)),
            n_waypoint_reached=jnp.sum(
                ev.waypoint_reached.astype(jnp.int32)
            ),
            spawn_dropped=ev.spawn_dropped,
            out_of_bounds=jnp.sum(ev.out_of_bounds.astype(jnp.int32)),
            max_cell_occupancy=ev.max_cell_occupancy,
            neighbor_truncated=ev.neighbor_truncated,
            migrated=diag.migrated,
            migration_overflow=diag.migration_overflow,
            arrival_dropped=diag.arrival_dropped,
            stray=diag.stray,
            resorted=diag.resorted,
        )

    def rollout(params, state, dt, n_steps: int):
        if tol:
            # Fresh (invalid) skin carry: the first step re-sorts every
            # shard; later steps amortize (WorldCounters.resorted).
            skin0 = dict(
                key=jnp.zeros((config.capacity,), jnp.int32),
                bpos=jnp.zeros((config.capacity,), jnp.int32),
                ref=jnp.zeros((config.capacity, 2), config.jdtype),
                max_occ=jnp.zeros((d,), jnp.int32),
                n_over=jnp.zeros((d,), jnp.int32),
                valid=jnp.zeros((d,), jnp.bool_),
            )

            def body(carry, _):
                st, sk = carry
                st, ev, diag, sk = step(params, st, dt, sk)
                return (st, sk), _counters(st, ev, diag)

            (state, _), cs = jax.lax.scan(
                body, (state, skin0), None, length=int(n_steps)
            )
            return state, cs

        def body(st, _):
            st, ev, diag = step(params, st, dt)
            return st, _counters(st, ev, diag)

        return jax.lax.scan(body, state, None, length=int(n_steps))

    return jax.jit(rollout, static_argnums=(3,), donate_argnums=(1,))
