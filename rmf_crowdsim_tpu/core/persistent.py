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
  criterion;
- tiles holding more agents than ``bucket_capacity`` spill into a
  fixed-capacity SIDE BUFFER carried between rebins: spill rows
  integrate elementwise like packed rows, and every step the agent-space
  spill machinery (ops/zanlungo_pallas._spill_groups) recomputes them
  and their 3x3 neighborhoods EXACTLY — the reference's unbounded cells
  (location_hash_2d.rs:15) without per-step re-sorting.  Only spills
  beyond ``spill_capacity`` are dropped (counted in ``info``).

Exactness: a candidate window reaches one tile (>= tile_size) beyond the
query's rebin-time tile.  For current-position neighbors within
``eyesight`` to always be covered, drift_q + drift_c + eyesight <=
tile_size suffices; rebinning at per-agent drift > skin enforces it.  So
trajectories are bitwise-identical to rebinning every step (tested),
except rows touched by the spill patch (tolerance-level sum-order
differences, like the general step's own spill path).

Scope: closed worlds — no SourceSinks, fixed alive set; HL planners must
implement ``plan_slots(params, packed) -> rec [rows, 2]``
(ConstantVelocity and ParityVelocity do).  The general step remains the
full-featured path.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.compact import compact_indices
from ..ops.zanlungo_pallas import (
    NUM_F,
    ROW_EYE,
    ROW_ID,
    ROW_PRIO,
    ROW_PX,
    ROW_PY,
    ROW_RX,
    ROW_SPX,
    ROW_VX,
    _spill_groups,
    sentinel_rows,
    zparams5,
    BucketConfig,
    bucketize,
    zanlungo_forces_bucketed,
)
from .config import SimConfig
from .state import SimState

ROW_UID = 14  # bucketize's `extra` column
_ID_BASE = 1 << 23  # spill-row id offset (ids stay exact in f32)


@struct.dataclass
class PersistentCarry:
    packed: jax.Array       # [slots, NUM_F] f32 — THE resident state
    spill: jax.Array        # [s_cap, NUM_F] f32 — bucket-overflow and
    #                         evicted skin-exceeder rows (front-filled)
    anchor: jax.Array       # [slots, 2] packed positions at last rebin
    #                         (spill rows need no anchor: their coverage
    #                         is rebuilt from CURRENT tiles every step)
    agent_slot: jax.Array   # [N] int32 — agent -> row at the LAST REBIN
    #                         (>= slots: spill entry; == slots + s_cap:
    #                         dropped)
    reloc: jax.Array        # [slots + s_cap + 1] int32 — rebin-time row
    #                         -> current row (identity except evictions,
    #                         which move a row at most once per epoch)
    sim_time: jax.Array     # []
    n_rebins: jax.Array     # [] int32
    n_evicted: jax.Array    # [] int32 — skin-exceeders moved to the
    #                         spill buffer instead of a full rebin
    max_occ: jax.Array      # [] int32 — worst tile occupancy seen
    dropped: jax.Array      # [] int32 — agents lost beyond the spill
    #                         buffer across all rebins (loud truncation)


def _extract_spills(rows, row_dest, slots: int, s_cap: int):
    """Compact rows whose bucketize destination overflowed (``row_dest ==
    slots`` while alive) into a [s_cap, NUM_F] buffer.  Returns (spill
    buffer, dest' [rows] int32 mapping every input row to its new home:
    packed slot | slots + spill row | slots + s_cap for dropped/dead,
    n_dropped)."""
    n_in = rows.shape[0]
    alive = rows[:, ROW_ID] >= 0
    over = alive & (row_dest >= slots)
    rank = jnp.cumsum(over.astype(jnp.int32)) - 1
    keep = over & (rank < s_cap)

    # k-th overflow row via the scatter-free compaction (ops/compact.py).
    c = compact_indices(over, s_cap)
    idx, valid = c.idx, c.valid

    sent = sentinel_rows(s_cap)
    spill = jnp.where(valid[:, None], rows[jnp.clip(idx, 0, n_in - 1)],
                      sent)
    # Spill rows get fresh position-based ids past every possible packed
    # id (packed ROW_ID = arange over the rebin input rows, < 2^23 by
    # the builder's assert) so the pair machinery's self-exclusion stays
    # sound and re-basing is idempotent.
    new_id = jnp.where(spill[:, ROW_ID] >= 0,
                       jnp.arange(s_cap, dtype=jnp.float32) + float(_ID_BASE),
                       -1.0)
    spill = spill.at[:, ROW_ID].set(new_id)

    dest = jnp.where(
        keep, jnp.int32(slots) + rank,
        jnp.where(row_dest < slots, row_dest, jnp.int32(slots + s_cap)),
    )
    # dtype-pinned: under x64 jnp.sum promotes to int64 and breaks the
    # lax.cond/scan carries.
    n_dropped = jnp.sum((over & ~keep).astype(jnp.int32), dtype=jnp.int32)
    return spill, dest, n_dropped


def _rebin(cfg: BucketConfig, packed, spill, s_cap: int,
           use_pack_kernel: bool, interpret: bool):
    """Re-bucketize packed + spill rows together; overflow refills the
    spill buffer.  Returns (packed', spill', dest [slots + s_cap] row ->
    new row, occ, dropped)."""
    rows = jnp.concatenate([packed, spill], axis=0)  # [slots + s_cap, F]
    alive = rows[:, ROW_ID] >= 0.0
    new_packed, move, occ, b_dropped = bucketize(
        cfg,
        rows[:, ROW_PX:ROW_PX + 2],
        rows[:, ROW_VX:ROW_VX + 2],
        rows[:, 4:6],              # committed pref (what neighbors see)
        rows[:, ROW_SPX:ROW_SPX + 2],
        rows[:, ROW_PRIO],
        rows[:, ROW_EYE],
        rows[:, ROW_RX:ROW_RX + 2],
        alive,
        use_pack_kernel=use_pack_kernel,
        interpret=interpret,
        extra=rows[:, ROW_UID],
    )
    new_spill, dest, n_dropped = _extract_spills(
        rows, move, cfg.slots, s_cap
    )
    # bucketize's dropped = bucket overflow (recovered into the spill
    # buffer above, counted by _extract_spills only past its capacity)
    # + PACK-WINDOW overflow (rows the streaming pack kernel could not
    # place: bucket_pos < slots but the slot holds the sentinel — those
    # rows are LOST here and must be loud).
    n_bucket_over = jnp.sum(
        (alive & (move >= cfg.slots)).astype(jnp.int32), dtype=jnp.int32
    )
    pack_dropped = jnp.maximum(
        b_dropped.astype(jnp.int32) - n_bucket_over, 0
    )
    return new_packed, new_spill, dest, occ, n_dropped + pack_dropped


def _patch_spills(cfg: BucketConfig, zp, packed, spill, out_slots,
                  spill_valid, interpret: bool = False,
                  int_prio: bool = False):
    """Slot-space spill patch: recompute each spill row and its 3x3
    packed neighborhood exactly (ops/zanlungo_pallas._spill_groups) and
    overwrite the kernel's outputs.  Returns (out_slots, spill_vel
    [s_cap, 2])."""
    s_cap = spill.shape[0]
    inv_tile = 1.0 / cfg.tile_size
    tcx = jnp.clip(jnp.floor(
        (spill[:, ROW_PX] - cfg.offset[0]) * inv_tile).astype(jnp.int32),
        0, cfg.tx - 1)
    tcy = jnp.clip(jnp.floor(
        (spill[:, ROW_PY] - cfg.offset[1]) * inv_tile).astype(jnp.int32),
        0, cfg.ty - 1)
    tcx = jnp.where(spill_valid, tcx, 1)
    tcy = jnp.where(spill_valid, tcy, 1)
    sp = dict(
        pos=spill[:, ROW_PX:ROW_PX + 2],
        vel=spill[:, ROW_VX:ROW_VX + 2],
        prefc=spill[:, 4:6],
        spref=spill[:, ROW_SPX:ROW_SPX + 2],
        prio=spill[:, ROW_PRIO],
        eye=spill[:, ROW_EYE],
        rec=spill[:, ROW_RX:ROW_RX + 2],
        id=jnp.where(spill_valid, spill[:, ROW_ID], -1.0),
    )
    n_live = jnp.sum(spill_valid.astype(jnp.int32), dtype=jnp.int32)

    def make_tier(cap: int):
        # The buffer is front-filled (entries never free between
        # rebins), so the first `cap` rows hold every live spill when
        # n_live <= cap.
        def tier(o):
            out, q_id, q_slots = _spill_groups(
                cfg, zp, packed,
                {k_: v_[:cap] for k_, v_ in sp.items()},
                tcx[:cap], tcy[:cap], spill_valid[:cap], chunk=16,
                interpret=interpret, int_prio=int_prio,
            )
            win_valid = q_id[:, :-1] >= 0
            tgt = jnp.where(win_valid, q_slots, jnp.int32(cfg.slots))
            o = o.at[tgt.reshape(-1)].set(
                out[:, :-1].reshape(-1, 2), mode="drop"
            )
            sv = jnp.zeros((s_cap, 2), jnp.float32)
            sv = sv.at[:cap].set(out[:, -1])
            return o, sv

        return tier

    def no_patch(o):
        return o, jnp.zeros((s_cap, 2), jnp.float32)

    tiers = sorted({min(16, s_cap), min(64, s_cap), min(192, s_cap),
                    s_cap})

    def dispatch(i, o):
        cap = tiers[i]
        if i + 1 == len(tiers):
            return make_tier(cap)(o)
        return jax.lax.cond(
            n_live <= cap, make_tier(cap),
            lambda oo: dispatch(i + 1, oo), o
        )

    # Fixed-shape group cost per tier; pick the smallest sufficient one
    # and skip entirely when the buffer is empty.
    return jax.lax.cond(
        n_live > 0, lambda o: dispatch(0, o), no_patch, out_slots
    )


def build_persistent_rollout(config: SimConfig, hl_planner: Any,
                             zanlungo: Any):
    """``rollout(params_hl, params_z, state0, dt, n_steps) ->
    (SimState, info)`` — the bucket-native fast path.

    ``state0`` is a standard SimState (closed scene); the result SimState
    carries the final positions/velocities in agent order.
    """
    assert config.grid is not None
    bucket_cfg = BucketConfig.create(
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
    # The resident rows' committed-pref columns (4:6, what neighbors
    # observe) are only refreshed at rebins, i.e. the engine implements
    # commit_preferred_vel=False semantics (the default).  Refusing the
    # True setting here beats silently diverging from the general step
    # (step.py commit phase).
    assert not config.commit_preferred_vel, (
        "the persistent rollout does not implement "
        "commit_preferred_vel=True (neighbors would observe stale "
        "committed prefs between rebins) — use the general step"
    )
    interp = config.pallas_interpret
    use_pack = config.use_pack_kernel
    int_prio = getattr(config, "integer_priorities", False)
    # Rounded to the spill-group chunk size (16).
    s_cap = ((max(16, int(config.spill_capacity)) + 15) // 16) * 16
    # Evictions only run while the spill buffer stays within the cheap
    # patch tier (see the eviction-policy comment below); this cap bounds
    # both the gate and the eviction compaction width.
    _EVICT_CAP = min(64, s_cap)
    slots = bucket_cfg.slots
    n_ext = slots + s_cap
    assert n_ext < _ID_BASE and config.capacity < _ID_BASE, (
        "row ids must stay exact in f32 below the spill id base"
    )

    def init_carry(state: SimState) -> PersistentCarry:
        n = state.capacity
        f32 = jnp.float32
        packed, bucket_pos, occ, b_dropped = bucketize(
            bucket_cfg, state.position, state.velocity,
            state.preferred_vel, state.preferred_vel, state.priority,
            state.eyesight, jnp.zeros_like(state.velocity), state.alive,
            use_pack_kernel=use_pack, interpret=interp,
            extra=state.uid.astype(f32),
        )
        # Initial spills come from the agent arrays; build their feature
        # rows in the bucketize layout.
        feat = jnp.stack([
            state.position[:, 0].astype(f32),
            state.position[:, 1].astype(f32),
            state.velocity[:, 0].astype(f32),
            state.velocity[:, 1].astype(f32),
            state.preferred_vel[:, 0].astype(f32),
            state.preferred_vel[:, 1].astype(f32),
            state.priority.astype(f32),
            jnp.where(state.alive, jnp.arange(n, dtype=f32), -1.0),  # ROW_ID
            jnp.zeros((n,), f32), jnp.zeros((n,), f32),  # rec
            state.eyesight.astype(f32),                  # ROW_EYE
            state.preferred_vel[:, 0].astype(f32),
            state.preferred_vel[:, 1].astype(f32),
            jnp.zeros((n,), f32),
            state.uid.astype(f32),
            jnp.ones((n,), f32),
        ], axis=-1)
        spill, dest, n_dropped = _extract_spills(
            feat, bucket_pos, slots, s_cap
        )
        # Pack-window overflow (rows lost by the streaming pack kernel)
        # — same loud accounting as _rebin.
        n_bucket_over = jnp.sum(
            (state.alive & (bucket_pos >= slots)).astype(jnp.int32),
            dtype=jnp.int32,
        )
        n_dropped = n_dropped + jnp.maximum(
            b_dropped.astype(jnp.int32) - n_bucket_over, 0
        )
        agent_slot = jnp.where(
            state.alive,
            jnp.where(bucket_pos < slots, bucket_pos, dest),
            n_ext,
        ).astype(jnp.int32)
        return PersistentCarry(
            packed=packed,
            spill=spill,
            anchor=packed[:, ROW_PX:ROW_PX + 2],
            agent_slot=agent_slot,
            reloc=jnp.arange(n_ext + 1, dtype=jnp.int32),
            sim_time=state.sim_time,
            n_rebins=jnp.zeros((), jnp.int32),
            n_evicted=jnp.zeros((), jnp.int32),
            max_occ=occ,
            dropped=n_dropped,
        )

    def rollout(params_hl, params_z, state0: SimState, dt, n_steps: int):
        f = config.jdtype
        dt = jnp.asarray(dt, jnp.float32)
        z5 = zparams5(params_z)
        carry0 = init_carry(state0)

        def step(c: PersistentCarry, _):
            packed, spill = c.packed, c.spill
            alive_p = packed[:, ROW_ID] >= 0.0
            alive_s = spill[:, ROW_ID] >= 0.0

            # HL pass in slot space -> rec velocity columns (8, 9) and
            # the fresh own-pref columns (11, 12), on BOTH planes.
            rec = hl_planner.plan_slots(params_hl, packed)
            packed = packed.at[:, ROW_RX:ROW_RX + 2].set(rec)
            packed = packed.at[:, ROW_SPX:ROW_SPX + 2].set(rec)
            rec_s = hl_planner.plan_slots(params_hl, spill)
            spill = spill.at[:, ROW_RX:ROW_RX + 2].set(rec_s)
            spill = spill.at[:, ROW_SPX:ROW_SPX + 2].set(rec_s)

            # Fused Zanlungo forces on the resident layout, then the
            # exact spill repair for overflow rows + their neighborhoods.
            out = zanlungo_forces_bucketed(
                bucket_cfg, z5, packed, interpret=interp,
                int_prio=int_prio,
            )  # [slots, 2]
            out, spill_vel = _patch_spills(
                bucket_cfg, params_z, packed, spill, out, alive_s,
                interpret=interp, int_prio=int_prio,
            )
            vel = jnp.where(alive_p[:, None], out, 0.0)
            vel_s = jnp.where(alive_s[:, None], spill_vel, 0.0)

            # Euler integration, elementwise on both planes.
            pos = packed[:, ROW_PX:ROW_PX + 2] + vel * dt
            packed = packed.at[:, ROW_PX:ROW_PX + 2].set(pos)
            packed = packed.at[:, ROW_VX:ROW_VX + 2].set(vel)
            pos_s = spill[:, ROW_PX:ROW_PX + 2] + vel_s * dt
            spill = spill.at[:, ROW_PX:ROW_PX + 2].set(pos_s)
            spill = spill.at[:, ROW_VX:ROW_VX + 2].set(vel_s)

            # Skin check over PACKED rows only (spill rows need no
            # anchor — their coverage is rebuilt from current tiles
            # every step).  Exceeders are EVICTED into the spill
            # buffer's free entries; a full rebin fires only when the
            # buffer cannot absorb them — so a handful of fast outliers
            # (the per-pair force cap allows ~1.35 m/step kicks) no
            # longer forces whole-array re-sorts every couple of steps.
            drift = jnp.where(
                alive_p, jnp.max(jnp.abs(pos - c.anchor), axis=-1), 0.0
            )
            exceed = drift > skin
            n_exceed = jnp.sum(exceed.astype(jnp.int32), dtype=jnp.int32)
            n_free_spill = jnp.sum((~alive_s).astype(jnp.int32),
                                   dtype=jnp.int32)
            n_live_s = s_cap - n_free_spill
            # Eviction policy (round-3 correction): the per-step spill
            # patch's cost is set by its TIER (the smallest cap >= live
            # spill count), while a full rebin is only ~15-18 ms real at
            # 1M (the round-2 "~70 ms" was the dispatch-RTT artifact,
            # DESIGN_NOTES.md).  Letting evictions fill the buffer to
            # s_cap pushed every subsequent step onto the top patch tier
            # — the measured 160 ms/step.  So: evict only while the
            # buffer stays within the cheap tier; rebin otherwise.
            evict_ok = (n_exceed + n_live_s) <= jnp.int32(_EVICT_CAP)
            need_rebin = (n_exceed > 0) & ~evict_ok

            def do_rebin(args):
                p, sp_ = args
                np_, ns_, dest, occ, drop = _rebin(
                    bucket_cfg, p, sp_, s_cap, use_pack, interp
                )
                # Compose: rebin-epoch slot -> current row (evictions)
                # -> new row; reset the relocation lut.
                dest_pad = jnp.concatenate(
                    [dest, jnp.asarray([n_ext], jnp.int32)]
                )
                a_slot = dest_pad[c.reloc[jnp.clip(c.agent_slot, 0, n_ext)]]
                return (np_, ns_, np_[:, ROW_PX:ROW_PX + 2], a_slot,
                        jnp.arange(n_ext + 1, dtype=jnp.int32), occ, drop,
                        jnp.int32(1), jnp.int32(0))

            def do_evict(args):
                p, sp_ = args
                # Ordered compaction of the exceeder slots.  The evict
                # gate guarantees n_exceed + n_live_s <= the tier cap,
                # so every exceeder fits a free entry and eviction order
                # is irrelevant (the old worst-drifter-first lax.top_k
                # over the full [slots] plane cost ~45 ms/step at 1M —
                # it ran on EVERY step with any exceeder).
                ec = compact_indices(exceed, _EVICT_CAP)
                valid = ec.valid
                idx = jnp.clip(ec.idx, 0, slots - 1)
                rows = p[idx]                       # [_EVICT_CAP, NUM_F]
                # Free spill entries, ascending (buffer is front-filled
                # and entries never free between rebins).
                free_rank = jnp.sort(jnp.where(
                    ~alive_s, jnp.arange(s_cap, dtype=jnp.int32),
                    jnp.int32(s_cap),
                ))
                # Rank r eviction -> r-th free entry (compaction is
                # ordered, so rank r is just r; _EVICT_CAP <= s_cap).
                tgt = jnp.where(
                    valid, free_rank[:_EVICT_CAP], jnp.int32(s_cap)
                )
                sp_ = sp_.at[tgt].set(rows, mode="drop")
                # Position-based spill ids (unique past every packed id).
                live = sp_[:, ROW_ID] >= 0
                sp_ = sp_.at[:, ROW_ID].set(jnp.where(
                    live,
                    jnp.arange(s_cap, dtype=jnp.float32) + float(_ID_BASE),
                    -1.0,
                ))
                # Sentinelize the evicted packed slots.
                sent_row = sentinel_rows(_EVICT_CAP)
                p = p.at[jnp.where(valid, idx, slots)].set(
                    sent_row, mode="drop"
                )
                n_moved = jnp.sum(valid.astype(jnp.int32), dtype=jnp.int32)
                reloc = c.reloc.at[jnp.where(valid, idx, n_ext)].set(
                    jnp.where(valid, jnp.int32(slots) + tgt, n_ext),
                    mode="drop",
                )
                return (p, sp_, c.anchor, c.agent_slot, reloc,
                        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                        jnp.int32(0), n_moved)

            def do_nothing(args):
                p, sp_ = args
                return (p, sp_, c.anchor, c.agent_slot, c.reloc,
                        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                        jnp.int32(0), jnp.int32(0))

            (packed, spill, anchor, agent_slot, reloc, occ, drop, did,
             moved) = jax.lax.cond(
                need_rebin, do_rebin,
                lambda a: jax.lax.cond(n_exceed > 0, do_evict,
                                       do_nothing, a),
                (packed, spill),
            )
            c = PersistentCarry(
                packed=packed,
                spill=spill,
                anchor=anchor,
                agent_slot=agent_slot,
                reloc=reloc,
                sim_time=c.sim_time + dt.astype(c.sim_time.dtype),
                n_rebins=c.n_rebins + did,
                n_evicted=c.n_evicted + moved,
                max_occ=jnp.maximum(c.max_occ, occ),
                dropped=c.dropped + drop,
            )
            return c, None

        carry, _ = jax.lax.scan(step, carry0, None, length=n_steps)

        # Unpack to agent order (rows live in packed or the spill
        # plane; evictions since the last rebin resolve via the
        # relocation lut).
        rows = jnp.concatenate([carry.packed, carry.spill], axis=0)
        cur_slot = carry.reloc[jnp.clip(carry.agent_slot, 0, n_ext)]
        safe = jnp.clip(cur_slot, 0, n_ext - 1)
        ok = (cur_slot < n_ext) & state0.alive
        pos = jnp.where(ok[:, None],
                        rows[safe][:, ROW_PX:ROW_PX + 2],
                        state0.position.astype(jnp.float32)).astype(f)
        vel = jnp.where(ok[:, None], rows[safe][:, ROW_VX:ROW_VX + 2],
                        0.0).astype(f)
        state = state0.replace(position=pos, velocity=vel,
                               sim_time=carry.sim_time)
        info = {"n_rebins": carry.n_rebins, "max_occupancy": carry.max_occ,
                "dropped": carry.dropped, "n_evicted": carry.n_evicted}
        return state, info

    return rollout
