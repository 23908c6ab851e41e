"""Slot-resident rollout: the state lives IN the bucket layout.

The standard grid_pallas step pays a per-step round-trip between agent
order and the force kernel's bucket layout: bucketize packs 16 feature
columns into the slot planes (~7.8 ms at 1M, ops/pack_pallas.py) and the
kernel output is gathered back per agent (~3-7 ms).  The skin-deferred
presort (core/step.py skin_mode) already proves the BINNING itself can be
carried across steps — within the skin margin every agent's tile
assignment stays valid.  This module carries the LAYOUT too: between
rebins the SoA state has capacity ``cfg.slots`` and row ``r`` IS bucket
slot ``r``'s agent, so

- the packed planes are pure elementwise masking + feature stacks of the
  state columns (~2 ms; no rank, no pack kernel),
- the kernel output IS the per-agent velocity (no unbucketize gather),
- a REBIN is a double sort: tile-sort the whole state
  (payload_sort_by_key), rank it (rank_from_sorted_key), then sort again
  by each row's absolute target slot — in-bucket agents to their bucket
  slot, everyone else (bucket overflow "parked" agents + dead rows) into
  the free slots, where the elementwise plane build masks them out.

Parked alive agents are repaired exactly by ops/zanlungo_pallas
.spill_patch each step, identically to the standard engine's overflow
handling.  Unlike the skin engine, DESPAWNS do not invalidate the carried
layout: the plane build masks by the CURRENT alive column, so a dead
agent's slot sentinels out for free.  Rebins trigger only on spawns or
on an agent outrunning the skin margin.

This is a revival of round-2's bucket-resident "persistent engine"
(deleted in round 4, DESIGN_NOTES "Persistent engine: closed") with the
one structural fix that killed it: that engine pre-dated the skin
argument and EVICTED/REINSERTED agents between rebins through a per-step
spill-buffer patch that cost more than the prep it saved.  With carried
binning there is no eviction at all — an agent keeps its slot until a
rebin, exactly (core/step.py skin_mode's exactness argument).

Semantics match the standard rollout (lib.rs:195-383 phases, see
core/step.py) up to f32 summation order — candidate lane order within a
bucket differs from the per-step-sorted engine's, the same tolerance
class as config.presort itself.  The public contract is preserved: the
rollout takes and returns capacity-``config.capacity`` states (expansion
to slots capacity and final compaction are internal), and spawns beyond
``config.capacity`` alive agents are dropped exactly as the standard
engine drops them at a full state (``_spawn_phase`` ``max_alive``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from .config import BACKEND_GRID_PALLAS, SimConfig
from .state import SimState
from .step import (
    SimParams,
    _finish_phase,
    _hl_phase,
    _spawn_phase,
    emit_rollout_record,
    payload_sort_by_key,
)

# SimState array fields (leading dim = capacity) with their dead-row fill
# values — mirrors make_state (core/state.py).
_ARRAY_FIELDS = (
    ("position", 0), ("velocity", 0), ("preferred_vel", 0),
    ("next_waypoint", 0), ("eyesight", 0), ("alive", False),
    ("uid", -1), ("source_id", -1), ("hl_idx", -1), ("lp_idx", -1),
    ("route_id", -1), ("route_wp", 0), ("priority", 0),
)


def resident_supported(config: SimConfig, hl_planners, lp_planners,
                       neighbor_fn=None):
    """Whether the slot-resident engine can run this configuration.

    Returns (ok, reason).  Structural requirements only — when False the
    caller falls back to the standard rollout, which handles every
    configuration (the resident engine is a pure optimization with
    identical semantics)."""
    if config.neighbor_backend != BACKEND_GRID_PALLAS:
        return False, "resident engine requires the grid_pallas backend"
    if not config.presort:
        return False, "resident engine requires config.presort"
    if neighbor_fn is not None:
        return False, "custom neighbor_fn runs on the standard engine"
    from ..ops.zanlungo_pallas import BucketConfig

    bcfg = BucketConfig.create(
        config.grid.width, config.grid.height, config.grid.offset,
        config.max_eyesight, bucket=config.bucket_capacity,
        strip_tiles=config.strip_tiles, sub_tiles=config.sub_tiles,
        tile_size=config.bucket_tile_size or None,
    )
    margin = (float(bcfg.tile_size) - float(config.max_eyesight)) / 2.0
    if margin <= 0.0:
        return False, "skin margin <= 0 (tile_size <= max_eyesight)"
    if bcfg.slots < config.capacity:
        return False, (
            f"slots ({bcfg.slots}) < capacity ({config.capacity}): the "
            "resident layout cannot park every agent"
        )
    if config.spill_capacity <= 0:
        return False, (
            "resident engine requires spill_capacity > 0 (parked "
            "overflow agents and skin-breach evictees ride the exact "
            "spill patch)"
        )
    if bcfg.tx < 5 or bcfg.ty < 5:
        return False, "spill machinery needs a >= 5x5-tile world"
    from ..models.local import Zanlungo

    for p in lp_planners:
        # The resident step dispatches fused planners straight to
        # zanlungo_fused_resident (it assumes params.lp[i] is a Zanlungo
        # param tuple), so a plan_fused attribute alone is not enough —
        # a future non-Zanlungo fused planner must NOT silently get
        # Zanlungo physics here; it falls back to the standard engine.
        if isinstance(p, Zanlungo):
            continue
        if getattr(p, "needs_neighbors", True):
            return False, (
                f"local planner {type(p).__name__} is not supported by "
                "the resident engine (only Zanlungo's fused kernel and "
                "neighbor-free planners are)"
            )
    return True, ""


def _expand_state(state: SimState, r_cap: int) -> SimState:
    """Pad a capacity-N state to the resident capacity with dead rows
    (make_state fill values)."""
    n = state.capacity
    pad = r_cap - n
    upd = {}
    for name, fill in _ARRAY_FIELDS:
        arr = getattr(state, name)
        shape = (pad,) + arr.shape[1:]
        upd[name] = jnp.concatenate(
            [arr, jnp.full(shape, fill, arr.dtype)], axis=0
        )
    return state.replace(**upd)


def _compact_state(state: SimState, n: int) -> SimState:
    """Sort alive rows to the front and slice back to capacity ``n``.
    Alive count never exceeds ``n`` (_spawn_phase max_alive); row order
    within the result is unspecified — agent identity is uid, as
    everywhere else under config.presort."""
    key = jnp.where(state.alive, 0, 1).astype(jnp.int32)
    st, _, _ = payload_sort_by_key(
        state, key, jnp.zeros((state.capacity,), jnp.bool_)
    )
    return st.replace(
        **{name: getattr(st, name)[:n] for name, _ in _ARRAY_FIELDS}
    )


def build_resident_rollout(
    config: SimConfig,
    hl_planners: Sequence[Any],
    lp_planners: Sequence[Any],
    event_capacity: int = 0,
):
    """Construct ``rollout(params, state, dt, n_steps)`` on the
    slot-resident engine — same contract as core/step.build_rollout.
    Call :func:`resident_supported` first; this builder asserts it."""
    hl_planners = tuple(hl_planners)
    lp_planners = tuple(lp_planners)
    ok, why = resident_supported(config, hl_planners, lp_planners)
    assert ok, why
    from ..ops.zanlungo_pallas import (
        BucketConfig,
        rank_from_sorted_key,
        tile_key,
        zanlungo_fused_resident,
    )

    bcfg = BucketConfig.create(
        config.grid.width, config.grid.height, config.grid.offset,
        config.max_eyesight, bucket=config.bucket_capacity,
        strip_tiles=config.strip_tiles, sub_tiles=config.sub_tiles,
        tile_size=config.bucket_tile_size or None,
    )
    r_cap = bcfg.slots
    margin = (float(bcfg.tile_size) - float(config.max_eyesight)) / 2.0
    n_pub = config.capacity
    k = int(event_capacity)
    f = config.jdtype
    int_prio = bool(getattr(config, "integer_priorities", False))
    dual_row = bool(getattr(config, "dual_row", False))
    # Global-rebin pressure threshold: rebin before the parked set
    # (bucket overflow + skin-breach evictees) can overrun the spill
    # tiers (beyond which agents would be truncated, loudly).
    parked_cap = max(1, (3 * config.spill_capacity) // 4)

    def _rebin(state: SimState, spawned):
        """Double-sort rebin: tile-sort, rank, then place every row at an
        absolute target slot.  Returns (state, spawned, in_bucket [R],
        max_occ, ref positions)."""
        tkey = tile_key(bcfg, state.position, state.alive)
        st, spwn, key_s = payload_sort_by_key(state, tkey, spawned)
        bpos, max_occ, _ = rank_from_sorted_key(bcfg, key_s)
        in_b = bpos < jnp.int32(r_cap)  # [R], sorted order

        # Free slots, scatter-free (XLA scatters pay ~137 ns/update —
        # DESIGN_NOTES): merge in-bucket targets (even keys 2*bpos) with
        # one probe per slot (odd keys 2*r + 1) and sort; probe r is
        # preceded by 2r exactly when slot r is taken.  Rebins are rare
        # (skin margin), so this path is cost-tolerant.
        iota = jnp.arange(r_cap, dtype=jnp.int32)
        merged = jnp.concatenate(
            [jnp.where(in_b, 2 * bpos, jnp.int32(2 * r_cap + 2)),
             2 * iota + 1]
        )
        ms = jnp.sort(merged)
        prev = jnp.concatenate([jnp.full((1,), -5, jnp.int32), ms[:-1]])
        occ_probe = (prev == ms - 1) & (ms % 2 == 1)
        slot_r = jnp.where(ms % 2 == 1, (ms - 1) // 2, jnp.int32(r_cap))
        _, occ_flag = jax.lax.sort(
            (slot_r, occ_probe.astype(jnp.int32)), num_keys=1
        )
        occupied = occ_flag[:r_cap].astype(jnp.bool_)  # [R], slot order

        # k-th non-in-bucket row -> k-th free slot.  #free == #others
        # exactly (every row is in-bucket, parked or dead; R == slots).
        nth_free = jnp.sort(jnp.where(occupied, jnp.int32(r_cap), iota))
        others_rank = jnp.cumsum((~in_b).astype(jnp.int32)) - 1
        target = jnp.where(
            in_b, bpos, nth_free[jnp.clip(others_rank, 0, r_cap - 1)]
        )
        st2, spwn2, _ = payload_sort_by_key(st, target, spwn)
        return st2, spwn2, occupied, max_occ, st2.position

    def step(params: SimParams, state: SimState, dt, skin):
        dt = jnp.asarray(dt, f)
        key, spawn_key = jax.random.split(state.rng_key)
        state = state.replace(rng_key=key)

        # ---- Phase A: spawn (public-capacity cap) ----------------------
        if params.sources is not None:
            state, spawned, spawn_dropped = _spawn_phase(
                config, params.sources, state, dt, spawn_key,
                max_alive=n_pub,
            )
        else:
            spawned = jnp.zeros((r_cap,), jnp.bool_)
            spawn_dropped = jnp.zeros((), jnp.int32)

        # ---- Rebin, or evict skin-breachers and reuse the layout -------
        # Unlike the skin engine, (a) despawns do NOT invalidate (the
        # plane build masks by the live alive column every step) and (b)
        # an agent outrunning the skin margin does NOT force a global
        # resort: it is EVICTED to the parked set, where the spill patch
        # recomputes it and everyone it affects exactly.  Exactness of
        # fresh-tile spill windows for arbitrary breacher drift: an
        # affected query A has |A_ref - B_fresh| <= eye + margin =
        # (eye + tile)/2 < tile (inside the 3x3), and A's candidate C
        # has |C_ref - B_fresh| <= 2*eye + margin < 2*tile (inside the
        # 5x5) — both need only the NON-evicted agents' skin bound,
        # which eviction itself maintains.  A GLOBAL rebin fires only on
        # spawns, or when the parked set (overflow + evictees) would
        # pressure the spill capacity — including the coherent case
        # where a whole drifting crowd breaches in one step.
        d = jnp.abs(state.position - skin["ref"])
        breach = (
            state.alive & skin["in_bucket"]
            & (jnp.max(d, axis=-1) > jnp.asarray(margin, f))
        )
        parked = state.alive & ~skin["in_bucket"]
        n_risk = jnp.sum((parked | breach).astype(jnp.int32))
        need = (
            (~skin["valid"])
            | jnp.any(spawned)
            | (n_risk > jnp.int32(parked_cap))
        )

        def _do(op):
            return _rebin(*op)

        def _reuse(op):
            st, spwn = op
            return (st, spwn, skin["in_bucket"] & ~breach,
                    skin["max_occ"], skin["ref"])

        state, spawned, in_bucket, max_occ, ref = jax.lax.cond(
            need, _do, _reuse, (state, spawned)
        )

        # ---- Phase B: planners -----------------------------------------
        vel, self_pref, state = _hl_phase(
            config, hl_planners, params, state
        )

        # Spill windows center on each spill's FRESH tile (tile_xy=None;
        # exact for arbitrary evictee drift — see the eviction comment
        # above; parked overflow agents are within skin of their stale
        # tile, where fresh == stale +-1 anyway).
        from ..models.local import Zanlungo

        truncated = jnp.zeros((), jnp.int32)
        for i, planner in enumerate(lp_planners):
            if isinstance(planner, Zanlungo):
                v, dropped = zanlungo_fused_resident(
                    bcfg, params.lp[i], state.position, state.velocity,
                    self_pref, state.preferred_vel, state.priority,
                    state.eyesight, state.alive, vel, in_bucket,
                    tile_xy=None,
                    interpret=config.pallas_interpret, int_prio=int_prio,
                    dual_row=dual_row,
                    spill_capacity=config.spill_capacity,
                )
                truncated = truncated + dropped
            else:  # needs_neighbors is False (resident_supported)
                v = planner.plan(params.lp[i], state, None, vel, self_pref)
            sel = (state.lp_idx == jnp.int32(i)) & state.alive
            vel = jnp.where(sel[:, None], v, vel)

        state, events, _ = _finish_phase(
            config, hl_planners, params, state, vel, self_pref, spawned,
            spawn_dropped, max_occ, truncated, dt,
        )
        skin_out = dict(
            valid=jnp.ones((), jnp.bool_), in_bucket=in_bucket,
            max_occ=max_occ, ref=ref,
        )
        return state, events, skin_out

    def rollout(params: SimParams, state: SimState, dt, n_steps: int):
        assert state.capacity == n_pub, (
            "resident rollout takes public-capacity states"
        )
        rs = _expand_state(state, r_cap)
        skin0 = dict(
            valid=jnp.zeros((), jnp.bool_),
            in_bucket=jnp.zeros((r_cap,), jnp.bool_),
            max_occ=jnp.zeros((), jnp.int32),
            ref=jnp.zeros((r_cap, 2), f),
        )

        def body(carry, _):
            st, sk = carry
            st, ev, sk = step(params, st, dt, sk)
            return (st, sk), emit_rollout_record(ev, st, k)

        (rs, _), ys = jax.lax.scan(
            body, (rs, skin0), None, length=n_steps
        )
        return _compact_state(rs, n_pub), ys

    rollout.engine = "resident"
    return rollout
