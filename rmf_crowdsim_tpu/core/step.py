"""The simulation step as a single pure, jittable function.

TPU-native redesign of ``Simulation::step`` (lib.rs:195-383).  One call to
``step(params, state, dt)`` performs the reference's four phases as fused
array ops over the fixed-capacity SoA state:

  Phase A  spawn from SourceSinks        (lib.rs:199-254)
  Phase B  planner + integration pass    (lib.rs:259-347)
  Phase C  commit                        (lib.rs:350-359)
  Phase D  despawn                       (lib.rs:378-380)

Key deliberate divergences from the reference (see SURVEY.md §3.1):

- **Fully synchronous neighbors.**  The reference iterates a HashMap in
  unspecified order and mutates its spatial index mid-loop (lib.rs:299), so
  dense Zanlungo results are iteration-order-dependent.  Here every
  neighbor read comes from step-start (post-spawn) state — deterministic,
  and the only semantics that parallelize.
- **sim_time advances.**  The reference never increments it, so planners
  always see t=0 (lib.rs:81,110).
- **Out-of-grid agents flag an event** instead of erroring the whole step
  (location_hash_2d.rs:61-63 → lib.rs:299-302).
- **Rogue agents** (waypoint index past the end) are removed without the
  reference's latent panic (lib.rs:310-314 still indexes past the end).
- **waypoint_reached events actually fire** (dead hook in the reference,
  lib.rs:32 vs lib.rs:317).

Everything else — spawn-before-motion ordering, the one-spawn-per-source
cap gated on an empty 0.4 m disc of *pre-spawn* state, new spawns moving
within their spawn step, waypoint checks against *pre-integration*
positions, commit-then-remove — matches the reference step for step (the
SourceSink lifecycle test reproduces event_listeners_test.rs:64-111
exactly).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..models.source_sink import GEN_CUSTOM, GEN_POISSON, SourceParams
from ..ops import grid as grid_ops
from ..ops import neighbors as nbr_ops
from .config import (
    BACKEND_BRUTE,
    BACKEND_CUSTOM,
    BACKEND_GRID,
    BACKEND_GRID_DENSE,
    BACKEND_GRID_PALLAS,
    SimConfig,
)
from .state import SimState, StepEvents


@struct.dataclass
class SimParams:
    """Dynamic (non-retracing) simulation parameters: one params pytree per
    registered planner, plus the stacked SourceSink table."""

    hl: Tuple[Any, ...]
    lp: Tuple[Any, ...]
    sources: Optional[SourceParams]


def _spawn_phase(config: SimConfig, sp: SourceParams, state: SimState, dt,
                 key):
    """Phase A (lib.rs:199-254): per active source, ask its generator for a
    count; if positive and no alive agent sits strictly within
    ``spawn_clearance`` of the source (hard-coded 0.4 in the reference,
    lib.rs:214), spawn exactly ONE agent at the source.  Surplus requested
    spawns are dropped (no queue; reference TODO at lib.rs:209-211).

    All clearance checks read the PRE-spawn spatial index: the reference
    collects every source's ``get_neighbours_in_radius`` decision in a
    first read-only map pass (lib.rs:199-222, the first ``collect()``),
    and only then inserts the new agents in a second pass (lib.rs:224-234
    → add_agents → lib.rs:146).  A same-step spawn from one source can
    therefore never block a co-located source; both spawn.
"""
    n = state.capacity
    f = config.jdtype
    s = sp.source.shape[0]

    rt = sp.rate * jnp.asarray(dt, f)
    # MonotonicCrowd: round half away from zero (Rust f64::round,
    # source_sink.rs:98-99).  PoissonCrowd: Poisson(rate*dt).
    mono = jnp.floor(rt + 0.5).astype(jnp.int32)
    pois = jax.random.poisson(key, rt.astype(jnp.float32)).astype(jnp.int32)
    n_requested = jnp.where(sp.gen_kind == GEN_POISSON, pois, mono)
    # Custom host generators (source_sink.rs:30-33 trait parity): the host
    # called get_number_to_spawn(dt) and stored the result per source.
    n_requested = jnp.where(
        sp.gen_kind == GEN_CUSTOM, sp.custom_count, n_requested
    )
    n_requested = jnp.where(sp.active, n_requested, 0)

    # Clearance gate against pre-spawn state: any alive agent strictly
    # within spawn_clearance of the source blocks the spawn.  Evaluated
    # as a dense elementwise pass, CHUNKED over sources so peak memory
    # stays [<=64, N] however many sources the scene has.  A grid-binned
    # per-source lookup is NOT the right TPU design at this N: any
    # per-agent table lookup pays the measured ~10 ns/row gather floor
    # (~10 ms at 1M — DESIGN_NOTES "Hard-won XLA cost model"), while the
    # brute pass is pure elementwise VPU work (~6 ops/pair at ~2.8 T/s
    # plus one [N,2] re-read per chunk): ~4 ms at S=1024 x N=1M and
    # microseconds at the reference-scale scenes.  Decisions are
    # bitwise-identical chunked or not (same per-pair arithmetic; `any`
    # is order-free over booleans).
    clear = jnp.asarray(config.spawn_clearance, f)

    def _blocked_chunk(srcs):  # [c, 2] -> [c]
        diff = state.position[None, :, :] - srcs[:, None, :]  # [c, N, 2]
        dist = jnp.linalg.norm(diff, axis=-1)
        return jnp.any(state.alive[None, :] & (dist < clear), axis=1)

    CH = 64
    if s <= CH:
        blocked = _blocked_chunk(sp.source)
    else:
        pad = (-s) % CH
        src_pad = jnp.concatenate(
            [sp.source, jnp.full((pad, 2), jnp.asarray(1e30, f))], axis=0
        )
        blocked = jax.lax.map(
            _blocked_chunk, src_pad.reshape(-1, CH, 2)
        ).reshape(-1)[:s]
    want = (n_requested > 0) & ~blocked

    # Slot allocation: k-th spawning source takes the k-th free slot.
    free = ~state.alive
    n_free = jnp.sum(free.astype(jnp.int32))
    slot_of_rank = jnp.sort(
        jnp.where(free, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    )  # ascending free-slot indices, padded with n
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1  # [S]
    can = want & (rank < n_free)
    slot = slot_of_rank[jnp.clip(rank, 0, n - 1)]
    # Out-of-bounds target drops the scatter for non-spawning sources.
    tgt = jnp.where(can, slot, jnp.int32(n))

    new_uid = (state.next_uid + rank).astype(jnp.int32)
    src_idx = jnp.arange(s, dtype=jnp.int32)

    def scat(arr, vals):
        return arr.at[tgt].set(vals, mode="drop")

    zero2 = jnp.zeros((s, 2), f)
    # Route leg 0: source -> waypoints[0] (the reference's spawn-time
    # set_target, lib.rs:242-249; -1 for non-route planners).
    leg0 = sp.leg_route[:, 0]

    state = state.replace(
        position=scat(state.position, sp.source),
        velocity=scat(state.velocity, zero2),
        preferred_vel=scat(state.preferred_vel, zero2),
        next_waypoint=scat(state.next_waypoint, jnp.zeros((s,), jnp.int32)),
        eyesight=scat(state.eyesight, sp.eyesight),
        alive=scat(state.alive, jnp.ones((s,), jnp.bool_)),
        uid=scat(state.uid, new_uid),
        source_id=scat(state.source_id, src_idx),
        hl_idx=scat(state.hl_idx, sp.hl_idx),
        lp_idx=scat(state.lp_idx, sp.lp_idx),
        route_id=scat(state.route_id, leg0),
        route_wp=scat(state.route_wp, jnp.zeros((s,), jnp.int32)),
        # Zanlungo right-of-way priority defaults to the agent id
        # (zanlungo.rs:94-98, 183-184).
        priority=scat(state.priority, new_uid.astype(f)),
        # dtype-pinned sum: under x64 jnp.sum would promote to int64 and
        # break the lax.scan carry.
        next_uid=state.next_uid
        + jnp.sum(can.astype(jnp.int32), dtype=jnp.int32),
    )
    spawned = jnp.zeros((n,), jnp.bool_).at[tgt].set(True, mode="drop")
    dropped = jnp.sum(n_requested) - jnp.sum(can.astype(jnp.int32))
    return state, spawned, dropped


def _hl_phase(config: SimConfig, hl_planners, params: SimParams,
              state: SimState):
    """High-level planner pass (lib.rs:263-273): vel starts at zero; a
    planner returning Some sets both vel and (the clone's)
    preferred_vel.  Returns (vel, self_pref, state-with-route_wp).
    Operates on whatever capacity ``state`` has."""
    n = state.capacity
    f = config.jdtype
    vel = jnp.zeros((n, 2), f)
    self_pref = state.preferred_vel
    route_wp = state.route_wp
    for i, planner in enumerate(hl_planners):
        res = planner.plan(params.hl[i], state)
        sel = state.hl_idx == jnp.int32(i)
        use = sel & res.valid & state.alive
        vel = jnp.where(use[:, None], res.vel, vel)
        self_pref = jnp.where(use[:, None], res.vel, self_pref)
        route_wp = jnp.where(sel & state.alive, res.route_wp, route_wp)
    return vel, self_pref, state.replace(route_wp=route_wp)


def _sink_phase(config: SimConfig, hl_planners, params: SimParams,
                state: SimState):
    """SourceSink waypoint bookkeeping (lib.rs:304-336) against the
    PRE-integration position (lib.rs:314 reads agent.position before the
    commit).  Returns (state, destroyed, reached).  Shared by the
    standard step."""
    n = state.capacity
    destroyed = jnp.zeros((n,), jnp.bool_)
    reached = jnp.zeros((n,), jnp.bool_)
    if params.sources is None:
        return state, destroyed, reached
    sp = params.sources
    s = sp.source.shape[0]
    w = sp.waypoints.shape[1]
    has_ss = state.alive & (state.source_id >= 0)
    src = jnp.clip(state.source_id, 0, s - 1)
    wlen = sp.n_waypoints[src]
    # Rogue agent: waypoint index past the end -> terminate
    # (lib.rs:308-313; reference then still indexes the waypoint
    # array — latent panic — we just remove).
    rogue = has_ss & (state.next_waypoint >= wlen)
    wp_c = jnp.clip(state.next_waypoint, 0, w - 1)
    target = sp.waypoints[src, wp_c]  # [N, 2]
    d = jnp.linalg.norm(state.position - target, axis=-1)
    reached = has_ss & ~rogue & (d < sp.radius_sink[src])
    at_last = state.next_waypoint == wlen - 1
    looping = sp.loop_forever[src]
    despawn = reached & at_last & ~looping
    wrap = reached & at_last & looping
    advance = reached & ~at_last
    next_wp = jnp.where(
        wrap,
        0,
        jnp.where(advance, state.next_waypoint + 1, state.next_waypoint),
    )
    # set_target for route-following planners on advance
    # (lib.rs:325-334): assign the precomputed next leg.  NOTE the
    # reference does NOT call set_target on loop_forever wraparound
    # (lib.rs:318-320) — looping route-agents keep their old route;
    # replicated by not reassigning on `wrap`.
    route_id = state.route_id
    route_wp = state.route_wp
    for i, planner in enumerate(hl_planners):
        if getattr(planner, "uses_routes", False):
            sel = advance & (state.hl_idx == jnp.int32(i))
            new_rid = sp.leg_route[src, jnp.clip(next_wp, 0, w - 1)]
            route_id = jnp.where(sel, new_rid, route_id)
            route_wp = jnp.where(sel, 0, route_wp)
    destroyed = despawn | rogue
    state = state.replace(
        next_waypoint=jnp.where(has_ss, next_wp, state.next_waypoint),
        route_id=route_id,
        route_wp=route_wp,
    )
    return state, destroyed, reached


def payload_sort_by_key(state: SimState, key, spawned):
    """ONE unstable ``lax.sort`` with the whole SoA state as payloads,
    ordered by ``key`` [N] int32 — the presort primitive of the
    tile-sorted step (core/step.py) and the world-sharded tolerance
    mode (parallel/worldstep.py).

    Returns (sorted state, sorted spawned mask, sorted keys).

    Unstable: stability costs an internal iota tiebreak (measured
    perf/sort_stable_ab.py: 6.81 vs 5.84 ms per [1M] 14-payload sort).
    Tie order among same-key agents shifts (a) f32 force-sum order and
    (b) WHICH agents take a full bucket's slots vs overflow to the spill
    path.  (b) is exact while the spill repair covers the overflow (the
    default); if spill capacity itself overruns, which agents get
    truncated becomes tie-order-dependent — still counted and surfaced
    via neighbor_truncated, but run-shape-dependent.  Physics parity is
    tolerance-tested either way (test_presort) and XLA sort stays
    deterministic for fixed input.

    The four small fields ride one packed i32 (planner registries are
    < 256 by the build_step assert; alive/spawned are bits).
    hl_idx/lp_idx carry a -1 "none" sentinel (make_state fills dead
    slots with it), so each packs +1-BIASED into 9 bits — OR-ing a raw
    -1 would set every bit and resurrect dead slots as alive."""
    small = (
        (state.hl_idx + 1)
        | ((state.lp_idx + 1) << 9)
        | (state.alive.astype(jnp.int32) << 18)
        | (spawned.astype(jnp.int32) << 19)
    )
    res = jax.lax.sort(
        (
            key,
            state.position[:, 0], state.position[:, 1],
            state.velocity[:, 0], state.velocity[:, 1],
            state.preferred_vel[:, 0], state.preferred_vel[:, 1],
            state.next_waypoint, state.eyesight,
            state.uid, state.source_id, state.route_id,
            state.route_wp, state.priority, small,
        ),
        num_keys=1, is_stable=False,
    )
    (key_s, px, py, vx, vy, fx, fy, nwp, eye, uidc, sid, rid, rwp,
     prio, small) = res
    state = state.replace(
        position=jnp.stack([px, py], axis=-1),
        velocity=jnp.stack([vx, vy], axis=-1),
        preferred_vel=jnp.stack([fx, fy], axis=-1),
        next_waypoint=nwp, eyesight=eye,
        alive=((small >> 18) & 1).astype(jnp.bool_),
        uid=uidc, source_id=sid,
        hl_idx=(small & 0x1FF) - 1,
        lp_idx=((small >> 9) & 0x1FF) - 1,
        route_id=rid, route_wp=rwp, priority=prio,
    )
    spawned = ((small >> 19) & 1).astype(jnp.bool_)
    return state, spawned, key_s


def _finish_phase(config: SimConfig, hl_planners, params: SimParams,
                  state: SimState, vel, self_pref, spawned, spawn_dropped,
                  max_occ, truncated, dt):
    """The step's tail: Euler integration (lib.rs:295-297),
    out-of-grid flag (vs the reference erroring the whole step,
    lib.rs:299-302), SourceSink waypoint bookkeeping (lib.rs:304-336),
    Phase C commit (lib.rs:350-359), Phase D despawn, and the event
    record.  Returns (state, events, destroyed)."""
    n = state.capacity
    f = config.jdtype
    new_pos = state.position + vel * dt

    if config.grid is not None:
        _, _, in_bounds = grid_ops.cell_coords(config.grid, new_pos)
        out_of_bounds = state.alive & ~in_bounds
    else:
        out_of_bounds = jnp.zeros((n,), jnp.bool_)

    state, destroyed, reached = _sink_phase(
        config, hl_planners, params, state
    )

    alive_pre = state.alive
    pos_premove = state.position
    committed_pref = (
        jnp.where(alive_pre[:, None], self_pref, state.preferred_vel)
        if config.commit_preferred_vel
        else state.preferred_vel
    )
    state = state.replace(
        position=jnp.where(alive_pre[:, None], new_pos, state.position),
        velocity=jnp.where(alive_pre[:, None], vel, state.velocity),
        preferred_vel=committed_pref,
        alive=alive_pre & ~destroyed,
        sim_time=state.sim_time + dt,
    )

    events = StepEvents(
        spawned=spawned,
        destroyed=destroyed,
        waypoint_reached=reached,
        # agent_spawned fires with the spawn position (lib.rs:151-153),
        # before the agent's first integration.
        spawn_position=jnp.where(
            spawned[:, None], pos_premove, jnp.zeros((n, 2), f)
        ),
        destroyed_uid=jnp.where(destroyed, state.uid, -1),
        # Reference prints "Reached waypoint" with the pre-move
        # position in scope (lib.rs:314-317); report the same.
        waypoint_position=jnp.where(
            reached[:, None], pos_premove, jnp.zeros((n, 2), f)
        ),
        out_of_bounds=out_of_bounds,
        spawn_dropped=spawn_dropped.astype(jnp.int32),
        max_cell_occupancy=max_occ,
        neighbor_truncated=truncated,
    )
    return state, events, destroyed


def build_step(
    config: SimConfig,
    hl_planners: Sequence[Any],
    lp_planners: Sequence[Any],
    world_mesh=None,
    neighbor_fn=None,
    skin_mode: bool = False,
):
    """Construct ``step(params, state, dt) -> (state, events)``.

    ``skin_mode`` (skin-deferred presort): requests the variant
    ``step(params, state, dt, skin) -> (state, events, skin)`` that
    SKIPS the per-step tile sort + rank while no agent has moved more
    than ``(tile_size - max_eyesight) / 2`` (infinity-norm) since the
    last sort and no agent spawned or despawned — the classic
    Verlet-skin argument: within that margin every true neighbor pair's
    LAST-SORT tiles are still adjacent, so binning by the carried keys
    keeps kernel coverage exact while pair masks use fresh positions
    (neighbor sets and forces stay exact; only f32 summation order can
    differ from a freshly-sorted binning).  Granted only when the
    presort path is active and the margin is positive — check the
    returned function's ``skin_mode`` attribute; when False the plain
    3-argument step is returned.  At bench velocities the sort+rank
    (~9.6 ms at 1M) amortizes over ~10+ steps.

    ``hl_planners`` / ``lp_planners`` are the planner registries (static:
    changing them retraces); agents select by ``state.hl_idx`` /
    ``state.lp_idx``, replacing the reference's per-agent
    ``Arc<Mutex<dyn Planner>>`` maps (lib.rs:77-79).

    ``world_mesh``: optional jax Mesh with axis ``"world_x"``; the
    grid_pallas force pass then runs domain-decomposed across it
    (parallel/domain.py) — cfg.tx must divide the mesh size.

    ``neighbor_fn``: required when ``config.neighbor_backend ==
    "custom"`` — a pure function ``(state) -> NeighborSet`` traced into
    the jitted step; the TPU-native replacement for implementing the
    reference's SpatialIndex trait (spatial_index.rs:4-14).  It must be
    jittable with static shapes and set ``NeighborSet.truncated``
    honestly (any silently dropped candidate is a physics divergence).
    """
    hl_planners = tuple(hl_planners)
    lp_planners = tuple(lp_planners)
    if config.neighbor_backend == BACKEND_CUSTOM and neighbor_fn is None:
        raise ValueError(
            "neighbor_backend='custom' requires a neighbor_fn"
        )
    assert len(hl_planners) < 256 and len(lp_planners) < 256, (
        "planner indices must fit the presort bit-pack"
    )

    if config.neighbor_backend == BACKEND_GRID:
        window = config.grid.window_radius(config.max_eyesight)
    else:
        window = None

    bucket_cfg = None
    if config.neighbor_backend == BACKEND_GRID_PALLAS:
        from ..ops.zanlungo_pallas import BucketConfig

        bucket_cfg = BucketConfig.create(
            config.grid.width, config.grid.height, config.grid.offset,
            config.max_eyesight, bucket=config.bucket_capacity,
            strip_tiles=config.strip_tiles, sub_tiles=config.sub_tiles,
            tile_size=config.bucket_tile_size or None,
        )
        if world_mesh is not None:
            import dataclasses as _dc

            d = world_mesh.devices.size
            if bucket_cfg.tx % d:
                bucket_cfg = _dc.replace(
                    bucket_cfg, tx=(bucket_cfg.tx // d + 1) * d
                )

    dense_cfg = None
    if config.neighbor_backend == BACKEND_GRID_DENSE:
        from ..ops.zanlungo_dense import DenseConfig

        if world_mesh is not None:
            raise ValueError(
                "grid_dense is single-chip only; use grid_pallas with a "
                "world_mesh or the world-sharded engine"
            )
        dense_cfg = DenseConfig.create(
            config.grid.width, config.grid.height, config.grid.offset,
            config.max_eyesight, config.capacity,
            tile_size=config.bucket_tile_size or None,
            col_headroom=config.dense_col_headroom,
        )

    # Tile-sorted state (see the presort block in step()): grid_pallas /
    # grid_dense only, and not under domain decomposition (the mesh path
    # keeps its own per-shard ordering).  The dense layout IS the sorted
    # order, so grid_dense implies presort.
    presort = bool(
        (getattr(config, "presort", False) or dense_cfg is not None)
        and (bucket_cfg is not None or dense_cfg is not None)
        and world_mesh is None
    )
    sort_cfg = dense_cfg if dense_cfg is not None else bucket_cfg
    skin_margin = 0.0
    if sort_cfg is not None:
        skin_margin = (
            float(sort_cfg.tile_size) - float(config.max_eyesight)
        ) / 2.0
    skin_mode = bool(skin_mode and presort and skin_margin > 0.0)

    def neighbor_table(state: SimState) -> nbr_ops.NeighborSet:
        if config.neighbor_backend == BACKEND_CUSTOM:
            return neighbor_fn(state)
        if config.neighbor_backend == BACKEND_BRUTE:
            return nbr_ops.brute_neighbors(state.position, state.eyesight, state.alive)
        return grid_ops.grid_neighbors(
            config.grid,
            state.position,
            state.eyesight,
            state.alive,
            window=window or config.grid.window_radius(config.max_eyesight),
            max_per_cell=config.max_per_cell,
        )

    def _presort_state(state: SimState, spawned):
        """The tile sort (see the presort comment block below): returns
        (sorted state, sorted spawned mask, sorted tile keys)."""
        from ..ops.zanlungo_pallas import tile_key

        tkey = tile_key(sort_cfg, state.position, state.alive)
        st, spwn, key_s = payload_sort_by_key(state, tkey, spawned)
        return st, spwn, key_s

    def step(params: SimParams, state: SimState, dt, skin=None):
        n = config.capacity
        f = config.jdtype
        dt = jnp.asarray(dt, f)
        key, spawn_key = jax.random.split(state.rng_key)
        state = state.replace(rng_key=key)

        # ---- Phase A: spawn --------------------------------------------
        if params.sources is not None:
            state, spawned, spawn_dropped = _spawn_phase(
                config, params.sources, state, dt, spawn_key
            )
        else:
            spawned = jnp.zeros((n,), jnp.bool_)
            spawn_dropped = jnp.zeros((), jnp.int32)

        # ---- Presort: keep state tile-sorted (config.presort) ----------
        # One lax.sort with the whole SoA state as payloads (~30 ms at 1M)
        # replaces bucketize's argsort + feature gather + inverse scatter
        # (~90 ms of per-element-addressing-bound XLA permutation ops,
        # DESIGN_NOTES.md).  Runs AFTER spawn so new agents are in order;
        # the spawned mask rides along as a payload.  Slot indices are not
        # stable across steps (identity is uid); f32 force-sum order
        # changes tie-breaks only.
        # Sort cost scales with payload count (~0.5 ms per [1M]
        # payload): the four small fields ride one packed i32
        # (planner registries are < 256 by the build_step assert;
        # alive/spawned are bits).  hl_idx/lp_idx carry a -1 "none"
        # sentinel (make_state fills dead slots with it), so each
        # packs +1-BIASED into 9 bits — OR-ing a raw -1 would set
        # every bit and resurrect dead slots as alive.
        binning = None
        dense_key = None
        skin_out = None
        if skin_mode:
            # Skin-deferred presort: reuse the carried sort order AND
            # binning while every agent is within the skin margin of its
            # position at the last sort and the population is unchanged
            # (spawns break sortedness; despawns would leave dead agents
            # packed as live candidates).  See build_step's docstring
            # for the exactness argument.
            from ..ops.zanlungo_pallas import rank_from_sorted_key

            d = jnp.abs(state.position - skin["ref"])
            disp = jnp.max(jnp.where(state.alive[:, None], d,
                                     jnp.zeros((), f)))
            need = (
                (~skin["valid"])
                | jnp.any(spawned)
                | (disp > jnp.asarray(skin_margin, f))
            )

            def _do_sort(op):
                st, spwn = op
                st2, spwn2, tkey2 = _presort_state(st, spwn)
                if dense_cfg is not None:
                    # The dense kernel derives its own tables from the
                    # sorted keys each step; only the key is carried.
                    bpos = jnp.zeros((n,), jnp.int32)
                    occ = jnp.zeros((), jnp.int32)
                    nover = jnp.zeros((), jnp.int32)
                else:
                    bpos, occ, nover = rank_from_sorted_key(
                        bucket_cfg, tkey2)
                return (st2, spwn2, tkey2, bpos, occ, nover,
                        st2.position)

            def _reuse(op):
                st, spwn = op
                return (st, spwn, skin["key"], skin["bpos"],
                        skin["max_occ"], skin["n_over"], skin["ref"])

            (state, spawned, tkey_c, bpos_c, occ_c, nover_c, ref_c
             ) = jax.lax.cond(need, _do_sort, _reuse, (state, spawned))
            binning = (tkey_c, bpos_c, occ_c, nover_c)
            dense_key = tkey_c
            skin_out = dict(key=tkey_c, bpos=bpos_c, max_occ=occ_c,
                            n_over=nover_c, ref=ref_c, resorted=need)
        elif presort:
            state, spawned, dense_key = _presort_state(state, spawned)

        # ---- Phase B: planners (post-spawn, step-start state) ----------
        vel, self_pref, state = _hl_phase(config, hl_planners, params, state)

        # Local pass (lib.rs:276-292): neighbor candidates from step-start
        # state, then each local planner corrects the recommended velocity.
        # With the grid_pallas backend, planners providing a fused kernel
        # (Zanlungo) skip the candidate table entirely.
        max_occ = jnp.zeros((), jnp.int32)
        truncated = jnp.zeros((), jnp.int32)
        if lp_planners:
            nbr = None
            use_fused = bucket_cfg is not None
            use_dense = dense_cfg is not None
            need_nbr = any(
                getattr(p, "needs_neighbors", True)
                and not ((use_fused and hasattr(p, "plan_fused"))
                         or (use_dense
                             and hasattr(p, "plan_fused_dense")))
                for p in lp_planners
            )
            if need_nbr:
                nbr = neighbor_table(state)
                max_occ = nbr.max_cell_occupancy
                truncated = truncated + nbr.truncated
            for i, planner in enumerate(lp_planners):
                if use_dense and hasattr(planner, "plan_fused_dense"):
                    v, occ, dropped = planner.plan_fused_dense(
                        params.lp[i], dense_cfg, state, vel, self_pref,
                        dense_key,
                        interpret=config.pallas_interpret,
                        int_prio=getattr(config, "integer_priorities",
                                         False),
                        dual_row=getattr(config, "dual_row", False),
                    )
                    max_occ = jnp.maximum(max_occ, occ)
                    truncated = truncated + dropped
                elif use_fused and hasattr(planner, "plan_fused"):
                    v, occ, dropped = planner.plan_fused(
                        params.lp[i], bucket_cfg, state, vel, self_pref,
                        interpret=config.pallas_interpret,
                        world_mesh=world_mesh,
                        use_pack_kernel=config.use_pack_kernel,
                        spill_capacity=config.spill_capacity,
                        presorted=presort,
                        int_prio=getattr(config, "integer_priorities",
                                         False),
                        dual_row=getattr(config, "dual_row", False),
                        binning=binning,
                        fused_spills=getattr(config, "fused_spills",
                                             False),
                    )
                    max_occ = jnp.maximum(max_occ, occ)
                    truncated = truncated + dropped
                else:
                    v = planner.plan(params.lp[i], state, nbr, vel, self_pref)
                sel = (state.lp_idx == jnp.int32(i)) & state.alive
                vel = jnp.where(sel[:, None], v, vel)

        state, events, destroyed = _finish_phase(
            config, hl_planners, params, state, vel, self_pref, spawned,
            spawn_dropped, max_occ, truncated, dt,
        )
        if skin_mode:
            # Despawns do NOT invalidate the carried binning: bucketize's
            # carried path packs fresh-dead rows INERT (position sentinel,
            # id -1 — fresh-dead masking), so a dead agent can never act
            # as a force candidate.  Its freed slot is only ever reused
            # by a spawn, which triggers a resort above.
            skin_out["valid"] = jnp.ones((), jnp.bool_)
            return state, events, skin_out
        return state, events

    step.skin_mode = skin_mode
    return step


@struct.dataclass
class RolloutCounters:
    """Per-step event summaries from a scanned rollout.  Full [T, N] event
    masks would cost T×N bools of HBM; the scan instead reduces each step's
    masks to counters — the information the reference's EventListener
    accounting tests actually assert on (event_listeners_test.rs:97-110)."""

    n_alive: jax.Array  # [T] int32 — population after each step
    n_spawned: jax.Array  # [T] int32
    n_destroyed: jax.Array  # [T] int32
    n_waypoint_reached: jax.Array  # [T] int32
    spawn_dropped: jax.Array  # [T] int32
    out_of_bounds: jax.Array  # [T] int32
    max_cell_occupancy: jax.Array  # [T] int32
    neighbor_truncated: jax.Array  # [T] int32


@struct.dataclass
class EventStream:
    """Per-step compacted event records from a scanned rollout: fixed-K
    uid (+ position) lists per event kind, so the fast ``run()`` path can
    honor the reference's exact per-id EventListener contract
    (lib.rs:151-153, 189-191; waypoint hook lib.rs:32/317) without
    materializing [T, N] masks.  Unused entries hold uid -1; a step whose
    events exceed K is counted in ``overflow`` (callers must surface —
    delivery would be incomplete)."""

    spawned_uid: jax.Array    # [T, K] int32, -1 padded
    spawned_pos: jax.Array    # [T, K, 2]
    destroyed_uid: jax.Array  # [T, K] int32, -1 padded
    reached_uid: jax.Array    # [T, K] int32, -1 padded
    reached_pos: jax.Array    # [T, K, 2]
    overflow: jax.Array       # [T] int32 — events dropped this step
    counters: RolloutCounters


def _compact_events(mask, uid, k: int, pos=None):
    """Compact ``uid[mask]`` (and optionally positions) into fixed-``k``
    rows, first-slot-first.  Returns (uid_k, pos_k | None, n_dropped)."""
    from ..ops.compact import compact_indices

    c = compact_indices(mask, k)
    safe = jnp.clip(c.idx, 0, mask.shape[0] - 1)
    uid_k = jnp.where(c.valid, uid[safe].astype(jnp.int32), -1)
    pos_k = None
    if pos is not None:
        pos_k = jnp.where(c.valid[:, None], pos[safe],
                          jnp.zeros((), pos.dtype))
    return uid_k, pos_k, c.n_over


def emit_rollout_record(ev: StepEvents, st: SimState, k: int):
    """Per-step scan output of the scanned rollout:
    :class:`RolloutCounters` when ``k`` == 0, else an :class:`EventStream`
    row (compact per-uid records, up to ``k`` per kind)."""
    c = RolloutCounters(
        n_alive=st.num_alive,
        n_spawned=jnp.sum(ev.spawned.astype(jnp.int32)),
        n_destroyed=jnp.sum(ev.destroyed.astype(jnp.int32)),
        n_waypoint_reached=jnp.sum(ev.waypoint_reached.astype(jnp.int32)),
        spawn_dropped=ev.spawn_dropped,
        out_of_bounds=jnp.sum(ev.out_of_bounds.astype(jnp.int32)),
        max_cell_occupancy=ev.max_cell_occupancy,
        neighbor_truncated=ev.neighbor_truncated,
    )
    if k == 0:
        return c
    # uids: spawned/reached agents are alive with their uid in
    # post-step state; destroyed uids come from the event record.
    s_uid, s_pos, s_drop = _compact_events(
        ev.spawned, st.uid, k, ev.spawn_position
    )
    d_uid, _, d_drop = _compact_events(ev.destroyed, ev.destroyed_uid, k)
    r_uid, r_pos, r_drop = _compact_events(
        ev.waypoint_reached, st.uid, k, ev.waypoint_position
    )
    return EventStream(
        spawned_uid=s_uid,
        spawned_pos=s_pos,
        destroyed_uid=d_uid,
        reached_uid=r_uid,
        reached_pos=r_pos,
        overflow=s_drop + d_drop + r_drop,
        counters=c,
    )


def build_rollout(
    config: SimConfig,
    hl_planners: Sequence[Any],
    lp_planners: Sequence[Any],
    event_capacity: int = 0,
    neighbor_fn=None,
):
    """Construct ``rollout(params, state, dt, n_steps) -> (state, ys)``:
    ``n_steps`` simulation steps under one ``lax.scan`` — the multi-step
    analog of calling ``Simulation::step`` in a loop (lib.rs:195), with zero
    host round-trips between steps.

    ``event_capacity`` == 0 (default): ``ys`` is :class:`RolloutCounters`
    (cheap anonymous per-step summaries).  > 0: ``ys`` is an
    :class:`EventStream` carrying exact per-step uid/position records (up
    to ``event_capacity`` per kind per step) for host-side EventListener
    replay.  ``neighbor_fn``: see :func:`build_step`.

    On the presorted grid_pallas path the rollout runs the SKIN-DEFERRED
    presort (see :func:`build_step`): the scan carries the last sort's
    order/binning and only resorts when an agent outruns the skin margin
    or the population changes — on slow-moving scenes the per-step
    sort + rank amortizes away.

    (The slot-resident engine that kept state in the bucket layout
    between rebins was DELETED in round 5 — measured 9.8 vs 17.8
    steps/s on the bench scene; DESIGN_NOTES.md post-mortem.)"""
    step = build_step(config, hl_planners, lp_planners,
                      neighbor_fn=neighbor_fn, skin_mode=True)
    uses_skin = bool(getattr(step, "skin_mode", False))
    k = int(event_capacity)

    def rollout(params: SimParams, state: SimState, dt, n_steps: int):
        n = config.capacity
        skin0 = None
        if uses_skin:
            skin0 = dict(
                valid=jnp.zeros((), jnp.bool_),
                key=jnp.zeros((n,), jnp.int32),
                bpos=jnp.zeros((n,), jnp.int32),
                max_occ=jnp.zeros((), jnp.int32),
                n_over=jnp.zeros((), jnp.int32),
                ref=jnp.zeros((n, 2), config.jdtype),
                resorted=jnp.zeros((), jnp.bool_),
            )

        def body(carry, _):
            if uses_skin:
                st, sk = carry
                st, ev, sk = step(params, st, dt, sk)
            else:
                st = carry
                st, ev = step(params, st, dt)
            out_carry = (st, sk) if uses_skin else st
            return out_carry, emit_rollout_record(ev, st, k)

        carry0 = (state, skin0) if uses_skin else state
        carry, ys = jax.lax.scan(body, carry0, None, length=n_steps)
        if uses_skin:
            carry = carry[0]
        return carry, ys

    rollout.engine = "standard"
    return rollout
