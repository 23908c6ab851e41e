"""Slot-resident rollout (core/resident.py): the scanned rollout keeps
state IN the bucket layout between rebins.  Physics must match the
per-step-sort reference (same neighbor sets and forces; only f32
summation / tie order may differ — the presort tolerance class), spawns
must honor the PUBLIC capacity even though the internal state has slots
capacity, and unsupported configurations must fall back to the standard
engine."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rmf_crowdsim_tpu import (
    ConstantVelocity,
    GridConfig,
    MonotonicCrowd,
    SimConfig,
    SourceSink,
    Zanlungo,
    make_state,
)
from rmf_crowdsim_tpu.core.step import SimParams, build_rollout, build_step
from rmf_crowdsim_tpu.models.source_sink import stack_source_params


def _scene(capacity=256, vel=(0.05, 0.02), with_source=False, seed=5,
           source_rate=1.0):
    """grid_pallas scene with tile_size (6.0) > eyesight (3.0) so the
    skin margin is 1.5 m; a dense knot overflows bucket 16 so the spill
    (parked-agent) path is exercised, not just compiled."""
    cfg = SimConfig(
        capacity=capacity,
        grid=GridConfig(width=48.0, height=48.0, cell_size=3.0,
                        offset=(0.0, 0.0)),
        neighbor_backend="grid_pallas",
        max_eyesight=3.0,
        bucket_capacity=16,
        strip_tiles=6,
        sub_tiles=6,
        bucket_tile_size=6.0,
        spill_capacity=32,
        pallas_interpret=True,
        presort=True,
        resident=True,
        dtype="float32",
        on_truncation="ignore",
    )
    hl = ConstantVelocity(vel)
    lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.25,
                  force_cap=2.0)
    if with_source:
        src = SourceSink(
            source=(3.0, 24.0),
            waypoints=[(45.0, 24.0)],
            radius_sink=1.5,
            crowd_generator=MonotonicCrowd(source_rate),
            high_level_planner=hl,
            local_planner=lp,
            agent_eyesight_range=3.0,
        )
        sp = stack_source_params([src], [0], [0], [[-1]], cfg.jdtype)
    else:
        sp = None
    params = SimParams(hl=(hl.init_params(),), lp=(lp.init_params(),),
                       sources=sp)
    state = make_state(cfg, seed=9)
    rng = np.random.default_rng(seed)
    n = 120
    pos = np.zeros((capacity, 2))
    pos[:n] = rng.uniform(2.0, 46.0, (n, 2))
    pos[:24] = rng.uniform(0.0, 1.5, (24, 2)) + [20.0, 20.0]
    alive = np.zeros(capacity, bool)
    alive[:n] = True
    f = cfg.jdtype
    state = state.replace(
        position=jnp.asarray(pos, f),
        eyesight=jnp.where(jnp.asarray(alive), jnp.asarray(3.0, f), 0.0),
        alive=jnp.asarray(alive),
        uid=jnp.arange(capacity, dtype=jnp.int32),
        hl_idx=jnp.zeros((capacity,), jnp.int32),
        lp_idx=jnp.zeros((capacity,), jnp.int32),
        priority=jnp.arange(capacity, dtype=f),
        next_uid=jnp.asarray(capacity, jnp.int32),
    )
    return cfg, hl, lp, params, state


def _by_uid(state):
    uid = np.asarray(state.uid)
    alive = np.asarray(state.alive)
    pos = np.asarray(state.position)
    vel = np.asarray(state.velocity)
    return {int(u): (pos[i], vel[i]) for i, u in enumerate(uid) if alive[i]}


def _run_reference(cfg, hl, lp, params, state, n_steps, dt):
    """Per-step-sort reference: the plain (skin-off) step in a host loop."""
    step = jax.jit(build_step(cfg, [hl], [lp]))
    for _ in range(n_steps):
        state, _ev = step(params, state, dt)
    return state


def _assert_match(st_a, st_b, atol=2e-4):
    a, b = _by_uid(st_a), _by_uid(st_b)
    assert set(a) == set(b)
    for u in a:
        np.testing.assert_allclose(a[u][0], b[u][0], atol=atol, rtol=2e-4)
        np.testing.assert_allclose(a[u][1], b[u][1], atol=atol, rtol=2e-4)


def test_resident_engine_selected():
    cfg, hl, lp, _params, _state = _scene()
    assert build_rollout(cfg, [hl], [lp]).engine == "resident"
    cfg_std = dataclasses.replace(cfg, resident=False)
    assert build_rollout(cfg_std, [hl], [lp]).engine == "standard"


def test_resident_fallback_when_unsupported():
    """slots < capacity (tiny world, huge capacity) and non-pallas
    backends must fall back to the standard engine."""
    cfg, hl, lp, _params, _state = _scene()
    cfg_big = dataclasses.replace(cfg, capacity=100_000)
    assert build_rollout(cfg_big, [hl], [lp]).engine == "standard"
    cfg_np = dataclasses.replace(cfg, presort=False)
    assert build_rollout(cfg_np, [hl], [lp]).engine == "standard"


def test_resident_matches_standard_slow_scene():
    """Slow crowd (no mid-rollout rebins after the first): trajectories
    must match the per-step-sort reference to kernel tolerance, and the
    final state must come back at PUBLIC capacity."""
    cfg, hl, lp, params, state = _scene(vel=(0.05, 0.02))
    roll = build_rollout(cfg, [hl], [lp])
    assert roll.engine == "resident"
    roll = jax.jit(roll, static_argnums=(3,))
    st_res, counters = roll(params, state, 0.25, 12)
    assert st_res.capacity == cfg.capacity
    st_ref = _run_reference(cfg, hl, lp, params, state, 12, 0.25)
    assert int(np.max(np.asarray(counters.neighbor_truncated))) == 0
    _assert_match(st_res, st_ref)


def test_resident_matches_with_fast_agents():
    """Fast agents (0.9 m/step > 1.5 m margin within 2 steps) force
    rebins mid-rollout; trajectories must still match."""
    cfg, hl, lp, params, state = _scene(vel=(0.9, 0.4))
    roll = jax.jit(build_rollout(cfg, [hl], [lp]), static_argnums=(3,))
    st_res, _ = roll(params, state, 1.0, 8)
    st_ref = _run_reference(cfg, hl, lp, params, state, 8, 1.0)
    _assert_match(st_res, st_ref)


def test_resident_evicts_lone_breacher_exactly():
    """ONE fast agent among a slow crowd: it breaches the skin margin
    (2 m/step > 1.5 m) and crosses several tiles while the parked count
    stays far below the rebin threshold — so it is EVICTED to the spill
    list, not re-sorted, and its physics (and its neighbors') must still
    match the per-step-sort reference exactly: the spill windows center
    on its FRESH tile."""
    cfg, hl, lp, params, state = _scene(vel=(0.05, 0.02))
    fast = ConstantVelocity((2.0, 0.3))
    # Agent 3 sits mid-world (the knot is agents 0-23; pick a loner).
    state = state.replace(
        hl_idx=state.hl_idx.at[30].set(1),
        position=state.position.at[30].set(
            jnp.asarray([10.0, 30.0], state.position.dtype)
        ),
    )
    params2 = SimParams(hl=(hl.init_params(), fast.init_params()),
                        lp=params.lp, sources=None)
    roll = build_rollout(cfg, [hl, fast], [lp])
    assert roll.engine == "resident"
    roll = jax.jit(roll, static_argnums=(3,))
    st_res, counters = roll(params2, state, 1.0, 10)
    assert int(np.max(np.asarray(counters.neighbor_truncated))) == 0
    step = jax.jit(build_step(cfg, [hl, fast], [lp]))
    st_ref = state
    for _ in range(10):
        st_ref, _ev = step(params2, st_ref, 1.0)
    _assert_match(st_res, st_ref)


def test_resident_matches_with_source_sink():
    """Streaming scene: spawns rebin the resident layout the same step;
    despawns must NOT corrupt it (dead slots sentinel out of the plane
    build).  Population and trajectories must match the reference."""
    cfg, hl, lp, params, state = _scene(vel=(0.8, 0.0), with_source=True)
    roll = jax.jit(build_rollout(cfg, [hl], [lp]), static_argnums=(3,))
    st_res, counters = roll(params, state, 1.0, 10)
    st_ref = _run_reference(cfg, hl, lp, params, state, 10, 1.0)
    assert int(np.asarray(st_res.num_alive)) == int(
        np.asarray(st_ref.num_alive)
    )
    _assert_match(st_res, st_ref)


def test_resident_spawn_capacity_cap():
    """The internal state has slots (1024) capacity but spawns must stop
    at the PUBLIC capacity, exactly like a full standard state."""
    cfg, hl, lp, params, state = _scene(vel=(0.8, 0.0), with_source=True)
    # Tiny public capacity: 120 initial agents + room for ONE spawn.
    # Spawned agents clear the 0.4 m source disc within a step (0.8
    # m/step), so the generator wants ~1 spawn/step — 10 requests, 1
    # slot.
    small = 121
    cfg_s = dataclasses.replace(cfg, capacity=small)

    def shrink(a):
        return a[:small]

    state_s = state.replace(
        **{f: shrink(getattr(state, f)) for f in (
            "position", "velocity", "preferred_vel", "next_waypoint",
            "eyesight", "alive", "uid", "source_id", "hl_idx", "lp_idx",
            "route_id", "route_wp", "priority")}
    )
    roll = build_rollout(cfg_s, [hl], [lp])
    assert roll.engine == "resident"
    roll = jax.jit(roll, static_argnums=(3,))
    # Source spawns 1/step (rate 1.0, dt 1.0); sink at x=45 is far, so
    # nobody despawns within 10 steps: population must cap at 121.
    st, counters = roll(params, state_s, 1.0, 10)
    alive_per_step = np.asarray(counters.n_alive)
    assert int(alive_per_step.max()) == small
    assert int(np.asarray(st.num_alive)) == small
    # Spawns beyond capacity are counted as dropped.
    assert int(np.asarray(counters.spawn_dropped).sum()) >= 8
