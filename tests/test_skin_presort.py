"""Skin-deferred presort (core/step.py build_step(skin_mode=True)): the
scanned rollout skips the per-step tile sort + rank while every agent
stays within the skin margin ((tile - eyesight)/2) of its last-sort
position and the population is unchanged.  Physics must match the
per-step-sort path (same neighbor sets and forces; only f32 summation /
tie order may differ), and the resort triggers must fire on fast
motion, spawns and despawns."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def _scene(capacity=256, vel=(0.05, 0.02), with_source=False, seed=5):
    """grid_pallas scene with tile_size (6.0) > eyesight (3.0) so the
    skin margin is 1.5 m and the skin path activates."""
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
            crowd_generator=MonotonicCrowd(1.0),
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
    # a dense knot that overflows bucket 16 (spill path active)
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


@pytest.mark.slow
def test_skin_rollout_matches_per_step_sort_slow_scene():
    """Slow crowd: the skin path skips most sorts; trajectories must
    match the per-step-sort reference to kernel tolerance."""
    cfg, hl, lp, params, state = _scene(vel=(0.05, 0.02))
    roll = jax.jit(build_rollout(cfg, [hl], [lp]), static_argnums=(3,))
    st_skin, counters = roll(params, state, 0.25, 12)
    st_ref = _run_reference(cfg, hl, lp, params, state, 12, 0.25)
    assert int(np.max(np.asarray(counters.neighbor_truncated))) == 0
    _assert_match(st_skin, st_ref)


@pytest.mark.slow
def test_skin_rollout_matches_with_fast_agents():
    """Fast agents (0.9 m/step > 1.5 m margin within 2 steps) force
    resorts mid-rollout; trajectories must still match."""
    cfg, hl, lp, params, state = _scene(vel=(0.9, 0.4))
    roll = jax.jit(build_rollout(cfg, [hl], [lp]), static_argnums=(3,))
    st_skin, _ = roll(params, state, 1.0, 8)
    st_ref = _run_reference(cfg, hl, lp, params, state, 8, 1.0)
    _assert_match(st_skin, st_ref)


@pytest.mark.slow
def test_skin_rollout_matches_with_source_sink():
    """Spawns and despawns invalidate the carried binning; streaming
    scene must match the per-step-sort reference exactly in population
    and to tolerance in trajectories."""
    cfg, hl, lp, params, state = _scene(vel=(0.8, 0.0), with_source=True)
    roll = jax.jit(build_rollout(cfg, [hl], [lp]), static_argnums=(3,))
    st_skin, counters = roll(params, state, 1.0, 10)
    st_ref = _run_reference(cfg, hl, lp, params, state, 10, 1.0)
    assert int(np.asarray(st_skin.num_alive)) == int(
        np.asarray(st_ref.num_alive)
    )
    _assert_match(st_skin, st_ref)


def test_skin_step_skips_and_retriggers():
    """Direct step-level check of the resort trigger: step 1 sorts
    (invalid carry), step 2 skips (slow motion), and a displacement past
    the margin triggers a resort."""
    cfg, hl, lp, params, state = _scene(vel=(0.05, 0.0))
    step = build_step(cfg, [hl], [lp], skin_mode=True)
    assert step.skin_mode
    step = jax.jit(step)
    n = cfg.capacity
    skin = dict(
        valid=jnp.zeros((), jnp.bool_),
        key=jnp.zeros((n,), jnp.int32),
        bpos=jnp.zeros((n,), jnp.int32),
        max_occ=jnp.zeros((), jnp.int32),
        n_over=jnp.zeros((), jnp.int32),
        ref=jnp.zeros((n, 2), cfg.jdtype),
        resorted=jnp.zeros((), jnp.bool_),
    )
    state, _, skin = step(params, state, 0.25, skin)
    assert bool(skin["resorted"])  # first step always sorts
    state, _, skin = step(params, state, 0.25, skin)
    assert not bool(skin["resorted"])  # 12.5 mm move << 1.5 m margin
    # Teleport one agent by 2 m (> margin): next step must resort.
    state = state.replace(
        position=state.position.at[0, 0].add(2.0)
    )
    state, _, skin = step(params, state, 0.25, skin)
    assert bool(skin["resorted"])


def test_skin_disabled_when_margin_zero():
    """tile_size == eyesight (the default) leaves no skin margin: the
    builder falls back to the plain per-step-sort step."""
    cfg, hl, lp, params, state = _scene()
    cfg0 = dataclasses.replace(cfg, bucket_tile_size=None)
    step = build_step(cfg0, [hl], [lp], skin_mode=True)
    assert not step.skin_mode
