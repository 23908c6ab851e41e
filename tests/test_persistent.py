"""Persistent bucket-native rollout vs the general step: same
trajectories, far fewer rebins."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmf_crowdsim_tpu import (
    GridConfig,
    ParityVelocity,
    SimConfig,
    SimParams,
    Zanlungo,
    build_step,
    make_state,
)
from rmf_crowdsim_tpu.core.persistent import build_persistent_rollout


def scene(n=48, world=36.0):
    cfg = SimConfig(
        capacity=n,
        grid=GridConfig(width=world, height=world, cell_size=3.0,
                        offset=(0.0, 0.0)),
        neighbor_backend="grid_pallas",
        max_eyesight=3.0,
        bucket_capacity=32,
        strip_tiles=4,
        sub_tiles=2,
        bucket_tile_size=6.0,
        pallas_interpret=True,
        dtype="float32",
    )
    hl = ParityVelocity((1.0, 0.4))
    lp = Zanlungo(1.2, 1.0, 0.0, 1.5, 2.0, 0.25, force_cap=20.0)
    rng = np.random.default_rng(3)
    state = make_state(cfg)
    f = cfg.jdtype
    pos = rng.uniform(3.0, world - 3.0, (n, 2))
    state = state.replace(
        position=jnp.asarray(pos, f),
        eyesight=jnp.full((n,), 3.0, f),
        alive=jnp.ones((n,), bool),
        uid=jnp.arange(n, dtype=jnp.int32),
        hl_idx=jnp.zeros((n,), jnp.int32),
        lp_idx=jnp.zeros((n,), jnp.int32),
        priority=jnp.arange(n, dtype=f),
        next_uid=jnp.asarray(n, jnp.int32),
    )
    return cfg, hl, lp, state


@pytest.mark.parametrize("n_steps,dt", [(10, 0.05), (25, 0.1)])
def test_persistent_matches_general_step(n_steps, dt):
    cfg, hl, lp, state = scene()
    params = SimParams(hl=(hl.init_params(),), lp=(lp.init_params(),),
                       sources=None)

    step = jax.jit(build_step(cfg, [hl], [lp]))
    s = state
    for _ in range(n_steps):
        s, _ = step(params, s, dt)

    rollout = build_persistent_rollout(cfg, hl, lp)
    run = jax.jit(rollout, static_argnums=(4,))
    p, info = run(hl.init_params(), lp.init_params(), state, dt, n_steps)

    np.testing.assert_allclose(np.asarray(p.position), np.asarray(s.position),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p.velocity), np.asarray(s.velocity),
                               rtol=1e-5, atol=1e-5)
    # The whole point: rebins are far rarer than steps.  skin = (6-3)/2 =
    # 1.5 m; speed ~1.1 m/s -> a rebin every ~1.5/(1.1*dt) steps at most.
    assert int(info["n_rebins"]) < n_steps
    assert abs(float(p.sim_time) - n_steps * dt) < 1e-4


def test_persistent_relayout_triggers():
    """With a long horizon the skin criterion must fire — as evictions
    into the spill buffer, or full rebins when it can't absorb them."""
    cfg, hl, lp, state = scene()
    rollout = build_persistent_rollout(cfg, hl, lp)
    run = jax.jit(rollout, static_argnums=(4,))
    p, info = run(hl.init_params(), lp.init_params(), state, 0.1, 40)
    assert int(info["n_rebins"]) + int(info["n_evicted"]) >= 1
    assert np.isfinite(np.asarray(p.position)).all()


def test_persistent_rebins_when_buffer_cannot_absorb():
    """A tiny spill buffer + a whole population of skin-exceeders must
    fall back to full rebins (and still match the general step — covered
    by the parametrized matching test; here: the trigger fires and
    nothing is dropped)."""
    import dataclasses as dc

    cfg, hl, lp, state = scene()
    cfg = dc.replace(cfg, spill_capacity=16)
    rollout = build_persistent_rollout(cfg, hl, lp)
    run = jax.jit(rollout, static_argnums=(4,))
    p, info = run(hl.init_params(), lp.init_params(), state, 0.1, 40)
    assert int(info["n_rebins"]) >= 1
    assert int(info["dropped"]) == 0
    assert np.isfinite(np.asarray(p.position)).all()

    # Trajectories still match the general step with the tiny buffer.
    params = SimParams(hl=(hl.init_params(),), lp=(lp.init_params(),),
                       sources=None)
    step = jax.jit(build_step(cfg, [hl], [lp]))
    s = state
    for _ in range(40):
        s, _ = step(params, s, 0.1)
    np.testing.assert_allclose(np.asarray(p.position), np.asarray(s.position),
                               rtol=2e-4, atol=2e-4)


def test_persistent_spill_buffer_matches_general_step():
    """A hotspot tile overflowing bucket_capacity: overflow rows live in
    the spill side buffer across rebins and are patched exactly — the
    rollout still matches the general step (which uses its own
    agent-space spill patch), and nothing is dropped."""
    cfg, hl, lp, state = scene(n=64, world=36.0)
    import dataclasses as dc

    cfg = dc.replace(cfg, bucket_capacity=8, sub_tiles=14, strip_tiles=14,
                     spill_capacity=32)
    # Cram 20 agents into one 6 m tile (occupancy 20 > bucket 8).
    rng = np.random.default_rng(9)
    pos = np.array(state.position)
    pos[:20] = rng.uniform(13.0, 17.0, (20, 2))
    state = state.replace(position=jnp.asarray(pos, cfg.jdtype))
    params = SimParams(hl=(hl.init_params(),), lp=(lp.init_params(),),
                       sources=None)

    n_steps, dt = 8, 0.05
    step = jax.jit(build_step(cfg, [hl], [lp]))
    s = state
    for _ in range(n_steps):
        s, ev = step(params, s, dt)
        assert int(ev.neighbor_truncated) == 0
        assert int(ev.max_cell_occupancy) > cfg.bucket_capacity

    rollout = build_persistent_rollout(cfg, hl, lp)
    run = jax.jit(rollout, static_argnums=(4,))
    p, info = run(hl.init_params(), lp.init_params(), state, dt, n_steps)

    assert int(info["dropped"]) == 0
    np.testing.assert_allclose(np.asarray(p.position), np.asarray(s.position),
                               rtol=2e-4, atol=2e-4)


def test_persistent_spill_cap_overrun_is_counted():
    """Overflow beyond spill_capacity must surface in info['dropped']."""
    cfg, hl, lp, state = scene(n=64, world=36.0)
    import dataclasses as dc

    cfg = dc.replace(cfg, bucket_capacity=8, sub_tiles=14, strip_tiles=14,
                     spill_capacity=16)
    rng = np.random.default_rng(9)
    pos = np.array(state.position)
    pos[:50] = rng.uniform(14.0, 16.0, (50, 2))  # 50 in one tile, cap 8+16
    state = state.replace(position=jnp.asarray(pos, cfg.jdtype))
    rollout = build_persistent_rollout(cfg, hl, lp)
    run = jax.jit(rollout, static_argnums=(4,))
    _, info = run(hl.init_params(), lp.init_params(), state, 0.05, 2)
    assert int(info["dropped"]) > 0


def test_persistent_int_prio_matches_general_priorities():
    """config.integer_priorities threads through the persistent engine's
    force kernel AND its spill patch (core/persistent.py int_prio): on a
    scene whose priorities are agent ids (the reference default,
    zanlungo.rs:94-98), the specialized rollout must reproduce the
    general-priority rollout exactly — the select-based right-of-way is
    algebraically identical for integer priority gaps."""
    import dataclasses as dc

    cfg, hl, lp, state = scene()
    outs = {}
    for flag in (False, True):
        c = dc.replace(cfg, integer_priorities=flag)
        rollout = build_persistent_rollout(c, hl, lp)
        run = jax.jit(rollout, static_argnums=(4,))
        p, info = run(hl.init_params(), lp.init_params(), state, 0.1, 25)
        assert int(info["dropped"]) == 0
        outs[flag] = np.asarray(p.position)
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-6, atol=1e-6)
