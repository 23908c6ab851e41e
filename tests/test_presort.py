"""config.presort: tile-sorted state across steps (grid_pallas).  The
SoA arrays are re-ordered every step (identity = uid), one lax.sort with
the whole state as payloads replacing bucketize's permutation ops, and
the monotone row gather back to agent order.  Physics must match the
unsorted path."""

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
from rmf_crowdsim_tpu.core.step import SimParams, build_rollout
from rmf_crowdsim_tpu.models.source_sink import stack_source_params


def _scene(presort: bool, capacity=256):
    cfg = SimConfig(
        capacity=capacity,
        grid=GridConfig(width=48.0, height=48.0, cell_size=3.0,
                        offset=(0.0, 0.0)),
        neighbor_backend="grid_pallas",
        max_eyesight=3.0,
        bucket_capacity=16,
        strip_tiles=6,
        sub_tiles=6,
        spill_capacity=32,
        pallas_interpret=True,
        presort=presort,
        dtype="float32",
        on_truncation="ignore",
    )
    hl = ConstantVelocity((0.8, 0.1))
    lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.25,
                  force_cap=2.0)
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
    params = SimParams(hl=(hl.init_params(),), lp=(lp.init_params(),),
                       sources=sp)
    state = make_state(cfg, seed=9)
    rng = np.random.default_rng(5)
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


def _run(presort: bool, n_steps=12):
    cfg, hl, lp, params, state = _scene(presort)
    rollout = jax.jit(build_rollout(cfg, [hl], [lp]), static_argnums=(3,))
    st, counters = rollout(params, state, 0.25, n_steps)
    st = jax.device_get(st)
    alive = np.asarray(st.alive)
    uid = np.asarray(st.uid)
    pos = np.asarray(st.position)
    vel = np.asarray(st.velocity)
    agents = {int(uid[i]): (*pos[i], *vel[i])
              for i in np.flatnonzero(alive)}
    return agents, jax.device_get(counters)


@pytest.mark.slow
def test_presort_matches_unsorted_physics():
    """presort re-orders slots, not physics: uid-keyed trajectories agree
    with the unsorted engine at spill-patch tolerance (force sums run in
    different lane orders), lifecycle counters exactly."""
    a, ca = _run(True)
    b, cb = _run(False)
    # bucket overflow present (rank-based diagnostic saturates at
    # bucket+2, so >= bucket means the spill path is active)
    assert int(np.max(np.asarray(ca.max_cell_occupancy))) >= 16
    assert int(np.sum(np.asarray(ca.neighbor_truncated))) == 0
    assert a.keys() == b.keys()
    ga = np.asarray([a[k] for k in sorted(a)])
    gb = np.asarray([b[k] for k in sorted(b)])
    np.testing.assert_allclose(ga, gb, rtol=2e-4, atol=2e-4)
    for name in ("n_alive", "n_spawned", "n_destroyed",
                 "n_waypoint_reached", "spawn_dropped"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ca, name)), np.asarray(getattr(cb, name)),
            err_msg=name,
        )


def test_presort_preserves_dead_slot_sentinels():
    """Regression: the presort payload bit-pack must survive the -1
    "none" sentinel make_state leaves in hl_idx/lp_idx on dead slots.
    A raw OR of -1 sets every bit of the packed word, resurrecting all
    dead slots as alive agents with garbage planner indices (observed:
    120 alive -> full capacity after one step).  The pack is +1-biased
    9-bit per index (core/step.py presort block)."""
    cfg, hl, lp, params, state = _scene(True)
    alive = np.asarray(state.alive)
    # make_state defaults: dead slots carry the -1 sentinel (the _scene
    # fixture zero-fills them, which masked the original bug).
    sent = jnp.where(jnp.asarray(alive), 0, -1).astype(jnp.int32)
    state = state.replace(hl_idx=sent, lp_idx=sent)
    rollout = jax.jit(build_rollout(cfg, [hl], [lp]), static_argnums=(3,))
    st, counters = rollout(params, state, 0.25, 3)
    st = jax.device_get(st)
    n0 = int(alive.sum())
    n_alive = np.asarray(counters.n_alive)
    n_spawn = np.asarray(counters.n_spawned)
    n_dest = np.asarray(counters.n_destroyed)
    # Population follows the lifecycle exactly — no resurrections.
    assert int(n_alive[-1]) == n0 + int(n_spawn.sum()) - int(n_dest.sum())
    assert int(n_alive[-1]) < cfg.capacity
    # Dead slots still carry the -1 sentinel after the sorted steps.
    dead = ~np.asarray(st.alive)
    assert np.all(np.asarray(st.hl_idx)[dead] == -1)
    assert np.all(np.asarray(st.lp_idx)[dead] == -1)
