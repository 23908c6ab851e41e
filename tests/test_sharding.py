"""Multi-chip sharding tests on the 8-virtual-device CPU mesh: the sharded
step must produce the same results as the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmf_crowdsim_tpu import (
    GridConfig,
    MonotonicCrowd,
    ParityVelocity,
    SimConfig,
    SimParams,
    SourceSink,
    Zanlungo,
    build_step,
    make_state,
)
from rmf_crowdsim_tpu.models.source_sink import stack_source_params
from rmf_crowdsim_tpu.parallel.sharding import (
    build_sharded_rollout,
    build_sharded_step,
    make_mesh,
    replicate_params,
    shard_state,
)


def scene(capacity=64, n_agents=32, backend="grid"):
    cfg = SimConfig(
        capacity=capacity,
        grid=GridConfig(width=64.0, height=64.0, cell_size=4.0,
                        offset=(-32.0, -32.0)),
        neighbor_backend=backend,
        max_per_cell=capacity,
        max_eyesight=4.0,
        dtype="float32",
    )
    hl = ParityVelocity((1.0, 0.0))
    lp = Zanlungo(1.0, 1.0, 0.0, 2.0, 2.0, 0.25)
    rng = np.random.default_rng(0)
    state = make_state(cfg)
    f = cfg.jdtype
    pos = rng.uniform(-30, 30, (capacity, 2))
    alive = np.zeros(capacity, bool)
    alive[:n_agents] = True
    state = state.replace(
        position=jnp.asarray(pos, f),
        eyesight=jnp.where(jnp.asarray(alive), jnp.asarray(4.0, f), 0.0),
        alive=jnp.asarray(alive),
        uid=jnp.arange(capacity, dtype=jnp.int32),
        hl_idx=jnp.zeros((capacity,), jnp.int32),
        lp_idx=jnp.zeros((capacity,), jnp.int32),
        priority=jnp.arange(capacity, dtype=f),
        next_uid=jnp.asarray(capacity, jnp.int32),
    )
    sources = [
        SourceSink(source=(-30.0, 0.0), waypoints=[(30.0, 0.0)],
                   radius_sink=1.0, crowd_generator=MonotonicCrowd(1.0),
                   high_level_planner=hl, local_planner=lp,
                   agent_eyesight_range=4.0),
    ]
    sp = stack_source_params(sources, [0], [0], [[-1]], cfg.jdtype)
    params = SimParams(hl=(hl.init_params(),), lp=(lp.init_params(),),
                       sources=sp)
    return cfg, hl, lp, params, state


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_matches_single():
    cfg, hl, lp, params, state = scene()
    step = jax.jit(build_step(cfg, [hl], [lp]))
    mesh = make_mesh(8)
    sstep = build_sharded_step(cfg, [hl], [lp], mesh)

    sharded = shard_state(mesh, state)
    rparams = replicate_params(mesh, params)

    s1, e1 = step(params, state, 0.1)
    s2, e2 = sstep(rparams, sharded, 0.1)
    np.testing.assert_allclose(np.asarray(s1.position),
                               np.asarray(s2.position), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s1.alive), np.asarray(s2.alive))
    np.testing.assert_array_equal(np.asarray(e1.spawned),
                                  np.asarray(e2.spawned))
    # state stays sharded across the mesh
    assert len(s2.position.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_rollout_runs():
    cfg, hl, lp, params, state = scene()
    mesh = make_mesh(8)
    run = build_sharded_rollout(cfg, [hl], [lp], mesh)
    sharded = shard_state(mesh, state)
    rparams = replicate_params(mesh, params)
    st, counters = run(rparams, sharded, 0.1, 5)
    assert counters.n_alive.shape == (5,)
    assert int(counters.n_alive[-1]) >= 32
