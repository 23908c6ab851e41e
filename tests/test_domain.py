"""Domain-decomposition force pass (shard_map + ppermute halo exchange)
must match the single-device fused kernel and the jnp oracle."""

import jax
import numpy as np
import pytest

from rmf_crowdsim_tpu.ops.zanlungo_pallas import BucketConfig, zanlungo_fused
from rmf_crowdsim_tpu.parallel.domain import WORLD_AXIS, zanlungo_fused_domain
from tests.test_zanlungo_pallas import make_params, oracle, random_scene


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("seed", [0, 1])
def test_domain_sharded_matches_single(seed):
    n = 128
    world = 48.0  # 16 tile columns over 8 devices -> 2 cols/device
    cfg = BucketConfig.create(world, world, (0.0, 0.0), 3.0,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    assert cfg.tx % 8 == 0
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), (WORLD_AXIS,))
    zp = make_params()
    scene = random_scene(seed, n, world, 3.0)
    pos, vel, self_pref, pref_c, prio, eye, alive, rec = scene

    got, occ, _dropped = jax.jit(
        lambda *a: zanlungo_fused_domain(mesh, cfg, zp, *a, interpret=True)
    )(pos, vel, self_pref, pref_c, prio, eye, alive, rec)
    single, _, _ = zanlungo_fused(cfg, zp, pos, vel, self_pref, pref_c, prio,
                               eye, alive, rec, interpret=True)
    want = oracle(zp, scene)

    a = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(single)[a],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(want)[a],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_full_step_with_domain_mesh_matches_single():
    """build_step(world_mesh=...) runs the entire step with the force pass
    domain-decomposed; trajectories must match the single-device step."""
    import jax.numpy as jnp

    from rmf_crowdsim_tpu import (GridConfig, ParityVelocity, SimConfig,
                                  SimParams, Zanlungo, build_step, make_state)

    cfg = SimConfig(
        capacity=64,
        grid=GridConfig(width=48.0, height=48.0, cell_size=3.0,
                        offset=(0.0, 0.0)),
        neighbor_backend="grid_pallas",
        max_eyesight=3.0,
        bucket_capacity=16,
        strip_tiles=6,
        sub_tiles=6,
        pallas_interpret=True,
        dtype="float32",
    )
    hl = ParityVelocity((1.0, 0.0))
    lp = Zanlungo(1.0, 1.0, 0.0, 2.0, 2.0, 0.3)
    rng = np.random.default_rng(1)
    state = make_state(cfg)
    f = cfg.jdtype
    pos = rng.uniform(2.0, 46.0, (64, 2))
    state = state.replace(
        position=jnp.asarray(pos, f),
        eyesight=jnp.full((64,), 3.0, f),
        alive=jnp.ones((64,), bool),
        uid=jnp.arange(64, dtype=jnp.int32),
        priority=jnp.arange(64, dtype=f),
        next_uid=jnp.asarray(64, jnp.int32),
    )
    params = SimParams(hl=(hl.init_params(),), lp=(lp.init_params(),),
                       sources=None)
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), (WORLD_AXIS,))

    step1 = jax.jit(build_step(cfg, [hl], [lp]))
    step2 = jax.jit(build_step(cfg, [hl], [lp], world_mesh=mesh))
    s1, _ = step1(params, state, 0.1)
    s2, _ = step2(params, state, 0.1)
    np.testing.assert_allclose(np.asarray(s1.position),
                               np.asarray(s2.position), rtol=1e-6, atol=1e-6)
