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

    got, occ = jax.jit(
        lambda *a: zanlungo_fused_domain(mesh, cfg, zp, *a, interpret=True)
    )(pos, vel, self_pref, pref_c, prio, eye, alive, rec)
    single, _ = zanlungo_fused(cfg, zp, pos, vel, self_pref, pref_c, prio,
                               eye, alive, rec, interpret=True)
    want = oracle(zp, scene)

    a = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(single)[a],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(want)[a],
                               rtol=2e-4, atol=2e-4)
