"""Fused spill repair (ops/zanlungo_pallas.zanlungo_fused
fused_spills=True): bucket-overflow agents ride the MAIN kernel as a
fourth candidate segment, with only their own rows going through the
small oracle-math pass.

Contract under test (the reference's cells are unbounded,
/root/reference/rmf_crowdsim/src/spatial_index/location_hash_2d.rs:15,
so overflow repair must be exact):
  - oracle parity on overflow scenes across dual_row x int_prio;
  - parity with the spill_patch path (fused_spills=False) at the
    force-sum tolerance both paths already carry vs the oracle;
  - spill storms past min(128, spill_capacity) fall back to the full
    patch (idempotent overwrite), preserving unresolved counting;
  - clean scenes (no overflow) are BITWISE identical to the plain
    kernel;
  - edge-tile spills stay exact (window clipping).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rmf_crowdsim_tpu.ops.zanlungo_pallas import (
    BucketConfig, zanlungo_fused,
)
from tests.test_zanlungo_pallas import make_params, oracle, random_scene


def overflow_scene(seed, n=96, world=24.0, eyesight_max=3.0, n_cram=30,
                   cram_lo=9.0, cram_hi=11.5):
    rng = np.random.default_rng(seed)
    f32 = jnp.float32
    pos = rng.uniform(0.0, world, (n, 2))
    pos[:n_cram] = rng.uniform(cram_lo, cram_hi, (n_cram, 2))
    return (
        jnp.asarray(pos, f32),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32),
        jnp.asarray(rng.permutation(n).astype(np.float32)),
        jnp.asarray(rng.uniform(0.5, eyesight_max, (n,)), f32),
        jnp.asarray(rng.random(n) > 0.1),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32),
    )


def make_cfg(world=24.0, eyesight_max=3.0):
    return BucketConfig.create(world, world, (0.0, 0.0), eyesight_max,
                               bucket=16, strip_tiles=6, sub_tiles=6)


@pytest.mark.parametrize("dual_row", [False, True])
@pytest.mark.parametrize("int_prio", [False, True])
def test_fused_spills_match_oracle(dual_row, int_prio):
    cfg = make_cfg()
    zp = make_params()
    scene = overflow_scene(11)
    alive = np.asarray(scene[6])

    got, max_occ, dropped = zanlungo_fused(
        cfg, zp, *scene, interpret=True, spill_capacity=64,
        dual_row=dual_row, int_prio=int_prio, fused_spills=True,
    )
    assert int(max_occ) > cfg.bucket, "scene must actually overflow"
    assert int(dropped) == 0, "fused repair should resolve all overflow"
    want = oracle(zp, scene)
    np.testing.assert_allclose(
        np.asarray(got)[alive], np.asarray(want)[alive],
        rtol=2e-4, atol=2e-4,
    )


def test_fused_matches_patch_path():
    """Both repair paths are exact up to f32 force-sum order, so they
    agree with each other at the same tolerance they carry vs the
    oracle."""
    cfg = make_cfg()
    zp = make_params()
    scene = overflow_scene(5)
    a, _, d_a = zanlungo_fused(cfg, zp, *scene, interpret=True,
                               spill_capacity=64, fused_spills=True)
    b, _, d_b = zanlungo_fused(cfg, zp, *scene, interpret=True,
                               spill_capacity=64, fused_spills=False)
    assert int(d_a) == 0 and int(d_b) == 0
    alive = np.asarray(scene[6])
    np.testing.assert_allclose(np.asarray(a)[alive], np.asarray(b)[alive],
                               rtol=1e-5, atol=1e-5)


def test_fused_storm_falls_back_to_patch():
    """n_spill > min(128, spill_capacity): the fused segment cannot hold
    the storm, so the full patch runs (overwriting any partial fused
    contribution) — output matches the patch-only path and oracle."""
    cfg = make_cfg()
    zp = make_params()
    # ~40 agents in one tile: occupancy ~40 > bucket 16 => ~24+ spills,
    # above the forced fused cap below.
    scene = overflow_scene(7, n_cram=40)
    got, max_occ, dropped = zanlungo_fused(
        cfg, zp, *scene, interpret=True, spill_capacity=8,
        fused_spills=True,
    )
    ref, _, dropped_ref = zanlungo_fused(
        cfg, zp, *scene, interpret=True, spill_capacity=8,
        fused_spills=False,
    )
    assert int(max_occ) > cfg.bucket
    # The 8-spill cap can't cover the storm: both paths must report the
    # same unresolved surplus.
    assert int(dropped) == int(dropped_ref) > 0
    alive = np.asarray(scene[6])
    np.testing.assert_allclose(np.asarray(got)[alive],
                               np.asarray(ref)[alive],
                               rtol=1e-5, atol=1e-5)


def test_fused_clean_scene_bitwise_plain():
    """No overflow: the fused path's kernel must be bitwise-identical to
    the plain kernel (the fourth segment is built but every sub-block is
    unflagged, and the own-row pass is skipped by the n_spill == 0
    cond)."""
    cfg = make_cfg()
    zp = make_params()
    scene = random_scene(3, 96, 24.0, 3.0)
    a, occ, d_a = zanlungo_fused(cfg, zp, *scene, interpret=True,
                                 spill_capacity=64, fused_spills=True)
    b, _, d_b = zanlungo_fused(cfg, zp, *scene, interpret=True,
                               fused_spills=False)
    assert int(occ) <= cfg.bucket and int(d_a) == 0 and int(d_b) == 0
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_spills_at_world_edge():
    """Overflow in a corner tile: flag/window clipping must stay exact
    (mirrors test_spill_patch_repairs_overflow_at_world_edge)."""
    cfg = make_cfg()
    zp = make_params()
    scene = overflow_scene(13, n_cram=28, cram_lo=0.2, cram_hi=2.2)
    got, max_occ, dropped = zanlungo_fused(
        cfg, zp, *scene, interpret=True, spill_capacity=64,
        fused_spills=True,
    )
    assert int(max_occ) > cfg.bucket
    assert int(dropped) == 0
    want = oracle(zp, scene)
    alive = np.asarray(scene[6])
    np.testing.assert_allclose(np.asarray(got)[alive],
                               np.asarray(want)[alive],
                               rtol=2e-4, atol=2e-4)
