"""Dense (bucket-free) fused kernel vs the jnp oracle (models/local.py),
interpreter mode on CPU — the oracle-vs-fast-path pattern
(location_hash_2d.rs:270-398 precedent), mirroring test_zanlungo_pallas.py
for ops/zanlungo_dense.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmf_crowdsim_tpu.models.local import ZanlungoParams, zanlungo_velocity
from rmf_crowdsim_tpu.ops.neighbors import brute_neighbors
from rmf_crowdsim_tpu.ops.zanlungo_dense import (
    DenseConfig,
    zanlungo_fused_dense,
)
from rmf_crowdsim_tpu.ops.zanlungo_pallas import tile_key


def make_params(scale=1.3, fd=4.0, mass=2.0, radius=0.4):
    return ZanlungoParams(
        agent_scale=jnp.asarray(scale, jnp.float32),
        obstacle_scale=jnp.asarray(1.0, jnp.float32),
        reaction_time=jnp.asarray(0.0, jnp.float32),
        force_distance=jnp.asarray(fd, jnp.float32),
        agent_mass=jnp.asarray(mass, jnp.float32),
        agent_radius=jnp.asarray(radius, jnp.float32),
    )


def random_scene(seed, n, world, eyesight_max, dead_frac=0.15):
    rng = np.random.default_rng(seed)
    f32 = jnp.float32
    pos = jnp.asarray(rng.uniform(0.0, world, (n, 2)), f32)
    vel = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    pref_committed = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    self_pref = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    prio = jnp.asarray(rng.permutation(n).astype(np.float32))
    eye = jnp.asarray(rng.uniform(0.5, eyesight_max, (n,)), f32)
    alive = jnp.asarray(rng.random(n) > dead_frac)
    rec = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    return pos, vel, self_pref, pref_committed, prio, eye, alive, rec


def sort_scene(cfg, scene):
    """Tile-sort the scene arrays (the presorted step's invariant) and
    return (sorted scene, key_sorted)."""
    pos, vel, self_pref, pref_c, prio, eye, alive, rec = scene
    key = tile_key(cfg, pos, alive)
    order = jnp.argsort(key, stable=True)
    out = tuple(a[order] for a in scene)
    return out, key[order]


def oracle(zp, scene):
    pos, vel, self_pref, pref_c, prio, eye, alive, rec = scene
    nbr = brute_neighbors(pos, eye, alive)
    return zanlungo_velocity(zp, pos, vel, self_pref, pref_c, prio,
                             nbr.idx, nbr.valid, rec)


def run_dense(cfg, zp, scene, **kw):
    (pos, vel, self_pref, pref_c, prio, eye, alive, rec), key_s = \
        sort_scene(cfg, scene)
    got, max_occ, dropped = zanlungo_fused_dense(
        cfg, zp, pos, vel, self_pref, pref_c, prio, eye, alive, rec,
        key_s, interpret=True, **kw)
    want = oracle(zp, (pos, vel, self_pref, pref_c, prio, eye, alive,
                       rec))
    return got, want, alive, rec, max_occ, dropped


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dense_matches_oracle(seed):
    n = 160
    world = 24.0
    cfg = DenseConfig.create(world, world, (0.0, 0.0), 3.0, capacity=n)
    zp = make_params()
    scene = random_scene(seed, n, world, 3.0)
    got, want, alive, _, _, dropped = run_dense(cfg, zp, scene)
    assert int(dropped) == 0
    a = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(want)[a],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_dense_dual_vs_shared(seed):
    n = 200
    world = 24.0
    cfg = DenseConfig.create(world, world, (0.0, 0.0), 3.0, capacity=n)
    zp = make_params()
    scene = random_scene(seed, n, world, 3.0)
    got_d, want, alive, _, _, _ = run_dense(cfg, zp, scene, dual_row=True)
    got_s, _, _, _, _, _ = run_dense(cfg, zp, scene, dual_row=False)
    a = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(got_d)[a], np.asarray(want)[a],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_d)[a], np.asarray(got_s)[a],
                               rtol=2e-5, atol=2e-5)


def test_dense_sweep_tier_hotspot():
    """A dense cluster pushes window extents past 128 lanes: the
    affected sub-blocks must take the direct 256-lane tier (tier B)
    and still match the oracle.  ~200 agents inside one tile makes every
    window over the cluster ~200 lanes wide."""
    rng = np.random.default_rng(5)
    world = 30.0
    n_c, n_u = 220, 120
    pos = np.concatenate([
        rng.uniform(12.0, 15.0, (n_c, 2)),       # one-tile cluster
        rng.uniform(0.0, world, (n_u, 2)),
    ]).astype(np.float32)
    n = n_c + n_u
    vel = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    scene = (
        jnp.asarray(pos), jnp.asarray(vel),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)).astype(np.float32)),
        jnp.asarray(rng.permutation(n).astype(np.float32)),
        jnp.full((n,), 3.0, jnp.float32),
        jnp.ones((n,), bool),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)).astype(np.float32)),
    )
    cfg = DenseConfig.create(world, world, (0.0, 0.0), 3.0, capacity=n,
                             col_headroom=8.0)  # cluster-heavy columns
    zp = make_params()
    got, want, alive, _, _, dropped = run_dense(cfg, zp, scene)
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_dense_sweep_tier_extreme_hotspot():
    """A >400-agent cluster pushes window extents past 256 lanes: the
    affected sub-blocks must take the exact BOUNDED sweep (tier C) and
    still match the oracle — including queries whose window starts at a
    non-chunk-aligned offset (the bounded chunk loop must cover the
    whole [loc, loc + ext) range, not just aligned prefixes)."""
    rng = np.random.default_rng(11)
    world = 30.0
    n_c, n_u = 430, 140
    pos = np.concatenate([
        rng.uniform(12.0, 15.0, (n_c, 2)),       # one-tile mega-cluster
        rng.uniform(0.0, world, (n_u, 2)),
    ]).astype(np.float32)
    n = n_c + n_u
    vel = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    scene = (
        jnp.asarray(pos), jnp.asarray(vel),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)).astype(np.float32)),
        jnp.asarray(rng.permutation(n).astype(np.float32)),
        jnp.full((n,), 3.0, jnp.float32),
        jnp.ones((n,), bool),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)).astype(np.float32)),
    )
    cfg = DenseConfig.create(world, world, (0.0, 0.0), 3.0, capacity=n,
                             col_headroom=8.0)
    zp = make_params()
    got, want, alive, _, _, dropped = run_dense(cfg, zp, scene)
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_dense_column_overflow_counted():
    """Columns past col_cap drop the surplus LOUDLY: dropped > 0 and the
    uncovered agents keep rec_vel (the engine's one capacity narrowing,
    module docstring)."""
    rng = np.random.default_rng(3)
    world = 40.0
    n = 900
    # Everything in one tile column -> col occupancy ~900 >> col_cap.
    pos = np.stack([
        rng.uniform(1.0, 3.9, n),       # tile column 0 (tile 4.0)
        rng.uniform(0.0, world, n),
    ], axis=1).astype(np.float32)
    scene = (
        jnp.asarray(pos),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)).astype(np.float32)),
        jnp.asarray(rng.permutation(n).astype(np.float32)),
        jnp.full((n,), 3.0, jnp.float32),
        jnp.ones((n,), bool),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)).astype(np.float32)),
    )
    cfg = DenseConfig(tile_size=4.0, offset=(0.0, 0.0), tx=10, ty=10,
                      col_cap=512)
    zp = make_params()
    (s_scene, key_s) = sort_scene(cfg, scene)
    got, _, dropped = zanlungo_fused_dense(
        cfg, zp, *s_scene[:2], s_scene[2], s_scene[3], s_scene[4],
        s_scene[5], s_scene[6], s_scene[7], key_s, interpret=True)
    assert int(dropped) == n - 512
    # Overflow rows (sorted rank >= col_cap in their column) keep rec.
    got = np.asarray(got)
    rec = np.asarray(s_scene[7])
    np.testing.assert_array_equal(got[512:], rec[512:])


@pytest.mark.parametrize("seed", [0])
def test_dense_int_prio_matches_oracle(seed):
    n = 160
    world = 24.0
    cfg = DenseConfig.create(world, world, (0.0, 0.0), 3.0, capacity=n)
    zp = make_params()
    scene = random_scene(seed, n, world, 3.0)
    got, want, alive, _, _, _ = run_dense(cfg, zp, scene, int_prio=True)
    a = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(want)[a],
                               rtol=2e-4, atol=2e-4)


def test_dense_carried_binning_exact():
    """Carried binning: after agents drift within the skin margin (and
    some despawn), running with the STALE sort order + keys must still
    produce exact forces for fresh positions (same guarantee the
    bucketed kernel's skin mode gives; windows center on sort-time
    tiles)."""
    rng = np.random.default_rng(11)
    n = 180
    world = 24.0
    eyesight = 2.0
    cfg = DenseConfig.create(world, world, (0.0, 0.0), eyesight,
                             capacity=n, tile_size=4.0)
    margin = (cfg.tile_size - eyesight) / 2.0
    zp = make_params()
    scene = random_scene(7, n, world, eyesight, dead_frac=0.0)
    (s0, key_s) = sort_scene(cfg, scene)
    pos0 = s0[0]
    # Drift within the skin margin + kill a few agents (fresh-dead).
    drift = jnp.asarray(
        rng.uniform(-margin * 0.95, margin * 0.95, (n, 2)), jnp.float32)
    pos1 = pos0 + drift
    alive1 = jnp.asarray(rng.random(n) > 0.1) & s0[6]
    s1 = (pos1, s0[1], s0[2], s0[3], s0[4], s0[5], alive1, s0[7])
    got, _, dropped = zanlungo_fused_dense(
        cfg, zp, pos1, s1[1], s1[2], s1[3], s1[4], s1[5], alive1, s1[7],
        key_s, interpret=True)  # STALE keys/order
    assert int(dropped) == 0
    want = oracle(zp, s1)
    a = np.asarray(alive1)
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(want)[a],
                               rtol=2e-4, atol=2e-4)


def test_dense_world_edges():
    """Agents at and beyond the world border bin to edge tiles
    (tile_key clipping) and must match the oracle — exercises the
    kernel's clamped windows and edge-column masks."""
    rng = np.random.default_rng(9)
    n = 140
    world = 16.0
    pos = rng.uniform(-2.0, world + 2.0, (n, 2)).astype(np.float32)
    scene = (
        jnp.asarray(pos),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)).astype(np.float32)),
        jnp.asarray(rng.permutation(n).astype(np.float32)),
        jnp.full((n,), 3.0, jnp.float32),
        jnp.ones((n,), bool),
        jnp.asarray(rng.uniform(-2, 2, (n, 2)).astype(np.float32)),
    )
    cfg = DenseConfig.create(world, world, (0.0, 0.0), 3.0, capacity=n)
    zp = make_params()
    got, want, alive, _, _, dropped = run_dense(cfg, zp, scene)
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_dense_under_jit():
    n = 96
    world = 20.0
    cfg = DenseConfig.create(world, world, (0.0, 0.0), 3.0, capacity=n)
    zp = make_params()
    scene = random_scene(4, n, world, 3.0)
    (s, key_s) = sort_scene(cfg, scene)

    @jax.jit
    def f(args, key):
        return zanlungo_fused_dense(cfg, zp, *args, key, interpret=True)

    got, occ, dropped = f(s, key_s)
    want = oracle(zp, s)
    a = np.asarray(s[6])
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(want)[a],
                               rtol=2e-4, atol=2e-4)
