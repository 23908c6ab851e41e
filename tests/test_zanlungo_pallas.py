"""Pallas fused Zanlungo kernel vs the jnp oracle (models/local.py), in
interpreter mode on CPU — the framework's oracle-vs-fast-path pattern
(mirroring the reference's own spatial-oracle tests,
location_hash_2d.rs:270-398)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmf_crowdsim_tpu.models.local import ZanlungoParams, zanlungo_velocity
from rmf_crowdsim_tpu.ops.neighbors import brute_neighbors
from rmf_crowdsim_tpu.ops.zanlungo_pallas import (
    BucketConfig,
    bucketize,
    zanlungo_fused,
)


def make_params(scale=1.3, fd=4.0, mass=2.0, radius=0.4):
    return ZanlungoParams(
        agent_scale=jnp.asarray(scale, jnp.float32),
        obstacle_scale=jnp.asarray(1.0, jnp.float32),
        reaction_time=jnp.asarray(0.0, jnp.float32),
        force_distance=jnp.asarray(fd, jnp.float32),
        agent_mass=jnp.asarray(mass, jnp.float32),
        agent_radius=jnp.asarray(radius, jnp.float32),
    )


def random_scene(seed, n, world, eyesight_max):
    rng = np.random.default_rng(seed)
    f32 = jnp.float32
    pos = jnp.asarray(rng.uniform(0.0, world, (n, 2)), f32)
    vel = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    pref_committed = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    self_pref = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    prio = jnp.asarray(rng.permutation(n).astype(np.float32))
    eye = jnp.asarray(rng.uniform(0.5, eyesight_max, (n,)), f32)
    alive = jnp.asarray(rng.random(n) > 0.15)
    rec = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    return pos, vel, self_pref, pref_committed, prio, eye, alive, rec


def oracle(zp, scene):
    pos, vel, self_pref, pref_c, prio, eye, alive, rec = scene
    nbr = brute_neighbors(pos, eye, alive)
    return zanlungo_velocity(zp, pos, vel, self_pref, pref_c, prio,
                             nbr.idx, nbr.valid, rec)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_matches_oracle(seed):
    n = 96
    world = 24.0
    eyesight_max = 3.0
    cfg = BucketConfig.create(world, world, (0.0, 0.0), eyesight_max,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    zp = make_params()
    scene = random_scene(seed, n, world, eyesight_max)
    pos, vel, self_pref, pref_c, prio, eye, alive, rec = scene

    got, max_occ, dropped = zanlungo_fused(
        cfg, zp, pos, vel, self_pref, pref_c, prio, eye, alive, rec,
        interpret=True)
    assert int(max_occ) <= cfg.bucket, "bucket overflow would break parity"
    want = oracle(zp, scene)

    got = np.asarray(got)
    want = np.asarray(want)
    alive_np = np.asarray(alive)
    np.testing.assert_allclose(got[alive_np], want[alive_np],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1])
def test_fused_dual_row_matches_oracle(seed):
    """dual_row tier: tile-half query groups in 64-lane segments.  Same
    addends per query as the shared tier, different reduction grouping —
    tolerance parity vs the oracle AND (tighter) vs the shared path."""
    n = 160
    world = 24.0
    cfg = BucketConfig.create(world, world, (0.0, 0.0), 3.0,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    zp = make_params()
    scene = random_scene(seed, n, world, 3.0)
    pos, vel, self_pref, pref_c, prio, eye, alive, rec = scene
    got_d, occ, _ = zanlungo_fused(
        cfg, zp, pos, vel, self_pref, pref_c, prio, eye, alive, rec,
        interpret=True, spill_capacity=32, dual_row=True)
    got_s, _, _ = zanlungo_fused(
        cfg, zp, pos, vel, self_pref, pref_c, prio, eye, alive, rec,
        interpret=True, spill_capacity=32, dual_row=False)
    want = oracle(zp, scene)
    a = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(got_d)[a], np.asarray(want)[a],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_d)[a], np.asarray(got_s)[a],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_dual_row_overflow_tiers():
    """Density tuned so half-unions exceed the 64-lane segment (dual
    falls back to the shared tier) without bucket overflow: the mixed
    dual/shared execution must still match the oracle."""
    rng = np.random.default_rng(7)
    world = 30.0
    n = 630  # ~0.7 agents/m^2 -> half-union ~95 in (64, 128]
    pos = jnp.asarray(rng.uniform(0.0, world, (n, 2)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    prio = jnp.asarray(rng.permutation(n).astype(np.float32))
    eye = jnp.full((n,), 3.0, jnp.float32)
    alive = jnp.ones((n,), bool)
    rec = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    cfg = BucketConfig.create(world, world, (0.0, 0.0), 3.0,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    zp = make_params()
    got, occ, dropped = zanlungo_fused(
        cfg, zp, pos, vel, vel, vel, prio, eye, alive, rec,
        interpret=True, spill_capacity=64, dual_row=True)
    assert int(dropped) == 0
    want = oracle(zp, (pos, vel, vel, vel, prio, eye, alive, rec))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_fused_under_jit():
    n = 64
    world = 16.0
    cfg = BucketConfig.create(world, world, (0.0, 0.0), 2.0,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    zp = make_params()
    scene = random_scene(7, n, world, 2.0)
    pos, vel, self_pref, pref_c, prio, eye, alive, rec = scene

    fn = jax.jit(
        lambda *a: zanlungo_fused(cfg, zp, *a, interpret=True)
    )
    got, _, _ = fn(pos, vel, self_pref, pref_c, prio, eye, alive, rec)
    want = oracle(zp, scene)
    alive_np = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(got)[alive_np],
                               np.asarray(want)[alive_np],
                               rtol=2e-4, atol=2e-4)


def test_bucketize_roundtrip():
    """Every alive agent lands in exactly one bucket slot; slot ids match."""
    n = 40
    world = 12.0
    cfg = BucketConfig.create(world, world, (0.0, 0.0), 2.0,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    scene = random_scene(3, n, world, 2.0)
    pos, vel, self_pref, pref_c, prio, eye, alive, rec = scene
    packed, packed_T, bpos, max_occ, dropped = bucketize(
        cfg, pos, vel, pref_c, self_pref, prio, eye, rec, alive)
    assert int(dropped) == 0
    packed = np.asarray(packed)
    bpos = np.asarray(bpos)
    alive_np = np.asarray(alive)
    from rmf_crowdsim_tpu.ops.zanlungo_pallas import ROW_ID
    ids = packed[:, ROW_ID]  # (packed is [slots, NUM_F])
    live_slots = ids[ids >= 0].astype(int)
    assert sorted(live_slots) == sorted(np.flatnonzero(alive_np).tolist())
    for i in np.flatnonzero(alive_np):
        assert bpos[i] < cfg.slots
        assert int(ids[bpos[i]]) == i
    for i in np.flatnonzero(~alive_np):
        assert bpos[i] == cfg.slots


def test_overflow_agents_keep_rec_vel():
    """More agents in one tile than bucket slots: the dropped ones fall
    back to the recommended velocity and occupancy reports the overflow."""
    n = 12
    cfg = BucketConfig.create(32.0, 32.0, (0.0, 0.0), 2.0,
                              bucket=8, strip_tiles=14, sub_tiles=14)
    f32 = jnp.float32
    # All 12 agents inside one tile.
    pos = jnp.asarray([[1.0 + 0.01 * i, 1.0] for i in range(n)], f32)
    vel = jnp.zeros((n, 2), f32)
    pref = jnp.zeros((n, 2), f32)
    prio = jnp.arange(n, dtype=f32)
    eye = jnp.full((n,), 2.0, f32)
    alive = jnp.ones((n,), bool)
    rec = jnp.asarray(np.tile([[0.5, -0.5]], (n, 1)), f32)
    zp = make_params()
    got, max_occ, dropped = zanlungo_fused(
        cfg, zp, pos, vel, pref, pref, prio, eye, alive, rec,
        interpret=True)
    assert int(dropped) == 4  # 12 agents, bucket 8
    # The occupancy diagnostic saturates at bucket + 2 (windowed rank —
    # overflow membership stays exact, the count reads "bucket+2 or
    # more").
    assert int(max_occ) == cfg.bucket + 2
    got = np.asarray(got)
    # The 4 overflow agents (rank >= bucket == 8) pass rec through.
    np.testing.assert_allclose(got[8:], np.asarray(rec)[8:])


@pytest.mark.parametrize("seed", [0, 1])
def test_pack_kernel_matches_scatter(seed):
    """The MXU one-hot pack kernel (ops/pack_pallas.py) must produce the
    exact same packed array as the XLA scatter path."""
    n = 96
    world = 24.0
    cfg = BucketConfig.create(world, world, (0.0, 0.0), 3.0,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    scene = random_scene(seed, n, world, 3.0)
    pos, vel, self_pref, pref_c, prio, eye, alive, rec = scene
    a = bucketize(cfg, pos, vel, pref_c, self_pref, prio, eye, rec, alive,
                  use_pack_kernel=False)
    b = bucketize(cfg, pos, vel, pref_c, self_pref, prio, eye, rec, alive,
                  use_pack_kernel=True, interpret=True)
    pa, pTa, ba, _, _ = a
    pb, pTb, bb, _, _ = b
    np.testing.assert_array_equal(np.asarray(ba), np.asarray(bb))
    pa, pb = np.asarray(pa), np.asarray(pb)
    # Identical on the meaningful rows (the scatter path leaves 0 in the
    # bpos/hit columns of sentinel rows; the pack path leaves 0 too except
    # col 13 on real rows — compare the kernel-consumed rows 0..12).
    np.testing.assert_array_equal(pa[:, :13], pb[:, :13])
    # The pack kernel's transposed candidate plane must equal the scatter
    # path's XLA transpose bitwise (it feeds the force kernel's strips).
    np.testing.assert_array_equal(np.asarray(pTa), np.asarray(pTb))


def test_fused_with_pack_kernel_matches_oracle():
    n = 96
    world = 24.0
    cfg = BucketConfig.create(world, world, (0.0, 0.0), 3.0,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    zp = make_params()
    scene = random_scene(1, n, world, 3.0)
    pos, vel, self_pref, pref_c, prio, eye, alive, rec = scene
    got, _, _ = zanlungo_fused(cfg, zp, pos, vel, self_pref, pref_c,
                               prio, eye, alive, rec, interpret=True,
                               use_pack_kernel=True)
    want = oracle(zp, scene)
    m = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(want)[m],
                               rtol=2e-4, atol=2e-4)


def test_pack_kernel_overflow_diagnostic():
    """Degenerate clustering (all agents in one tile, huge drop count)
    reports window overflow instead of failing silently."""
    from rmf_crowdsim_tpu.ops.pack_pallas import (
        CHUNK,
        MAX_CHUNKS,
        pack_rows_pallas,
    )
    from rmf_crowdsim_tpu.ops.zanlungo_pallas import NUM_F

    n = CHUNK * MAX_CHUNKS + 640  # more rows than one group window
    slots = 512 * 4
    feat = jnp.zeros((n, NUM_F), jnp.float32)
    # All rows map to slot 0..7 (bucket 8 of tile 0); the rest dropped
    # (bpos == slots) but interleaved AFTER, so the window must stream
    # past them.
    bpos = jnp.where(jnp.arange(n) < 8, jnp.arange(n), slots).astype(
        jnp.int32
    )
    feat = feat.at[:, 13].set(bpos.astype(jnp.float32))
    feat = feat.at[:, 15].set(1.0)
    packed, _pT, overflow = pack_rows_pallas(feat.T, bpos, slots,
                                             interpret=True)
    # Everything needed fits (8 real rows at the window start): the
    # interleaved drop rows (bpos == slots) inflate the group's raw SPAN
    # past the window but are not packable, so the exact audit reports 0.
    assert packed.shape == (slots, NUM_F)
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(packed[:8, 15]), 1.0)

    # Genuine loss: more IN-BUCKET rows in one group's window than the
    # stream can reach (slot stride 128 spreads 40 real rows over a
    # window whose span the interleaved drops push past the cap).
    window = CHUNK * MAX_CHUNKS
    n2 = window + 512
    bpos2 = np.full((n2,), slots, np.int32)
    # 12 in-bucket rows past the window end, in group 0 (slots 0..511
    # with GROUP=512): rows 0..7 -> slots 0..7, rows beyond the window
    # -> slots 100..111.
    bpos2[:8] = np.arange(8)
    bpos2[window + 100:window + 112] = np.arange(100, 112)
    bpos2 = jnp.asarray(bpos2)
    feat2 = jnp.zeros((n2, NUM_F), jnp.float32)
    feat2 = feat2.at[:, 13].set(bpos2.astype(jnp.float32))
    feat2 = feat2.at[:, 15].set(1.0)
    _, _, overflow2 = pack_rows_pallas(feat2.T, bpos2, slots,
                                       interpret=True)
    assert int(overflow2) == 12


def test_pack_kernel_dead_tail_not_counted_as_overflow():
    """A large dead/dropped tail (bpos == slots) sorts last and sits
    inside the FINAL group's row span — a mostly-dead capacity feeds
    ~45% dead rows this way.  The audit must not count it: the old
    span-based audit reported ~835k phantom drops per 1M pack."""
    from rmf_crowdsim_tpu.ops.pack_pallas import pack_rows_pallas
    from rmf_crowdsim_tpu.ops.zanlungo_pallas import NUM_F

    slots = 512 * 3
    n_real = 64
    n_dead = 4096  # tail far bigger than the streaming window
    n = n_real + n_dead
    bpos = np.full((n,), slots, np.int32)
    # Real rows land in the LAST group (slots 1024..1535) so the dead
    # tail extends that same group's span.
    bpos[:n_real] = 1024 + np.arange(n_real)
    bpos = jnp.asarray(bpos)
    feat = jnp.zeros((n, NUM_F), jnp.float32)
    feat = feat.at[:, 13].set(bpos.astype(jnp.float32))
    feat = feat.at[:, 15].set(1.0)
    packed, _pT, overflow = pack_rows_pallas(feat.T, bpos, slots,
                                             interpret=True)
    assert int(overflow) == 0
    np.testing.assert_array_equal(
        np.asarray(packed[1024:1024 + n_real, 15]), 1.0
    )


@pytest.mark.slow
def test_spill_patch_repairs_overflow_exactly():
    """Bucket overflow with spill_capacity > 0 must match the oracle for
    EVERY agent — including the overflow agents and their neighbors (the
    reference's cells are unbounded, location_hash_2d.rs:15)."""
    n = 96
    world = 24.0
    eyesight_max = 3.0
    cfg = BucketConfig.create(world, world, (0.0, 0.0), eyesight_max,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    zp = make_params()
    rng = np.random.default_rng(11)
    f32 = jnp.float32
    # 30 agents crammed into one tile (occupancy >> bucket 16), the rest
    # spread out.
    pos = rng.uniform(0.0, world, (n, 2))
    pos[:30] = rng.uniform(9.0, 11.5, (30, 2))
    pos = jnp.asarray(pos, f32)
    vel = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    pref = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    self_pref = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    prio = jnp.asarray(rng.permutation(n).astype(np.float32))
    eye = jnp.asarray(rng.uniform(0.5, eyesight_max, (n,)), f32)
    alive = jnp.asarray(rng.random(n) > 0.1)
    rec = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    scene = (pos, vel, self_pref, pref, prio, eye, alive, rec)

    got, max_occ, dropped = zanlungo_fused(
        cfg, zp, *scene, interpret=True,
        spill_capacity=64)
    assert int(max_occ) > cfg.bucket, "scene must actually overflow"
    assert int(dropped) == 0, "patch should resolve all overflow"
    want = oracle(zp, scene)
    a = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(want)[a],
                               rtol=2e-4, atol=2e-4)

    # Without the patch the same scene truncates (loudly).
    got0, _, dropped0 = zanlungo_fused(cfg, zp, *scene, interpret=True)
    assert int(dropped0) > 0
    err = np.abs(np.asarray(got0)[a] - np.asarray(want)[a]).max()
    assert err > 1e-3, "truncation should visibly corrupt physics"


@pytest.mark.parametrize("seed", [0, 3])
def test_fused_int_prio_matches_oracle(seed):
    """The integer-priority kernel specialization
    (ops/zanlungo_pallas._pair_force int_prio) must match the GENERAL
    oracle on integer priorities — the reference's default, where
    priority is the agent id (zanlungo.rs:94-98).  random_scene's
    permutation priorities qualify."""
    n = 96
    world = 24.0
    eyesight_max = 3.0
    cfg = BucketConfig.create(world, world, (0.0, 0.0), eyesight_max,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    zp = make_params()
    scene = random_scene(seed, n, world, eyesight_max)
    alive = scene[6]

    got, max_occ, dropped = zanlungo_fused(
        cfg, zp, *scene, interpret=True, int_prio=True)
    assert int(max_occ) <= cfg.bucket
    want = oracle(zp, scene)
    a = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(want)[a],
                               rtol=2e-4, atol=2e-4)


def test_fused_int_prio_equal_priorities():
    """Equal priorities (row == 0 everywhere) exercise the int_prio
    specialization's zero-row branch: weight 1, no right-of-way mixing,
    no slerp (zanlungo.rs:101-107)."""
    n = 64
    world = 16.0
    cfg = BucketConfig.create(world, world, (0.0, 0.0), 2.0,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    zp = make_params()
    scene = list(random_scene(4, n, world, 2.0))
    scene[4] = jnp.full((n,), 7.0, jnp.float32)  # all priorities equal
    scene = tuple(scene)

    got, _, _ = zanlungo_fused(cfg, zp, *scene, interpret=True,
                               int_prio=True)
    want = oracle(zp, scene)
    a = np.asarray(scene[6])
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(want)[a],
                               rtol=2e-4, atol=2e-4)


def test_spill_patch_int_prio_matches_oracle():
    """int_prio threads through the spill kernel too: an overflowing
    scene with integer priorities must still match the oracle exactly
    through the patch."""
    n = 96
    world = 24.0
    eyesight_max = 3.0
    cfg = BucketConfig.create(world, world, (0.0, 0.0), eyesight_max,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    zp = make_params()
    rng = np.random.default_rng(11)
    f32 = jnp.float32
    pos = rng.uniform(0.0, world, (n, 2))
    pos[:30] = rng.uniform(9.0, 11.5, (30, 2))
    pos = jnp.asarray(pos, f32)
    vel = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    pref = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    self_pref = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    prio = jnp.asarray(rng.permutation(n).astype(np.float32))
    eye = jnp.asarray(rng.uniform(0.5, eyesight_max, (n,)), f32)
    alive = jnp.asarray(rng.random(n) > 0.1)
    rec = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    scene = (pos, vel, self_pref, pref, prio, eye, alive, rec)

    got, max_occ, dropped = zanlungo_fused(
        cfg, zp, *scene, interpret=True, spill_capacity=64, int_prio=True)
    assert int(max_occ) > cfg.bucket and int(dropped) == 0
    want = oracle(zp, scene)
    a = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(want)[a],
                               rtol=2e-4, atol=2e-4)


def test_spill_patch_cap_overrun_is_counted():
    """Overflow beyond the static caps must surface in `dropped`."""
    n = 64
    world = 24.0
    cfg = BucketConfig.create(world, world, (0.0, 0.0), 3.0,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    zp = make_params()
    rng = np.random.default_rng(5)
    f32 = jnp.float32
    pos = jnp.asarray(rng.uniform(10.0, 11.0, (n, 2)), f32)  # one hotspot
    vel = jnp.zeros((n, 2), f32)
    scene = (pos, vel, vel, vel, jnp.arange(n, dtype=f32),
             jnp.full((n,), 2.0, f32), jnp.ones((n,), bool), vel)
    _, max_occ, dropped = zanlungo_fused(
        cfg, zp, *scene, interpret=True,
        spill_capacity=4)
    assert int(max_occ) > cfg.bucket
    assert int(dropped) > 0


@pytest.mark.slow
def test_spill_patch_repairs_overflow_at_world_edge():
    """Hotspot in the world's CORNER tile: the clamped 5x5 window and the
    dynamically-positioned query block must still cover every affected
    query (regression for slice-clipping tile misalignment)."""
    n = 80
    world = 24.0
    cfg = BucketConfig.create(world, world, (0.0, 0.0), 3.0,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    zp = make_params()
    rng = np.random.default_rng(3)
    f32 = jnp.float32
    pos = rng.uniform(0.0, world, (n, 2))
    pos[:30] = rng.uniform(0.1, 2.4, (30, 2))  # corner tile (0, 0)
    scene = (jnp.asarray(pos, f32),
             jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32),
             jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32),
             jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32),
             jnp.asarray(rng.permutation(n).astype(np.float32)),
             jnp.asarray(rng.uniform(0.5, 3.0, (n,)), f32),
             jnp.ones((n,), bool),
             jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32))
    got, max_occ, dropped = zanlungo_fused(
        cfg, zp, *scene, interpret=True, spill_capacity=64)
    assert int(max_occ) > cfg.bucket
    assert int(dropped) == 0
    want = oracle(zp, scene)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_spill_groups_xla_fallback_matches_oracle(monkeypatch):
    """The pure-XLA spill-group path (_spill_groups_xla) is the live
    fallback for hand-built BucketConfigs whose packed plane is narrower
    than one aligned window DMA (see _spill_groups), and the historical
    parity oracle for the Pallas window kernel.  Route the whole spill
    patch through it end-to-end on the overflow scene and require the
    same exactness the Pallas path delivers."""
    import rmf_crowdsim_tpu.ops.zanlungo_pallas as zpal

    def xla_groups(cfg, zp, packed_t, sp, tcx, tcy, valid, chunk,
                   interpret=False, int_prio=False, packed_T=None):
        return zpal._spill_groups_xla(cfg, zp, packed_t, sp, tcx, tcy,
                                      valid, chunk)

    monkeypatch.setattr(zpal, "_spill_groups", xla_groups)

    n = 96
    world = 24.0
    eyesight_max = 3.0
    cfg = BucketConfig.create(world, world, (0.0, 0.0), eyesight_max,
                              bucket=16, strip_tiles=6, sub_tiles=6)
    zp = make_params()
    rng = np.random.default_rng(11)
    f32 = jnp.float32
    pos = rng.uniform(0.0, world, (n, 2))
    pos[:30] = rng.uniform(9.0, 11.5, (30, 2))
    pos = jnp.asarray(pos, f32)
    vel = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    pref = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    self_pref = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    prio = jnp.asarray(rng.permutation(n).astype(np.float32))
    eye = jnp.asarray(rng.uniform(0.5, eyesight_max, (n,)), f32)
    alive = jnp.asarray(rng.random(n) > 0.1)
    rec = jnp.asarray(rng.uniform(-2, 2, (n, 2)), f32)
    scene = (pos, vel, self_pref, pref, prio, eye, alive, rec)

    got, max_occ, dropped = zanlungo_fused(
        cfg, zp, *scene, interpret=True, spill_capacity=64)
    assert int(max_occ) > cfg.bucket, "scene must actually overflow"
    assert int(dropped) == 0
    want = oracle(zp, scene)
    a = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(got)[a], np.asarray(want)[a],
                               rtol=2e-4, atol=2e-4)


def test_pack_overflow_agents_keep_rec_vel():
    """Agents dropped by the PACK KERNEL's streaming window (not bucket
    overflow) must keep their recommended velocity like every other
    unpacked agent — regression: their assigned slot holds the sentinel
    row, and the output gather returned that slot's zero, freezing them
    (the guard reads the slot's ROW_ID only when bucketize reports more
    drops than bucket overflow accounts for)."""
    from rmf_crowdsim_tpu.ops.pack_pallas import CHUNK, MAX_CHUNKS

    window = CHUNK * MAX_CHUNKS
    n_a = window + 76          # hotspot rows: blow one group's window
    n_b = 8
    n = n_a + n_b
    cfg = BucketConfig.create(12.0, 12.0, (0.0, 0.0), 2.0,
                              bucket=16, strip_tiles=8, sub_tiles=6,
                              tile_size=2.0)
    assert cfg.slots >= 512, "group 0 must span several tiles"
    zp = make_params()
    rng = np.random.default_rng(3)
    f32 = jnp.float32
    pos = np.zeros((n, 2))
    pos[:n_a] = rng.uniform(0.1, 1.9, (n_a, 2))      # tile (0, 0)
    # B sits in the SAME slot group as the hotspot tile (same tile
    # column, tid 5 -> slots 80-95 < 512) but sorts AFTER its 1100-row
    # span, so B's packable rows fall beyond the group's 1024-row
    # streaming window — genuine pack-window drops.
    pos[n_a:] = rng.uniform(0.1, 1.9, (n_b, 2)) + [0.0, 10.0]  # tile (0, 5)
    eye = np.full((n,), 2.0)
    eye[n_a:] = 0.05           # B agents interact with nobody
    rec = np.zeros((n, 2))
    rec[n_a:] = (1.0, 2.0)
    scene = (
        jnp.asarray(pos, f32),
        jnp.zeros((n, 2), f32),
        jnp.zeros((n, 2), f32),
        jnp.zeros((n, 2), f32),
        jnp.asarray(np.arange(n), f32),
        jnp.asarray(eye, f32),
        jnp.ones((n,), bool),
        jnp.asarray(rec, f32),
    )
    got, max_occ, dropped = zanlungo_fused(
        cfg, zp, *scene, interpret=True, use_pack_kernel=True,
    )
    # The hotspot's sorted span pushes B's rows past the group window:
    # bucket overflow alone would be n_a - 16, so any extra drops are
    # pack-window drops (B's packable rows).
    assert int(dropped) > n_a - 16, "scene must produce pack-window drops"
    b_vel = np.asarray(got)[n_a:]
    np.testing.assert_array_equal(b_vel, rec[n_a:].astype(np.float32))
