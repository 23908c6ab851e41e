"""Whole-step domain decomposition (parallel/worldstep.py): the ENTIRE
step — spawn, planners, fused forces, integration, waypoint bookkeeping,
despawn — sharded over the world mesh, with agents MIGRATING between
shards.  The claim under test is sharding invariance: an 8-device run is
BITWISE identical to a 1-device run of the same engine while agents
stream across region boundaries (VERDICT round-1 item 5)."""

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
from rmf_crowdsim_tpu.parallel.worldstep import (
    WORLD_AXIS,
    build_world_rollout,
    shard_state_by_region,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)


def make_scene(capacity=128, dual_row=False, invariance="bitwise",
               tile=0.0, spill=0):
    """A streaming scene whose agents cross all 8 region boundaries:
    sources on the left edge, sinks on the right, Zanlungo forces on."""
    cfg = SimConfig(
        capacity=capacity,
        grid=GridConfig(width=48.0, height=48.0, cell_size=3.0,
                        offset=(0.0, 0.0)),
        neighbor_backend="grid_pallas",
        max_eyesight=3.0,
        bucket_capacity=16,
        strip_tiles=6,
        sub_tiles=6,
        pallas_interpret=True,
        dtype="float32",
        on_truncation="ignore",
        dual_row=dual_row,
        sharding_invariance=invariance,
        bucket_tile_size=tile,
        spill_capacity=spill,
    )
    hl = ConstantVelocity((1.5, 0.0))
    lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.25,
                  force_cap=10.0)
    sources = []
    for k, y in enumerate((12.0, 24.0, 36.0)):
        sources.append(SourceSink(
            source=(2.0, y),
            waypoints=[(45.0, y)],
            radius_sink=1.5,
            crowd_generator=MonotonicCrowd(1.0),
            high_level_planner=hl,
            local_planner=lp,
            agent_eyesight_range=3.0,
        ))
    sp = stack_source_params(
        sources, [0] * len(sources), [0] * len(sources),
        [[-1] * len(s.waypoints) for s in sources], cfg.jdtype,
    )
    params = SimParams(hl=(hl.init_params(),), lp=(lp.init_params(),),
                       sources=sp)
    state = make_state(cfg, seed=3)
    return cfg, hl, lp, params, state


def run_world(n_devices: int, n_steps: int = 40, dual_row=False,
              invariance="bitwise", tile=0.0, capacity=128, spill=0):
    cfg, hl, lp, params, state = make_scene(
        capacity=capacity, dual_row=dual_row, invariance=invariance,
        tile=tile, spill=spill,
    )
    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:n_devices]), (WORLD_AXIS,)
    )
    state = shard_state_by_region(cfg, mesh, state)
    rollout = build_world_rollout(cfg, [hl], [lp], mesh)
    st, counters = rollout(params, state, 1.0, n_steps)
    st = jax.device_get(st)
    alive = np.asarray(st.alive)
    uid = np.asarray(st.uid)
    pos = np.asarray(st.position)
    vel = np.asarray(st.velocity)
    nwp = np.asarray(st.next_waypoint)
    agents = {
        int(uid[i]): (pos[i, 0], pos[i, 1], vel[i, 0], vel[i, 1],
                      int(nwp[i]))
        for i in np.flatnonzero(alive)
    }
    return agents, jax.device_get(counters), st


@pytest.mark.parametrize("dual_row", [False, True])
def test_world_sharded_matches_single_device_bitwise(dual_row):
    # dual_row=True exercises the dual-row compacted tier under the
    # world engine's HALO-EXTENDED BucketConfigs, where the lane_ok
    # column clip interacts with the dual tier's bbox unions (bench
    # enables dual_row for grid_pallas, so this path is production).
    a8, c8, _ = run_world(8, dual_row=dual_row)
    a1, c1, _ = run_world(1, dual_row=dual_row)

    # Agents actually migrated across shards in the 8-device run, and
    # nothing was lost or mis-regioned.
    assert int(np.sum(c8.migrated)) > 0
    assert int(np.sum(c8.migration_overflow)) == 0
    assert int(np.sum(c8.arrival_dropped)) == 0
    assert int(np.sum(c8.stray)) == 0
    assert int(np.sum(c1.migrated)) == 0  # single device: nothing to cross

    # Same population, same uids.
    assert a8.keys() == a1.keys()
    assert len(a8) > 20

    # BITWISE trajectory equality, keyed by uid.
    for k in a8:
        assert a8[k] == a1[k], (k, a8[k], a1[k])

    # Per-step lifecycle counters identical.
    for name in ("n_alive", "n_spawned", "n_destroyed",
                 "n_waypoint_reached", "spawn_dropped"):
        np.testing.assert_array_equal(
            np.asarray(getattr(c8, name)), np.asarray(getattr(c1, name)),
            err_msg=name,
        )


@pytest.mark.slow
def test_world_sharded_matches_general_rollout():
    """The world engine's physics agrees with the general single-device
    rollout (same scene) — tolerance-level (force sums are ordered
    differently: canonical (tile, uid) vs slot order)."""
    a1, c1, _ = run_world(1, n_steps=25)

    cfg, hl, lp, params, state = make_scene()
    rollout = jax.jit(build_rollout(cfg, [hl], [lp]), static_argnums=(3,))
    st, counters = rollout(params, state, 1.0, 25)
    st = jax.device_get(st)
    alive = np.asarray(st.alive)
    uid = np.asarray(st.uid)
    pos = np.asarray(st.position)
    ref = {int(uid[i]): (pos[i, 0], pos[i, 1])
           for i in np.flatnonzero(alive)}

    assert ref.keys() == a1.keys()
    for k in ref:
        np.testing.assert_allclose(ref[k], a1[k][:2], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(counters.n_alive), np.asarray(c1.n_alive)
    )


def make_hotspot_scene(capacity=512, invariance="bitwise", tile=0.0):
    """Closed scene with a dense cluster straddling a shard boundary
    (x = 12 of 8 x 6 m regions): bucket overflow whose blast radius
    crosses shards — exercises the neighbor spill exchange."""
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
        dtype="float32",
        on_truncation="ignore",
        sharding_invariance=invariance,
        bucket_tile_size=tile,
    )
    hl = ConstantVelocity((0.6, 0.2))
    lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.25,
                  force_cap=10.0)
    rng = np.random.default_rng(12)
    from rmf_crowdsim_tpu import make_state as _ms

    state = _ms(cfg, seed=5)
    n = 80
    pos = np.zeros((capacity, 2))
    pos[:n] = rng.uniform(3.0, 45.0, (n, 2))
    # 40 agents across the two 3 m tiles touching the x=12 shard
    # boundary: ~20 per tile > bucket 16, spills on BOTH sides.
    pos[:40] = rng.uniform(0.0, 1.0, (40, 2)) * [2.0, 1.0] + [11.0, 22.0]
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
    params = SimParams(hl=(hl.init_params(),), lp=(lp.init_params(),),
                       sources=None)
    return cfg, hl, lp, params, state


def _run_hotspot(n_devices, n_steps=8, invariance="bitwise", tile=0.0):
    cfg, hl, lp, params, state = make_hotspot_scene(
        invariance=invariance, tile=tile
    )
    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:n_devices]), (WORLD_AXIS,)
    )
    st = shard_state_by_region(cfg, mesh, state)
    rollout = build_world_rollout(cfg, [hl], [lp], mesh)
    st, c = rollout(params, st, 0.2, n_steps)
    st = jax.device_get(st)
    alive = np.asarray(st.alive)
    uid = np.asarray(st.uid)
    pos = np.asarray(st.position)
    return ({int(uid[i]): pos[i] for i in np.flatnonzero(alive)},
            jax.device_get(c))


@pytest.mark.slow
def test_world_sharded_boundary_hotspot_repaired():
    """Bucket overflow at a shard boundary: the spill exchange + patch
    keep physics exact (zero truncation) and sharding-consistent at
    tolerance (patched rows sum in different lane orders)."""
    a8, c8 = _run_hotspot(8)
    assert int(np.sum(np.asarray(c8.neighbor_truncated))) == 0
    assert int(np.max(np.asarray(c8.max_cell_occupancy))) > 16

    a1, c1 = _run_hotspot(1)
    assert int(np.sum(np.asarray(c1.neighbor_truncated))) == 0
    assert a8.keys() == a1.keys()
    g = np.asarray([a8[k] for k in sorted(a8)])
    w = np.asarray([a1[k] for k in sorted(a1)])
    np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)

    # And both match the general single-device rollout.
    cfg, hl, lp, params, state = make_hotspot_scene()
    rollout = jax.jit(build_rollout(cfg, [hl], [lp]), static_argnums=(3,))
    st, counters = rollout(params, state, 0.2, 8)
    assert int(np.max(np.asarray(counters.neighbor_truncated))) == 0
    st = jax.device_get(st)
    alive = np.asarray(st.alive)
    uid = np.asarray(st.uid)
    pos = np.asarray(st.position)
    ref = {int(uid[i]): pos[i] for i in np.flatnonzero(alive)}
    assert ref.keys() == a1.keys()
    r = np.asarray([ref[k] for k in sorted(ref)])
    np.testing.assert_allclose(r, w, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# sharding_invariance="tolerance": per-shard skin-deferred presort
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dual_row,spill", [(False, 0), (True, 0),
                                            (False, 32)])
def test_world_tolerance_matches_single_device(dual_row, spill):
    """Tolerance mode (per-shard carried binning): 8-device vs 1-device
    runs agree at f32 tolerance (neighbor sets and forces are EXACT;
    only force-sum lane order depends on shard history), and lifecycle
    counters stay exactly equal.  bucket_tile_size=4 gives the positive
    skin margin ((4 - 3)/2) the mode requires.  spill=32 turns on the
    RIDER path: spawns and migration arrivals stay unbinned on the
    exact spill patch instead of forcing per-shard re-sorts."""
    a8, c8, _ = run_world(8, dual_row=dual_row, invariance="tolerance",
                          tile=4.0, capacity=256, spill=spill)
    a1, c1, _ = run_world(1, dual_row=dual_row, invariance="tolerance",
                          tile=4.0, capacity=256, spill=spill)

    assert int(np.sum(np.asarray(c8.migrated))) > 0
    assert int(np.sum(np.asarray(c8.migration_overflow))) == 0
    assert int(np.sum(np.asarray(c8.arrival_dropped))) == 0
    assert a8.keys() == a1.keys()
    assert len(a8) > 20
    for k in a8:
        np.testing.assert_allclose(
            np.asarray(a8[k]), np.asarray(a1[k]), rtol=1e-5, atol=1e-5,
            err_msg=str(k),
        )
        assert a8[k][4] == a1[k][4]  # next_waypoint exact

    # Lifecycle counters are EXACT in tolerance mode too.
    for name in ("n_alive", "n_spawned", "n_destroyed",
                 "n_waypoint_reached", "spawn_dropped"):
        np.testing.assert_array_equal(
            np.asarray(getattr(c8, name)), np.asarray(getattr(c1, name)),
            err_msg=name,
        )


def test_world_tolerance_matches_bitwise_mode():
    """Tolerance vs bitwise mode on the same 8-device scene: identical
    physics at f32 tolerance, identical lifecycle counters — and the
    tolerance run actually AMORTIZES its sorts (resorted < D * steps,
    the mode's whole point)."""
    at, ct, _ = run_world(8, invariance="tolerance", tile=4.0, capacity=256)
    ab, cb, _ = run_world(8, invariance="bitwise", tile=4.0, capacity=256)

    assert at.keys() == ab.keys()
    for k in at:
        np.testing.assert_allclose(
            np.asarray(at[k]), np.asarray(ab[k]), rtol=1e-5, atol=1e-5,
            err_msg=str(k),
        )
    for name in ("n_alive", "n_spawned", "n_destroyed",
                 "n_waypoint_reached", "spawn_dropped"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ct, name)), np.asarray(getattr(cb, name)),
            err_msg=name,
        )
    n_steps = np.asarray(cb.resorted).shape[0]
    assert int(np.sum(np.asarray(cb.resorted))) == 8 * n_steps
    assert int(np.sum(np.asarray(ct.resorted))) < 8 * n_steps


@pytest.mark.slow
def test_world_tolerance_hotspot_carried_spills():
    """Boundary-hotspot bucket overflow under CARRIED binning: spill
    windows center on the carried (stale) tiles exchanged with the spill
    payload — physics must stay exact (zero truncation) and match the
    bitwise mode at tolerance, while sorts amortize (dt=0.2 at ~0.6 m/s
    stays under the 0.5 m skin margin for several steps)."""
    at, ct = _run_hotspot(8, invariance="tolerance", tile=4.0)
    assert int(np.sum(np.asarray(ct.neighbor_truncated))) == 0
    assert int(np.max(np.asarray(ct.max_cell_occupancy))) > 16
    n_steps = np.asarray(ct.resorted).shape[0]
    assert int(np.sum(np.asarray(ct.resorted))) < 8 * n_steps

    ab, cb = _run_hotspot(8, invariance="bitwise", tile=4.0)
    assert int(np.sum(np.asarray(cb.neighbor_truncated))) == 0
    assert at.keys() == ab.keys()
    g = np.asarray([at[k] for k in sorted(at)])
    w = np.asarray([ab[k] for k in sorted(ab)])
    np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)

    # And 8-vs-1 tolerance-mode consistency on the same hotspot.
    a1, c1 = _run_hotspot(1, invariance="tolerance", tile=4.0)
    assert int(np.sum(np.asarray(c1.neighbor_truncated))) == 0
    assert at.keys() == a1.keys()
    s = np.asarray([a1[k] for k in sorted(a1)])
    np.testing.assert_allclose(g, s, rtol=1e-5, atol=1e-5)


def make_edge_scene(capacity=512):
    """Harsh scene for the world-edge semantics (VERDICT r2 weak #3):
    clusters pushed OUT of the world's x-range on both edges, each with
    in-world partners within eyesight — the single-device step clamps
    out-of-world agents into the edge tile (tile_key's default clip) and
    keeps their force interactions; the world engine must match."""
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
        dtype="float32",
        on_truncation="ignore",
    )
    # Two opposing constant-velocity planners so edge pairs CLOSE on each
    # other (equal velocities give zero relative speed -> infinite TTC ->
    # no Zanlungo force at all, zanlungo.rs:76-91).
    hl_r = ConstantVelocity((0.5, 0.0))
    hl_l = ConstantVelocity((-0.5, 0.0))
    # force_cap 2 (not 10): the clusters are intentionally dense, and
    # capped kicks make neighbor sets change discretely every step —
    # ULP-level coordinate rounding (per-shard ext-coordinate shifts)
    # then flips mask thresholds and amplifies chaotically past any
    # tolerance.  The test's claim is "edge-clamped agents keep their
    # forces", not chaos reproduction.
    lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.25,
                  force_cap=2.0)
    rng = np.random.default_rng(7)
    state = make_state(cfg, seed=11)
    n = 120
    pos = np.zeros((capacity, 2))
    pos[:n] = rng.uniform(3.0, 45.0, (n, 2))
    # 12 agents OUTSIDE the left edge (x in [-2, -0.2]) + 12 partners just
    # inside; same on the right edge (x in [48.2, 50]).  Outsiders head
    # into the world, partners head out toward them: closing pairs
    # straddling both world edges.
    pos[0:12] = np.stack([rng.uniform(-2.0, -0.2, 12),
                          rng.uniform(20.0, 26.0, 12)], axis=-1)
    pos[12:24] = np.stack([rng.uniform(0.2, 1.5, 12),
                           rng.uniform(20.0, 26.0, 12)], axis=-1)
    pos[24:36] = np.stack([rng.uniform(48.2, 50.0, 12),
                           rng.uniform(20.0, 26.0, 12)], axis=-1)
    pos[36:48] = np.stack([rng.uniform(46.5, 47.8, 12),
                           rng.uniform(20.0, 26.0, 12)], axis=-1)
    hl_idx = np.zeros(capacity, np.int32)
    hl_idx[0:12] = 0   # outside left -> +x
    hl_idx[12:24] = 1  # left partners -> -x
    hl_idx[24:36] = 1  # outside right -> -x
    hl_idx[36:48] = 0  # right partners -> +x
    alive = np.zeros(capacity, bool)
    alive[:n] = True
    f = cfg.jdtype
    state = state.replace(
        position=jnp.asarray(pos, f),
        eyesight=jnp.where(jnp.asarray(alive), jnp.asarray(3.0, f), 0.0),
        alive=jnp.asarray(alive),
        uid=jnp.arange(capacity, dtype=jnp.int32),
        hl_idx=jnp.asarray(hl_idx),
        lp_idx=jnp.zeros((capacity,), jnp.int32),
        priority=jnp.arange(capacity, dtype=f),
        next_uid=jnp.asarray(capacity, jnp.int32),
    )
    params = SimParams(hl=(hl_r.init_params(), hl_l.init_params()),
                       lp=(lp.init_params(),), sources=None)
    return cfg, [hl_r, hl_l], lp, params, state


@pytest.mark.slow
def test_world_edge_clamp_matches_general():
    """Out-of-world agents keep their force interactions via the edge-tile
    clamp, on 8 devices and 1, matching the general rollout."""
    results = {}
    for n_dev in (8, 1):
        cfg, hls, lp, params, state = make_edge_scene()
        mesh = jax.sharding.Mesh(
            np.asarray(jax.devices()[:n_dev]), (WORLD_AXIS,)
        )
        st = shard_state_by_region(cfg, mesh, state)
        rollout = build_world_rollout(cfg, hls, [lp], mesh)
        st, c = rollout(params, st, 0.2, 4)
        st = jax.device_get(st)
        assert int(np.sum(np.asarray(c.neighbor_truncated))) == 0
        assert int(np.sum(np.asarray(c.stray))) == 0, (
            "edge-clamped agents must not be counted stray"
        )
        alive = np.asarray(st.alive)
        uid = np.asarray(st.uid)
        pos = np.asarray(st.position)
        vel = np.asarray(st.velocity)
        results[n_dev] = {
            int(uid[i]): (*pos[i], *vel[i]) for i in np.flatnonzero(alive)
        }

    cfg, hls, lp, params, state = make_edge_scene()
    rollout = jax.jit(build_rollout(cfg, hls, [lp]), static_argnums=(3,))
    st, counters = rollout(params, state, 0.2, 4)
    assert int(np.max(np.asarray(counters.neighbor_truncated))) == 0
    # The scene really has out-of-world agents (flagged, like lib.rs
    # would error).
    assert int(np.max(np.asarray(counters.out_of_bounds))) > 0
    st = jax.device_get(st)
    alive = np.asarray(st.alive)
    uid = np.asarray(st.uid)
    pos = np.asarray(st.position)
    vel = np.asarray(st.velocity)
    ref = {int(uid[i]): (*pos[i], *vel[i]) for i in np.flatnonzero(alive)}

    for n_dev in (8, 1):
        got = results[n_dev]
        assert ref.keys() == got.keys()
        r = np.asarray([ref[k] for k in sorted(ref)])
        g = np.asarray([got[k] for k in sorted(got)])
        np.testing.assert_allclose(r, g, rtol=2e-4, atol=2e-4,
                                   err_msg=f"n_dev={n_dev}")
        # The outside agents moved under forces (not frozen): their
        # velocity differs from the HL recommendation for at least one.
        outs = [k for k in sorted(ref) if k < 12 or (24 <= k < 36)]
        gv = np.asarray([got[k][2:] for k in outs])
        hv = np.asarray([[0.5, 0.0] if k < 12 else [-0.5, 0.0]
                         for k in outs])
        assert np.max(np.abs(gv - hv)) > 1e-4, (
            "out-of-world agents lost all force interactions"
        )


@pytest.mark.slow
def test_world_shard_capacity_spawn_drop_divergence():
    """THE one documented capacity-pressure divergence: a spawn drops
    when its shard is full even though the global array has room; uids
    advance by the committed count (matching build_step's stream), so
    the drop never aliases ids."""
    capacity = 64  # 8 slots per shard on 8 devices
    cfg = SimConfig(
        capacity=capacity,
        grid=GridConfig(width=48.0, height=48.0, cell_size=3.0,
                        offset=(0.0, 0.0)),
        neighbor_backend="grid_pallas",
        max_eyesight=3.0,
        bucket_capacity=16,
        strip_tiles=6,
        sub_tiles=6,
        pallas_interpret=True,
        dtype="float32",
        on_truncation="ignore",
    )
    hl = ConstantVelocity((0.0, 0.0))  # nobody moves: shard 3 stays full
    lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.25,
                  force_cap=10.0)
    # Source inside shard 3's region [18, 24); 8 blockers fill that shard
    # (none within the 0.4 clearance disc of the source).
    src = SourceSink(
        source=(20.0, 20.0),
        waypoints=[(20.0, 40.0)],
        radius_sink=1.0,
        crowd_generator=MonotonicCrowd(1.0),
        high_level_planner=hl,
        local_planner=lp,
        agent_eyesight_range=3.0,
    )
    sp = stack_source_params([src], [0], [0], [[-1]], cfg.jdtype)
    params = SimParams(hl=(hl.init_params(),), lp=(lp.init_params(),),
                       sources=sp)
    state = make_state(cfg, seed=2)
    pos = np.full((capacity, 2), 40.0)
    pos[:8] = np.stack([np.linspace(18.5, 23.5, 8), np.full(8, 30.0)],
                       axis=-1)
    alive = np.zeros(capacity, bool)
    alive[:8] = True
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

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), (WORLD_AXIS,))
    st = shard_state_by_region(cfg, mesh, state)
    rollout = build_world_rollout(cfg, [hl], [lp], mesh)
    st8, c8 = rollout(params, st, 0.5, 4)
    st8 = jax.device_get(st8)
    # All 4 requested spawns dropped (shard 3 full), population unchanged,
    # and next_uid did NOT advance — committed-count semantics.
    assert int(np.sum(np.asarray(c8.spawn_dropped))) == 4
    assert int(np.asarray(c8.n_alive)[-1]) == 8
    assert int(np.max(np.asarray(st8.next_uid))) == capacity

    # The general step HAS room globally: its FIRST spawn commits (the
    # later ones are then clearance-blocked by the newly spawned agent
    # sitting motionless on the source — reference semantics,
    # lib.rs:208-218) — the divergence is real and bounded to this case.
    g_rollout = jax.jit(build_rollout(cfg, [hl], [lp]),
                        static_argnums=(3,))
    stg, cg = g_rollout(params, state, 0.5, 4)
    assert list(np.asarray(cg.spawn_dropped)) == [0, 1, 1, 1]
    assert int(np.asarray(cg.n_alive)[-1]) == 9
    assert int(np.asarray(stg.next_uid)) == capacity + 1


def make_closing_pair_scene(capacity=16):
    """Two agents straddling the x=12 shard boundary (8 x 6 m regions),
    CLOSING at +-0.5 m/s: nonzero relative velocity -> finite TTC ->
    real Zanlungo forces across the boundary.  Regression scene for the
    halo frame bug (shard-frame ROW_PX made every cross-shard candidate
    appear a full region away, silently zeroing all boundary forces —
    the streaming scenes above never caught it because their shared
    ConstantVelocity gives every pair zero relative velocity and
    therefore zero force)."""
    cfg = SimConfig(
        capacity=capacity,
        grid=GridConfig(width=48.0, height=48.0, cell_size=3.0,
                        offset=(0.0, 0.0)),
        neighbor_backend="grid_pallas",
        max_eyesight=3.0,
        bucket_capacity=16,
        strip_tiles=6,
        sub_tiles=6,
        pallas_interpret=True,
        dtype="float32",
        on_truncation="raise",
    )
    hl_r = ConstantVelocity((0.5, 0.0))
    hl_l = ConstantVelocity((-0.5, 0.0))
    lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.25,
                  force_cap=10.0)
    state = make_state(cfg, seed=7)
    f = cfg.jdtype
    pos = np.zeros((capacity, 2))
    pos[0] = (11.0, 24.0)   # region 1, moving right
    pos[1] = (13.0, 24.0)   # region 2, moving left
    alive = np.zeros(capacity, bool)
    alive[:2] = True
    state = state.replace(
        position=jnp.asarray(pos, f),
        eyesight=jnp.where(jnp.asarray(alive), jnp.asarray(3.0, f), 0.0),
        alive=jnp.asarray(alive),
        uid=jnp.arange(capacity, dtype=jnp.int32),
        hl_idx=jnp.asarray([0, 1] + [0] * (capacity - 2), jnp.int32),
        lp_idx=jnp.zeros((capacity,), jnp.int32),
        priority=jnp.arange(capacity, dtype=f),
        next_uid=jnp.asarray(capacity, jnp.int32),
    )
    params = SimParams(
        hl=(hl_r.init_params(), hl_l.init_params()),
        lp=(lp.init_params(),), sources=None,
    )
    return cfg, [hl_r, hl_l], [lp], params, state


@pytest.mark.slow
def test_world_cross_boundary_forces_match_general():
    """Cross-shard pairs must feel each other: world(8) == world(1)
    BITWISE (global ROW_PX keeps the pair math frame-free) and both
    match the general single-device rollout at tolerance."""
    cfg, hls, lps, params, state = make_closing_pair_scene()
    n_steps, dt = 3, 1.0

    def run_world_d(d):
        mesh = jax.sharding.Mesh(
            np.asarray(jax.devices()[:d]), (WORLD_AXIS,)
        )
        st = shard_state_by_region(cfg, mesh, state)
        rollout = build_world_rollout(cfg, hls, lps, mesh)
        st, c = rollout(params, st, dt, n_steps)
        st = jax.device_get(st)
        uid = np.asarray(st.uid)
        pos = np.asarray(st.position)
        return {int(uid[i]): tuple(pos[i])
                for i in np.flatnonzero(np.asarray(st.alive))}

    w8 = run_world_d(8)
    w1 = run_world_d(1)

    g_rollout = jax.jit(build_rollout(cfg, hls, lps), static_argnums=(3,))
    stg, _ = g_rollout(params, state, dt, n_steps)
    stg = jax.device_get(stg)
    uid = np.asarray(stg.uid)
    pos = np.asarray(stg.position)
    gen = {int(uid[i]): tuple(pos[i])
           for i in np.flatnonzero(np.asarray(stg.alive))}

    assert w8.keys() == w1.keys() == gen.keys() == {0, 1}
    # The force actually acted: trajectories deviate from pure advection.
    advect0 = np.asarray([11.0 + 0.5 * dt * n_steps, 24.0])
    assert np.abs(np.asarray(gen[0]) - advect0).max() > 1e-3, (
        "scene must produce a real cross-boundary force"
    )
    # Sharding-invariant bitwise; engine-equivalent at tolerance.
    for k in w8:
        assert w8[k] == w1[k], (k, w8[k], w1[k])
        np.testing.assert_allclose(w8[k], gen[k], rtol=1e-5, atol=1e-5)
