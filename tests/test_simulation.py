"""Core Simulation tests, reproducing the reference's shipped scenarios.

- test_step_integration mirrors lib.rs:422-453.
- test_event_listener_source_sink_api mirrors
  rmf_crowdsim/tests/event_listeners_test.rs:64-111 step for step.
"""

import numpy as np
import pytest

from rmf_crowdsim_tpu import (
    ConstantVelocity,
    EventListener,
    GridConfig,
    MonotonicCrowd,
    NoLocalPlan,
    SimConfig,
    Simulation,
    SourceSink,
)

GRID = GridConfig(width=1000.0, height=1000.0, cell_size=20.0, offset=(-500.0, -500.0))


def make_sim(backend="brute", capacity=64, **kw):
    cfg = SimConfig(
        capacity=capacity,
        grid=GRID,
        neighbor_backend=backend,
        max_eyesight=100.0,
        **kw,
    )
    return Simulation(cfg)


def test_step_integration():
    """lib.rs:422-453: one agent, constant-velocity HL planner, NoLocalPlan:
    a 1 s step moves it by exactly v*dt."""
    sim = make_sim()
    hl = ConstantVelocity((1.0, 0.0))
    lp = NoLocalPlan()
    assert sim.num_agents == 0
    ids = sim.add_agents([(0.0, 0.0)], hl, lp, agent_eyesight_range=100.0)
    assert ids == [0]
    assert sim.num_agents == 1
    sim.step(1.0)
    assert sim.num_agents == 1
    pos = np.asarray(sim.agents[0].position)
    assert np.linalg.norm(pos - np.array([1.0, 0.0])) < 1e-5


class MockEventListener(EventListener):
    """event_listeners_test.rs:37-62."""

    def __init__(self):
        self.added = []
        self.removed = []
        self.waypoints = []

    def agent_spawned(self, position, agent_id):
        self.added.append(agent_id)

    def agent_destroyed(self, agent_id):
        self.removed.append(agent_id)

    def waypoint_reached(self, position, agent_id):
        self.waypoints.append(agent_id)


@pytest.mark.parametrize("backend", ["brute", "grid"])
def test_event_listener_source_sink_api(backend):
    """event_listeners_test.rs:64-111: MonotonicCrowd rate 1/s streaming to
    a sink at (20,0) with radius 1.  Population grows one per step for 20
    steps, then holds at 20 with one spawn + one despawn per step."""
    sim = make_sim(backend=backend)
    hl = ConstantVelocity((1.0, 0.0))
    lp = NoLocalPlan()
    listener = MockEventListener()
    sim.add_event_listener(listener)
    sim.add_source_sink(
        SourceSink(
            source=(0.0, 0.0),
            waypoints=[(20.0, 0.0)],
            radius_sink=1.0,
            crowd_generator=MonotonicCrowd(1.0),
            high_level_planner=hl,
            local_planner=lp,
            agent_eyesight_range=5.0,
            loop_forever=False,
        )
    )
    for step in range(20):
        assert sim.num_agents == step
        assert len(listener.added) == step
        sim.step(1.0)
    for step in range(20, 40):
        assert sim.num_agents == 20
        assert len(listener.added) == step
        assert len(listener.removed) == step - 20
        sim.step(1.0)


def test_spawn_clearance_blocks():
    """lib.rs:208-218: a spawn is dropped when an alive agent sits strictly
    within 0.4 of the source."""
    sim = make_sim()
    hl = ConstantVelocity((0.0, 0.0))  # parked agent
    lp = NoLocalPlan()
    sim.add_agents([(0.0, 0.0)], hl, lp, 5.0)
    sim.add_source_sink(
        SourceSink(
            source=(0.0, 0.0),
            waypoints=[(20.0, 0.0)],
            radius_sink=1.0,
            crowd_generator=MonotonicCrowd(1.0),
            high_level_planner=hl,
            local_planner=lp,
            agent_eyesight_range=5.0,
        )
    )
    sim.step(1.0)
    assert sim.num_agents == 1  # blocked by the parked agent
    assert int(sim.last_events.spawn_dropped) == 1


def test_many_sources_chunked_clearance():
    """> 64 sources exercises the lax.map-chunked clearance pass
    (step.py _spawn_phase); decisions must match the dense small-S path:
    blocked sources (a parked agent within 0.4) drop their spawn, clear
    ones spawn one agent each."""
    n_src = 70  # > the 64-source chunk => 2 chunks, padded
    sim = make_sim(capacity=256)
    hl = ConstantVelocity((0.0, 0.0))
    lp = NoLocalPlan()
    # Park agents on the first 3 sources (spaced >> 0.4 apart).
    blocked_xs = [0.0, 10.0, 20.0]
    sim.add_agents([(x, 0.0) for x in blocked_xs], hl, lp, 5.0)
    for i in range(n_src):
        sim.add_source_sink(
            SourceSink(
                source=(i * 10.0, 0.0),
                waypoints=[(i * 10.0, 400.0)],
                radius_sink=1.0,
                crowd_generator=MonotonicCrowd(1.0),
                high_level_planner=hl,
                local_planner=lp,
                agent_eyesight_range=5.0,
            )
        )
    sim.step(1.0)
    assert sim.num_agents == 3 + (n_src - 3)
    assert int(sim.last_events.spawn_dropped) == 3


def test_loop_forever_wraps():
    """lib.rs:318-320: with loop_forever, reaching the last waypoint resets
    next_waypoint to 0 instead of despawning."""
    sim = make_sim()
    hl = ConstantVelocity((1.0, 0.0))
    lp = NoLocalPlan()
    sim.add_source_sink(
        SourceSink(
            source=(0.0, 0.0),
            waypoints=[(3.0, 0.0)],
            radius_sink=1.0,
            crowd_generator=MonotonicCrowd(1.0),
            high_level_planner=hl,
            local_planner=lp,
            agent_eyesight_range=5.0,
            loop_forever=True,
        )
    )
    for _ in range(10):
        sim.step(1.0)
    # Nobody despawns; the single waypoint keeps wrapping.  Only spawn
    # clearance limits the population (source clears after 1 step each).
    assert sim.num_agents > 1
    views = sim.agents.values()
    assert all(v.next_waypoint == 0 for v in views)


def test_remove_agents_and_events():
    sim = make_sim()
    listener = MockEventListener()
    sim.add_event_listener(listener)
    hl = ConstantVelocity((1.0, 0.0))
    lp = NoLocalPlan()
    ids = sim.add_agents([(0.0, 0.0), (5.0, 0.0)], hl, lp, 5.0)
    assert listener.added == ids
    sim.remove_agents(ids[0])
    assert listener.removed == [ids[0]]
    assert sim.num_agents == 1
    with pytest.raises(KeyError):
        sim.remove_agents(ids[0])


def test_agent_ids_never_reused():
    """lib.rs:128-129: ids are monotonic even when slots are reused."""
    sim = make_sim(capacity=2)
    hl = ConstantVelocity((0.0, 0.0))
    lp = NoLocalPlan()
    a = sim.add_agents([(0.0, 0.0)], hl, lp, 5.0)[0]
    sim.remove_agents(a)
    b = sim.add_agents([(1.0, 0.0)], hl, lp, 5.0)[0]
    assert b == a + 1


def test_sim_time_advances():
    """Divergence from the reference (which never advances sim_time,
    lib.rs:81,110): our clock accumulates dt."""
    sim = make_sim()
    hl = ConstantVelocity((0.0, 0.0))
    sim.add_agents([(0.0, 0.0)], hl, NoLocalPlan(), 5.0)
    sim.step(0.5)
    sim.step(0.25)
    assert abs(sim.sim_time - 0.75) < 1e-6


def test_public_spatial_queries():
    """Simulation-level kNN / radius queries (the reference exposes its
    SpatialIndex to callers; spatial_index.rs:4-14)."""
    sim = make_sim()
    hl = ConstantVelocity((0.0, 0.0))
    lp = NoLocalPlan()
    ids = sim.add_agents([(0.0, 0.0), (1.0, 0.0), (3.0, 0.0)], hl, lp, 5.0)
    near = sim.get_neighbours_in_radius(2.0, (0.0, 0.0))
    assert set(near) == {ids[0], ids[1]}
    knn = sim.get_nearest_neighbours(2, (0.9, 0.0))
    assert knn == [ids[1], ids[0]]


def test_state_invariants_clean_and_violations():
    """utils.validate: a healthy sim reports zero violations; corrupted
    state is caught."""
    import jax.numpy as jnp
    import pytest as _pytest

    from rmf_crowdsim_tpu.utils.validate import check_state, validate_state

    sim = make_sim()
    hl = ConstantVelocity((1.0, 0.0))
    sim.add_agents([(0.0, 0.0), (1.0, 0.0)], hl, NoLocalPlan(), 5.0)
    sim.step(0.5)
    check_state(sim.state)  # no raise
    bad = sim.state.replace(
        position=sim.state.position.at[0, 0].set(jnp.nan),
        uid=sim.state.uid.at[1].set(sim.state.uid[0]),
    )
    report = {k: int(v) for k, v in validate_state(bad).items()}
    assert report["nonfinite_position"] == 1
    assert report["duplicate_live_uid"] == 1
    with _pytest.raises(ValueError):
        check_state(bad)


def test_remove_source_sink_stops_spawning():
    """lib.rs:164-168: removing a SourceSink stops its spawns; existing
    agents keep flowing to the sink (reference TODO keeps them too)."""
    sim = make_sim()
    hl = ConstantVelocity((1.0, 0.0))
    ss = SourceSink(
        source=(0.0, 0.0), waypoints=[(20.0, 0.0)], radius_sink=1.0,
        crowd_generator=MonotonicCrowd(1.0), high_level_planner=hl,
        local_planner=NoLocalPlan(), agent_eyesight_range=5.0,
    )
    sid = sim.add_source_sink(ss)
    for _ in range(5):
        sim.step(1.0)
    assert sim.num_agents == 5
    sim.remove_source_sink(sid)
    for _ in range(5):
        sim.step(1.0)
    assert sim.num_agents == 5  # no new spawns
    for _ in range(15):
        sim.step(1.0)
    assert sim.num_agents == 0  # the existing ones still reach the sink


def test_remove_one_of_equal_source_sinks():
    """Two identically-configured SourceSinks are EQUAL as frozen
    dataclasses; removing the second by its registry id must deactivate
    the second stacked-table row, not the first (regression: a value
    search picked the first equal source, leaving the removed one
    spawning forever)."""
    sim = make_sim()
    hl = ConstantVelocity((1.0, 0.0))
    lp = NoLocalPlan()
    gen = MonotonicCrowd(1.0)

    def mk():
        return SourceSink(
            source=(0.0, 0.0), waypoints=[(20.0, 0.0)], radius_sink=1.0,
            crowd_generator=gen, high_level_planner=hl,
            local_planner=lp, agent_eyesight_range=5.0,
        )

    ss_a, ss_b = mk(), mk()
    assert ss_a == ss_b
    sim.add_source_sink(ss_a)
    sid_b = sim.add_source_sink(ss_b)
    sim.remove_source_sink(sid_b)
    assert getattr(sim, "_inactive_sources") == {1}
    # Source A (row 0) still spawns: the clearance rule admits one agent
    # per step while the previous one walks clear of the source.
    for _ in range(4):
        sim.step(1.0)
    assert sim.num_agents > 0


def test_remove_event_listener():
    sim = make_sim()
    listener = MockEventListener()
    lid = sim.add_event_listener(listener)
    hl = ConstantVelocity((0.0, 0.0))
    sim.add_agents([(0.0, 0.0)], hl, NoLocalPlan(), 5.0)
    assert len(listener.added) == 1
    sim.remove_event_listener(lid)
    sim.add_agents([(1.0, 0.0)], hl, NoLocalPlan(), 5.0)
    assert len(listener.added) == 1  # not called after removal


def test_set_priority_integer_guard():
    """config.integer_priorities promises integer priority differences
    (the int_prio kernel specialization); a fractional set_priority
    must raise instead of silently breaking the contract, while integer
    overrides stay allowed."""
    from rmf_crowdsim_tpu import ConstantVelocity, NoLocalPlan

    sim = make_sim(integer_priorities=True)
    ids = sim.add_agents([(0.0, 0.0)], ConstantVelocity((1.0, 0.0)),
                         NoLocalPlan(), agent_eyesight_range=1.0)
    sim.set_priority(ids[0], 5.0)  # integral: fine
    with pytest.raises(ValueError, match="integer_priorities"):
        sim.set_priority(ids[0], 0.5)


def test_set_priority_changes_right_of_way():
    """zanlungo.rs:17: per-agent priority overrides change which agent
    yields.  Symmetric head-on pair: the lower-priority agent slows."""
    from rmf_crowdsim_tpu import Zanlungo

    def run(prio_a, prio_b):
        cfg = SimConfig(capacity=4, neighbor_backend="brute",
                        dtype="float64")
        sim = Simulation(cfg)
        hl = ConstantVelocity((0.0, 0.0))  # parked base velocity
        z = Zanlungo(1.0, 1.0, 0.0, 2.0, 2.0, 0.3)
        ids = sim.add_agents([(0.0, 0.0), (1.0, 0.0)], hl, z, 5.0)
        # give them opposing velocities via state so TTC is finite
        import jax.numpy as jnp

        sim.state = sim.state.replace(
            velocity=jnp.asarray([[1.0, 0.0], [-1.0, 0.0], [0, 0], [0, 0]],
                                 jnp.float64)
        )
        sim.set_priority(ids[0], prio_a)
        sim.set_priority(ids[1], prio_b)
        sim.step(0.01)
        return {k: v.velocity for k, v in sim.agents.items()}

    va = run(0.0, 1.0)
    vb = run(1.0, 0.0)
    # Asymmetric priorities produce asymmetric responses.
    assert va[0] != vb[0] or va[1] != vb[1]


def test_run_matches_stepping():
    """Simulation.run(n, dt) (one lax.scan dispatch) equals n step() calls."""
    def build():
        sim = make_sim()
        sim.add_source_sink(SourceSink(
            source=(0.0, 0.0), waypoints=[(20.0, 0.0)], radius_sink=1.0,
            crowd_generator=MonotonicCrowd(1.0),
            high_level_planner=ConstantVelocity((1.0, 0.0)),
            local_planner=NoLocalPlan(), agent_eyesight_range=5.0))
        return sim

    a = build()
    for _ in range(25):
        a.step(1.0)
    b = build()
    counters = b.run(25, 1.0)
    ga = {k: v.position for k, v in a.agents.items()}
    gb = {k: v.position for k, v in b.agents.items()}
    assert ga.keys() == gb.keys()
    for k in ga:
        assert ga[k] == gb[k]
    import numpy as np
    assert np.asarray(counters.n_alive)[-1] == a.num_agents


def test_out_of_bounds_event_flag():
    """An agent leaving the grid raises the out_of_bounds event flag
    instead of erroring the step (the reference propagates
    Err("Index out of bounds"), location_hash_2d.rs:61-63)."""
    sim = make_sim()
    hl = ConstantVelocity((1000.0, 0.0))  # leaves the 1000m grid in 1 step
    (aid,) = sim.add_agents([(400.0, 0.0)], hl, NoLocalPlan(), 5.0)
    sim.step(1.0)
    import numpy as np

    assert np.asarray(sim.last_events.out_of_bounds).sum() == 1
    # The agent keeps simulating (clamped to edge cells for binning).
    assert sim.num_agents == 1


def test_out_of_bounds_raise_mode():
    """Strict-parity mode: on_out_of_bounds='raise' errors the step like
    the reference (Err("Index out of bounds"), location_hash_2d.rs:61-63
    → lib.rs:299-302), for step() and run() alike."""
    from rmf_crowdsim_tpu import OutOfBoundsError

    hl = ConstantVelocity((1000.0, 0.0))

    sim = make_sim(on_out_of_bounds="raise")
    sim.add_agents([(400.0, 0.0)], hl, NoLocalPlan(), 5.0)
    with pytest.raises(OutOfBoundsError):
        sim.step(1.0)

    sim = make_sim(on_out_of_bounds="raise")
    sim.add_agents([(400.0, 0.0)], hl, NoLocalPlan(), 5.0)
    with pytest.raises(OutOfBoundsError):
        sim.run(3, 1.0)

    # In-bounds motion does not raise.
    sim = make_sim(on_out_of_bounds="raise")
    sim.add_agents([(0.0, 0.0)], ConstantVelocity((1.0, 0.0)),
                   NoLocalPlan(), 5.0)
    sim.step(1.0)
    sim.run(3, 1.0)
    assert sim.num_agents == 1

    with pytest.raises(ValueError):
        make_sim(on_out_of_bounds="explode")


def test_colocated_sources_presnapshot_clearance():
    """Reference semantics (lib.rs:199-234): ALL sources' clearance checks
    run in a first read-only pass against the pre-spawn spatial index, so
    two co-located sources BOTH spawn on the first step; from the second
    step on, the live agents block both."""
    sim = make_sim()
    hl = ConstantVelocity((1.0, 0.0))
    for src in [(0.0, 0.0), (0.2, 0.0)]:  # 0.2 m apart (< 0.4)
        sim.add_source_sink(SourceSink(
            source=src, waypoints=[(50.0, 0.0)], radius_sink=1.0,
            crowd_generator=MonotonicCrowd(1.0), high_level_planner=hl,
            local_planner=NoLocalPlan(), agent_eyesight_range=5.0))
    sim.step(1.0)
    assert sim.num_agents == 2  # both see the empty pre-spawn disc
    assert int(sim.last_events.spawn_dropped) == 0
    sim.step(1.0)  # the two live agents moved 1 m; discs clear again
    assert sim.num_agents == 4
    # Far-apart sources spawn independently.
    sim2 = make_sim()
    for src in [(0.0, 0.0), (10.0, 0.0)]:
        sim2.add_source_sink(SourceSink(
            source=src, waypoints=[(50.0, 0.0)], radius_sink=1.0,
            crowd_generator=MonotonicCrowd(1.0), high_level_planner=hl,
            local_planner=NoLocalPlan(), agent_eyesight_range=5.0))
    sim2.step(1.0)
    assert sim2.num_agents == 2


def _streaming_sim(**cfg_kw):
    """The event_listeners_test.rs scenario wired to a fresh sim."""
    sim = make_sim(**cfg_kw)
    listener = MockEventListener()
    sim.add_event_listener(listener)
    sim.add_source_sink(
        SourceSink(
            source=(0.0, 0.0),
            waypoints=[(20.0, 0.0)],
            radius_sink=1.0,
            crowd_generator=MonotonicCrowd(1.0),
            high_level_planner=ConstantVelocity((1.0, 0.0)),
            local_planner=NoLocalPlan(),
            agent_eyesight_range=5.0,
            loop_forever=False,
        )
    )
    return sim, listener


def test_run_delivers_exact_event_stream():
    """The scanned run() path must deliver the same exact per-step event
    ids/order as the step() loop — the reference's EventListener contract
    (lib.rs:151-153, 189-191) on the fast path (VERDICT round-1 item 7)."""
    sim_a, lis_a = _streaming_sim()
    for _ in range(45):
        sim_a.step(1.0)

    sim_b, lis_b = _streaming_sim()
    counters = sim_b.run(45, 1.0)
    assert np.asarray(counters.n_alive).shape == (45,)

    assert lis_b.added == lis_a.added
    assert lis_b.removed == lis_a.removed
    assert lis_b.waypoints == lis_a.waypoints
    # Steady state reached: ids delivered, not just counts.
    assert len(lis_b.added) == 45
    assert len(lis_b.removed) == 45 - 20
    assert lis_b.removed[:3] == [0, 1, 2]

    # And the two sims agree on the surviving population.
    assert sim_a.agents.keys() == sim_b.agents.keys()


def test_run_event_stream_overflow_raises():
    """A step spawning more events than event_stream_capacity must fail
    loudly — silent partial listener delivery is a contract violation."""
    sim = make_sim(event_stream_capacity=1)
    listener = MockEventListener()
    sim.add_event_listener(listener)
    for y in (0.0, 100.0):  # two sources far apart -> 2 spawns/step
        sim.add_source_sink(
            SourceSink(
                source=(0.0, y),
                waypoints=[(20.0, y)],
                radius_sink=1.0,
                crowd_generator=MonotonicCrowd(1.0),
                high_level_planner=ConstantVelocity((1.0, 0.0)),
                local_planner=NoLocalPlan(),
                agent_eyesight_range=5.0,
            )
        )
    with pytest.raises(RuntimeError, match="event_stream_capacity"):
        sim.run(5, 1.0)
