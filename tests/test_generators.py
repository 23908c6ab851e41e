"""Crowd-generator and rollout tests.

PoissonCrowd is untested in the reference (SURVEY.md §4); here its
statistics and determinism are pinned down, plus the lax.scan rollout's
event counters."""

import jax
import jax.numpy as jnp
import numpy as np

from rmf_crowdsim_tpu import (
    ConstantVelocity,
    GridConfig,
    MonotonicCrowd,
    NoLocalPlan,
    PoissonCrowd,
    SimConfig,
    SimParams,
    Simulation,
    SourceSink,
    make_state,
)
from rmf_crowdsim_tpu.core.step import build_rollout
from rmf_crowdsim_tpu.models.source_sink import stack_source_params


def test_monotonic_rounding():
    """MonotonicCrowd spawns round(rate*dt) per step, rounding half away
    from zero like Rust f64::round (source_sink.rs:96-101)."""
    cfg = SimConfig(capacity=64, neighbor_backend="brute", dtype="float64")
    hl = ConstantVelocity((0.0, 1.0))
    for rate, dt, expect in [(1.0, 1.0, 1), (1.0, 0.25, 0), (2.0, 0.25, 1),
                             (6.0, 0.25, 2), (1.0, 0.5, 1)]:
        sim = Simulation(cfg)
        # distant waypoints so nobody despawns; big world, no clearance hit
        sim.add_source_sink(
            SourceSink(source=(0.0, 0.0), waypoints=[(1e6, 0.0)],
                       radius_sink=1.0, crowd_generator=MonotonicCrowd(rate),
                       high_level_planner=hl, local_planner=NoLocalPlan(),
                       agent_eyesight_range=1.0)
        )
        sim.step(dt)
        # one-spawn cap: at most 1 actually spawns, surplus drops
        want_spawned = min(expect, 1)
        assert sim.num_agents == want_spawned, (rate, dt)
        dropped = int(sim.last_events.spawn_dropped)
        assert dropped == expect - want_spawned, (rate, dt)


def test_poisson_determinism_and_rate():
    """Same seed -> identical spawn sequence; the spawn-request mean over
    many steps approaches rate*dt.  (Requests are observed via
    spawned+dropped, since the one-per-step cap truncates spawns.)"""
    cfg = SimConfig(capacity=2048, neighbor_backend="brute", dtype="float64",
                    spawn_clearance=0.0)  # no clearance gate

    def run(seed):
        sim = Simulation(cfg, seed=seed)
        sim.add_source_sink(
            SourceSink(source=(0.0, 0.0), waypoints=[(1e6, 0.0)],
                       radius_sink=1.0, crowd_generator=PoissonCrowd(3.0),
                       high_level_planner=ConstantVelocity((1.0, 0.0)),
                       local_planner=NoLocalPlan(), agent_eyesight_range=1.0)
        )
        requests = []
        for _ in range(300):
            sim.step(1.0)
            spawned = int(np.sum(np.asarray(sim.last_events.spawned)))
            requests.append(spawned + int(sim.last_events.spawn_dropped))
        return requests

    a = run(7)
    b = run(7)
    c = run(8)
    assert a == b
    assert a != c
    mean = np.mean(a)
    # Poisson(3): SE over 300 steps ~ 0.1; allow 4 sigma.
    assert abs(mean - 3.0) < 0.4, mean


def test_rollout_counters_match_stepwise():
    """A scanned rollout's per-step counters reproduce the host-loop
    behavior of the event_listeners_test.rs scenario."""
    cfg = SimConfig(
        capacity=64,
        grid=GridConfig(1000.0, 1000.0, 20.0, (-500.0, -500.0)),
        neighbor_backend="brute",
        dtype="float64",
    )
    hl = ConstantVelocity((1.0, 0.0))
    lp = NoLocalPlan()
    ss = SourceSink(source=(0.0, 0.0), waypoints=[(20.0, 0.0)],
                    radius_sink=1.0, crowd_generator=MonotonicCrowd(1.0),
                    high_level_planner=hl, local_planner=lp,
                    agent_eyesight_range=5.0)
    sp = stack_source_params([ss], [0], [0], [[-1]], cfg.jdtype)
    params = SimParams(hl=(hl.init_params(),), lp=(lp.init_params(),),
                       sources=sp)
    rollout = jax.jit(build_rollout(cfg, [hl], [lp]), static_argnums=(3,))
    state = make_state(cfg)
    state, counters = rollout(params, state, 1.0, 40)
    n_alive = np.asarray(counters.n_alive)
    # Population grows 1/step to 20, then steady state.
    assert n_alive[:20].tolist() == list(range(1, 21))
    assert all(n == 20 for n in n_alive[20:])
    n_spawned = np.asarray(counters.n_spawned)
    n_destroyed = np.asarray(counters.n_destroyed)
    assert n_spawned.sum() == 40
    assert n_destroyed[:20].sum() == 0
    assert all(d == 1 for d in n_destroyed[20:])
    # waypoint_reached fires exactly when an agent enters the sink disc.
    assert np.asarray(counters.n_waypoint_reached)[20:].tolist() == [1] * 20


class _BurstGenerator:
    """User-defined CrowdGenerator (no built-in kind/rate attributes) —
    mirrors implementing the reference trait (source_sink.rs:30-33):
    spawns on a fixed schedule the built-ins can't express."""

    def __init__(self, schedule):
        self.schedule = list(schedule)
        self.calls = 0

    def get_number_to_spawn(self, dt):
        n = self.schedule[self.calls % len(self.schedule)]
        self.calls += 1
        return n


def test_custom_crowd_generator_plugs_in():
    """Any object with get_number_to_spawn(dt) works as a generator on the
    host step() path (GEN_CUSTOM), exactly like the reference's
    CrowdGenerator trait objects (source_sink.rs:30-33)."""
    cfg = SimConfig(capacity=64, neighbor_backend="brute", dtype="float64",
                    spawn_clearance=0.0)
    gen = _BurstGenerator([1, 0, 3, 0])
    sim = Simulation(cfg)
    sim.add_source_sink(
        SourceSink(source=(0.0, 0.0), waypoints=[(1e6, 0.0)],
                   radius_sink=1.0, crowd_generator=gen,
                   high_level_planner=ConstantVelocity((1.0, 0.0)),
                   local_planner=NoLocalPlan(), agent_eyesight_range=1.0)
    )
    pops, drops = [], []
    for _ in range(4):
        sim.step(1.0)
        pops.append(sim.num_agents)
        drops.append(int(sim.last_events.spawn_dropped))
    # Schedule 1,0,3,0 with the one-spawn-per-source cap (lib.rs:208-218):
    # steps spawn 1,0,1,0 and the surplus 2 of the burst drops.
    assert pops == [1, 1, 2, 2]
    assert drops == [0, 0, 2, 0]
    assert gen.calls == 4

    # run() with a custom generator falls back to per-step stepping but
    # still returns per-step counters.
    counters = sim.run(4, 1.0)
    assert np.asarray(counters.n_alive).tolist() == [3, 3, 4, 4]
    assert gen.calls == 8


def test_bogus_generator_rejected():
    import pytest

    cfg = SimConfig(capacity=8, neighbor_backend="brute", dtype="float64")
    sim = Simulation(cfg)
    sim.add_source_sink(
        SourceSink(source=(0.0, 0.0), waypoints=[(10.0, 0.0)],
                   radius_sink=1.0, crowd_generator=object(),
                   high_level_planner=ConstantVelocity((1.0, 0.0)),
                   local_planner=NoLocalPlan(), agent_eyesight_range=1.0)
    )
    with pytest.raises(TypeError):
        sim.step(1.0)
