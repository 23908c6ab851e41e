"""Planner mixing and WaypointFollow behavior tests."""

import numpy as np

from rmf_crowdsim_tpu import (
    ConstantVelocity,
    NoLocalPlan,
    ParityVelocity,
    RouteTable,
    SimConfig,
    Simulation,
    WaypointFollow,
)
import jax.numpy as jnp


def test_agents_select_their_planner():
    """Two HL planner groups coexist; each agent follows its own
    (replacing the reference's per-agent Arc<dyn Planner> maps,
    lib.rs:77-79, 130-132)."""
    cfg = SimConfig(capacity=8, neighbor_backend="brute", dtype="float64")
    sim = Simulation(cfg)
    lp = NoLocalPlan()
    a = sim.add_agents([(0.0, 0.0)], ConstantVelocity((1.0, 0.0)), lp, 5.0)[0]
    b = sim.add_agents([(0.0, 0.0)], ConstantVelocity((0.0, -2.0)), lp, 5.0)[0]
    sim.step(1.0)
    assert np.allclose(sim.agents[a].position, (1.0, 0.0))
    assert np.allclose(sim.agents[b].position, (0.0, -2.0))


def test_waypoint_follow_chases_and_advances():
    """WaypointFollow: unit vector toward the current waypoint, advancing
    within the arrival tolerance (rmf/mod.rs:197-215)."""
    routes = RouteTable(
        points=jnp.asarray(
            [[[0.0, 0.0], [3.0, 0.0], [3.0, 4.0], [0.0, 0.0]]], jnp.float64
        ),
        lengths=jnp.asarray([3], jnp.int32),
    )
    wf = WaypointFollow(routes, arrival_tolerance=0.15)
    cfg = SimConfig(capacity=4, neighbor_backend="brute", dtype="float64")
    sim = Simulation(cfg)
    (aid,) = sim.add_agents([(0.0, 0.0)], wf, NoLocalPlan(), 5.0)
    # Assign the route manually (no SourceSink here).
    slot = sim._slot_of(aid)
    sim.state = sim.state.replace(
        route_id=sim.state.route_id.at[slot].set(0),
        route_wp=sim.state.route_wp.at[slot].set(0),
    )
    # Unit speed: reach (3,0) in ~3s, then (3,4) in ~4s more.
    for _ in range(32):
        sim.step(0.25)
    pos = np.asarray(sim.agents[aid].position)
    assert np.linalg.norm(pos - np.array([3.0, 4.0])) < 0.3
    # Cursor sits at the final waypoint; velocity keeps pointing at it
    # (the reference never stops, lib.rs leaves that to SourceSink sinks).
    assert sim.agents[aid].next_waypoint == 0  # SourceSink-only field


def test_waypoint_follow_without_route_is_invalid():
    """route_id -1 -> planner returns None -> velocity stays zero
    (rmf/mod.rs:210-214, lib.rs:263-273)."""
    routes = RouteTable.empty(2, 4, jnp.float64)
    wf = WaypointFollow(routes)
    cfg = SimConfig(capacity=4, neighbor_backend="brute", dtype="float64")
    sim = Simulation(cfg)
    (aid,) = sim.add_agents([(5.0, 5.0)], wf, NoLocalPlan(), 5.0)
    for _ in range(5):
        sim.step(1.0)
    assert np.allclose(sim.agents[aid].position, (5.0, 5.0))


def test_mixed_local_planners():
    """NoLocalPlan and Zanlungo agents coexist in one scene."""
    from rmf_crowdsim_tpu import Zanlungo

    cfg = SimConfig(capacity=8, neighbor_backend="brute", dtype="float64")
    sim = Simulation(cfg)
    hl = ParityVelocity((1.0, 0.0))
    z = Zanlungo(1.0, 1.0, 0.0, 2.0, 2.0, 0.3)
    # Two head-on Zanlungo agents (even uid moves -x, odd +x: put the
    # even one on the right) and one NoLocalPlan bystander nearby.
    za = sim.add_agents([(4.0, 0.1), (0.0, 0.0)], hl, z, 5.0)
    nb = sim.add_agents([(2.0, 3.0)], hl, NoLocalPlan(), 5.0)[0]
    for _ in range(20):
        sim.step(0.1)
    # The bystander moved exactly in a straight line (no forces).
    p = np.asarray(sim.agents[nb].position)
    assert abs(p[1] - 3.0) < 1e-9
    # The Zanlungo pair deflected off their initial y.
    y0 = abs(sim.agents[za[0]].position[1] - 0.1)
    y1 = abs(sim.agents[za[1]].position[1])
    assert y0 > 1e-6 or y1 > 1e-6
