"""Route-planner tests: native C++ vs NumPy-fallback parity, RMF YAML
parsing, route caching, and the full RMFPlanner-in-simulation flow.

The reference ships NO tests for its RMFPlanner (rmf/mod.rs has no test
module — SURVEY.md §4 'untested'); these close that gap.
"""

import math
import textwrap

import numpy as np
import pytest

from rmf_crowdsim_tpu import (
    GridConfig,
    MonotonicCrowd,
    NoLocalPlan,
    SimConfig,
    Simulation,
    SourceSink,
)
from rmf_crowdsim_tpu.models.rmf import RMFPlanner
from rmf_crowdsim_tpu.native import (
    NativeRoutePlanner,
    NumpyRoutePlanner,
    native_available,
)

# A 20x10 room with an internal wall from (10,0) to (10,7): going from the
# left half to the right half requires passing above the wall's top end.
ROOM_VERTS = [
    (0.0, 0.0), (20.0, 0.0), (20.0, 10.0), (0.0, 10.0),  # outer box
    (10.0, 0.0), (10.0, 7.0),  # internal wall
]
ROOM_WALLS = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5)]


def path_length(route):
    return sum(
        math.dist(route[i], route[i + 1]) for i in range(len(route) - 1)
    )


def test_straight_shot_is_two_points():
    p = NumpyRoutePlanner(ROOM_VERTS, ROOM_WALLS, 0.5, 0.3)
    r = p.plan((2.0, 2.0), (8.0, 2.0))
    assert r == [(2.0, 2.0), (8.0, 2.0)]


def test_route_goes_around_wall():
    p = NumpyRoutePlanner(ROOM_VERTS, ROOM_WALLS, 0.5, 0.3)
    r = p.plan((5.0, 2.0), (15.0, 2.0))
    assert r is not None and len(r) > 2
    # Must detour above the wall top at y=7.
    assert max(y for _, y in r) > 7.0
    # No waypoint inside an inflated obstacle.
    for x, y in r[1:-1]:
        assert not p.occupied(x, y), (x, y)


def test_impossible_route_returns_none():
    # A fully closed box around the goal.
    verts = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0)]
    walls = [(0, 1), (1, 2), (2, 3), (3, 0)]
    p = NumpyRoutePlanner(verts, walls, 0.25, 0.2)
    assert p.plan((0.0, 0.0), (5.0, 5.0)) is None


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_matches_fallback():
    """Native and NumPy planners agree on reachability and (near-)optimal
    path cost — different tie-breaks may pick different equal-cost routes,
    so compare lengths, not waypoints."""
    native = NativeRoutePlanner(ROOM_VERTS, ROOM_WALLS, 0.5, 0.3)
    fallback = NumpyRoutePlanner(ROOM_VERTS, ROOM_WALLS, 0.5, 0.3)
    rng = np.random.default_rng(0)
    checked = 0
    for _ in range(25):
        s = tuple(rng.uniform([0.8, 0.8], [19.2, 9.2]))
        g = tuple(rng.uniform([0.8, 0.8], [19.2, 9.2]))
        if fallback.occupied(*s) or fallback.occupied(*g):
            continue
        rn = native.plan(s, g)
        rf = fallback.plan(s, g)
        assert (rn is None) == (rf is None), (s, g)
        if rn is not None:
            ln, lf = path_length(rn), path_length(rf)
            assert ln <= lf * 1.15 + 0.5 and lf <= ln * 1.15 + 0.5, (s, g, ln, lf)
            checked += 1
    assert checked >= 10


def test_rmf_from_yaml():
    yaml_str = textwrap.dedent(
        """
        levels:
          L1:
            vertices:
              - [0.0, 0.0]
              - [20.0, 0.0]
              - [20.0, 10.0]
              - [0.0, 10.0]
              - [10.0, 0.0]
              - [10.0, 7.0]
            walls:
              - [0, 1]
              - [1, 2]
              - [2, 3]
              - [3, 0]
              - [4, 5]
        """
    )
    planner = RMFPlanner.from_yaml(yaml_str, inflation=0.0, scale=0.5,
                                   agent_radius=0.3)
    rid = planner.plan_route_cached((5.0, 2.0), (15.0, 2.0))
    assert rid is not None
    route = planner.route(rid)
    assert max(y for _, y in route) > 7.0


def test_route_cache_hits():
    """Same cell-rounded endpoints reuse the cached route
    (rmf/mod.rs:217-236)."""
    planner = RMFPlanner(ROOM_VERTS, ROOM_WALLS, scale=0.5, radius=0.3)
    a = planner.plan_route_cached((5.0, 2.0), (15.0, 2.0))
    b = planner.plan_route_cached((5.1, 2.1), (15.1, 2.1))  # same cells
    assert a == b
    assert planner.n_routes == 1
    c = planner.plan_route_cached((2.0, 8.0), (15.0, 2.0))
    assert c != a
    assert planner.n_routes == 2


def test_rmf_planner_drives_simulation():
    """End-to-end: SourceSink spawns agents that follow a planned
    multi-waypoint route around the wall to the sink (BASELINE.md config 4
    in miniature)."""
    planner = RMFPlanner(ROOM_VERTS, ROOM_WALLS, scale=0.5, radius=0.3,
                         arrival_tolerance=0.3, dtype="float64")
    cfg = SimConfig(
        capacity=16,
        grid=GridConfig(width=30.0, height=20.0, cell_size=2.0,
                        offset=(-5.0, -5.0)),
        neighbor_backend="brute",
        max_eyesight=5.0,
        dtype="float64",
    )
    sim = Simulation(cfg)
    sim.add_source_sink(
        SourceSink(
            source=(5.0, 2.0),
            waypoints=[(15.0, 2.0)],
            radius_sink=0.5,
            # rate 4/s at dt 0.25 -> one spawn attempt per step
            # (MonotonicCrowd rounds rate*dt, source_sink.rs:96-101).
            crowd_generator=MonotonicCrowd(4.0),
            high_level_planner=planner,
            local_planner=NoLocalPlan(),
            agent_eyesight_range=5.0,
        )
    )
    # Unit-speed route following: route length ~16-18 m; give it time.
    reached_sink = 0
    for _ in range(120):
        sim.step(0.25)
        reached_sink += int(np.sum(np.asarray(sim.last_events.destroyed)))
    assert reached_sink >= 1
    # Agents en route really detoured: someone must be above the wall top.
    assert planner.n_routes == 1


def test_set_target_api():
    """Simulation.set_target routes an individual agent via its planner
    (the user-facing half of HighLevelPlanner::set_target)."""
    planner = RMFPlanner(ROOM_VERTS, ROOM_WALLS, scale=0.5, radius=0.3,
                         arrival_tolerance=0.3, dtype="float64")
    cfg = SimConfig(capacity=4, neighbor_backend="brute", dtype="float64")
    sim = Simulation(cfg)
    (aid,) = sim.add_agents([(5.0, 2.0)], planner, NoLocalPlan(), 5.0)
    sim.set_target(aid, (15.0, 2.0))
    for _ in range(40):
        sim.step(0.5)
    pos = sim.agents[aid].position
    assert math.dist(pos, (15.0, 2.0)) < 1.0


def test_empty_world_is_all_free():
    """No walls: every route is a straight shot."""
    p = NumpyRoutePlanner([], [], 0.5, 0.3)
    assert p.plan((0.0, 0.0), (10.0, 10.0)) == [(0.0, 0.0), (10.0, 10.0)]


def test_out_of_range_wall_indices_ignored():
    """Wall entries referencing nonexistent vertices are skipped (the
    reference would panic on vertices[v1], rmf/mod.rs:107-108)."""
    p = NumpyRoutePlanner([(0.0, 0.0), (4.0, 0.0)], [(0, 9)], 0.5, 0.2)
    assert p.plan((1.0, 1.0), (3.0, 1.0)) == [(1.0, 1.0), (3.0, 1.0)]


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_route_buffer_overflow_raises():
    """A max_waypoints too small for the route raises instead of
    truncating silently."""
    planner = NativeRoutePlanner(ROOM_VERTS, ROOM_WALLS, 0.5, 0.3,
                                 max_waypoints=2)
    with pytest.raises(RuntimeError):
        planner.plan((5.0, 2.0), (15.0, 2.0))  # needs > 2 waypoints


@pytest.mark.parametrize("cls", [NumpyRoutePlanner] + (
    [NativeRoutePlanner] if native_available() else []))
def test_far_outside_straight_shot_is_two_points(cls):
    """A free straight segment whose endpoints lie far OUTSIDE the
    raster must plan as the direct 2-point route — regression for the
    line-of-sight iteration cap, which was grid-size-bounded and
    spuriously failed long out-of-grid segments (out-of-grid cells are
    traversable, matching the reference's unbounded SparseGrid,
    rmf/mod.rs:107-123)."""
    p = cls(ROOM_VERTS, ROOM_WALLS, 0.5, 0.3)
    # Far above the 20x10 room: nothing blocks the line.
    route = p.plan((-200.0, 300.0), (400.0, 305.0))
    assert route is not None
    assert len(route) == 2


def test_no_route_result_is_cached():
    """plan_route_cached caches FAILURES too: a second query for the
    same unreachable (start, goal) pair must not re-run A*."""
    verts = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0),
             (0.0, 2.0), (4.0, 2.0)]
    walls = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5)]
    planner = RMFPlanner(verts, walls, scale=0.25, radius=0.2)
    assert planner.plan_route_cached((1.0, 1.0), (1.0, 3.5)) is None
    calls = []
    orig = planner._backend.plan
    planner._backend.plan = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    assert planner.plan_route_cached((1.0, 1.0), (1.0, 3.5)) is None
    assert calls == []
