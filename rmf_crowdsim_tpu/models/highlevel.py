"""High-level (global routing) planners, fully vectorized.

The reference defines a mutable trait with three methods
(highlevel_planners.rs:8-16): ``get_desired_velocity(agent, time) ->
Option<Vec2f>``, ``set_target(agent, point, tolerance)`` and
``remove_agent_id``.  TPU-natively each planner is a *pure function* over
the whole agent SoA:

    plan(params, state) -> HLResult(vel[N,2], valid[N], route_wp[N])

``valid`` models the reference's ``Option``: where False, the step leaves
the agent's velocity at zero and its preferred velocity untouched
(lib.rs:263-273).  ``route_wp`` carries the waypoint-advance side effect of
route-following planners (the reference mutates ``agent_cache`` inside
``get_desired_velocity``, rmf/mod.rs:198-208); planners without routes
return it unchanged.

``set_target`` becomes data: route-following planners consume per-agent
``route_id``/``route_wp`` state plus a route table in their params; targets
are assigned by writing those arrays (host API or the SourceSink leg table
inside the step).  ``remove_agent_id`` is subsumed by the alive-mask.

Planner objects are static (hashable by identity); their runtime values
live in the params pytree produced by ``init_params``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.state import SimState


@struct.dataclass
class HLResult:
    vel: jax.Array  # [N, 2] desired velocity
    valid: jax.Array  # [N] bool — reference's Option::Some
    route_wp: jax.Array  # [N] int32 — possibly-advanced waypoint cursor


@struct.dataclass
class RouteTable:
    """Padded route storage — the RMF planner's ``route_list: Vec<Vec<Vec2f>>``
    (rmf/mod.rs:88) as device arrays."""

    points: jax.Array  # [R, L, 2]
    lengths: jax.Array  # [R] int32 — valid prefix length per route

    @classmethod
    def empty(cls, max_routes: int, max_len: int, dtype) -> "RouteTable":
        return cls(
            points=jnp.zeros((max_routes, max_len, 2), dtype),
            lengths=jnp.zeros((max_routes,), jnp.int32),
        )


class HighLevelPlanner:
    """Base: planners are selected per agent by ``state.hl_idx``."""

    #: True if this planner consumes state.route_id/route_wp — SourceSink
    #: waypoint advancement then assigns the next route leg (the reference's
    #: set_target call from inside step(), lib.rs:325-334).
    uses_routes: bool = False

    def init_params(self):
        return ()

    def plan(self, params, state: SimState) -> HLResult:  # pragma: no cover
        raise NotImplementedError


class ConstantVelocity(HighLevelPlanner):
    """The reference's test stub: always returns the same velocity
    (StubHighLevelPlan, lib.rs:391-420 and event_listeners_test.rs:6-35)."""

    def __init__(self, vel):
        self._vel = tuple(float(v) for v in vel)

    def init_params(self):
        return {"vel": jnp.asarray(self._vel)}

    def plan(self, params, state: SimState) -> HLResult:
        n = state.capacity
        v = params["vel"].astype(state.position.dtype)
        return HLResult(
            vel=jnp.broadcast_to(v[None, :], (n, 2)),
            valid=jnp.ones((n,), jnp.bool_),
            route_wp=state.route_wp,
        )


class ParityVelocity(HighLevelPlanner):
    """The viz demo's stub: even agent ids move at ``-vel``, odd at ``+vel``
    (rmf_crowdsim_viz/src/main.rs:20-41, the 'threes-a-crowd' scene)."""

    def __init__(self, vel):
        self._vel = tuple(float(v) for v in vel)

    def init_params(self):
        return {"vel": jnp.asarray(self._vel)}

    def plan(self, params, state: SimState) -> HLResult:
        n = state.capacity
        v = params["vel"].astype(state.position.dtype)
        sign = jnp.where((state.uid % 2) == 0, -1.0, 1.0).astype(
            state.position.dtype
        )
        return HLResult(
            vel=sign[:, None] * v[None, :],
            valid=jnp.ones((n,), jnp.bool_),
            route_wp=state.route_wp,
        )


class WaypointFollow(HighLevelPlanner):
    """Chase-and-advance over a padded route table — the device half of the
    RMF planner (rmf/mod.rs:197-215):

    - if the agent is within ``arrival_tolerance`` of its current route
      waypoint and more waypoints remain, advance the cursor (reference
      hard-codes 1e-1, rmf/mod.rs:202);
    - desired velocity is the *unit vector* toward the (possibly advanced)
      waypoint (rmf/mod.rs:209);
    - agents with no route (route_id < 0) get ``valid=False`` — the
      reference returns None and the step leaves velocity at zero
      (rmf/mod.rs:210-214, lib.rs:263-273).

    Route planning itself (visibility graph + A*) happens on the host
    (models/rmf.py) and lands in this planner's ``RouteTable``.
    """

    uses_routes = True

    def __init__(self, routes: RouteTable, arrival_tolerance: float = 1e-1):
        self._routes = routes
        self._tol = float(arrival_tolerance)

    def init_params(self):
        return {"routes": self._routes, "tol": jnp.asarray(self._tol)}

    def plan(self, params, state: SimState) -> HLResult:
        routes: RouteTable = params["routes"]
        tol = params["tol"].astype(state.position.dtype)
        rid = jnp.clip(state.route_id, 0, routes.points.shape[0] - 1)
        has_route = state.route_id >= 0
        length = routes.lengths[rid]
        wp = jnp.clip(state.route_wp, 0, routes.points.shape[1] - 1)
        target = routes.points[rid, wp]  # [N, 2]
        d = jnp.linalg.norm(state.position - target, axis=-1)
        advance = (d < tol) & (wp + 1 < length)
        wp2 = jnp.where(advance, wp + 1, wp)
        target2 = routes.points[rid, wp2]
        to_go = target2 - state.position
        norm = jnp.linalg.norm(to_go, axis=-1, keepdims=True)
        # Reference calls nalgebra normalize(), which yields NaN on a zero
        # vector; we return zero instead (divergence: only reachable when an
        # agent sits exactly on its final waypoint).
        unit = jnp.where(norm > 0, to_go / jnp.where(norm > 0, norm, 1.0), 0.0)
        return HLResult(
            vel=unit.astype(state.position.dtype),
            valid=has_route,
            route_wp=jnp.where(has_route, wp2, state.route_wp),
        )
