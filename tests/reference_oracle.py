"""A scalar, sequential re-implementation of the reference's step loop —
the parity oracle for BASELINE.md's trajectory-match goal.

This mirrors ``Simulation::step`` (lib.rs:195-383) *semantically*, written
from the SURVEY.md analysis: per-agent Python loop in insertion order,
double-buffered position commits, one-spawn-per-source cap with the 0.4 m
clearance disc, waypoint bookkeeping against pre-integration positions,
rogue-agent removal, and removal-after-commit.  Zanlungo forces are
computed from step-start state (the reference's mid-loop spatial-index
updates make dense scenes iteration-order-dependent — SURVEY.md §3.1
quirk 1 — so bitwise comparisons are only made on order-independent
configs, which is also all the reference's own tests exercise).

Float64 throughout, matching the reference's f64.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

Vec = Tuple[float, float]

_INF = float("inf")


class OracleZanlungo:
    """Scalar, sequential transcription of the reference's Zanlungo local
    planner (zanlungo.rs:49-218), f64 throughout.

    At the reference's singular points this adopts the repo's documented
    conventions (models/local.py docstrings), which produce identical
    results wherever the reference's own math is well-defined:

    - ``a == 0`` in the TTC quadratic -> inf (the reference's 0/0 NaNs
      fall through every comparison to the same inf, zanlungo.rs:62-73);
    - ``sin_theta == 0`` in slerp -> keep ``d_ij`` (parallel vectors; the
      reference divides by zero, zanlungo.rs:25-27);
    - zero-norm ``d_ij`` -> zero force (reference normalize() NaNs);
    - ``t_i == 0`` with positive ``weight*speed_diff`` -> the magnitude
      clamp (the reference's inf/0 hits the 1e15 clamp, zanlungo.rs:165).

    ``force_cap`` defaults to the reference's hard-coded 1e15 clamp and is
    configurable to mirror the repo's ZanlungoParams extension.
    """

    def __init__(self, agent_scale: float, obstacle_scale: float,
                 reaction_time: float, force_distance: float,
                 agent_mass: float, agent_radius: float,
                 force_cap: float = 1e15,
                 priorities: Optional[Dict[int, float]] = None):
        self.agent_scale = agent_scale
        self.obstacle_scale = obstacle_scale  # stored, never read (parity)
        self.reaction_time = reaction_time    # stored, never read (parity)
        self.force_distance = force_distance
        self.agent_mass = agent_mass
        self.agent_radius = agent_radius
        self.force_cap = force_cap
        self.priorities = priorities or {}

    # zanlungo.rs:49-74
    def time_to_collision(self, rel_vel: Vec, rel_pos: Vec) -> float:
        a = rel_vel[0] * rel_vel[0] + rel_vel[1] * rel_vel[1]
        b = 2.0 * (rel_vel[0] * rel_pos[0] + rel_vel[1] * rel_pos[1])
        c = (rel_pos[0] * rel_pos[0] + rel_pos[1] * rel_pos[1]
             - self.agent_radius * self.agent_radius)
        disc = b * b - 4.0 * a * c
        if disc < 0.0:
            return _INF
        if a == 0.0:
            return _INF  # reference: NaN roots fall through to inf
        sq = math.sqrt(disc)
        t0 = (-b - sq) / (2.0 * a)
        t1 = (-b + sq) / (2.0 * a)
        if (t0 < 0.0 and t1 > 0.0) or (t1 < 0.0 and t0 > 0.0):
            return 0.0
        if t0 < t1 and t0 > 0.0:
            return t0
        if t1 > 0.0:
            return t1
        return _INF

    def _priority(self, agent_id: int) -> float:
        # agent_priorities.get(id).unwrap_or(id as f64) (zanlungo.rs:94-98)
        return self.priorities.get(agent_id, float(agent_id))

    # zanlungo.rs:173-198
    def _right_of_way_vel(self, me: "OracleAgent", my_pref: Vec,
                          other: "OracleAgent"):
        row = self._priority(me.agent_id) - self._priority(other.agent_id)
        row = max(-1.0, min(1.0, row))
        if row < 0.0:
            r2 = math.sqrt(-row)
            ovel = (other.velocity[0]
                    + r2 * (other.preferred_vel[0] - other.velocity[0]),
                    other.velocity[1]
                    + r2 * (other.preferred_vel[1] - other.velocity[1]))
            return -r2, me.velocity, ovel
        if row > 0.0:
            r2 = math.sqrt(row)
            mvel = (me.velocity[0] + r2 * (my_pref[0] - me.velocity[0]),
                    me.velocity[1] + r2 * (my_pref[1] - me.velocity[1]))
            return r2, mvel, other.velocity
        return 0.0, me.velocity, other.velocity

    # zanlungo.rs:93-170
    def _agent_force(self, me: "OracleAgent", my_pref: Vec,
                     other: "OracleAgent", t_i: float) -> Vec:
        w, my_vel, other_vel = self._right_of_way_vel(me, my_pref, other)
        weight = 1.0 - w
        fut = (me.position[0] + my_vel[0] * t_i,
               me.position[1] + my_vel[1] * t_i)
        ofut = (other.position[0] + other_vel[0] * t_i,
                other.position[1] + other_vel[1] * t_i)
        d_ij = (fut[0] - ofut[0], fut[1] - ofut[1])
        dist = math.sqrt(d_ij[0] * d_ij[0] + d_ij[1] * d_ij[1])  # pre-slerp (:112)

        if weight > 1.0:  # other agent has right of way (:113-151)
            pref_speed = math.sqrt(other.preferred_vel[0] ** 2
                                   + other.preferred_vel[1] ** 2)
            interpolate = True
            perp = (0.0, 0.0)
            if pref_speed < 0.0001:
                rel = (me.position[0] - other.position[0],
                       me.position[1] - other.position[1])
                perp = (-rel[1], rel[0])
                if perp[0] * me.velocity[0] + perp[1] * me.velocity[1] < 0.0:
                    perp = (-perp[0], -perp[1])
            else:
                pd = other.preferred_vel
                if pd[0] * d_ij[0] + pd[1] * d_ij[1] > 0.0:
                    perp = (-pd[1], pd[0])
                    if perp[0] * d_ij[0] + perp[1] * d_ij[1] < 0.0:
                        perp = (-perp[0], -perp[1])
                else:
                    interpolate = False
            if interpolate:
                sin_theta = perp[0] * d_ij[1] - perp[1] * d_ij[0]
                if sin_theta < 0.0:
                    sin_theta = -sin_theta
                if sin_theta > 1.0:
                    sin_theta = 1.0
                if sin_theta > 0.0:  # slerp (zanlungo.rs:23-28)
                    t = weight - 1.0
                    theta = math.asin(sin_theta)
                    s0 = math.sin((1.0 - t) * theta) / sin_theta
                    s1 = math.sin(t * theta) / sin_theta
                    d_ij = (d_ij[0] * s0 + perp[0] * s1,
                            d_ij[1] * s0 + perp[1] * s1)
                # sin_theta == 0: parallel vectors, keep d_ij (repo
                # convention; the reference divides by zero here)

        # The reference's converge early-exit (zanlungo.rs:155) compares
        # dist with the identical recomputed norm — never taken; omitted.

        d_norm = math.sqrt(d_ij[0] * d_ij[0] + d_ij[1] * d_ij[1])
        if d_norm > 0.0:
            unit = (d_ij[0] / d_norm, d_ij[1] / d_norm)
        else:
            unit = (0.0, 0.0)  # repo convention (reference NaNs)

        surface_dist = dist - 2.0 * self.agent_radius
        sd = (my_vel[0] - other_vel[0], my_vel[1] - other_vel[1])
        speed_diff = math.sqrt(sd[0] * sd[0] + sd[1] * sd[1])
        if t_i == 0.0:
            magnitude = _INF if speed_diff * weight > 0.0 else (
                weight * self.agent_scale * speed_diff)
        else:
            magnitude = weight * self.agent_scale * speed_diff / t_i
        magnitude = min(magnitude, self.force_cap)  # zanlungo.rs:165-167
        falloff = math.exp(-surface_dist / self.force_distance)
        scale = magnitude * falloff
        return (unit[0] * scale, unit[1] * scale)

    # zanlungo.rs:201-218
    def get_desired_velocity(self, me: "OracleAgent", my_pref: Vec,
                             neighbours: List["OracleAgent"],
                             recommended: Vec) -> Vec:
        t_i = _INF
        for n in neighbours:
            rel_vel = (n.velocity[0] - me.velocity[0],
                       n.velocity[1] - me.velocity[1])
            rel_pos = (n.position[0] - me.position[0],
                       n.position[1] - me.position[1])
            col = self.time_to_collision(rel_vel, rel_pos)
            if col < t_i:
                t_i = col
        fx = fy = 0.0
        if t_i != _INF:
            for n in neighbours:
                f = self._agent_force(me, my_pref, n, t_i)
                fx += f[0]
                fy += f[1]
        inv_mass = 1.0 / self.agent_mass
        return (recommended[0] + fx * inv_mass,
                recommended[1] + fy * inv_mass)


@dataclass
class OracleAgent:
    agent_id: int
    position: Vec
    velocity: Vec = (0.0, 0.0)
    preferred_vel: Vec = (0.0, 0.0)
    next_waypoint: int = 0
    eyesight: float = 0.0
    source_id: Optional[int] = None


@dataclass
class OracleSource:
    source: Vec
    waypoints: List[Vec]
    radius_sink: float
    rate: float  # monotonic generator only (deterministic)
    eyesight: float
    loop_forever: bool = False
    hl: Optional[Callable] = None  # (agent, t) -> Optional[Vec]
    local: Optional[OracleZanlungo] = None  # None => NoLocalPlan


class OracleSim:
    """Sequential reference-semantics simulator (MonotonicCrowd only)."""

    def __init__(self, spawn_clearance: float = 0.4):
        self.agents: Dict[int, OracleAgent] = {}
        self.sources: List[OracleSource] = []
        self.next_id = 0
        self.clearance = spawn_clearance
        self.hl_of: Dict[int, Callable] = {}
        self.lp_of: Dict[int, Optional[OracleZanlungo]] = {}

    def add_agent(self, pos: Vec, hl: Callable, eyesight: float,
                  local: Optional[OracleZanlungo] = None) -> int:
        aid = self.next_id
        self.next_id += 1
        self.agents[aid] = OracleAgent(aid, pos, eyesight=eyesight)
        self.hl_of[aid] = hl
        self.lp_of[aid] = local
        return aid

    def add_source(self, src: OracleSource) -> None:
        self.sources.append(src)

    def step(self, dt: float) -> None:
        # Phase A: spawn (lib.rs:199-254): at most one agent per source,
        # gated on an empty clearance disc.  ALL clearance checks run in a
        # first read-only pass against the PRE-spawn spatial index (the
        # first collect() at lib.rs:199-222); inserts only happen in the
        # second pass (lib.rs:224-234 → add_agents → lib.rs:146), so one
        # source's same-step spawn never blocks a co-located source.
        to_spawn: List[int] = []
        for sid, ss in enumerate(self.sources):
            n = round(ss.rate * dt)  # MonotonicCrowd (source_sink.rs:96-101)
            if n <= 0:
                continue
            blocked = any(
                math.dist(a.position, ss.source) < self.clearance
                for a in self.agents.values()
            )
            if not blocked:
                to_spawn.append(sid)
        for sid in to_spawn:
            ss = self.sources[sid]
            aid = self.add_agent(ss.source, ss.hl, ss.eyesight, ss.local)
            self.agents[aid].source_id = sid

        # Phase B: per-agent motion (lib.rs:259-347), insertion order.
        updates: Dict[int, OracleAgent] = {}
        to_remove: List[int] = []
        for aid in list(self.agents.keys()):
            a = self.agents[aid]
            vel = (0.0, 0.0)
            # The reference writes preferred_vel on a per-agent CLONE that
            # is never committed (lib.rs:271 vs 354-357): carry the old one.
            pref = a.preferred_vel
            # The clone's preferred_vel IS freshened before the local
            # planner sees it (lib.rs:269-272); its velocity is not.
            my_pref = pref
            res = self.hl_of[aid](a, 0.0)
            if res is not None:
                vel = res
                my_pref = vel
            lp = self.lp_of.get(aid)
            if lp is not None:
                # get_neighbours_in_radius(eyesight, pos), strict <, self
                # filtered out (lib.rs:277-286); neighbor fields read from
                # committed step-start state (SURVEY.md §3.1 quirk 1 —
                # order-independent configs only), in insertion (id) order.
                neighbours = [
                    b for bid, b in self.agents.items()
                    if bid != aid and math.dist(b.position, a.position)
                    < a.eyesight
                ]
                vel = lp.get_desired_velocity(a, my_pref, neighbours, vel)
            new_pos = (a.position[0] + vel[0] * dt,
                       a.position[1] + vel[1] * dt)
            next_wp = a.next_waypoint
            if a.source_id is not None:
                ss = self.sources[a.source_id]
                if next_wp >= len(ss.waypoints):
                    to_remove.append(aid)  # rogue (lib.rs:308-313)
                elif (math.dist(a.position, ss.waypoints[next_wp])
                      < ss.radius_sink):
                    if next_wp == len(ss.waypoints) - 1:
                        if ss.loop_forever:
                            next_wp = 0
                        else:
                            to_remove.append(aid)
                    else:
                        next_wp += 1
            updates[aid] = OracleAgent(aid, new_pos, vel, pref, next_wp,
                                       a.eyesight, a.source_id)

        # Phase C: commit (lib.rs:350-359); Phase D: remove (lib.rs:378-380)
        for aid, u in updates.items():
            self.agents[aid] = u
        for aid in to_remove:
            del self.agents[aid]
            del self.hl_of[aid]
            self.lp_of.pop(aid, None)
