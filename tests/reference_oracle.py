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


class OracleSim:
    """Sequential reference-semantics simulator (MonotonicCrowd only)."""

    def __init__(self, spawn_clearance: float = 0.4):
        self.agents: Dict[int, OracleAgent] = {}
        self.sources: List[OracleSource] = []
        self.next_id = 0
        self.clearance = spawn_clearance
        self.hl_of: Dict[int, Callable] = {}

    def add_agent(self, pos: Vec, hl: Callable, eyesight: float) -> int:
        aid = self.next_id
        self.next_id += 1
        self.agents[aid] = OracleAgent(aid, pos, eyesight=eyesight)
        self.hl_of[aid] = hl
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
            aid = self.add_agent(ss.source, ss.hl, ss.eyesight)
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
            res = self.hl_of[aid](a, 0.0)
            if res is not None:
                vel = res
            # (local planner: NoLocalPlan — identity)
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
