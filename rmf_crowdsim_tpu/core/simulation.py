"""Host-side simulation session: the public API mirroring the reference's
``Simulation<T: SpatialIndex>`` (lib.rs:69-192).

The host object owns planner/source/listener registries and the device
``SimState``; each ``step(dt)`` invokes the compiled step function
(core/step.py) and — only when listeners are registered — pulls the event
masks back to dispatch ``EventListener`` callbacks, the reference's
observability surface (lib.rs:22-33, readme.md:27-28).

Method correspondence:

====================================  ==================================
reference (lib.rs)                     here
====================================  ==================================
``Simulation::new``        :103       ``Simulation(config)``
``add_agents``             :119       ``add_agents``
``add_source_sink``        :159       ``add_source_sink``
``remove_source_sink``     :164       ``remove_source_sink``
``add_event_listener``     :171       ``add_event_listener``
``remove_agents``          :176       ``remove_agents``
``step``                   :195       ``step``
``agents`` (public map)    :71        ``agents`` property / ``num_agents``
====================================  ==================================
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.source_sink import SourceSink, stack_source_params
from ..utils.registry import Registry
from .config import SimConfig
from .state import SimState, make_state
from .step import SimParams, build_step


class NeighborTruncationError(RuntimeError):
    """A step silently truncated neighbor interactions: some grid cell /
    supertile held more agents than the configured per-cell capacity
    (``max_per_cell`` / ``bucket_capacity``).  The reference's cells are
    unbounded (location_hash_2d.rs:15), so truncation is a physics
    divergence.  Raise-by-default; set ``SimConfig.on_truncation="ignore"``
    to audit manually via ``events.neighbor_truncated``."""


class OutOfBoundsError(RuntimeError):
    """An alive agent integrated outside the configured grid while
    ``SimConfig.on_out_of_bounds == "raise"`` — the strict-parity mode
    mirroring the reference, which errors the whole step when the spatial
    index rejects the new position (location_hash_2d.rs:61-63 →
    lib.rs:299-302).  The default ("ignore") surfaces the same condition
    as the ``events.out_of_bounds`` mask instead."""


class EventListener:
    """Observer API (lib.rs:22-33).  Subclass and override; all hooks are
    optional (the reference gives ``waypoint_reached`` a default no-op)."""

    def agent_spawned(self, position, agent_id: int) -> None:
        pass

    def agent_destroyed(self, agent_id: int) -> None:
        pass

    def waypoint_reached(self, position, agent_id: int) -> None:
        pass


@dataclasses.dataclass
class AgentView:
    """Host-side snapshot of one agent — the reference ``Agent`` struct
    (lib.rs:47-65) minus the dead ``orientation``/``angular_vel`` fields."""

    agent_id: int
    position: Tuple[float, float]
    velocity: Tuple[float, float]
    preferred_vel: Tuple[float, float]
    next_waypoint: int
    eyesight_range: float


class Simulation:
    def __init__(self, config: SimConfig, seed: int = 0, neighbor_fn=None):
        """``neighbor_fn``: required iff ``config.neighbor_backend ==
        "custom"`` — a pure jittable ``(state) -> NeighborSet`` (the
        SpatialIndex-trait extension point, spatial_index.rs:4-14; see
        core/step.build_step)."""
        self.config = config
        self.neighbor_fn = neighbor_fn
        if config.neighbor_backend == "custom" and neighbor_fn is None:
            raise ValueError(
                "neighbor_backend='custom' requires a neighbor_fn"
            )
        self.state: SimState = make_state(config, seed)
        self._hl_planners: List[object] = []
        self._lp_planners: List[object] = []
        self._sources: List[SourceSink] = []
        self._source_registry: Registry[SourceSink] = Registry()
        self._event_listeners: Registry[EventListener] = Registry()
        self._params: Optional[SimParams] = None
        self._step_fn = None
        self._rollout_fn = None
        self._event_rollout_fn = None
        self._dirty = True
        # Monotonic version bumped whenever a planner registry grows; the
        # compiled-step reuse key (object ids would alias after GC).
        self._registry_version = 0

    # -- planner registry ---------------------------------------------------

    def _planner_index(self, registry: List[object], planner: object) -> int:
        for i, p in enumerate(registry):
            if p is planner:
                return i
        registry.append(planner)
        self._dirty = True
        self._registry_version += 1
        return len(registry) - 1

    # -- public API ----------------------------------------------------------

    def add_agents(
        self,
        spawn_positions: Sequence[Tuple[float, float]],
        high_level_planner,
        local_planner,
        agent_eyesight_range: float,
    ) -> List[int]:
        """Spawn a group of agents sharing the same planners (lib.rs:119-156).
        Returns their (monotonic, never reused) agent ids.  Fires
        ``agent_spawned`` synchronously per agent, as the reference does
        (lib.rs:151-153)."""
        hl = self._planner_index(self._hl_planners, high_level_planner)
        lp = self._planner_index(self._lp_planners, local_planner)
        st = self.state
        f = self.config.jdtype
        alive = np.asarray(st.alive)
        free = np.flatnonzero(~alive)
        if len(free) < len(spawn_positions):
            raise ValueError(
                f"capacity exceeded: {len(spawn_positions)} spawns, "
                f"{len(free)} free slots of {self.config.capacity}"
            )
        slots = jnp.asarray(free[: len(spawn_positions)], jnp.int32)
        pos = jnp.asarray(spawn_positions, f)
        next_uid = int(st.next_uid)
        uids = jnp.arange(next_uid, next_uid + len(slots), dtype=jnp.int32)
        n_new = len(slots)
        zero2 = jnp.zeros((n_new, 2), f)
        self.state = st.replace(
            position=st.position.at[slots].set(pos),
            velocity=st.velocity.at[slots].set(zero2),
            preferred_vel=st.preferred_vel.at[slots].set(zero2),
            next_waypoint=st.next_waypoint.at[slots].set(jnp.int32(0)),
            eyesight=st.eyesight.at[slots].set(jnp.asarray(agent_eyesight_range, f)),
            alive=st.alive.at[slots].set(True),
            uid=st.uid.at[slots].set(uids),
            source_id=st.source_id.at[slots].set(jnp.int32(-1)),
            hl_idx=st.hl_idx.at[slots].set(jnp.int32(hl)),
            lp_idx=st.lp_idx.at[slots].set(jnp.int32(lp)),
            route_id=st.route_id.at[slots].set(jnp.int32(-1)),
            route_wp=st.route_wp.at[slots].set(jnp.int32(0)),
            priority=st.priority.at[slots].set(uids.astype(f)),
            next_uid=jnp.asarray(next_uid + n_new, jnp.int32),
        )
        uid_list = [int(u) for u in np.asarray(uids)]
        for p, u in zip(spawn_positions, uid_list):
            for listener in self._event_listeners.values():
                listener.agent_spawned(tuple(p), u)
        return uid_list

    def add_source_sink(self, source_sink: SourceSink) -> int:
        """Register a SourceSink (lib.rs:159-161); its planners join the
        planner registries."""
        self._planner_index(self._hl_planners, source_sink.high_level_planner)
        self._planner_index(self._lp_planners, source_sink.local_planner)
        self._sources.append(source_sink)
        self._dirty = True
        sid = self._source_registry.add_new_item(source_sink)
        # Registry id -> stacked-table row, recorded at add time: two
        # identically-configured SourceSinks are equal as frozen
        # dataclasses, so a value search (list.index) would deactivate
        # the wrong one.
        self._source_slot = getattr(self, "_source_slot", {})
        self._source_slot[sid] = len(self._sources) - 1
        return sid

    def remove_source_sink(self, source_id: int) -> None:
        """Deactivate a SourceSink (lib.rs:164-168 — like the reference,
        already-spawned agents are NOT removed; reference TODO at
        lib.rs:165-166).  The slot stays in the stacked table (inactive) so
        existing agents keep their waypoint bookkeeping."""
        ss = self._source_registry.registry.get(source_id)
        self._source_registry.remove(source_id)
        if ss is None:
            return
        idx = getattr(self, "_source_slot", {}).pop(source_id, None)
        if idx is None:
            return
        self._inactive_sources = getattr(self, "_inactive_sources", set())
        self._inactive_sources.add(idx)
        if self._params is not None and self._params.sources is not None:
            sp = self._params.sources
            self._params = SimParams(
                hl=self._params.hl,
                lp=self._params.lp,
                sources=sp.replace(active=sp.active.at[idx].set(False)),
            )

    def add_event_listener(self, listener: EventListener) -> int:
        return self._event_listeners.add_new_item(listener)

    def remove_event_listener(self, listener_id: int) -> None:
        self._event_listeners.remove(listener_id)

    def remove_agents(self, agent_id: int) -> None:
        """Despawn one agent by id (lib.rs:176-192); fires
        ``agent_destroyed``.  Unlike the reference — which panics on an
        unknown id via direct map indexing (lib.rs:177-184) — unknown ids
        raise KeyError."""
        slot = self._slot_of(agent_id)
        self.state = self.state.replace(
            alive=self.state.alive.at[slot].set(False)
        )
        for listener in self._event_listeners.values():
            listener.agent_destroyed(agent_id)

    def set_priority(self, agent_id: int, priority: float) -> None:
        """Override an agent's Zanlungo right-of-way priority — the
        reference's ``agent_priorities`` map (zanlungo.rs:17, defaulting to
        the agent id).

        With ``config.integer_priorities`` the force kernel is
        specialized to integer priority DIFFERENCES (the default uid
        priorities qualify); a fractional override would silently break
        that contract, so it raises here — set the flag False for
        fractional priority schemes."""
        if getattr(self.config, "integer_priorities", False):
            p = float(priority)
            # math.isfinite first: float(int(inf)) raises OverflowError
            # and int(nan) ValueError with the wrong message — non-finite
            # input must get this contract error, not a conversion error.
            if not (math.isfinite(p) and p == int(p)):
                raise ValueError(
                    f"priority {priority!r} is not a finite integer but "
                    "config.integer_priorities promises integer priority "
                    "differences (the int_prio kernel specialization); "
                    "set integer_priorities=False for fractional "
                    "priorities"
                )
        slot = self._slot_of(agent_id)
        self.state = self.state.replace(
            priority=self.state.priority.at[slot].set(priority)
        )

    def set_target(self, agent_id: int, point: Tuple[float, float],
                   tolerance: Tuple[float, float] = (0.0, 0.0)) -> None:
        """Route an agent toward ``point`` via its high-level planner — the
        user-facing half of ``HighLevelPlanner::set_target``
        (highlevel_planners.rs:12).  Only meaningful for route-following
        planners; the planner plans (or cache-hits) on the host and the
        agent's route_id/route_wp arrays are updated.  Tolerance is accepted
        for API parity; the reference's RMFPlanner ignores it
        (rmf/mod.rs:217-236)."""
        slot = self._slot_of(agent_id)
        hl_idx = int(np.asarray(self.state.hl_idx)[slot])
        planner = self._hl_planners[hl_idx]
        if not getattr(planner, "uses_routes", False):
            return  # stub planners' set_target is a no-op (lib.rs:413-415)
        pos = tuple(np.asarray(self.state.position)[slot])
        route_id = planner.plan_route_cached(pos, tuple(point))
        self._dirty = True  # route table may have grown
        if route_id is None:
            # Reference prints and leaves the agent planless
            # (rmf/mod.rs:233-235).
            return
        self.state = self.state.replace(
            route_id=self.state.route_id.at[slot].set(route_id),
            route_wp=self.state.route_wp.at[slot].set(0),
        )

    # -- stepping -------------------------------------------------------------

    def _rebuild(self) -> None:
        """Refresh the params pytree; re-jit the step only when the
        planner registries changed (param-value changes — new routes,
        new sources — reuse the compiled step, which matters when the
        Pallas backend's compiles take minutes)."""
        hl_params = tuple(p.init_params() for p in self._hl_planners)
        lp_params = tuple(p.init_params() for p in self._lp_planners)
        sources = None
        if self._sources:
            hl_idx = [
                self._planner_index(self._hl_planners, s.high_level_planner)
                for s in self._sources
            ]
            lp_idx = [
                self._planner_index(self._lp_planners, s.local_planner)
                for s in self._sources
            ]
            leg_routes = []
            for s in self._sources:
                planner = s.high_level_planner
                if getattr(planner, "uses_routes", False):
                    leg_routes.append(planner.plan_source_legs(s))
                else:
                    leg_routes.append([-1] * len(s.waypoints))
            # plan_source_legs may have grown route tables: refresh params
            hl_params = tuple(p.init_params() for p in self._hl_planners)
            sources = stack_source_params(
                self._sources, hl_idx, lp_idx, leg_routes, self.config.jdtype
            )
            inactive = getattr(self, "_inactive_sources", set())
            if inactive:
                act = sources.active
                for i in inactive:
                    act = act.at[i].set(False)
                sources = sources.replace(active=act)
        self._params = SimParams(hl=hl_params, lp=lp_params, sources=sources)
        registry_key = self._registry_version
        if self._step_fn is None or registry_key != getattr(
            self, "_step_key", None
        ):
            self._step_fn = jax.jit(
                build_step(self.config, self._hl_planners, self._lp_planners,
                           neighbor_fn=self.neighbor_fn),
                donate_argnums=(1,),
            )
            self._step_key = registry_key
        self._dirty = False

    def _has_custom_generators(self) -> bool:
        from ..models.source_sink import GEN_CUSTOM, GEN_MONOTONIC, GEN_POISSON

        return any(
            getattr(s.crowd_generator, "kind", GEN_CUSTOM)
            not in (GEN_MONOTONIC, GEN_POISSON)
            for s in self._sources
        )

    def _refresh_custom_counts(self, dt: float) -> None:
        """Call each GEN_CUSTOM generator's ``get_number_to_spawn(dt)``
        (the reference trait, source_sink.rs:30-33) and store the counts in
        the stacked params for the device spawn phase."""
        from ..models.source_sink import GEN_CUSTOM, GEN_MONOTONIC, GEN_POISSON

        sp = self._params.sources
        counts = np.zeros((len(self._sources),), np.int32)
        any_custom = False
        for i, s in enumerate(self._sources):
            g = s.crowd_generator
            if getattr(g, "kind", GEN_CUSTOM) in (GEN_MONOTONIC, GEN_POISSON):
                continue
            any_custom = True
            counts[i] = int(g.get_number_to_spawn(dt))
        if any_custom:
            self._params = SimParams(
                hl=self._params.hl,
                lp=self._params.lp,
                sources=sp.replace(custom_count=jnp.asarray(counts)),
            )

    def step(self, dt: float) -> None:
        """Run one simulation step of ``dt`` seconds (lib.rs:195-383)."""
        if self._dirty or self._step_fn is None:
            self._rebuild()
        if self._params.sources is not None:
            self._refresh_custom_counts(dt)
        # Snapshot uids before the step: destroyed events must report the
        # uid that died, and listeners read them after the state update.
        want_events = len(self._event_listeners) > 0
        self.state, events = self._step_fn(self._params, self.state, dt)
        if want_events:
            self._dispatch_events(events)
        self.last_events = events
        if self.config.on_truncation == "raise":
            truncated = int(events.neighbor_truncated)
            if truncated > 0:
                raise NeighborTruncationError(
                    f"{truncated} agents lost neighbor interactions this "
                    f"step (occupancy {int(events.max_cell_occupancy)} > "
                    f"{self.config.neighbor_capacity_limit} per "
                    f"cell/tile); raise max_per_cell/bucket_capacity or "
                    f"set on_truncation='ignore'"
                )
        if self.config.on_out_of_bounds == "raise":
            n_oob = int(jnp.sum(events.out_of_bounds.astype(jnp.int32)))
            if n_oob > 0:
                raise OutOfBoundsError(
                    f"{n_oob} alive agents left the grid this step "
                    f"(strict-parity mode: the reference errors the whole "
                    f"step, lib.rs:299-302); enlarge the grid or set "
                    f"on_out_of_bounds='ignore'"
                )

    def run(self, n_steps: int, dt: float):
        """Run ``n_steps`` steps in ONE device dispatch (lax.scan) —
        equivalent to calling :meth:`step` ``n_steps`` times.

        With EventListeners registered, the scan additionally records a
        compacted per-step event stream (exact uids and positions, up to
        ``config.event_stream_capacity`` per kind per step) which is
        replayed through the listeners on the host afterwards — the fast
        path honors the reference's exact callback contract
        (lib.rs:151-153, 189-191).  Returns the per-step
        :class:`RolloutCounters` either way."""
        if self._dirty or self._step_fn is None:
            self._rebuild()
        if self._has_custom_generators():
            # Custom generators are host callbacks; a lax.scan cannot call
            # back into Python mid-rollout, so fall back to per-step
            # stepping (documented restriction — built-in Poisson/Monotonic
            # generators keep the fast scanned path).
            from .step import RolloutCounters

            rows = []
            for _ in range(int(n_steps)):
                self.step(dt)
                ev = self.last_events
                rows.append((
                    int(self.state.num_alive),
                    int(jnp.sum(ev.spawned.astype(jnp.int32))),
                    int(jnp.sum(ev.destroyed.astype(jnp.int32))),
                    int(jnp.sum(ev.waypoint_reached.astype(jnp.int32))),
                    int(ev.spawn_dropped),
                    int(jnp.sum(ev.out_of_bounds.astype(jnp.int32))),
                    int(ev.max_cell_occupancy),
                    int(ev.neighbor_truncated),
                ))
            # zip(*rows) yields nothing for n_steps=0 — build the empty
            # [0]-shaped counters explicitly (the scanned path returns
            # the same shape).
            cols = ([jnp.asarray(c, jnp.int32) for c in zip(*rows)]
                    if rows else [jnp.zeros((0,), jnp.int32)] * 8)
            return RolloutCounters(*cols)
        want_events = len(self._event_listeners) > 0
        cache = "_event_rollout_fn" if want_events else "_rollout_fn"
        key_attr = "_event_rollout_key" if want_events else "_rollout_key"
        if getattr(self, cache, None) is None or getattr(
            self, key_attr, None
        ) != self._step_key:
            from .step import build_rollout

            setattr(self, cache, jax.jit(
                build_rollout(
                    self.config, self._hl_planners, self._lp_planners,
                    event_capacity=(
                        self.config.event_stream_capacity
                        if want_events else 0
                    ),
                    neighbor_fn=self.neighbor_fn,
                ),
                static_argnums=(3,), donate_argnums=(1,),
            ))
            setattr(self, key_attr, self._step_key)
        self.state, ys = getattr(self, cache)(
            self._params, self.state, dt, int(n_steps)
        )
        if want_events:
            self._replay_event_stream(ys)
            counters = ys.counters
        else:
            counters = ys
        if self.config.on_truncation == "raise":
            total = int(jnp.sum(counters.neighbor_truncated))
            if total > 0:
                raise NeighborTruncationError(
                    f"{total} agent-steps lost neighbor interactions "
                    f"during the rollout (peak occupancy "
                    f"{int(jnp.max(counters.max_cell_occupancy))} > "
                    f"{self.config.neighbor_capacity_limit} per cell/tile)"
                )
        if self.config.on_out_of_bounds == "raise":
            total_oob = int(jnp.sum(counters.out_of_bounds))
            if total_oob > 0:
                raise OutOfBoundsError(
                    f"{total_oob} agent-steps left the grid during the "
                    f"rollout (strict-parity mode, lib.rs:299-302); "
                    f"enlarge the grid or set on_out_of_bounds='ignore'"
                )
        return counters

    def _replay_event_stream(self, stream) -> None:
        """Replay a scanned rollout's :class:`EventStream` through the
        registered listeners, in step order, with the reference's
        within-step ordering (spawns, waypoint hits, destroys)."""
        data = jax.device_get(
            (
                stream.spawned_uid,
                stream.spawned_pos,
                stream.reached_uid,
                stream.reached_pos,
                stream.destroyed_uid,
                stream.overflow,
            )
        )
        s_uid, s_pos, r_uid, r_pos, d_uid, overflow = data
        total_over = int(np.sum(overflow))
        if total_over > 0:
            raise RuntimeError(
                f"{total_over} events exceeded "
                f"event_stream_capacity={self.config.event_stream_capacity} "
                f"during run(); listener delivery would be incomplete — "
                f"raise the capacity or step() instead"
            )
        listeners = list(self._event_listeners.values())
        for t in range(s_uid.shape[0]):
            for j in np.flatnonzero(s_uid[t] >= 0):
                for listener in listeners:
                    listener.agent_spawned(
                        tuple(s_pos[t, j]), int(s_uid[t, j])
                    )
            for j in np.flatnonzero(r_uid[t] >= 0):
                for listener in listeners:
                    listener.waypoint_reached(
                        tuple(r_pos[t, j]), int(r_uid[t, j])
                    )
            for j in np.flatnonzero(d_uid[t] >= 0):
                for listener in listeners:
                    listener.agent_destroyed(int(d_uid[t, j]))

    def _dispatch_events(self, events) -> None:
        spawned, destroyed, reached, spawn_pos, destroyed_uid, wp_pos, uid = (
            jax.device_get(
                (
                    events.spawned,
                    events.destroyed,
                    events.waypoint_reached,
                    events.spawn_position,
                    events.destroyed_uid,
                    events.waypoint_position,
                    self.state.uid,
                )
            )
        )
        # Reference ordering within a step: spawns fire during Phase A
        # (lib.rs:151-153), waypoint hits during Phase B (lib.rs:317, dead
        # hook fixed here), destroys during Phase D (lib.rs:189-191).
        for slot in np.flatnonzero(spawned):
            for listener in self._event_listeners.values():
                listener.agent_spawned(tuple(spawn_pos[slot]), int(uid[slot]))
        for slot in np.flatnonzero(reached):
            for listener in self._event_listeners.values():
                listener.waypoint_reached(tuple(wp_pos[slot]), int(uid[slot]))
        for slot in np.flatnonzero(destroyed):
            for listener in self._event_listeners.values():
                listener.agent_destroyed(int(destroyed_uid[slot]))

    # -- spatial queries (the reference's public SpatialIndex surface,
    #    spatial_index.rs:4-14) -----------------------------------------------

    def _knn_binning(self):
        """Grid binning of the current state, cached until the state
        changes (every mutation replaces ``self.state``, so object
        identity is the cache key) — repeated queries within a step share
        one binning, like the reference's incrementally-maintained hash
        (location_hash_2d.rs:126-149)."""
        from ..ops.grid import bin_agents

        cached = getattr(self, "_knn_cache", None)
        if cached is not None and cached[0] is self.state:
            return cached[1]
        b = bin_agents(self.config.grid, self.state.position,
                       self.state.alive)
        self._knn_cache = (self.state, b)
        return b

    def get_neighbours_in_radius(self, radius: float, point) -> List[int]:
        """Agent ids strictly within ``radius`` of ``point``
        (location_hash_2d.rs:240-258 semantics: strict <)."""
        from ..ops.neighbors import neighbors_in_radius

        mask = neighbors_in_radius(
            self.state.position,
            self.state.alive,
            jnp.asarray(radius, self.config.jdtype),
            jnp.asarray(point, self.config.jdtype),
        )
        uid = np.asarray(self.state.uid)
        return [int(uid[i]) for i in np.flatnonzero(np.asarray(mask))]

    def get_nearest_neighbours(self, n: int, point) -> List[int]:
        """The ``n`` nearest agent ids to ``point``, nearest first
        (spatial_index.rs:7-8).  Exact — unlike the reference's ring scan,
        which misses corner cells (location_hash_2d.rs:177-218).

        With a grid configured and ``capacity >=
        config.knn_grid_threshold``, the query is spatially bounded like
        the reference's: candidates come from an expanding cell window
        (ops/neighbors.nearest_neighbors_grid) that grows until the k-th
        hit is provably inside it; the O(N) brute pass is the fallback
        (and the small-N / no-grid default — at small N the single brute
        dispatch beats the ring ladder; exact either way)."""
        point_j = jnp.asarray(point, self.config.jdtype)
        if (self.config.grid is not None
                and self.config.capacity >= self.config.knn_grid_threshold):
            # One traced computation: binning reused across queries within
            # a step (rebuilt only when state changed), ring escalation as
            # a device-side lax.cond ladder — no per-query re-bin, no
            # retracing per ring (the reference's scan is incremental the
            # same way, location_hash_2d.rs:151-238).
            from ..ops.neighbors import nearest_neighbors_tiered

            binning = self._knn_binning()
            if not hasattr(self, "_knn_fns"):
                self._knn_fns = {}
            fn = self._knn_fns.get(n)
            if fn is None:
                grid = self.config.grid

                def knn(starts, order, pos, alive, pt, _k=n, _grid=grid):
                    return nearest_neighbors_tiered(
                        _grid, starts, order, pos, alive, _k, pt
                    )

                fn = jax.jit(knn)
                self._knn_fns[n] = fn
            idx, valid = fn(binning.starts, binning.order,
                            self.state.position, self.state.alive, point_j)
            uid = np.asarray(self.state.uid)
            idx, valid = np.asarray(idx), np.asarray(valid)
            return [int(uid[i]) for i, v in zip(idx, valid) if v]

        from ..ops.neighbors import nearest_neighbors

        idx, valid = nearest_neighbors(
            self.state.position,
            self.state.alive,
            n,
            point_j,
        )
        uid = np.asarray(self.state.uid)
        idx, valid = np.asarray(idx), np.asarray(valid)
        return [int(uid[i]) for i, v in zip(idx, valid) if v]

    # -- checkpoint / resume (absent in the reference, SURVEY.md §5) ----------

    def save(self, path: str) -> None:
        """Checkpoint the complete simulation state to ``path`` (.npz)."""
        from ..utils.checkpoint import save_state

        save_state(path, self.state)

    def load(self, path: str) -> None:
        """Restore state from a checkpoint.  Capacity must match the
        current config (static shapes)."""
        from ..utils.checkpoint import load_state

        state = load_state(path)
        if state.capacity != self.config.capacity:
            raise ValueError(
                f"checkpoint capacity {state.capacity} != config "
                f"capacity {self.config.capacity}"
            )
        self.state = state

    # -- observability ---------------------------------------------------------

    def _slot_of(self, agent_id: int) -> int:
        uid = np.asarray(self.state.uid)
        alive = np.asarray(self.state.alive)
        hits = np.flatnonzero((uid == agent_id) & alive)
        if len(hits) == 0:
            raise KeyError(f"no live agent with id {agent_id}")
        return int(hits[0])

    @property
    def num_agents(self) -> int:
        return int(self.state.num_alive)

    @property
    def sim_time(self) -> float:
        return float(self.state.sim_time)

    @property
    def agents(self) -> Dict[int, AgentView]:
        """Host snapshot of all live agents, keyed by agent id — the
        reference's public ``agents`` HashMap (lib.rs:71)."""
        st = jax.device_get(
            (
                self.state.uid,
                self.state.alive,
                self.state.position,
                self.state.velocity,
                self.state.preferred_vel,
                self.state.next_waypoint,
                self.state.eyesight,
            )
        )
        uid, alive, pos, vel, pref, nwp, eye = st
        out = {}
        for slot in np.flatnonzero(alive):
            out[int(uid[slot])] = AgentView(
                agent_id=int(uid[slot]),
                position=tuple(pos[slot]),
                velocity=tuple(vel[slot]),
                preferred_vel=tuple(pref[slot]),
                next_waypoint=int(nwp[slot]),
                eyesight_range=float(eye[slot]),
            )
        return out
