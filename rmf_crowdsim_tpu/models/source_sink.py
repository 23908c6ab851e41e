"""SourceSink agent streaming: declarative spawn/despawn.

Mirrors the reference's ``SourceSink`` struct (source_sink.rs:36-60): a
source point, a waypoint chain whose last element acts as the sink, a sink
radius, a crowd generator, the planners newly spawned agents are wired to,
a loop flag, and the eyesight new agents get.

Host-side these are plain Python objects; for the jitted step they are
stacked into a single :class:`SourceParams` pytree padded to the maximum
waypoint count, so the whole spawn/despawn phase is a few vectorized ops.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

GEN_MONOTONIC = 0
GEN_POISSON = 1
# Custom host-side generator: any object with ``get_number_to_spawn(dt)``
# (the reference's CrowdGenerator trait, source_sink.rs:30-33).  The host
# step() path calls it each step and feeds the count through
# ``SourceParams.custom_count``; scanned rollouts (run()/build_rollout)
# cannot call back into Python mid-scan, so they support only the two
# built-in kinds (Simulation.run falls back to per-step stepping).
GEN_CUSTOM = 2


@dataclasses.dataclass(frozen=True)
class MonotonicCrowd:
    """Spawns ``round(rate * dt)`` agents per step, rounding half away from
    zero like Rust's ``f64::round`` (source_sink.rs:96-101)."""

    rate: float
    kind: int = GEN_MONOTONIC


@dataclasses.dataclass(frozen=True)
class PoissonCrowd:
    """Samples ``Poisson(rate * dt)`` per step (source_sink.rs:75-82); here
    with a threaded JAX PRNG key instead of a thread-local OS rng."""

    rate: float
    kind: int = GEN_POISSON


@dataclasses.dataclass
class SourceSink:
    """Host-side SourceSink description (source_sink.rs:36-60).

    ``high_level_planner`` / ``local_planner`` are planner *objects* from
    models/highlevel.py / models/local.py; the Simulation resolves them to
    indices in its planner registries (the reference shares them by Arc,
    lib.rs:226-231).
    """

    source: Tuple[float, float]
    waypoints: Sequence[Tuple[float, float]]
    radius_sink: float
    crowd_generator: object  # MonotonicCrowd | PoissonCrowd
    high_level_planner: object
    local_planner: object
    agent_eyesight_range: float
    loop_forever: bool = False


@struct.dataclass
class SourceParams:
    """All SourceSinks stacked into device arrays (S sources, padded to W
    waypoints)."""

    source: jax.Array  # [S, 2]
    waypoints: jax.Array  # [S, W, 2]
    n_waypoints: jax.Array  # [S] int32
    radius_sink: jax.Array  # [S]
    rate: jax.Array  # [S]
    gen_kind: jax.Array  # [S] int32 (GEN_MONOTONIC | GEN_POISSON)
    loop_forever: jax.Array  # [S] bool
    eyesight: jax.Array  # [S]
    hl_idx: jax.Array  # [S] int32 — planner registry index
    lp_idx: jax.Array  # [S] int32
    # Precomputed route leg per waypoint for route-following HL planners:
    # leg_route[s, w] is the route id of the leg that *ends* at
    # waypoints[s, w] (so leg 0 runs source -> waypoints[0]); -1 when the
    # planner is not route-based or planning failed (the reference then
    # leaves the agent planless, rmf/mod.rs:233-235).
    leg_route: jax.Array  # [S, W] int32
    # Active mask so sources can be removed without retracing
    # (remove_source_sink, lib.rs:164-168).
    active: jax.Array  # [S] bool
    # Host-computed spawn counts for GEN_CUSTOM generators, refreshed by
    # the host before each step (ignored for the built-in kinds).
    custom_count: jax.Array  # [S] int32


def stack_source_params(
    sources: Sequence[SourceSink],
    hl_indices: Sequence[int],
    lp_indices: Sequence[int],
    leg_routes: Sequence[Sequence[int]],
    dtype,
) -> Optional[SourceParams]:
    """Stack host SourceSink descriptions into a SourceParams pytree."""
    if not sources:
        return None
    s = len(sources)
    w = max(len(ss.waypoints) for ss in sources)
    waypoints = jnp.zeros((s, w, 2), dtype)
    leg = jnp.full((s, w), -1, jnp.int32)
    for i, ss in enumerate(sources):
        wp = jnp.asarray(ss.waypoints, dtype)
        waypoints = waypoints.at[i, : len(ss.waypoints)].set(wp)
        lr = jnp.asarray(list(leg_routes[i]) + [-1] * (w - len(leg_routes[i])),
                         jnp.int32)
        leg = leg.at[i].set(lr)
    # Duck-typed generator classification (the reference is generic over
    # ``impl CrowdGenerator``, source_sink.rs:30-33): objects exposing the
    # built-in ``kind``/``rate`` attributes run fully on-device; anything
    # else with ``get_number_to_spawn(dt)`` is a GEN_CUSTOM host generator.
    kinds, rates = [], []
    for ss in sources:
        g = ss.crowd_generator
        kind = getattr(g, "kind", GEN_CUSTOM)
        if kind not in (GEN_MONOTONIC, GEN_POISSON):
            kind = GEN_CUSTOM
        if kind == GEN_CUSTOM and not callable(
            getattr(g, "get_number_to_spawn", None)
        ):
            raise TypeError(
                f"crowd generator {g!r} has neither the built-in "
                f"kind/rate attributes nor get_number_to_spawn(dt)"
            )
        kinds.append(kind)
        rates.append(float(getattr(g, "rate", 0.0)))
    return SourceParams(
        source=jnp.asarray([ss.source for ss in sources], dtype),
        waypoints=waypoints,
        n_waypoints=jnp.asarray([len(ss.waypoints) for ss in sources], jnp.int32),
        radius_sink=jnp.asarray([ss.radius_sink for ss in sources], dtype),
        rate=jnp.asarray(rates, dtype),
        gen_kind=jnp.asarray(kinds, jnp.int32),
        loop_forever=jnp.asarray([ss.loop_forever for ss in sources], jnp.bool_),
        eyesight=jnp.asarray([ss.agent_eyesight_range for ss in sources], dtype),
        hl_idx=jnp.asarray(hl_indices, jnp.int32),
        lp_idx=jnp.asarray(lp_indices, jnp.int32),
        leg_route=leg,
        active=jnp.ones((s,), jnp.bool_),
        custom_count=jnp.zeros((s,), jnp.int32),
    )
