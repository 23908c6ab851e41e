"""Multi-chip execution: agent-sharded simulation over a device mesh.

The reference is strictly single-threaded and single-process (SURVEY.md
§2c: the step loop is sequential, lib.rs:259-347; the only concurrency
artifacts are Arc<Mutex<..>> wrappers).  The TPU-native scale-out analog of
data parallelism for a crowd simulator is sharding the fixed-capacity
agent SoA over a 1D mesh axis ``"agents"``:

- every per-agent array ([N] / [N, 2]) is sharded along N;
- planner params, SourceSink tables, and scalar state are replicated;
- the jitted step runs SPMD; XLA inserts the collectives the neighbor
  pass needs (agents near shard boundaries observing remote neighbors
  become all-gathers over ICI).

This module provides the layout helpers + a sharded step/rollout factory.
``ppermute``-based spatial domain decomposition (halo-exchanging only
boundary supertiles instead of all-gathering positions) lives in
``parallel/domain.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import SimConfig
from ..core.state import SimState
from ..core.step import SimParams, build_rollout, build_step

AGENT_AXIS = "agents"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over the agent axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AGENT_AXIS,))


def state_sharding(mesh: Mesh, state: SimState):
    """Sharding pytree for a SimState: leading-agent-dim arrays sharded,
    scalars/PRNG key replicated."""
    n = state.capacity
    shard = NamedSharding(mesh, P(AGENT_AXIS))
    repl = NamedSharding(mesh, P())

    def leaf(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n:
            return shard
        return repl

    return jax.tree_util.tree_map(leaf, state)


def shard_state(mesh: Mesh, state: SimState) -> SimState:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, state_sharding(mesh, state)
    )


def replicate_params(mesh: Mesh, params: SimParams) -> SimParams:
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), params)


def build_sharded_step(config: SimConfig, hl_planners, lp_planners,
                       mesh: Mesh):
    """Jit the step with explicit shardings over ``mesh``.

    The agent capacity must divide the mesh size.  Returns
    ``step(params, state, dt) -> (state, events)`` where per-agent inputs
    and outputs stay sharded across the mesh between calls.
    """
    n_dev = mesh.devices.size
    assert config.capacity % n_dev == 0, (
        f"capacity {config.capacity} must divide over {n_dev} devices"
    )
    step = build_step(config, hl_planners, lp_planners)

    shard = NamedSharding(mesh, P(AGENT_AXIS))
    repl = NamedSharding(mesh, P())

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == config.capacity:
            return shard
        return repl

    def sharded_step(params, state, dt):
        new_state, events = step(params, state, dt)
        # Pin layouts so iterating the step keeps arrays in place.
        new_state = jax.lax.with_sharding_constraint(
            new_state, jax.tree_util.tree_map(spec, new_state)
        )
        events = jax.lax.with_sharding_constraint(
            events, jax.tree_util.tree_map(spec, events)
        )
        return new_state, events

    return jax.jit(sharded_step, donate_argnums=(1,))


def build_sharded_rollout(config: SimConfig, hl_planners, lp_planners,
                          mesh: Mesh):
    """Sharded multi-step rollout (lax.scan) — the multi-chip benchmark
    path."""
    rollout = build_rollout(config, hl_planners, lp_planners)

    shard = NamedSharding(mesh, P(AGENT_AXIS))
    repl = NamedSharding(mesh, P())

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == config.capacity:
            return shard
        return repl

    def run(params, state, dt, n_steps):
        state, counters = rollout(params, state, dt, n_steps)
        state = jax.lax.with_sharding_constraint(
            state, jax.tree_util.tree_map(spec, state)
        )
        return state, counters

    return jax.jit(run, static_argnums=(3,), donate_argnums=(1,))
