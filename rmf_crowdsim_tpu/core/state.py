"""Simulation state as a fixed-capacity structure-of-arrays pytree.

Replaces the reference's per-agent ``Agent`` struct and ``HashMap`` store
(lib.rs:47-65, lib.rs:71) with SoA device arrays selected by an alive-mask,
so the whole ``step()`` is one compiled XLA computation and multi-step
rollouts run under ``lax.scan``.

Field correspondence to the reference ``Agent`` (lib.rs:47-65):

====================  =====================================================
reference field        here
====================  =====================================================
``agent_id``           ``uid[N]`` — global monotonically increasing id,
                       never reused (lib.rs:128-129); the *slot* (array row)
                       is reused after despawn.
``position``           ``position[N, 2]``
``velocity``           ``velocity[N, 2]``
``preferred_vel``      ``preferred_vel[N, 2]``
``next_waypoint``      ``next_waypoint[N]``
``eyesight_range``     ``eyesight[N]``
``orientation`` /      deliberately dropped: the reference initializes both
``angular_vel``        to 0 and never writes them again (lib.rs:138,141 —
                       dead state, see SURVEY.md §2 item 2).
====================  =====================================================

Additional per-slot state with no direct reference field:

- ``alive[N]``: the liveness mask (replaces HashMap membership).
- ``source_id[N]``: the owning SourceSink, or -1 (replaces
  ``source_sink_agent_correspondence``, lib.rs:90).
- ``hl_idx[N]`` / ``lp_idx[N]``: which high-level / local planner drives this
  agent (replaces the per-agent ``Arc<Mutex<dyn ...Planner>>`` maps,
  lib.rs:77-79).
- ``route_id[N]`` / ``route_wp[N]``: the RMF planner's per-agent route cache
  ``agent_cache: HashMap<AgentId, (usize, usize)>`` (rmf/mod.rs:86) as
  device arrays; -1 route_id = "no route" (planner returns None).
- ``priority[N]``: Zanlungo right-of-way priority; the reference defaults it
  to ``agent_id as f64`` (zanlungo.rs:94-98, 183-184) with a HashMap
  override — here it is materialized per slot at spawn.
- ``sim_time``: a *correctly accumulating* clock.  The reference declares
  ``sim_time`` but never advances it, so its planners always see t=0
  (lib.rs:81,110 are the only writes — SURVEY.md §3.1 quirk 2).
- ``next_uid``, ``rng_key``: id allocation and PRNG state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .config import SimConfig


@struct.dataclass
class SimState:
    position: jax.Array  # [N, 2] float
    velocity: jax.Array  # [N, 2] float
    preferred_vel: jax.Array  # [N, 2] float
    next_waypoint: jax.Array  # [N] int32
    eyesight: jax.Array  # [N] float
    alive: jax.Array  # [N] bool
    uid: jax.Array  # [N] int32
    source_id: jax.Array  # [N] int32, -1 = none
    hl_idx: jax.Array  # [N] int32, -1 = none
    lp_idx: jax.Array  # [N] int32, -1 = none
    route_id: jax.Array  # [N] int32, -1 = none
    route_wp: jax.Array  # [N] int32
    priority: jax.Array  # [N] float
    sim_time: jax.Array  # [] float
    next_uid: jax.Array  # [] int32
    rng_key: jax.Array  # PRNG key

    @property
    def capacity(self) -> int:
        return self.position.shape[0]

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))


def make_state(config: SimConfig, seed: int = 0) -> SimState:
    """Create an empty simulation state (0 live agents)."""
    n = config.capacity
    f = config.jdtype
    return SimState(
        position=jnp.zeros((n, 2), f),
        velocity=jnp.zeros((n, 2), f),
        preferred_vel=jnp.zeros((n, 2), f),
        next_waypoint=jnp.zeros((n,), jnp.int32),
        eyesight=jnp.zeros((n,), f),
        alive=jnp.zeros((n,), jnp.bool_),
        uid=jnp.full((n,), -1, jnp.int32),
        source_id=jnp.full((n,), -1, jnp.int32),
        hl_idx=jnp.full((n,), -1, jnp.int32),
        lp_idx=jnp.full((n,), -1, jnp.int32),
        route_id=jnp.full((n,), -1, jnp.int32),
        route_wp=jnp.zeros((n,), jnp.int32),
        priority=jnp.zeros((n,), f),
        sim_time=jnp.zeros((), f),
        next_uid=jnp.zeros((), jnp.int32),
        rng_key=jax.random.PRNGKey(seed),
    )


@struct.dataclass
class StepEvents:
    """Per-step event masks — the device-side replacement for the reference's
    synchronous ``EventListener`` callbacks (lib.rs:22-33).

    The host layer (core/simulation.py) extracts these masks and dispatches
    ``agent_spawned`` / ``agent_destroyed`` / ``waypoint_reached`` callbacks.
    Unlike the reference — whose ``waypoint_reached`` hook is declared but
    never invoked (lib.rs:32; step() prints instead, lib.rs:317) — we fire it.
    """

    spawned: jax.Array  # [N] bool — slot newly spawned this step
    destroyed: jax.Array  # [N] bool — slot despawned this step
    waypoint_reached: jax.Array  # [N] bool — agent entered a waypoint disc
    spawn_position: jax.Array  # [N, 2] — position at spawn (for callbacks)
    destroyed_uid: jax.Array  # [N] int32 — uid of destroyed slot (uid is
    # overwritten on respawn; never in the same step, but kept for safety)
    waypoint_position: jax.Array  # [N, 2] — position when waypoint reached
    # Diagnostics (the reference either panics or silently drops in these
    # situations; we surface them as data):
    out_of_bounds: jax.Array  # [N] bool — agent left the grid this step
    # (reference: step() errors out, location_hash_2d.rs:61-63 → lib.rs:299)
    spawn_dropped: jax.Array  # [] int32 — spawns requested by generators but
    # dropped by the one-per-source cap / clearance gate / capacity
    # (reference drops silently, lib.rs:208-218)
    max_cell_occupancy: jax.Array  # [] int32 — densest queried grid cell,
    # for auditing max_per_cell truncation (grid backend; 0 for brute)
    neighbor_truncated: jax.Array  # [] int32 — alive agents whose
    # neighbor interactions were silently truncated this step (grid cells
    # past max_per_cell, Pallas tiles past bucket_capacity, pack-window
    # overflow).  The reference's cells are unbounded
    # (location_hash_2d.rs:15) so ANY nonzero count is a divergence;
    # Simulation.step raises on it unless config.on_truncation="ignore".
