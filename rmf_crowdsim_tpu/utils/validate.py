"""State invariant checks — the framework's answer to SURVEY.md §5's
race-detection/sanitizer row.

The step is a pure function, so there are no data races to detect; what
can go wrong is numeric (NaN/Inf positions from pathological force
configs — the reference clamps at 1e15, zanlungo.rs:165-167, and its own
demo params explode) and structural (duplicate uids, dead slots with
stale flags).  ``validate_state`` returns a dict of violation counts as
device scalars (cheap, jittable); ``check_state`` raises on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.state import SimState


def validate_state(state: SimState) -> dict:
    """Jittable invariant audit; every entry should be 0."""
    alive = state.alive
    finite_pos = jnp.isfinite(state.position).all(axis=-1)
    finite_vel = jnp.isfinite(state.velocity).all(axis=-1)
    live_uid = jnp.where(alive, state.uid, -1)
    # Duplicate live uids: sort and compare neighbors (uids are unique
    # and non-negative for live agents).
    s = jnp.sort(live_uid)
    dup = (s[1:] == s[:-1]) & (s[1:] >= 0)
    return {
        "nonfinite_position": jnp.sum(alive & ~finite_pos).astype(jnp.int32),
        "nonfinite_velocity": jnp.sum(alive & ~finite_vel).astype(jnp.int32),
        "negative_live_uid": jnp.sum(alive & (state.uid < 0)).astype(jnp.int32),
        "duplicate_live_uid": jnp.sum(dup).astype(jnp.int32),
        "uid_above_allocator": jnp.sum(
            alive & (state.uid >= state.next_uid)
        ).astype(jnp.int32),
        "waypoint_negative": jnp.sum(
            alive & (state.next_waypoint < 0)
        ).astype(jnp.int32),
    }


def check_state(state: SimState) -> None:
    """Host-side assert wrapper: raises ValueError listing violations."""
    report = jax.device_get(validate_state(state))
    bad = {k: int(v) for k, v in report.items() if int(v) != 0}
    if bad:
        raise ValueError(f"simulation state invariants violated: {bad}")
