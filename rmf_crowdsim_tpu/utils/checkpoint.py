"""Checkpoint / resume for simulation state.

The reference has NO serialization of ``Simulation`` state (SURVEY.md §5
— explicit absence).  The SoA pytree design makes it trivial here: the
complete simulation state (positions, velocities, masks, waypoint
cursors, id allocator, RNG key, clock) is one flat dict of arrays.

``save_state`` / ``load_state`` use ``np.savez`` (no extra deps, single
file).  For multi-host / sharded checkpoints swap in orbax via
``save_state_orbax`` when the package is available.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState

_FIELDS = [f.name for f in dataclasses.fields(SimState)]


def state_to_dict(state: SimState) -> dict:
    host = jax.device_get({name: getattr(state, name) for name in _FIELDS})
    return {k: np.asarray(v) for k, v in host.items()}


def save_state(path: str, state: SimState) -> None:
    np.savez(path, **state_to_dict(state))


def _asarray_exact(name: str, value: np.ndarray) -> jnp.ndarray:
    """Convert preserving the checkpoint's dtype.  Without jax_enable_x64 a
    bare ``jnp.asarray`` silently downcasts 64-bit checkpoints to 32-bit,
    breaking bitwise-reproducible resume — raise instead."""
    arr = jnp.asarray(value)
    if arr.dtype != value.dtype:
        raise ValueError(
            f"checkpoint field {name!r} has dtype {value.dtype} but this "
            f"runtime would load it as {arr.dtype} (jax_enable_x64 is "
            f"off?); refusing a silent downcast"
        )
    return arr


def load_state(path: str) -> SimState:
    with np.load(path) as data:
        missing = set(_FIELDS) - set(data.files)
        if missing:
            raise ValueError(f"checkpoint missing fields: {sorted(missing)}")
        return SimState(
            **{name: _asarray_exact(name, data[name]) for name in _FIELDS}
        )


def save_state_orbax(path: str, state: SimState) -> None:
    """Orbax backend (sharded/async checkpoints); optional dependency."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state_to_dict(state))
    ckptr.wait_until_finished()


def load_state_orbax(path: str) -> SimState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    data = ckptr.restore(path)
    return SimState(
        **{name: _asarray_exact(name, np.asarray(data[name]))
           for name in _FIELDS}
    )
