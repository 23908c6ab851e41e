"""Local (collision-avoidance) planners, fully vectorized.

The reference trait (local_planner.rs:7-18) maps ``(agent, nearby_agents,
recommended_velocity) -> velocity`` one agent at a time.  Here each planner
is a pure batched function over the neighbor-candidate table:

    plan(params, state, nbr: NeighborSet, rec_vel[N,2]) -> vel[N,2]

Shipped planners, mirroring the reference:

- :class:`NoLocalPlan` — identity pass-through (no_local_plan.rs:7-18).
- :class:`Zanlungo` — the social-force model (zanlungo.rs:9-218), computed
  over all pairs (agent, candidate) with masking, exactly reproducing the
  reference math; see the kernel-by-kernel citations below.

The Zanlungo math here is the correctness oracle; ops/zanlungo_pallas.py
provides the tiled Pallas kernel for the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.state import SimState
from ..ops.neighbors import NeighborSet


class LocalPlanner:
    """``plan(params, state, nbr, rec_vel, self_pref)``.

    ``self_pref[N,2]`` is the agent's *own* preferred velocity as freshly
    produced by the high-level planner this step, while neighbors'
    preferred velocities are read from committed state
    (``state.preferred_vel``).  This split replicates a reference quirk:
    Phase B writes ``preferred_vel`` on a per-agent *clone* (lib.rs:271)
    but Phase C never commits it (lib.rs:354-357 commit only
    velocity/position/next_waypoint), so the stored ``preferred_vel`` that
    neighbors observe keeps its spawn value forever.  Set
    ``SimConfig``'s ``commit_preferred_vel=True`` for the fixed behavior.
    """

    def init_params(self):
        return ()

    def plan(self, params, state, nbr, rec_vel, self_pref):  # pragma: no cover
        raise NotImplementedError


class NoLocalPlan(LocalPlanner):
    """Returns the recommended velocity unchanged (no_local_plan.rs:7-18)."""

    needs_neighbors = False

    def plan(self, params, state: SimState, nbr: NeighborSet, rec_vel, self_pref):
        return rec_vel


# ---------------------------------------------------------------------------
# Zanlungo social forces
# ---------------------------------------------------------------------------


@struct.dataclass
class ZanlungoParams:
    """Constructor parameters of the reference (zanlungo.rs:31-48).

    ``obstacle_scale`` and ``reaction_time`` are stored but never read by the
    reference (grep: only zanlungo.rs:11-12, 33-34, 41-42); kept for API
    parity.  Per-agent right-of-way priorities live in ``SimState.priority``
    (the reference's ``agent_priorities`` HashMap with its ``agent_id as
    f64`` default, zanlungo.rs:94-98, 183-184).

    ``force_cap`` is OUR extension: the reference clamps the force
    magnitude at a hard-coded 1e15 (zanlungo.rs:165-167), so overlapping
    agents (time-to-collision 0) get flung to ~1e14 positions in one step
    — its own demo parameters do this.  The default keeps reference
    behavior; finite caps (~10-100x agent_scale) make dense crowds usable.
    """

    agent_scale: jax.Array
    obstacle_scale: jax.Array
    reaction_time: jax.Array
    force_distance: jax.Array
    agent_mass: jax.Array
    agent_radius: jax.Array
    force_cap: jax.Array = struct.field(
        default_factory=lambda: jnp.asarray(1e15)
    )


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _norm(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def time_to_collision(rel_vel, rel_pos, agent_radius):
    """Pairwise time-to-collision via the quadratic
    |rel_pos + t*rel_vel| = agent_radius  (zanlungo.rs:49-74).

    Branch structure replicated exactly:
      - negative discriminant -> inf
      - roots of opposite sign -> 0 (already overlapping)
      - smallest positive root otherwise, else inf.

    Divergence: when |rel_vel| = 0 the reference divides 0/0 producing NaNs
    whose comparisons are all false, falling through to inf; we return inf
    explicitly (identical result, no NaNs).
    """
    a = _dot(rel_vel, rel_vel)
    b = 2.0 * _dot(rel_vel, rel_pos)
    c = _dot(rel_pos, rel_pos) - agent_radius * agent_radius
    disc = b * b - 4.0 * a * c

    safe_a = jnp.where(a > 0, a, 1.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / (2.0 * safe_a)
    t1 = (-b + sq) / (2.0 * safe_a)

    inf = jnp.asarray(jnp.inf, rel_vel.dtype)
    opposite = ((t0 < 0) & (t1 > 0)) | ((t1 < 0) & (t0 > 0))
    res = jnp.where(
        opposite,
        0.0,
        jnp.where((t0 < t1) & (t0 > 0), t0, jnp.where(t1 > 0, t1, inf)),
    )
    res = jnp.where(disc < 0, inf, res)
    return jnp.where(a > 0, res, inf)


def _slerp(t, p0, p1, sin_theta):
    """Spherical interpolation as the reference computes it
    (zanlungo.rs:23-28) — note p0/p1 are *not* unit vectors there either."""
    theta = jnp.arcsin(sin_theta)
    safe = jnp.where(sin_theta > 0, sin_theta, 1.0)
    t0 = jnp.sin((1.0 - t) * theta) / safe
    t1 = jnp.sin(t * theta) / safe
    out = p0 * t0[..., None] + p1 * t1[..., None]
    # sin_theta == 0 => vectors parallel; reference would divide by zero.
    # Interpolating between parallel vectors is p0 itself.
    return jnp.where((sin_theta > 0)[..., None], out, p0)


def zanlungo_velocity(
    p: ZanlungoParams,
    # per-agent [N] / [N,2] step-start fields:
    position,
    velocity,
    self_pref,  # [N, 2] own preferred velocity (fresh from the HL planner)
    pref_committed,  # [N, 2] committed preferred velocities (what
    # *neighbors* expose — see LocalPlanner docstring)
    priority,
    # candidate table:
    nbr_idx,  # [N, K] int32
    nbr_valid,  # [N, K] bool
    rec_vel,  # [N, 2] recommended velocity from the high-level planner
    *,
    # Optional distinct query rows (for chunked evaluation: queries are a
    # slice of the agents while candidate gathers index the full arrays).
    q_position=None,
    q_velocity=None,
    q_priority=None,
):
    """Batched Zanlungo get_desired_velocity (zanlungo.rs:201-218):
    ``rec_vel + total_force / agent_mass`` where forces only exist if some
    neighbor has a finite time-to-collision.

    All neighbor reads come from step-start state, making the result
    independent of agent iteration order — unlike the reference, whose
    mid-loop spatial-index updates make dense Zanlungo scenes
    iteration-order-dependent (SURVEY.md §3.1 quirk 1).
    """
    if q_position is None:
        q_position, q_velocity, q_priority = position, velocity, priority

    # Gather candidate fields: [N, K, 2] / [N, K]
    opos = position[nbr_idx]
    ovel = velocity[nbr_idx]
    opref = pref_committed[nbr_idx]
    oprio = priority[nbr_idx]
    return zanlungo_from_rows(
        p, q_position, q_velocity, self_pref, q_priority,
        opos, ovel, opref, oprio, nbr_valid, rec_vel,
    )


def zanlungo_from_rows(
    p: ZanlungoParams,
    q_position,   # [..., 2] query fields
    q_velocity,   # [..., 2]
    self_pref,    # [..., 2] query's fresh preferred velocity
    q_priority,   # [...]
    opos,         # [..., K, 2] pre-gathered candidate fields
    ovel,         # [..., K, 2]
    opref,        # [..., K, 2] candidates' COMMITTED preferred velocity
    oprio,        # [..., K]
    nbr_valid,    # [..., K] bool
    rec_vel,      # [..., 2]
):
    """The Zanlungo math of :func:`zanlungo_velocity` on pre-gathered
    candidate rows (arbitrary leading batch dims) — shared by the
    index-gathering path above and gather-free callers (the bucket
    spill patch, ops/zanlungo_pallas.spill_patch)."""
    dtype = q_position.dtype
    inf = jnp.asarray(jnp.inf, dtype)

    mypos = q_position[..., None, :]
    myvel = q_velocity[..., None, :]
    mypref = self_pref[..., None, :]
    myprio = q_priority[..., None]

    # ---- compute_tti: min time-to-collision over neighbors
    # (zanlungo.rs:76-91)
    rel_vel = ovel - myvel
    rel_pos = opos - mypos
    ttc = time_to_collision(rel_vel, rel_pos, p.agent_radius.astype(dtype))
    ttc = jnp.where(nbr_valid, ttc, inf)
    t_i = jnp.min(ttc, axis=-1)  # [...]

    # ---- right_of_way_vel (zanlungo.rs:173-198)
    row = jnp.clip(myprio - oprio, -1.0, 1.0)  # [N, K]
    r2n = jnp.sqrt(jnp.maximum(-row, 0.0))
    r2p = jnp.sqrt(jnp.maximum(row, 0.0))
    w = jnp.where(row < 0, -r2n, jnp.where(row > 0, r2p, 0.0))  # [N, K]
    my_vel = jnp.where(
        (row > 0)[..., None], myvel + r2p[..., None] * (mypref - myvel), myvel
    )
    other_vel = jnp.where(
        (row < 0)[..., None], ovel + r2n[..., None] * (opref - ovel), ovel
    )

    # ---- compute_agent_force (zanlungo.rs:93-170)
    weight = 1.0 - w  # [N, K], in [0, 2]
    t = t_i[..., None, None]
    fut = mypos + my_vel * t
    ofut = opos + other_vel * t
    d_ij = fut - ofut  # [N, K, 2]
    dist = _norm(d_ij)  # [N, K] — captured before any slerp, as reference

    # "other agent has right of way" branch (weight > 1, zanlungo.rs:113-151)
    pref_speed = _norm(opref)
    stationary = pref_speed < 1e-4
    # stationary: accelerate orthogonally to current displacement
    curr_rel = mypos - opos
    perp_s = jnp.stack([-curr_rel[..., 1], curr_rel[..., 0]], axis=-1)
    flip_s = _dot(perp_s, myvel) < 0
    perp_s = jnp.where(flip_s[..., None], -perp_s, perp_s)
    # moving: orthogonal to other's preferred direction, if it converges
    pref_dir = opref
    perp_m = jnp.stack([-pref_dir[..., 1], pref_dir[..., 0]], axis=-1)
    flip_m = _dot(perp_m, d_ij) < 0
    perp_m = jnp.where(flip_m[..., None], -perp_m, perp_m)
    moving_interp = _dot(pref_dir, d_ij) > 0

    interpolate = jnp.where(stationary, True, moving_interp)
    perp = jnp.where(stationary[..., None], perp_s, perp_m)

    sin_theta = jnp.abs(perp[..., 0] * d_ij[..., 1] - perp[..., 1] * d_ij[..., 0])
    sin_theta = jnp.minimum(sin_theta, 1.0)  # zanlungo.rs:146-148
    d_slerped = _slerp(weight - 1.0, d_ij, perp, sin_theta)
    use_slerp = (weight > 1.0) & interpolate
    d_ij = jnp.where(use_slerp[..., None], d_slerped, d_ij)

    # The reference's "converge" early-exit (zanlungo.rs:155) compares dist
    # with the identical recomputed norm — provably never taken; omitted.

    d_norm = _norm(d_ij)
    d_unit = jnp.where(
        (d_norm > 0)[..., None], d_ij / jnp.where(d_norm > 0, d_norm, 1.0)[..., None], 0.0
    )  # reference normalize() NaNs on zero vectors; we emit zero force

    surface_dist = dist - 2.0 * p.agent_radius.astype(dtype)
    speed_diff = _norm(my_vel - other_vel)
    safe_t = jnp.where(t_i > 0, t_i, 1.0)[..., None]
    magnitude = weight * p.agent_scale.astype(dtype) * speed_diff / safe_t
    # t_i == 0 (agents currently overlapping): reference divides by zero ->
    # +inf, then clamps to 1e15 (zanlungo.rs:165-167; configurable here).
    magnitude = jnp.where((t_i == 0)[..., None] & (speed_diff * weight > 0), inf, magnitude)
    magnitude = jnp.minimum(magnitude, p.force_cap.astype(dtype))

    falloff = jnp.exp(-surface_dist / p.force_distance.astype(dtype))
    force = d_unit * (magnitude * falloff)[..., None]  # [N, K, 2]

    # Forces only accumulate when a finite TTC exists (zanlungo.rs:211) and
    # only over valid neighbors.
    force = jnp.where(nbr_valid[..., None], force, 0.0)
    total = jnp.sum(force, axis=-2)  # [..., 2]
    total = jnp.where(jnp.isfinite(t_i)[..., None], total, 0.0)

    return rec_vel + total / p.agent_mass.astype(dtype)


class Zanlungo(LocalPlanner):
    """Zanlungo et al. social-force local planner (zanlungo.rs; the readme
    calls the reference implementation "incomplete", readme.md:22).

    ``force_chunk``: if > 0, the batched force pass runs under ``lax.map``
    over agent chunks of this size, bounding the [chunk, K] temporaries
    instead of materializing [N, K] ones — the memory-lean path for the
    XLA backends at large N (the grid_pallas kernel never materializes
    either way).  Must divide the capacity.
    """

    def __init__(
        self,
        agent_scale: float,
        obstacle_scale: float,
        reaction_time: float,
        force_distance: float,
        agent_mass: float,
        agent_radius: float,
        force_chunk: int = 0,
        force_cap: float = 1e15,  # the reference's clamp (zanlungo.rs:167)
    ):
        self._p = (
            agent_scale,
            obstacle_scale,
            reaction_time,
            force_distance,
            agent_mass,
            agent_radius,
            force_cap,
        )
        self.force_chunk = int(force_chunk)

    def init_params(self):
        s, o, r, f, m, rad, cap = self._p
        return ZanlungoParams(
            agent_scale=jnp.asarray(s),
            obstacle_scale=jnp.asarray(o),
            reaction_time=jnp.asarray(r),
            force_distance=jnp.asarray(f),
            agent_mass=jnp.asarray(m),
            agent_radius=jnp.asarray(rad),
            force_cap=jnp.asarray(cap),
        )

    def plan(self, params, state: SimState, nbr: NeighborSet, rec_vel, self_pref):
        n = state.capacity
        c = self.force_chunk
        if c <= 0 or n <= c:
            return zanlungo_velocity(
                params,
                state.position,
                state.velocity,
                self_pref,
                state.preferred_vel,
                state.priority,
                nbr.idx,
                nbr.valid,
                rec_vel,
            )

        # Chunked: per-agent rows are split [n/c, c, ...]; the full
        # position/velocity/pref/priority arrays stay shared (candidate
        # gathers index into them globally).  A capacity that does not
        # divide by the chunk is PADDED up (pad rows have valid=False
        # and are sliced off) — silently falling back to the unchunked
        # path would materialize the [N, K] temporaries the chunking
        # exists to bound.
        def chunk_fn(args):
            qpos, qvel, qprio, sp, idx, valid, rec = args
            return zanlungo_velocity(
                params,
                state.position,
                state.velocity,
                sp,
                state.preferred_vel,
                state.priority,
                idx,
                valid,
                rec,
                q_position=qpos,
                q_velocity=qvel,
                q_priority=qprio,
            )

        k = nbr.idx.shape[1]
        pad = (-n) % c
        np_ = n + pad

        def padded(arr, fill=0):
            if not pad:
                return arr
            return jnp.concatenate([
                arr,
                jnp.full((pad,) + arr.shape[1:], fill, arr.dtype),
            ])

        out = jax.lax.map(
            chunk_fn,
            (
                padded(state.position).reshape(np_ // c, c, 2),
                padded(state.velocity).reshape(np_ // c, c, 2),
                padded(state.priority).reshape(np_ // c, c),
                padded(self_pref).reshape(np_ // c, c, 2),
                padded(nbr.idx).reshape(np_ // c, c, k),
                padded(nbr.valid, False).reshape(np_ // c, c, k),
                padded(rec_vel).reshape(np_ // c, c, 2),
            ),
        )
        return out.reshape(np_, 2)[:n]

    def plan_fused_dense(self, params, dense_cfg, state: SimState,
                         rec_vel, self_pref, key_sorted,
                         interpret: bool = False, int_prio: bool = False,
                         dual_row: bool = True):
        """Dense (bucket-free) fused kernel path (the grid_dense
        backend; ops/zanlungo_dense.py).  ``key_sorted`` [N] int32 is
        the rows' tile keys in sorted order — the presorted step's
        invariant (fresh or carried; core/step.py).  Returns
        (vel [N,2], max_tile_occupancy, dropped); ``dropped`` counts
        column-capacity overflow (the engine's one narrowing,
        raise-by-default via neighbor_truncated)."""
        from ..ops.zanlungo_dense import zanlungo_fused_dense

        return zanlungo_fused_dense(
            dense_cfg, params, state.position, state.velocity, self_pref,
            state.preferred_vel, state.priority, state.eyesight,
            state.alive, rec_vel, key_sorted, interpret=interpret,
            int_prio=int_prio, dual_row=dual_row,
        )

    def plan_fused(self, params, bucket_cfg, state: SimState, rec_vel,
                   self_pref, interpret: bool = False, world_mesh=None,
                   use_pack_kernel: bool = False, spill_capacity: int = 0,
                   presorted: bool = False, int_prio: bool = False,
                   dual_row: bool = False, binning=None,
                   fused_spills: bool = False):
        """Fused neighbor-search + force Pallas kernel path (the
        grid_pallas backend; ops/zanlungo_pallas.py).  With ``world_mesh``,
        the kernel runs domain-decomposed over the mesh's world columns
        with ppermute halo exchange (parallel/domain.py).  Returns
        (vel [N,2], max_tile_occupancy, dropped).  With
        ``spill_capacity`` > 0 bucket overflow is repaired exactly
        (spill_patch) and ``dropped`` counts only cap overruns; with 0,
        overflow agents are excluded (loudly, via ``dropped``).

        NARROWING: the ``world_mesh`` (domain-sharded) branch has NO
        spill repair — ``spill_capacity`` is ignored there and bucket
        overflow surfaces through ``dropped`` (raising by default via
        ``neighbor_truncated``).  Overflow-prone multi-chip scenes
        belong on the world-sharded engine (parallel/worldstep.py),
        whose cross-shard spill exchange repairs overflow exactly."""
        if world_mesh is not None:
            from ..parallel.domain import zanlungo_fused_domain

            return zanlungo_fused_domain(
                world_mesh, bucket_cfg, params, state.position,
                state.velocity, self_pref, state.preferred_vel,
                state.priority, state.eyesight, state.alive, rec_vel,
                interpret=interpret, int_prio=int_prio, dual_row=dual_row,
            )
        from ..ops.zanlungo_pallas import zanlungo_fused

        return zanlungo_fused(
            bucket_cfg, params, state.position, state.velocity, self_pref,
            state.preferred_vel, state.priority, state.eyesight, state.alive,
            rec_vel, interpret=interpret, use_pack_kernel=use_pack_kernel,
            spill_capacity=spill_capacity, presorted=presorted,
            int_prio=int_prio, dual_row=dual_row, binning=binning,
            fused_spills=fused_spills,
        )
