"""Zanlungo social-force tests.

- Analytic time-to-collision cases from the reference's own test module
  (zanlungo.rs:220-237).
- A scalar per-pair oracle (independent re-derivation of the reference
  semantics, zanlungo.rs:93-218) checked against the vectorized batch
  implementation on random scenes — the framework's version of the
  reference's oracle-vs-fast-path pattern.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from rmf_crowdsim_tpu.models.local import (
    ZanlungoParams,
    time_to_collision,
    zanlungo_velocity,
)
from rmf_crowdsim_tpu.ops.neighbors import brute_neighbors


def jp(x):
    return jnp.asarray(x, jnp.float64)


def test_ttc_head_on():
    """zanlungo.rs:225-229: closing at 1 m/s from 10 m with radius 4 -> 6 s."""
    t = time_to_collision(jp([1.0, 0.0]), jp([-10.0, 0.0]), jp(4.0))
    assert float(t) == 6.0


def test_ttc_never_collide():
    """zanlungo.rs:232-236: receding -> infinity."""
    t = time_to_collision(jp([1.0, 0.0]), jp([10.0, 0.0]), jp(4.0))
    assert math.isinf(float(t))


def test_ttc_zero_relative_velocity():
    """rel_vel = 0: the reference's 0/0 NaN comparisons fall through to
    infinity; we return it explicitly."""
    t = time_to_collision(jp([0.0, 0.0]), jp([1.0, 0.0]), jp(4.0))
    assert math.isinf(float(t))


def test_ttc_currently_overlapping():
    """Roots of opposite sign (already within radius) -> 0."""
    t = time_to_collision(jp([1.0, 0.0]), jp([1.0, 0.0]), jp(4.0))
    assert float(t) == 0.0


# ---------------------------------------------------------------------------
# Scalar oracle
# ---------------------------------------------------------------------------


def ttc_oracle(rel_vel, rel_pos, radius):
    a = rel_vel @ rel_vel
    b = 2.0 * (rel_vel @ rel_pos)
    c = rel_pos @ rel_pos - radius * radius
    disc = b * b - 4 * a * c
    if disc < 0 or a == 0.0:
        return math.inf
    t0 = (-b - math.sqrt(disc)) / (2 * a)
    t1 = (-b + math.sqrt(disc)) / (2 * a)
    if (t0 < 0 < t1) or (t1 < 0 < t0):
        return 0.0
    if t0 < t1 and t0 > 0:
        return t0
    if t1 > 0:
        return t1
    return math.inf


def slerp_oracle(t, p0, p1, sin_theta):
    theta = math.asin(sin_theta)
    if sin_theta == 0.0:
        return p0
    return p0 * (math.sin((1 - t) * theta) / sin_theta) + p1 * (
        math.sin(t * theta) / sin_theta
    )


def force_oracle(mypos, myvel, mypref, myprio, opos, ovel, opref, oprio, t_i, p):
    row = float(np.clip(myprio - oprio, -1.0, 1.0))
    if row < 0:
        r2 = math.sqrt(-row)
        w = -r2
        my_vel = myvel
        other_vel = ovel + r2 * (opref - ovel)
    elif row > 0:
        r2 = math.sqrt(row)
        w = r2
        my_vel = myvel + r2 * (mypref - myvel)
        other_vel = ovel
    else:
        w = 0.0
        my_vel, other_vel = myvel, ovel
    weight = 1.0 - w
    fut = mypos + my_vel * t_i
    ofut = opos + other_vel * t_i
    d_ij = fut - ofut
    dist = float(np.linalg.norm(d_ij))
    if weight > 1.0:
        pref_speed = float(np.linalg.norm(opref))
        interpolate = True
        if pref_speed < 1e-4:
            cr = mypos - opos
            perp = np.array([-cr[1], cr[0]])
            if perp @ myvel < 0:
                perp = -perp
        else:
            pd = opref
            if pd @ d_ij > 0:
                perp = np.array([-pd[1], pd[0]])
                if perp @ d_ij < 0:
                    perp = -perp
            else:
                interpolate = False
                perp = None
        if interpolate:
            st = abs(perp[0] * d_ij[1] - perp[1] * d_ij[0])
            st = min(st, 1.0)
            d_ij = slerp_oracle(weight - 1.0, d_ij, perp, st)
    dn = d_ij / np.linalg.norm(d_ij)
    sd = dist - 2.0 * p["agent_radius"]
    mag = weight * p["agent_scale"] * float(np.linalg.norm(my_vel - other_vel)) / t_i
    mag = min(mag, 1e15)
    return dn * (mag * math.exp(-sd / p["force_distance"]))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_zanlungo_matches_scalar_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 12
    pos = rng.uniform(-10, 10, (n, 2))
    vel = rng.uniform(-2, 2, (n, 2))
    pref = rng.uniform(-2, 2, (n, 2))
    prio = rng.permutation(n).astype(float)
    eye = rng.uniform(5, 25, (n,))
    alive = rng.random(n) > 0.15
    rec = rng.uniform(-2, 2, (n, 2))
    pd = dict(agent_scale=1.3, force_distance=4.0, agent_mass=2.0, agent_radius=0.8)

    params = ZanlungoParams(
        agent_scale=jp(pd["agent_scale"]),
        obstacle_scale=jp(1.0),
        reaction_time=jp(0.0),
        force_distance=jp(pd["force_distance"]),
        agent_mass=jp(pd["agent_mass"]),
        agent_radius=jp(pd["agent_radius"]),
    )

    nbr = brute_neighbors(jp(pos), jp(eye), jnp.asarray(alive))
    got = np.asarray(
        zanlungo_velocity(
            params, jp(pos), jp(vel), jp(pref), jp(pref), jp(prio),
            nbr.idx, nbr.valid, jp(rec),
        )
    )

    valid = np.asarray(nbr.valid)
    for i in range(n):
        nbrs = [j for j in range(n) if valid[i, j]]
        t_i = min(
            (ttc_oracle(vel[j] - vel[i], pos[j] - pos[i], pd["agent_radius"])
             for j in nbrs),
            default=math.inf,
        )
        force = np.zeros(2)
        if math.isfinite(t_i):
            for j in nbrs:
                force += force_oracle(
                    pos[i], vel[i], pref[i], prio[i],
                    pos[j], vel[j], pref[j], prio[j], t_i, pd,
                )
        want = rec[i] + force / pd["agent_mass"]
        np.testing.assert_allclose(got[i], want, rtol=1e-9, atol=1e-9,
                                   err_msg=f"agent {i}")


def test_no_neighbors_passthrough():
    """t_i == inf -> recommended velocity unchanged (zanlungo.rs:211-216)."""
    n = 4
    pos = jp([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0], [100.0, 100.0]])
    params = ZanlungoParams(*(jp(x) for x in (1.0, 1.0, 0.0, 4.0, 2.0, 0.5)))
    eye = jnp.full((n,), 5.0, jnp.float64)  # nobody in sight
    alive = jnp.ones((n,), bool)
    nbr = brute_neighbors(pos, eye, alive)
    rec = jp([[1.0, 2.0]] * n)
    vel = zanlungo_velocity(
        params, pos, jnp.zeros((n, 2), jnp.float64), jnp.zeros((n, 2), jnp.float64),
        jnp.zeros((n, 2), jnp.float64), jnp.arange(n, dtype=jnp.float64),
        nbr.idx, nbr.valid, rec,
    )
    np.testing.assert_allclose(np.asarray(vel), np.asarray(rec))


def _run_chunked(chunk):
    from rmf_crowdsim_tpu import GridConfig, SimConfig, Simulation, ParityVelocity
    from rmf_crowdsim_tpu.models.local import Zanlungo

    cfg = SimConfig(capacity=64,
                    grid=GridConfig(64.0, 64.0, 4.0, (-32.0, -32.0)),
                    neighbor_backend="grid", max_per_cell=64,
                    max_eyesight=4.0, dtype="float64")
    sim = Simulation(cfg)
    hl = ParityVelocity((1.0, 0.3))
    lp = Zanlungo(1.0, 1.0, 0.0, 2.0, 2.0, 0.25, force_chunk=chunk)
    rng = np.random.default_rng(5)
    pts = rng.uniform(-30, 30, (48, 2))
    sim.add_agents([tuple(p) for p in pts], hl, lp, 4.0)
    for _ in range(5):
        sim.step(0.1)
    return {k: v.position for k, v in sim.agents.items()}


def test_chunked_force_pass_matches():
    """Zanlungo(force_chunk=c) must equal the unchunked pass."""
    a = _run_chunked(0)
    b = _run_chunked(16)
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=0, atol=0)


def test_chunked_force_pass_pads_nondividing_chunk():
    """A force_chunk that does not divide the capacity must still run
    chunked (padded with invalid rows, sliced off) and match the
    unchunked pass bitwise — regression: the old code silently fell
    back to the unchunked [N, K] materialization."""
    a = _run_chunked(0)
    b = _run_chunked(24)  # 64 % 24 != 0 -> pad 8 rows
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=0, atol=0)
