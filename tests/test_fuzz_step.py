"""Property fuzzing: full-step trajectory parity across neighbor backends
on random scenes (the strongest backend-equivalence evidence — grid and
grid_pallas must be indistinguishable from brute for any legal config).

The randomized sweep at the bottom is the VERDICT-r4 differential fuzz:
seeded random scenes x random CONFIGS (bucket geometry, presort, pack
kernel, spill capacity, fused vs patch spill repair,
commit_preferred_vel, integer_priorities, sources, despawn churn,
per-step vs scanned-rollout driver) asserting
grid_pallas == brute within f32 summation-order tolerance in interpret
mode.  The presort-sentinel and halo-frame bugs of rounds 2-3 were the
kind only randomized configs catch (both got past the deterministic
suites)."""

import numpy as np
import pytest

from rmf_crowdsim_tpu import (
    GridConfig,
    MonotonicCrowd,
    ParityVelocity,
    PoissonCrowd,
    SimConfig,
    Simulation,
    SourceSink,
    Zanlungo,
)

pytestmark = pytest.mark.slow  # randomized differential sweeps, ~22 min


def build(backend, seed, dtype="float32"):
    rng = np.random.default_rng(seed)
    cfg = SimConfig(
        capacity=64,
        grid=GridConfig(width=36.0, height=36.0, cell_size=3.0,
                        offset=(0.0, 0.0)),
        neighbor_backend=backend,
        max_per_cell=64,
        max_eyesight=3.0,
        bucket_capacity=16,
        strip_tiles=6,
        sub_tiles=6,
        pallas_interpret=True,
        dtype=dtype,
    )
    sim = Simulation(cfg, seed=seed)
    hl = ParityVelocity((1.0, 0.4))
    lp = Zanlungo(agent_scale=1.2, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.5, agent_mass=2.0, agent_radius=0.25,
                  force_cap=100.0)
    pts = rng.uniform(3.0, 33.0, (rng.integers(10, 30), 2))
    sim.add_agents([tuple(p) for p in pts], hl, lp,
                   agent_eyesight_range=float(rng.uniform(1.0, 3.0)))
    # A streaming source with a 2-waypoint chain exercising advancement.
    sim.add_source_sink(SourceSink(
        source=(2.0, 18.0),
        waypoints=[(18.0, 18.0), (34.0, 18.0)],
        radius_sink=1.5,
        crowd_generator=(PoissonCrowd(2.0) if seed % 2 else
                         MonotonicCrowd(1.0)),
        high_level_planner=hl, local_planner=lp,
        agent_eyesight_range=2.0,
    ))
    return sim


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_backends_agree_on_random_scenes(seed):
    sims = {b: build(b, seed) for b in ("brute", "grid", "grid_pallas")}
    for step in range(12):
        snaps = {}
        for b, sim in sims.items():
            sim.step(0.2)
            snaps[b] = {k: v.position for k, v in sim.agents.items()}
        assert snaps["brute"].keys() == snaps["grid"].keys() \
            == snaps["grid_pallas"].keys(), f"step {step}"
        for k in snaps["brute"]:
            np.testing.assert_allclose(
                snaps["grid"][k], snaps["brute"][k], rtol=2e-5, atol=2e-5,
                err_msg=f"grid vs brute, agent {k}, step {step}")
            np.testing.assert_allclose(
                snaps["grid_pallas"][k], snaps["brute"][k],
                rtol=2e-4, atol=2e-4,
                err_msg=f"grid_pallas vs brute, agent {k}, step {step}")


@pytest.mark.parametrize("seed", [0, 2])
def test_big_tile_bucket32_matches(seed):
    """Larger supertiles with bucket 32 (the perf configuration) produce
    the same trajectories as brute force."""
    def build32(backend):
        cfg = SimConfig(
            capacity=64,
            grid=GridConfig(width=36.0, height=36.0, cell_size=3.0,
                            offset=(0.0, 0.0)),
            neighbor_backend=backend,
            max_per_cell=64,
            max_eyesight=3.0,
            bucket_capacity=32,
            strip_tiles=4,
            sub_tiles=2,
            bucket_tile_size=6.0,
            pallas_interpret=True,
            dtype="float32",
        )
        rng = np.random.default_rng(seed)
        sim = Simulation(cfg, seed=seed)
        hl = ParityVelocity((1.0, 0.4))
        lp = Zanlungo(1.2, 1.0, 0.0, 1.5, 2.0, 0.25, force_cap=100.0)
        pts = rng.uniform(3.0, 33.0, (24, 2))
        sim.add_agents([tuple(p) for p in pts], hl, lp, 3.0)
        return sim

    a = build32("brute")
    b = build32("grid_pallas")
    for step in range(10):
        a.step(0.2)
        b.step(0.2)
        pa = {k: v.position for k, v in a.agents.items()}
        pb = {k: v.position for k, v in b.agents.items()}
        assert pa.keys() == pb.keys()
        for k in pa:
            np.testing.assert_allclose(pb[k], pa[k], rtol=2e-4, atol=2e-4,
                                       err_msg=f"agent {k} step {step}")


# ---------------------------------------------------------------------------
# Randomized differential sweep (random scene x random config per seed)
# ---------------------------------------------------------------------------


def _random_config(rng, backend):
    bucket = int(rng.choice([16, 32]))
    sub = 128 // bucket - 2
    strip = sub * int(rng.integers(1, 3))
    eye = float(rng.uniform(1.8, 3.2))
    world = float(rng.uniform(26.0, 44.0))
    return SimConfig(
        capacity=64,
        grid=GridConfig(width=world, height=world,
                        cell_size=float(rng.uniform(2.0, 4.0)),
                        offset=(0.0, 0.0)),
        neighbor_backend=backend,
        max_per_cell=64,
        max_eyesight=eye,
        bucket_capacity=bucket,
        strip_tiles=strip,
        sub_tiles=sub,
        # For grid_dense this doubles as the dense tile size (> eyesight
        # activates the skin-deferred carried sort under scanned
        # rollouts).
        bucket_tile_size=(0.0 if rng.random() < 0.5
                          else eye * float(rng.uniform(1.0, 1.7))),
        use_pack_kernel=bool(rng.random() < 0.5),
        presort=bool(rng.random() < 0.5),
        # Spill capacity >= capacity: overflow is always repaired
        # EXACTLY, so brute parity holds even when buckets overflow.
        spill_capacity=int(rng.choice([64, 128])),
        # Randomly exercise both repair paths (fused fourth-segment vs
        # the spill_patch window recompute).
        fused_spills=bool(rng.random() < 0.5),
        # Dual-row compacted tier (the production bench setting) vs the
        # shared-union-only dispatch.
        dual_row=bool(rng.random() < 0.5),
        # grid_dense: col_cap headroom floor (256 rows) always covers the
        # 64-agent scenes, so overflow can't fire here; on_truncation
        # would surface it loudly if it ever did.
        dense_col_headroom=float(rng.uniform(1.5, 2.5)),
        commit_preferred_vel=bool(rng.random() < 0.5),
        integer_priorities=bool(rng.random() < 0.5),
        pallas_interpret=True,
        dtype="float32",
        on_truncation="raise",   # any unrepaired truncation fails loudly
    ), world, eye


def _random_scene(sim, rng, world, eye, hl, lp):
    n = int(rng.integers(8, 26))
    margin = 3.0
    pts = rng.uniform(margin, world - margin, (n, 2))
    # Occasional dense cluster to force bucket overflow into the exact
    # spill-repair path.
    if rng.random() < 0.4:
        center = rng.uniform(world * 0.3, world * 0.7, (2,))
        pts[: n // 2] = center + rng.uniform(-0.6, 0.6, (n // 2, 2))
    sim.add_agents([tuple(p) for p in pts], hl, lp,
                   agent_eyesight_range=float(rng.uniform(1.2, eye)))
    n_sources = int(rng.integers(0, 3))
    for s in range(n_sources):
        gen = (PoissonCrowd(float(rng.uniform(0.5, 3.0)))
               if rng.random() < 0.5
               else MonotonicCrowd(float(rng.uniform(0.5, 1.5))))
        n_wp = int(rng.integers(1, 4))
        wps = [tuple(rng.uniform(margin, world - margin, (2,)))
               for _ in range(n_wp)]
        sim.add_source_sink(SourceSink(
            source=tuple(rng.uniform(margin, world - margin, (2,))),
            waypoints=wps,
            radius_sink=float(rng.uniform(0.8, 1.8)),
            crowd_generator=gen,
            high_level_planner=hl, local_planner=lp,
            agent_eyesight_range=float(rng.uniform(1.2, eye)),
            loop_forever=bool(rng.random() < 0.3),
        ))


def _build_pair(seed, fast_backend="grid_pallas"):
    """Two sims (brute oracle / fast backend) of the SAME random scene
    and the SAME random fast-side knobs; returns (sims, rng)."""
    rng = np.random.default_rng(10_000 + seed)
    cfg_gp, world, eye = _random_config(rng, fast_backend)
    import dataclasses
    cfg_br = dataclasses.replace(cfg_gp, neighbor_backend="brute")
    hl = ParityVelocity((float(rng.uniform(0.5, 1.3)),
                         float(rng.uniform(-0.6, 0.6))))
    lp = Zanlungo(agent_scale=float(rng.uniform(0.8, 2.0)),
                  obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=float(rng.uniform(1.0, 2.0)),
                  agent_mass=float(rng.uniform(1.0, 3.0)),
                  agent_radius=float(rng.uniform(0.15, 0.35)),
                  force_cap=float(rng.uniform(20.0, 200.0)))
    sims = {}
    for name, cfg in (("brute", cfg_br), (fast_backend, cfg_gp)):
        scene_rng = np.random.default_rng(20_000 + seed)
        sim = Simulation(cfg, seed=seed)
        _random_scene(sim, scene_rng, world, eye, hl, lp)
        sims[name] = sim
    return sims, rng


def _positions(sim):
    return {k: v.position for k, v in sim.agents.items()}


def _assert_match(pa, pb, label):
    assert pa.keys() == pb.keys(), (
        f"{label}: alive sets differ "
        f"(brute-only {sorted(set(pa) - set(pb))}, "
        f"pallas-only {sorted(set(pb) - set(pa))})"
    )
    for k in pa:
        np.testing.assert_allclose(
            pb[k], pa[k], rtol=2e-4, atol=2e-4,
            err_msg=f"{label}: agent {k}")


def _run_sweep(sims, rng, fast):
    dt = float(rng.uniform(0.12, 0.28))
    use_run = rng.random() < 0.35  # scanned rollout (skin-presort path)
    if use_run:
        n_steps = int(rng.integers(4, 9))
        counters = {b: s.run(n_steps, dt) for b, s in sims.items()}
        for field in ("n_alive", "n_spawned", "n_destroyed",
                      "n_waypoint_reached"):
            np.testing.assert_array_equal(
                np.asarray(getattr(counters[fast], field)),
                np.asarray(getattr(counters["brute"], field)),
                err_msg=f"rollout counter {field}")
        _assert_match(_positions(sims["brute"]),
                      _positions(sims[fast]),
                      f"after run({n_steps})")
    else:
        for step in range(8):
            for sim in sims.values():
                sim.step(dt)
            _assert_match(_positions(sims["brute"]),
                          _positions(sims[fast]),
                          f"step {step}")
            # Despawn churn: remove one common alive agent every 3rd
            # step (host-level remove_agents, lib.rs:176-192).
            if step % 3 == 2:
                common = sorted(set(_positions(sims["brute"]))
                                & set(_positions(sims[fast])))
                if common:
                    victim = common[int(rng.integers(0, len(common)))]
                    for sim in sims.values():
                        sim.remove_agents(victim)


@pytest.mark.parametrize("seed", list(range(24)))
def test_randomized_config_sweep(seed):
    sims, rng = _build_pair(seed)
    _run_sweep(sims, rng, "grid_pallas")


@pytest.mark.parametrize("seed", list(range(12)))
def test_randomized_config_sweep_dense(seed):
    """The same differential sweep against the dense (bucket-free)
    kernel backend: random tile size (> eyesight activates the carried
    skin sort), dual_row, integer priorities, col_headroom, sources,
    despawn churn, per-step vs scanned-rollout driver."""
    sims, rng = _build_pair(seed, fast_backend="grid_dense")
    _run_sweep(sims, rng, "grid_dense")
