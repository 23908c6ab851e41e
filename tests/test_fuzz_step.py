"""Property fuzzing: full-step trajectory parity across neighbor backends
on random scenes (the strongest backend-equivalence evidence — grid and
grid_pallas must be indistinguishable from brute for any legal config)."""

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
