"""Full-step parity: the grid_pallas (fused Zanlungo kernel) and
grid_dense (bucket-free kernel, ops/zanlungo_dense.py) backends must
produce the same trajectories as the grid backend on a Zanlungo scene."""

import numpy as np
import pytest

from rmf_crowdsim_tpu import (
    GridConfig,
    MonotonicCrowd,
    ParityVelocity,
    SimConfig,
    Simulation,
    SourceSink,
    Zanlungo,
)


def build(backend, dual_row=False, tile_size=0.0):
    cfg = SimConfig(
        capacity=48,
        grid=GridConfig(width=24.0, height=24.0, cell_size=2.0,
                        offset=(0.0, 0.0)),
        neighbor_backend=backend,
        max_per_cell=48,
        max_eyesight=2.0,
        bucket_capacity=16,
        strip_tiles=6,
        sub_tiles=6,
        dual_row=dual_row,
        bucket_tile_size=tile_size,
        pallas_interpret=True,
        dtype="float32",
    )
    sim = Simulation(cfg)
    hl = ParityVelocity((1.0, 0.0))
    lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.2)
    rng = np.random.default_rng(42)
    pts = rng.uniform(4.0, 20.0, (24, 2))
    sim.add_agents([tuple(p) for p in pts], hl, lp, agent_eyesight_range=2.0)
    sim.add_source_sink(
        SourceSink(
            source=(2.0, 12.0), waypoints=[(22.0, 12.0)], radius_sink=1.0,
            crowd_generator=MonotonicCrowd(1.0), high_level_planner=hl,
            local_planner=lp, agent_eyesight_range=2.0,
        )
    )
    return sim


@pytest.mark.slow
@pytest.mark.parametrize("dual_row", [False, True])
def test_grid_pallas_matches_grid_trajectories(dual_row):
    sim_a = build("grid")
    sim_b = build("grid_pallas", dual_row=dual_row)
    for step in range(10):
        sim_a.step(0.1)
        sim_b.step(0.1)
        pa = {k: v.position for k, v in sim_a.agents.items()}
        pb = {k: v.position for k, v in sim_b.agents.items()}
        assert pa.keys() == pb.keys()
        for k in pa:
            np.testing.assert_allclose(pa[k], pb[k], rtol=1e-4, atol=1e-4,
                                       err_msg=f"agent {k} step {step}")


@pytest.mark.slow
@pytest.mark.parametrize("dual_row", [False, True])
def test_grid_dense_matches_grid_trajectories(dual_row):
    sim_a = build("grid")
    sim_b = build("grid_dense", dual_row=dual_row)
    for step in range(10):
        sim_a.step(0.1)
        sim_b.step(0.1)
        pa = {k: v.position for k, v in sim_a.agents.items()}
        pb = {k: v.position for k, v in sim_b.agents.items()}
        assert pa.keys() == pb.keys()
        for k in pa:
            np.testing.assert_allclose(pa[k], pb[k], rtol=1e-4, atol=1e-4,
                                       err_msg=f"agent {k} step {step}")


@pytest.mark.slow
def test_grid_dense_scanned_rollout_with_skin():
    """grid_dense under Simulation.run (lax.scan rollout): tile 4.0 >
    eyesight 2.0 gives a positive skin margin, so the scan carries the
    sort order across steps and re-sorts only on breach/spawn — final
    trajectories must still match the per-step grid backend."""
    sim_a = build("grid")
    sim_b = build("grid_dense", tile_size=4.0)
    for _ in range(10):
        sim_a.step(0.1)
    counters = sim_b.run(10, 0.1)
    assert counters.n_alive.shape == (10,)
    pa = {k: v.position for k, v in sim_a.agents.items()}
    pb = {k: v.position for k, v in sim_b.agents.items()}
    assert pa.keys() == pb.keys()
    for k in pa:
        np.testing.assert_allclose(pa[k], pb[k], rtol=1e-4, atol=1e-4,
                                   err_msg=f"agent {k}")
