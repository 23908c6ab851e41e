"""Checkpoint/resume: saving mid-run and restoring must reproduce the
exact same future trajectory (state includes the PRNG key and clock)."""

import numpy as np

from rmf_crowdsim_tpu import (
    ConstantVelocity,
    GridConfig,
    NoLocalPlan,
    PoissonCrowd,
    SimConfig,
    Simulation,
    SourceSink,
)


def make_sim():
    cfg = SimConfig(
        capacity=32,
        grid=GridConfig(100.0, 100.0, 5.0, (-50.0, -50.0)),
        neighbor_backend="brute",
        dtype="float64",
    )
    sim = Simulation(cfg, seed=3)
    hl = ConstantVelocity((1.0, 0.0))
    lp = NoLocalPlan()
    sim.add_source_sink(
        SourceSink(
            source=(0.0, 0.0), waypoints=[(10.0, 0.0)], radius_sink=1.0,
            crowd_generator=PoissonCrowd(1.5), high_level_planner=hl,
            local_planner=lp, agent_eyesight_range=5.0,
        )
    )
    return sim


def snapshot(sim):
    return {k: v.position for k, v in sim.agents.items()}


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    sim = make_sim()
    for _ in range(7):
        sim.step(0.5)
    sim.save(path)
    t_saved = sim.sim_time

    # Branch A: continue in place.
    for _ in range(5):
        sim.step(0.5)
    a = snapshot(sim)

    # Branch B: fresh session restored from the checkpoint.
    sim2 = make_sim()
    sim2.load(path)
    assert abs(sim2.sim_time - t_saved) < 1e-9
    for _ in range(5):
        sim2.step(0.5)
    b = snapshot(sim2)

    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_capacity_mismatch_rejected(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    sim = make_sim()
    sim.save(path)
    cfg2 = SimConfig(capacity=64, neighbor_backend="brute", dtype="float64")
    sim2 = Simulation(cfg2)
    import pytest

    with pytest.raises(ValueError):
        sim2.load(path)


def test_orbax_backend_roundtrip(tmp_path):
    """The orbax checkpoint backend (sharded/async-capable) restores the
    exact state."""
    import numpy as np

    from rmf_crowdsim_tpu.utils.checkpoint import (
        load_state_orbax,
        save_state_orbax,
    )

    sim = make_sim()
    for _ in range(4):
        sim.step(0.5)
    path = str(tmp_path / "orbax_ckpt")
    save_state_orbax(path, sim.state)
    restored = load_state_orbax(path)
    np.testing.assert_array_equal(np.asarray(restored.position),
                                  np.asarray(sim.state.position))
    np.testing.assert_array_equal(np.asarray(restored.uid),
                                  np.asarray(sim.state.uid))
    np.testing.assert_array_equal(np.asarray(restored.rng_key),
                                  np.asarray(sim.state.rng_key))
