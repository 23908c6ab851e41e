"""High device-count validation for the world-sharded engine (VERDICT r4
item 6): run the streaming-scene D-vs-1 parity checks at D = 16 (and any
--d), in BOTH sharding_invariance modes, on a virtual CPU mesh — and
print the halo-overhead table for the bench 1M world across D.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=16 \
        python tools/validate_highD.py --d 16
    python tools/validate_highD.py --table-only
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def halo_table(n_world: int = 1_000_000):
    """Halo fraction of the per-shard extended kernel block vs D for the
    bench world (the kernel cost scales with ext block slots; owned work
    scales with cols_per)."""
    import numpy as np

    from bench import _bench_config
    from rmf_crowdsim_tpu.ops.zanlungo_pallas import BucketConfig

    cfg = _bench_config(n_world)
    b = BucketConfig.create(
        cfg.grid.width, cfg.grid.height, cfg.grid.offset,
        cfg.max_eyesight, bucket=cfg.bucket_capacity,
        strip_tiles=cfg.strip_tiles, sub_tiles=cfg.sub_tiles,
        tile_size=cfg.bucket_tile_size or None,
    )
    h = 2  # spill mode: 2 halo columns per side
    print(f"bench world: tx={b.tx} tile columns (tile {b.tile_size} m), "
          f"H={h} halo cols/side")
    print(f"{'D':>4} {'tx_pad':>7} {'cols/shard':>10} {'halo_frac':>10} "
          f"{'agents/shard':>12}")
    for d in (4, 8, 10, 16, 20, 32, 40, 64):
        tx = b.tx + (-b.tx) % d
        cols = tx // d
        frac = 2 * h / (cols + 2 * h)
        print(f"{d:>4} {tx:>7} {cols:>10} {frac:>10.1%} "
              f"{n_world // d:>12,}")


def validate(d: int):
    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    assert len(jax.devices()) >= d, (
        f"need {d} devices: set XLA_FLAGS="
        f"--xla_force_host_platform_device_count={d}"
    )
    from test_worldstep import run_world

    # Bitwise: D-vs-1 must be EXACTLY equal.  capacity must divide D and
    # hold the steady-state population (3 sources x ~16 steps/region x
    # regions shrink with D, so 256 is ample).
    ab, cb, _ = run_world(d, capacity=256)
    a1, c1, _ = run_world(1, capacity=256)
    assert ab.keys() == a1.keys() and len(ab) > 20
    for k in ab:
        assert ab[k] == a1[k], (k, ab[k], a1[k])
    assert int(np.sum(np.asarray(cb.migrated))) > 0
    assert int(np.sum(np.asarray(cb.arrival_dropped))) == 0
    print(f"bitwise {d}-vs-1: EXACT over {len(ab)} agents, "
          f"{int(np.sum(np.asarray(cb.migrated)))} migrations")

    # Tolerance (rider path): allclose + exact lifecycle counters.
    at, ct, _ = run_world(d, invariance="tolerance", tile=4.0,
                          capacity=512, spill=32)
    a1t, c1t, _ = run_world(1, invariance="tolerance", tile=4.0,
                            capacity=512, spill=32)
    assert at.keys() == a1t.keys()
    for k in at:
        np.testing.assert_allclose(
            np.asarray(at[k]), np.asarray(a1t[k]), rtol=1e-5, atol=1e-5,
            err_msg=str(k),
        )
    for name in ("n_alive", "n_spawned", "n_destroyed"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ct, name)), np.asarray(getattr(c1t, name)),
            err_msg=name,
        )
    n_steps = np.asarray(ct.resorted).shape[0]
    print(f"tolerance {d}-vs-1: allclose over {len(at)} agents; "
          f"resorts {int(np.sum(np.asarray(ct.resorted)))} "
          f"of {d * n_steps} shard-steps")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=16)
    ap.add_argument("--table-only", action="store_true")
    args = ap.parse_args()
    halo_table()
    if not args.table_only:
        validate(args.d)
