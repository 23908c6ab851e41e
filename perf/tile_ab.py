"""A/B bucket tile size on the 1M bench scene (production rollout).

The spill machinery got cheap in round 3 (Pallas spill-group kernel +
affected-only scatter), which may have moved the optimal geometry:
bigger tiles cut slots (= kernel pair work, slots = area/tile^2 *
bucket) but fatten the Poisson overflow tail the spill patch absorbs.
DESIGN_NOTES "Settled questions" pinned tile 5.3 when spills cost more;
this re-asks with the round-3 spill costs.

Usage: python perf/tile_ab.py [tile ...]   (default 5.3 5.6)
"""

from __future__ import annotations

import dataclasses
import sys

import jax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402

N = 1_000_000
_orig = bench._bench_config


def main():
    tiles = [float(t) for t in sys.argv[1:]] or [5.3, 5.6]
    print(f"device: {jax.devices()[0]}", flush=True)
    for tile in tiles:
        def patched(n, dtype="float32", backend="grid_pallas", _t=tile):
            cfg = _orig(n, dtype, backend)
            # Overflow grows with tile^2 * bucket Poisson tail; give the
            # tiered patch headroom (clean steps only pay the live tier).
            return dataclasses.replace(
                cfg, bucket_tile_size=_t,
                spill_capacity=max(cfg.spill_capacity, 1024),
            )

        bench._bench_config = patched
        try:
            sps, p50 = bench.time_steps(N, n_steps=20)
            print(f"tile {tile:4.1f}: {p50:7.3f} ms/step  "
                  f"({sps:.2f} steps/s)", flush=True)
        except AssertionError as e:
            print(f"tile {tile:4.1f}: FAILED {e}", flush=True)
        finally:
            bench._bench_config = _orig


if __name__ == "__main__":
    main()
