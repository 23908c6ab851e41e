"""Measured per-shard cost proxy for the D-device world-sharded engine.

The honest-ceiling argument (DESIGN_NOTES.md) projects multi-chip 1M
throughput as per-shard work ~ (cols_per + 2H)/tx of the single-chip
step.  This script MEASURES that per-shard workload on the one real
chip: the 1M bench scene's geometry (tile 5.3, bucket 32, density
0.625 /m^2) cut to one shard's extended kernel block — cols_per + 4
halo tile columns wide, full height, agents filling it at bench
density — stepped by the production general rollout.

What it captures: the shard's full presort/pack/kernel/unbucket/spill
work INCLUDING the halo columns its kernel processes.  What it omits:
the two ppermute halo exchanges (~10-20 MB/step over ICI, sub-ms on
v5e) and the migration pass, so read it as a lower bound on per-shard
step time and the implied D-device steps/s as an upper bound — but a
MEASURED one, replacing the purely analytic ~1/D scaling claim.

Usage: python perf/shard_proxy.py [D ...]   (default 8)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _bench_config  # noqa: E402

N_WORLD = 1_000_000


def shard_scene(d: int):
    """Build the one-shard proxy scene for the 1M bench world split
    over ``d`` devices (parallel/worldstep.py geometry: tx padded to a
    multiple of d, cols_per = tx/d, H = 2 halo columns per side)."""
    import dataclasses

    from rmf_crowdsim_tpu import (
        GridConfig, ParityVelocity, SimParams, Zanlungo, make_state,
    )
    from rmf_crowdsim_tpu.core.step import build_rollout
    from rmf_crowdsim_tpu.ops.zanlungo_pallas import BucketConfig

    world = _bench_config(N_WORLD)
    bcfg = BucketConfig.create(
        world.grid.width, world.grid.height, world.grid.offset,
        world.max_eyesight, bucket=world.bucket_capacity,
        strip_tiles=world.strip_tiles, sub_tiles=world.sub_tiles,
        tile_size=world.bucket_tile_size or None,
    )
    tx = bcfg.tx + (-bcfg.tx) % d
    cols_per, h = tx // d, 2
    ext_cols = cols_per + 2 * h
    tile = bcfg.tile_size
    width = ext_cols * tile
    height = world.grid.height
    # Agents fill the extended block at world density (the shard's own
    # region plus the halo rows it packs and its kernel processes).
    n = int(round(N_WORLD * (ext_cols * tile * height)
                  / (world.grid.width * world.grid.height)))
    n = (n + 7) // 8 * 8
    cfg = dataclasses.replace(
        world, capacity=n,
        grid=GridConfig(width=width, height=height, cell_size=2.0,
                        offset=(0.0, world.grid.offset[1])),
        spill_capacity=max(128, n // 4096),
    )
    hl = ParityVelocity((1.0, 0.0))
    lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.25,
                  force_cap=20.0)
    rollout = build_rollout(cfg, [hl], [lp])
    state = make_state(cfg)
    rng = np.random.default_rng(0)
    f = cfg.jdtype
    pos = np.stack([rng.uniform(1.0, width - 1.0, n),
                    rng.uniform(world.grid.offset[1] + 1.0,
                                world.grid.offset[1] + height - 1.0, n)],
                   axis=-1)
    state = state.replace(
        position=jnp.asarray(pos, f),
        eyesight=jnp.full((n,), 2.0, f),
        alive=jnp.ones((n,), jnp.bool_),
        uid=jnp.arange(n, dtype=jnp.int32),
        hl_idx=jnp.zeros((n,), jnp.int32),
        lp_idx=jnp.zeros((n,), jnp.int32),
        priority=jnp.arange(n, dtype=f),
        next_uid=jnp.asarray(n, jnp.int32),
    )
    params = SimParams(hl=(hl.init_params(),), lp=(lp.init_params(),),
                       sources=None)
    return rollout, params, state, n, ext_cols, tx


def main():
    ds = [int(x) for x in sys.argv[1:]] or [8]
    print(f"device: {jax.devices()[0]}", flush=True)
    for d in ds:
        rollout, params, state, n, ext_cols, tx = shard_scene(d)
        run = jax.jit(rollout, static_argnums=(3,))
        n_steps = 20
        t0 = time.time()
        st, counters = run(params, state, 1.0 / 60.0, n_steps)
        assert float(st.sim_time) > 0
        comp = time.time() - t0
        trunc = int(np.max(np.asarray(counters.neighbor_truncated)))
        assert trunc == 0, f"proxy scene truncates {trunc}"
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            st, _ = run(params, state, 1.0 / 60.0, n_steps)
            _ = float(st.sim_time)
            best = min(best, time.perf_counter() - t0)
        ms = best / n_steps * 1e3
        print(f"D={d}: shard block {ext_cols}/{tx} tile cols, {n} agents"
              f" -> {ms:.2f} ms/step per shard "
              f"(implied {1e3 / ms:.1f} steps/s at D={d}, halo exchange"
              f" excluded)  [compile {comp:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
