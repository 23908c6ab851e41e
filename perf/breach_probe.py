"""Skin-breach statistics on the bench scene (round-5 eviction sizing).

The skin-deferred presort re-sorts when the MAX displacement since the
last sort exceeds the margin — STATUS r4 says the violent bench scene
re-sorts every ~2nd step.  Eviction (riders on the exact spill patch,
as parallel/worldstep.py tolerance mode does for spawns/arrivals) would
instead evict just the breachers and re-sort on spill-buffer pressure —
worth building ONLY if the per-step breach count is small relative to
the spill capacity.  This probe steps the bench scene with
build_step(skin_mode=True) and prints, per step: resorted?, number of
agents displaced past the margin, and the p99.9/max displacement.

Usage: python perf/breach_probe.py [--n 1000000] [--steps 40]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from bench import build_bench, _bench_config
    from rmf_crowdsim_tpu.core.step import build_step
    from rmf_crowdsim_tpu.ops.zanlungo_pallas import BucketConfig

    # Reuse the bench scene builders but step manually with the
    # 4-argument skin step so the carry is visible.
    _, params, state = build_bench(args.n)
    cfg = _bench_config(args.n)
    if args.cpu:
        cfg = dataclasses.replace(cfg, pallas_interpret=True)
    bcfg = BucketConfig.create(
        cfg.grid.width, cfg.grid.height, cfg.grid.offset,
        cfg.max_eyesight, bucket=cfg.bucket_capacity,
        strip_tiles=cfg.strip_tiles, sub_tiles=cfg.sub_tiles,
        tile_size=cfg.bucket_tile_size or None,
    )
    margin = (bcfg.tile_size - cfg.max_eyesight) / 2.0
    print(f"tile {bcfg.tile_size} eyesight {cfg.max_eyesight} "
          f"margin {margin:.3f} spill_cap {cfg.spill_capacity}")

    from rmf_crowdsim_tpu import ParityVelocity, Zanlungo
    hl = ParityVelocity((1.0, 0.0))
    lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.25,
                  force_cap=20.0)
    step = build_step(cfg, [hl], [lp], skin_mode=True)
    assert step.skin_mode
    step = jax.jit(step, donate_argnums=(1,))

    n = cfg.capacity
    skin = dict(
        valid=jnp.zeros((), jnp.bool_),
        key=jnp.zeros((n,), jnp.int32),
        bpos=jnp.zeros((n,), jnp.int32),
        max_occ=jnp.zeros((), jnp.int32),
        n_over=jnp.zeros((), jnp.int32),
        ref=jnp.zeros((n, 2), cfg.jdtype),
        resorted=jnp.zeros((), jnp.bool_),
    )

    @jax.jit
    def breach_stats(state, skin):
        d = jnp.abs(state.position - skin["ref"])
        disp = jnp.max(d, axis=1)
        disp = jnp.where(state.alive, disp, 0.0)
        n_breach = jnp.sum((disp > margin).astype(jnp.int32))
        return n_breach, jnp.max(disp), jnp.percentile(disp, 99.9)

    dt = 1.0 / 60.0
    t0 = time.time()
    for t in range(args.steps):
        state, _ev, skin = step(params, state, dt, skin)
        nb, mx, p999 = breach_stats(state, skin)
        print(f"step {t:3d} resorted={int(skin['resorted'])} "
              f"breach_next={int(nb):6d} maxdisp={float(mx):7.3f} "
              f"p99.9={float(p999):6.3f}", flush=True)
    print(f"total {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
