"""Decompose the world-sharded engine's per-shard tax (round-5).

The D=10 tolerance-mode shard body measures 18.9 ms/step while the SAME
scene through the plain single-chip rollout (perf/shard_proxy.py) is
9.6 — ~9.3 ms of engine tax.  This probe brackets where it lands using
only config-level variants (no code ablation):

  world:tol        the bench extra (bench.time_shard_proxy, tolerance)
  world:tol:nosp   spill_capacity=0 — no spill exchange/tiers/patch
                   (1-device proxy has no migrations/spawns, so the
                   carry stays valid; bucket-overflow truncation is
                   REPORTED, not asserted — physics narrows, timing
                   holds)
  world:bit        bitwise mode (the canonical double-sort tax)
  plain            single-chip production rollout, same scene
  plain:nosp       single-chip rollout, spill_capacity=0

Deltas: (world:tol - world:tol:nosp) = world spill machinery;
(plain - plain:nosp) = single-chip spill patch at this scale;
(world:tol:nosp - plain:nosp) = migrate + halo splice + frame edits +
transpose fallback + psum bookkeeping — the irreducible engine body.

Usage: python perf/world_tax.py [D]   (default 10)
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


def build(d: int, engine: str, spill: bool):
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
    n = int(round(N_WORLD * (ext_cols * tile * height)
                  / (world.grid.width * world.grid.height)))
    n = (n + 7) // 8 * 8
    cfg = dataclasses.replace(
        world, capacity=n,
        grid=GridConfig(width=width, height=height, cell_size=2.0,
                        offset=(0.0, world.grid.offset[1])),
        spill_capacity=(max(128, n // 4096) if spill else 0),
        on_truncation="ignore",
        sharding_invariance=(engine if engine in ("bitwise", "tolerance")
                             else "bitwise"),
    )
    hl = ParityVelocity((1.0, 0.0))
    lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.25,
                  force_cap=20.0)
    if engine == "plain":
        # build_rollout returns an UNJITTED callable (build_world_rollout
        # jits internally) — wrap it or the plain baseline measures eager
        # dispatch (238 ms/step instead of ~10).
        rollout = jax.jit(build_rollout(cfg, [hl], [lp]),
                          static_argnums=(3,))
    else:
        from rmf_crowdsim_tpu.parallel.worldstep import build_world_rollout
        mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:1]),
                                 ("world_x",))
        rollout = build_world_rollout(cfg, [hl], [lp], mesh)
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
    return rollout, params, state, n


def measure(tag, d, engine, spill):
    rollout, params, state, n = build(d, engine, spill)
    n_steps = 20

    def fresh():
        return jax.tree.map(jnp.copy, state)

    t0 = time.time()
    st, counters = rollout(params, fresh(), 1.0 / 60.0, n_steps)
    assert float(st.sim_time) > 0
    comp = time.time() - t0
    trunc = int(np.max(np.asarray(counters.neighbor_truncated)))
    best = 1e9
    for _ in range(3):
        s0 = fresh()
        _ = float(s0.position[0, 0])
        t0 = time.perf_counter()
        st, _c = rollout(params, s0, 1.0 / 60.0, n_steps)
        _ = float(st.sim_time)
        best = min(best, time.perf_counter() - t0)
    ms = best / n_steps * 1e3
    print(f"{tag:16s}: {ms:7.2f} ms/step  trunc/step={trunc}  "
          f"[n={n}, compile {comp:.0f}s]", flush=True)
    return ms


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"device: {jax.devices()[0]}  D={d}", flush=True)
    wt = measure("world:tol", d, "tolerance", True)
    wtn = measure("world:tol:nosp", d, "tolerance", False)
    wb = measure("world:bit", d, "bitwise", True)
    p = measure("plain", d, "plain", True)
    pn = measure("plain:nosp", d, "plain", False)
    print(f"\nworld spill machinery : {wt - wtn:6.2f} ms")
    print(f"plain spill patch     : {p - pn:6.2f} ms")
    print(f"engine body tax       : {wtn - pn:6.2f} ms "
          f"(migrate+halo+edits+transpose+psums)")
    print(f"canonical-sort tax    : {wb - wt:6.2f} ms (bitwise extra)")


if __name__ == "__main__":
    main()
