"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json north star): sim-steps/sec at 1M Zanlungo agents on
one chip, target >100.  ``vs_baseline`` is value / 100.

Also measures the smaller configs from BASELINE.md (1k / 100k) and p50 step
latency; those land in the ``extra`` field of the same JSON line.

Usage: ``python bench.py`` (runs on whatever jax.devices() offers — the
driver runs it on a real TPU chip).  ``python bench.py --n 100000`` to
override the headline scale.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Pallas kernel compiles through the remote TPU tunnel take minutes; the
# persistent cache makes repeat runs (and driver re-runs) instant.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _bench_config(n_agents: int, dtype: str = "float32",
                  backend: str = "grid_pallas"):
    from rmf_crowdsim_tpu import GridConfig, SimConfig

    # ~2.5 agents per cell at cell_size=2, eyesight=2: a dense crowd.
    area_per_agent = 1.6
    side = float(np.ceil(np.sqrt(n_agents * area_per_agent)))
    cell = 2.0
    side = float(np.ceil(side / cell) * cell)
    return SimConfig(
        capacity=n_agents,
        grid=GridConfig(width=side, height=side, cell_size=cell,
                        offset=(-side / 2, -side / 2)),
        neighbor_backend=backend,
        max_per_cell=16,
        max_eyesight=2.0,
        # Pair work scales with slots = area/tile^2 * bucket: big tiles +
        # bucket 32 run at ~55% fill (vs 31% for bucket 8 at
        # tile == eyesight) with overflow < 0.1% at this density.
        bucket_capacity=32,
        sub_tiles=2,
        strip_tiles=96,
        bucket_tile_size=5.3,
        use_pack_kernel=(backend == "grid_pallas"),
        # Poisson occupancy tails at this density overflow bucket 32 in
        # ~60 of 57k tiles per 1M agents; the spill patch repairs them
        # EXACTLY (ops/zanlungo_pallas.spill_patch) so the truncation
        # assertion below holds honestly.  Scaled with N (tiered by live
        # count, so oversizing costs nothing on clean steps).
        spill_capacity=max(128, n_agents // 4096),
        # Tile-sorted state across steps: one sort-with-payloads replaces
        # bucketize's argsort + feature gather + inverse scatter, makes
        # the unbucketize gather monotone, and enables the skin-deferred
        # sort (core/step.py skin_mode).
        presort=(backend in ("grid_pallas", "grid_dense")),
        # Bench priorities are the default agent uids (integers), so the
        # kernel may drop the right-of-way sqrt + slerp asin/sin
        # (ops/zanlungo_pallas._pair_force int_prio).
        integer_priorities=(backend in ("grid_pallas", "grid_dense")),
        # Dual-row compacted tier: ~99.9% of sub-blocks fit two 64-lane
        # half-unions at this density (perf/dualrow_ab.py: 44.0 vs 45.4
        # ms kernel-only at 1M); tolerance-level output differences.
        dual_row=(backend in ("grid_pallas", "grid_dense")),
        dtype=dtype,
    )


def build_bench(n_agents: int, dtype: str = "float32",
                backend: str = "grid_pallas"):
    """Dense-crowd Zanlungo scene at ``n_agents`` (BASELINE.json config 5:
    dense corridors stressing grid rebinning + force-kernel occupancy)."""
    from rmf_crowdsim_tpu import (
        ParityVelocity,
        SimParams,
        Zanlungo,
        make_state,
    )
    from rmf_crowdsim_tpu.core.step import build_rollout

    config = _bench_config(n_agents, dtype=dtype, backend=backend)
    side = config.grid.width
    hl = ParityVelocity((1.0, 0.0))
    # Chunk the XLA-backend force pass at large N so [N,K] temporaries
    # stay bounded (the Pallas backend never materializes them).
    chunk = 32_768 if (backend == "grid" and n_agents > 65_536) else 0
    # force_cap keeps initially-overlapping random pairs from being flung
    # at the reference's 1e15 clamp (see ZanlungoParams docs): the scene
    # stays physical over the benchmark horizon.  Compute cost is
    # identical either way.
    lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.25,
                  force_chunk=chunk, force_cap=20.0)
    rollout = build_rollout(config, [hl], [lp])

    state = make_state(config)
    rng = np.random.default_rng(0)
    lim = side / 2 - 1.0
    f = config.jdtype
    state = state.replace(
        position=jnp.asarray(
            rng.uniform(-lim, lim, size=(n_agents, 2)), f
        ),
        eyesight=jnp.full((n_agents,), 2.0, f),
        alive=jnp.ones((n_agents,), jnp.bool_),
        uid=jnp.arange(n_agents, dtype=jnp.int32),
        hl_idx=jnp.zeros((n_agents,), jnp.int32),
        lp_idx=jnp.zeros((n_agents,), jnp.int32),
        priority=jnp.arange(n_agents, dtype=f),
        next_uid=jnp.asarray(n_agents, jnp.int32),
    )
    params = SimParams(hl=(hl.init_params(),), lp=(lp.init_params(),),
                       sources=None)
    return rollout, params, state


def compiled_parity_check(n_agents: int = 4096, n_steps: int = 5):
    """On-device oracle-vs-fast-path gate (VERDICT r3 item 3): every
    kernel parity test runs interpret-mode on CPU, so a Mosaic lowering
    divergence (roll alignment, one-hot matmul exactness, the asin/sin
    polynomials) could ship invisibly into the timed numbers.  Before
    timing, roll a dense scene (uniform + a bucket-overflowing hotspot,
    so the spill path compiles and runs too) through the O(N^2) brute
    backend and the COMPILED grid_pallas backend and require allclose at
    the spill-patch tolerance.  Raises AssertionError on divergence."""
    outs = {}
    for backend in ("brute", "grid_pallas"):
        rollout, params, state = build_bench(n_agents, backend=backend)
        # Hotspot: ~48 agents inside one 5.3 m tile (> bucket 32) so the
        # compiled spill patch is exercised, not just compiled.
        pos = np.asarray(state.position).copy()
        rng = np.random.default_rng(7)
        pos[:48] = rng.uniform(0.0, 2.0, (48, 2)) + 10.0
        state = state.replace(position=jnp.asarray(pos, pos.dtype))
        run = jax.jit(rollout, static_argnums=(3,))
        st, counters = run(params, state, 1.0 / 60.0, n_steps)
        truncated = int(np.max(np.asarray(counters.neighbor_truncated)))
        assert truncated == 0, (
            f"parity scene truncates {truncated} on {backend}"
        )
        # Slot order is NOT comparable across backends: the presorted
        # grid_pallas path keeps state tile-sorted between steps
        # (core/step.py presort block) while brute keeps spawn order.
        # Agent identity is uid — align on it before comparing.
        order = np.argsort(np.asarray(st.uid))
        outs[backend] = np.asarray(st.position)[order]
    np.testing.assert_allclose(
        outs["grid_pallas"], outs["brute"], rtol=2e-4, atol=2e-4,
        err_msg="compiled grid_pallas diverges from brute oracle on-device",
    )
    return True


def time_shard_proxy(d: int = 10, n_steps: int = 20,
                     invariance: str = "bitwise"):
    """PROJECTED multi-chip evidence: one shard of the D-device
    world-sharded engine, measured VERBATIM on the one real chip.

    Runs parallel/worldstep.build_world_rollout on a 1-DEVICE mesh over
    a world sized to the D-shard's extended block (cols_per + 4 halo
    tile columns at bench density, fully populated) — so the timed step
    is the engine's actual shard body: canonical (tile, uid) re-sort,
    col-clipped bucketize + global-frame restore, halo splice, fused
    kernel over the extended block, exact spill machinery, migration
    compaction and the psum'd spawn/uid bookkeeping, with the
    collectives degenerate on one device.  What the number still
    EXCLUDES is the real ICI transfer time (two ppermute halo exchanges,
    ~10-20 MB/step, plus the small spill/migration messages) and any
    multi-controller launch skew — hence ``projected: True``.

    Returns {"d", "shard_agents", "ms_per_step",
    "implied_steps_per_sec", "projected", "note"}."""
    import dataclasses

    from rmf_crowdsim_tpu import GridConfig, ParityVelocity, SimParams, \
        Zanlungo, make_state
    from rmf_crowdsim_tpu.ops.zanlungo_pallas import BucketConfig
    from rmf_crowdsim_tpu.parallel.worldstep import build_world_rollout

    n_world = 1_000_000
    world = _bench_config(n_world)
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
    n = int(round(n_world * (ext_cols * tile * height)
                  / (world.grid.width * world.grid.height)))
    n = (n + 7) // 8 * 8
    cfg = dataclasses.replace(
        world, capacity=n,
        grid=GridConfig(width=width, height=height, cell_size=2.0,
                        offset=(0.0, world.grid.offset[1])),
        spill_capacity=max(128, n // 4096),
        sharding_invariance=invariance,
    )
    hl = ParityVelocity((1.0, 0.0))
    lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.25,
                  force_cap=20.0)
    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:1]), ("world_x",)
    )
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

    def fresh():
        return jax.tree.map(jnp.copy, state)  # rollout donates its state

    st, counters = rollout(params, fresh(), 1.0 / 60.0, n_steps)
    assert float(st.sim_time) > 0
    assert int(np.max(np.asarray(counters.neighbor_truncated))) == 0
    best = 1e9
    for _ in range(3):
        s0 = fresh()
        _ = float(s0.position[0, 0])  # sync the copy off the clock
        t0 = time.perf_counter()
        st, _c = rollout(params, s0, 1.0 / 60.0, n_steps)
        _ = float(st.sim_time)
        best = min(best, time.perf_counter() - t0)
    ms = best / n_steps * 1e3
    return {
        "d": d,
        "shard_agents": n,
        "sharding_invariance": invariance,
        "ms_per_step": round(ms, 2),
        "implied_steps_per_sec": round(1e3 / ms, 1),
        "projected": True,
        "note": ("world-engine shard body measured verbatim on a "
                 "1-device mesh; excludes real ICI transfer time "
                 "(2 ppermute halo exchanges ~10-20 MB/step) and "
                 "launch skew"),
    }


def time_steps(n_agents: int, n_steps: int = 20, reps: int = 3,
               backend: str = "grid_pallas"):
    """Returns (steps_per_sec, p50_step_ms) for the scene at n_agents.

    NOTE: sync via a host scalar fetch, NOT block_until_ready — through the
    axon TPU tunnel block_until_ready returns before remote execution
    finishes, producing fantasy timings."""
    rollout, params, state = build_bench(n_agents, backend=backend)
    run = jax.jit(rollout, static_argnums=(3,))
    # Warmup / compile; the float() fetch forces completion.
    st, counters = run(params, state, 1.0 / 60.0, n_steps)
    assert float(st.sim_time) > 0.0
    # The numbers only count if the physics is intact: zero agents may be
    # silently dropped from neighbor sets (cell/bucket overflow).
    truncated = int(np.max(np.asarray(counters.neighbor_truncated)))
    assert truncated == 0, (
        f"bench scene truncates {truncated} neighbor interactions/step — "
        f"occupancy exceeded the per-cell/bucket capacity"
    )
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        st, counters = run(params, state, 1.0 / 60.0, n_steps)
        _ = float(st.sim_time)
        times.append(time.perf_counter() - t0)
    best = min(times)
    return n_steps / best, (best / n_steps) * 1e3


def time_rmf_routing(n_agents: int = 10_000, n_steps: int = 20,
                     backend: str = "grid_pallas"):
    """BASELINE.md config 4: RMF building YAML + Zanlungo, multi-room
    routing at ~10k agents.  Returns steps/sec.

    Default backend is the fused kernel (the XLA grid backend's [N, K]
    candidate gathers are row-overhead-bound at this scale); doorway
    hotspots that overflow the 32-slot buckets are repaired exactly by
    the spill patch."""
    from rmf_crowdsim_tpu import (
        GridConfig,
        SimConfig,
        SimParams,
        Zanlungo,
        make_state,
    )
    from rmf_crowdsim_tpu.core.step import build_rollout
    from rmf_crowdsim_tpu.models.rmf import RMFPlanner

    # A 200x100 m hall with 4 internal walls leaving door gaps.
    verts, walls = [], []
    outer = [(0.0, 0.0), (200.0, 0.0), (200.0, 100.0), (0.0, 100.0)]
    verts += outer
    walls += [(0, 1), (1, 2), (2, 3), (3, 0)]
    for i, x in enumerate((40.0, 80.0, 120.0, 160.0)):
        b = len(verts)
        gap_lo = 40.0 + 5.0 * i
        verts += [(x, 0.0), (x, gap_lo), (x, gap_lo + 12.0), (x, 100.0)]
        walls += [(b, b + 1), (b + 2, b + 3)]

    # scale 2.0: the raster/cache cell (rmf/mod.rs ties both to one
    # scale).  10k agents occupy ~4k distinct 2 m start cells, so the
    # per-agent planning pass below really exercises ~4k native A*
    # solves + 6k cache hits.
    planner = RMFPlanner(verts, walls, scale=2.0, radius=0.4,
                         max_routes=8192, max_route_len=64,
                         arrival_tolerance=0.5)
    lp = Zanlungo(1.0, 1.0, 0.0, 1.0, 2.0, 0.25, force_cap=10.0)
    cfg = SimConfig(
        capacity=n_agents,
        grid=GridConfig(width=208.0, height=108.0, cell_size=2.0,
                        offset=(-4.0, -4.0)),
        neighbor_backend=backend,
        max_per_cell=32,
        max_eyesight=2.0,
        bucket_capacity=32,
        sub_tiles=2,
        strip_tiles=96,
        bucket_tile_size=5.3,
        use_pack_kernel=(backend == "grid_pallas"),
        spill_capacity=256,
        on_truncation="ignore",  # audited via the returned counters
        dtype="float32",
    )
    state = make_state(cfg)
    rng = np.random.default_rng(0)
    f = cfg.jdtype
    # 10k agents scattered through the hall, all routed to a far corner.
    pos = np.stack([rng.uniform(2.0, 198.0, n_agents),
                    rng.uniform(2.0, 98.0, n_agents)], axis=-1)
    goal = (190.0, 90.0)
    # Per-agent host planning for ALL 10k agents, TIMED (VERDICT r2 weak
    # #7 asked for this path on the clock): every agent routes from its
    # own position; the cell-rounded cache (rmf/mod.rs:217-236 semantics)
    # collapses the 10k calls to a few hundred native A* solves.
    t0 = time.perf_counter()
    route_ids = np.asarray([
        rid if (rid := planner.plan_route_cached(
            (float(p[0]), float(p[1])), goal)) is not None else -1
        for p in pos
    ])
    plan_wall = time.perf_counter() - t0
    rep = np.arange(n_agents)
    state = state.replace(
        position=jnp.asarray(pos, f),
        eyesight=jnp.full((n_agents,), 2.0, f),
        alive=jnp.ones((n_agents,), bool),
        uid=jnp.arange(n_agents, dtype=jnp.int32),
        hl_idx=jnp.zeros((n_agents,), jnp.int32),
        lp_idx=jnp.zeros((n_agents,), jnp.int32),
        route_id=jnp.asarray(route_ids[rep], jnp.int32),
        route_wp=jnp.zeros((n_agents,), jnp.int32),
        priority=jnp.arange(n_agents, dtype=f),
        next_uid=jnp.asarray(n_agents, jnp.int32),
    )
    params = SimParams(hl=(planner.init_params(),), lp=(lp.init_params(),),
                       sources=None)
    rollout = jax.jit(build_rollout(cfg, [planner], [lp]),
                      static_argnums=(3,))
    st, counters = rollout(params, state, 0.25, n_steps)
    assert float(st.sim_time) > 0
    # Physics intact: doorway hotspots must stay within the spill patch's
    # capacity (truncation = silently dropped interactions).
    truncated = int(np.max(np.asarray(counters.neighbor_truncated)))
    assert truncated == 0, (
        f"rmf scene truncates {truncated} interactions/step"
    )
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        st, _ = rollout(params, state, 0.25, n_steps)
        _ = float(st.sim_time)
        best = min(best, time.perf_counter() - t0)
    n_routed = int(np.sum(route_ids >= 0))
    return n_steps / best, {
        "host_plan_s_10k_agents": round(plan_wall, 3),
        "distinct_routes": int(len({int(r) for r in route_ids if r >= 0})),
        "routed_agents": n_routed,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000,
                    help="headline agent count")
    ap.add_argument("--quick", action="store_true",
                    help="skip the secondary configs")
    ap.add_argument("--backend", default=None,
                    help="neighbor backend "
                         "(grid_pallas | grid_dense | grid | brute)")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    extra = {"backend": platform, "device": str(jax.devices()[0])}

    headline_n = args.n
    sps = p50 = None
    # Compiled-kernel correctness gate: the timed numbers only count if
    # the COMPILED Mosaic kernel (not the interpret-mode CPU tests)
    # matches the brute oracle on this device.
    try:
        extra["compiled_parity"] = bool(compiled_parity_check())
    except AssertionError as e:
        print(f"compiled parity FAILED: {e}", file=sys.stderr)
        extra["compiled_parity"] = False
    except Exception as e:  # infra failure: report, don't block timing
        print(f"compiled parity errored: {e!r}", file=sys.stderr)
        extra["compiled_parity"] = f"error: {e!r}"
    # Ladder: fused Pallas backend at full scale, then the pure-XLA grid
    # backend at reduced scales if the kernel path fails.
    if args.backend:
        ladder = [(headline_n, args.backend), (262_144, args.backend)]
    else:
        ladder = [(headline_n, "grid_pallas"), (headline_n, "grid"),
                  (262_144, "grid"), (65_536, "grid")]
    for attempt_n, be in ladder:
        try:
            sps, p50 = time_steps(attempt_n, n_steps=20, backend=be)
            headline_n = attempt_n
            extra["neighbor_backend"] = be
            break
        except Exception as e:  # OOM / worker crash: recover, shrink scale
            print(f"bench at n={attempt_n} ({be}) failed: {e!r}",
                  file=sys.stderr)
            extra["fallback"] = True
            time.sleep(75)  # TPU worker restart after a crash takes ~1 min
    if sps is None:
        print(json.dumps({"metric": "sim_steps_per_sec", "value": 0,
                          "unit": "steps/s", "vs_baseline": 0.0,
                          "extra": extra}))
        return
    extra["p50_step_ms"] = round(p50, 3)
    extra["agent_steps_per_sec"] = round(sps * headline_n)

    if not args.quick:
        # Measured multi-chip evidence: the per-shard workload of the
        # D=10 world-sharded engine on the real chip (the D where the
        # measured ladder crosses the >100 steps/s line).
        if extra.get("neighbor_backend") == "grid_pallas" \
                and headline_n >= 1_000_000:
            try:
                extra["multichip_shard_proxy"] = time_shard_proxy(d=10)
            except Exception as e:
                extra["multichip_shard_proxy"] = f"failed: {e!r}"
            try:
                extra["multichip_shard_proxy_tolerance"] = (
                    time_shard_proxy(d=10, invariance="tolerance")
                )
            except Exception as e:
                extra["multichip_shard_proxy_tolerance"] = f"failed: {e!r}"
            # The D where the tolerance-mode ladder crosses >100 steps/s
            # (halo fraction 21% — see DESIGN_NOTES high-D table).
            try:
                extra["multichip_shard_proxy_tolerance_d16"] = (
                    time_shard_proxy(d=16, invariance="tolerance")
                )
            except Exception as e:
                extra["multichip_shard_proxy_tolerance_d16"] = \
                    f"failed: {e!r}"
        try:
            rmf_sps, rmf_host = time_rmf_routing()
            extra["steps_per_sec_rmf10k"] = round(rmf_sps, 1)
            extra["rmf10k_host_planning"] = rmf_host
        except Exception as e:
            print(f"rmf10k (grid_pallas) failed: {e!r}", file=sys.stderr)
            try:
                rmf_sps, rmf_host = time_rmf_routing(backend="grid")
                extra["steps_per_sec_rmf10k"] = round(rmf_sps, 1)
                extra["rmf10k_host_planning"] = rmf_host
                extra["rmf10k_backend"] = "grid"
            except Exception as e2:
                extra["steps_per_sec_rmf10k"] = f"failed: {e2!r}"
        for n in (1_000, 100_000):
            if n >= headline_n:
                continue
            try:
                s, p = time_steps(n, n_steps=50 if n <= 10_000 else 20,
                                  backend=extra.get("neighbor_backend",
                                                    "grid"))
                extra[f"steps_per_sec_{n}"] = round(s, 1)
                extra[f"p50_step_ms_{n}"] = round(p, 3)
            except Exception as e:
                extra[f"steps_per_sec_{n}"] = f"failed: {e!r}"

    result = {
        "metric": f"sim_steps_per_sec_{headline_n}_zanlungo_grid",
        "value": round(sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(sps / 100.0, 3),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
