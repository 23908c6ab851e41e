"""A/B the dual-row segmented compaction tier vs the shared-union-only
kernel at the 1M bench scene, plus tier statistics.

Dual-row: each sub-block's two tile-contiguous query half-groups compact
into the two 64-lane halves of the C-lane plane; pair math runs on
[sub_q/2, C] rows serving two queries each.  Per-query force sums hold
the same addends as the shared path but the reduction tree groups them
differently — parity is TOLERANCE-level (like oracle parity), not
bitwise.

Run on the real chip from /root/repo:  python perf/dualrow_ab.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import rmf_crowdsim_tpu.ops.zanlungo_pallas as zpal  # noqa: E402
from rmf_crowdsim_tpu.ops.zanlungo_pallas import (  # noqa: E402
    BucketConfig, bucketize, tile_key,
)

N = 1_000_000


def make_scene():
    area = N * 1.6
    side = float(np.ceil(np.sqrt(area) / 2.0) * 2.0)
    bcfg = BucketConfig.create(side, side, (-side / 2, -side / 2), 2.0,
                               bucket=32, strip_tiles=96, sub_tiles=2,
                               tile_size=5.3)
    rng = np.random.default_rng(0)
    lim = side / 2 - 1.0
    pos = jnp.asarray(np.stack([
        rng.uniform(-lim, lim, N), rng.uniform(-lim, lim, N)
    ], axis=-1), jnp.float32)
    vel = jnp.asarray(rng.standard_normal((N, 2)) * 0.3, jnp.float32)
    prio = jnp.arange(N, dtype=jnp.float32)
    eye = jnp.full((N,), 2.0, jnp.float32)
    alive = jnp.ones((N,), bool)
    key = tile_key(bcfg, pos, alive)
    order = jnp.argsort(key, stable=True)
    packed_t, packed_T, bpos, occ, dropped = jax.jit(
        lambda p, v: bucketize(
            bcfg, p, v, v, v, prio[order], eye[order],
            v, alive[order], use_pack_kernel=True, presorted=True)
    )(pos[order], vel[order])
    return bcfg, packed_t, packed_T


def tier_stats(bcfg, packed_t):
    """Host-side estimate of the dual/shared/full tier split: per
    sub-block half-union and union sizes from the packed plane."""
    pt = np.asarray(packed_t)
    B, qb = bcfg.bucket, bcfg.sub_tiles
    sub_q = qb * B
    slots = bcfg.slots
    px = pt[:, zpal.ROW_PX].reshape(-1)
    py = pt[:, zpal.ROW_PY].reshape(-1)
    live = pt[:, zpal.ROW_ID] >= 0
    eye = 2.0
    n_sub = slots // sub_q
    rng = np.random.default_rng(1)
    samp = rng.choice(n_sub, 4000, replace=False)
    c0s, c1s, cus = [], [], []
    col_slots = bcfg.ty * B
    for s in samp:
        q0 = s * sub_q
        col = q0 // col_slots
        base = q0 - col * col_slots
        # 3-column window rows [base - B, base + (qb+2)B)
        cand = []
        for k in (-1, 0, 1):
            c = min(max(col + k, 0), bcfg.tx - 1)
            lo = max(base - B, 0)
            hi = min(base + (qb + 1) * B, col_slots)
            idx = np.arange(c * col_slots + lo, c * col_slots + hi)
            cand.append(idx)
        cand = np.concatenate(cand)
        cand = cand[live[cand]]
        halves = []
        for h in (0, 1):
            qs = np.arange(q0 + h * sub_q // 2, q0 + (h + 1) * sub_q // 2)
            qs = qs[live[qs]]
            if len(qs) == 0:
                halves.append(np.zeros(0, np.int64))
                continue
            d2 = ((px[cand][None] - px[qs][:, None]) ** 2
                  + (py[cand][None] - py[qs][:, None]) ** 2)
            hit = (d2 < eye * eye).any(axis=0)
            halves.append(cand[hit])
        c0s.append(len(halves[0]))
        c1s.append(len(halves[1]))
        cus.append(len(np.union1d(halves[0], halves[1])))
    c0s, c1s, cus = map(np.asarray, (c0s, c1s, cus))
    dual = ((c0s <= 64) & (c1s <= 64)).mean()
    shared = ((~((c0s <= 64) & (c1s <= 64))) & (cus <= 128)).mean()
    full = (cus > 128).mean()
    print(f"tiers: dual {dual*100:.1f}%  shared {shared*100:.1f}%  "
          f"full {full*100:.1f}%  (half-union mean {c0s.mean():.1f}, "
          f"p99 {np.percentile(c0s, 99):.0f})", flush=True)


def scanned(fn, k=21):
    def run(p, pT):
        def body(c, _):
            q = c[0] * 1.0000001
            qT = c[1] * 1.0000001
            o = fn(q, qT)
            return (q + o[0, 0] * 1e-30, qT), None
        return jax.lax.scan(body, (p, pT), None, length=k)[0]
    return jax.jit(run)


def timed(tag, f, *args):
    out = f(*args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    best = 1e9
    for _i in range(5):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:22s}: {best / 21 * 1e3:8.3f} ms/op", flush=True)


def main():
    bcfg, packed_t, packed_T = make_scene()
    tier_stats(bcfg, packed_t)
    zp4 = jnp.asarray([1.0, 1.0, 2.0, 0.25, 20.0], jnp.float32)

    def kern(dual):
        def f(p, pT):
            return zpal.zanlungo_forces_bucketed(
                bcfg, zp4, p, int_prio=True, packed_T=pT, dual_row=dual)
        return f

    a = jax.jit(kern(True))(packed_t, packed_T)
    b = jax.jit(kern(False))(packed_t, packed_T)
    live = np.asarray(packed_t[:, zpal.ROW_ID] >= 0)
    an, bn = np.asarray(a)[live], np.asarray(b)[live]
    err = np.abs(an - bn) / (np.abs(bn) + 1e-3)
    print(f"dual vs shared rel err: max {err.max():.2e} "
          f"mean {err.mean():.2e}", flush=True)
    # Reduction-regrouping noise on near-cancelling force sums: allow
    # mixed abs+rel tolerance (the violent scene's force sums mix
    # magnitudes; measured max 1.05e-3 on the rel-only metric with mean
    # 2.2e-8).
    bad = np.abs(an - bn) > (5e-3 + 5e-3 * np.abs(bn))
    assert bad.sum() == 0, f"dual-row diverged on {bad.sum()} slots"

    timed("kernel dual x21", scanned(kern(True)), packed_t, packed_T)
    timed("kernel shared x21", scanned(kern(False)), packed_t, packed_T)


if __name__ == "__main__":
    main()
