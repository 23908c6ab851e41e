"""A/B the fused small-matmul stacks vs the separate-pass originals:

- force kernel: compaction hi/mid/lo as ONE M=24 matmul vs three M=8
  passes (an M=8 matmul pays the full MXU pipeline fill for 8 rows);
- pack kernel: row-major plane as ONE N=48 matmul (vs 3x N=16) and
  transposed plane + hit counter as ONE M=32 matmul (vs 3x M=8 + M=1),
  folded once per GROUP.

Both must be BITWISE identical (each output slot sums one true value
plus exact zeros; the folds keep the (hi + mid) + lo order).

Snapshot the pre-fuse modules first:
    git show <rev>:rmf_crowdsim_tpu/ops/zanlungo_pallas.py > /tmp/zp_old.py
    git show <rev>:rmf_crowdsim_tpu/ops/pack_pallas.py > /tmp/pack_old.py
"""
import importlib.util
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import rmf_crowdsim_tpu.ops.zanlungo_pallas as zpal  # noqa: E402
import rmf_crowdsim_tpu.ops.pack_pallas as ppal  # noqa: E402
from rmf_crowdsim_tpu.ops.zanlungo_pallas import (  # noqa: E402
    BucketConfig, tile_key,
)

N = 1_000_000


def load_old(name, path):
    if not os.path.exists(path):
        return None
    spec = importlib.util.spec_from_file_location(
        f"rmf_crowdsim_tpu.ops.{name}", path
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"rmf_crowdsim_tpu.ops.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


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
    return bcfg, pos[order], vel[order], prio[order], eye[order]


def feat_rows(bcfg, pos, vel, prio, eye, pack_mod):
    """Sorted transposed feature rows + monotone bucket slots."""
    alive = jnp.ones((N,), bool)
    key = tile_key(bcfg, pos, alive)
    bpos, occ, over = zpal.rank_from_sorted_key(bcfg, key)
    f32 = jnp.float32
    cols = [pos[:, 0], pos[:, 1], vel[:, 0], vel[:, 1], vel[:, 0],
            vel[:, 1], prio, jnp.arange(N, dtype=f32), vel[:, 0],
            vel[:, 1], eye, vel[:, 0], vel[:, 1],
            bpos.astype(f32), jnp.zeros((N,), f32), jnp.ones((N,), f32)]
    return jnp.stack(cols, axis=0), bpos


def timed(tag, f, *args):
    out = f(*args)
    jax.tree.map(lambda x: float(jnp.ravel(x)[0]), out)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(*args)
        jax.tree.map(lambda x: float(jnp.ravel(x)[0]), out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:24s}: {best * 1e3:8.3f} ms", flush=True)
    return out


def scanned(fn, k=21):
    """Scan-amortize: k iterations inside one jit, report per-op delta."""
    def run(*args):
        def body(c, _):
            p = c[0] * 1.0000001
            o = fn(p, *c[1:])
            o0 = jax.tree.leaves(o)[0]
            return (p + o0.ravel()[0] * 1e-30,) + c[1:], None
        return jax.lax.scan(body, args, None, length=k)[0]
    return jax.jit(run)


def main():
    old_z = load_old("zp_old_ab", "/tmp/zp_old.py")
    old_p = load_old("pack_old_ab", "/tmp/pack_old.py")
    bcfg, pos, vel, prio, eye = make_scene()
    zp4 = jnp.asarray([1.0, 1.0, 2.0, 0.25, 20.0], jnp.float32)

    feat_t, bpos = jax.jit(
        lambda p, v, pr, e: feat_rows(bcfg, p, v, pr, e, ppal)
    )(pos, vel, prio, eye)
    feat_t = jax.block_until_ready(feat_t)

    # ---- pack kernel A/B (bitwise) ----
    new_pack = jax.jit(lambda ft, bp: ppal.pack_rows_pallas(
        ft, bp, bcfg.slots))
    pt_n, pT_n, ov_n = new_pack(feat_t, bpos)
    if old_p is not None:
        old_pack = jax.jit(lambda ft, bp: old_p.pack_rows_pallas(
            ft, bp, bcfg.slots))
        pt_o, pT_o, ov_o = old_pack(feat_t, bpos)
        assert int(jnp.sum(pt_n != pt_o)) == 0, "pack plane diverged"
        assert int(jnp.sum(pT_n != pT_o)) == 0, "pack T plane diverged"
        print("pack bitwise parity: OK", flush=True)

    # scan-amortized pack timing (vary ONE feature row per iter)
    def pack_fn(mod):
        def f(ft, bp):
            return mod.pack_rows_pallas(ft, bp, bcfg.slots)[0]
        return f
    t1 = timed("pack fused x21", scanned(pack_fn(ppal)), feat_t, bpos)
    if old_p is not None:
        timed("pack old   x21", scanned(pack_fn(old_p)), feat_t, bpos)

    # ---- force kernel A/B (bitwise on live slots) ----
    new_k = jax.jit(lambda p, pT: zpal.zanlungo_forces_bucketed(
        bcfg, zp4, p, int_prio=True, packed_T=pT))
    a = new_k(pt_n, pT_n)
    if old_z is not None:
        obcfg = old_z.BucketConfig(**vars(bcfg))
        old_k = jax.jit(lambda p, pT: old_z.zanlungo_forces_bucketed(
            obcfg, zp4, p, int_prio=True, packed_T=pT))
        b = old_k(pt_n, pT_n)
        live = pt_n[:, zpal.ROW_ID] >= 0
        nbad = int(jnp.sum(jnp.where(live[:, None], a != b, False)))
        assert nbad == 0, f"force kernel diverged on {nbad} live slots"
        print("force kernel bitwise parity: OK", flush=True)

    def kern_fn(mod, cfg):
        def f(p, pT):
            return mod.zanlungo_forces_bucketed(
                cfg, zp4, p, int_prio=True, packed_T=pT)
        return f
    timed("kernel fused x21", scanned(kern_fn(zpal, bcfg)), pt_n, pT_n)
    if old_z is not None:
        timed("kernel old   x21", scanned(kern_fn(old_z, obcfg)),
              pt_n, pT_n)


if __name__ == "__main__":
    main()
