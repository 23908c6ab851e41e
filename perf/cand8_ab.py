"""A/B the 8-row candidate strip (NUM_CAND) kernel vs the committed
16-row version, standalone scan-amortized at 1M (ledger baseline ~49 ms).

Run `git show HEAD:rmf_crowdsim_tpu/ops/zanlungo_pallas.py >
/tmp/zp_head.py` first to snapshot the committed kernel.
"""
import importlib.util
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from perf.step_parts import setup  # noqa: E402
import rmf_crowdsim_tpu.ops.zanlungo_pallas as zpal  # noqa: E402


def load_mod(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def measure(tag, forces_fn, packed_t, bcfg, zp4):
    def body(cr, _):
        p = cr["p"] * 1.0000001
        o = forces_fn(bcfg, zp4, p)
        return {"p": p + o[0, 0] * 1e-30}, None

    def timed(k):
        f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=k)[0])
        t0 = time.time()
        out = f({"p": packed_t})
        _ = float(out["p"][0, 0])
        comp = time.time() - t0
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = f({"p": packed_t})
            _ = float(out["p"][0, 0])
            best = min(best, time.perf_counter() - t0)
        return best, comp

    t1, c1 = timed(1)
    t21, c21 = timed(21)
    print(f"{tag:12s}: {(t21 - t1) / 20 * 1e3:7.3f} ms/op  "
          f"[compiles {c1:.0f}/{c21:.0f}s]", flush=True)


def main():
    cfg, bcfg, carry, zp, zp4 = setup()
    key = zpal.tile_key(bcfg, carry["pos"], carry["alive"])
    order = jnp.argsort(key, stable=True)
    packed_t, bpos, occ, dropped = jax.jit(
        lambda p, v: zpal.bucketize(
            bcfg, p, v, v, v, carry["prio"][order], carry["eye"][order],
            v, carry["alive"][order], use_pack_kernel=True, presorted=True)
    )(carry["pos"][order], carry["vel"][order])
    print(f"occ={int(occ)} dropped={int(dropped)}", flush=True)

    measure("cand8", zpal.zanlungo_forces_bucketed, packed_t, bcfg, zp4)
    old = load_mod("/tmp/zp_head.py", "zp_head")
    old_bcfg = old.BucketConfig(**vars(bcfg))
    # The committed layout has ROW_EYE/ROW_ID swapped vs the new one:
    # permute the packed columns so each kernel sees its own layout.
    perm = list(range(zpal.NUM_F))
    perm[old.ROW_ID], perm[old.ROW_EYE] = zpal.ROW_ID, zpal.ROW_EYE
    packed_old = packed_t[:, jnp.asarray(perm)]
    measure("head16",
            lambda b, z, p: old.zanlungo_forces_bucketed(old_bcfg, z, p),
            packed_old, bcfg, zp4)


if __name__ == "__main__":
    main()
