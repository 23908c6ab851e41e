"""Does Mosaic lower int8 matmuls to the v5e MXU at higher throughput
than bf16 for the compaction passes?  (Round-5 candidate #1 derisk.)

The fused kernel's compaction infrastructure spends ~17.5 ms/step at 1M
in two matmul families (ops/zanlungo_pallas.py _make_kernel):
  - segmented prefix triangle: [64, 128] 0/1 @ [128, 128] 0/1 tri
  - one-hot compaction:        [8, 384] f32 plane @ [384, 128] 0/1 p_t
Both have one 0/1 operand; bf16 is exact for 0/1 and the MXU
accumulates f32.  v5e's MXU doubles throughput at int8 IF the compiler
lowers it natively; this probe measures that on the real chip with a
dependency-chained loop so the matmul is the steady-state cost.

Run: python perf/onehot_int8_probe.py [--iters 4000]
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _probe_kernel(x_ref, w_ref, o_ref, *, iters, in_dtype, acc_dtype):
    x0 = x_ref[...].astype(in_dtype)
    w = w_ref[...].astype(in_dtype)

    k = x_ref.shape[1]
    n = o_ref.shape[1]
    thresh = 64 if acc_dtype == jnp.int32 else 64.0

    def body(i, x):
        acc = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
            precision=jax.lax.Precision.DEFAULT,
        )
        # Keep 0/1 magnitude and force the chain through the result so
        # Mosaic cannot hoist or DCE any iteration; tile [m, n] back to
        # the [m, k] carry when k is a multiple of n.
        bit = (acc > thresh).astype(in_dtype)
        return jnp.concatenate([bit] * (k // n), axis=1)

    out = jax.lax.fori_loop(0, iters, body, x0)
    o_ref[...] = out[:, :n].astype(jnp.float32)


def time_variant(m, k, n, in_dtype, acc_dtype, iters, seed=0,
                 interpret=False):
    rng = np.random.default_rng(seed)
    x = jnp.asarray((rng.uniform(size=(m, k)) < 0.5), jnp.float32)
    w = jnp.asarray((rng.uniform(size=(k, n)) < 0.5), jnp.float32)
    fn = pl.pallas_call(
        functools.partial(_probe_kernel, iters=iters, in_dtype=in_dtype,
                          acc_dtype=acc_dtype),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
    )
    fn = jax.jit(fn)
    out = fn(x, w)
    float(out[0, 0])  # tunnel-safe sync (block_until_ready lies)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = fn(x, w)
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / reps
    ns_per_mm = dt / iters * 1e9
    return ns_per_mm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode shape/correctness smoke")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices())
    shapes = [(64, 128, 128, "prefix-tri"), (8, 384, 128, "one-hot")]
    variants = [
        ("bf16->f32 (current)", jnp.bfloat16, jnp.float32),
        ("int8->int32", jnp.int8, jnp.int32),
        ("f32->f32", jnp.float32, jnp.float32),
    ]
    for m, k, n, tag in shapes:
        for name, ind, accd in variants:
            try:
                ns = time_variant(m, k, n, ind, accd,
                                  2 if args.interpret else args.iters,
                                  interpret=args.interpret)
                print(f"[{tag} {m}x{k}x{n}] {name}: {ns:.1f} ns/matmul")
            except Exception as e:  # lowering may simply be unsupported
                msg = str(e).splitlines()[0][:120]
                print(f"[{tag} {m}x{k}x{n}] {name}: FAILED ({msg})")


if __name__ == "__main__":
    main()
