"""Feature-plane transpose kernel: [NUM_F, R] lane-major -> [R, NUM_F].

The slot-resident engine (core/resident.py) builds its feature plane as
an axis-0 stack of 1-D state columns — a cheap concatenation.  The force
kernel's query stream and the spill machinery want the ROW-MAJOR
[slots, NUM_F] orientation, and the XLA lowering of that interleave
(jnp.stack(cols, axis=-1) / .T) measured ~40 ms at 1.84M slots
(perf/resident_probe.py round 4) — a strided relayout the compiler
pays per element.  This kernel does it as [16, 128]-block transposes,
which Mosaic lowers natively (perf/transpose_probe.py), at ~memory
bandwidth.

Falls back to the XLA transpose when the row count is not 128-aligned
(never true for BucketConfig layouts, whose column slot counts are
128-padded) or off the TPU path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lanes per program: prefer big blocks (fewer program dispatches — at
# 512 lanes the 1.84M-slot plane runs 3.6k programs and the ~2 us/program
# dispatch dominates); VMEM stays tiny (16 x 8192 x 4 B x 2 = 1 MB).
_BLKS = (8192, 4096, 2048, 1024, 512, 256, 128)


def plane_to_rowmajor(feat_T: jax.Array, interpret: bool = False):
    """[F, R] -> [R, F] with F a multiple of 8 (Mosaic sublane tile).

    Exact (a pure data movement).  R must be 128-aligned for the kernel
    path; anything else takes the XLA transpose fallback.
    """
    f, r = feat_T.shape
    assert f % 8 == 0, "feature count must be sublane-aligned"
    blk = next((b for b in _BLKS if r % b == 0), None)
    if blk is None:
        return feat_T.T

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    return pl.pallas_call(
        kernel,
        grid=(r // blk,),
        in_specs=[pl.BlockSpec((f, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, f), feat_T.dtype),
        interpret=interpret,
    )(feat_T)
