"""Probe: can Mosaic lower the IN-KERNEL one-hot segment matmul?

Round-5-outlook item 1 (pulled into round 4): replace the fused train
kernel's per-bounce cotangent PLANE outputs (B1 x C x H x W in HBM, then
XLA-side one-hot matmuls) with per-tile (S, lanes) @ (lanes, C) MXU
matmuls accumulated across sequential grid steps into one small (S, C)
output block.  This probe checks the three Mosaic-sensitive pieces in
isolation on the real toolchain:

  1. reshape (tile_h, tile_w) -> (lanes,) inside the kernel;
  2. broadcasted int compare building the (S, lanes) one-hot;
  3. jnp.dot((S, lanes), (lanes, C)) with f32 accumulation;
  4. revisited-block accumulation: out BlockSpec index_map constant in the
     grid, zero-init at step 0, += afterwards.

Numerical oracle: the XLA _segment_matmul over the same planes.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, C = 64, 28
TH, TW = 32, 128
H, W = 64, 256  # grid (2, 2)


def kernel(idx_ref, cot_ref, acc_ref):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    idx_flat = idx_ref[...].reshape(-1)
    ids = lax.broadcasted_iota(jnp.int32, (S, TH * TW), 0)
    oh = (ids == idx_flat[None, :]).astype(jnp.float32)
    cots = cot_ref[...].reshape(C, TH * TW)
    acc_ref[...] += lax.dot_general(
        oh, cots, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def main():
    key = np.random.default_rng(0)
    idx = key.integers(-1, S, size=(H, W)).astype(np.int32)
    cot = key.normal(size=(C, H, W)).astype(np.float32)

    out = pl.pallas_call(
        kernel,
        grid=(H // TH, W // TW),
        in_specs=[
            pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TH, TW), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, C), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, C), jnp.float32),
    )(idx, cot)
    out = np.asarray(out)

    # oracle
    ids = np.arange(S)
    oh = (idx.reshape(-1)[:, None] == ids[None, :]).astype(np.float32)
    ref = oh.T @ cot.reshape(C, -1).T
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    print("max rel err:", err)
    assert err < 1e-5, err
    print("OK: in-kernel one-hot segment matmul lowers and matches")


if __name__ == "__main__":
    sys.exit(main())
