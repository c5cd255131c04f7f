"""Probe the round-6 forward lever: batch the analytic bounce's per-shape
leaf-frame row transforms onto the MXU.

The analytic_all bounce computes, per cube/octahedron shape, 6 dot-3 row
transforms (oq = M ro + c, dq = M rd) before ~30 VPU ops of slab logic -
roughly a third of the bounce's flops are these transforms.  This probe
times, over a (64, 128) tile and K=32 box shapes x 64 repetitions:

  A. scalar-closure FMAs (the shipped formulation: scalar M entries from
     SMEM broadcast against the ro/rd planes);
  B. one MXU dot_general per rep: the (64,128) ro/rd planes reshaped to
     (3, 8192) and contracted with a static (3K, 3) row matrix, slab fold
     reading the (3K, 8192) result - pays two Mosaic relayouts per rep.

Writes benchmarks/artifacts/mxu_transform_probe_r05.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 64, 128
K = 32          # box shapes
REPS = 64


def scalar_kernel(ro_ref, rd_ref, m_ref, out_ref):
    rox, roy, roz = ro_ref[0], ro_ref[1], ro_ref[2]
    rdx, rdy, rdz = rd_ref[0], rd_ref[1], rd_ref[2]
    acc = jnp.zeros((H, W), jnp.float32)
    for rep in range(REPS):
        t_min = jnp.full((H, W), 1e9, jnp.float32)
        for s in range(K):
            o = s * 10
            lo = jnp.full((H, W), -1e9, jnp.float32)
            hi = jnp.full((H, W), 1e9, jnp.float32)
            for r in range(3):
                m0 = m_ref[o + 3 * r]
                m1 = m_ref[o + 3 * r + 1]
                m2 = m_ref[o + 3 * r + 2]
                oq = m0 * rox + m1 * roy + m2 * roz + m_ref[o + 9]
                dq = m0 * rdx + m1 * rdy + m2 * rdz
                ok = jnp.abs(dq) > 1e-9
                inv = 1.0 / jnp.where(ok, dq, 1.0)
                ta = (-1.0 - oq) * inv
                tb = (1.0 - oq) * inv
                lo = jnp.maximum(lo, jnp.minimum(ta, tb))
                hi = jnp.minimum(hi, jnp.maximum(ta, tb))
            hit = (lo <= hi) & (hi > 0.0)
            t_min = jnp.minimum(t_min, jnp.where(hit, jnp.abs(lo), 1e9))
        acc = acc + t_min
    out_ref[:] = acc


def mxu_kernel(ro_ref, rd_ref, mat_ref, off_ref, out_ref):
    # mat: (3K padded to 128, 3) static row matrix; off: (3K pad, ) offsets
    ro3 = jnp.stack([ro_ref[0].reshape(-1), ro_ref[1].reshape(-1),
                     ro_ref[2].reshape(-1)])          # (3, 8192)
    rd3 = jnp.stack([rd_ref[0].reshape(-1), rd_ref[1].reshape(-1),
                     rd_ref[2].reshape(-1)])
    mat = mat_ref[:]                                   # (128, 3)
    acc = jnp.zeros((H, W), jnp.float32)
    for rep in range(REPS):
        oq_all = lax.dot_general(mat, ro3, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=lax.Precision.HIGHEST)
        oq_all = oq_all + off_ref[:][:, None]
        dq_all = lax.dot_general(mat, rd3, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=lax.Precision.HIGHEST)
        t_min = jnp.full((H * W,), 1e9, jnp.float32)
        for s in range(K):
            lo = jnp.full((H * W,), -1e9, jnp.float32)
            hi = jnp.full((H * W,), 1e9, jnp.float32)
            for r in range(3):
                oq = oq_all[3 * s + r]
                dq = dq_all[3 * s + r]
                ok = jnp.abs(dq) > 1e-9
                inv = 1.0 / jnp.where(ok, dq, 1.0)
                ta = (-1.0 - oq) * inv
                tb = (1.0 - oq) * inv
                lo = jnp.maximum(lo, jnp.minimum(ta, tb))
                hi = jnp.minimum(hi, jnp.maximum(ta, tb))
            hit = (lo <= hi) & (hi > 0.0)
            t_min = jnp.minimum(t_min, jnp.where(hit, jnp.abs(lo), 1e9))
        acc = acc + t_min.reshape(H, W)
    out_ref[:] = acc


def run(kernel, args, n_in):
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    specs = [vm, vm] + [smem] * (n_in - 2)
    if kernel is mxu_kernel:
        specs = [vm, vm, vm, vm]
    fn = jax.jit(lambda *a: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=specs, out_specs=vm)(*a))
    out = fn(*args)
    np.asarray(out[:2, :2]).sum()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(*args)[:2, :2]).sum()
        ts.append(time.perf_counter() - t0)
    return min(ts), np.asarray(out)


def main():
    r = np.random.default_rng(0)
    ro = jnp.asarray(r.normal(size=(3, H, W)).astype(np.float32))
    rd = jnp.asarray(r.normal(size=(3, H, W)).astype(np.float32))
    mvals = r.normal(size=(K * 10,)).astype(np.float32)
    m = jnp.asarray(mvals)

    mat = np.zeros((128, 3), np.float32)
    off = np.zeros((128,), np.float32)
    for s in range(K):
        for rr in range(3):
            mat[3 * s + rr] = mvals[s * 10 + 3 * rr: s * 10 + 3 * rr + 3]
            off[3 * s + rr] = mvals[s * 10 + 9]

    rows = []
    try:
        t_a, out_a = run(scalar_kernel, (ro, rd, m), 3)
        rows.append({"variant": "scalar-closure FMAs", "s": t_a})
    except Exception as e:  # noqa: BLE001
        rows.append({"variant": "scalar", "error": repr(e)[:300]})
    print(json.dumps(rows[-1]))
    try:
        t_b, out_b = run(mxu_kernel, (ro, rd, jnp.asarray(mat),
                                      jnp.asarray(off)), 4)
        row = {"variant": "MXU-batched transforms", "s": t_b,
               "speedup_vs_scalar": rows[0].get("s", 0) / t_b}
        if "s" in rows[0]:
            row["max_abs_delta"] = float(np.abs(out_b - out_a).max())
        rows.append(row)
    except Exception as e:  # noqa: BLE001
        rows.append({"variant": "MXU", "error": repr(e)[:300]})
    print(json.dumps(rows[-1]))

    with open("benchmarks/artifacts/mxu_transform_probe_r05.jsonl", "w") as f:
        for rw in rows:
            f.write(json.dumps(rw) + "\n")


if __name__ == "__main__":
    main()
