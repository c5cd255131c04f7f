"""Hardware probe: can Mosaic lower a PER-LANE dynamic gather, and how fast?

The round-4 verdict's top item is a baked coarse 3D lower-bound distance
grid (the TPU-native generalization of the reference's AABB ``check[]``
culling, shader_out/test_compute.glsl:185-245): far from every surface a
lane should advance by a conservative grid bound WITHOUT evaluating the
exact map.  The whole design hinges on one primitive: each lane gathering
its own cell's bound from a VMEM-resident table.  GPU shared-memory
gathers are native; on TPU the candidate lowering is
``jnp.take_along_axis(table, idx, axis=-1)`` within a (sublane, lane)
vreg (Mosaic tpu.DynamicGatherOp, 128-entry tables per gather).

This probe measures on real silicon:
  A. correctness of a 128-entry per-lane gather inside a Pallas kernel;
  B. throughput: gathers/s over a (64, 128) tile vs the same tile's
     arithmetic map-tap cost (the thing the grid tap must beat: one
     gather + index math vs ~12 active shapes x ~30 flops);
  C. a 512-entry table emulated as 4 chunk gathers + 2-bit select
     (8x8x8 grid) - the realistic grid resolution.

Writes benchmarks/artifacts/gather_probe_r05.jsonl.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 64, 128
ITERS = 512  # gathers per kernel invocation (amortize launch)


def probe_correct():
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]                      # (H, 128) rows all equal
        idx = idx_ref[:]                      # (H, W) int32 in [0, 128)
        out_ref[:] = jnp.take_along_axis(tab, idx, axis=1)

    tab = jnp.broadcast_to(jnp.arange(128, dtype=jnp.float32) * 3.0 + 1.0,
                           (H, 128))
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 128, (H, W)),
                      jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    want = np.asarray(tab)[np.arange(H)[:, None], np.asarray(idx)]
    ok = bool(np.array_equal(np.asarray(out), want))
    return ok


def _time(fn, *args):
    fn(*args)[0].block_until_ready()
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    r[0].block_until_ready()
    return (time.perf_counter() - t0) / n


def probe_throughput():
    """ITERS chained gathers (each feeding the next index) vs the same
    chain of pure VPU arithmetic approximating one culled map tap."""

    def gather_kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]

        def body(_i, c):
            idx, acc = c
            g = jnp.take_along_axis(tab, idx, axis=1)
            acc = acc + g
            idx = (idx + g.astype(jnp.int32)) & 127
            return idx, acc

        _idx, acc = lax.fori_loop(
            0, ITERS, body, (idx_ref[:], jnp.zeros((H, W), jnp.float32)))
        out_ref[:] = acc

    def arith_kernel(tab_ref, idx_ref, out_ref):
        # ~12 active shapes x (sub + mul-add chain + min fold) ~= one
        # culled map tap of the benchmark scene (sphere: 3 sub, 3 mul,
        # 2 add, sqrt, sub, min ~= 11 ops -> 12 shapes ~= 132 VPU ops).
        x = idx_ref[:].astype(jnp.float32)

        def body(_i, c):
            x, acc = c
            d = jnp.float32(1e9)
            for s in range(12):
                dx = x - jnp.float32(s)
                dd = jnp.sqrt(dx * dx + jnp.float32(s) + 1.0) - 0.5
                d = jnp.minimum(d, dd)
            return x + 1.0, acc + d

        x, acc = lax.fori_loop(0, ITERS, body,
                               (x, jnp.zeros((H, W), jnp.float32)))
        out_ref[:] = acc

    def grid512_kernel(t0_ref, t1_ref, t2_ref, t3_ref, idx_ref, out_ref):
        tabs = [t0_ref[:], t1_ref[:], t2_ref[:], t3_ref[:]]

        def body(_i, c):
            idx, acc = c                     # idx in [0, 512)
            lo = idx & 127
            hi = idx >> 7
            g = jnp.take_along_axis(tabs[0], lo, axis=1)
            for k in (1, 2, 3):
                gk = jnp.take_along_axis(tabs[k], lo, axis=1)
                g = jnp.where(hi == k, gk, g)
            acc = acc + g
            idx = (idx + g.astype(jnp.int32)) & 511
            return idx, acc

        _idx, acc = lax.fori_loop(
            0, ITERS, body, (idx_ref[:], jnp.zeros((H, W), jnp.float32)))
        out_ref[:] = acc

    tab = jnp.broadcast_to(
        (jnp.arange(128, dtype=jnp.float32) * 7.0) % 13.0 + 1.0, (H, 128))
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 128, (H, W)),
                      jnp.int32)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    gather = jax.jit(lambda t, i: (pl.pallas_call(
        gather_kernel, out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[vm, vm], out_specs=vm)(t, i),))
    arith = jax.jit(lambda t, i: (pl.pallas_call(
        arith_kernel, out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[vm, vm], out_specs=vm)(t, i),))
    g512 = jax.jit(lambda t0, t1, t2, t3, i: (pl.pallas_call(
        grid512_kernel, out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[vm] * 5, out_specs=vm)(t0, t1, t2, t3, i),))

    t_g = _time(gather, tab, idx)
    t_a = _time(arith, tab, idx)
    idx512 = jnp.asarray(np.random.default_rng(2).integers(0, 512, (H, W)),
                         jnp.int32)
    t_5 = _time(g512, tab, tab * 2, tab * 3, tab * 4, idx512)
    lanes = H * W * ITERS
    return {
        "gather128_ns_per_lane_tap": t_g / lanes * 1e9,
        "arith_maptap_ns_per_lane_tap": t_a / lanes * 1e9,
        "gather512_ns_per_lane_tap": t_5 / lanes * 1e9,
        "gather128_vs_maptap": t_g / t_a,
        "gather512_vs_maptap": t_5 / t_a,
        "iters": ITERS,
    }


def main():
    dev = jax.devices()[0]
    rows = []
    try:
        ok = probe_correct()
        rows.append({"probe": "correct128", "ok": ok})
    except Exception as e:  # noqa: BLE001 - record the Mosaic error verbatim
        rows.append({"probe": "correct128", "ok": False,
                     "error": repr(e)[:500]})
        ok = False
    if ok:
        try:
            rows.append({"probe": "throughput",
                         "device": str(dev), **probe_throughput()})
        except Exception as e:  # noqa: BLE001
            rows.append({"probe": "throughput", "error": repr(e)[:500]})
    with open("benchmarks/artifacts/gather_probe_r05.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    for r in rows:
        print(json.dumps(r))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
