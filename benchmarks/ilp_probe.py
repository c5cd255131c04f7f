"""ILP probe: does interleaving two independent marches close the
scheduling gap?

The roofline chain says the march runs at 0.97 Tf/s against a measured
attainable 1.56 Tf/s (vpu_peak_r03: dependent chains at 0.05 Tf/s, 64
independent chains at 1.56) - i.e. the kernel's per-step dependency chain
(map tap -> step -> position -> next tap) leaves up to 1.6x on the table.
The candidate fix is batching INDEPENDENT work per program: march two
(32, 128) half-tiles in ONE while loop whose body evaluates both halves'
maps back to back - two independent dependency chains for the scheduler.

This probe isolates that effect on primary rays with bounce-level anyhit
culling on both sides:

  A: two sequential (32, 128) marches (the dependency-chain baseline)
  B: one fused loop interleaving both halves

ratio = t(A) / t(B); >1.2 justifies round-4 integration into the
megakernel (with t-interval culling and per-half early exit), <1.1 closes
the ILP hypothesis as a negative.  Per-step actives are derived from
in-loop reductions (the Mosaic relayout workaround of
megakernel._march_while).

Run: python benchmarks/ilp_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W, H, N_PRIMS = 1920, 1080, 64
TILE = (64, 128)  # split into two (32, 128) halves inside the kernel
HALF = 32


def _make_kernels(spec):
    from compute_path_tracer_tpu.constants import FP, MHD, STEPS
    from compute_path_tracer_tpu.kernels.megakernel import (
        _BIG, _anyhit, _march_while,
    )
    from compute_path_tracer_tpu.render.baked import (
        make_bounds_baked, make_map_baked_d,
    )
    from compute_path_tracer_tpu.vecmath import Vec3

    map_d = make_map_baked_d(spec)
    bounds_fn = make_bounds_baked(spec)

    def halves(refs):
        rox, roy, roz, rdx, rdy, rdz = refs
        ro = Vec3(rox[:], roy[:], roz[:])
        rd = Vec3(rdx[:], rdy[:], rdz[:])
        roA = Vec3(ro.x[:HALF], ro.y[:HALF], ro.z[:HALF])
        rdA = Vec3(rd.x[:HALF], rd.y[:HALF], rd.z[:HALF])
        roB = Vec3(ro.x[HALF:], ro.y[HALF:], ro.z[HALF:])
        rdB = Vec3(rd.x[HALF:], rd.y[HALF:], rd.z[HALF:])
        return (roA, rdA), (roB, rdB)

    def seq_kernel(gv_ref, *refs):
        """Baseline A: the two halves march one after the other."""
        (roA, rdA), (roB, rdB) = halves(refs[:6])
        t_ref = refs[6]
        for (ro, rd), sl in (((roA, rdA), slice(0, HALF)),
                             ((roB, rdB), slice(HALF, None))):
            checks, _ = bounds_fn(ro, rd, gv_ref)
            t, _tp = _march_while(map_d, ro, rd, gv_ref, checks,
                                  _anyhit(checks))
            t_ref[sl] = t

    def fused_kernel(gv_ref, *refs):
        """Variant B: one loop, both halves' map taps per iteration."""
        (roA, rdA), (roB, rdB) = halves(refs[:6])
        t_ref = refs[6]
        checksA, _ = bounds_fn(roA, rdA, gv_ref)
        checksB, _ = bounds_fn(roB, rdB, gv_ref)

        zero = jnp.float32(0.0)
        big = jnp.float32(_BIG)

        def ivals(checks):
            return tuple(
                None if c is None else (c, zero, big) for c in checks
            )

        ivA, ivB = ivals(checksA), ivals(checksB)
        tA0 = roA.x * 0.0
        tB0 = roB.x * 0.0
        dA0 = tA0.astype(jnp.int32)
        dB0 = tB0.astype(jnp.int32)

        def actives(iv, done, t):
            # In-loop reductions of the (loop-invariant) per-lane checks:
            # hoisting these out of the loop trips Mosaic's "Invalid
            # relayout ... replicated" failure (megakernel._march_while).
            del done, t
            out = []
            for entry in iv:
                if entry is None:
                    out.append(None)
                else:
                    c, _z, _b = entry
                    out.append(jnp.max(c.astype(jnp.int32)) > 0)
            return tuple(out)

        def cond(c):
            step, _ta, da, _tb, db = c[0], c[1], c[2], c[3], c[4]
            return (step < STEPS) & (
                (jnp.min(da) < 1) | (jnp.min(db) < 1)
            )

        def body(c):
            step, ta, da_i, tb, db_i = c
            da = da_i != 0
            db = db_i != 0
            # Derive per-step actives from in-loop reductions (Mosaic
            # relayout workaround, megakernel._march_while).
            actA = actives(ivA, da, ta)
            actB = actives(ivB, db, tb)
            pa = roA + rdA * ta
            pb = roB + rdB * tb
            # Two INDEPENDENT map taps: the scheduler may interleave them.
            dda = map_d(pa, gv_ref, checksA, actA)
            ddb = map_d(pb, gv_ref, checksB, actB)
            ada = jnp.abs(dda)
            adb = jnp.abs(ddb)
            nta = jnp.where(da, ta, ta + ada)
            ntb = jnp.where(db, tb, tb + adb)
            nda = da | (ada < MHD) | (nta > FP)
            ndb = db | (adb < MHD) | (ntb > FP)
            return (step + 1, nta, nda.astype(jnp.int32),
                    ntb, ndb.astype(jnp.int32))

        _, ta, _, tb, _ = lax.while_loop(
            cond, body, (jnp.int32(0), tA0, dA0, tB0, dB0)
        )
        t_ref[:HALF] = ta
        t_ref[HALF:] = tb

    return seq_kernel, fused_kernel


def main():
    from compute_path_tracer_tpu.app.tpulock import tpu_lock
    from compute_path_tracer_tpu.ops.camera import calc_uv, primary_ray
    from compute_path_tracer_tpu.render.baked import bake
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene
    from compute_path_tracer_tpu.vecmath import Vec3

    cs = compile_scene(benchmark_scene(N_PRIMS))
    params = jnp.asarray(cs.params, jnp.float32)
    bv = bake(cs.spec, params)

    ph = -(-H // TILE[0]) * TILE[0]
    xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (ph, W))
    ys = jnp.broadcast_to(jnp.arange(ph, dtype=jnp.int32)[:, None], (ph, W))
    u, v = calc_uv(xs.astype(jnp.float32), ys.astype(jnp.float32), W, H,
                   jnp.float32(W / H))
    ro, rd = primary_ray(u, v, jnp.float32(1.0))
    ro = Vec3(*(jnp.broadcast_to(c, (ph, W)) for c in ro))

    seq_kernel, fused_kernel = _make_kernels(cs.spec)
    tile = pl.BlockSpec(TILE, lambda i, j: (i, j), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def runner(kernel):
        @jax.jit
        def run(gv, ro, rd):
            return pl.pallas_call(
                kernel,
                grid=(ph // TILE[0], W // TILE[1]),
                in_specs=[smem] + [tile] * 6,
                out_specs=tile,
                out_shape=jax.ShapeDtypeStruct((ph, W), jnp.float32),
            )(gv, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z)

        return run

    def timed(name, fn):
        out = fn(bv, ro, rd)
        np.asarray(out).ravel()[:2].sum()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = fn(bv, ro, rd)
        np.asarray(out).ravel()[:2].sum()
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"variant": name, "ms": dt * 1e3}), flush=True)
        return out, dt

    with tpu_lock():
        a, dt_a = timed("sequential halves (dep-chain baseline)",
                        runner(seq_kernel))
        b, dt_b = timed("fused interleaved halves", runner(fused_kernel))

    a, b = np.asarray(a)[:H], np.asarray(b)[:H]
    mism = float((np.abs(a - b) > 1e-3).mean())
    ratio = dt_a / dt_b
    print(json.dumps({
        "speedup_fused_over_seq": ratio,
        "t_mismatch_frac": mism,
        "verdict_hint": ("integrate in round 4" if ratio > 1.2 else
                         "ILP hypothesis closed negative" if ratio < 1.1
                         else "borderline"),
    }), flush=True)


if __name__ == "__main__":
    main()
