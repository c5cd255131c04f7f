"""Dense-map march experiment, stage 1: what does evaluating EVERY prim
every step cost, with zero conds?

The round-2 verdict left one untried forward lever: dense evaluation - no
per-shape lax.cond dispatch, no per-step t-interval activation, just the
plain per-lane-guarded fold over all 64 prims (and, stage 2, its transform
FMAs moved onto the MXU).  This probe measures the decision-relevant ratio
on real hardware:

    r = t(dense plain-map march) / t(t-interval culled march)

Per benchmarks/diagnose.py the culled march evaluates ~12 of 64 shapes plus
~30% fixed cond/predicate overhead; dense evaluates 64 with no overhead at
potentially higher ILP (the vpu_peak sweep shows 0.05 -> 1.56 Tf/s from
ILP alone).  The MXU stage can only absorb the affine-transform portion
(~40%) of dense work, so if r > ~2.5 the MXU variant mathematically cannot
beat the culled march by the 1.5x adoption bar and the experiment ends with
a recorded negative; if r < ~1.5 stage 2 is worth building.

Times the march ONLY (one primary-ray cast at 1080p, t+idx out), plus the
full frame via the megakernel for context.  Run:
python benchmarks/dense_probe.py
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
TILE = (64, 128)


def _dense_march_kernel(spec):
    """Plain-map march: per-lane guards only, no activation sets, no step
    clamps - exact cast_ray semantics (reference.py:86-126) by construction."""
    from compute_path_tracer_tpu.constants import FP, MHD, STEPS
    from compute_path_tracer_tpu.render.baked import (
        make_bounds_baked, make_map_baked, make_map_baked_d,
    )
    from compute_path_tracer_tpu.vecmath import Vec3

    map_d = make_map_baked_d(spec)
    map_ids = make_map_baked(spec)
    bounds_fn = make_bounds_baked(spec)

    def kernel(gv_ref, rox, roy, roz, rdx, rdy, rdz, t_ref, idx_ref):
        gv = gv_ref
        ro = Vec3(rox[:], roy[:], roz[:])
        rd = Vec3(rdx[:], rdy[:], rdz[:])
        checks, _dbg = bounds_fn(ro, rd, gv)
        t0 = ro.x * 0.0
        done0 = t0.astype(jnp.int32)

        def cond(c):
            step, _t, _tp, done_i = c
            return jnp.logical_and(step < STEPS, jnp.min(done_i) < 1)

        def body(c):
            step, t, tp, done_i = c
            done = done_i != 0
            p = ro + rd * t
            d = map_d(p, gv, checks, None)  # dense: every prim, no conds
            ad = jnp.abs(d)
            nt = jnp.where(done, t, t + ad)
            ntp = jnp.where(done, tp, t)
            ndone = done | (ad < MHD) | (nt > FP)
            return step + 1, nt, ntp, ndone.astype(jnp.int32)

        _, t, tp, _ = lax.while_loop(cond, body, (jnp.int32(0), t0, t0, done0))
        _d2, mi = map_ids(ro + rd * tp, gv, checks, None)
        t_ref[:] = t
        idx_ref[:] = jnp.where(t > FP, -1, mi)

    return kernel


def main():
    from compute_path_tracer_tpu.app.tpulock import tpu_lock
    from compute_path_tracer_tpu.kernels.march import march_pallas
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

    kernel = _dense_march_kernel(cs.spec)
    tile = pl.BlockSpec(TILE, lambda i, j: (i, j), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def dense(gv, ro, rd):
        return pl.pallas_call(
            kernel,
            grid=(ph // TILE[0], W // TILE[1]),
            in_specs=[smem] + [tile] * 6,
            out_specs=(tile, tile),
            out_shape=(jax.ShapeDtypeStruct((ph, W), jnp.float32),
                       jax.ShapeDtypeStruct((ph, W), jnp.int32)),
        )(gv, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z)

    def timed(name, fn, *a, **k):
        out = fn(*a, **k)
        np.asarray(jax.tree.leaves(out)[0][:2]).sum()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = fn(*a, **k)
        np.asarray(jax.tree.leaves(out)[0][:2]).sum()
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"march": name, "ms": dt * 1e3}), flush=True)
        return out, dt

    with tpu_lock():
        (t_c, i_c), dt_cull = timed(
            "t_cull (current)", march_pallas, cs.spec, bv, ro, rd,
            geometry="baked", t_cull=True, tile=TILE,
        )
        (t_d, i_d), dt_dense = timed("dense plain-map", dense, bv, ro, rd)

    t_c, i_c = np.asarray(t_c)[:H], np.asarray(i_c)[:H]
    t_d, i_d = np.asarray(t_d)[:H], np.asarray(i_d)[:H]
    mism_t = float((np.abs(t_c - t_d) > 1e-3).mean())
    mism_i = float((i_c != i_d).mean())
    print(json.dumps({
        "ratio_dense_over_cull": dt_dense / dt_cull,
        "t_mismatch_frac": mism_t, "idx_mismatch_frac": mism_i,
        "verdict_hint": ("stage-2 MXU worth building" if
                         dt_dense / dt_cull < 1.5 else
                         "MXU cannot reach 1.5x bar" if
                         dt_dense / dt_cull > 2.5 else "borderline"),
    }), flush=True)


if __name__ == "__main__":
    main()
