"""Analytic-intersection probe: the last live forward lever, measured.

The benchmark scene's guard-less shapes (ground plane + two lamp spheres,
``if (true)`` in the reference codegen) are evaluated at EVERY map tap by
every lane - ~3 of the ~12 average active shapes, ~25% of all map work
(ROADMAP).  They are also the only primitives with trivial closed forms:
a half-space and spheres intersect a ray analytically.

Variant: per lane, compute the nearest analytic hit t_cap over the
guard-less shapes, march the map WITH THOSE SHAPES REMOVED, and terminate
each lane at min(march hit, t_cap).  Semantic delta is eps-class: analytic
winners land ON the surface instead of inside the |d| < MHD shell, and
creeping budget-exit rays resolve exactly (the same divergence classes as
tests/test_overrelax.py documents).

Prints baseline vs variant march time + mismatch stats; >1.15x adopts the
design for round-4 integration (full megakernel: winner ids, analytic
normals, bounce loop), below that it joins the measured negatives.

Run: python benchmarks/analytic_probe.py
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


def _make_capped_kernel(spec):
    from compute_path_tracer_tpu.constants import FP, MHD, STEPS
    from compute_path_tracer_tpu.kernels.megakernel import (
        _BIG, _interval_scalars,
    )
    from compute_path_tracer_tpu.render.baked import (
        _leaf_distance, baked_layout, baked_shapes_in_order,
        make_bounds_baked,
    )
    from compute_path_tracer_tpu.scene.model import KIND_PLANE, KIND_SPHERE
    from compute_path_tracer_tpu.vecmath import Vec3

    layout = baked_layout(spec)
    shapes = baked_shapes_in_order(spec)
    unboxed = tuple(bs for bs in shapes if not bs.aabb)
    boxed = tuple(bs for bs in shapes if bs.aabb)
    assert all(bs.kind in (KIND_PLANE, KIND_SPHERE) for bs in unboxed), (
        "probe handles plane/sphere guard-less shapes only"
    )
    bounds_fn = make_bounds_baked(spec, with_t=True)

    def boxed_map(p, bv, checks, active):
        """Min-fold over the BOXED shapes only (union-only scene), with the
        same per-lane guards + tile-uniform cond skipping as the culled
        map."""
        d = jnp.full_like(p.x, jnp.float32(_BIG))
        for bs in boxed:
            act = active[bs.shape_id]

            def eval_shape(dd, bs=bs):
                ld = _leaf_distance(bs, p, bv)
                g = checks[bs.shape_id]
                return jnp.where(g, jnp.minimum(dd, ld), dd)

            if act is None:
                d = eval_shape(d)
            else:
                d = lax.cond(act, eval_shape, lambda dd: dd, d)
        return d

    def analytic_cap(ro, rd, bv):
        """Nearest closed-form hit over the guard-less shapes (or BIG)."""
        cap = jnp.full_like(ro.x, jnp.float32(_BIG))
        for bs in unboxed:
            o = bs.off
            if bs.kind == KIND_PLANE:
                # d(p) = n.p + off ; hit where d(ro + t rd) = 0
                denom = bv[o] * rd.x + bv[o + 1] * rd.y + bv[o + 2] * rd.z
                f0 = bv[o] * ro.x + bv[o + 1] * ro.y + bv[o + 2] * ro.z + bv[o + 3]
                ok = jnp.abs(denom) > 1e-12
                t = jnp.where(ok, -f0 / jnp.where(ok, denom, 1.0),
                              jnp.float32(_BIG))
                t = jnp.where(t > 0.0, t, jnp.float32(_BIG))
            else:
                # sphere |p - c| = r
                ocx = ro.x - bv[o]
                ocy = ro.y - bv[o + 1]
                ocz = ro.z - bv[o + 2]
                r = bv[o + 3]
                b = ocx * rd.x + ocy * rd.y + ocz * rd.z
                c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                disc = b * b - c  # |rd| == 1
                hit = disc >= 0.0
                root = jnp.sqrt(jnp.where(hit, disc, 0.0))
                t0 = -b - root
                t1 = -b + root
                t = jnp.where(t0 > 0.0, t0, jnp.where(t1 > 0.0, t1,
                                                      jnp.float32(_BIG)))
                t = jnp.where(hit, t, jnp.float32(_BIG))
            cap = jnp.minimum(cap, t)
        return cap

    def kernel(gv_ref, rox, roy, roz, rdx, rdy, rdz, t_ref):
        gv = gv_ref
        ro = Vec3(rox[:], roy[:], roz[:])
        rd = Vec3(rdx[:], rdy[:], rdz[:])
        checks, tns, tfs, _ = bounds_fn(ro, rd, gv)
        ivals = _interval_scalars(checks, tns, tfs)
        t_cap = analytic_cap(ro, rd, gv)

        t0 = ro.x * 0.0
        done0 = t0.astype(jnp.int32)

        def cond(c):
            step, _t, done_i = c
            return jnp.logical_and(step < STEPS, jnp.min(done_i) < 1)

        def body(c):
            step, t, done_i = c
            done = done_i != 0
            t_hi = jnp.max(jnp.where(done, -jnp.float32(_BIG), t))
            t_lo = jnp.min(jnp.where(done, jnp.float32(_BIG), t))
            active = [None] * layout.n_shapes
            m = jnp.float32(_BIG)
            for bs in boxed:
                iv = ivals[bs.shape_id]
                if iv is None:
                    continue
                any_h, tn_min, tf_max = iv
                nr = tn_min > t_hi
                active[bs.shape_id] = any_h & ~nr & (tf_max >= t_lo)
                m = jnp.where(any_h & nr, jnp.minimum(m, tn_min), m)

            p = ro + rd * t
            d = boxed_map(p, gv, checks, tuple(active))
            ad = jnp.abs(d)
            step_len = jnp.minimum(ad, jnp.maximum(m - t, MHD))
            nt = jnp.where(done, t, t + step_len)
            # Per-lane analytic cap: a lane whose march front passes its
            # nearest guard-less hit stops THERE.
            capped = nt >= t_cap
            nt = jnp.where(done, t, jnp.minimum(nt, t_cap))
            ndone = done | (ad < MHD) | capped | (nt > FP)
            return step + 1, nt, ndone.astype(jnp.int32)

        _, t, _ = lax.while_loop(cond, body, (jnp.int32(0), t0, done0))
        t_ref[:] = t

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

    kernel = _make_capped_kernel(cs.spec)
    tile = pl.BlockSpec(TILE, lambda i, j: (i, j), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def capped(gv, ro, rd):
        return pl.pallas_call(
            kernel,
            grid=(ph // TILE[0], W // TILE[1]),
            in_specs=[smem] + [tile] * 6,
            out_specs=tile,
            out_shape=jax.ShapeDtypeStruct((ph, W), jnp.float32),
        )(gv, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z)

    def timed(name, fn, *a, **k):
        out = fn(*a, **k)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:2].sum()
        # Many reps: on the axon platform per-launch transport jitter can
        # reach tens of ms, swamping a ~25 ms device op at low rep counts
        # (observed 25 -> 99 ms run-to-run at reps=5).
        t0 = time.perf_counter()
        reps = 40
        for _ in range(reps):
            out = fn(*a, **k)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:2].sum()
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"variant": name, "ms": dt * 1e3}), flush=True)
        return out, dt

    with tpu_lock():
        (t_base, _i), dt_base = timed(
            "t_cull march (baseline)", march_pallas, cs.spec, bv, ro, rd,
            geometry="baked", t_cull=True, tile=TILE,
        )
        t_cap, dt_cap = timed("analytic-capped march", capped, bv, ro, rd)

    # Clamp at the far plane before comparing: both marches agree a lane
    # MISSED, but their past-FP sentinel t values are arbitrary.
    from compute_path_tracer_tpu.constants import FP as _FP
    a = np.minimum(np.asarray(t_base)[:H], _FP + 1.0)
    b = np.minimum(np.asarray(t_cap)[:H], _FP + 1.0)
    d = np.abs(a - b)
    ratio = dt_base / dt_cap
    print(json.dumps({
        "speedup": ratio,
        "t_diff_p50": float(np.quantile(d, 0.5)),
        "t_diff_p99": float(np.quantile(d, 0.99)),
        "t_diff_over_5mhd_frac": float((d > 5e-3).mean()),
        "verdict_hint": ("adopt for round-4 integration" if ratio > 1.15
                         else "joins the measured negatives"),
    }), flush=True)


if __name__ == "__main__":
    main()
