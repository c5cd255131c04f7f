"""Cost probe for the fused trainer's OUTSIDE-kernel reductions.

kernels/train.py keeps exactly two pieces of the backward in XLA (the 1-D
parameter scatters Mosaic cannot lower): the batched f_theta map vjp over
all (bounce, pixel) hit points, and the material gather transpose.  This
probe times each at the bench shape (1080p, 64 prims, 9 segments) so the
fused step's time budget is attributable term by term.

Run: python benchmarks/probe_outside_reduction.py
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

W, H, B1, N_PRIMS = 1920, 1088, 9, 64


def main():
    from compute_path_tracer_tpu.app.tpulock import tpu_lock
    from compute_path_tracer_tpu.render.baked import (
        bake, make_bounds_baked, make_map_baked,
    )
    from compute_path_tracer_tpu.render.reference import gather_material
    from compute_path_tracer_tpu.render.scenegen import material_slot_matrix
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene
    from compute_path_tracer_tpu.vecmath import Vec3

    cs = compile_scene(benchmark_scene(N_PRIMS))
    params = jnp.asarray(cs.params, jnp.float32)
    bv = bake(cs.spec, params)
    map_fn = make_map_baked(cs.spec)
    bounds_fn = make_bounds_baked(cs.spec)

    rows = B1 * H
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    RO = Vec3(*(jax.random.normal(k, (rows, W), jnp.float32) for k in ks[:3]))
    RD = Vec3(*(jax.random.normal(k, (rows, W), jnp.float32) + 0.1
                for k in ks[3:6]))
    T = jax.random.uniform(ks[6], (rows, W), jnp.float32, 0.0, 10.0)
    SCALE = jax.random.normal(ks[7], (rows, W), jnp.float32)
    IDX = jnp.tile(
        jnp.arange(W, dtype=jnp.int32)[None, :] % (N_PRIMS + 1) - 1, (rows, 1)
    )
    COT = tuple(jax.random.normal(k, (rows, W), jnp.float32)
                for k in jax.random.split(ks[0], 13))

    def timed(name, fn, *args):
        def sync(o):
            np.asarray(jax.tree.leaves(o)[0]).ravel()[:2].sum()

        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"probe": name, "ms": dt * 1e3}), flush=True)
        return dt

    # NOTE: every plane is a jit ARGUMENT - closing over full-res arrays
    # embeds them as HLO constants and the axon remote-compile endpoint
    # rejects the oversized program body (HTTP 413; observed round 3).
    @jax.jit
    def geom_vjp(bvv, rox, roy, roz, rdx, rdy, rdz, t, scale):
        from compute_path_tracer_tpu.vecmath import Vec3 as V

        ro = V(rox, roy, roz)
        rd = V(rdx, rdy, rdz)

        def f(b):
            checks, _ = bounds_fn(ro, rd, jax.lax.stop_gradient(b))
            p = ro + rd * t
            d, _ = map_fn(p, b, checks)
            return jnp.sum(d * scale)
        return jax.grad(f)(bvv)

    @jax.jit
    def geom_fwd_only(bvv, rox, roy, roz, rdx, rdy, rdz, t, scale):
        from compute_path_tracer_tpu.vecmath import Vec3 as V

        ro = V(rox, roy, roz)
        rd = V(rdx, rdy, rdz)
        checks, _ = bounds_fn(ro, rd, bvv)
        p = ro + rd * t
        d, _ = map_fn(p, bvv, checks)
        return jnp.sum(d * scale)

    slots = jnp.asarray(material_slot_matrix(cs.spec))

    @jax.jit
    def mat_vjp(pp, idx, cot):
        mt, vjp = jax.vjp(lambda q: q[slots], pp)

        def f(m):
            g = gather_material(m, idx)
            flat = (g.col.x, g.col.y, g.col.z, g.brightness, g.light.x,
                    g.light.y, g.light.z, g.spec, g.spec_col.x, g.spec_col.y,
                    g.spec_col.z, g.roughness, g.refract_chance)
            return sum(jnp.sum(a * b) for a, b in zip(flat, cot))
        (out,) = vjp(jax.grad(f)(mt))
        return out

    plane_args = (RO.x, RO.y, RO.z, RD.x, RD.y, RD.z, T, SCALE)
    with tpu_lock():
        timed("map fwd tap, stacked (B1*H, W)", geom_fwd_only, bv,
              *plane_args)
        timed("geom f_theta vjp, stacked", geom_vjp, bv, *plane_args)
        timed("material gather transpose", mat_vjp, params, IDX, COT)


if __name__ == "__main__":
    main()
