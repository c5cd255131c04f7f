"""Feasibility probe for a fully-fused train-step kernel (round-3 frontier).

Question: can Mosaic compile a Pallas kernel whose body runs jax.vjp over
one bounce of the renderer - implicit-march custom_vjp (culled primal,
one-tap backward), central-difference normals over the PLAIN per-lane-guard
map (no tile-uniform conds in the differentiated graph, sidestepping the
known cond-transpose failure), and the full shade_bounce - at the 64-prim
benchmark scene?  If yes, the XLA shading sweep (the remaining ~2.4 s of
the 3.3 s fwd+bwd step) can move on-chip in round 3.

Usage: python benchmarks/probe_fused_bwd.py   (prints OK/FAIL + timing)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = (64, 128)
N_PRIMS = 64


def main():
    from compute_path_tracer_tpu.diff.vjp import make_implicit_cast
    from compute_path_tracer_tpu.kernels.megakernel import _make_smem_gather_mat
    from compute_path_tracer_tpu.ops.camera import calc_uv, primary_ray
    from compute_path_tracer_tpu.ops.rng import gen_rng, random_float01
    from compute_path_tracer_tpu.render.baked import (
        bake,
        make_bounds_baked,
        make_map_baked,
    )
    from compute_path_tracer_tpu.render.reference import calc_normal, shade_bounce
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene
    from compute_path_tracer_tpu.vecmath import Vec3, vwhere
    from compute_path_tracer_tpu.constants import FP

    cs = compile_scene(benchmark_scene(N_PRIMS))
    spec = cs.spec
    th, tw = TILE
    map_fn = make_map_baked(spec)          # plain per-lane-guard map
    bounds_fn = make_bounds_baked(spec)
    cast_fn = make_implicit_cast(map_fn)   # while-march primal, 1-tap bwd

    def kernel(params_ref, bv_ref, out_ref, grad_ref):
        pv = params_ref

        def bounce_loss(bv):
            xs = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
            ys = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
            rng = gen_rng(xs, ys, jnp.int32(1), 1920, 1080)
            rng, jx = random_float01(rng)
            rng, jy = random_float01(rng)
            u, v = calc_uv(xs.astype(jnp.float32) + (jx - 0.5),
                           ys.astype(jnp.float32) + (jy - 0.5),
                           1920, 1080, jnp.float32(1920 / 1080))
            ro, rd = primary_ray(u, v, jnp.float32(1.0))
            checks, _ = bounds_fn(ro, rd, bv)
            t, idx = cast_fn(map_fn, ro, rd, bv, checks)
            act = t <= FP
            hit = ro + rd * t
            n = calc_normal(map_fn, hit, bv, checks)
            gather = _make_smem_gather_mat(spec, pv)
            mat = gather(idx)
            rng, _nro, _nrd, emit, thr_f, ray_p = shade_bounce(rng, rd, hit, n, mat)
            col = vwhere(act, emit + thr_f / ray_p, Vec3.splat(t * 0.0))
            return jnp.sum(col.x + col.y + col.z)

        bv = bv_ref[...]
        loss, vjp = jax.vjp(bounce_loss, bv)
        (g,) = vjp(jnp.float32(1.0))
        out_ref[0] = loss
        grad_ref[...] = g

    params = jnp.asarray(cs.params, jnp.float32)
    bv = bake(spec, params)

    @jax.jit
    def run(params, bv):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((1,), jnp.float32),
                       jax.ShapeDtypeStruct(bv.shape, jnp.float32)),
        )(params, bv)

    t0 = time.perf_counter()
    try:
        loss, grad = run(params, bv)
        loss = float(np.asarray(loss)[0])
        g = np.asarray(grad)
        print(f"OK: compiled+ran in {time.perf_counter()-t0:.1f}s  "
              f"loss={loss:.4f} grad_finite={np.isfinite(g).all()} "
              f"grad_nonzero={int((np.abs(g) > 0).sum())}/{g.size}")
        return 0
    except Exception as e:
        s = str(e)
        key = next(
            (ln.strip() for ln in s.split("\n")
             if "Mosaic failed" in ln or "Invalid" in ln or "implemented" in ln
             or "Unsupported" in ln or "NotImplemented" in ln),
            s.split("\n")[0],
        )
        print(f"FAIL after {time.perf_counter()-t0:.1f}s: "
              f"{type(e).__name__}: {key[:400]}")
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
