"""Corner-attribution probe (round 5, rotgrad follow-up).

Question: WHY do the silhouette ENDPOINT columns of the rotated-cube
per-column harness (benchmarks/rotgrad_profile.py) keep the wrong sign
(col 24 ratio ~0.03, col 40 sign-flipped) while interior edge columns sit
0.65-1.07?

Three hypotheses measured here:

1. **Argmin misattribution** (the round-5 outlook's guess): the
   closest-approach argmin switches between two edges and the
   single-point Danskin d(d_min)/dtheta is wrong at corner rows.
   MEASURED FALSE: per-pixel Danskin matches the FD of d_min itself
   within ~10% at every in-band corner row (``danskin_vs_fd`` rows).
2. **Softmax blend of the two tracked valleys** (shipped): blending the
   two valleys' Danskin gradients with distance-softmax weights
   interpolates across the argmin switch.  Measured mildly positive
   (column totals 0.74 -> 0.79 on the unweighted objective, corner
   columns improved, interior unchanged) - this is the configuration
   that ships (diff/vjp.py:make_closest_approach ``tie_scale``).
3. **Gated product-of-ramps coverage** (c = sigma1 * sigma2 when the
   second valley competes in-band with a distinct normal): the
   theoretically right model for a convex screen corner, MEASURED
   NET-NEGATIVE (corner columns toward 0 but in-band columns 0.88 ->
   0.58, total 0.74 -> 0.61).  Root cause: d2 is the ray's 3D proximity
   to the second surface, NOT the signed screen distance to that
   surface's silhouette line - a ray can pass 0.06 from a face whose
   visibility boundary is nowhere near the pixel, so sigma(d2) misreads
   along-edge pixels as "mostly outside edge B".  A faithful corner
   model needs explicit screen-space silhouette geometry (future-round
   scope).

Writes benchmarks/artifacts/corner_attrib_r05.jsonl.

Reference anchor: the hit/miss boundary of the march,
test_compute.glsl:74-89.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from compute_path_tracer_tpu.constants import DEFAULT_FOV
    from compute_path_tracer_tpu.diff import vjp as V
    from compute_path_tracer_tpu.ops.camera import calc_uv, primary_ray
    from compute_path_tracer_tpu.render.scenegen import make_bounds, make_map
    from compute_path_tracer_tpu.scene import (
        KIND_CUBE, Scene, Shape, Union, compile_scene,
    )

    W = H = 64
    RZ = 0.4
    COL = 40  # right silhouette-endpoint column of the rz=0.4 pose

    root = Union(name="Root")
    box = root.add_shape(Shape(KIND_CUBE, name="Box"))
    box.size3.set(0.55, 0.35, 0.55)
    box.material.brightness.set(2.0)
    box.material.light_col.set(1.0, 1.0, 1.0)
    cs = compile_scene(Scene([root]))
    sh = cs.spec.roots[0].children_shapes[0]
    base = np.asarray(cs.params, np.float32)
    slot = sh.transform.rot[2]
    base[slot] = RZ

    map_fn = make_map(cs.spec)
    bounds_fn = make_bounds(cs.spec)

    def rays(col):
        ys = jnp.arange(H, dtype=jnp.float32)
        xs = jnp.full((H,), float(col), jnp.float32)
        u, v = calc_uv(xs, ys, W, H, 1.0)
        return primary_ray(u, v, jnp.float32(DEFAULT_FOV))

    closest = V.make_closest_approach(map_fn)
    tie = 2.0 * 0.5 / (H * DEFAULT_FOV)

    def dmin_sum(pv, col, cot, tie_scale):
        ro, rd = rays(col)
        checks, _ = bounds_fn(ro, rd, pv)
        d1, _, _ = closest(ro, rd, pv, checks, tie_scale=tie_scale)
        return jnp.sum(d1 * cot)

    rows = []
    ro, rd = rays(COL)
    pv0 = jnp.asarray(base)
    checks, _ = bounds_fn(ro, rd, pv0)
    d1_0 = np.asarray(V._march_closest(map_fn, ro, rd, pv0, checks)[0])
    in_band = [r for r in range(H) if abs(d1_0[r]) < 0.05]
    for r in in_band:
        cot = np.zeros(H, np.float32)
        cot[r] = 1.0
        g_single = jax.grad(
            lambda p: dmin_sum(p, COL, jnp.asarray(cot), None))(pv0)[slot]
        g_blend = jax.grad(
            lambda p: dmin_sum(p, COL, jnp.asarray(cot), tie))(pv0)[slot]
        eps = 0.01
        bp = base.copy()
        bp[slot] += eps
        bm = base.copy()
        bm[slot] -= eps

        def d1_of(b):
            pv = jnp.asarray(b)
            ck, _ = bounds_fn(ro, rd, pv)
            return float(np.asarray(
                V._march_closest(map_fn, ro, rd, pv, ck)[0])[r])

        fd = (d1_of(bp) - d1_of(bm)) / (2 * eps)
        rows.append({
            "kind": "danskin_vs_fd", "col": COL, "row": r,
            "danskin": round(float(g_single), 4),
            "blend": round(float(g_blend), 4),
            "fd_dmin": round(fd, 4),
        })
        print(json.dumps(rows[-1]))

    rows.append({
        "kind": "summary",
        "softmax_blend": "SHIPPED: column totals 0.74 -> 0.79, corner "
                         "cols improved (24: 0.03 -> 0.09, 40: -0.24 -> "
                         "-0.20), interior unchanged",
        "gated_product": "REJECTED: corner cols toward 0 (24 -> -0.002, "
                         "40 -> -0.15) but in-band cols 0.88 -> 0.58 and "
                         "total 0.74 -> 0.61; d2 is 3D surface proximity, "
                         "not signed screen distance to the second "
                         "silhouette line",
        "residual": "endpoint-column sign error is a coverage-MODEL "
                    "limitation (sigma(d_min) cannot represent corner "
                    "coverage); Danskin attribution verified correct "
                    "within ~10% per pixel",
    })
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "corner_attrib_r05.jsonl")
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(json.dumps({"wrote": out}))


if __name__ == "__main__":
    main()
