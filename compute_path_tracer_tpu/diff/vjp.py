"""Differentiation of rendered pixels w.r.t. scene parameters.

The capability the reference does not have (its ``data[]`` buffer is the
natural differentiable surface, SURVEY.md §3.3): gradients of the image with
respect to the flat parameter vector, for inverse rendering and
gradient-based scene optimization.

Two paths:

* **plain autodiff**: with a static bounce count every loop in the oracle
  renderer is a scan, so ``jax.grad`` just works - O(STEPS) residual memory
  per march.
* **implicit-function march** (:func:`make_implicit_cast`): the sphere march
  is wrapped in a ``jax.custom_vjp`` that treats the hit distance t* as the
  root of f(ro + t rd, theta) = 0 and back-propagates with

      dt*/dtheta = -f_theta / (f_p . rd),
      dt*/dro    = -f_p     / (f_p . rd),
      dt*/drd    = -t* f_p  / (f_p . rd),

  evaluated at the hit point - one extra map vjp instead of an 80-step tape
  (the core design decision flagged in SURVEY.md §7 "Backward through an
  80-step march").

Both capture only the smooth shading/geometry terms; silhouette (visibility)
discontinuities need edge reparameterization, tracked as a roadmap item.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import DEFAULT_FOV
from ..render.reference import cast_ray, render_pixels
from ..render import reference as _ref
from ..render.scenegen import make_bounds, make_map, material_slot_matrix
from ..scene.compile import SceneSpec
from ..vecmath import Vec3

# Denominator clamp for the implicit gradient: |f_p . rd| below this means a
# grazing/degenerate hit where the implicit derivative blows up.
_DENOM_EPS = 1e-6


def make_implicit_cast(map_fn):
    """Build a drop-in ``cast_fn`` for path_trace with an O(1)-memory
    implicit-gradient backward pass."""

    @jax.custom_vjp
    def cast(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, pv, checks):
        ro = Vec3(ro_x, ro_y, ro_z)
        rd = Vec3(rd_x, rd_y, rd_z)
        t, idx = cast_ray(map_fn, ro, rd, pv, checks)
        return t, idx

    def fwd(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, pv, checks):
        ro = Vec3(ro_x, ro_y, ro_z)
        rd = Vec3(rd_x, rd_y, rd_z)
        t, idx = cast_ray(map_fn, ro, rd, pv, checks)
        return (t, idx), (ro, rd, t, pv, checks)

    def bwd(res, cots):
        ro, rd, t, pv, checks = res
        t_cot, _idx_cot = cots

        p = ro + rd * t

        # Per-lane spatial gradient f_p of the scene SDF at the hit points:
        # one vjp of sum(d) w.r.t. the (elementwise-independent) positions.
        def f_of_p(px, py, pz, params):
            d, _ = map_fn(Vec3(px, py, pz), params, checks)
            return jnp.sum(d)

        _, vjp_fn = jax.vjp(f_of_p, p.x, p.y, p.z, pv)
        gpx, gpy, gpz, _ = vjp_fn(jnp.float32(1.0))
        g_p = Vec3(gpx, gpy, gpz)
        denom = g_p.dot(rd)
        safe = jnp.abs(denom) > _DENOM_EPS
        inv_denom = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)

        # Miss lanes (idx < 0 ~ t past far plane) and grazing hits get zero
        # gradient: t* is not a differentiable function of inputs there.
        scale = -t_cot * inv_denom  # dL/dt * dt/d(.) common factor

        def f_theta_seeded(params):
            d, _ = map_fn(Vec3(
                lax.stop_gradient(p.x), lax.stop_gradient(p.y),
                lax.stop_gradient(p.z)), params, checks)
            return jnp.sum(d * lax.stop_gradient(scale))

        pv_cot = jax.grad(f_theta_seeded)(pv)

        ro_cot = g_p * scale
        rd_cot = g_p * (scale * t)

        checks_cot = tuple(
            None if c is None else np.zeros(c.shape, jax.dtypes.float0)
            for c in checks
        )
        return (
            ro_cot.x, ro_cot.y, ro_cot.z,
            rd_cot.x, rd_cot.y, rd_cot.z,
            pv_cot,
            checks_cot,
        )

    cast.defvjp(fwd, bwd)

    def cast_fn(map_fn_unused, ro, rd, pv, checks):
        return cast(ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, pv, checks)

    return cast_fn


def render_pixels_diff(
    spec: SceneSpec,
    params,
    xs,
    ys,
    frame,
    bounces: int,
    fov,
    aspect,
    *,
    width: int,
    height: int,
    implicit: bool = True,
) -> Vec3:
    """Differentiable path-traced pixels: static bounce count (scan loops)
    and, with ``implicit=True``, the O(1)-memory march backward."""
    if not implicit:
        return render_pixels(
            spec, params, xs, ys, frame, bounces, fov, aspect,
            width=width, height=height, debug=0,
        )
    map_fn = make_map(spec)
    bounds_fn = make_bounds(spec)
    mat_table = params[jnp.asarray(material_slot_matrix(spec))]

    def gather_mat(idx):
        return _ref.gather_material(mat_table, idx)

    from ..ops.camera import calc_uv, primary_ray
    from ..ops.rng import gen_rng, random_float01

    rng = gen_rng(xs, ys, frame, width, height)
    rng, jx = random_float01(rng)
    rng, jy = random_float01(rng)
    u, v = calc_uv(
        xs.astype(jnp.float32) + (jx - 0.5),
        ys.astype(jnp.float32) + (jy - 0.5),
        width, height, aspect,
    )
    ro, rd = primary_ray(u, v, fov)
    cast_fn = make_implicit_cast(map_fn)
    col, _ = _ref.path_trace(
        map_fn, bounds_fn, gather_mat, ro, rd, params, rng, bounces,
        cast_fn=cast_fn,
    )
    return col


@partial(
    jax.jit,
    static_argnames=("spec", "width", "height", "bounces", "spp", "implicit"),
)
def render_image_diff(
    spec: SceneSpec,
    params,
    *,
    width: int,
    height: int,
    bounces: int = 2,
    spp: int = 1,
    fov: float = DEFAULT_FOV,
    aspect: float = None,
    implicit: bool = True,
):
    """Differentiable full-frame render, averaging ``spp`` RNG streams
    (frames) per pixel.  Returns (H, W, 3)."""
    if aspect is None:
        aspect = width / height
    xs = lax.broadcasted_iota(jnp.int32, (height, width), 1)
    ys = lax.broadcasted_iota(jnp.int32, (height, width), 0)

    def one(f):
        return render_pixels_diff(
            spec, params, xs, ys, f, bounces,
            jnp.float32(fov), jnp.float32(aspect),
            width=width, height=height, implicit=implicit,
        ).stack()

    acc = one(jnp.int32(0))
    for s in range(1, spp):
        acc = acc + one(jnp.int32(s))
    return acc / float(spp)


def make_loss(
    spec: SceneSpec,
    target,
    *,
    width: int,
    height: int,
    bounces: int = 2,
    spp: int = 1,
    implicit: bool = True,
):
    """MSE-to-target loss over a differentiable render; use with jax.grad."""
    target = jnp.asarray(target, jnp.float32)

    def loss(params):
        img = render_image_diff(
            spec, params, width=width, height=height, bounces=bounces,
            spp=spp, implicit=implicit,
        )
        return jnp.mean((img - target) ** 2)

    return loss
