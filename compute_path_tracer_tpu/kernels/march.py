"""Standalone Pallas sphere-march kernel with an implicit-gradient backward.

The differentiable renderer (diff/vjp.py) marches rays inside the XLA bounce
loop; at 1080p that march dominates BOTH directions of a training step (the
forward executes up to 80 map taps per segment, and reverse-mode would tape
them).  This module moves the march - and only the march - on-chip:

* forward: a Pallas kernel over (tile_h, tile_w) ray tiles running the same
  bounds -> t-interval-culled march -> final-id re-tap pipeline as the
  megakernel (kernels/megakernel.py), for ARBITRARY ray planes (secondary
  bounces included), reference semantics test_compute.glsl:74-89;
* backward: the O(1)-memory implicit-function gradient of diff/vjp.py
  (dt*/dtheta = -f_theta / (f_p . rd) at the hit point) evaluated as ONE
  map vjp in XLA - no tape, no replay.

``make_pallas_cast`` adapts it to the ``cast_fn`` slot of
render/reference.py:path_trace, so render_pixels_diff can swap the XLA
march for this kernel without touching the shading/bounce code.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import FP
from ..render.baked import make_bounds_baked, make_map_baked, make_map_baked_d
from ..render.scenegen import make_bounds, make_map, make_map_culled_d
from ..scene.compile import SceneSpec
from ..vecmath import Vec3
from .megakernel import (
    _anyhit,
    _final_idx,
    _interval_scalars,
    _march_while,
    _march_while_tcull,
)

DEFAULT_TILE = (64, 128)


def _make_march_kernel(spec: SceneSpec, geometry: str, t_cull: bool,
                       with_normal: bool = False):
    baked = geometry == "baked"
    if baked:
        map_ids = make_map_baked(spec)
        map_d = make_map_baked_d(spec)
        bounds_fn = make_bounds_baked(spec, with_t=t_cull)
    else:
        from ..render.scenegen import make_map_culled

        map_ids = make_map_culled(spec)
        map_d = make_map_culled_d(spec)
        bounds_fn = make_bounds(spec, with_t=t_cull)

    def kernel(gv_ref, rox, roy, roz, rdx, rdy, rdz, t_ref, idx_ref,
               *n_refs):
        gv = gv_ref
        ro = Vec3(rox[:], roy[:], roz[:])
        rd = Vec3(rdx[:], rdy[:], rdz[:])
        if t_cull:
            checks, tns, tfs, _dbg = bounds_fn(ro, rd, gv)
            ivals = _interval_scalars(checks, tns, tfs)
            t, tp = _march_while_tcull(map_d, ro, rd, gv, checks, ivals)
        else:
            checks, _dbg = bounds_fn(ro, rd, gv)
            t, tp = _march_while(map_d, ro, rd, gv, checks, _anyhit(checks))
        anyhit = _anyhit(checks)
        idx = _final_idx(map_ids, ro, rd, gv, checks, anyhit, t, tp)
        t_ref[:] = t
        idx_ref[:] = idx
        if with_normal:
            from ..render.reference import calc_normal

            def map_with_dummy_id(p, pv, ch):
                return map_d(p, pv, ch), None

            # Same tile-uniform skip as the megakernel's aux taps: when no
            # lane hit, the (irrelevant) normal is a constant - miss lanes'
            # normals are masked out of every consumer in path_trace.
            hit_any = jnp.any(t <= FP)

            def taps(_):
                return calc_normal(map_with_dummy_id, ro + rd * t, gv, checks)

            def sky(_):
                z = rox[:] * 0.0
                return Vec3(z, z, z + 1.0)

            n = lax.cond(hit_any, taps, sky, None)
            n_refs[0][:] = n.x
            n_refs[1][:] = n.y
            n_refs[2][:] = n.z

    return kernel


@partial(
    jax.jit,
    static_argnames=("spec", "geometry", "t_cull", "tile_h", "tile_w",
                     "interpret", "with_normal"),
)
def _march_planes(spec, gv, rox, roy, roz, rdx, rdy, rdz, *,
                  geometry, t_cull, tile_h, tile_w, interpret,
                  with_normal=False):
    h, w = rox.shape
    kernel = _make_march_kernel(spec, geometry, t_cull, with_normal)
    tile = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jax.ShapeDtypeStruct((h, w), jnp.float32)
    out_shape = (f32, jax.ShapeDtypeStruct((h, w), jnp.int32))
    n_out = 2
    if with_normal:
        out_shape = out_shape + (f32, f32, f32)
        n_out = 5
    return pl.pallas_call(
        kernel,
        grid=(h // tile_h, w // tile_w),
        in_specs=[smem] + [tile] * 6,
        out_specs=(tile,) * n_out,
        out_shape=out_shape,
        interpret=interpret,
    )(gv, rox, roy, roz, rdx, rdy, rdz)


def march_pallas(spec: SceneSpec, gv, ro: Vec3, rd: Vec3, *,
                 geometry: str = "baked", t_cull: bool = True,
                 tile=DEFAULT_TILE, interpret: bool = False,
                 with_normal: bool = False):
    """March arbitrary (H, W) ray planes on-chip; returns ``(t, idx)``, or
    ``(t, idx, n)`` with ``with_normal=True`` (the 6-tap central-difference
    normal evaluated in-kernel on the culled map, funcs.glsl:21-35).

    Rays are padded up to tile multiples with benign far-miss rays (origin
    far outside the scene pointing away: one map tap, immediate far-plane
    exit) and cropped on return.
    """
    h, w = ro.x.shape
    th, tw = tile
    th = min(th, max(8, h - h % 8)) if h < th else th
    ph = -(-h // th) * th
    pw = -(-w // tw) * tw

    def pad(x, fill):
        if (ph, pw) == (h, w):
            return x
        return jnp.pad(x, ((0, ph - h), (0, pw - w)), constant_values=fill)

    args = (
        pad(ro.x, 4.0 * FP), pad(ro.y, 0.0), pad(ro.z, 0.0),
        pad(rd.x, 1.0), pad(rd.y, 0.0), pad(rd.z, 0.0),
    )
    out = _march_planes(
        spec, gv, *args,
        geometry=geometry, t_cull=t_cull, tile_h=th, tile_w=tw,
        interpret=interpret, with_normal=with_normal,
    )
    if with_normal:
        t, idx, nx, ny, nz = out
        return t[:h, :w], idx[:h, :w], Vec3(
            nx[:h, :w], ny[:h, :w], nz[:h, :w]
        )
    t, idx = out
    return t[:h, :w], idx[:h, :w]


# Denominator clamp shared with diff/vjp.py's implicit gradient.
_DENOM_EPS = 1e-6


def _make_cast_custom_vjp(spec: SceneSpec, map_fn, *, geometry, t_cull, tile,
                          interpret, with_normal):
    """The shared custom_vjp over the Pallas march: kernel primal, implicit
    O(1)-memory gradient backward (diff/vjp.py:make_implicit_cast's design
    with the 80-tap XLA march replaced by the on-chip kernel in both the
    primal and the recompute-free backward).  ``with_normal`` only changes
    the primal's output arity; the backward is identical (``cots[0]`` is the
    hit-t cotangent either way; idx/normal outputs are non-differentiable)."""

    @jax.custom_vjp
    def cast(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, gv, checks):
        del checks  # the kernel recomputes per-lane guards internally
        return march_pallas(
            spec, gv, Vec3(ro_x, ro_y, ro_z), Vec3(rd_x, rd_y, rd_z),
            geometry=geometry, t_cull=t_cull, tile=tile, interpret=interpret,
            with_normal=with_normal,
        )

    def fwd(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, gv, checks):
        out = cast(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, gv, checks)
        t = out[0]
        return out, (Vec3(ro_x, ro_y, ro_z), Vec3(rd_x, rd_y, rd_z),
                     t, gv, checks)

    def bwd(res, cots):
        ro, rd, t, gv, checks = res
        t_cot = cots[0]  # idx (+ normal) outputs are non-differentiable
        p = ro + rd * t

        def f_of_p(px, py, pz, params):
            d, _ = map_fn(Vec3(px, py, pz), params, checks)
            return jnp.sum(d)

        _, vjp_fn = jax.vjp(f_of_p, p.x, p.y, p.z, gv)
        gpx, gpy, gpz, _ = vjp_fn(jnp.float32(1.0))
        g_p = Vec3(gpx, gpy, gpz)
        denom = g_p.dot(rd)
        safe = jnp.abs(denom) > _DENOM_EPS
        inv_denom = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)
        scale = -t_cot * inv_denom

        def f_theta_seeded(params):
            d, _ = map_fn(
                Vec3(lax.stop_gradient(p.x), lax.stop_gradient(p.y),
                     lax.stop_gradient(p.z)), params, checks)
            return jnp.sum(d * lax.stop_gradient(scale))

        gv_cot = jax.grad(f_theta_seeded)(gv)
        ro_cot = g_p * scale
        rd_cot = g_p * (scale * t)
        checks_cot = tuple(
            None if c is None else np.zeros(c.shape, jax.dtypes.float0)
            for c in checks
        )
        return (ro_cot.x, ro_cot.y, ro_cot.z,
                rd_cot.x, rd_cot.y, rd_cot.z, gv_cot, checks_cot)

    cast.defvjp(fwd, bwd)
    return cast


def make_pallas_cast(spec: SceneSpec, *, geometry: str = "baked",
                     t_cull: bool = True, tile=DEFAULT_TILE,
                     interpret: bool = False):
    """Drop-in ``cast_fn`` for path_trace: Pallas march forward, implicit
    O(1)-memory gradient backward."""
    if geometry == "baked":
        map_fn = make_map_baked(spec)
    else:
        map_fn = make_map(spec)
    cast = _make_cast_custom_vjp(
        spec, map_fn, geometry=geometry, t_cull=t_cull, tile=tile,
        interpret=interpret, with_normal=False,
    )

    def cast_fn(map_fn_unused, ro, rd, gv, checks):
        return cast(ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, gv, checks)

    return cast_fn


def make_pallas_cast_with_normal(spec: SceneSpec, *, geometry: str = "baked",
                                 t_cull: bool = True, tile=(32, 128),
                                 interpret: bool = False):
    """``(cast_fn, normal_fn)`` pair for path_trace where the march kernel
    ALSO emits the surface normal in-kernel (culled 6-tap central difference)
    and the normal is DETACHED from the backward.

    This is the fused realization of ``normals="detached"``: the rendered
    value matches the reference's central-difference shading exactly on every
    consumed lane, the hit-t keeps its O(1) implicit gradient, and neither
    direction of the training step executes a normal tap in XLA - the 6
    forward taps move on-chip and the (pruned) reverse taps disappear
    entirely.  The two functions share the per-trace ``cell``: path_trace
    always calls ``cast_fn`` before ``normal_fn`` inside the same bounce
    iteration (render/reference.py:path_trace body), so the stashed traced
    normal is the one belonging to the current segment.

    Default tile is (32, 128), not the megakernel's (64, 128): the three
    extra normal output planes plus the tap temporaries overflow the 16 MiB
    scoped-VMEM budget at (64, 128) (measured: 16.37M > 16M on v5e).
    """
    if geometry == "baked":
        map_fn = make_map_baked(spec)
    else:
        map_fn = make_map(spec)
    cast = _make_cast_custom_vjp(
        spec, map_fn, geometry=geometry, t_cull=t_cull, tile=tile,
        interpret=interpret, with_normal=True,
    )

    cell = {}

    def cast_fn(map_fn_unused, ro, rd, gv, checks):
        t, idx, n = cast(ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, gv, checks)
        sg = lax.stop_gradient
        cell["n"] = Vec3(sg(n.x), sg(n.y), sg(n.z))
        return t, idx

    def normal_fn(map_fn_unused, p, pv_unused, checks_unused, _idx):
        if "n" not in cell:
            raise RuntimeError(
                "normal_fn must be called after cast_fn from the same "
                "make_pallas_cast_with_normal pair (path_trace calls them in "
                "that order within each bounce); no stashed normal found"
            )
        return cell["n"]

    return cast_fn, normal_fn
