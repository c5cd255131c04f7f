"""Over-relaxed sphere tracing (kernels/megakernel.py:_march_while_tcull
``omega > 1``): the sphere-overlap revert must preserve hit/miss decisions -
stretched steps may re-order taps but can never tunnel through a surface.

_march_while_tcull is plain jnp, so this runs it directly on CPU (no
kernel) over primary rays of the csg scene.
"""

import numpy as np
import jax.numpy as jnp

from compute_path_tracer_tpu.constants import FP, MHD
from compute_path_tracer_tpu.kernels.megakernel import (
    _interval_scalars,
    _march_while_tcull,
)
from compute_path_tracer_tpu.ops.camera import calc_uv, primary_ray
from compute_path_tracer_tpu.render.baked import (
    bake,
    make_bounds_baked,
    make_map_baked_d,
)
from compute_path_tracer_tpu.scene import compile_scene, csg_demo
from compute_path_tracer_tpu.vecmath import Vec3

W, H = 96, 64


def _rays_and_scene():
    cs = compile_scene(csg_demo())
    bv = bake(cs.spec, jnp.asarray(cs.params, jnp.float32))
    xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (H, W))
    ys = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None], (H, W))
    u, v = calc_uv(xs, ys, W, H, jnp.float32(W / H))
    ro, rd = primary_ray(u, v, jnp.float32(1.0))
    ro = Vec3(*(jnp.broadcast_to(c, (H, W)) for c in ro))
    return cs, bv, ro, rd


def _march(omega):
    cs, bv, ro, rd = _rays_and_scene()
    map_d = make_map_baked_d(cs.spec)
    bounds = make_bounds_baked(cs.spec, with_t=True)
    checks, tns, tfs, _ = bounds(ro, rd, bv)
    ivals = _interval_scalars(checks, tns, tfs)
    t, _tp = _march_while_tcull(map_d, ro, rd, bv, checks, ivals, omega=omega)
    return np.asarray(t)


def test_overrelax_preserves_hits():
    t1 = _march(1.0)
    t2 = _march(1.6)
    hit1 = t1 <= FP
    hit2 = t2 <= FP
    # No tunneling: flips must be confined to two benign classes -
    # (a) GRAZING rays: the relaxed march may legally step OVER the
    #     |d| < MHD hit shell that the creeping faithful march enters (the
    #     overlap revert only guarantees d cannot change sign);
    # (b) STEP-BUDGET exits: rays that never reach any surface but exhaust
    #     the 80-step budget below the far plane (e.g. exactly parallel to
    #     the ground plane at constant d) - reference semantics shade these
    #     mid-air (the GLSL loop just ends, test_compute.glsl:74-89), while
    #     the relaxed march's longer steps cross FP first and report a miss.
    # A TUNNELED ray would be a flip with a genuine faithful hit
    # (|d(t1)| < MHD) that is not grazing-incidence - there must be none.
    flips = hit1 != hit2
    assert flips.mean() < 0.02, flips.mean()
    if flips.any():
        cs, bv, ro, rd = _rays_and_scene()
        map_d = make_map_baked_d(cs.spec)
        bounds = make_bounds_baked(cs.spec)
        checks, _ = bounds(ro, rd, bv)
        p1 = ro + rd * jnp.asarray(t1)
        d_at_t1 = np.abs(np.asarray(map_d(p1, bv, checks, None)))
        real_hit1 = d_at_t1 < MHD
        # Grazing test at the faithful hit: a tangential shell-skip has the
        # ray nearly perpendicular to the surface normal; a tunneled
        # CROSSING (impossible by the signed-overlap proof, this guards the
        # implementation) would have bounded-away incidence.
        e = 1e-4

        def tap(dx, dy, dz):
            q = Vec3(p1.x + dx, p1.y + dy, p1.z + dz)
            return map_d(q, bv, checks, None)

        g = Vec3(tap(e, 0, 0) - tap(-e, 0, 0), tap(0, e, 0) - tap(0, -e, 0),
                 tap(0, 0, e) - tap(0, 0, -e)).normalize_safe()
        cos_inc = np.abs(np.asarray(g.dot(rd)))
        bad = flips & real_hit1 & (cos_inc > 0.2)
        assert not bad.any(), int(bad.sum())
    # Hit distances agree to march-epsilon scale on REAL hits (lanes where
    # both marches actually reached a |d| < MHD shell; step-budget exits
    # end wherever their step sequence ran out and are excluded).
    cs, bv, ro, rd = _rays_and_scene()
    map_d = make_map_baked_d(cs.spec)
    bounds = make_bounds_baked(cs.spec)
    checks, _ = bounds(ro, rd, bv)

    def real(t):
        p = ro + rd * jnp.asarray(t)
        return np.abs(np.asarray(map_d(p, bv, checks, None))) < MHD

    both = hit1 & hit2 & real(t1) & real(t2)
    dt = np.abs(t1 - t2)[both]
    assert np.quantile(dt, 0.98) < 10 * MHD, np.quantile(dt, 0.98)


def test_omega_one_is_default_path():
    """omega=1.0 must take the original carry structure (bit-identical
    march)."""
    a = _march(1.0)
    b = _march(1.0)
    np.testing.assert_array_equal(a, b)
