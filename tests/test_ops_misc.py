"""AABB, camera and tonemap unit tests (reference: aabb.glsl, funcs.glsl,
render_texture_shader.wgsl)."""

import numpy as np
import jax.numpy as jnp

from compute_path_tracer_tpu.ops import aabb, camera, tonemap
from compute_path_tracer_tpu.vecmath import Vec3


def V(x, y, z):
    return Vec3(jnp.float32(x), jnp.float32(y), jnp.float32(z))


def test_aabb_hit_straight_through():
    ro, rd = V(0, 0, -5), V(0, 0, 1)
    bmin, bmax = aabb.aabb_from_pos_size(V(0, 0, 0), V(1, 1, 1))
    tn, tf = aabb.intersect_aabb(ro, rd, bmin, bmax)
    assert bool(aabb.aabb_hit(tn, tf))
    assert np.isclose(float(tn), 4.0) and np.isclose(float(tf), 6.0)


def test_aabb_miss():
    ro, rd = V(0, 5, -5), V(0, 0, 1)
    bmin, bmax = aabb.aabb_from_pos_size(V(0, 0, 0), V(1, 1, 1))
    tn, tf = aabb.intersect_aabb(ro, rd, bmin, bmax)
    assert not bool(aabb.aabb_hit(tn, tf))


def test_aabb_behind_ray():
    ro, rd = V(0, 0, 5), V(0, 0, 1)  # box is behind
    bmin, bmax = aabb.aabb_from_pos_size(V(0, 0, 0), V(1, 1, 1))
    tn, tf = aabb.intersect_aabb(ro, rd, bmin, bmax)
    assert not bool(aabb.aabb_hit(tn, tf))


def test_aabb_axis_parallel_ray_inside_slab():
    # rd.x == 0 -> division yields inf; slab logic must still work.
    ro, rd = V(0.5, 0, -5), V(0, 0, 1)
    bmin, bmax = aabb.aabb_from_pos_size(V(0, 0, 0), V(1, 1, 1))
    tn, tf = aabb.intersect_aabb(ro, rd, bmin, bmax)
    assert bool(aabb.aabb_hit(tn, tf))


def test_calc_uv_center_and_corner():
    u, v = camera.calc_uv(jnp.float32(320.0), jnp.float32(240.0), 640, 480, 640 / 480)
    assert np.isclose(float(u), 0.0) and np.isclose(float(v), 0.0)
    u, v = camera.calc_uv(jnp.float32(0.0), jnp.float32(0.0), 640, 480, 1.0)
    assert np.isclose(float(u), -1.0) and np.isclose(float(v), -1.0)


def test_primary_ray_normalized():
    u = jnp.float32(0.3)
    v = jnp.float32(-0.2)
    ro, rd = camera.primary_ray(u, v, 1.0)
    assert np.isclose(float(rd.length()), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        [float(ro.x), float(ro.y), float(ro.z)], [0.0, 0.0, -3.0]
    )


def test_aces_film_anchors():
    z = tonemap.aces_film(Vec3.splat(jnp.float32(0.0)))
    assert np.isclose(float(z.x), 0.0)
    big = tonemap.aces_film(Vec3.splat(jnp.float32(100.0)))
    assert float(big.x) <= 1.0 and float(big.x) > 0.99


def test_srgb_roundtrip():
    vals = jnp.asarray(np.linspace(0, 1, 64, dtype=np.float32))
    v = Vec3(vals, vals, vals)
    rt = tonemap.srgb_to_linear(tonemap.linear_to_srgb(v))
    np.testing.assert_allclose(np.asarray(rt.x), np.asarray(vals), atol=1e-5)


def test_color_correction_range():
    hdr = Vec3.splat(jnp.asarray(np.linspace(0, 20, 64, dtype=np.float32)))
    out = tonemap.color_correction(hdr)
    arr = np.asarray(out.x)
    assert (arr >= 0).all() and (arr <= 1).all()
    assert (np.diff(arr) >= -1e-6).all()  # monotone


def test_gamma_encode():
    v = Vec3.splat(jnp.float32(0.25))
    out = tonemap.gamma_encode(v, 2.2)
    assert np.isclose(float(out.x), 0.25 ** (1 / 2.2), atol=1e-6)
