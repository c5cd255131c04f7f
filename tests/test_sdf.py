"""SDF, transform and CSG-combine unit tests against closed forms
(reference: assets/shaders/path_tracer/shapes.glsl)."""

import numpy as np
import jax.numpy as jnp

from compute_path_tracer_tpu.ops import sdf
from compute_path_tracer_tpu.vecmath import Vec3


def V(x, y, z):
    return Vec3(jnp.float32(x), jnp.float32(y), jnp.float32(z))


def test_sd_sphere():
    assert np.isclose(float(sdf.sd_sphere(V(3, 4, 0), 1.0)), 4.0)
    assert np.isclose(float(sdf.sd_sphere(V(0, 0, 0), 2.0)), -2.0)


def test_sd_cube_faces_and_corners():
    b = V(1, 1, 1)
    # outside along a face
    assert np.isclose(float(sdf.sd_cube(V(2, 0, 0), b)), 1.0)
    # outside at a corner: distance to (1,1,1)
    assert np.isclose(float(sdf.sd_cube(V(2, 2, 2), b)), np.sqrt(3.0), atol=1e-6)
    # inside: negative distance to the nearest face
    assert np.isclose(float(sdf.sd_cube(V(0.5, 0, 0), b)), -0.5)
    # on the surface
    assert np.isclose(float(sdf.sd_cube(V(1, 0, 0), b)), 0.0)


def test_sd_plane():
    assert float(sdf.sd_plane(V(5, 2.5, -3))) == 2.5
    assert float(sdf.sd_plane(V(0, -1, 0))) == -1.0


def test_sd_octahedron():
    # On a vertex of the octahedron |x|+|y|+|z| = s.
    assert np.isclose(float(sdf.sd_octahedron(V(1, 0, 0), 1.0)), 0.0, atol=1e-6)
    # At the center.
    assert np.isclose(float(sdf.sd_octahedron(V(0, 0, 0), 1.0)), -1.0 * 0.57735027)
    # Far along an axis.
    assert np.isclose(float(sdf.sd_octahedron(V(3, 0, 0), 1.0)), 2.0, atol=1e-5)


def test_rot3d_preserves_length():
    p = V(0.3, -1.2, 2.2)
    q = sdf.rot3d(p, V(0.4, 1.1, -0.7))
    assert np.isclose(float(p.length()), float(q.length()), atol=1e-5)


def test_rot3d_x_quarter_turn():
    # Reference rotX is mat3(1,0,0, 0,c,-s, 0,s,c) column-major applied as
    # rows: y' = c*y + s*z, z' = -s*y + c*z.  At 90deg: (0,1,0) -> (0,0,-1).
    q = sdf.rot3d(V(0, 1, 0), V(np.pi / 2, 0, 0))
    np.testing.assert_allclose(
        [float(q.x), float(q.y), float(q.z)], [0, 0, -1], atol=1e-6
    )


def test_rot3d_identity():
    p = V(1.5, -2.0, 0.25)
    q = sdf.rot3d(p, V(0, 0, 0))
    np.testing.assert_allclose(
        [float(q.x), float(q.y), float(q.z)], [1.5, -2.0, 0.25]
    )


def test_op_union_picks_nearer():
    d1 = jnp.float32(1.0)
    d2 = jnp.float32(2.0)
    i1 = jnp.int32(5)
    i2 = jnp.int32(9)
    d, i = sdf.op_union(d1, i1, d2, i2)
    assert float(d) == 1.0 and int(i) == 5
    # tie keeps the second hit (GLSL `v1.d < v2.d ? v1 : v2`)
    d, i = sdf.op_union(d2, i1, d2, i2)
    assert int(i) == 9


def test_op_subtraction_semantics():
    # max(-d1, d2): subtract hit 1 from hit 2 (shapes.glsl:76-81).
    d, i = sdf.op_subtraction(jnp.float32(-0.5), jnp.int32(1), jnp.float32(0.2), jnp.int32(2))
    assert float(d) == 0.5 and int(i) == 1  # tie/greater goes to negated v1
    d, i = sdf.op_subtraction(jnp.float32(3.0), jnp.int32(1), jnp.float32(0.2), jnp.int32(2))
    assert np.isclose(float(d), 0.2) and int(i) == 2


def test_op_smooth_union_blends():
    # Far apart: behaves like min.
    d, i = sdf.op_smooth_union(jnp.float32(0.1), jnp.int32(1), jnp.float32(5.0), jnp.int32(2), 0.25)
    assert np.isclose(float(d), 0.1) and int(i) == 1
    # Equal distances: blended below the min.
    d, _ = sdf.op_smooth_union(jnp.float32(1.0), jnp.int32(1), jnp.float32(1.0), jnp.int32(2), 0.25)
    assert float(d) < 1.0


def test_move():
    q = sdf.move(V(1, 2, 3), V(1, 1, 1))
    np.testing.assert_allclose([float(q.x), float(q.y), float(q.z)], [0, 1, 2])
