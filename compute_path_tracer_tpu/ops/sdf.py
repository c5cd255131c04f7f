"""Analytic signed-distance functions, spatial transforms and CSG combines.

TPU-native re-implementation of the reference SDF/CSG device library
(reference: assets/shaders/path_tracer/shapes.glsl).  All functions are
branch-free elementwise jnp ops over structure-of-arrays ``Vec3`` values so
the same code runs in the jax.numpy oracle renderer and inside the Pallas
megakernel.

A CSG "hit" is carried as a pair ``(d, idx)`` of a distance array and an int32
primitive-id array instead of the reference's 11-float ``Hit{d, Mat}`` struct
(test_compute.glsl:43-60): combines only need the distance and the identity of
the winning primitive, the 18-float material is gathered once per ray after the
march.  ``idx < 0`` denotes "no primitive" (the reference's ``MDEF`` material).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..vecmath import Vec3, vmax

# CSG combine opcodes (reference: src/sdf_editor/containers.rs:215-253)
OP_UNION = 0
OP_SUBTRACTION = 1


# -- primitive distance functions ------------------------------------------


def sd_sphere(p: Vec3, r):
    """Sphere of radius r at the origin (shapes.glsl:1-3).

    Uses the gradient-safe length so d(sd)/d(params) stays finite when a
    sample lands exactly on the center.
    """
    return p.length_safe() - r


def sd_cube(p: Vec3, b: Vec3):
    """Axis-aligned box with half-extent b (shapes.glsl:5-9).

    The outside term is sqrt of a clamped quantity that is exactly 0 for
    every interior point - the gradient-safe length keeps reverse-mode
    finite there.
    """
    q = p.abs() - b
    outside = vmax(q, Vec3.splat(jnp.zeros_like(q.x))).length_safe()
    inside = jnp.minimum(q.max_component(), 0.0)
    return outside + inside


def sd_plane(p: Vec3):
    """Horizontal plane through the origin (distance = p.y).

    The reference exposes a Plane shape in its editor enum but its codegen
    emits an unimplemented symbol (containers.rs:287 `"NotImplemented"`), so a
    reference scene containing a plane fails to compile.  We implement the
    standard infinite y=0 plane, which BASELINE.json config #1 requires.
    """
    return p.y


def sd_octahedron(p: Vec3, s):
    """Exact octahedron (shapes.glsl:13-25), vectorized branch-free.

    Unused by the reference's scene codegen but shipped in its device library;
    included for parity and as an extra primitive for the build.
    """
    p = p.abs()
    m = p.x + p.y + p.z - s

    # The three permuted-coordinate cases, selected elementwise.
    def branch(qx, qy, qz):
        k = jnp.clip(0.5 * (qz - qy + s), 0.0, s)
        return Vec3(qx, qy - s + k, qz - k).length_safe()

    d_xyz = branch(p.x, p.y, p.z)
    d_yzx = branch(p.y, p.z, p.x)
    d_zxy = branch(p.z, p.x, p.y)
    d_flat = m * 0.57735027

    out = d_flat
    out = jnp.where(3.0 * p.z < m, d_zxy, out)
    out = jnp.where(3.0 * p.y < m, d_yzx, out)
    out = jnp.where(3.0 * p.x < m, d_xyz, out)
    return out


# -- spatial transforms -----------------------------------------------------


def move(p: Vec3, by: Vec3) -> Vec3:
    """Translation: p - by (shapes.glsl:30-32)."""
    return p - by


def rot3d(p: Vec3, rot: Vec3) -> Vec3:
    """Euler XYZ rotation, bit-matching the reference's column-major mat3
    construction and X-then-Y-then-Z application order (shapes.glsl:34-68).
    """
    cx, sx = jnp.cos(rot.x), jnp.sin(rot.x)
    cy, sy = jnp.cos(rot.y), jnp.sin(rot.y)
    cz, sz = jnp.cos(rot.z), jnp.sin(rot.z)

    # rotX * p with rotX = mat3(1,0,0, 0,cx,-sx, 0,sx,cx) (column-major)
    x1 = p.x
    y1 = cx * p.y + sx * p.z
    z1 = -sx * p.y + cx * p.z

    # rotY * p with rotY = mat3(cy,0,sy, 0,1,0, -sy,0,cy)
    x2 = cy * x1 - sy * z1
    y2 = y1
    z2 = sy * x1 + cy * z1

    # rotZ * p with rotZ = mat3(cz,-sz,0, sz,cz,0, 0,0,1)
    x3 = cz * x2 + sz * y2
    y3 = -sz * x2 + cz * y2
    z3 = z2

    return Vec3(x3, y3, z3)


# -- CSG combines over (d, idx) hits ---------------------------------------


def op_union(d1, i1, d2, i2):
    """min-by-distance keeping the nearer primitive (shapes.glsl:72-74).

    Ties keep (d2, i2): the GLSL is ``v1.d < v2.d ? v1 : v2``.
    """
    take1 = d1 < d2
    return jnp.where(take1, d1, d2), jnp.where(take1, i1, i2)


def op_subtraction(d1, i1, d2, i2):
    """Subtract hit 1 from hit 2: max(-d1, d2) keeping the nearer material
    (shapes.glsl:76-81).  Ties keep the negated first hit, matching the GLSL
    ``depth == nv1.d ? nv1 : v2``.
    """
    nd1 = -d1
    take1 = nd1 >= d2
    return jnp.where(take1, nd1, d2), jnp.where(take1, i1, i2)


def op_smooth_union(d1, i1, d2, i2, k):
    """Polynomial smooth-min blend (new capability; BASELINE.json config #2).

    Classic quadratic smooth-min: h = clamp(0.5 + 0.5*(d2-d1)/k, 0, 1),
    d = mix(d2, d1, h) - k*h*(1-h).  The winning id is whichever side
    dominates the blend; ids stay discrete since materials are gathered.
    """
    h = jnp.clip(0.5 + 0.5 * (d2 - d1) / k, 0.0, 1.0)
    d = d2 * (1.0 - h) + d1 * h - k * h * (1.0 - h)
    take1 = h > 0.5
    return d, jnp.where(take1, i1, i2)


def combine(op: int, d1, i1, d2, i2, index: int):
    """Fold one child hit into a node accumulator per the reference codegen.

    ``index == 0`` assigns directly (the first shape in a union overwrites the
    accumulator, containers.rs:244-252); later children combine with the
    node's op.  ``op``/``index`` are trace-time constants so this unrolls to
    pure selects.
    """
    if index == 0:
        return d2, i2
    if op == OP_UNION:
        return op_union(d1, i1, d2, i2)
    if op == OP_SUBTRACTION:
        return op_subtraction(d1, i1, d2, i2)
    raise ValueError(f"unknown CSG op {op}")
