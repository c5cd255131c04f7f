"""Pinhole camera and pixel-to-NDC mapping.

Re-implements the reference's ray generation: NDC with aspect correction
(reference: assets/shaders/path_tracer/funcs.glsl:1-7) and the fixed pinhole
camera at (0, 0, -3) looking down +z with the "fov" slider as the z component
of the un-normalized direction (test_compute.glsl:232-235).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import CAMERA_ORIGIN
from ..vecmath import Vec3


def calc_uv(px, py, width, height, aspect):
    """Pixel coords (+ subpixel jitter) -> NDC in [-1, 1], x scaled by aspect
    (funcs.glsl:1-7)."""
    u = (px / jnp.float32(width)) * 2.0 - 1.0
    v = (py / jnp.float32(height)) * 2.0 - 1.0
    return u * aspect, v


def primary_ray(u, v, fov):
    """Camera ray: origin (0,0,-3), direction normalize(u, v, fov)
    (test_compute.glsl:232-235)."""
    ro = Vec3.full_like(u, *CAMERA_ORIGIN)
    rd = Vec3(u, v, jnp.full_like(u, fov)).normalize()
    return ro, rd
