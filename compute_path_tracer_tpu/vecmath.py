"""Structure-of-arrays 3-vector math.

The TPU-native representation of a ``vec3`` is three separate arrays (one per
component), not a trailing axis of size 3.  On TPU the vector unit operates on
(8, 128) lanes of a single array; keeping components as independent planes means
every vec3 op is a plain elementwise VPU op over well-tiled 2D arrays, and the
same code runs unchanged inside a Pallas kernel, under ``vmap``, or on full
(H, W) images in the jax.numpy reference renderer.

This module replaces the GLSL built-in vec3 algebra used throughout the
reference kernels (reference: assets/shaders/path_tracer/test_compute.glsl,
funcs.glsl, shapes.glsl).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp


class Vec3(NamedTuple):
    """A vec3 held as three structure-of-arrays components."""

    x: Any
    y: Any
    z: Any

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)
        return Vec3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)
        return Vec3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return Vec3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)
        return Vec3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x / o.x, self.y / o.y, self.z / o.z)
        return Vec3(self.x / o, self.y / o, self.z / o)

    def __rtruediv__(self, o):
        return Vec3(o / self.x, o / self.y, o / self.z)

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)

    # -- geometry -----------------------------------------------------------
    def dot(self, o: "Vec3"):
        return self.x * o.x + self.y * o.y + self.z * o.z

    def length(self):
        return jnp.sqrt(self.dot(self))

    def normalize(self):
        """GLSL ``normalize``: divides by the length (0-vector -> nan/inf)."""
        return self / self.length()

    def length_safe(self):
        """Length with a gradient-safe sqrt: identical forward values, but
        the derivative at the 0-vector is 0 instead of inf/nan.

        sqrt'(0) = inf poisons reverse-mode even through ``where`` selects
        (the unselected branch's primal still enters the vjp), so every
        differentiable length on the shading path uses this form.
        """
        l2 = self.dot(self)
        pos = l2 > 0.0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, l2, 1.0)), 0.0)

    def normalize_safe(self):
        """Zero-vector-safe normalize: returns 0 for the 0-vector.

        Matches GLSL ``normalize`` everywhere it is defined; additionally
        keeps both forward values and reverse-mode gradients NaN-free at the
        0-vector (e.g. ``normalize(mat.light)`` of a zero light color,
        test_compute.glsl:146, and the SDF gradient at degenerate points).
        """
        l2 = self.dot(self)
        pos = l2 > 0.0
        inv = jnp.where(pos, 1.0 / jnp.sqrt(jnp.where(pos, l2, 1.0)), 0.0)
        return self * inv

    def abs(self):
        return Vec3(jnp.abs(self.x), jnp.abs(self.y), jnp.abs(self.z))

    def max_component(self):
        return jnp.maximum(self.x, jnp.maximum(self.y, self.z))

    def min_component(self):
        return jnp.minimum(self.x, jnp.minimum(self.y, self.z))

    # -- conversions --------------------------------------------------------
    @staticmethod
    def full_like(ref, x, y, z):
        """Broadcast three python scalars against a template array."""
        return Vec3(
            jnp.full_like(ref, x), jnp.full_like(ref, y), jnp.full_like(ref, z)
        )

    @staticmethod
    def splat(v):
        return Vec3(v, v, v)

    def stack(self, axis=-1):
        """Pack into a conventional (..., 3) array (host I/O boundary only)."""
        return jnp.stack([self.x, self.y, self.z], axis=axis)

    @staticmethod
    def from_stacked(a, axis=-1):
        x, y, z = jnp.split(a, 3, axis=axis)
        return Vec3(
            jnp.squeeze(x, axis=axis),
            jnp.squeeze(y, axis=axis),
            jnp.squeeze(z, axis=axis),
        )


def vmin(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(jnp.minimum(a.x, b.x), jnp.minimum(a.y, b.y), jnp.minimum(a.z, b.z))


def vmax(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(jnp.maximum(a.x, b.x), jnp.maximum(a.y, b.y), jnp.maximum(a.z, b.z))


def vmix(a: Vec3, b: Vec3, t) -> Vec3:
    """GLSL ``mix(a, b, t)`` = a*(1-t) + b*t, componentwise."""
    if isinstance(t, Vec3):
        return Vec3(mix(a.x, b.x, t.x), mix(a.y, b.y, t.y), mix(a.z, b.z, t.z))
    return Vec3(mix(a.x, b.x, t), mix(a.y, b.y, t), mix(a.z, b.z, t))


def vwhere(c, a: Vec3, b: Vec3) -> Vec3:
    """Componentwise select with a shared boolean mask."""
    return Vec3(jnp.where(c, a.x, b.x), jnp.where(c, a.y, b.y), jnp.where(c, a.z, b.z))


def mix(a, b, t):
    """GLSL ``mix`` for scalars/arrays."""
    return a * (1.0 - t) + b * t


def clamp(v, lo, hi):
    return jnp.minimum(jnp.maximum(v, lo), hi)


def vclamp(v: Vec3, lo, hi) -> Vec3:
    return Vec3(clamp(v.x, lo, hi), clamp(v.y, lo, hi), clamp(v.z, lo, hi))


def reflect(i: Vec3, n: Vec3) -> Vec3:
    """GLSL ``reflect(I, N)`` = I - 2*dot(N, I)*N."""
    d = n.dot(i)
    return i - n * (2.0 * d)
