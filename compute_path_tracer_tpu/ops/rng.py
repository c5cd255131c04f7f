"""Counter-based per-pixel RNG, bit-exact with the reference kernel.

Re-implements the wang_hash PCG-style integer hash chain of the reference
(reference: assets/shaders/path_tracer/rng.glsl:1-36) with uint32 wraparound
semantics.  Bit-exactness between the jax.numpy CPU oracle and the Pallas TPU
kernel is what makes Monte-Carlo images ``allclose``-comparable (SURVEY.md §7
"Monte-Carlo vs. allclose"); both call exactly these functions.

The RNG is functional: every draw returns ``(new_state, value)``.  State is a
uint32 array of any shape (one independent stream per pixel).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import PI2
from ..vecmath import Vec3

U32 = jnp.uint32


def wang_hash(state):
    """One step of the wang hash; returns the new state (rng.glsl:1-9).

    The GLSL routine returns the mutated seed, so state and value coincide.
    """
    state = jnp.asarray(state, U32)
    state = (state ^ U32(61)) ^ (state >> U32(16))
    state = state * U32(9)
    state = state ^ (state >> U32(4))
    state = state * U32(0x27D4EB2D)
    state = state ^ (state >> U32(15))
    return state


def _u32_to_f32(v):
    """uint32 -> float32 value conversion via two int32 halves.

    Mosaic does not lower unsigned<->float casts; splitting into 16-bit
    halves (each exact in f32) and recombining rounds to nearest exactly like
    a direct uint32->float32 cast, so oracle and TPU kernel share this path
    and stay bit-identical.
    """
    hi = (v >> U32(16)).astype(jnp.int32).astype(jnp.float32)
    lo = (v & U32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    return hi * jnp.float32(65536.0) + lo


def random_float01(state):
    """Uniform float in [0, 1) (rng.glsl:11-14): float(hash) / 2^32."""
    state = wang_hash(state)
    # 2^-32 is a power of two: multiplying is bit-identical to the GLSL divide.
    return state, _u32_to_f32(state) * jnp.float32(2.0**-32)


def random_unit_vector(state):
    """Uniform direction on the sphere via z/angle sampling (rng.glsl:16-24)."""
    state, r1 = random_float01(state)
    state, r2 = random_float01(state)
    z = r1 * 2.0 - 1.0
    a = r2 * jnp.float32(PI2)
    r = jnp.sqrt(1.0 - z * z)
    return state, Vec3(r * jnp.cos(a), r * jnp.sin(a), z)


def gen_rng(px, py, frame, width, height):
    """Per-pixel seed from coords + frame (rng.glsl:26-36).

    Reproduces the reference's quirky float scaling of the *integer* pixel
    coordinates (``(x*0.5+0.5) * W``) including the truncating float->uint
    cast, the 1973/9277/26699 prime mix, and the ``| 1`` low-bit set.
    """
    fx = (px.astype(jnp.float32) * 0.5 + 0.5) * jnp.float32(width)
    fy = (py.astype(jnp.float32) * 0.5 + 0.5) * jnp.float32(height)
    # float -> uint via int32: identical truncation for the (non-negative,
    # < 2^31) values that pixel coordinates produce, and lowerable on TPU.
    seed = (
        fx.astype(jnp.int32).astype(U32) * U32(1973)
        + fy.astype(jnp.int32).astype(U32) * U32(9277)
        + jnp.asarray(frame, jnp.int32).astype(U32) * U32(26699)
    ) | U32(1)
    return seed
