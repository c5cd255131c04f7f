"""Ray/AABB slab intersection used for per-shape culling.

Re-implements the reference's AABB device library
(reference: assets/shaders/path_tracer/aabb.glsl:13-33).  Boxes are described
by center/half-extent (``from_pos_size``) and tested with the standard slab
method; division by a zero ray component yields ±inf exactly as in GLSL, and
the min/max folds resolve the resulting NaNs the same way jnp does.
"""

from __future__ import annotations

from ..vecmath import Vec3, vmax, vmin


def aabb_from_pos_size(pos: Vec3, size: Vec3):
    """Box (min, max) = (pos - size, pos + size) (aabb.glsl:13-19)."""
    return pos - size, pos + size


def intersect_aabb(ro: Vec3, rd: Vec3, bmin: Vec3, bmax: Vec3):
    """Slab test; returns (t_near, t_far) (aabb.glsl:21-29)."""
    t_min = (bmin - ro) / rd
    t_max = (bmax - ro) / rd
    t1 = vmin(t_min, t_max)
    t2 = vmax(t_min, t_max)
    t_near = t1.max_component()
    t_far = t2.min_component()
    return t_near, t_far


def aabb_hit(t_near, t_far):
    """Hit iff the slab interval is non-empty and ends in front (aabb.glsl:31-33)."""
    return (t_near < t_far) & (t_far > 0.0)
