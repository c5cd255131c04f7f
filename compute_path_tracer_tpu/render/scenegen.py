"""Trace-time scene codegen: SceneSpec -> jnp evaluation functions.

This is the direct analog of the reference's GLSL ``map()``/``bounds()``
codegen (reference: src/sdf_editor/containers.rs:143-179, 404-463 and
sdf_editor.rs:186-246), re-targeted at JAX: instead of emitting shader
source, the static :class:`SceneSpec` is unrolled at *trace time* into pure
elementwise jnp ops.  The produced closures run identically on (H, W) image
planes in the CPU oracle renderer, under vmap, and on VMEM tiles inside the
Pallas megakernel - ``pv`` (the flat parameter vector) only needs integer
``__getitem__``, which both jnp arrays and Pallas refs provide.

Faithfulness notes (semantics carried over exactly):

* per-node transform order scale -> translate -> rotate with the distance
  un-scaling applied per shape and again per union on the accumulated hit
  (data_structures.rs:45-55, 94-96; containers.rs:169);
* the CSG fold order child-unions-then-shapes where the *first shape*
  assigns directly into the accumulator (containers.rs:156-166, 244-252),
  and an AABB-culled shape skips its whole block including that assignment
  (containers.rs:419-437);
* world-space AABBs from the accumulated position/scale trails times the
  per-shape exaggeration (containers.rs:181-202, data_structures.rs:68-92).

Deliberate divergence: the reference's ``bounds()`` walk does not recurse
into child unions (containers.rs:193-195), so shapes inside nested unions
read *uninitialized* check slots - undefined GLSL behavior.  Our bounds walk
recurses in the same order as the map walk, so check indices always line up.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAT_SIZE, MAX_DIST
from ..ops.aabb import aabb_hit, intersect_aabb
from ..ops.sdf import rot3d, sd_cube, sd_octahedron, sd_plane, sd_sphere
from ..scene.compile import (
    OP_SMOOTH_UNION,
    OP_SUBTRACTION,
    OP_UNION,
    SceneSpec,
    ShapeSpec,
    TransformSpec,
    UnionSpec,
)
from ..scene.model import KIND_CUBE, KIND_OCTAHEDRON, KIND_PLANE, KIND_SPHERE
from ..vecmath import Vec3


def _p3(pv, slots) -> Vec3:
    return Vec3(pv[slots[0]], pv[slots[1]], pv[slots[2]])


def apply_transform(t: TransformSpec, p: Vec3, pv) -> Tuple[Vec3, "jnp.ndarray"]:
    """p' = rot3D(p/s - pos/s, rot); returns (p', s) with s the node scale
    (data_structures.rs:45-55)."""
    s = pv[t.scale]
    inv = 1.0 / s
    pos = _p3(pv, t.pos)
    rot = _p3(pv, t.rot)
    p = p * inv
    p = p - pos * inv
    p = rot3d(p, rot)
    return p, s


def _shape_distance(ss: ShapeSpec, q: Vec3, pv):
    if ss.kind == KIND_SPHERE:
        return sd_sphere(q, pv[ss.size[0]])
    if ss.kind == KIND_CUBE:
        return sd_cube(q, _p3(pv, ss.size))
    if ss.kind == KIND_PLANE:
        return sd_plane(q)
    if ss.kind == KIND_OCTAHEDRON:
        return sd_octahedron(q, pv[ss.size[0]])
    raise ValueError(f"unknown shape kind {ss.kind}")


def _combine(op: int, acc_d, acc_i, d, i, index: int, k=None):
    """Reference fold: index 0 assigns, later children combine with the
    node's op (containers.rs:244-252, extended with the smooth-union op)."""
    if index == 0:
        return d, i
    if op == OP_UNION:
        take1 = acc_d < d
    elif op == OP_SUBTRACTION:
        nd = -acc_d
        take1 = nd >= d
        acc_d = nd
    elif op == OP_SMOOTH_UNION:
        h = jnp.clip(0.5 + 0.5 * (d - acc_d) / k, 0.0, 1.0)
        blended = d * (1.0 - h) + acc_d * h - k * h * (1.0 - h)
        take1 = h > 0.5
        return blended, jnp.where(take1, acc_i, i)
    else:
        raise ValueError(f"unknown CSG op {op}")
    return jnp.where(take1, acc_d, d), jnp.where(take1, acc_i, i)


def _eval_shape(ss: ShapeSpec, p_node: Vec3, pv, checks,
                acc_d, acc_i, op: int, k, shape_index: int):
    q, s = apply_transform(ss.transform, p_node, pv)
    d = _shape_distance(ss, q, pv) * s  # finalise_scale (data_structures.rs:94-96)
    i = jnp.full_like(acc_i, ss.shape_id)
    cd, ci = _combine(op, acc_d, acc_i, d, i, shape_index, k)
    if ss.transform.aabb:
        # A culled shape skips its whole guarded block (containers.rs:419-437):
        # the accumulator is left untouched, even for the assigning first shape.
        g = checks[ss.shape_id]
        return jnp.where(g, cd, acc_d), jnp.where(g, ci, acc_i)
    return cd, ci


def _eval_union(us: UnionSpec, p: Vec3, pv, checks):
    p1, s = apply_transform(us.transform, p, pv)
    k = pv[us.smooth_k] if us.op == OP_SMOOTH_UNION else None
    acc_d = jnp.full_like(p.x, MAX_DIST)
    acc_i = jnp.full(p.x.shape, -1, dtype=jnp.int32)
    for cu in us.children_unions:
        cd, ci = _eval_union(cu, p1, pv, checks)
        acc_d, acc_i = _combine(us.op, acc_d, acc_i, cd, ci, 1, k)
    for si, ss in enumerate(us.children_shapes):
        acc_d, acc_i = _eval_shape(ss, p1, pv, checks, acc_d, acc_i, us.op, k, si)
    return acc_d * s, acc_i


def make_map(spec: SceneSpec):
    """Build ``map(p, pv, checks) -> (d, idx)``.

    ``d`` is the scene SDF value, ``idx`` the int32 id of the winning shape
    (-1 = none, the MDEF material).  The analog of the generated GLSL
    ``map()`` (sdf_editor.rs:192-210); roots min-combine into the MAXHIT
    accumulator.
    """

    def map_fn(p: Vec3, pv, checks):
        d = jnp.full_like(p.x, MAX_DIST)
        i = jnp.full(p.x.shape, -1, dtype=jnp.int32)
        for root in spec.roots:
            rd_, ri_ = _eval_union(root, p, pv, checks)
            d, i = _combine(OP_UNION, d, i, rd_, ri_, 1)
        return d, i

    return map_fn


def _empty_union_value(us: UnionSpec, pv):
    """Scalar value a union evaluates to when every shape block is skipped:
    the MAXHIT accumulator folded through child unions and scale corrections.
    Used as the exact skip-branch value for whole-subtree culling."""
    s = pv[us.transform.scale]
    acc = jnp.float32(MAX_DIST)
    k = pv[us.smooth_k] if us.op == OP_SMOOTH_UNION else None
    for cu in us.children_unions:
        child = _empty_union_value(cu, pv)
        acc, _ = _combine(us.op, acc, jnp.int32(-1), child, jnp.int32(-1), 1, k)
    return acc * s


def _union_cull_pred(us: UnionSpec, anyhit):
    """Static OR of the tile-level hit predicates of all descendant shapes.

    Returns Python True when any descendant is unconditionally evaluated
    (AABB disabled), else a traced scalar bool (or False for an empty tree).
    """
    terms = []
    for cu in us.children_unions:
        t = _union_cull_pred(cu, anyhit)
        if t is True:
            return True
        if t is not False:
            terms.append(t)
    for ss in us.children_shapes:
        if not ss.transform.aabb:
            return True
        terms.append(anyhit[ss.shape_id])
    if not terms:
        return False
    pred = terms[0]
    for t in terms[1:]:
        pred = jnp.logical_or(pred, t)
    return pred


def _eval_shape_culled(ss, p_node, pv, checks, anyhit, acc_d, acc_i, op, k, si):
    """Shape eval wrapped in a tile-uniform skip: when no lane's ray hits the
    shape's AABB the whole block is skipped (a uniform version of the
    reference's per-thread guard, containers.rs:419-437 - identical results
    because the per-lane guard would mask every lane anyway)."""
    if not ss.transform.aabb:
        return _eval_shape(ss, p_node, pv, checks, acc_d, acc_i, op, k, si)

    def do(args):
        a_d, a_i = args
        return _eval_shape(ss, p_node, pv, checks, a_d, a_i, op, k, si)

    def skip(args):
        return args

    return jax.lax.cond(anyhit[ss.shape_id], do, skip, (acc_d, acc_i))


def _eval_union_culled(us: UnionSpec, p: Vec3, pv, checks, anyhit):
    pred = _union_cull_pred(us, anyhit)

    def evaluate(_):
        p1, s = apply_transform(us.transform, p, pv)
        k = pv[us.smooth_k] if us.op == OP_SMOOTH_UNION else None
        acc_d = jnp.full_like(p.x, MAX_DIST)
        acc_i = jnp.full(p.x.shape, -1, dtype=jnp.int32)
        for cu in us.children_unions:
            cd, ci = _eval_union_culled(cu, p1, pv, checks, anyhit)
            acc_d, acc_i = _combine(us.op, acc_d, acc_i, cd, ci, 1, k)
        for si, ss in enumerate(us.children_shapes):
            acc_d, acc_i = _eval_shape_culled(
                ss, p1, pv, checks, anyhit, acc_d, acc_i, us.op, k, si
            )
        return acc_d * s, acc_i

    if pred is True:
        return evaluate(None)
    if pred is False:
        d = p.x * 0.0 + _empty_union_value(us, pv)
        return d, jnp.full(p.x.shape, -1, dtype=jnp.int32)

    def skip(_):
        d = p.x * 0.0 + _empty_union_value(us, pv)
        return d, jnp.full(p.x.shape, -1, dtype=jnp.int32)

    return jax.lax.cond(pred, evaluate, skip, None)


def make_map_culled(spec: SceneSpec):
    """Like :func:`make_map` but with whole-subtree skipping driven by
    tile-uniform AABB predicates (``anyhit``: one scalar bool per shape id,
    or None for always-evaluated shapes).  Bit-identical results to the
    per-lane-guard map; the skip branches are the dominant speedup of the
    Pallas megakernel on scenes where each tile sees few primitives."""

    def map_fn(p: Vec3, pv, checks, anyhit):
        d = jnp.full_like(p.x, MAX_DIST)
        i = jnp.full(p.x.shape, -1, dtype=jnp.int32)
        for root in spec.roots:
            rd_, ri_ = _eval_union_culled(root, p, pv, checks, anyhit)
            d, i = _combine(OP_UNION, d, i, rd_, ri_, 1)
        return d, i

    return map_fn


def _combine_d(op: int, acc_d, d, k=None):
    if op == OP_UNION:
        return jnp.minimum(acc_d, d)
    if op == OP_SUBTRACTION:
        na = -acc_d
        return jnp.where(na >= d, na, d)
    if op == OP_SMOOTH_UNION:
        h = jnp.clip(0.5 + 0.5 * (d - acc_d) / k, 0.0, 1.0)
        return d * (1.0 - h) + acc_d * h - k * h * (1.0 - h)
    raise ValueError(f"unknown CSG op {op}")


def _eval_shape_d(ss: ShapeSpec, p_node, pv, checks, acc_d, op, k, si):
    q, s = apply_transform(ss.transform, p_node, pv)
    d = _shape_distance(ss, q, pv) * s
    cd = _combine_d(op, acc_d, d, k) if si else d
    if ss.transform.aabb:
        return jnp.where(checks[ss.shape_id], cd, acc_d)
    return cd


def _eval_union_culled_d(us: UnionSpec, p: Vec3, pv, checks, anyhit):
    """Distance-only fold of :func:`_eval_union_culled` (no winning-id
    selects); the march recovers the id with one full-map re-tap at the hit
    position (megakernel ``_final_idx``)."""

    def evaluate(_):
        p1, s = apply_transform(us.transform, p, pv)
        k = pv[us.smooth_k] if us.op == OP_SMOOTH_UNION else None
        acc_d = jnp.full_like(p.x, MAX_DIST)
        for cu in us.children_unions:
            cd = _eval_union_culled_d(cu, p1, pv, checks, anyhit)
            acc_d = _combine_d(us.op, acc_d, cd, k)
        for si, ss in enumerate(us.children_shapes):
            if ss.transform.aabb and anyhit is not None:
                def do(a, ss=ss, si=si, k=k, p1=p1):
                    return _eval_shape_d(ss, p1, pv, checks, a, us.op, k, si)

                acc_d = jax.lax.cond(anyhit[ss.shape_id], do, lambda a: a, acc_d)
            else:
                acc_d = _eval_shape_d(ss, p1, pv, checks, acc_d, us.op, k, si)
        return acc_d * s

    def skip(_):
        return p.x * 0.0 + _empty_union_value(us, pv)

    if anyhit is None:
        return evaluate(None)
    pred = _union_cull_pred(us, anyhit)
    if pred is True:
        return evaluate(None)
    if pred is False:
        return skip(None)
    return jax.lax.cond(pred, evaluate, skip, None)


def make_map_culled_d(spec: SceneSpec):
    """Distance-only variant of :func:`make_map_culled`:
    ``map(p, pv, checks, anyhit=None) -> d`` with identical distances and no
    winning-id int32 selects in the fold."""

    def map_fn(p: Vec3, pv, checks, anyhit=None):
        d = jnp.full_like(p.x, MAX_DIST)
        for root in spec.roots:
            d = jnp.minimum(d, _eval_union_culled_d(root, p, pv, checks, anyhit))
        return d

    return map_fn


def make_bounds(spec: SceneSpec, with_t: bool = False):
    """Build ``bounds(ro, rd, pv) -> (checks, debug)``.

    ``checks`` is a tuple with one entry per shape id: a boolean hit array
    for AABB-enabled shapes, or ``None`` for shapes whose guard is compiled
    to ``if (true)`` (data_structures.rs:57-66).  ``debug`` accumulates 0.1
    per AABB hit like the reference's cube_debug (containers.rs:451-458).

    ``with_t=True`` returns ``(checks, tns, tfs, debug)`` where ``tns``/
    ``tfs`` are the per-shape slab-test entry/exit distances (garbage on
    missed lanes - mask with ``checks``), feeding the megakernel's per-step
    t-interval culling.
    """

    def bounds_fn(ro: Vec3, rd: Vec3, pv):
        checks: list = [None] * spec.n_shapes
        tns: list = [None] * spec.n_shapes
        tfs: list = [None] * spec.n_shapes
        dbg = [jnp.zeros_like(ro.x)]

        def walk(us: UnionSpec, pos_trail: Vec3, scale_trail):
            pos2 = pos_trail + _p3(pv, us.transform.pos)
            scale2 = scale_trail * pv[us.transform.scale]
            for cu in us.children_unions:
                walk(cu, pos2, scale2)
            for ss in us.children_shapes:
                if not ss.transform.aabb:
                    continue
                if ss.kind == KIND_SPHERE or ss.kind == KIND_OCTAHEDRON:
                    so = Vec3.splat(pv[ss.size[0]])
                elif ss.kind == KIND_CUBE:
                    so = _p3(pv, ss.size)
                else:  # plane: reference uses a unit box (data_structures.rs:73-76)
                    so = Vec3.splat(jnp.ones_like(scale2))
                center = pos2 + _p3(pv, ss.transform.pos)
                half = so * (scale2 * pv[ss.transform.scale]) * pv[ss.transform.ex]
                tn, tf = intersect_aabb(ro, rd, center - half, center + half)
                hit = aabb_hit(tn, tf)
                checks[ss.shape_id] = hit
                tns[ss.shape_id] = tn
                tfs[ss.shape_id] = tf
                dbg[0] = dbg[0] + 0.1 * hit.astype(dbg[0].dtype)

        zero = jnp.zeros((), dtype=jnp.float32)
        one = jnp.ones((), dtype=jnp.float32)
        for root in spec.roots:
            walk(root, Vec3.splat(zero), one)
        if with_t:
            return tuple(checks), tuple(tns), tuple(tfs), dbg[0]
        return tuple(checks), dbg[0]

    return bounds_fn


def material_slot_matrix(spec: SceneSpec) -> np.ndarray:
    """(n_shapes, 18) int32 matrix of parameter slots, row = shape id, columns
    in Mat(...) constructor order (data_structures.rs:178-194)."""
    rows = np.zeros((spec.n_shapes, MAT_SIZE), dtype=np.int32)
    for ss in spec.iter_shapes():
        rows[ss.shape_id] = ss.material
    return rows
