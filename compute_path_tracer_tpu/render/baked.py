"""Leaf-baked scene evaluation: fold transform chains out of the march.

The faithful map (render/scenegen.py) re-applies every nested node transform
- ``p' = rot3D((p - pos)/s)`` with per-node sin/cos, divides and a trailing
distance un-scaling (reference: src/sdf_editor/data_structures.rs:45-55,
94-96; containers.rs:169) - at EVERY map tap, i.e. up to 80 march steps x 6
normal taps x bounces per ray.  All of that work is loop-invariant: the
composition of the chain is a single affine map ``q = M p + b``, and because

* every SDF in the library is positively homogeneous of degree 1
  (``sd(k*q, k*size) = k * sd(q, size)`` for k > 0), and
* every CSG combine commutes with positive scaling (min, the subtraction
  ``max(-a, b)``, and the quadratic smooth-min once its ``k`` is scaled too),

the per-union distance re-scalings distribute exactly onto the leaves.  This
module bakes, once per frame from the flat parameter vector:

* sphere   -> world center c and world radius: ``d = |p - c| - r_w``
  (the rotation chain cancels against the norm entirely);
* plane    -> a general half-space: ``d = n . p + off`` (4 mul-adds);
* cube     -> ``d = sd_cube(M' p + b', size_w)`` with M' = M * s_tot baked;
* octahedron -> ``d = sd_octahedron(M' p + b', size_w)``;
* per union: the world-scaled MAXHIT accumulator seed, the world-scaled
  smooth-min k, and the union's fully-culled "empty" value;
* per AABB-enabled shape: the world-space box (min, max) from the reference's
  position/scale trails (containers.rs:181-202, data_structures.rs:68-92).

The CSG fold itself (child-unions-then-shapes, first-shape ASSIGN quirk,
AABB-guard skip semantics - containers.rs:244-252, 419-437) is unchanged, so
results match the faithful map up to fp rounding (the rotation chain is
composed into one matrix instead of applied as three rotations per node).

Baking is a tiny scalar jnp graph differentiable w.r.t. the parameter vector,
so gradients keep flowing params -> baked -> image.  The baked vector ``bv``
is consumed by index exactly like ``pv``, which is what Pallas SMEM refs
provide - the same closures run in the jnp oracle and inside the megakernel.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp

from ..constants import MAX_DIST
from ..ops.aabb import aabb_hit, intersect_aabb
from ..ops.sdf import sd_cube, sd_octahedron
from ..scene.compile import (
    OP_SMOOTH_UNION,
    OP_SUBTRACTION,
    OP_UNION,
    SceneSpec,
    ShapeSpec,
    UnionSpec,
)
from ..scene.model import KIND_CUBE, KIND_OCTAHEDRON, KIND_PLANE, KIND_SPHERE
from ..vecmath import Vec3

# -- 3x3 row-major matrix helpers on 9-tuples of scalars ---------------------

_IDENTITY = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def _rot_matrix(rx, ry, rz):
    """Row-major R with R @ p == ops.sdf.rot3d(p, rot): Rz_c @ Ry_c @ Rx_c in
    the exact element arrangement of shapes.glsl:34-68 (column-major GLSL
    mat3 applied X then Y then Z)."""
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    rx_m = (1.0, 0.0, 0.0, 0.0, cx, sx, 0.0, -sx, cx)
    ry_m = (cy, 0.0, -sy, 0.0, 1.0, 0.0, sy, 0.0, cy)
    rz_m = (cz, sz, 0.0, -sz, cz, 0.0, 0.0, 0.0, 1.0)
    return _mat_mul(rz_m, _mat_mul(ry_m, rx_m))


def _mat_mul(a, b):
    return tuple(
        a[3 * i + 0] * b[3 * 0 + j] + a[3 * i + 1] * b[3 * 1 + j] + a[3 * i + 2] * b[3 * 2 + j]
        for i in range(3)
        for j in range(3)
    )


def _mat_vec(a, v):
    return tuple(
        a[3 * i + 0] * v[0] + a[3 * i + 1] * v[1] + a[3 * i + 2] * v[2] for i in range(3)
    )


def _mat_t_vec(a, v):
    return tuple(
        a[3 * 0 + i] * v[0] + a[3 * 1 + i] * v[1] + a[3 * 2 + i] * v[2] for i in range(3)
    )


def _mat_scale(a, s):
    return tuple(e * s for e in a)


# -- static layout ------------------------------------------------------------


@dataclass(frozen=True)
class BakedShape:
    kind: int
    shape_id: int
    off: int           # geometry slots
    aabb_off: int      # 6 box slots, or -1 when the guard is `if (true)`
    aabb: bool


@dataclass(frozen=True)
class BakedUnion:
    op: int
    init_off: int      # world-scaled MAXHIT accumulator seed
    empty_off: int     # value of this union when every shape block is culled
    k_off: int         # world-scaled smooth-min k, or -1
    children_unions: Tuple["BakedUnion", ...]
    children_shapes: Tuple[BakedShape, ...]


@dataclass(frozen=True)
class BakedLayout:
    roots: Tuple[BakedUnion, ...]
    n_slots: int
    n_shapes: int


_GEOM_SLOTS = {KIND_SPHERE: 4, KIND_CUBE: 15, KIND_PLANE: 4, KIND_OCTAHEDRON: 13}


@lru_cache(maxsize=None)
def baked_layout(spec: SceneSpec) -> BakedLayout:
    """Assign bv slot offsets in a deterministic walk (mirrored by bake)."""
    counter = [1]  # slot 0 is a sentinel, mirroring the reference DataArray

    def take(n):
        off = counter[0]
        counter[0] += n
        return off

    def walk_shape(ss: ShapeSpec) -> BakedShape:
        off = take(_GEOM_SLOTS[ss.kind])
        aabb_off = take(6) if ss.transform.aabb else -1
        return BakedShape(
            kind=ss.kind, shape_id=ss.shape_id, off=off,
            aabb_off=aabb_off, aabb=ss.transform.aabb,
        )

    def walk_union(us: UnionSpec) -> BakedUnion:
        init_off = take(1)
        empty_off = take(1)
        k_off = take(1) if us.op == OP_SMOOTH_UNION else -1
        cu = tuple(walk_union(child) for child in us.children_unions)
        cs = tuple(walk_shape(child) for child in us.children_shapes)
        return BakedUnion(
            op=us.op, init_off=init_off, empty_off=empty_off, k_off=k_off,
            children_unions=cu, children_shapes=cs,
        )

    roots = tuple(walk_union(r) for r in spec.roots)
    return BakedLayout(roots=roots, n_slots=counter[0], n_shapes=spec.n_shapes)


# -- bake: pv -> bv ----------------------------------------------------------


def bake(spec: SceneSpec, pv) -> jnp.ndarray:
    """Build the baked geometry vector from the flat parameter vector.

    A pure scalar jnp graph (~50 ops per shape), jit-fused into the frame;
    differentiable, so an edit to any transform/size param reaches the image
    through the baked coefficients.
    """
    layout = baked_layout(spec)
    vals = [jnp.float32(6969.69)] * layout.n_slots  # slot 0 sentinel

    def node_affine(t, M, b, S):
        """Fold one node transform into the running affine (M, b) and scale
        product S: q' = R((q - pos)/s) = A q + c, A = R/s, c = -A pos."""
        s = pv[t.scale]
        inv = 1.0 / s
        R = _rot_matrix(pv[t.rot[0]], pv[t.rot[1]], pv[t.rot[2]])
        A = _mat_scale(R, inv)
        pos = (pv[t.pos[0]], pv[t.pos[1]], pv[t.pos[2]])
        Ap = _mat_vec(A, pos)
        M2 = _mat_mul(A, M)
        b2 = tuple(x - y for x, y in zip(_mat_vec(A, b), Ap))
        return M2, b2, S * s

    def emit(off, scalars):
        for i, v in enumerate(scalars):
            vals[off + i] = jnp.asarray(v, jnp.float32)

    def bake_shape(ss: ShapeSpec, bs: BakedShape, M, b, S, pos_trail, scale_trail):
        Mf, bf, Sf = node_affine(ss.transform, M, b, S)
        Mw = _mat_scale(Mf, Sf)  # = R_combined for uniform scales
        bw = tuple(e * Sf for e in bf)
        if ss.kind == KIND_SPHERE:
            c = tuple(-e for e in _mat_t_vec(Mw, bw))
            emit(bs.off, (*c, pv[ss.size[0]] * Sf))
        elif ss.kind == KIND_PLANE:
            # d = (M' p + b').y  ->  row 1 of M' and b'.y
            emit(bs.off, (Mw[3], Mw[4], Mw[5], bw[1]))
        elif ss.kind == KIND_CUBE:
            emit(bs.off, (*Mw, *bw,
                          pv[ss.size[0]] * Sf, pv[ss.size[1]] * Sf, pv[ss.size[2]] * Sf))
        elif ss.kind == KIND_OCTAHEDRON:
            emit(bs.off, (*Mw, *bw, pv[ss.size[0]] * Sf))
        else:
            raise ValueError(f"unknown shape kind {ss.kind}")
        if bs.aabb:
            # Reference AABB trails: positions summed unrotated, scales
            # multiplied (containers.rs:181-202, data_structures.rs:68-92).
            t = ss.transform
            cx = pos_trail[0] + pv[t.pos[0]]
            cy = pos_trail[1] + pv[t.pos[1]]
            cz = pos_trail[2] + pv[t.pos[2]]
            if ss.kind == KIND_CUBE:
                so = (pv[ss.size[0]], pv[ss.size[1]], pv[ss.size[2]])
            elif ss.kind == KIND_PLANE:
                one = jnp.float32(1.0)
                so = (one, one, one)
            else:
                so = (pv[ss.size[0]],) * 3
            hs = scale_trail * pv[t.scale] * pv[t.ex]
            hx, hy, hz = so[0] * hs, so[1] * hs, so[2] * hs
            emit(bs.aabb_off, (cx - hx, cy - hy, cz - hz, cx + hx, cy + hy, cz + hz))

    def bake_union(us: UnionSpec, bu: BakedUnion, M, b, S, pos_trail, scale_trail):
        M1, b1, S1 = node_affine(us.transform, M, b, S)
        emit(bu.init_off, (MAX_DIST * S1,))
        if bu.k_off >= 0:
            emit(bu.k_off, (pv[us.smooth_k] * S1,))
        t = us.transform
        pt = (pos_trail[0] + pv[t.pos[0]], pos_trail[1] + pv[t.pos[1]],
              pos_trail[2] + pv[t.pos[2]])
        st = scale_trail * pv[t.scale]
        for cu, bcu in zip(us.children_unions, bu.children_unions):
            bake_union(cu, bcu, M1, b1, S1, pt, st)
        for cs, bcs in zip(us.children_shapes, bu.children_shapes):
            bake_shape(cs, bcs, M1, b1, S1, pt, st)
        # Fully-culled value: MAXHIT seed folded through the child unions'
        # empty values (scenegen._empty_union_value, world-scaled).
        acc = vals[bu.init_off]
        k = vals[bu.k_off] if bu.k_off >= 0 else None
        for bcu in bu.children_unions:
            acc = _combine_scalar(bu.op, acc, vals[bcu.empty_off], k)
        emit(bu.empty_off, (acc,))

    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    for root, broot in zip(spec.roots, layout.roots):
        bake_union(root, broot, _IDENTITY, (zero, zero, zero), one,
                   (zero, zero, zero), one)
    return jnp.stack(vals)


def _combine_scalar(op, acc, d, k):
    if op == OP_UNION:
        return jnp.minimum(acc, d)
    if op == OP_SUBTRACTION:
        na = -acc
        return jnp.where(na >= d, na, d)
    if op == OP_SMOOTH_UNION:
        h = jnp.clip(0.5 + 0.5 * (d - acc) / k, 0.0, 1.0)
        return d * (1.0 - h) + acc * h - k * h * (1.0 - h)
    raise ValueError(f"unknown CSG op {op}")


# -- baked map / bounds -------------------------------------------------------


def _leaf_distance(bs: BakedShape, p: Vec3, bv):
    o = bs.off
    if bs.kind == KIND_SPHERE:
        dx = p.x - bv[o]
        dy = p.y - bv[o + 1]
        dz = p.z - bv[o + 2]
        return Vec3(dx, dy, dz).length_safe() - bv[o + 3]
    if bs.kind == KIND_PLANE:
        return bv[o] * p.x + bv[o + 1] * p.y + bv[o + 2] * p.z + bv[o + 3]
    q = Vec3(
        bv[o] * p.x + bv[o + 1] * p.y + bv[o + 2] * p.z + bv[o + 9],
        bv[o + 3] * p.x + bv[o + 4] * p.y + bv[o + 5] * p.z + bv[o + 10],
        bv[o + 6] * p.x + bv[o + 7] * p.y + bv[o + 8] * p.z + bv[o + 11],
    )
    if bs.kind == KIND_CUBE:
        return sd_cube(q, Vec3(bv[o + 12], bv[o + 13], bv[o + 14]))
    return sd_octahedron(q, bv[o + 12])


def _combine(op: int, acc_d, acc_i, d, i, index: int, k=None):
    """Identical fold semantics to scenegen._combine (containers.rs:244-252)."""
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


def _eval_shape(bs: BakedShape, p, bv, checks, acc_d, acc_i, op, k, si):
    d = _leaf_distance(bs, p, bv)
    i = jnp.full_like(acc_i, bs.shape_id)
    cd, ci = _combine(op, acc_d, acc_i, d, i, si, k)
    if bs.aabb:
        g = checks[bs.shape_id]
        return jnp.where(g, cd, acc_d), jnp.where(g, ci, acc_i)
    return cd, ci


@lru_cache(maxsize=None)
def analytic_eligible_ids(spec: SceneSpec) -> frozenset:
    """Shape ids the analytic-intersection trade may remove from the baked
    map (kernels/megakernel.py ``analytic_unboxed``).

    A guard-less shape is eligible iff dropping it from the fold and
    re-introducing it as a march cap is EXACT:

    * every union on its root path (including its own) is a plain UNION -
      the shape's distance then only ever passes through min-folds, which
      are order-insensitive, and its surface is never carved by a
      subtraction or reshaped by a smooth blend;
    * it is not the first shape of a union that also has child unions: the
      reference fold's first-shape ASSIGN (containers.rs:244-252) clobbers
      the children's contribution, so removing it would resurrect them;
    * its kind has a closed-form ray intersection (plane, sphere, cube).

    Round-3 note: the old predicate was "union-only tree + any guard-less
    shape", which silently mis-handled the clobber case and rejected
    subtraction trees outright; this per-shape test supersedes it.
    """
    from ..scene.model import KIND_CUBE as _KC, KIND_PLANE as _KP, \
        KIND_SPHERE as _KS

    out = set()

    def walk(us, union_path):
        here = union_path and us.op == OP_UNION
        for cu in us.children_unions:
            walk(cu, here)
        for si, ss in enumerate(us.children_shapes):
            if ss.transform.aabb or not here:
                continue
            if si == 0 and us.children_unions:
                continue  # first-shape-assign clobber
            if ss.kind in (_KP, _KS, _KC):
                out.add(ss.shape_id)

    for r in spec.roots:
        walk(r, True)
    return frozenset(out)


@lru_cache(maxsize=None)
def analytic_all_plan(spec: SceneSpec):
    """Static plan for the FULL-analytic bounce (kernels/megakernel.py
    ``analytic_all``): for union-only trees whose every leaf has a
    closed-form ray intersection (plane, sphere, cube), the march can be
    skipped entirely - the winner is the nearest analytic hit among the
    shapes in the ray's map.

    Returns ``None`` when the scene is ineligible (any non-union op),
    else a tuple of ``(BakedShape, clobber_ids)`` rows -
    one per leaf that can ever be in a ray's map - where ``clobber_ids``
    are the shape ids of guarded ancestor FIRST shapes whose passing
    ``check[]`` removes this leaf from the fold: the reference's
    first-shape ASSIGN (containers.rs:244-252) clobbers the accumulated
    child-union value, so every shape under a union's child unions is in
    the map only while each such ancestor first-shape guard FAILS.  A
    guard-less first shape clobbers statically: the subtree's shapes are
    simply absent from the plan (they can never render - the same quirk
    the map fold reproduces).
    """
    layout = baked_layout(spec)
    plan = []
    ok = [True]

    def walk(bu, clobber_ids, excluded):
        if bu.op != OP_UNION:
            ok[0] = False
            return
        sub_ids, sub_excl = clobber_ids, excluded
        if bu.children_shapes and bu.children_unions:
            s0 = bu.children_shapes[0]
            if s0.aabb:
                sub_ids = clobber_ids + (s0.shape_id,)
            else:
                sub_excl = True
        for cu in bu.children_unions:
            walk(cu, sub_ids, sub_excl)
        for bs in bu.children_shapes:
            # All four kinds have closed forms (octahedron: 4-slab
            # polytope, kernels/megakernel.py:_slab_polytope_t).
            if not excluded:
                plan.append((bs, clobber_ids))

    for root in layout.roots:
        walk(root, (), False)
    return tuple(plan) if ok[0] else None


def _union_cull_pred(bu: BakedUnion, anyhit, skip_ids=frozenset()):
    terms = []
    for cu in bu.children_unions:
        t = _union_cull_pred(cu, anyhit, skip_ids)
        if t is True:
            return True
        if t is not False:
            terms.append(t)
    for bs in bu.children_shapes:
        if not bs.aabb:
            if bs.shape_id in skip_ids:
                continue
            return True
        terms.append(anyhit[bs.shape_id])
    if not terms:
        return False
    pred = terms[0]
    for t in terms[1:]:
        pred = jnp.logical_or(pred, t)
    return pred


def _eval_union(bu: BakedUnion, p, bv, checks, anyhit, skip_ids=frozenset()):
    def evaluate(_):
        acc_d = p.x * 0.0 + bv[bu.init_off]
        acc_i = jnp.full(p.x.shape, -1, dtype=jnp.int32)
        k = bv[bu.k_off] if bu.k_off >= 0 else None
        for cu in bu.children_unions:
            cd, ci = _eval_union(cu, p, bv, checks, anyhit, skip_ids)
            acc_d, acc_i = _combine(bu.op, acc_d, acc_i, cd, ci, 1, k)
        for si, bs in enumerate(bu.children_shapes):
            if bs.shape_id in skip_ids:
                continue
            if bs.aabb and anyhit is not None:
                def do(args, bs=bs, si=si, k=k):
                    return _eval_shape(bs, p, bv, checks, args[0], args[1], bu.op, k, si)

                def skip(args):
                    return args

                acc_d, acc_i = jax.lax.cond(
                    anyhit[bs.shape_id], do, skip, (acc_d, acc_i)
                )
            else:
                acc_d, acc_i = _eval_shape(bs, p, bv, checks, acc_d, acc_i, bu.op, k, si)
        return acc_d, acc_i

    def skip(_):
        d = p.x * 0.0 + bv[bu.empty_off]
        return d, jnp.full(p.x.shape, -1, dtype=jnp.int32)

    if anyhit is None:
        return evaluate(None)
    pred = _union_cull_pred(bu, anyhit, skip_ids)
    if pred is True:
        return evaluate(None)
    if pred is False:
        return skip(None)
    return jax.lax.cond(pred, evaluate, skip, None)


def _eval_shape_d(bs: BakedShape, p, bv, checks, acc_d, op, k, si,
                  extra_mask=None):
    d = _leaf_distance(bs, p, bv)
    cd = _combine_scalar(op, acc_d, d, k) if si else d
    if bs.aabb:
        g = checks[bs.shape_id]
        if extra_mask is not None:
            g = g & extra_mask
        return jnp.where(g, cd, acc_d)
    return cd


def _guarded_runs(children, anyhit, group):
    """Chunk a union's child list into cond units: runs of up to ``group``
    consecutive anyhit-guarded shapes (grouped under ONE branch) and single
    always-evaluated shapes.  Yields (start_index, [shapes])."""
    i = 0
    while i < len(children):
        bs = children[i]
        guarded = bs.aabb and anyhit is not None and anyhit[bs.shape_id] is not None
        if not guarded:
            yield i, [bs]
            i += 1
            continue
        run = [bs]
        j = i + 1
        while (
            j < len(children)
            and len(run) < group
            and children[j].aabb
            and anyhit[children[j].shape_id] is not None
        ):
            run.append(children[j])
            j += 1
        yield i, run
        i = j


def _eval_union_d(bu: BakedUnion, p, bv, checks, anyhit,
                  skip_ids=frozenset()):
    """Distance-only fold of :func:`_eval_union` - no winning-id selects.

    The march only needs the scene distance per tap; the winning shape id is
    recovered by ONE full-map re-tap at the hit position (megakernel
    ``_final_idx``), so every per-shape int32 select drops out of the
    80-step hot loop.

    ``group`` > 1 merges up to that many consecutive guarded shapes under ONE
    lax.cond whose predicate is the OR of their active scalars, with each
    member additionally masked by its own scalar.  Bit-identical to per-shape
    conds (a masked member's guard is all-false, leaving the accumulator
    untouched) but the members' evaluation chains are INDEPENDENT inside one
    branch region, giving Mosaic instruction-level parallelism it cannot get
    across separate scf.if regions - the measured pipeline limiter of the
    march (benchmarks/diagnose.py, ~0.4 vreg-ops/cycle with per-shape conds).
    """

    def evaluate(_):
        acc_d = p.x * 0.0 + bv[bu.init_off]
        k = bv[bu.k_off] if bu.k_off >= 0 else None
        for cu in bu.children_unions:
            cd = _eval_union_d(cu, p, bv, checks, anyhit, skip_ids=skip_ids)
            acc_d = _combine_scalar(bu.op, acc_d, cd, k)
        cs = bu.children_shapes
        for start, run in _guarded_runs(cs, anyhit, 1):
            guarded = (
                run[0].aabb and anyhit is not None
                and anyhit[run[0].shape_id] is not None
            )
            if not guarded:
                if cs[start].shape_id in skip_ids:
                    # Guard-less shape excluded (analytic-intersection
                    # mode; per-shape eligibility guarantees its value only
                    # ever passed through min-folds - see
                    # analytic_eligible_ids).
                    continue
                acc_d = _eval_shape_d(cs[start], p, bv, checks, acc_d, bu.op,
                                      k, start)
                continue
            if len(run) == 1:
                bs = run[0]

                def do1(a, bs=bs, si=start, k=k):
                    return _eval_shape_d(bs, p, bv, checks, a, bu.op, k, si)

                acc_d = jax.lax.cond(anyhit[bs.shape_id], do1, lambda a: a, acc_d)
                continue
            pred = anyhit[run[0].shape_id]
            for bs in run[1:]:
                pred = jnp.logical_or(pred, anyhit[bs.shape_id])

            def do(a, run=run, start=start, k=k):
                for off, bs in enumerate(run):
                    a = _eval_shape_d(bs, p, bv, checks, a, bu.op, k,
                                      start + off,
                                      extra_mask=anyhit[bs.shape_id])
                return a

            acc_d = jax.lax.cond(pred, do, lambda a: a, acc_d)
        return acc_d

    def skip(_):
        return p.x * 0.0 + bv[bu.empty_off]

    if anyhit is None:
        return evaluate(None)
    pred = _union_cull_pred(bu, anyhit, skip_ids)
    if pred is True:
        return evaluate(None)
    if pred is False:
        return skip(None)
    return jax.lax.cond(pred, evaluate, skip, None)


def make_map_baked_d(spec: SceneSpec, skip_unboxed: bool = False):
    """Distance-only ``map(p, bv, checks, anyhit=None) -> d`` over baked
    geometry: identical distances to :func:`make_map_baked` with every
    winning-id int32 select removed (march + normal taps don't need ids).

    ``skip_unboxed=True`` excludes the ELIGIBLE guard-less shapes
    (:func:`analytic_eligible_ids`) - the analytic-intersection march
    handles those in closed form (kernels/megakernel.py
    ``analytic_unboxed``); ineligible guard-less shapes stay in the map."""
    layout = baked_layout(spec)
    skip_ids = analytic_eligible_ids(spec) if skip_unboxed else frozenset()

    def map_fn(p: Vec3, bv, checks, anyhit=None):
        d = jnp.full_like(p.x, MAX_DIST)
        for broot in layout.roots:
            d = jnp.minimum(d, _eval_union_d(broot, p, bv, checks, anyhit,
                                             skip_ids=skip_ids))
        return d

    return map_fn


def make_map_baked(spec: SceneSpec, skip_unboxed: bool = False):
    """Build ``map(p, bv, checks, anyhit=None) -> (d, idx)`` over baked
    geometry.  ``anyhit`` (tile-uniform per-shape predicates) enables the
    whole-subtree lax.cond skipping of scenegen.make_map_culled; pass None
    for the plain per-lane-guard map (oracle use).  ``skip_unboxed``: see
    :func:`make_map_baked_d`."""
    layout = baked_layout(spec)
    skip_ids = analytic_eligible_ids(spec) if skip_unboxed else frozenset()

    def map_fn(p: Vec3, bv, checks, anyhit=None):
        d = jnp.full_like(p.x, MAX_DIST)
        i = jnp.full(p.x.shape, -1, dtype=jnp.int32)
        for broot in layout.roots:
            rd_, ri_ = _eval_union(broot, p, bv, checks, anyhit, skip_ids)
            d, i = _combine(OP_UNION, d, i, rd_, ri_, 1)
        return d, i

    return map_fn


def spec_is_union_only(spec: SceneSpec) -> bool:
    """True when every CSG op in the tree is a plain union (min-fold).
    Gates order-insensitive optimizations: winner-leaf gradients
    (kernels/train.py) and guard-less-shape exclusion (skip_unboxed)."""

    def walk(u):
        if u.op != OP_UNION:
            return False
        return all(walk(c) for c in u.children_unions)

    return all(walk(r) for r in spec.roots)


GEOM_CHANNELS = max(_GEOM_SLOTS.values())  # widest leaf slot count (cube: 15)


def baked_geom_slot_matrix(spec: SceneSpec):
    """Static ``(n_shapes, GEOM_CHANNELS)`` matrix of bv slot indices: row s
    holds shape s's baked geometry slots (``BakedShape.off + c``), padded
    with -1 past the leaf's slot count.

    The winner-leaf gradient backend (kernels/train.py) scatter-adds
    per-(shape, channel) cotangent sums through this matrix - the geometry
    analog of scenegen.material_slot_matrix."""
    import numpy as _np

    layout = baked_layout(spec)
    m = _np.full((layout.n_shapes, GEOM_CHANNELS), -1, _np.int64)

    def walk(bu: BakedUnion):
        for cu in bu.children_unions:
            walk(cu)
        for bs in bu.children_shapes:
            n = _GEOM_SLOTS[bs.kind]
            m[bs.shape_id, :n] = _np.arange(bs.off, bs.off + n)

    for broot in layout.roots:
        walk(broot)
    return m


def baked_shapes_in_order(spec: SceneSpec):
    """All BakedShape leaves in walk order (for per-leaf codegen)."""
    layout = baked_layout(spec)
    out = []

    def walk(bu: BakedUnion):
        for cu in bu.children_unions:
            walk(cu)
        out.extend(bu.children_shapes)

    for broot in layout.roots:
        walk(broot)
    return tuple(out)


def leaf_distance_from_planes(kind: int, p: Vec3, sl):
    """:func:`_leaf_distance` with the leaf's bv slots given as (broadcast)
    ARRAYS instead of scalar reads - the differentiable-per-pixel form the
    winner-leaf gradient backend vjps (each pixel's slot copy is an
    independent input, so the vjp yields per-pixel parameter partials with
    no cross-lane scatter)."""
    if kind == KIND_SPHERE:
        return Vec3(p.x - sl[0], p.y - sl[1], p.z - sl[2]).length_safe() - sl[3]
    if kind == KIND_PLANE:
        return sl[0] * p.x + sl[1] * p.y + sl[2] * p.z + sl[3]
    q = Vec3(
        sl[0] * p.x + sl[1] * p.y + sl[2] * p.z + sl[9],
        sl[3] * p.x + sl[4] * p.y + sl[5] * p.z + sl[10],
        sl[6] * p.x + sl[7] * p.y + sl[8] * p.z + sl[11],
    )
    if kind == KIND_CUBE:
        return sd_cube(q, Vec3(sl[12], sl[13], sl[14]))
    return sd_octahedron(q, sl[12])


def make_bounds_baked(spec: SceneSpec, with_t: bool = False):
    """Build ``bounds(ro, rd, bv) -> (checks, debug)`` reading the baked
    world-space boxes; semantics of scenegen.make_bounds (including its
    ``with_t=True`` interval variant)."""
    layout = baked_layout(spec)

    def shapes_of(bu):
        for cu in bu.children_unions:
            yield from shapes_of(cu)
        yield from bu.children_shapes

    boxed = [bs for broot in layout.roots for bs in shapes_of(broot) if bs.aabb]

    def bounds_fn(ro: Vec3, rd: Vec3, bv):
        checks: list = [None] * layout.n_shapes
        tns: list = [None] * layout.n_shapes
        tfs: list = [None] * layout.n_shapes
        dbg = jnp.zeros_like(ro.x)
        for bs in boxed:
            o = bs.aabb_off
            lo = Vec3(bv[o], bv[o + 1], bv[o + 2])
            hi = Vec3(bv[o + 3], bv[o + 4], bv[o + 5])
            tn, tf = intersect_aabb(ro, rd, lo, hi)
            hit = aabb_hit(tn, tf)
            checks[bs.shape_id] = hit
            tns[bs.shape_id] = tn
            tfs[bs.shape_id] = tf
            dbg = dbg + 0.1 * hit.astype(dbg.dtype)
        if with_t:
            return tuple(checks), tuple(tns), tuple(tfs), dbg
        return tuple(checks), dbg

    return bounds_fn


# Note on analytic normals: per-leaf closed-form gradients selected by the
# winning shape id were tried and rejected - the sign of the map's gradient
# on a shape's surface is DYNAMIC, not static: a subtraction-negated shape
# renders un-negated wherever a sibling's AABB guard culls that sibling (the
# reference quirk of containers.rs:419-437), so no per-shape sign works.
# The fast-normal path is instead reverse-mode AD of the map at the hit point
# (render/reference.py:calc_normal_autodiff): exact for every fold including
# smooth-union blending, ~2 map taps of work instead of 6.
