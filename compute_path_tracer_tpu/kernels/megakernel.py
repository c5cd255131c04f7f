"""The Pallas TPU megakernel: the whole path tracer fused in VMEM.

The TPU-native re-architecture of the reference's single compute shader
(reference: assets/shaders/path_tracer/test_compute.glsl, dispatched as a
16x16-workgroup grid in src/path_tracer/path_tracer.rs:128-146):

* the Pallas grid tiles the image; each program owns one (TILE_H, TILE_W)
  pixel tile resident in VMEM - ray generation, the 80-step sphere march,
  normals, BSDF sampling, the bounce loop and progressive accumulation all
  run on that tile with zero HBM round-trips per march step;
* the scene parameter vector (the ``data[]`` SSBO analog) sits in SMEM and
  is read as scalars by the trace-time-unrolled ``map()``/``bounds()`` code -
  the same closures the jnp oracle uses (render/scenegen.py), so kernel and
  oracle share semantics *and* RNG bit-for-bit;
* materials are fetched by winning-shape id with a select-accumulate over
  the (static) shape list instead of a dynamic gather;
* GPU thread divergence (march break, bounce break, russian roulette)
  becomes masked lanes, as planned in SURVEY.md §7.

The kernel is generated per SceneSpec: spec topology is baked in at trace
time (the ``remake_pipeline`` analog; param-value edits reuse the compiled
kernel unchanged).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import DEFAULT_BOUNCES, DEFAULT_FOV, FP, MHD, STEPS
from ..ops.aabb import aabb_hit, intersect_aabb
from ..ops.camera import calc_uv, primary_ray
from ..ops.rng import gen_rng, random_float01
from ..render.baked import (
    analytic_all_plan,
    bake,
    baked_shapes_in_order,
    make_bounds_baked,
    make_map_baked,
    make_map_baked_d,
    spec_is_union_only,
)
from ..render.distgrid import (
    DEFAULT_RES as GRID_DEFAULT_RES,
    bake_dist_grid,
    grid_eligible,
    make_grid_tap,
)
from ..render.reference import Mat, calc_normal, calc_normal_autodiff, shade_bounce
from ..render.scenegen import (
    make_bounds,
    make_map_culled,
    make_map_culled_d,
    material_slot_matrix,
)
from ..scene.compile import SceneSpec
from ..vecmath import Vec3, vwhere

# Default VMEM tile. (64, 128) = 8192 pixels/program: f32-aligned lanes,
# large enough to amortize per-program overhead, small enough that the
# ~30 live per-pixel planes stay well under the VMEM budget.
DEFAULT_TILE = (64, 128)


def _make_smem_gather_mat(spec: SceneSpec, pv):
    """Material fetch by shape id as a select-accumulate.

    Dynamic vector gathers are awkward on TPU; with the shape list static we
    instead fold ``where(idx == s, param, acc)`` over shapes, reading each
    material scalar straight from SMEM.  All 18 Mat channels are
    materialized (round 5): the shared shade_bounce already computes the
    3-way specular/refract/diffuse branch in-kernel, so glass scenes now
    render identically to the oracle's extended refraction semantics
    (render/reference.py:184-240; the reference carries the four
    refraction slots unshaded, test_compute.glsl:54-58) instead of
    silently zeroing them - the round-4 verdict's backend divergence.
    """
    slots = material_slot_matrix(spec)
    n = spec.n_shapes

    def gather(idx):
        zero = jnp.zeros(idx.shape, jnp.float32)

        def chan(c):
            acc = zero
            for s in range(n):
                acc = jnp.where(idx == s, pv[int(slots[s, c])], acc)
            return acc

        def chan3(c):
            return Vec3(chan(c), chan(c + 1), chan(c + 2))

        return Mat(
            col=chan3(0),
            brightness=chan(3),
            light=chan3(4),
            spec=chan(7),
            spec_col=chan3(8),
            roughness=chan(11),
            ior=chan(12),
            refract_chance=chan(13),
            refract_roughness=chan(14),
            refract_col=chan3(15),
        )

    return gather


def _anyhit(checks):
    """Tile-uniform per-shape predicates: does ANY lane's ray hit shape i's
    AABB this bounce?  Feeds the whole-block skip in make_map_culled."""
    return tuple(
        None if c is None else (jnp.max(c.astype(jnp.int32)) > 0) for c in checks
    )


_BIG = 4.0 * FP  # sentinel beyond any reachable march distance


def _interval_scalars(checks, tns, tfs):
    """Reduce per-lane AABB slab intervals to tile-uniform per-shape scalars
    ``(anyhit, tn_min, tf_max)`` (None for always-evaluated shapes).

    ``tn_min``/``tf_max`` bound the t-range over every lane whose ray hits the
    shape's box, clamped to t >= 0 (rays start at t = 0; entry behind the
    origin means "already inside").  Consumed by :func:`_march_while_tcull`.
    """
    out = []
    for c, tn, tf in zip(checks, tns, tfs):
        if c is None:
            out.append(None)
            continue
        tn_min = jnp.min(jnp.where(c, jnp.maximum(tn, 0.0), _BIG))
        tf_max = jnp.max(jnp.where(c, tf, -_BIG))
        any_h = jnp.max(c.astype(jnp.int32)) > 0
        out.append((any_h, tn_min, tf_max))
    return tuple(out)


def _final_idx(map_ids, ro, rd, pv, checks, anyhit, t, t_prev):
    """Recover the winning shape id with ONE full-map re-tap at the last
    marched position.

    The march itself carries only (t, t_prev): cast_ray's winning id
    (reference.py:112-123) is the id of the map tap that triggered the stop,
    i.e. the tap at ``t_prev`` - re-evaluating there with the id-tracking map
    reproduces it exactly while the 80-step hot loop runs the distance-only
    fold with zero int32 selects.  Far lanes override to -1 (MDEF), matching
    the oracle's in-loop far test (final t > FP iff that test ever fired).
    """
    _d, mi = map_ids(ro + rd * t_prev, pv, checks, anyhit)
    return jnp.where(t > FP, -1, mi)


def _cube_rows_of(bs, bv):
    o = bs.off
    M = tuple(bv[o + i] for i in range(9))
    c = (bv[o + 9], bv[o + 10], bv[o + 11])
    b = (bv[o + 12], bv[o + 13], bv[o + 14])
    return M, c, b


_OCT_AXES = ((1.0, 1.0, 1.0), (1.0, 1.0, -1.0),
             (1.0, -1.0, 1.0), (1.0, -1.0, -1.0))


def _slab_polytope_t(oqs, dqs, bs_):
    """Nearest ray hit of a convex slab intersection |oq_k + t dq_k| <= b_k
    (cube: 3 axis slabs; octahedron: 4 diagonal slabs).  Exit face when the
    origin is inside; BIG when missed entirely."""
    lo = jnp.full_like(oqs[0], -_BIG)
    hi = jnp.full_like(oqs[0], _BIG)
    for oq, dq, b in zip(oqs, dqs, bs_):
        ok = jnp.abs(dq) > 1e-9
        inv = 1.0 / jnp.where(ok, dq, 1.0)
        ta = (-b - oq) * inv
        tb = (b - oq) * inv
        axlo = jnp.minimum(ta, tb)
        axhi = jnp.maximum(ta, tb)
        inside = jnp.abs(oq) <= b
        axlo = jnp.where(ok, axlo, jnp.where(inside, -_BIG, _BIG))
        axhi = jnp.where(ok, axhi, jnp.where(inside, _BIG, -_BIG))
        lo = jnp.maximum(lo, axlo)
        hi = jnp.minimum(hi, axhi)
    hit = (lo <= hi) & (hi > 0.0)
    return jnp.where(hit, jnp.where(lo > 0.0, lo, hi), _BIG)


def _leaf_analytic_t(bs, ro, rd, bv):
    """Closed-form nearest ray hit of one baked leaf (BIG when none).

    Shared by the unboxed analytic cap (round 3/4) and the full-analytic
    bounce (round 5).  Plane: one linear solve; sphere: quadratic, taking
    the exit root when the origin is inside; cube: 3-slab test in the
    orthonormal baked leaf frame (uniform scales), exit face from inside;
    octahedron: the same slab test over its 4 diagonal half-space pairs
    (|x|+|y|+|z| <= s is the intersection of |(+-1,+-1,+-1) . q| <= s).
    """
    return _leaf_analytic_t_slots(bs.kind, lambda i: bv[bs.off + i], ro, rd)


def _leaf_analytic_t_slots(kind, bv, ro, rd):
    """Slot-accessor form of :func:`_leaf_analytic_t`: ``bv`` is a callable
    ``slot_index -> scalar`` - static-offset reads for the trace-unrolled
    paths, dynamic SMEM reads for the SoA kernel (analytic_soa)."""
    from ..scene.model import KIND_CUBE, KIND_OCTAHEDRON, KIND_PLANE

    if kind in (KIND_CUBE, KIND_OCTAHEDRON):
        M = tuple(bv(i) for i in range(9))
        c = (bv(9), bv(10), bv(11))

        def row(r, v, add):
            return (M[3 * r] * v.x + M[3 * r + 1] * v.y + M[3 * r + 2] * v.z
                    + (add[r] if add else 0.0))

        oq = tuple(row(r, ro, c) for r in range(3))
        dq = tuple(row(r, rd, None) for r in range(3))
        if kind == KIND_CUBE:
            return _slab_polytope_t(oq, dq, (bv(12), bv(13), bv(14)))
        s = bv(12)
        oqs = tuple(ax[0] * oq[0] + ax[1] * oq[1] + ax[2] * oq[2]
                    for ax in _OCT_AXES)
        dqs = tuple(ax[0] * dq[0] + ax[1] * dq[1] + ax[2] * dq[2]
                    for ax in _OCT_AXES)
        return _slab_polytope_t(oqs, dqs, (s,) * 4)
    if kind == KIND_PLANE:
        denom = bv(0) * rd.x + bv(1) * rd.y + bv(2) * rd.z
        f0 = bv(0) * ro.x + bv(1) * ro.y + bv(2) * ro.z + bv(3)
        ok = jnp.abs(denom) > 1e-12
        t = jnp.where(ok, -f0 / jnp.where(ok, denom, 1.0), _BIG)
        return jnp.where(t > 0.0, t, _BIG)
    # sphere
    ocx = ro.x - bv(0)
    ocy = ro.y - bv(1)
    ocz = ro.z - bv(2)
    r = bv(3)
    b = ocx * rd.x + ocy * rd.y + ocz * rd.z
    c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = b * b - c  # |rd| == 1
    hit = disc >= 0.0
    root = jnp.sqrt(jnp.where(hit, disc, 0.0))
    t0 = -b - root
    t1 = -b + root
    t = jnp.where(t0 > 0.0, t0, jnp.where(t1 > 0.0, t1, _BIG))
    return jnp.where(hit, t, _BIG)


def _leaf_analytic_normal(bs, p, bv):
    """Exact surface normal of one baked leaf at (near-)surface point p."""
    return _leaf_analytic_normal_slots(bs.kind, lambda i: bv[bs.off + i], p)


def _leaf_analytic_normal_slots(kind, bv, p):
    """Slot-accessor form of :func:`_leaf_analytic_normal` (see
    :func:`_leaf_analytic_t_slots`)."""
    from ..scene.model import KIND_CUBE, KIND_OCTAHEDRON, KIND_PLANE

    zero = jnp.zeros_like(p.x)
    if kind == KIND_OCTAHEDRON:
        M = tuple(bv(i) for i in range(9))
        c = (bv(9), bv(10), bv(11))
        q = tuple(
            M[3 * r] * p.x + M[3 * r + 1] * p.y + M[3 * r + 2] * p.z
            + c[r] for r in range(3)
        )
        s = bv(12)
        vals = tuple(ax[0] * q[0] + ax[1] * q[1] + ax[2] * q[2]
                     for ax in _OCT_AXES)
        # Hit face = diagonal slab whose |value| reaches s; leaf normal is
        # that diagonal signed by the value, world = Mw^T n (orthonormal).
        best = jnp.full_like(p.x, -_BIG)
        nl = [zero, zero, zero]
        for ax, v in zip(_OCT_AXES, vals):
            r = jnp.abs(v) - s
            take = r > best
            best = jnp.where(take, r, best)
            sg = jnp.sign(v)
            nl = [jnp.where(take, sg * ax[i], nl[i]) for i in range(3)]
        return Vec3(
            M[0] * nl[0] + M[3] * nl[1] + M[6] * nl[2],
            M[1] * nl[0] + M[4] * nl[1] + M[7] * nl[2],
            M[2] * nl[0] + M[5] * nl[1] + M[8] * nl[2],
        ).normalize_safe()
    if kind == KIND_CUBE:
        M = tuple(bv(i) for i in range(9))
        c = (bv(9), bv(10), bv(11))
        b = (bv(12), bv(13), bv(14))
        q = tuple(
            M[3 * r] * p.x + M[3 * r + 1] * p.y + M[3 * r + 2] * p.z
            + c[r] for r in range(3)
        )
        # Hit face = axis where |q| reaches its half-extent; the leaf
        # normal is that axis signed by q, rotated back to world with
        # Mw^T (orthonormal).
        r0 = jnp.abs(q[0]) - b[0]
        r1 = jnp.abs(q[1]) - b[1]
        r2 = jnp.abs(q[2]) - b[2]
        ax0 = (r0 >= r1) & (r0 >= r2)
        ax1 = (~ax0) & (r1 >= r2)
        nl = (jnp.where(ax0, jnp.sign(q[0]), 0.0),
              jnp.where(ax1, jnp.sign(q[1]), 0.0),
              jnp.where(ax0 | ax1, 0.0, jnp.sign(q[2])))
        return Vec3(
            M[0] * nl[0] + M[3] * nl[1] + M[6] * nl[2],
            M[1] * nl[0] + M[4] * nl[1] + M[7] * nl[2],
            M[2] * nl[0] + M[5] * nl[1] + M[8] * nl[2],
        ).normalize_safe()
    if kind == KIND_PLANE:
        return Vec3(zero + bv(0), zero + bv(1), zero + bv(2))
    return Vec3(p.x - bv(0), p.y - bv(1),
                p.z - bv(2)).normalize_safe()


def _make_analytic_unboxed(spec: SceneSpec):
    """Closed-form intersection of the ELIGIBLE guard-less shapes
    (``if (true)`` in the reference codegen: infinite planes, unbounded
    lamp spheres, guard-less walls), the round-3-validated semantic trade
    (benchmarks/analytic_probe.py, 1.50x on the primary march): these
    shapes cost a map evaluation at EVERY tap of EVERY lane, yet a
    half-space, a sphere and a box intersect a ray exactly.  Round 4
    extends coverage from plane/sphere to CUBES (slab test in the baked
    leaf frame - Mw is orthonormal for the uniform scales the scene model
    has, so leaf-space ray lengths are world lengths) and from union-only
    trees to any tree via the per-shape eligibility predicate
    (render/baked.py:analytic_eligible_ids): only shapes whose value passes
    exclusively through min-folds leave the map.

    Returns ``(cap_fn, normal_fn, closest_fn)``:
    ``cap_fn(ro, rd, bv) -> (t_cap, cap_idx)`` - each lane's nearest
    analytic hit (BIG when none) and its shape id; rays starting inside a
    cube cap at its exit face (the |d|-march's behavior from inside);
    ``normal_fn(p, cap_idx, bv) -> Vec3`` - the exact surface normal of
    the capped shape (plane: its unit gradient n; sphere: (p - c)/|p - c|;
    cube: the argmax face normal rotated back to world);
    ``closest_fn(ro, rd, bv) -> (d_ca, t_ca, idx_ca)`` - the continuous
    closest-approach signed distance of the unboxed SPHERES (negative when
    the ray pierces), feeding the fused edge estimator: with skip_unboxed
    these shapes never appear in the march's map taps, so their silhouettes
    would otherwise be invisible to the d_min tracking.  Infinite planes
    are skipped (their only visibility edge is the measure-zero horizon);
    cube closest approach has no cheap closed form and is skipped too
    (documented edge-estimator gap for guard-less cubes).
    """
    from ..render.baked import analytic_eligible_ids
    from ..scene.model import KIND_CUBE, KIND_PLANE, KIND_SPHERE

    eligible = analytic_eligible_ids(spec)
    unboxed = tuple(
        bs for bs in baked_shapes_in_order(spec) if bs.shape_id in eligible
    )

    def cap_fn(ro, rd, bv):
        t_cap = jnp.full_like(ro.x, _BIG)
        cap_idx = jnp.full(ro.x.shape, -1, jnp.int32)
        for bs in unboxed:
            t = _leaf_analytic_t(bs, ro, rd, bv)
            closer = t < t_cap
            t_cap = jnp.where(closer, t, t_cap)
            cap_idx = jnp.where(closer, bs.shape_id, cap_idx)
        return t_cap, cap_idx

    def normal_fn(p, cap_idx, bv):
        zero = jnp.zeros_like(p.x)
        n = Vec3(zero, zero, zero)
        for bs in unboxed:
            won = cap_idx == bs.shape_id
            n = vwhere(won, _leaf_analytic_normal(bs, p, bv), n)
        return n

    def closest_fn(ro, rd, bv):
        from ..scene.model import KIND_SPHERE as _KS

        d_ca = jnp.full_like(ro.x, _BIG)
        t_ca = jnp.zeros_like(ro.x)
        i_ca = jnp.full(ro.x.shape, -1, jnp.int32)
        for bs in unboxed:
            if bs.kind != _KS:
                continue
            o = bs.off
            ocx = ro.x - bv[o]
            ocy = ro.y - bv[o + 1]
            ocz = ro.z - bv[o + 2]
            r = bv[o + 3]
            b = ocx * rd.x + ocy * rd.y + ocz * rd.z
            t = -b  # along-ray closest point (|rd| == 1)
            perp2 = jnp.maximum(ocx * ocx + ocy * ocy + ocz * ocz - b * b,
                                0.0)
            d = jnp.sqrt(perp2) - r
            # Behind-the-origin closest points: use the origin's distance.
            d0 = jnp.sqrt(ocx * ocx + ocy * ocy + ocz * ocz) - r
            d = jnp.where(t > 0.0, d, d0)
            t = jnp.maximum(t, 0.0)
            closer = d < d_ca
            d_ca = jnp.where(closer, d, d_ca)
            t_ca = jnp.where(closer, t, t_ca)
            i_ca = jnp.where(closer, bs.shape_id, i_ca)
        return d_ca, t_ca, i_ca

    return cap_fn, normal_fn, closest_fn


def _make_analytic_all(spec: SceneSpec):
    """FULL-analytic bounce for union-only scenes (round 5): every leaf
    kind intersects a ray in closed form (octahedron via its 4-slab
    polytope decomposition), so the winner
    is the per-lane argmin of analytic hits over the shapes in the ray's
    map - the 80-step march, the 6 normal taps and the final-id re-tap
    all disappear.  Membership matches the reference fold exactly: a
    guarded shape is in a ray's map iff its ``check[]`` passes
    (test_compute.glsl + generated guards), and shapes under a union's
    child unions are clobbered out while an ancestor first-shape guard
    passes (render/baked.py:analytic_all_plan).

    Divergence contract (same classes as ``analytic_unboxed``, now
    whole-scene): hits land exactly ON surfaces instead of the
    |d| < MHD march shell, ties at equal t pick the earlier shape in
    walk order, and the creeping budget-exit class resolves exactly
    (there is no step budget).

    Returns ``(isect_fn, normal_fn)``:
    ``isect_fn(ro, rd, bv, checks, anyhit) -> (t, idx)`` with
    tile-uniform lax.cond skipping per guarded shape;
    ``normal_fn(p, idx, bv, anyhit) -> Vec3`` exact winner normals.
    """
    plan = analytic_all_plan(spec)
    if plan is None:
        raise ValueError("analytic_all requires a union-only tree")

    def isect_fn(ro, rd, bv, checks, anyhit):
        t_min = jnp.full_like(ro.x, _BIG)
        idx = jnp.full(ro.x.shape, -1, jnp.int32)

        for bs, clobber_ids in plan:
            def eval_one(args, bs=bs, clobber_ids=clobber_ids):
                tm, ix = args
                t = _leaf_analytic_t(bs, ro, rd, bv)
                incl = checks[bs.shape_id] if bs.aabb else None
                for cid in clobber_ids:
                    c = ~checks[cid]
                    incl = c if incl is None else (incl & c)
                if incl is not None:
                    t = jnp.where(incl, t, _BIG)
                closer = t < tm
                return (jnp.where(closer, t, tm),
                        jnp.where(closer, bs.shape_id, ix))

            if (bs.aabb and anyhit is not None
                    and anyhit[bs.shape_id] is not None):
                t_min, idx = lax.cond(anyhit[bs.shape_id], eval_one,
                                      lambda a: a, (t_min, idx))
            else:
                t_min, idx = eval_one((t_min, idx))
        return t_min, idx

    def normal_fn(p, idx, bv, anyhit):
        zero = jnp.zeros_like(p.x)
        n = Vec3(zero, zero, zero)
        for bs, _clobber in plan:
            def eval_one(n_, bs=bs):
                cand = _leaf_analytic_normal(bs, p, bv)
                return vwhere(idx == bs.shape_id, cand, n_)

            if (bs.aabb and anyhit is not None
                    and anyhit[bs.shape_id] is not None):
                n = lax.cond(anyhit[bs.shape_id], eval_one, lambda a: a, n)
            else:
                n = eval_one(n)
        return n

    return isect_fn, normal_fn


def _make_soa_analytic(layout):
    """In-kernel SoA full-analytic fold (round 5): ``lax.fori_loop`` over
    the packed SMEM shape tables (render/soa.py:build_soa_smem_layout)
    instead of trace-time per-shape unrolling - O(1) trace and Mosaic
    compile regardless of prim count, the scaling fix for the
    superlinear-compile limit measured in prim_scaling_r05.jsonl (256-prim
    faithful forward: tens of minutes; 512: never finished).

    Semantics are _make_analytic_all's exactly: per-shape membership =
    own AABB ``check[]`` (aabb.glsl:21-33) AND no clobbering ancestor
    first-shape guard passes (containers.rs:244-252); equal-t ties pick
    the earlier shape in walk order (within a kind the fold keeps the
    first winner; across kinds a lexicographic (t, shape_id) combine).
    Returns ``(isect_fn, normal_fn, gather_mat_fn)`` each taking the SoA
    SMEM refs explicitly.
    """
    _SID_NONE = jnp.int32(2 ** 30)

    def _slab_box(ro, rd, box):
        """Per-lane AABB slab hit from 6 scalars (lo3, hi3); semantics of
        ops/aabb.py:intersect_aabb + aabb_hit."""
        tn = jnp.full_like(ro.x, -jnp.inf)
        tf = jnp.full_like(ro.x, jnp.inf)
        for lo_s, hi_s, o, d in ((box[0], box[3], ro.x, rd.x),
                                 (box[1], box[4], ro.y, rd.y),
                                 (box[2], box[5], ro.z, rd.z)):
            ta = (lo_s - o) / d
            tb = (hi_s - o) / d
            tn = jnp.maximum(tn, jnp.minimum(ta, tb))
            tf = jnp.minimum(tf, jnp.maximum(ta, tb))
        return (tn < tf) & (tf > 0.0)

    U = layout.unroll

    def isect_fn(ro, rd, f_ref, i_ref):
        t_best = jnp.full(ro.x.shape, _BIG, jnp.float32)
        sid_best = jnp.full(ro.x.shape, _SID_NONE, jnp.int32)
        for kd in layout.kinds:
            # U shapes per trip (static inner unroll): the loop-carried
            # min fold otherwise serializes the per-shape ALU chains that
            # the fully unrolled kernel lets Mosaic interleave.
            def body(c, carry, kd=kd):
                # Membership slabs for the trip's U shapes first: their OR
                # drives a tile-uniform skip of the intersection math (the
                # SoA analog of the unrolled kernel's per-shape anyhit
                # lax.conds, which the round-5 breakdown measured
                # net-positive).
                incls = []
                for j in range(U):
                    s = c * U + j
                    guard = i_ref[kd.i_guard + s]
                    ab = kd.f_aabb + s * 6
                    own = _slab_box(ro, rd,
                                    [f_ref[ab + k] for k in range(6)])
                    # own | unguarded - NOT a where(): Mosaic cannot
                    # legalize arith.select on i1 vectors.
                    incl = own | (guard == 0)
                    for a_ in range(kd.a):
                        av = i_ref[kd.i_anc_valid + s * kd.a + a_]
                        ob = kd.f_anc + (s * kd.a + a_) * 6
                        ah = _slab_box(ro, rd,
                                       [f_ref[ob + k] for k in range(6)])
                        incl = incl & ~((av != 0) & ah)
                    incls.append(incl)
                pred = jnp.int32(0)
                for incl in incls:
                    pred = jnp.maximum(pred, jnp.max(incl.astype(jnp.int32)))

                def hot(cr, c=c, kd=kd, incls=incls):
                    t_min, sid_min = cr
                    for j in range(U):
                        s = c * U + j
                        gbase = kd.f_geom + s * kd.w
                        t = _leaf_analytic_t_slots(
                            kd.kind, lambda i, b=gbase: f_ref[b + i],
                            ro, rd)
                        t = jnp.where(incls[j], t, _BIG)
                        sid = i_ref[kd.i_sid + s]
                        better = t < t_min
                        t_min = jnp.where(better, t, t_min)
                        sid_min = jnp.where(better, sid, sid_min)
                    return (t_min, sid_min)

                return lax.cond(pred > 0, hot, lambda cr: cr, carry)

            t_k, s_k = lax.fori_loop(
                0, kd.n_pad // U, body,
                (jnp.full(ro.x.shape, _BIG, jnp.float32),
                 jnp.full(ro.x.shape, _SID_NONE, jnp.int32)))
            better = (t_k < t_best) | ((t_k == t_best) & (s_k < sid_best))
            t_best = jnp.where(better, t_k, t_best)
            sid_best = jnp.where(better, s_k, sid_best)
        idx = jnp.where(sid_best == _SID_NONE, -1, sid_best)
        return t_best, idx

    def normal_fn(p, idx, f_ref, i_ref):
        zero = jnp.zeros_like(p.x)
        nx, ny, nz = zero, zero, zero
        for kd in layout.kinds:
            def body(c, carry, kd=kd):
                cx, cy, cz = carry
                for j in range(U):
                    s = c * U + j
                    gbase = kd.f_geom + s * kd.w
                    cand = _leaf_analytic_normal_slots(
                        kd.kind, lambda i, b=gbase: f_ref[b + i], p)
                    take = idx == i_ref[kd.i_sid + s]
                    cx = jnp.where(take, cand.x, cx)
                    cy = jnp.where(take, cand.y, cy)
                    cz = jnp.where(take, cand.z, cz)
                return (cx, cy, cz)

            nx, ny, nz = lax.fori_loop(0, kd.n_pad // U, body,
                                       (nx, ny, nz))
        return Vec3(nx, ny, nz)

    def gather_mat_fn(idx, f_ref):
        c_n = 18

        def body(c, acc):
            for j in range(U):
                s = c * U + j
                base = layout.f_mat + s * c_n
                take = idx == s
                acc = tuple(jnp.where(take, f_ref[base + ch], a)
                            for ch, a in enumerate(acc))
            return acc

        zero = jnp.zeros(idx.shape, jnp.float32)
        acc = lax.fori_loop(0, layout.n_shapes_pad // U, body,
                            (zero,) * c_n)
        return Mat(
            col=Vec3(acc[0], acc[1], acc[2]),
            brightness=acc[3],
            light=Vec3(acc[4], acc[5], acc[6]),
            spec=acc[7],
            spec_col=Vec3(acc[8], acc[9], acc[10]),
            roughness=acc[11],
            ior=acc[12],
            refract_chance=acc[13],
            refract_roughness=acc[14],
            refract_col=Vec3(acc[15], acc[16], acc[17]),
        )

    return isect_fn, normal_fn, gather_mat_fn


def _march_while_tcull(map_d_culled, ro, rd, pv, checks, ivals, alive=None,
                       with_stats=False, omega=1.0, t_cap=None,
                       with_closest=False, refresh_every=1):
    """Sphere march with PER-STEP t-interval shape culling.

    The bounce-level anyhit cull asks "does any lane's ray hit shape i's box
    anywhere?"; this march additionally asks "...at the t-range the tile is
    marching through RIGHT NOW".  Per step, with t_lo/t_hi the live-lane
    t-front, shape i is

    * active   - evaluated in the map - iff any lane hits its box and
      ``tn_min_i <= t_hi`` and ``tf_max_i >= t_lo`` (the tile front overlaps
      its interval);
    * pending  - box ahead of every lane - excluded from the map, but its
      ``tn_min`` clamps the step: ``step = min(|d|, max(m - t, MHD))`` with
      ``m`` the nearest pending entry, so no lane can jump into an
      unevaluated box (per lane, m - t <= own_tn - t = distance to its own
      box entry; the MHD floor guarantees progress and at most MHD of
      overshoot past a box ENTRY - not past a surface, which lies deeper);
    * passed   - box fully behind every live lane - excluded outright (a
      convex box's ray interval cannot be re-entered going forward).

    Divergence from the per-ray-guard reference semantics (test_compute.glsl
    :74-89 with the generated check[] guards): excluded shapes do not
    contribute to the |d| < MHD hit test, which can flip hit/miss for rays
    passing within MHD (1e-3) of a surface near a box boundary - an
    eps-level edge effect measured at <0.1% of pixels; everything else is
    exact because active shapes use the same fold.

    OVER-RELAXATION (``omega > 1``, opt-in, NOT reference-faithful): steps
    are stretched to ``omega * |d|`` with the classic sphere-overlap
    safeguard (Keinert et al. enhanced sphere tracing): if the new sample's
    unbounding sphere no longer overlaps the previous one
    (``step > d_prev + d``), the stretched step may have tunneled - the
    lane REVERTS to the conservative step ``t_prev + d_prev`` and continues.
    No surface can be missed (every accepted advance is covered by
    unbounding spheres), but the tap sequence - and therefore the exact
    sub-MHD landing t - differs from the reference march; measured image
    deltas are recorded by benchmarks/variants rows, and the mode stays off
    every parity benchmark.

    Returns ``(t, t_prev)``; ids are recovered by :func:`_final_idx`.

    ``with_closest=True`` (faithful omega only) additionally tracks the
    closest approach over the culled-map taps of live lanes -
    ``(d_min, t_at_min)``, the visibility-edge estimator's input
    (diff/vjp.py:_march_closest, here fused into the same march) - and
    returns ``(t, t_prev, d_min, t_min)``.

    ``refresh_every=K`` (faithful omega only; STEPS % K == 0) recomputes
    the per-step activation machinery - the two t-front reductions, the
    per-shape predicate chains, and the pending-entry fold - only once per
    K-step window, holding (active, m) frozen for the window's inner loop.
    Safety is inherited from the pending clamp: a shape whose interval the
    advancing front reaches mid-window was PENDING at refresh time, and
    the frozen clamp ``max(m - t, MHD)`` still stops every lane at the
    nearest pending entry, up to the MHD-floor creep - now bounded by
    K * MHD past a box ENTRY per window instead of MHD (the same
    documented eps-level divergence class as t_cull itself, widened
    K-fold).  Shapes leaving the front mid-window merely stay active (cost,
    not correctness).  Lanes clamped by a stale m take shorter steps than
    the faithful sequence, which can shift the sub-MHD landing tap and
    budget-exit accounting at the same eps level.
    """
    t0 = ro.x * 0.0
    relax = float(omega) != 1.0
    if with_closest and (relax or with_stats):
        raise ValueError("with_closest requires omega=1.0, with_stats=False")
    refresh_every = int(refresh_every)
    if refresh_every != 1:
        if relax or with_stats:
            raise ValueError("refresh_every requires omega=1.0, "
                             "with_stats=False")
        if STEPS % refresh_every:
            raise ValueError(f"STEPS={STEPS} not divisible by "
                             f"refresh_every={refresh_every}")
    # Lanes already dead in the bounce loop start the march done: their
    # frozen rays must neither extend the while_loop nor widen the t-front.
    done0 = t0.astype(jnp.int32) if alive is None else (~alive).astype(jnp.int32)

    def cond(c):
        step, done_i = c[0], c[3]
        return jnp.logical_and(step < STEPS, jnp.min(done_i) < 1)

    def body(c):
        if relax:
            step, t, tp, done_i, d_prev, s_prev, f_prev, actacc = c
        elif with_closest:
            step, t, tp, done_i, actacc, d_min, t_min = c
        else:
            step, t, tp, done_i, actacc = c
        done = done_i != 0
        t_hi = jnp.max(jnp.where(done, -_BIG, t))
        t_lo = jnp.min(jnp.where(done, _BIG, t))

        active = []
        m = jnp.float32(_BIG)  # nearest pending t-interval entry
        for iv in ivals:
            if iv is None:
                active.append(None)
                continue
            any_h, tn_min, tf_max = iv
            not_reached = tn_min > t_hi
            act = any_h & ~not_reached & (tf_max >= t_lo)
            active.append(act)
            m = jnp.where(any_h & not_reached, jnp.minimum(m, tn_min), m)

        if with_stats:
            for act in active:
                if act is not None:
                    actacc = actacc + act.astype(jnp.float32)

        if not relax:
            def substep(sc):
                if with_closest:
                    t, tp, done_i, d_min, t_min = sc
                else:
                    t, tp, done_i = sc
                done = done_i != 0
                p = ro + rd * t
                d = map_d_culled(p, pv, checks, tuple(active))
                ad = jnp.abs(d)
                if with_closest:
                    better = (~done) & (d < d_min)
                    d_min = jnp.where(better, d, d_min)
                    t_min = jnp.where(better, t, t_min)
                clamp = jnp.maximum(m - t, MHD)
                step_len = jnp.minimum(ad, clamp)
                nt = jnp.where(done, t, t + step_len)
                if t_cap is not None:
                    # Analytic-intersection cap: a lane that would march
                    # past its nearest guard-less closed-form hit stops
                    # exactly ON that surface (the map excludes those
                    # shapes).
                    nt = jnp.where(done, nt, jnp.minimum(nt, t_cap))
                ntp = jnp.where(done, tp, t)
                ndone = done | (ad < MHD) | (nt > FP)
                if t_cap is not None:
                    ndone = ndone | (nt >= t_cap)
                if with_closest:
                    return nt, ntp, ndone.astype(jnp.int32), d_min, t_min
                return nt, ntp, ndone.astype(jnp.int32)

            if with_closest:
                sc = (t, tp, done_i, d_min, t_min)
            else:
                sc = (t, tp, done_i)
            if refresh_every == 1:
                sc = substep(sc)
            else:
                # Frozen (active, m) window; see the refresh_every contract
                # in the docstring.
                sc = lax.fori_loop(0, refresh_every, lambda _j, s: substep(s),
                                   sc)
            if with_closest:
                nt, ntp, ndone_i, d_min, t_min = sc
                return (step + refresh_every, nt, ntp, ndone_i, actacc,
                        d_min, t_min)
            nt, ntp, ndone_i = sc
            return step + refresh_every, nt, ntp, ndone_i, actacc
        p = ro + rd * t
        d = map_d_culled(p, pv, checks, tuple(active))
        ad = jnp.abs(d)
        clamp = jnp.maximum(m - t, MHD)
        # Overlap check on SIGNED distances: a stretched step is only valid
        # if the unbounding spheres overlap, s_prev <= d_prev + d; signed d
        # makes a sign crossing (surface between the samples) fire the test
        # even when |d| alone looks safe - the horizon-grazing tunnel caught
        # by tests/test_overrelax.py.  On failure the lane REVERTS to the
        # step the faithful march would have taken from the previous sample
        # (f_prev = min(|d|, clamp) THERE - the clamp keeps reverts out of
        # pending boxes too).  Stretching applies only to EXTERIOR samples
        # (d > 0): interior lanes (refraction) march faithfully, so the
        # exit-surface shell cannot be jumped and reverts cannot loop.
        overshoot = (~done) & (d_prev > 0.0) & (s_prev > d_prev + d)
        step_len = jnp.where(
            d > 0.0, jnp.minimum(jnp.float32(omega) * ad, clamp),
            jnp.minimum(ad, clamp),
        )
        f_here = jnp.minimum(ad, clamp)
        nt = jnp.where(done, t, jnp.where(overshoot, tp + f_prev,
                                          t + step_len))
        if t_cap is not None:
            nt = jnp.where(done, nt, jnp.minimum(nt, t_cap))
        ntp = jnp.where(done, tp, jnp.where(overshoot, tp, t))
        nd_prev = jnp.where(done, d_prev, jnp.where(overshoot, d_prev, d))
        ns_prev = jnp.where(done, s_prev,
                            jnp.where(overshoot, f_prev, step_len))
        nf_prev = jnp.where(done, f_prev,
                            jnp.where(overshoot, f_prev, f_here))
        hit = jnp.logical_and(~overshoot, ad < MHD)
        ndone = done | hit | (nt > FP)
        if t_cap is not None:
            ndone = ndone | (nt >= t_cap)
        return (step + 1, nt, ntp, ndone.astype(jnp.int32),
                nd_prev, ns_prev, nf_prev, actacc)

    if relax:
        init = (jnp.int32(0), t0, t0, done0, t0, t0, t0, jnp.float32(0.0))
        steps, t, tp, _, _, _, _, actacc = lax.while_loop(cond, body, init)
    elif with_closest:
        init = (jnp.int32(0), t0, t0, done0, jnp.float32(0.0),
                t0 + jnp.float32(_BIG), t0)
        steps, t, tp, _, actacc, d_min, t_min = lax.while_loop(
            cond, body, init)
        return t, tp, d_min, t_min
    else:
        init = (jnp.int32(0), t0, t0, done0, jnp.float32(0.0))
        steps, t, tp, _, actacc = lax.while_loop(cond, body, init)
    if with_stats:
        return t, tp, steps, actacc
    return t, tp


GRID_TAU = 4.0 * MHD     # exact-tap shell: lanes with bound below this march exactly
GRID_EXTRA_ITERS = 256   # global cap on cheap advances beyond the STEPS budget


def _march_while_grid(map_d_culled, ro, rd, pv, checks, ivals, grid_tap,
                      alive=None, tau=GRID_TAU, t_cap=None):
    """Sphere march accelerated by the baked lower-bound distance grid
    (render/distgrid.py; the round-5 generalization of the reference's
    per-ray AABB culling, shader_out/test_compute.glsl:185-245).

    Per iteration every live lane taps the grid bound ``g`` (a per-lane
    dynamic gather, ~1.3 ns/lane); lanes with ``g >= tau`` advance by
    ``g`` - provably below the per-ray map, so no surface can be crossed -
    WITHOUT evaluating the exact map.  Only when some lane is within
    ``tau`` of a surface does the tile run one exact culled map tap, with
    the t-interval activation front restricted to the NEAR lanes (the
    same activation + pending-clamp machinery as
    :func:`_march_while_tcull`, so near-lane trajectories keep its exact
    semantics and its documented eps divergence).  Far lanes never read
    the near-front-culled exact value (shapes near them may be inactive);
    they keep their grid bound.

    Divergence contract (documented in render/distgrid.py): hits fire
    only on exact taps and cheap advances cannot tunnel, but the tap
    sequence differs from the reference's 80x map schedule, so sub-MHD
    landing positions and budget-exit accounting shift at eps level.  The
    STEPS budget counts EXACT taps per lane; cheap advances are bounded
    globally by ``STEPS + GRID_EXTRA_ITERS``.

    Returns ``(t, t_prev)``; ids are recovered by :func:`_final_idx`.
    """
    t0 = ro.x * 0.0
    done0 = t0.astype(jnp.int32) if alive is None else (~alive).astype(jnp.int32)
    ec0 = t0.astype(jnp.int32)
    max_it = STEPS + GRID_EXTRA_ITERS

    def cond(c):
        it, _t, _tp, done_i, _ec = c
        return jnp.logical_and(it < max_it, jnp.min(done_i) < 1)

    def body(c):
        it, t, tp, done_i, ec = c
        done = done_i != 0
        p = ro + rd * t
        g = grid_tap(p)
        near = (~done) & (g < tau)
        any_near = jnp.max(near.astype(jnp.int32)) > 0

        def exact_branch(_):
            t_hi = jnp.max(jnp.where(near, t, -_BIG))
            t_lo = jnp.min(jnp.where(near, t, _BIG))
            active = []
            m = jnp.float32(_BIG)
            for iv in ivals:
                if iv is None:
                    active.append(None)
                    continue
                any_h, tn_min, tf_max = iv
                not_reached = tn_min > t_hi
                act = any_h & ~not_reached & (tf_max >= t_lo)
                active.append(act)
                m = jnp.where(any_h & not_reached, jnp.minimum(m, tn_min), m)
            d = map_d_culled(p, pv, checks, tuple(active))
            return d, m

        def skip_branch(_):
            return jnp.full_like(t, _BIG), jnp.float32(_BIG)

        d, m = lax.cond(any_near, exact_branch, skip_branch, None)
        ad = jnp.abs(d)
        clamp = jnp.maximum(m - t, MHD)
        step = jnp.where(near, jnp.minimum(ad, clamp), g)
        nt = jnp.where(done, t, t + step)
        if t_cap is not None:
            nt = jnp.where(done, nt, jnp.minimum(nt, t_cap))
        ntp = jnp.where(done, tp, t)
        nec = ec + near.astype(jnp.int32)
        hit = near & (ad < MHD)
        ndone = done | hit | (nt > FP) | (nec >= STEPS)
        if t_cap is not None:
            ndone = ndone | (nt >= t_cap)
        return it + 1, nt, ntp, ndone.astype(jnp.int32), nec

    _, t, tp, _, _ = lax.while_loop(
        cond, body, (jnp.int32(0), t0, t0, done0, ec0))
    return t, tp


def _march_while_ids(map_culled, ro, rd, pv, checks, ivals):
    """Round-1-style march carrying the winning id per step (the exact
    cast_ray fold, reference.py:112-123), with the same per-step interval/
    gap activation as :func:`_march_while_tcull`.

    Kept for the debug-mode render paths: the faster distance-only fold's
    guarded selects fail Mosaic layout inference when the march is invoked
    outside the bounce while_loop (see the debug branch in _make_kernel);
    this fold compiles everywhere, and a one-march diagnostic mode doesn't
    feel its extra int32 selects.
    """
    t0 = ro.x * 0.0
    done0 = t0.astype(jnp.int32)
    idx0 = done0 - 1

    def cond(c):
        step, _t, _idx, done_i = c
        return jnp.logical_and(step < STEPS, jnp.min(done_i) < 1)

    def body(c):
        step, t, idx, done_i = c
        done = done_i != 0
        t_hi = jnp.max(jnp.where(done, -_BIG, t))
        t_lo = jnp.min(jnp.where(done, _BIG, t))

        active = []
        m = jnp.float32(_BIG)
        for iv in ivals:
            if iv is None:
                active.append(None)
                continue
            any_h, tn_min, tf_max = iv
            not_reached = tn_min > t_hi
            act = any_h & ~not_reached & (tf_max >= t_lo)
            active.append(act)
            m = jnp.where(any_h & not_reached, jnp.minimum(m, tn_min), m)

        p = ro + rd * t
        d, mi = map_culled(p, pv, checks, tuple(active))
        ad = jnp.abs(d)
        step_len = jnp.minimum(ad, jnp.maximum(m - t, MHD))
        nt = jnp.where(done, t, t + step_len)
        nidx = jnp.where(done, idx, mi)
        far = nt > FP
        nidx = jnp.where(jnp.logical_and(~done, far), -1, nidx)
        ndone = done | (ad < MHD) | far
        return step + 1, nt, nidx, ndone.astype(jnp.int32)

    _, t, idx, _ = lax.while_loop(cond, body, (jnp.int32(0), t0, idx0, done0))
    return t, idx


def _march_while(map_d_culled, ro, rd, pv, checks, anyhit, alive=None):
    """Sphere march with bounce-level anyhit culling only - exact cast_ray
    trajectories (render/reference.py:86-126; no per-step interval
    activation and no step clamps that a live lane can feel).

    Implemented as :func:`_march_while_tcull` over TRIVIAL intervals
    ([0, _BIG] for every anyhit shape): activation reduces to the anyhit
    scalar exactly, the pending clamp never binds before the far plane (the
    only reachable clamp is the final far overshoot, whose t lands > FP
    either way and whose lane outputs are miss-masked), and - the real
    reason - it reuses the one march formulation Mosaic's layout inference
    compiles on hardware.  The textbook while_loop with loop-invariant
    anyhit lax.conds fails Mosaic with "Invalid relayout: non-singleton
    logical dimension is replicated" at the guard selects; deriving the
    per-step actives from in-loop reductions (as the t-cull body does)
    avoids the replicated-layout join.  Caught by the `pytest -m tpu`
    hardware lane; interpret mode never sees the difference.
    [Mosaic workaround; observed on jax/jaxlib 0.9.0 + libtpu 0.0.34 -
    tests/test_tpu.py:test_mosaic_workaround_toolchain_witness]

    Returns ``(t, t_prev)``; ids are recovered by :func:`_final_idx`.
    """
    zero = jnp.float32(0.0)
    big = jnp.float32(_BIG)
    ivals = tuple(
        None if a is None else (a, zero, big) for a in anyhit
    )
    return _march_while_tcull(map_d_culled, ro, rd, pv, checks, ivals,
                              alive=alive)


def _path_trace_tile(map_culled, map_d_culled, bounds_fn, gather_mat, ro, rd,
                     pv, rng, bounces, normal_fn=calc_normal, t_cull=False,
                     stats=False, omega=1.0, analytic=None, refresh_every=1,
                     grid_tap=None, grid_tau=GRID_TAU, analytic_full=None):
    """The bounce loop of render/reference.py:path_trace (same shading math,
    test_compute.glsl:91-166) restructured for a VMEM tile: a while_loop that
    exits once every lane is dead, with per-bounce tile-level AABB culling
    (plus per-step t-interval culling when ``t_cull``; the normal taps and
    the material fetch always use the bounce-level sets).  The march and the
    normal taps run the distance-only map (``map_d_culled``); the id-tracking
    ``map_culled`` is used once per bounce by :func:`_final_idx`."""
    zero = ro.x * 0.0
    one = zero + 1.0
    init = (
        jnp.int32(0),
        rng,
        ro,
        rd,
        Vec3(zero, zero, zero),  # ret
        Vec3(one, one, one),  # throughput
        one.astype(jnp.int32),  # alive
        zero.astype(jnp.int32) - 1,  # i_exit
        jnp.float32(0.0),  # stats: total march steps (tile scalar)
        jnp.float32(0.0),  # stats: sum of active-shape counts over steps
        jnp.float32(0.0),  # stats: aux (normals + final-id) shape-tap count
    )

    def cond(c):
        i, _rng, _ro, _rd, _ret, _thr, alive_i, _i_exit, _st, _ac, _ax = c
        return jnp.logical_and(i <= bounces, jnp.max(alive_i) > 0)

    def body(c):
        i, rng, ro, rd, ret, thr, alive_i, i_exit, steps_tot, act_tot, aux_tot = c
        alive = alive_i != 0

        # Mask the per-lane AABB hits by bounce-loop liveness BEFORE deriving
        # the tile-uniform predicates: a shape whose box only dead lanes'
        # frozen rays hit must not keep its map block active.  Alive lanes'
        # guards are unchanged, so live results are bit-identical (a shape a
        # live lane's box-test misses was per-lane-masked for it anyway).
        if t_cull:
            checks, tns, tfs, _dbg = bounds_fn(ro, rd, pv)
        else:
            checks, _dbg = bounds_fn(ro, rd, pv)
        checks = tuple(None if c_ is None else c_ & alive for c_ in checks)
        anyhit = _anyhit(checks)

        def map_fn(p, pv_, checks_):
            return map_d_culled(p, pv_, checks_, anyhit), None

        if analytic is not None:
            t_cap, cap_idx = analytic[0](ro, rd, pv)
        else:
            t_cap = cap_idx = None
        full_idx = None
        if analytic_full is not None:
            # Full-analytic bounce: no march at all (see _make_analytic_all).
            t, full_idx = analytic_full[0](ro, rd, pv, checks, anyhit)
            tp = t
        elif t_cull:
            ivals = _interval_scalars(checks, tns, tfs)
            if grid_tap is not None:
                t, tp = _march_while_grid(map_d_culled, ro, rd, pv, checks,
                                          ivals, grid_tap, alive=alive,
                                          tau=grid_tau, t_cap=t_cap)
            else:
                out = _march_while_tcull(map_d_culled, ro, rd, pv, checks,
                                         ivals, alive=alive,
                                         with_stats=stats, omega=omega,
                                         t_cap=t_cap,
                                         refresh_every=refresh_every)
                if stats:
                    t, tp, msteps, mact = out
                    steps_tot = steps_tot + msteps.astype(jnp.float32)
                    act_tot = act_tot + mact
                else:
                    t, tp = out
        else:
            t, tp = _march_while(map_d_culled, ro, rd, pv, checks,
                                 anyhit, alive=alive)

        miss = t > FP
        i_exit = jnp.where(alive & miss, i, i_exit)
        act = alive & ~miss
        capped = (None if t_cap is None
                  else act & (t >= t_cap))
        any_act = jnp.max(act.astype(jnp.int32)) > 0
        hit_pos = ro + rd * t

        if t_cull:
            # HIT-FRONT actives for the aux taps (6 normal taps + final-id
            # re-tap): restrict to shapes whose box interval overlaps the
            # live hit t-range instead of the whole-ray anyhit set - the aux
            # taps are ~25% of shape evaluations and the hit points span a
            # far narrower t-window than the march did.  Safe to the same
            # eps caveat as the march culls: a shape whose box contains a hit
            # lane's tap point (within MHD of its last march position) has
            # tn <= t <= tf for that lane, which keeps it active; the MHD
            # inflation below covers the final-id tap at t_prev in
            # [t - MHD, t].
            th_hi = jnp.max(jnp.where(act, t, -_BIG))
            th_lo = jnp.min(jnp.where(act, t, _BIG)) - MHD
            hit_act = tuple(
                None if iv is None else (iv[0] & (iv[1] <= th_hi) & (iv[2] >= th_lo))
                for iv in ivals
            )

            def map_fn(p, pv_, checks_):  # noqa: F811 - tighter aux map
                return map_d_culled(p, pv_, checks_, hit_act), None

            aux_anyhit = hit_act
        else:
            aux_anyhit = anyhit

        if stats:
            n_aux = jnp.float32(0.0)
            for a in aux_anyhit:
                n_aux = n_aux + (
                    jnp.float32(1.0) if a is None else a.astype(jnp.float32)
                )

        # Tile-uniform skip of the whole post-march block (final-id tap, 6
        # normal taps, material fetch, shading, RR) when NO lane hit: sky
        # tiles and late bounces pay only the march.  Bit-identical to the
        # unconditional path - with act all-false every store is masked and
        # the bounce loop exits this iteration, so the skipped RNG draws are
        # never consumed (same argument as the loop's own early exit).
        def shade_branch(args):
            rng_, ro_, rd_, ret_, thr_, i_exit_, aux_ = args
            if full_idx is not None:
                # Full-analytic bounce: winner id and exact normal come
                # straight from the argmin intersection - no map taps.
                idx = full_idx
                n = analytic_full[1](hit_pos, full_idx, pv, aux_anyhit)
            else:
                idx = _final_idx(map_culled, ro_, rd_, pv, checks,
                                 aux_anyhit, t, tp)
                n = normal_fn(map_fn, hit_pos, pv, checks)
                if capped is not None:
                    # Analytic winners: exact shape id + exact surface
                    # normal (the excluded map knows nothing about these
                    # shapes).
                    idx = jnp.where(capped, cap_idx, idx)
                    n = vwhere(capped, analytic[1](hit_pos, cap_idx, pv), n)
            mat = gather_mat(idx)
            rng2, new_ro, new_rd, emit, thr_factor, ray_prob = shade_bounce(
                rng_, rd_, hit_pos, n, mat
            )
            ro2 = vwhere(act, new_ro, ro_)
            rd2 = vwhere(act, new_rd, rd_)
            ret2 = vwhere(act, ret_ + emit * thr_, ret_)
            new_thr = thr_ * thr_factor / ray_prob

            p_rr = new_thr.max_component()
            rng3, r_rr = random_float01(rng2)
            rr_dead = act & (r_rr > p_rr)
            i_exit2 = jnp.where(rr_dead, i, i_exit_)
            surv = act & ~rr_dead
            p_pos = p_rr > 0.0
            inv_p = jnp.where(p_pos, 1.0 / jnp.where(p_pos, p_rr, 1.0), 0.0)
            thr2 = vwhere(surv, new_thr * inv_p, vwhere(act, new_thr, thr_))
            if stats:
                aux_ = aux_ + 7.0 * n_aux  # 6 normal taps + 1 final-id tap
            return (rng3, ro2, rd2, ret2, thr2,
                    surv.astype(jnp.int32), i_exit2, aux_)

        def skip_branch(args):
            rng_, ro_, rd_, ret_, thr_, i_exit_, aux_ = args
            return (rng_, ro_, rd_, ret_, thr_, jnp.zeros_like(alive_i),
                    i_exit_, aux_)

        rng, ro, rd, ret, thr, surv_i, i_exit, aux_tot = lax.cond(
            any_act, shade_branch, skip_branch,
            (rng, ro, rd, ret, thr, i_exit, aux_tot),
        )

        return (i + 1, rng, ro, rd, ret, thr, surv_i, i_exit,
                steps_tot, act_tot, aux_tot)

    _, _, _, _, ret, _, _, i_exit, steps_tot, act_tot, aux_tot = lax.while_loop(
        cond, body, init
    )
    i_exit = jnp.where(i_exit < 0, bounces + 1, i_exit)
    if stats:
        return ret, i_exit, steps_tot, act_tot, aux_tot
    return ret, i_exit


def _make_kernel(spec: SceneSpec, width: int, height: int, debug: int,
                 tile_h: int, tile_w: int,
                 geometry: str = "faithful", normals: str = "central",
                 t_cull: bool = False, omega: float = 1.0,
                 analytic_unboxed: bool = False, refresh_every: int = 1,
                 dist_grid: bool = False, grid_res=GRID_DEFAULT_RES,
                 grid_tau: float = GRID_TAU, analytic_all: bool = False,
                 analytic_soa: bool = False):
    """Kernel body: one VMEM tile.

    ``geometry="baked"`` reads leaf-baked affine coefficients (a second SMEM
    vector, render/baked.py) instead of re-deriving every transform chain per
    map tap; ``normals="autodiff"`` swaps the 6-tap central difference for
    reverse-mode AD of the map (~2 taps).  The round-2 opt-in culling
    variants (position-hull ``p_cull``, ``clusters``, ``cond_group``,
    ``sub_rows`` subtiling) were pruned in round 3 after losing on BOTH the
    dense and the sparse benchmark scenes (benchmarks/optin_benchmark.py,
    artifact optin_r03.jsonl; decision rule in ROADMAP).
    """
    baked = geometry == "baked"
    analytic_full = None
    soa_layout = None
    if analytic_soa:
        if not baked:
            raise ValueError("analytic_soa requires geometry='baked'")
        if analytic_all or analytic_unboxed or dist_grid:
            raise ValueError("analytic_soa is its own full-analytic mode; "
                             "enable only one")
        if debug not in (0, 3):
            raise ValueError(
                "analytic_soa supports the path-traced modes (debug 0/3)")
        from ..render.soa import build_soa_smem_layout

        soa_layout = build_soa_smem_layout(spec)
        if soa_layout is None:
            raise ValueError("analytic_soa requires a union-only tree")
        t_cull = False
    if analytic_all:
        if not baked:
            raise ValueError("analytic_all requires geometry='baked'")
        if analytic_unboxed or dist_grid:
            raise ValueError("analytic_all subsumes analytic_unboxed and "
                             "dist_grid; enable only one")
        if debug not in (0, 3):
            raise ValueError(
                "analytic_all supports the path-traced modes (debug 0/3); "
                "the id-march debug diagnostics stay faithful")
        analytic_full = _make_analytic_all(spec)  # raises if ineligible
        t_cull = False  # no march: plain bounds suffice for membership
    if dist_grid:
        if not (baked and t_cull):
            raise ValueError(
                "dist_grid requires geometry='baked' and t_cull=True")
        if debug not in (0, 3):
            raise ValueError(
                "dist_grid supports the path-traced modes (debug 0/3); the "
                "id-march and stats diagnostics stay faithful")
        if tile_w != 128:
            raise ValueError("dist_grid requires tile_w == 128 (the grid "
                             "tap gathers along the 128-lane dimension)")
        if not grid_eligible(spec):
            raise ValueError("dist_grid requires at least one bounded leaf")
    analytic = None
    if analytic_unboxed:
        from ..render.baked import analytic_eligible_ids

        if not (baked and t_cull):
            raise ValueError(
                "analytic_unboxed requires geometry='baked' and t_cull=True"
            )
        if debug in (1, 2):
            raise ValueError(
                "analytic_unboxed supports the path-traced modes (debug "
                "0/3/4); the id-march debug diagnostics stay faithful"
            )
        # Per-shape eligibility (round 4): any tree is accepted; only the
        # guard-less shapes whose value passes exclusively through
        # min-folds leave the map (analytic_eligible_ids).  An empty set
        # makes the flag a no-op, matching the old no-guard-less behavior.
        if analytic_eligible_ids(spec):
            analytic = _make_analytic_unboxed(spec)
    if baked:
        skip = analytic is not None
        map_culled = make_map_baked(spec, skip_unboxed=skip)
        map_d_culled = make_map_baked_d(spec, skip_unboxed=skip)
        bounds_fn = make_bounds_baked(spec, with_t=t_cull)
    else:
        map_culled = make_map_culled(spec)
        map_d_culled = make_map_culled_d(spec)
        bounds_fn = make_bounds(spec, with_t=t_cull)
    if analytic_soa:
        # No march, no final-id re-tap, no central-diff normals: the
        # per-shape-unrolled map/bounds closures would trace O(n_shapes)
        # for nothing.  The SoA path computes membership inside its own
        # fori_loop fold (_make_soa_analytic).
        map_culled = map_d_culled = None

        def bounds_fn(ro, rd, pv):  # noqa: F811 - O(1) stub
            return (), jnp.zeros_like(ro.x)

    if normals == "autodiff":
        # Mosaic cannot yet compile the transpose of the anyhit lax.cond
        # skips, so the (~2-tap) AD normal differentiates the PLAIN per-lane
        # -guard map - same values, no conds.  The march keeps the culled map.
        map_plain_d = make_map_baked_d(spec) if baked else make_map_culled_d(spec)

        def normal_fn(_map_fn, p, pv, checks):
            def plain(p_, pv_, checks_):
                return map_plain_d(p_, pv_, checks_, None), None

            return calc_normal_autodiff(plain, p, pv, checks)
    else:
        normal_fn = calc_normal

    grid_tap_fn = make_grid_tap(spec, grid_res) if dist_grid else None

    def kernel(iparams_ref, fparams_ref, params_ref, *rest):
        gmeta_ref = gchunks_ref = soa_f_ref = soa_i_ref = None
        if dist_grid:
            gv_ref, gmeta_ref, gchunks_ref, accum_ref, out_ref = rest
        elif analytic_soa:
            gv_ref, soa_f_ref, soa_i_ref, accum_ref, out_ref = rest
        elif baked:
            gv_ref, accum_ref, out_ref = rest
        else:
            accum_ref, out_ref = rest
            gv_ref = params_ref
        frame = iparams_ref[0]
        last_clear = iparams_ref[1]
        bounces = iparams_ref[2]
        fov = fparams_ref[0]
        aspect = fparams_ref[1]
        pv = gv_ref  # geometry vector: baked coefficients or the raw params

        # row_offset (iparams[3]) shifts this program's absolute pixel rows:
        # 0 single-chip; a shard's band start under row-band sharding, so the
        # per-pixel RNG and camera stay bit-identical to the whole-frame
        # render (parallel/mesh.py).
        y0 = pl.program_id(0) * tile_h + iparams_ref[3]
        x0 = pl.program_id(1) * tile_w
        analytic_full_k = analytic_full
        if analytic_soa:
            isect_soa, normal_soa, gather_soa = _make_soa_analytic(
                soa_layout)
            gather_mat = lambda idx: gather_soa(idx, soa_f_ref)  # noqa: E731
            analytic_full_k = (
                lambda ro_, rd_, pv_, checks_, anyhit_: isect_soa(
                    ro_, rd_, soa_f_ref, soa_i_ref),
                lambda p_, idx_, pv_, anyhit_: normal_soa(
                    p_, idx_, soa_f_ref, soa_i_ref),
            )
        else:
            gather_mat = _make_smem_gather_mat(spec, params_ref)

        grid_tap = None
        if dist_grid:
            chunks_arr = gchunks_ref[:]  # (n_chunks, 128) resident in VMEM

            def grid_tap(p, _tap=grid_tap_fn, _chunks=chunks_arr,
                         _meta=gmeta_ref, _pv=pv):
                return _tap(p, lambda i: _meta[i],
                            lambda k: _chunks[k][None, :], _pv)

        xs = x0 + lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        ys = y0 + lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)

        # Per-pixel RNG + AA jitter + camera (test_compute.glsl:218-235).
        rng = gen_rng(xs, ys, frame, width, height)
        rng, jx = random_float01(rng)
        rng, jy = random_float01(rng)
        u, v = calc_uv(
            xs.astype(jnp.float32) + (jx - 0.5),
            ys.astype(jnp.float32) + (jy - 0.5),
            width,
            height,
            aspect,
        )
        ro, rd = primary_ray(u, v, fov)

        if debug in (0, 3):
            col, i_exit = _path_trace_tile(
                map_culled, map_d_culled, bounds_fn, gather_mat, ro, rd,
                pv, rng, bounces,
                normal_fn=normal_fn, t_cull=t_cull, omega=omega,
                analytic=analytic, refresh_every=refresh_every,
                grid_tap=grid_tap, grid_tau=grid_tau,
                analytic_full=analytic_full_k,
            )
            if debug == 3:
                col = Vec3.splat(
                    i_exit.astype(jnp.float32) / bounces.astype(jnp.float32)
                )
        elif debug == 4:
            # Perf diagnostics (tile-uniform, t_cull only): x = total
            # march steps across the bounce loop, y = per-step sum of
            # tile-active shape counts, z = mean exit bounce.  Not a
            # reference mode; feeds benchmarks/diagnose.py.
            _col, i_exit, steps_tot, act_tot, aux_tot = _path_trace_tile(
                map_culled, map_d_culled, bounds_fn, gather_mat, ro, rd,
                pv, rng, bounces,
                normal_fn=normal_fn, t_cull=t_cull, stats=True,
                analytic=analytic,
            )
            zero2 = jnp.zeros((tile_h, tile_w), jnp.float32)
            col = Vec3(
                zero2 + steps_tot,
                zero2 + act_tot,
                zero2 + aux_tot,
            )
        elif debug in (1, 2):
            # Debug modes march with the round-1 ID-CARRYING fold
            # (_march_while_ids): the distance-only map's guarded-select
            # conds fail Mosaic layout inference when invoked outside
            # the debug-0 bounce loop ("Invalid relayout ... replicated
            # in destination but not in source", caught by `pytest -m
            # tpu`); the ids fold compiles everywhere and these paths
            # are single-march diagnostics where its extra int32 selects
            # cost nothing measurable.  [Mosaic workaround; observed on
            # jax/jaxlib 0.9.0 + libtpu 0.0.34 - see
            # tests/test_tpu.py:test_mosaic_workaround_toolchain_witness]
            if t_cull:
                checks, tns, tfs, dbg = bounds_fn(ro, rd, pv)
                ivals = _interval_scalars(checks, tns, tfs)
            else:
                checks, dbg = bounds_fn(ro, rd, pv)
                zero_s = jnp.float32(0.0)
                big_s = jnp.float32(_BIG)
                ivals = tuple(
                    None if a is None else (a, zero_s, big_s)
                    for a in _anyhit(checks)
                )
            anyhit = _anyhit(checks)

            def map_fn(p, pv_, checks_):
                return map_culled(p, pv_, checks_, anyhit)

            t, idx = _march_while_ids(map_culled, ro, rd, pv, checks,
                                      ivals)
            if debug == 1:
                # normals + AABB tint (test_compute.glsl:170-179)
                n = normal_fn(map_fn, ro + rd * t, pv, checks)
                shaded = (n.normalize_safe() * 0.5 + 0.5) * 0.2 + Vec3.splat(dbg)
                col = vwhere(t > FP, Vec3.splat(dbg), shaded)
            else:
                # first-hit albedo (test_compute.glsl:183-195)
                col = gather_mat(idx).col
        else:
            col = Vec3.splat(jnp.zeros((tile_h, tile_w), jnp.float32))

        if debug != 0:
            out_ref[0] = col.x
            out_ref[1] = col.y
            out_ref[2] = col.z
        else:
            # Progressive running mean (test_compute.glsl:242-245).
            w = 1.0 / (last_clear.astype(jnp.float32) + 1.0)
            out_ref[0] = accum_ref[0] * (1.0 - w) + col.x * w
            out_ref[1] = accum_ref[1] * (1.0 - w) + col.y * w
            out_ref[2] = accum_ref[2] * (1.0 - w) + col.z * w

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "spec", "width", "height", "debug", "tile_h", "tile_w",
        "geometry", "normals", "t_cull", "omega", "analytic_unboxed",
        "refresh_every", "dist_grid", "grid_res", "grid_tau",
        "analytic_all", "analytic_soa", "interpret",
    ),
)
def _pallas_frame_planes(
    spec: SceneSpec,
    params,
    accum_planes,  # (3, PH, PW) padded planar accumulator
    frame,
    last_clear,
    bounces,
    fov,
    aspect,
    row_offset=0,
    *,
    width: int,
    height: int,
    debug: int,
    tile_h: int,
    tile_w: int,
    geometry: str = "faithful",
    normals: str = "central",
    t_cull: bool = False,
    omega: float = 1.0,
    analytic_unboxed: bool = False,
    refresh_every: int = 1,
    dist_grid: bool = False,
    grid_res=GRID_DEFAULT_RES,
    grid_tau: float = GRID_TAU,
    analytic_all: bool = False,
    analytic_soa: bool = False,
    interpret: bool = False,
):
    ph, pw = accum_planes.shape[1], accum_planes.shape[2]
    grid = (ph // tile_h, pw // tile_w)
    iparams = jnp.stack(
        [
            jnp.asarray(frame, jnp.int32),
            jnp.asarray(last_clear, jnp.int32),
            jnp.asarray(bounces, jnp.int32),
            jnp.asarray(row_offset, jnp.int32),
        ]
    )
    fparams = jnp.stack(
        [jnp.asarray(fov, jnp.float32), jnp.asarray(aspect, jnp.float32)]
    )

    kernel = _make_kernel(spec, width, height, debug, tile_h, tile_w,
                          geometry, normals, t_cull, omega, analytic_unboxed,
                          refresh_every, dist_grid, grid_res, grid_tau,
                          analytic_all, analytic_soa)
    tile_spec = pl.BlockSpec(
        (3, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    inputs = [iparams, fparams, params]
    in_specs = [smem, smem, smem]
    if geometry == "baked":
        # The per-frame bake: a tiny scalar XLA graph outside the kernel,
        # differentiable params -> bv, negligible next to one tile's work.
        bv = bake(spec, params)
        inputs.append(bv)
        in_specs.append(smem)
        if dist_grid:
            gmeta, gchunks = bake_dist_grid(spec, bv, grid_res)
            inputs.append(gmeta)
            in_specs.append(smem)
            inputs.append(gchunks)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if analytic_soa:
            from ..render.soa import build_soa_smem_layout, pack_soa_smem

            soa_f, soa_i = pack_soa_smem(
                build_soa_smem_layout(spec), bv, params)
            inputs.append(soa_f)
            in_specs.append(smem)
            inputs.append(soa_i)
            in_specs.append(smem)
    inputs.append(accum_planes)
    in_specs.append(tile_spec)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((3, ph, pw), jnp.float32),
        input_output_aliases={len(inputs) - 1: 0},
        interpret=interpret,
    )(*inputs)


def _pad_to(x, mult_h, mult_w):
    h, w = x.shape[1], x.shape[2]
    ph = -(-h // mult_h) * mult_h
    pw = -(-w // mult_w) * mult_w
    if (ph, pw) == (h, w):
        return x
    return jnp.pad(x, ((0, 0), (0, ph - h), (0, pw - w)))


def render_frame_pallas(
    spec: SceneSpec,
    params,
    accum=None,
    frame=0,
    last_clear=0,
    *,
    width: int = 256,
    height: int = 256,
    debug: int = 0,
    bounces: int = DEFAULT_BOUNCES,
    fov: float = DEFAULT_FOV,
    aspect: float = None,
    tile: tuple = DEFAULT_TILE,
    geometry: str = "faithful",
    normals: str = "central",
    t_cull: bool = False,
    omega: float = 1.0,
    analytic_unboxed: bool = False,
    refresh_every: int = 1,
    dist_grid: bool = False,
    grid_res=GRID_DEFAULT_RES,
    grid_tau: float = GRID_TAU,
    analytic_all: bool = False,
    analytic_soa: bool = False,
    interpret: bool = False,
):
    """Drop-in replacement for render/reference.py:render_frame running the
    Pallas megakernel.  Same (H, W, 3) accumulator interface; the image is
    padded up to tile multiples internally and cropped on return.

    ``analytic_unboxed=True`` (opt-in semantic trade, union-only scenes,
    baked + t_cull): guard-less plane/sphere shapes leave the map and are
    intersected in closed form per lane (benchmarks/analytic_probe.py:
    1.50x on the primary march).  Hits land exactly ON those surfaces
    instead of the |d| < MHD shell, and creeping budget-exit rays resolve
    exactly - the documented divergence classes.

    ``dist_grid=True`` (opt-in eps trade, baked + t_cull, any tree):
    marches on a per-frame-baked lower-bound distance grid
    (render/distgrid.py) - lanes farther than ``grid_tau`` from every
    surface advance by a per-lane gathered bound without evaluating the
    exact map.  Hits keep exact-map semantics; the tap sequence (and so
    sub-MHD landings and budget-exit accounting) shifts at eps level.
    Composes with ``analytic_unboxed``.

    ``analytic_soa=True`` (baked, union-only): the SCALING form of
    ``analytic_all`` - same full-analytic bounce (bit-exact with it,
    tests/test_soa.py), but the per-shape work runs as an in-kernel
    ``fori_loop`` over packed SMEM tables
    (render/soa.py:build_soa_smem_layout) instead of trace-time
    unrolling, so trace + Mosaic compile time is bounded in the prim
    count (prim_scaling_soa_r05.jsonl: 256/512-prim 1080p frames on
    silicon where the unrolled kernels never finished compiling; at
    <= 128 prims the unrolled ``analytic_all`` remains faster).
    """
    if aspect is None:
        aspect = width / height
    th, tw = tile
    if (analytic_all or analytic_soa) and tile == DEFAULT_TILE:
        # Measured optimum for the no-march bounce (round-5 tile sweep,
        # benchmarks/artifacts/analytic_tile_sweep*_r05.jsonl): 40 rows
        # beats the marching kernel's 64 by ~6% at 1080p (27 exact bands,
        # zero pad waste; 8/120-row tiles measured far worse).
        th = 40
    th = min(th, -(-height // 8) * 8) if height < th else th
    tw = min(tw, max(128, tw)) if width < tw else tw
    if accum is None:
        accum = jnp.zeros((height, width, 3), jnp.float32)
    planes = _pad_to(jnp.transpose(jnp.asarray(accum, jnp.float32), (2, 0, 1)), th, tw)
    out = _pallas_frame_planes(
        spec,
        jnp.asarray(params, jnp.float32),
        planes,
        frame,
        last_clear,
        bounces,
        fov,
        aspect,
        width=width,
        height=height,
        debug=debug,
        tile_h=th,
        tile_w=tw,
        geometry=geometry,
        normals=normals,
        t_cull=t_cull,
        omega=omega,
        analytic_unboxed=analytic_unboxed,
        refresh_every=refresh_every,
        dist_grid=dist_grid,
        grid_res=tuple(grid_res),
        grid_tau=grid_tau,
        analytic_all=analytic_all,
        analytic_soa=analytic_soa,
        interpret=interpret,
    )
    return jnp.transpose(out[:, :height, :width], (1, 2, 0))


@partial(
    jax.jit,
    static_argnames=("spec", "width", "height", "n_frames", "tile_h", "tile_w",
                     "geometry", "normals", "t_cull", "analytic_all",
                     "interpret"),
)
def _accumulate_pallas_impl(
    spec, params, bounces, fov, aspect,
    *, width, height, n_frames, tile_h, tile_w,
    geometry="faithful", normals="central", t_cull=False, analytic_all=False,
    interpret=False,
):
    ph = -(-height // tile_h) * tile_h
    pw = -(-width // tile_w) * tile_w
    accum0 = jnp.zeros((3, ph, pw), jnp.float32)

    def body(f, accum):
        return _pallas_frame_planes(
            spec, params, accum, f, f, bounces, fov, aspect,
            width=width, height=height, debug=0,
            tile_h=tile_h, tile_w=tile_w,
            geometry=geometry, normals=normals, t_cull=t_cull,
            analytic_all=analytic_all,
            interpret=interpret,
        )

    out = lax.fori_loop(0, n_frames, body, accum0)
    return jnp.transpose(out[:, :height, :width], (1, 2, 0))


def render_accumulated_pallas(
    spec: SceneSpec,
    params,
    n_frames: int,
    *,
    width: int = 256,
    height: int = 256,
    bounces: int = DEFAULT_BOUNCES,
    fov: float = DEFAULT_FOV,
    aspect: float = None,
    tile: tuple = DEFAULT_TILE,
    geometry: str = "faithful",
    normals: str = "central",
    t_cull: bool = False,
    analytic_all: bool = False,
    interpret: bool = False,
):
    """Fused multi-frame progressive accumulation: the accumulator stays
    planar on device across frames (no per-frame transposes)."""
    if aspect is None:
        aspect = width / height
    th, tw = tile
    return _accumulate_pallas_impl(
        spec,
        jnp.asarray(params, jnp.float32),
        jnp.asarray(bounces, jnp.int32),
        jnp.asarray(fov, jnp.float32),
        jnp.asarray(aspect, jnp.float32),
        width=width,
        height=height,
        n_frames=n_frames,
        tile_h=th,
        tile_w=tw,
        geometry=geometry,
        normals=normals,
        t_cull=t_cull,
        analytic_all=analytic_all,
        interpret=interpret,
    )
