"""Shape-vectorized (SoA) analytic renderer: compile time bounded in the
prim count.

The trace-time-unrolled kernels (render/scenegen.py closures, the Pallas
megakernel, the fused train kernel) emit per-shape code: host tracing and
Mosaic/XLA compile grow superlinearly with shape count, and at 256 prims
the faithful forward alone compiles for tens of minutes while the fused
kernel fails outright (benchmarks/artifacts/prim_scaling_r05.jsonl).  This
module is the scaling-path answer for the analytic (union-only) family:
shapes live in PACKED ARRAYS gathered from the baked vector, and the
per-bounce nearest-hit fold is a ``lax.scan`` over fixed-size shape
chunks of kind-grouped closed-form intersections - one trace regardless
of n, vectorized (chunk, lanes) arithmetic that XLA tiles onto the VPU,
O(chunk * lanes) live memory.

Semantics match ``analytic_all`` (kernels/megakernel.py:_make_analytic_all)
exactly, including the reference membership fold: a guarded shape is in a
ray's map iff its AABB ``check[]`` passes (shader_out/test_compute.glsl:
185-245 + aabb.glsl:21-33), shapes under a union's child unions are
clobbered out while an ancestor first-shape guard passes
(containers.rs:244-252), and equal-t ties pick the earlier shape in walk
order (restored across the kind grouping by a lexicographic (t, shape_id)
combine).  The shading loop is the shared oracle ``path_trace`` - specular
/ refraction / RR / AA semantics are the oracle's by construction.

This is the TPU-idiomatic scaling design: static shapes, no per-shape
Python unrolling, compiler-friendly scan control flow, arithmetic batched
wide enough for the vector units - the same trade the guide recommends
over trace-unrolled specialization once n grows past the low hundreds.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import FP
from ..scene.compile import SceneSpec
from ..scene.model import KIND_CUBE, KIND_OCTAHEDRON, KIND_PLANE, KIND_SPHERE
from ..vecmath import Vec3
from .baked import analytic_all_plan, bake
from .reference import gather_material, path_trace
from .scenegen import material_slot_matrix

_BIG = 4.0 * FP

# Octahedron 4-slab axes (|x|+|y|+|z| <= s as diagonal half-space pairs),
# kernels/megakernel.py:_OCT_AXES.
_OCT_AXES = ((1.0, 1.0, 1.0), (1.0, 1.0, -1.0),
             (1.0, -1.0, 1.0), (1.0, -1.0, -1.0))

_GEOM_W = {KIND_SPHERE: 4, KIND_CUBE: 15, KIND_PLANE: 4, KIND_OCTAHEDRON: 13}


@dataclass(frozen=True)
class _KindTable:
    kind: int
    geom_idx: np.ndarray      # (n_pad, slots) int32 indices into bv
    aabb_idx: np.ndarray      # (n_pad, 6) indices into bv (0 when unguarded)
    guarded: np.ndarray       # (n_pad,) bool
    anc_idx: np.ndarray       # (n_pad, A, 6) ancestor-guard bv indices
    anc_valid: np.ndarray     # (n_pad, A) bool
    shape_id: np.ndarray      # (n_pad,) int32 (walk-order ids; -1 pad)
    n: int                    # real (unpadded) count


@dataclass(frozen=True)
class SoaPlan:
    tables: Tuple[_KindTable, ...]
    n_shapes: int


def build_soa_plan(spec: SceneSpec, chunk: int = 8) -> Optional[SoaPlan]:
    """Pack the analytic_all plan into kind-grouped padded index tables.

    Returns ``None`` for ineligible (non-union-only) scenes - same
    eligibility as ``analytic_all``.
    """
    plan = analytic_all_plan(spec)
    if plan is None:
        return None
    by_kind = {}
    aabb_off_of = {}
    for bs, _clob in plan:
        if bs.aabb:
            aabb_off_of[bs.shape_id] = bs.aabb_off
    max_anc = max((len(c) for _, c in plan), default=0)
    for bs, clob in plan:
        by_kind.setdefault(bs.kind, []).append((bs, clob))
    tables = []
    for kind, rows in sorted(by_kind.items()):
        w = _GEOM_W[kind]
        n = len(rows)
        n_pad = max(chunk, ((n + chunk - 1) // chunk) * chunk)
        geom = np.zeros((n_pad, w), np.int32)
        aabb = np.zeros((n_pad, 6), np.int32)
        guarded = np.zeros((n_pad,), bool)
        anc = np.zeros((n_pad, max(max_anc, 1), 6), np.int32)
        anc_valid = np.zeros((n_pad, max(max_anc, 1)), bool)
        sid = np.full((n_pad,), -1, np.int32)
        for i, (bs, clob) in enumerate(rows):
            geom[i] = np.arange(bs.off, bs.off + w)
            if bs.aabb:
                aabb[i] = np.arange(bs.aabb_off, bs.aabb_off + 6)
                guarded[i] = True
            for a, cid in enumerate(clob):
                anc[i, a] = np.arange(aabb_off_of[cid], aabb_off_of[cid] + 6)
                anc_valid[i, a] = True
            sid[i] = bs.shape_id
        tables.append(_KindTable(kind, geom, aabb, guarded, anc, anc_valid,
                                 sid, n))
    return SoaPlan(tuple(tables), len(plan))


def _slab_t(oqs, dqs, halfs):
    """Vectorized nearest convex-slab-polytope hit (exit face from inside,
    BIG on miss) - the (chunk, lanes) form of
    kernels/megakernel.py:_slab_polytope_t."""
    lo = jnp.full_like(oqs[0], -_BIG)
    hi = jnp.full_like(oqs[0], _BIG)
    for oq, dq, b in zip(oqs, dqs, halfs):
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


def _kind_t(kind, g, ro, rd):
    """Closed-form nearest hit of a (chunk, slots) geometry block against
    (lanes,) rays -> (chunk, lanes) t.  Formulas mirror
    kernels/megakernel.py:_leaf_analytic_t."""
    def col(i):
        return g[:, i][:, None]

    if kind == KIND_SPHERE:
        ocx = ro.x - col(0)
        ocy = ro.y - col(1)
        ocz = ro.z - col(2)
        r = col(3)
        b = ocx * rd.x + ocy * rd.y + ocz * rd.z
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - c
        hit = disc >= 0.0
        root = jnp.sqrt(jnp.where(hit, disc, 0.0))
        t0 = -b - root
        t1 = -b + root
        t = jnp.where(t0 > 0.0, t0, jnp.where(t1 > 0.0, t1, _BIG))
        return jnp.where(hit, t, _BIG)
    if kind == KIND_PLANE:
        denom = col(0) * rd.x + col(1) * rd.y + col(2) * rd.z
        f0 = col(0) * ro.x + col(1) * ro.y + col(2) * ro.z + col(3)
        ok = jnp.abs(denom) > 1e-12
        t = jnp.where(ok, -f0 / jnp.where(ok, denom, 1.0), _BIG)
        return jnp.where(t > 0.0, t, _BIG)
    # cube / octahedron: rows of the orthonormal leaf frame
    oq = tuple(col(3 * r) * ro.x + col(3 * r + 1) * ro.y
               + col(3 * r + 2) * ro.z + col(9 + r) for r in range(3))
    dq = tuple(col(3 * r) * rd.x + col(3 * r + 1) * rd.y
               + col(3 * r + 2) * rd.z for r in range(3))
    if kind == KIND_CUBE:
        return _slab_t(oq, dq, tuple(col(12 + r) for r in range(3)))
    s = col(12)
    oqs = tuple(a[0] * oq[0] + a[1] * oq[1] + a[2] * oq[2] for a in _OCT_AXES)
    dqs = tuple(a[0] * dq[0] + a[1] * dq[1] + a[2] * dq[2] for a in _OCT_AXES)
    return _slab_t(oqs, dqs, (s,) * 4)


def _kind_normal(kind, g, p):
    """Exact winner normal from per-lane gathered geometry rows
    (lanes, slots); mirrors kernels/megakernel.py:_leaf_analytic_normal."""
    def col(i):
        return g[:, i]

    zero = jnp.zeros_like(p.x)
    if kind == KIND_SPHERE:
        return Vec3(p.x - col(0), p.y - col(1),
                    p.z - col(2)).normalize_safe()
    if kind == KIND_PLANE:
        return Vec3(zero + col(0), zero + col(1), zero + col(2))
    q = tuple(col(3 * r) * p.x + col(3 * r + 1) * p.y
              + col(3 * r + 2) * p.z + col(9 + r) for r in range(3))
    if kind == KIND_CUBE:
        r0 = jnp.abs(q[0]) - col(12)
        r1 = jnp.abs(q[1]) - col(13)
        r2 = jnp.abs(q[2]) - col(14)
        ax0 = (r0 >= r1) & (r0 >= r2)
        ax1 = (~ax0) & (r1 >= r2)
        nl = (jnp.where(ax0, jnp.sign(q[0]), 0.0),
              jnp.where(ax1, jnp.sign(q[1]), 0.0),
              jnp.where(ax0 | ax1, 0.0, jnp.sign(q[2])))
    else:
        s = col(12)
        best = jnp.full_like(p.x, -_BIG)
        nl = [zero, zero, zero]
        for ax in _OCT_AXES:
            v = ax[0] * q[0] + ax[1] * q[1] + ax[2] * q[2]
            r = jnp.abs(v) - s
            take = r > best
            best = jnp.where(take, r, best)
            sgn = jnp.sign(v)
            nl = [jnp.where(take, sgn * ax[i], nl[i]) for i in range(3)]
    return Vec3(
        col(0) * nl[0] + col(3) * nl[1] + col(6) * nl[2],
        col(1) * nl[0] + col(4) * nl[1] + col(7) * nl[2],
        col(2) * nl[0] + col(5) * nl[1] + col(8) * nl[2],
    ).normalize_safe()


def _membership(rows_aabb, rows_guarded, rows_anc, rows_anc_valid, ro, rd,
                bv):
    """(chunk, lanes) map-membership mask: own AABB slab pass (aabb.glsl:
    21-33 semantics) AND no clobbering ancestor first-shape guard passes
    (containers.rs:244-252)."""
    def slab_hit(idx6):
        lo = Vec3(bv[idx6[..., 0]][..., None], bv[idx6[..., 1]][..., None],
                  bv[idx6[..., 2]][..., None])
        hi = Vec3(bv[idx6[..., 3]][..., None], bv[idx6[..., 4]][..., None],
                  bv[idx6[..., 5]][..., None])
        t_min = (lo - ro) / rd
        t_max = (hi - ro) / rd
        tn = Vec3(jnp.minimum(t_min.x, t_max.x),
                  jnp.minimum(t_min.y, t_max.y),
                  jnp.minimum(t_min.z, t_max.z)).max_component()
        tf = Vec3(jnp.maximum(t_min.x, t_max.x),
                  jnp.maximum(t_min.y, t_max.y),
                  jnp.maximum(t_min.z, t_max.z)).min_component()
        return (tn < tf) & (tf > 0.0)

    own = slab_hit(rows_aabb)                       # (chunk, lanes)
    incl = jnp.where(rows_guarded[:, None], own, True)
    anc_hit = slab_hit(rows_anc)                    # (chunk, A, lanes)
    anc_hit = anc_hit & rows_anc_valid[..., None]
    return incl & ~jnp.any(anc_hit, axis=1)


def make_cast_soa(plan: SoaPlan, chunk: int = 8):
    """``(ro, rd, bv) -> (t, idx)`` nearest analytic hit over the whole
    scene: per kind a lax.scan over shape chunks, then a lexicographic
    (t, shape_id) combine that restores walk-order tie semantics across
    the kind grouping.  One trace regardless of shape count."""

    def cast(ro: Vec3, rd: Vec3, bv):
        shape = ro.x.shape
        ro_f = Vec3(ro.x.reshape(-1), ro.y.reshape(-1), ro.z.reshape(-1))
        rd_f = Vec3(rd.x.reshape(-1), rd.y.reshape(-1), rd.z.reshape(-1))
        lanes = ro_f.x.shape[0]
        t_best = jnp.full((lanes,), _BIG, jnp.float32)
        sid_best = jnp.full((lanes,), jnp.int32(2 ** 30), jnp.int32)

        for tbl in plan.tables:
            n_chunks = tbl.geom_idx.shape[0] // chunk

            def reshard(a):
                return jnp.asarray(a).reshape((n_chunks, chunk)
                                              + a.shape[1:])

            xs = {
                "geom": reshard(tbl.geom_idx),
                "aabb": reshard(tbl.aabb_idx),
                "guarded": reshard(tbl.guarded),
                "anc": reshard(tbl.anc_idx),
                "anc_valid": reshard(tbl.anc_valid),
                "sid": reshard(tbl.shape_id),
            }

            def step(carry, rows, kind=tbl.kind):
                t_b, s_b = carry
                g = bv[rows["geom"]]                     # (chunk, slots)
                t = _kind_t(kind, g, ro_f, rd_f)         # (chunk, lanes)
                incl = _membership(rows["aabb"], rows["guarded"],
                                   rows["anc"], rows["anc_valid"],
                                   ro_f, rd_f, bv)
                valid = (rows["sid"] >= 0)[:, None]
                t = jnp.where(incl & valid, t, _BIG)
                # Within a chunk rows are walk-ordered and argmin picks the
                # first minimum, so equal-t ties resolve to the earlier id.
                k_at = jnp.argmin(t, axis=0)
                t_c = jnp.min(t, axis=0)
                s_c = rows["sid"][k_at]
                better = t_c < t_b
                return (jnp.where(better, t_c, t_b),
                        jnp.where(better, s_c, s_b)), None

            (t_k, s_k), _ = lax.scan(step, (t_best * 0 + _BIG,
                                            sid_best * 0 + 2 ** 30), xs)
            # Lexicographic (t, shape_id): exact walk-order tie rule across
            # the kind grouping.
            better = (t_k < t_best) | ((t_k == t_best) & (s_k < sid_best))
            t_best = jnp.where(better, t_k, t_best)
            sid_best = jnp.where(better, s_k, sid_best)

        idx = jnp.where(t_best < _BIG, sid_best, -1)
        return (t_best.reshape(shape), idx.reshape(shape))

    return cast


def make_normal_soa(plan: SoaPlan):
    """``(p, idx, bv) -> Vec3`` exact winner normal: per kind, gather the
    winner rows by shape id and evaluate the closed-form normal, selected
    where that kind won.  O(kinds) gathers, no per-shape unrolling."""
    id_maps = []
    for tbl in plan.tables:
        # shape_id -> local row (dense lookup vector, -1 elsewhere)
        n_ids = int(max(t.shape_id.max() for t in plan.tables)) + 1
        lut = np.full((n_ids + 1,), -1, np.int32)
        for row, s in enumerate(tbl.shape_id[: tbl.n]):
            lut[s] = row
        id_maps.append(jnp.asarray(lut))

    def normal(p: Vec3, idx, bv):
        shape = p.x.shape
        p_f = Vec3(p.x.reshape(-1), p.y.reshape(-1), p.z.reshape(-1))
        idx_f = jnp.clip(idx.reshape(-1), 0, None)
        zero = jnp.zeros_like(p_f.x)
        n = Vec3(zero, zero, zero)
        for tbl, lut in zip(plan.tables, id_maps):
            local = lut[jnp.clip(idx_f, 0, lut.shape[0] - 1)]
            mine = local >= 0
            rows = jnp.asarray(tbl.geom_idx)[jnp.clip(local, 0, None)]
            g = bv[rows]                                  # (lanes, slots)
            cand = _kind_normal(tbl.kind, g, p_f)
            n = Vec3(jnp.where(mine, cand.x, n.x),
                     jnp.where(mine, cand.y, n.y),
                     jnp.where(mine, cand.z, n.z))
        return Vec3(n.x.reshape(shape), n.y.reshape(shape),
                    n.z.reshape(shape))

    return normal


def render_pixels_soa(spec: SceneSpec, params, xs, ys, frame, bounces, fov,
                      aspect, *, width: int, height: int, chunk: int = 8):
    """Full path-traced pixels through the SoA analytic cast: the shared
    oracle bounce loop (render/reference.py:path_trace - shading, RNG, AA,
    RR, refraction all identical) with the march replaced by the chunked
    closed-form fold.  Compile time is O(chunk traces), not O(n_shapes)."""
    from ..ops.camera import calc_uv, primary_ray
    from ..ops.rng import gen_rng, random_float01

    plan = build_soa_plan(spec, chunk)
    if plan is None:
        raise ValueError("render_pixels_soa requires a union-only tree "
                         "(same eligibility as analytic_all)")
    bv = bake(spec, params)
    cast = make_cast_soa(plan, chunk)
    normal = make_normal_soa(plan)
    mat_table = params[jnp.asarray(material_slot_matrix(spec))]

    def gather_mat(idx):
        return gather_material(mat_table, idx)

    def map_fn(p, pv_, checks_):  # pragma: no cover - never taken
        raise NotImplementedError

    def bounds_fn(ro, rd, _pv):
        return None, jnp.zeros_like(ro.x)

    def cast_fn(_map_fn, ro, rd, _pv, _checks):
        return cast(ro, rd, bv)

    def normal_fn(_map_fn, p, _pv, _checks, idx):
        return normal(p, idx, bv)

    rng = gen_rng(xs, ys, frame, width, height)
    rng, jx = random_float01(rng)
    rng, jy = random_float01(rng)
    u, v = calc_uv(xs.astype(jnp.float32) + (jx - 0.5),
                   ys.astype(jnp.float32) + (jy - 0.5),
                   width, height, aspect)
    ro, rd = primary_ray(u, v, fov)
    col, _ = path_trace(map_fn, bounds_fn, gather_mat, ro, rd, params, rng,
                        bounces, cast_fn=cast_fn, normal_fn=normal_fn)
    return col


@partial(jax.jit,
         static_argnames=("spec", "width", "height", "bounces", "chunk"))
def render_frame_soa(spec: SceneSpec, params, *, width: int, height: int,
                     bounces: int, fov, aspect=None, frame=0,
                     chunk: int = 8):
    """One full frame through the SoA analytic path (linear radiance,
    (H, W, 3)); the scaling-path sibling of render_frame(analytic_all)."""
    if aspect is None:
        aspect = width / height
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.int32),
                          jnp.arange(width, dtype=jnp.int32), indexing="ij")
    col = render_pixels_soa(spec, params, xs, ys, frame, bounces,
                            jnp.float32(fov), jnp.float32(aspect),
                            width=width, height=height, chunk=chunk)
    return jnp.stack([col.x, col.y, col.z], axis=-1)


# -- SMEM packing for the Pallas SoA kernel -----------------------------------
#
# The XLA SoA path above bounds compile time but pays HBM traffic for every
# (chunk, lanes) intermediate; the Pallas analytic_soa kernel
# (kernels/megakernel.py) instead walks the same packed tables with
# lax.fori_loop over shapes, all state resident in VMEM/SMEM - unrolled-
# kernel runtime at O(1) trace/compile cost.  The layout below flattens the
# per-kind tables into ONE f32 SMEM vector (geometry slots, AABB boxes,
# ancestor-guard boxes, material values) and ONE i32 SMEM vector (shape
# ids, guard flags, ancestor-valid flags), with static per-kind offsets.


@dataclass(frozen=True)
class SmemKind:
    kind: int
    n: int
    n_pad: int      # n rounded up to the kernel's unroll factor
    w: int          # geometry slots per shape
    a: int          # padded ancestor-guard count
    f_geom: int     # f32 offsets
    f_aabb: int
    f_anc: int
    i_sid: int      # i32 offsets
    i_guard: int
    i_anc_valid: int


@dataclass(frozen=True)
class SoaSmemLayout:
    kinds: Tuple[SmemKind, ...]
    f_len: int
    i_len: int
    f_mat: int      # f32 offset of the (n_shapes_pad, 18) material values
    n_shapes: int
    n_shapes_pad: int
    unroll: int     # static inner-unroll factor of the kernel's fori_loops
    # packing recipes (static):
    bv_gather: np.ndarray    # (f_mat,) int32 indices into bv (0 on pad)
    bv_mask: np.ndarray      # (f_mat,) float32 1.0 on real entries
    mat_slots: np.ndarray    # (n_shapes, 18) int32 indices into params
    i_const: np.ndarray      # (i_len,) int32 constant vector


def build_soa_smem_layout(spec: SceneSpec,
                          unroll: int = 8) -> Optional[SoaSmemLayout]:
    """Static SMEM layout for the Pallas analytic_soa kernel; ``None`` when
    the scene is not union-only (same eligibility as analytic_all).

    ``unroll`` statically unrolls that many shapes per fori_loop trip in
    the kernel (kernels/megakernel.py:_make_soa_analytic): the loop-carried
    min fold otherwise serializes the per-shape ALU chains that the fully
    unrolled kernel lets Mosaic interleave.  Kinds and the material table
    are padded to a multiple; pad rows carry guard=1 with a degenerate
    (never-hit) AABB, so membership excludes them by construction."""
    plan = analytic_all_plan(spec)
    if plan is None:
        return None
    aabb_off_of = {bs.shape_id: bs.aabb_off for bs, _ in plan if bs.aabb}
    max_anc = max((len(c) for _, c in plan), default=0)
    by_kind = {}
    for bs, clob in plan:
        by_kind.setdefault(bs.kind, []).append((bs, clob))

    kinds = []
    f_idx: list = []
    f_msk: list = []
    i_val: list = []

    def f_push(indices):
        off = len(f_idx)
        f_idx.extend(int(i) for i in indices)
        f_msk.extend([1.0] * len(indices))
        return off

    def f_pad(count):
        off = len(f_idx)
        f_idx.extend([0] * count)
        f_msk.extend([0.0] * count)
        return off

    for kind, rows in sorted(by_kind.items()):
        w = _GEOM_W[kind]
        n = len(rows)
        n_pad = -(-n // unroll) * unroll
        pad = n_pad - n
        a = max_anc
        f_geom = len(f_idx)
        for bs, _ in rows:
            f_push(range(bs.off, bs.off + w))
        f_pad(pad * w)
        f_aabb = len(f_idx)
        for bs, _ in rows:
            if bs.aabb:
                f_push(range(bs.aabb_off, bs.aabb_off + 6))
            else:
                f_pad(6)
        f_pad(pad * 6)  # degenerate lo=hi=0 boxes: slab never hits
        f_anc = len(f_idx)
        for bs, clob in rows:
            for j in range(a):
                if j < len(clob):
                    o = aabb_off_of[clob[j]]
                    f_push(range(o, o + 6))
                else:
                    f_pad(6)
        f_pad(pad * a * 6)
        i_sid = len(i_val)
        i_val.extend(int(bs.shape_id) for bs, _ in rows)
        i_val.extend([-2] * pad)  # matches no lane (idx is -1 or >= 0)
        i_guard = len(i_val)
        i_val.extend(1 if bs.aabb else 0 for bs, _ in rows)
        i_val.extend([1] * pad)  # guarded + degenerate box = excluded
        i_anc_valid = len(i_val)
        for bs, clob in rows:
            i_val.extend([1] * len(clob) + [0] * (a - len(clob)))
        i_val.extend([0] * (pad * a))
        kinds.append(SmemKind(kind, n, n_pad, w, a, f_geom, f_aabb, f_anc,
                              i_sid, i_guard, i_anc_valid))

    f_mat = len(f_idx)
    slots = material_slot_matrix(spec)
    n_sh_pad = -(-spec.n_shapes // unroll) * unroll
    slots_pad = np.zeros((n_sh_pad, slots.shape[1]), np.int32)
    slots_pad[: spec.n_shapes] = slots
    return SoaSmemLayout(
        kinds=tuple(kinds),
        f_len=f_mat + n_sh_pad * slots.shape[1],
        i_len=len(i_val),
        f_mat=f_mat,
        n_shapes=spec.n_shapes,
        n_shapes_pad=n_sh_pad,
        unroll=unroll,
        bv_gather=np.asarray(f_idx, np.int32),
        bv_mask=np.asarray(f_msk, np.float32),
        mat_slots=slots_pad,
        i_const=np.asarray(i_val, np.int32),
    )


def pack_soa_smem(layout: SoaSmemLayout, bv, params):
    """Per-frame packing (tiny XLA gathers): ``(f32_vec, i32_vec)`` for the
    kernel's two SoA SMEM inputs."""
    geo = bv[jnp.asarray(layout.bv_gather)] * jnp.asarray(layout.bv_mask)
    mat = params[jnp.asarray(layout.mat_slots)].reshape(-1)
    return (jnp.concatenate([geo.astype(jnp.float32),
                             mat.astype(jnp.float32)]),
            jnp.asarray(layout.i_const))
