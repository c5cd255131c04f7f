"""Fused training-step kernel: forward render AND per-pixel backward in VMEM.

Round-2 measurement (benchmarks/fastgrad.py, BENCH_r02.json) showed the
1080p fwd+bwd step spends ~2.4 s of 3.34 s in the XLA reverse sweep of the
bounce loop - residual taping and replay of tile-shaped shading math that a
VMEM-resident kernel gets for free.  The blocker for a fully-fused kernel
was isolated by benchmarks/probe_fused_bwd.py: Mosaic cannot lower the
transpose of scalar parameter reads (a 1-D scatter of tile reductions into
the parameter vector); everything tile-shaped compiles.  [Mosaic limitation
observed on jax/jaxlib 0.9.0 + libtpu 0.0.34 -
tests/test_tpu.py:test_mosaic_workaround_toolchain_witness.]  This module
splits the backward exactly along that line:

* **in-kernel (this file)**: the complete forward path trace (same
  march/culling pipeline as kernels/megakernel.py, reference semantics
  test_compute.glsl:74-166) plus the whole PER-PIXEL backward - the
  shading-chain transpose and the implicit-function march gradient - via
  per-bounce ``jax.vjp`` over an elementwise replay.  No map transpose ever
  runs in-kernel: the hit distance enters the replay through the first-order
  identity  t = sg(t*) + A.(ro - sg(ro)) + B.(rd - sg(rd)) + t_aux  with
  A = -g_p/(g_p.rd), B = A t* (all stop-gradded), whose vjp IS the implicit
  gradient of diff/vjp.py:make_implicit_cast, and g_p is reused from the
  6-tap central-difference normal the forward already computes.
* **outside in XLA**: the only parameter-vector scatters.  Union-only
  trees (winner mode, round 4): the kernel reduces every cotangent to two
  small grid-accumulated (n_shapes, C) sums on the MXU, so XLA only sees
  the tiny slot-gather transposes.  General trees: one batched map vjp
  seeded with the kernel's per-bounce ``scale = -dL/dt / (g_p.rd)`` planes
  (the f_theta term of the implicit gradient), and the material gather
  transpose seeded with the kernel's per-bounce material-channel cotangent
  planes.  Both are a handful of cheap dense ops.

Gradient semantics match diff/vjp.py's ``normals="detached"`` configuration
(the documented fast-training approximation: the surface normal is treated
as a constant of the backward; geometry signal flows through the implicit
hit-t):

* the implicit factors use the 6-tap central-difference g_p (eps 1e-4,
  funcs.glsl:21-35) instead of the exact map gradient - an O(eps^2)
  relative difference;
* material semantics are the megakernel's (refraction channels are carried
  for their ``ray_prob`` gradient but never shaded, matching
  _make_smem_gather_mat; scenes with nonzero refract_chance must train
  through diff/vjp.py instead - enforced by :func:`check_no_refraction`);
* secondary-bounce aux-tap culling inherits the megakernel's documented
  eps-level caveat.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import DEFAULT_FOV, FP, MHD, STEPS
from ..ops.camera import calc_uv, primary_ray
from ..ops.rng import gen_rng, random_float01
from ..render.baked import (
    _GEOM_SLOTS,
    GEOM_CHANNELS,
    bake,
    baked_geom_slot_matrix,
    baked_shapes_in_order,
    leaf_distance_from_planes,
    make_bounds_baked,
    make_map_baked,
    make_map_baked_d,
)
from ..render.reference import Mat, shade_bounce
from ..render.scenegen import material_slot_matrix
from ..scene.compile import SceneSpec
from ..vecmath import Vec3, vwhere
from .megakernel import (
    _BIG,
    _anyhit,
    _final_idx,
    _interval_scalars,
    _make_smem_gather_mat,
    _march_while_tcull,
)

DEFAULT_TILE = (32, 128)

_EPS_N = 1e-4  # central-difference epsilon (funcs.glsl:26)
_DENOM_EPS = 1e-6  # implicit-gradient denominator clamp (diff/vjp.py)

# Material-channel order of the emitted cotangent planes == the column order
# of gather_material's mat_table (scene/compile.py slot layout).  Channels
# 12 (ior), 14 (refract_roughness) and 15-17 (refract_col) are omitted:
# with the kernel's megakernel material semantics their cotangents are
# structurally zero (they only feed branches no lane selects), while
# refract_chance (13) DOES carry gradient through ray_prob's diffuse
# probability 1 - spec - refract (shade_bounce).
_MAT_CHANNELS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13)


def check_no_refraction(spec: SceneSpec, params) -> None:
    """Raise if any material's refract_chance is nonzero.

    The fused kernel's forward AND gradient use the megakernel's material
    semantics (refraction carried for its ray_prob gradient but never
    shaded, _make_smem_gather_mat) - a glass scene would silently train
    against the wrong model.  Such scenes must use diff/vjp.py.  Called
    with CONCRETE params (build/entry time); traced calls skip the check
    because the values are unknowable then.
    """
    if isinstance(params, jax.core.Tracer):
        return
    slots = material_slot_matrix(spec)[:, 13]  # refract_chance channel
    vals = np.asarray(params)[np.asarray(slots)]
    if np.any(vals != 0.0):
        raise ValueError(
            "scene has nonzero refract_chance materials: the fused train "
            "kernel never shades refraction, so its gradients are for the "
            "wrong model - train through diff/vjp.py (march='pallas') "
            "instead"
        )


def _union_only(spec: SceneSpec) -> bool:
    """Union-only trees route the map's parameter cotangent through the
    per-pixel argmin leaf alone (a min-fold's vjp), enabling the
    winner-leaf backend.  Shared predicate: render/baked.py."""
    from ..render.baked import spec_is_union_only

    return spec_is_union_only(spec)


def _mat_flat(m: Mat):
    """The emitted-channel view of a Mat, in _MAT_CHANNELS order."""
    return (
        m.col.x, m.col.y, m.col.z, m.brightness,
        m.light.x, m.light.y, m.light.z,
        m.spec, m.spec_col.x, m.spec_col.y, m.spec_col.z,
        m.roughness, m.refract_chance,
    )


def _segment_matmul(seg_idx, cot, n_shapes):
    """Per-(shape, channel) sums of cotangent planes grouped by winner id,
    as one one-hot matmul per bounce: (lanes, S)^T @ (lanes, C) -> (S, C).

    This replaces gather-transpose scatter-adds, which XLA lowers to a
    serial scatter on TPU - measured 2.1 s for the material reduction at
    1080p (benchmarks/artifacts/probe_outside_reduction_r03.jsonl) vs
    milliseconds of MXU matmul here.  ``idx == -1`` (miss/MDEF) lanes match
    no one-hot column and drop out, reproducing gather_material's validity
    masking.

    Round 4: the winner-leaf (union-only) kernel and every secondary edge
    row reduce IN-KERNEL on the MXU instead (:func:`_make_train_kernel`'s
    ``seg_accumulate``); only the non-union map-vjp path's MATERIAL
    cotangent planes still reduce here.
    """
    b1, n_chan = cot.shape[0], cot.shape[1]
    ids = jnp.arange(n_shapes, dtype=seg_idx.dtype)
    out = jnp.zeros((n_shapes, n_chan), jnp.float32)
    for b in range(b1):
        idx_f = seg_idx[b].reshape(-1)
        oh = (idx_f[:, None] == ids[None, :]).astype(jnp.float32)
        cots = jnp.transpose(cot[b].reshape(n_chan, -1))
        out = out + lax.dot_general(
            oh, cots, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
    return out


def _make_excl_closest(spec: SceneSpec):
    """Exclusion-masked closest-approach march for the SECONDARY edge
    estimator: sphere-trace the UNION OF LEAVES with two per-lane shape ids
    masked out (the segment's own winner - its surface would floor the min
    at ~0 - and the surface the segment respawned from, whose OFFSET
    distance would floor it at ~0.03), tracking ``(d_min, t_at_min)``.

    Leaf-fold semantics (not the CSG fold): the visibility boundary the
    estimator integrates is "which shape would this segment newly hit", and
    for that the min over leaf distances is the right field even in
    subtraction trees - with the documented approximation that a CARVED
    shape's graze registers at its uncarved leaf surface.  Guarded leaves
    evaluate under the segment's tile-uniform anyhit conds (same culling
    family as the main march); guard-less leaves always evaluate,
    INCLUDING analytic_unboxed-skipped ones (the estimator is not the
    renderer, so closed-form removal does not apply).

    Returns ``march(ro, rd, bv, checks, anyhit, excl1, excl2, alive,
    t_stop)`` -> ``(d_min, t_min, i_min)`` with ``i_min`` recovered by one
    id-tracking fold tap at the argmin point.  ``t_stop`` (per lane, the
    segment's own hit distance) bounds the march: with the winner excluded
    the field has no stopping surface at the hit, and grazes BEYOND it are
    not visibility boundaries of this segment (the path ends there) - an
    uncapped march measured ~3x phantom gradient inflation.
    """
    from ..render.baked import _leaf_distance, baked_layout

    shapes = baked_shapes_in_order(spec)
    del baked_layout

    def fold(p, bv, checks, anyhit, excl1, excl2, with_ids):
        d = jnp.full_like(p.x, _BIG)
        i = jnp.full(p.x.shape, -1, jnp.int32) if with_ids else None

        def leaf(bs, d, i):
            ld = _leaf_distance(bs, p, bv)
            m = (excl1 != bs.shape_id) & (excl2 != bs.shape_id)
            if bs.aabb:
                m = m & checks[bs.shape_id]
            better = m & (ld < d)
            nd = jnp.where(better, ld, d)
            if with_ids:
                return nd, jnp.where(better, bs.shape_id, i)
            return nd, i

        for bs in shapes:
            if bs.aabb and anyhit is not None and anyhit[bs.shape_id] is not None:
                def do(args, bs=bs):
                    return leaf(bs, *args)

                if with_ids:
                    d, i = lax.cond(anyhit[bs.shape_id], do, lambda a: a,
                                    (d, i))
                else:
                    d, _ = lax.cond(anyhit[bs.shape_id],
                                    lambda a, bs=bs: leaf(bs, a[0], None),
                                    lambda a: a, (d, None))
            else:
                d, i = leaf(bs, d, i)
        return (d, i) if with_ids else d

    def march(ro, rd, bv, checks, anyhit, excl1, excl2, alive, t_stop):
        t0 = ro.x * 0.0
        done0 = (~alive).astype(jnp.int32)

        def cond(c):
            step, done_i = c[0], c[2]
            return jnp.logical_and(step < STEPS, jnp.min(done_i) < 1)

        def body(c):
            step, t, done_i, was_neg_i, d_min, t_min = c
            done = done_i != 0
            p = ro + rd * t
            d = fold(p, bv, checks, anyhit, excl1, excl2, False)
            better = (~done) & (d < d_min)
            d_min = jnp.where(better, d, d_min)
            t_min = jnp.where(better, t, t_min)
            ad = jnp.abs(d)
            # Round 5 (signed continuation, mirrors diff/vjp.py): march
            # THROUGH crossings of the excluded-leaf field with a floored
            # step instead of stopping at |d| < MHD, tracking the signed
            # minimum; stop on exit of the first penetrated leaf.  In
            # union-only scenes nothing crosses before t_stop, so this
            # only changes carved-tree behavior (the documented
            # leaf-fold approximation class).
            nt = jnp.where(done, t, t + jnp.maximum(ad, jnp.float32(2e-3)))
            exited = (was_neg_i != 0) & (d > 0.0)
            nwas = was_neg_i | (d < 0.0).astype(jnp.int32)
            ndone = done | exited | (nt > FP) | (nt > t_stop)
            return (step + 1, nt, ndone.astype(jnp.int32), nwas,
                    d_min, t_min)

        init = (jnp.int32(0), t0, done0, done0 * 0,
                t0 + jnp.float32(_BIG), t0)
        _, _, _, _, d_min, t_min = lax.while_loop(cond, body, init)
        p_star = ro + rd * t_min
        _d2, i_min = fold(p_star, bv, checks, anyhit, excl1, excl2, True)
        i_min = jnp.where(d_min < jnp.float32(0.5 * _BIG), i_min, -1)
        return d_min, t_min, i_min

    return march


def _make_train_kernel(spec: SceneSpec, width: int, height: int,
                       bounces: int, tile_h: int, tile_w: int,
                       winner_geom: bool, analytic_unboxed: bool = False,
                       edge_grad: bool = False, edge_beta: float = 0.5,
                       edge_secondary: bool = False, edge_beta2: float = 2.0,
                       analytic_all: bool = False):
    B1 = bounces + 1
    # With edge gradients the kernel emits one extra pseudo-segment (row B1)
    # carrying the PRIMARY-silhouette coverage term: per pixel, the closest
    # approach of the bounce-0 march drives seed w = -dL.proxy * sigma'/beta
    # on the nearest shape's leaf partials at the argmin point - the fused
    # realization of diff/vjp.py's detached soft-coverage estimator (same
    # beta formula and calibrated default).  Without it the fused trainer is
    # blind to geometry: this shading model's smooth geometry gradient is
    # structurally zero (ROADMAP round-3 finding #2).
    if edge_secondary and not edge_grad:
        raise ValueError("edge_secondary requires edge_grad")
    # Row layout of the extra edge segments (non-winner seg_* outputs only;
    # winner mode reduces everything in-kernel into (n_shapes, C)
    # accumulators): B1 = primary; B1 + b (b = 1..B1-1) = the secondary
    # coverage term of bounce b's segment.
    sec_march = _make_excl_closest(spec) if edge_secondary else None
    analytic_full = None
    if analytic_all:
        from .megakernel import _make_analytic_all

        if analytic_unboxed:
            raise ValueError("analytic_all subsumes analytic_unboxed; "
                             "enable only one")
        # Round 5: the fused trainer's phase-1 forward loses the march and
        # the 6 FD normal taps entirely - winner t/idx from the per-lane
        # argmin of closed-form intersections, EXACT analytic normals
        # feeding the implicit A/B factors (g = n * 2 eps keeps the
        # downstream 0.5/eps normalization exact).  Raises if the tree is
        # not union-only plane/sphere/cube/octahedron.
        analytic_full = _make_analytic_all(spec)
    analytic = None
    if analytic_unboxed:
        from ..render.baked import analytic_eligible_ids
        from .megakernel import _make_analytic_unboxed

        # Same per-shape eligibility as the megakernel (round 4): any tree
        # is accepted; only min-fold-pure guard-less shapes leave the map.
        if analytic_eligible_ids(spec):
            analytic = _make_analytic_unboxed(spec)
    skip = analytic is not None
    map_ids = make_map_baked(spec, skip_unboxed=skip)
    map_d = make_map_baked_d(spec, skip_unboxed=skip)
    bounds_fn = make_bounds_baked(spec, with_t=True)
    leaf_shapes = (baked_shapes_in_order(spec)
                   if (winner_geom or edge_secondary) else ())

    def kernel(iparams_ref, fparams_ref, params_ref, bv_ref, target_ref,
               col_ref, *rest):
        # rest = [remaining outputs in out_specs order] + [scratch in
        # scratch_shapes order]; the 4 secondary scratch buffers are
        # appended last.
        if edge_secondary:
            rest, (sec_d_s, sec_t_s, sec_i_s, ret_s) = rest[:-4], rest[-4:]
        if winner_geom:
            # Winner mode (round 4): ALL per-segment state is
            # kernel-internal (scratch) and the per-(shape, channel)
            # cotangent sums run in-kernel on the MXU, accumulated across
            # the sequential grid into two small (S, C) outputs - the only
            # HBM outputs are col, mat_acc and geom_acc.  This removes the
            # B1 x C x H x W cotangent plane outputs (≈3 GB of HBM write +
            # re-read at 1080p/8 bounces with secondary edges) AND the VMEM
            # pressure that forced half-height tiles under edge_secondary.
            (mat_acc_ref, geom_acc_ref,
             seg_ro_ref, seg_rd_ref, seg_t_ref, seg_idx_ref,
             thr_s, g_s, invd_s, rng_s, alive_s) = rest
        elif edge_secondary:
            (seg_ro_ref, seg_rd_ref, seg_t_ref, seg_idx_ref,
             seg_scale_ref, mat_cot_ref, geom2_acc_ref,
             thr_s, g_s, invd_s, rng_s, alive_s) = rest
        else:
            (seg_ro_ref, seg_rd_ref, seg_t_ref, seg_idx_ref,
             seg_scale_ref, mat_cot_ref,
             thr_s, g_s, invd_s, rng_s, alive_s) = rest
        frame = iparams_ref[0]
        row_offset = iparams_ref[1]
        # Rows at/after y_limit are tile padding (or another shard's band):
        # they render but carry zero loss seed, so they contribute nothing
        # to any cotangent.
        y_limit = iparams_ref[2]
        fov = fparams_ref[0]
        aspect = fparams_ref[1]
        seed_scale = fparams_ref[2]  # 2 / (H * W * 3)
        bv = bv_ref
        gather_mat = _make_smem_gather_mat(spec, params_ref)

        if winner_geom or edge_secondary:
            # Grid-accumulated outputs: constant index_map keeps the block
            # resident across the sequential TPU grid; zero it on the first
            # visit, += on every tile.  (Non-winner mode accumulates only
            # the secondary coverage rows; its implicit/material cotangents
            # stay plane outputs for the XLA map vjp.)
            first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

            @pl.when(first)
            def _():
                if winner_geom:
                    mat_acc_ref[...] = jnp.zeros_like(mat_acc_ref)
                    geom_acc_ref[...] = jnp.zeros_like(geom_acc_ref)
                else:
                    geom2_acc_ref[...] = jnp.zeros_like(geom2_acc_ref)

        def seg_accumulate(idx_plane, targets):
            """In-kernel segment sum: one (S, lanes) one-hot from the
            winner-id plane, then an MXU matmul per target accumulator -
            (S, lanes) @ (lanes, C) += acc.  HIGHEST precision keeps the
            reduction exact-f32 (the MXU's bf16 input rounding measured
            1.5e-3 relative error, benchmarks/probe_inkernel_segsum.py);
            idx == -1 lanes match no row and drop out."""
            lanes = tile_h * tile_w
            idx_flat = idx_plane.reshape(-1)
            ids = lax.broadcasted_iota(jnp.int32, (spec.n_shapes, lanes), 0)
            oh = (ids == idx_flat[None, :]).astype(jnp.float32)
            for planes, acc_ref in targets:
                cots = jnp.concatenate(
                    [p.reshape(1, lanes) for p in planes], axis=0
                )
                acc_ref[...] += lax.dot_general(
                    oh, cots, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )

        y0 = pl.program_id(0) * tile_h + row_offset
        x0 = pl.program_id(1) * tile_w
        xs = x0 + lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        ys = y0 + lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        inb = ((xs < width) & (ys < y_limit)).astype(jnp.float32)

        rng0 = gen_rng(xs, ys, frame, width, height)
        rng0, jx = random_float01(rng0)
        rng0, jy = random_float01(rng0)
        u, v = calc_uv(
            xs.astype(jnp.float32) + (jx - 0.5),
            ys.astype(jnp.float32) + (jy - 0.5),
            width, height, aspect,
        )
        ro0, rd0 = primary_ray(u, v, fov)

        zero = jnp.zeros((tile_h, tile_w), jnp.float32)
        one = zero + 1.0

        # ---- phase 1: forward bounce loop, storing per-segment state ----
        # With edge_grad the march additionally tracks the closest approach
        # (with_closest) on EVERY bounce and the loop carry keeps bounce 0's
        # planes via a b==0 select.  Peeling bounce 0 out of the fori_loop
        # would be cheaper, but the distance-only march fold Mosaic-fails
        # layout inference when invoked outside the bounce loop (the known
        # relayout workaround documented at megakernel._march_while_ids) -
        # observed again on this exact peel in round 4.
        def fwd_body(b, carry):
            if edge_secondary:
                (rng, ro, rd, thr, ret, alive_i, e_dmin, e_tmin,
                 idx_prev) = carry
            elif edge_grad:
                rng, ro, rd, thr, ret, alive_i, e_dmin, e_tmin = carry
            else:
                rng, ro, rd, thr, ret, alive_i = carry
            alive = alive_i != 0

            checks, tns, tfs, _dbg = bounds_fn(ro, rd, bv)
            checks = tuple(None if c is None else c & alive for c in checks)
            ivals = _interval_scalars(checks, tns, tfs)
            if analytic_full is not None:
                # FULL-analytic bounce (round 5, megakernel analytic_all
                # semantics): winner = per-lane argmin closed-form hit
                # among the shapes in the ray's map; no march, no FD taps.
                anyhit_b = tuple(
                    None if iv is None else iv[0] for iv in ivals
                )
                t, idx = analytic_full[0](ro, rd, bv, checks, anyhit_b)
                miss = t > FP
                act = alive & ~miss
                hit = ro + rd * t
                n_an = analytic_full[1](hit, idx, bv, anyhit_b)
                g = n_an * jnp.float32(2.0 * _EPS_N)
                n = n_an
                denom = g.dot(rd) * jnp.float32(0.5 / _EPS_N)
                safe = (jnp.abs(denom) > _DENOM_EPS) & act
                invd = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0),
                                 0.0)
            else:
                if analytic is not None:
                    t_cap, cap_idx = analytic[0](ro, rd, bv)
                else:
                    t_cap = cap_idx = None
                if edge_grad:
                    t, tp, d_min, t_min = _march_while_tcull(
                        map_d, ro, rd, bv, checks, ivals, alive=alive,
                        t_cap=t_cap, with_closest=True)
                    keep = b == 0
                    e_dmin = jnp.where(keep, d_min, e_dmin)
                    e_tmin = jnp.where(keep, t_min, e_tmin)
                else:
                    t, tp = _march_while_tcull(map_d, ro, rd, bv, checks,
                                               ivals, alive=alive,
                                               t_cap=t_cap)

                miss = t > FP
                act = alive & ~miss
                capped = None if t_cap is None else act & (t >= t_cap)
                hit = ro + rd * t

                # Hit-front aux actives (megakernel t_cull semantics).
                th_hi = jnp.max(jnp.where(act, t, -_BIG))
                th_lo = jnp.min(jnp.where(act, t, _BIG)) - MHD
                hit_act = tuple(
                    None if iv is None
                    else (iv[0] & (iv[1] <= th_hi) & (iv[2] >= th_lo))
                    for iv in ivals
                )
                idx = _final_idx(map_ids, ro, rd, bv, checks, hit_act, t, tp)

                # 6-tap central difference: normal AND implicit g_p.
                e = jnp.float32(_EPS_N)

                def tap(dx, dy, dz):
                    return map_d(Vec3(hit.x + dx, hit.y + dy, hit.z + dz),
                                 bv, checks, hit_act)

                g = Vec3(
                    tap(e, 0.0, 0.0) - tap(-e, 0.0, 0.0),
                    tap(0.0, e, 0.0) - tap(0.0, -e, 0.0),
                    tap(0.0, 0.0, e) - tap(0.0, 0.0, -e),
                )
                if capped is not None:
                    # Analytic winners: exact ids and exact UNIT surface
                    # gradients (scaled so g * 0.5/e recovers a unit
                    # normal - the implicit A/B factors and the FD
                    # normalization both stay correct).
                    idx = jnp.where(capped, cap_idx, idx)
                    n_an = analytic[1](hit, cap_idx, bv)
                    g = vwhere(capped, n_an * jnp.float32(2.0 * _EPS_N), g)
                n = g.normalize_safe()
                denom = g.dot(rd) * jnp.float32(0.5 / _EPS_N)
                safe = (jnp.abs(denom) > _DENOM_EPS) & act
                invd = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0),
                                 0.0)

            if edge_secondary:
                # Secondary coverage inputs: the exclusion-masked leaf
                # closest march of THIS segment (own winner + respawn
                # surface masked per lane).  Runs for b = 0 too (the fori
                # body is structural); phase 2 only consumes rows b >= 1.
                anyhit_seg = tuple(
                    None if iv is None else iv[0] for iv in ivals
                )
                s_d, s_t, s_i = sec_march(ro, rd, bv, checks, anyhit_seg,
                                          idx, idx_prev, alive, t)
            bs = pl.ds(b, 1)
            if edge_secondary:
                sec_d_s[bs] = s_d[None]
                sec_t_s[bs] = s_t[None]
                sec_i_s[bs] = s_i[None]
                for c, comp in enumerate(ret):
                    ret_s[bs, c] = comp[None]
            for c, comp in enumerate(ro):
                seg_ro_ref[bs, c] = comp[None]
            for c, comp in enumerate(rd):
                seg_rd_ref[bs, c] = comp[None]
            seg_t_ref[bs] = t[None]
            seg_idx_ref[bs] = idx[None]
            for c, comp in enumerate(thr):
                thr_s[bs, c] = comp[None]
            for c, comp in enumerate(g):
                g_s[bs, c] = comp[None]
            invd_s[bs] = invd[None]
            rng_s[bs] = lax.bitcast_convert_type(rng, jnp.int32)[None]
            alive_s[bs] = alive_i[None]

            mat = gather_mat(idx)
            rng2, new_ro, new_rd, emit, thr_f, ray_p = shade_bounce(
                rng, rd, hit, n, mat
            )
            ro2 = vwhere(act, new_ro, ro)
            rd2 = vwhere(act, new_rd, rd)
            ret2 = vwhere(act, ret + emit * thr, ret)
            new_thr = thr * thr_f / ray_p

            p_rr = new_thr.max_component()
            rng3, r_rr = random_float01(rng2)
            rr_dead = act & (r_rr > p_rr)
            surv = act & ~rr_dead
            p_pos = p_rr > 0.0
            inv_p = jnp.where(p_pos, 1.0 / jnp.where(p_pos, p_rr, 1.0), 0.0)
            thr2 = vwhere(surv, new_thr * inv_p, vwhere(act, new_thr, thr))
            if edge_secondary:
                return (rng3, ro2, rd2, thr2, ret2, surv.astype(jnp.int32),
                        e_dmin, e_tmin, idx)
            if edge_grad:
                return (rng3, ro2, rd2, thr2, ret2, surv.astype(jnp.int32),
                        e_dmin, e_tmin)
            return rng3, ro2, rd2, thr2, ret2, surv.astype(jnp.int32)

        def bounce_loop(init):
            if B1 > 1:
                return lax.fori_loop(0, B1, fwd_body, init)
            # fori_loop with trip count 1 is INLINED by JAX, which places
            # the march outside any loop - the exact Mosaic relayout
            # failure the in-loop placement exists to avoid (observed on
            # the bounces=0 edge_grad CLI path, round 4).  A while_loop
            # does not unroll.
            carry = (jnp.int32(0),) + tuple(init)

            def wbody(c):
                return (c[0] + 1,) + tuple(fwd_body(c[0], c[1:]))

            return lax.while_loop(lambda c: c[0] < 1, wbody, carry)[1:]

        init = (rng0, ro0, rd0, Vec3(one, one, one), Vec3(zero, zero, zero),
                one.astype(jnp.int32))
        if edge_grad:
            init = init + (zero + jnp.float32(_BIG), zero)
            if edge_secondary:
                init = init + (zero.astype(jnp.int32) - 1,)
            out = bounce_loop(init)
            ret, edge_dmin, edge_tmin = out[4], out[6], out[7]
            # Edge-estimator id recovery OUTSIDE the loop: the primary ray
            # (ro0, rd0) is loop-invariant, so bounce 0's bounds/anyhit set
            # can be recomputed here and the argmin tap's winner id read
            # with one extra map tap.  Guard-less spheres removed from the
            # map by analytic_unboxed get their exact closed-form closest
            # approach folded in (they are invisible to the tracking).
            checks0, tns0, tfs0, _dbg0 = bounds_fn(ro0, rd0, bv)
            ivals0 = _interval_scalars(checks0, tns0, tfs0)
            anyhit0 = tuple(None if iv is None else iv[0] for iv in ivals0)

            # Round-5 SIGNED continuation (mirrors diff/vjp.py
            # _march_closest): the render march clamps every hit lane's
            # tracked min into [0, MHD], deleting the INTERIOR half of
            # the coverage ramp (the measured ~2x cube-family deficit).
            # Hit lanes continue from their hit THROUGH the surface with
            # a floored step, tracking the signed minimum (-penetration
            # depth), and stop on exit of the first penetrated shape so
            # geometry behind the hit cannot erase the front signal.
            hit0 = edge_dmin < jnp.float32(MHD)
            t_hit0 = seg_t_ref[0]
            # analytic_all: there was no bounce-0 march to track the miss
            # side, so the signed march runs the FULL ray from t = 0 (the
            # one march this configuration pays, replacing B1 of them);
            # otherwise it only CONTINUES hit lanes through the surface.
            cont_cap = (STEPS + 32) if analytic_full is not None else 32

            def cont_cond(c):
                step, _t, done_i = c[0], c[1], c[2]
                return jnp.logical_and(step < cont_cap, jnp.min(done_i) < 1)

            def cont_body(c):
                step, t, done_i, was_neg_i, d_mn, t_mn = c
                done = done_i != 0
                t_hi = jnp.max(jnp.where(done, -_BIG, t))
                t_lo = jnp.min(jnp.where(done, _BIG, t))
                active = []
                m = jnp.float32(_BIG)
                for iv in ivals0:
                    if iv is None:
                        active.append(None)
                        continue
                    any_h, tn_min, tf_max = iv
                    not_reached = tn_min > t_hi
                    a = any_h & ~not_reached & (tf_max >= t_lo)
                    active.append(a)
                    m = jnp.where(any_h & not_reached,
                                  jnp.minimum(m, tn_min), m)
                d = map_d(ro0 + rd0 * t, bv, checks0, tuple(active))
                better = (~done) & (d < d_mn)
                d_mn = jnp.where(better, d, d_mn)
                t_mn = jnp.where(better, t, t_mn)
                ad = jnp.abs(d)
                step_len = jnp.minimum(
                    jnp.maximum(ad, jnp.float32(2e-3)),
                    jnp.maximum(m - t, MHD))
                nt = jnp.where(done, t, t + step_len)
                exited = (was_neg_i != 0) & (d > 0.0)
                nwas = was_neg_i | (d < 0.0).astype(jnp.int32)
                ndone = done | exited | (nt > FP)
                return (step + 1, nt, ndone.astype(jnp.int32), nwas,
                        d_mn, t_mn)

            if analytic_full is not None:
                zt = jnp.zeros_like(edge_dmin)
                cinit = (jnp.int32(0), zt,
                         jnp.zeros_like(edge_dmin, jnp.int32),
                         jnp.zeros_like(edge_dmin, jnp.int32),
                         jnp.full_like(edge_dmin, _BIG), zt)
            else:
                cinit = (jnp.int32(0), t_hit0, (~hit0).astype(jnp.int32),
                         jnp.zeros_like(edge_dmin, jnp.int32),
                         jnp.full_like(edge_dmin, _BIG), t_hit0)
            _, _, _, _, c_dmin, c_tmin = lax.while_loop(
                cont_cond, cont_body, cinit)
            deeper = c_dmin < edge_dmin
            edge_tmin = jnp.where(deeper, c_tmin, edge_tmin)
            edge_dmin = jnp.minimum(edge_dmin, c_dmin)

            _d_at_min, edge_imin = map_ids(ro0 + rd0 * edge_tmin, bv,
                                           checks0, anyhit0)
            edge_imin = jnp.where(edge_dmin < jnp.float32(0.5 * _BIG),
                                  edge_imin, -1)
            if analytic is not None:
                d_ca, t_ca, i_ca = analytic[2](ro0, rd0, bv)
                closer = d_ca < edge_dmin
                edge_imin = jnp.where(closer, i_ca, edge_imin)
                edge_tmin = jnp.where(closer, t_ca, edge_tmin)
                edge_dmin = jnp.where(closer, d_ca, edge_dmin)
        else:
            _, _, _, _, ret, _ = bounce_loop(init)

        for c, comp in enumerate(ret):
            col_ref[c] = comp

        # ---- phase 2: per-pixel backward, chained per-bounce vjps ----
        # Loss = mean((col - target)^2); the seed is constant across bounces
        # because col = sum_b ret_incr_b.
        col_cot = Vec3(
            (ret.x - target_ref[0]) * seed_scale * inb,
            (ret.y - target_ref[1]) * seed_scale * inb,
            (ret.z - target_ref[2]) * seed_scale * inb,
        )
        sg = lax.stop_gradient
        zmat = Mat(
            col=Vec3(zero, zero, zero), brightness=zero,
            light=Vec3(zero, zero, zero), spec=zero,
            spec_col=Vec3(zero, zero, zero), roughness=zero, ior=zero,
            refract_chance=zero, refract_roughness=zero,
            refract_col=Vec3(zero, zero, zero),
        )

        def winner_leaf_channels(hit_pts, idx_plane, seed_plane):
            """Per-pixel parameter partials of each winner leaf: vjp each
            leaf's elementwise distance w.r.t. per-pixel BROADCAST slot
            copies (no cross-lane scatter), seeded with the winner-masked
            seed plane, gated by a tile-uniform 'any lane won' cond."""
            ch = tuple(zero for _ in range(GEOM_CHANNELS))
            for bs in leaf_shapes:
                nsl = _GEOM_SLOTS[bs.kind]
                won = idx_plane == bs.shape_id
                any_w = jnp.max(won.astype(jnp.int32)) > 0

                def compute(chs, bs=bs, nsl=nsl, won=won):
                    seed = jnp.where(won, seed_plane, 0.0)
                    slots = tuple(zero + bv[bs.off + c] for c in range(nsl))

                    def f(*sl):
                        return leaf_distance_from_planes(bs.kind, hit_pts, sl)

                    _, leaf_vjp = jax.vjp(f, *slots)
                    parts = leaf_vjp(seed)
                    out = list(chs)
                    for c in range(nsl):
                        out[c] = out[c] + parts[c]
                    return tuple(out)

                ch = lax.cond(any_w, compute, lambda chs: chs, ch)
            return ch

        ro_c = Vec3(zero, zero, zero)
        rd_c = Vec3(zero, zero, zero)
        thr_c = Vec3(zero, zero, zero)
        for b in range(B1 - 1, -1, -1):
            ro_b = Vec3(seg_ro_ref[b, 0], seg_ro_ref[b, 1], seg_ro_ref[b, 2])
            rd_b = Vec3(seg_rd_ref[b, 0], seg_rd_ref[b, 1], seg_rd_ref[b, 2])
            thr_b = Vec3(thr_s[b, 0], thr_s[b, 1], thr_s[b, 2])
            g_b = Vec3(g_s[b, 0], g_s[b, 1], g_s[b, 2])
            t_b = seg_t_ref[b]
            idx_b = seg_idx_ref[b]
            invd_b = invd_s[b]
            rng_b = lax.bitcast_convert_type(rng_s[b], jnp.uint32)
            alive_b = alive_s[b] != 0
            miss = t_b > FP
            act = alive_b & ~miss
            mat_vals = gather_mat(idx_b)
            n_b = g_b.normalize_safe()
            # Implicit-march linearization coefficients (stop-gradded).
            A = g_b * (jnp.float32(-0.5 / _EPS_N) * invd_b)
            B = A * t_b

            def replay(ro, rd, thr, t_aux, dmat,
                       # per-iteration captures (late-binding guard):
                       ro_b=ro_b, rd_b=rd_b, t_b=t_b, A=A, B=B, n_b=n_b,
                       rng_b=rng_b, act=act, mat_vals=mat_vals):
                t = (sg(t_b) + A.dot(ro - sg(ro_b)) + B.dot(rd - sg(rd_b))
                     + t_aux)
                hit = ro + rd * t
                mat = jax.tree.map(lambda a, d: sg(a) + d, mat_vals, dmat)
                rng2, new_ro, new_rd, emit, thr_f, ray_p = shade_bounce(
                    rng_b, rd, hit, Vec3(sg(n_b.x), sg(n_b.y), sg(n_b.z)),
                    mat,
                )
                ro2 = vwhere(act, new_ro, ro)
                rd2 = vwhere(act, new_rd, rd)
                ret_incr = vwhere(act, emit * thr, Vec3(t * 0.0, t * 0.0,
                                                        t * 0.0))
                new_thr = thr * thr_f / ray_p
                p_rr = new_thr.max_component()
                _rng3, r_rr = random_float01(rng2)
                rr_dead = act & (r_rr > p_rr)
                surv = act & ~rr_dead
                p_pos = p_rr > 0.0
                inv_p = jnp.where(p_pos, 1.0 / jnp.where(p_pos, p_rr, 1.0),
                                  0.0)
                thr2 = vwhere(surv, new_thr * inv_p,
                              vwhere(act, new_thr, thr))
                return ro2, rd2, thr2, ret_incr

            _, vjp_fn = jax.vjp(replay, ro_b, rd_b, thr_b, zero, zmat)
            ro_c, rd_c, thr_c, t_cot, mat_cot = vjp_fn(
                (ro_c, rd_c, thr_c, col_cot)
            )
            scale_b = -t_cot * invd_b
            if winner_geom:
                # Winner-leaf parameter partials: per pixel, the f_theta
                # cotangent of a union-only map flows only through the
                # argmin leaf (a min-fold's vjp).  Both channel families
                # share this bounce's one-hot and reduce in-kernel.
                ch = winner_leaf_channels(ro_b + rd_b * t_b, idx_b, scale_b)
                seg_accumulate(idx_b, (
                    (_mat_flat(mat_cot), mat_acc_ref),
                    (ch, geom_acc_ref),
                ))
            else:
                seg_scale_ref[b] = scale_b
                for c, cot in enumerate(_mat_flat(mat_cot)):
                    mat_cot_ref[b, c] = cot

        def _edge_slope(ro_, rd_, t_, checks_):
            # Slope-aware bandwidth factor (round 5, mirrors
            # diff/vjp.py:edge_slope): the ray-perpendicular component of
            # the map gradient at the argmin point converts d_min into
            # true screen-space edge distance.  Six plain-guard map taps
            # (anyhit=None: the guarded-select conds fail Mosaic layout
            # inference outside the march loop - same workaround class as
            # the debug paths).
            p_ = ro_ + rd_ * t_
            e_ = jnp.float32(1e-4)

            def tap(dx, dy, dz):
                return map_d(Vec3(p_.x + dx, p_.y + dy, p_.z + dz),
                             bv, checks_, None)

            n_ = Vec3(
                tap(e_, 0.0, 0.0) - tap(-e_, 0.0, 0.0),
                tap(0.0, e_, 0.0) - tap(0.0, -e_, 0.0),
                tap(0.0, 0.0, e_) - tap(0.0, 0.0, -e_),
            ).normalize_safe()
            g_par = n_.x * rd_.x + n_.y * rd_.y + n_.z * rd_.z
            perp = jnp.sqrt(jnp.maximum(1.0 - g_par * g_par, 1e-6))
            return jnp.clip(perp, 0.15, 1.0)

        if edge_grad:
            # Primary-silhouette coverage term (diff/vjp.py edge_grad
            # semantics, fused): c = sigmoid((MHD - d_min)/beta) with the
            # calibrated pixel-footprint bandwidth; the chain
            # dL/dtheta += dL.proxy * dc/dd_min * dd_min/dtheta collapses
            # to seeding the argmin shape's leaf partials (winner mode) or
            # the batched map vjp (fallback) with
            # w = -dL.proxy * sigma'(z) / beta at the argmin point.
            beta = jnp.maximum(edge_tmin, 0.2) * (
                jnp.float32(2.0 * edge_beta / height) / fov
            ) * _edge_slope(ro0, rd0, edge_tmin, checks0)
            z = (jnp.float32(MHD) - edge_dmin) / beta
            cvg = jax.nn.sigmoid(z)
            sig_p = cvg * (1.0 - cvg)
            mat_min = gather_mat(edge_imin)
            emit_min = mat_min.light.normalize_safe() * mat_min.brightness
            hitp = edge_dmin < MHD
            proxy = vwhere(hitp, ret, emit_min)
            w = -(col_cot.x * proxy.x + col_cot.y * proxy.y
                  + col_cot.z * proxy.z) * sig_p / beta
            w = jnp.where(edge_imin >= 0, w, 0.0)
            if winner_geom:
                ch = winner_leaf_channels(ro0 + rd0 * edge_tmin, edge_imin, w)
                seg_accumulate(edge_imin, ((ch, geom_acc_ref),))
            else:
                ebs = pl.ds(B1, 1)
                seg_idx_ref[ebs] = edge_imin[None]
                for c, comp in enumerate(ro0):
                    seg_ro_ref[ebs, c] = comp[None]
                for c, comp in enumerate(rd0):
                    seg_rd_ref[ebs, c] = comp[None]
                seg_t_ref[ebs] = edge_tmin[None]
                seg_scale_ref[ebs] = w[None]

        if edge_secondary:
            # SECONDARY coverage rows (diff/vjp.py edge_secondary fused):
            # per bounce b >= 1, the exclusion-masked closest approach of
            # that segment drives proxy = thr_b * emissive(i2) - rem_b
            # (the downstream radiance the lane would trade for the graze
            # shape's emission), emitted as winner-leaf partials - the
            # estimator is leaf-based by construction, so this is the
            # correct attribution in every tree.
            inv_foot2 = jnp.float32(2.0 * edge_beta2 / height) / fov
            for b in range(1, B1):
                ro_b = Vec3(seg_ro_ref[b, 0], seg_ro_ref[b, 1],
                            seg_ro_ref[b, 2])
                rd_b = Vec3(seg_rd_ref[b, 0], seg_rd_ref[b, 1],
                            seg_rd_ref[b, 2])
                thr_b = Vec3(thr_s[b, 0], thr_s[b, 1], thr_s[b, 2])
                alive_b = alive_s[b] != 0
                d2 = sec_d_s[b]
                t2 = sec_t_s[b]
                i2 = sec_i_s[b]
                ret_b = Vec3(ret_s[b, 0], ret_s[b, 1], ret_s[b, 2])
                checks_b, _tn_b, _tf_b, _dbg_b = bounds_fn(ro_b, rd_b, bv)
                beta2 = (jnp.maximum(t2, 0.2) * inv_foot2
                         * _edge_slope(ro_b, rd_b, t2, checks_b))
                c2 = jax.nn.sigmoid((jnp.float32(MHD) - d2) / beta2)
                sig2 = c2 * (1.0 - c2)
                mat2 = gather_mat(i2)
                emit2 = mat2.light.normalize_safe() * mat2.brightness
                prox = Vec3(
                    thr_b.x * emit2.x - (ret.x - ret_b.x),
                    thr_b.y * emit2.y - (ret.y - ret_b.y),
                    thr_b.z * emit2.z - (ret.z - ret_b.z),
                )
                w2 = -(col_cot.x * prox.x + col_cot.y * prox.y
                       + col_cot.z * prox.z) * sig2 / beta2
                w2 = jnp.where((i2 >= 0) & alive_b, w2, 0.0)
                ch2 = winner_leaf_channels(ro_b + rd_b * t2, i2, w2)
                seg_accumulate(
                    i2, ((ch2, geom_acc_ref if winner_geom
                          else geom2_acc_ref),))

    return kernel


@partial(
    jax.jit,
    static_argnames=("spec", "width", "height", "bounces", "tile_h", "tile_w",
                     "interpret", "winner_geom", "analytic_unboxed",
                     "edge_grad", "edge_beta", "edge_secondary",
                     "edge_beta2", "analytic_all"),
)
def _fused_planes(spec, params, bv, target_planes, frame, fov, aspect,
                  row_offset, y_limit, *, width, height, bounces, tile_h,
                  tile_w, interpret, winner_geom=False,
                  analytic_unboxed=False, edge_grad=False, edge_beta=0.5,
                  edge_secondary=False, edge_beta2=2.0, analytic_all=False):
    B1 = bounces + 1
    # Primary-extended row count for the NON-WINNER seg_* output blocks
    # (winner mode emits no seg_idx/geom_cot planes at all - it reduces
    # in-kernel into (n_shapes, C) accumulators, round 4).
    B1P = B1 + 1 if edge_grad else B1
    ph, pw = target_planes.shape[1], target_planes.shape[2]
    grid = (ph // tile_h, pw // tile_w)
    iparams = jnp.stack([jnp.asarray(frame, jnp.int32),
                         jnp.asarray(row_offset, jnp.int32),
                         jnp.asarray(y_limit, jnp.int32)])
    seed_scale = jnp.float32(2.0 / (width * height * 3))
    fparams = jnp.stack([jnp.asarray(fov, jnp.float32),
                         jnp.asarray(aspect, jnp.float32), seed_scale])

    kernel = _make_train_kernel(spec, width, height, bounces, tile_h, tile_w,
                                winner_geom, analytic_unboxed, edge_grad,
                                edge_beta, edge_secondary, edge_beta2,
                                analytic_all)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def tile3(c):
        return pl.BlockSpec((c, tile_h, tile_w), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    def tile4(c, b=B1):
        return pl.BlockSpec((b, c, tile_h, tile_w),
                            lambda i, j: (0, 0, i, j),
                            memory_space=pltpu.VMEM)

    def tileb(b=B1):
        return pl.BlockSpec((b, tile_h, tile_w), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    if winner_geom:
        # In-kernel segment reduction (round 4): the only HBM outputs are
        # the color planes and the two small grid-accumulated (S, C) sums;
        # a constant index_map keeps each accumulator block resident
        # across the sequential grid.
        S = spec.n_shapes
        out_shape = (
            jax.ShapeDtypeStruct((3, ph, pw), f32),            # col
            jax.ShapeDtypeStruct((S, len(_MAT_CHANNELS)), f32),  # mat_acc
            jax.ShapeDtypeStruct((S, GEOM_CHANNELS), f32),       # geom_acc
        )

        def acc_spec(c):
            return pl.BlockSpec((S, c), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)

        out_specs = (tile3(3), acc_spec(len(_MAT_CHANNELS)),
                     acc_spec(GEOM_CHANNELS))
        seg_scratch = [
            pltpu.VMEM((B1, 3, tile_h, tile_w), f32),      # seg_ro
            pltpu.VMEM((B1, 3, tile_h, tile_w), f32),      # seg_rd
            pltpu.VMEM((B1, tile_h, tile_w), f32),         # seg_t
            pltpu.VMEM((B1, tile_h, tile_w), jnp.int32),   # seg_idx
        ]
    else:
        out_shape = (
            jax.ShapeDtypeStruct((3, ph, pw), f32),            # col
            jax.ShapeDtypeStruct((B1P, 3, ph, pw), f32),       # seg_ro
            jax.ShapeDtypeStruct((B1P, 3, ph, pw), f32),       # seg_rd
            jax.ShapeDtypeStruct((B1P, ph, pw), f32),          # seg_t
            jax.ShapeDtypeStruct((B1P, ph, pw), jnp.int32),    # seg_idx
            jax.ShapeDtypeStruct((B1P, ph, pw), f32),          # seg_scale
            jax.ShapeDtypeStruct((B1, len(_MAT_CHANNELS), ph, pw), f32),
        )
        out_specs = (tile3(3), tile4(3, B1P), tile4(3, B1P), tileb(B1P),
                     tileb(B1P), tileb(B1P), tile4(len(_MAT_CHANNELS)))
        if edge_secondary:
            # Secondary coverage rows reduce in-kernel (round 4): one small
            # grid-accumulated (n_shapes, GEOM_CHANNELS) sum instead of the
            # B1-1 winner-id + cotangent plane outputs.
            S = spec.n_shapes
            out_shape = out_shape + (
                jax.ShapeDtypeStruct((S, GEOM_CHANNELS), f32),
            )
            out_specs = out_specs + (
                pl.BlockSpec((S, GEOM_CHANNELS), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            )
        seg_scratch = []
    scratch = seg_scratch + [
        pltpu.VMEM((B1, 3, tile_h, tile_w), f32),      # thr
        pltpu.VMEM((B1, 3, tile_h, tile_w), f32),      # g (FD diffs)
        pltpu.VMEM((B1, tile_h, tile_w), f32),         # inv_denom
        pltpu.VMEM((B1, tile_h, tile_w), jnp.int32),   # rng (bitcast)
        pltpu.VMEM((B1, tile_h, tile_w), jnp.int32),   # alive
    ]
    if edge_secondary:
        scratch = scratch + [
            pltpu.VMEM((B1, tile_h, tile_w), f32),       # sec d_min
            pltpu.VMEM((B1, tile_h, tile_w), f32),       # sec t_min
            pltpu.VMEM((B1, tile_h, tile_w), jnp.int32),  # sec i_min
            pltpu.VMEM((B1, 3, tile_h, tile_w), f32),    # ret_before
        ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, smem, smem, smem, tile3(3)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        # The resident-accumulator outputs (constant index_map, zeroed at
        # program_id == 0, += per tile) require every grid dimension to
        # execute sequentially on one core; pin that invariant instead of
        # relying on the implicit default.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(iparams, fparams, params, bv, target_planes)


def _pad_planes(x, th, tw):
    c, h, w = x.shape
    ph = -(-h // th) * th
    pw = -(-w // tw) * tw
    if (ph, pw) == (h, w):
        return x
    return jnp.pad(x, ((0, 0), (0, ph - h), (0, pw - w)))


@partial(
    jax.jit,
    static_argnames=("spec", "width", "height", "crop_h", "bounces", "tile_h",
                     "tile_w", "interpret", "analytic_unboxed", "edge_grad",
                     "edge_beta", "edge_secondary", "edge_beta2",
                     "analytic_all"),
)
def _fused_sse_and_grad_impl(spec, params, target_planes, frame, fov,
                             aspect, row_offset, *, width, height, crop_h,
                             bounces, tile_h, tile_w, interpret,
                             analytic_unboxed=False, edge_grad=False,
                             edge_beta=0.5, edge_secondary=False,
                             edge_beta2=2.0, analytic_all=False):
    """Band-shardable core: renders the rows [row_offset, row_offset+crop_h)
    of the global (height, width) image (``target_planes`` covers just that
    band, padded to tiles) and returns the band's summed squared error, its
    contribution to the GLOBAL mean-loss gradient, and the color planes.
    Single-chip use is the crop_h == height, row_offset == 0 case."""
    winner_geom = _union_only(spec)
    bv, bake_vjp = jax.vjp(lambda pp: bake(spec, pp), params)
    outs = _fused_planes(
        spec, params, bv, target_planes, frame, fov, aspect, row_offset,
        row_offset + crop_h,
        width=width, height=height, bounces=bounces,
        tile_h=tile_h, tile_w=tile_w, interpret=interpret,
        winner_geom=winner_geom, analytic_unboxed=analytic_unboxed,
        edge_grad=edge_grad, edge_beta=edge_beta,
        edge_secondary=edge_secondary, edge_beta2=edge_beta2,
        analytic_all=analytic_all,
    )
    geom2_acc = None
    if winner_geom:
        col, mat_acc, geom_acc = outs
    elif edge_secondary:
        (col, seg_ro, seg_rd, seg_t, seg_idx, seg_scale, mat_cot,
         geom2_acc) = outs
    else:
        col, seg_ro, seg_rd, seg_t, seg_idx, seg_scale, mat_cot = outs
    sse = jnp.sum(
        (col[:, :crop_h, :width] - target_planes[:, :crop_h, :width]) ** 2
    )

    pw = col.shape[-1]

    def rows(x):  # (B1[, C], PH, PW) -> stacked rows (B1*PH, PW)
        return x.reshape(-1, pw)

    if winner_geom:
        # Winner-leaf backend (round 4): the kernel already reduced the
        # per-pixel partials to per-(shape, channel) sums in-kernel on the
        # MXU; what's left is masking invalid channels and the tiny
        # geometry-slot gather transpose.
        gslots = baked_geom_slot_matrix(spec)
        valid = jnp.asarray(gslots >= 0, jnp.float32)
        safe_slots = jnp.asarray(np.maximum(gslots, 0))
        _gtab, gtab_vjp = jax.vjp(lambda b: b[safe_slots], bv)
        (gv_cot,) = gtab_vjp(geom_acc * valid)
    else:
        RO = Vec3(rows(seg_ro[:, 0]), rows(seg_ro[:, 1]), rows(seg_ro[:, 2]))
        RD = Vec3(rows(seg_rd[:, 0]), rows(seg_rd[:, 1]), rows(seg_rd[:, 2]))
        T = rows(seg_t)
        SCALE = rows(seg_scale)

        # f_theta term of the implicit gradient: one batched map vjp over
        # every (bounce, pixel) hit point, seeded with the kernel's scale
        # planes (diff/vjp.py:make_implicit_cast's f_theta_seeded, batched).
        # Exact for every CSG op, but materializes the full bounds + map
        # transpose graph at (B1*PH, PW) - the winner-leaf branch above is
        # the fast path whenever the tree is union-only.
        map_fn = make_map_baked(spec)
        bounds_fn = make_bounds_baked(spec)

        def geom_sum(bvv):
            checks, _ = bounds_fn(RO, RD, lax.stop_gradient(bvv))
            p = RO + RD * T
            d, _ = map_fn(p, bvv, checks)
            return jnp.sum(d * SCALE)

        gv_cot = jax.grad(geom_sum)(bv)
        if edge_secondary:
            # Secondary coverage rows: winner-leaf partials even in the
            # map-vjp (non-union) mode - the estimator is leaf-based by
            # construction, so the leaf attribution is the right one; the
            # per-(shape, channel) sums arrive pre-reduced from the kernel.
            gslots = baked_geom_slot_matrix(spec)
            valid = jnp.asarray(gslots >= 0, jnp.float32)
            safe_slots = jnp.asarray(np.maximum(gslots, 0))
            _gtab, gtab_vjp = jax.vjp(lambda b: b[safe_slots], bv)
            (gv2,) = gtab_vjp(geom2_acc * valid)
            gv_cot = gv_cot + gv2
    (g_geom,) = bake_vjp(gv_cot)

    # Material term: per-(shape, channel) sums by winner id (in-kernel in
    # winner mode, one-hot matmuls here otherwise), then the small
    # (n_shapes x 18) scatter into params.
    slots = jnp.asarray(material_slot_matrix(spec))
    mat_table, tab_vjp = jax.vjp(lambda pp: pp[slots], params)
    g_chan = (mat_acc if winner_geom
              else _segment_matmul(seg_idx, mat_cot, spec.n_shapes))
    mt_cot = jnp.zeros_like(mat_table)
    mt_cot = mt_cot.at[:, jnp.asarray(_MAT_CHANNELS)].set(g_chan)
    (g_mat,) = tab_vjp(mt_cot)
    return sse, g_geom + g_mat, col


def make_fused_value_and_grad(
    spec: SceneSpec,
    target,
    *,
    width: int,
    height: int,
    bounces: int = 2,
    fov: float = DEFAULT_FOV,
    aspect: float = None,
    tile=DEFAULT_TILE,
    interpret: bool = False,
    with_image: bool = False,
    analytic_unboxed: bool = False,
    edge_grad: bool = False,
    edge_beta: float = 0.5,
    edge_secondary: bool = False,
    edge_beta2: float = 2.0,
    spp: int = 1,
    analytic_all: bool = False,
):
    """Build ``step(params, frame=0) -> (loss, grad)`` where loss is the MSE
    between the rendered frame and ``target`` and grad is d loss / d params -
    the whole per-pixel backward fused on-chip.

    ``spp > 1`` (round 5) averages loss and gradient over ``spp``
    independent per-pixel RNG streams per optimizer step - the fused
    realization of the XLA path's sample axis, implemented exactly as the
    reference implements its own sample axis: consecutive FRAME streams
    (test_compute.glsl:242-245 accumulates frames; here the step averages
    ``frame*spp + s`` for s in [0, spp)).  Per-step gradient variance
    drops ~1/spp at spp-proportional cost (benchmarks/fused_spp.py).

    Gradient semantics = ``diff/vjp.py:render_pixels_diff`` with
    ``march="pallas", normals="detached", geometry="baked"`` (see module
    docstring for the two documented deviations).  ``with_image=True``
    additionally returns the rendered (H, W, 3) image.

    ``edge_grad=True`` adds the PRIMARY-silhouette visibility gradient
    (diff/vjp.py's calibrated soft-coverage estimator, fused: the closest
    approach is tracked inside the bounce-0 march and the coverage seed
    rides the existing winner-leaf / map-vjp reductions as one extra
    segment row).  Without it the fused trainer cannot learn geometry at
    all - this shading model's smooth geometry gradient is structurally
    zero (ROADMAP round-3 finding #2).  The loss/image values are
    unchanged; only the gradient gains the term.

    ``edge_secondary=True`` (round 4, requires edge_grad) additionally
    captures SECONDARY-bounce visibility edges - the term measured
    dominant on adversarial indirect lighting (secondary_edge_r04.jsonl):
    each bounce segment re-marches an exclusion-masked union-of-leaves
    field capped at its own hit distance (:func:`_make_excl_closest`) and
    the coverage seeds ride the reductions as B1-1 more segment rows,
    always through winner-leaf partials (the estimator is leaf-based by
    construction).  Agrees with the XLA ``edge_secondary`` estimator to
    <0.1% at matched spp on the adversarial occluder scene.  Documented
    approximations vs the XLA path: the respawn-surface exclusion has no
    t-gate (distant self-occlusion edges of the respawn surface are
    dropped) and a CARVED shape's graze registers at its uncarved leaf
    surface.
    """
    if aspect is None:
        aspect = width / height
    th, tw = tile
    if edge_secondary and tile == DEFAULT_TILE and not _union_only(spec):
        # Map-vjp mode only: the B1-1 secondary cotangent PLANE outputs
        # push the (32,128) kernel ~1.4MB past the 16MB scoped-VMEM limit
        # at 8 bounces; half-height tiles fit with room (measured OOM at
        # the bench config, round 4).  Winner mode reduces in-kernel and
        # keeps the full tile.
        th = 16
    th = min(th, -(-height // 8) * 8) if height < th else th
    target_planes = _pad_planes(
        jnp.transpose(jnp.asarray(target, jnp.float32), (2, 0, 1)), th, tw
    )

    inv_n = 1.0 / float(width * height * 3)

    if spp < 1:
        raise ValueError("spp must be >= 1")

    def step(params, frame=0):
        check_no_refraction(spec, params)
        pv = jnp.asarray(params, jnp.float32)
        frame = jnp.asarray(frame, jnp.int32)
        sse = jnp.float32(0.0)
        grad = jnp.zeros_like(pv)
        col_acc = None
        for s in range(spp):
            sse_s, grad_s, col = _fused_sse_and_grad_impl(
                spec, pv, target_planes,
                frame * spp + s, jnp.float32(fov),
                jnp.float32(aspect), jnp.int32(0), width=width,
                height=height, crop_h=height, bounces=bounces, tile_h=th,
                tile_w=tw, interpret=interpret,
                analytic_unboxed=analytic_unboxed,
                edge_grad=edge_grad, edge_beta=edge_beta,
                edge_secondary=edge_secondary, edge_beta2=edge_beta2,
                analytic_all=analytic_all,
            )
            sse = sse + sse_s
            grad = grad + grad_s
            if with_image:
                col_acc = col if col_acc is None else col_acc + col
        inv_spp = 1.0 / spp
        loss = sse * inv_n * inv_spp
        if with_image:
            img = jnp.transpose(col_acc[:, :height, :width], (1, 2, 0))
            return loss, grad * inv_spp, img * inv_spp
        return loss, grad * inv_spp

    return step
