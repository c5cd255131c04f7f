"""Differentiation of rendered pixels w.r.t. scene parameters.

The capability the reference does not have (its ``data[]`` buffer is the
natural differentiable surface, SURVEY.md §3.3): gradients of the image with
respect to the flat parameter vector, for inverse rendering and
gradient-based scene optimization.

Two paths:

* **plain autodiff**: with a static bounce count every loop in the oracle
  renderer is a scan, so ``jax.grad`` just works - O(STEPS) residual memory
  per march.
* **implicit-function march** (:func:`make_implicit_cast`): the sphere march
  is wrapped in a ``jax.custom_vjp`` that treats the hit distance t* as the
  root of f(ro + t rd, theta) = 0 and back-propagates with

      dt*/dtheta = -f_theta / (f_p . rd),
      dt*/dro    = -f_p     / (f_p . rd),
      dt*/drd    = -t* f_p  / (f_p . rd),

  evaluated at the hit point - one extra map vjp instead of an 80-step tape
  (the core design decision flagged in SURVEY.md §7 "Backward through an
  80-step march").

Both capture only the smooth shading/geometry terms; silhouette (visibility)
discontinuities need edge reparameterization, tracked as a roadmap item.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import DEFAULT_FOV
from ..render.reference import cast_ray, render_pixels
from ..render import reference as _ref
from ..render.scenegen import make_bounds, make_map, material_slot_matrix
from ..scene.compile import SceneSpec
from ..vecmath import Vec3

# Denominator clamp for the implicit gradient: |f_p . rd| below this means a
# grazing/degenerate hit where the implicit derivative blows up.
_DENOM_EPS = 1e-6

# Secondary-edge estimator: the respawn surface is excluded from closest-
# approach tracking only for taps with t <= this (10x the OFFSET respawn
# distance) - near-origin taps would floor the min at ~OFFSET, while
# far taps skimming the surface's own edge are real self-occlusion edges.
_EDGE_T_SELF = 0.3


def make_implicit_cast(map_fn):
    """Build a drop-in ``cast_fn`` for path_trace with an O(1)-memory
    implicit-gradient backward pass."""

    @jax.custom_vjp
    def cast(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, pv, checks):
        ro = Vec3(ro_x, ro_y, ro_z)
        rd = Vec3(rd_x, rd_y, rd_z)
        t, idx = cast_ray(map_fn, ro, rd, pv, checks)
        return t, idx

    def fwd(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, pv, checks):
        ro = Vec3(ro_x, ro_y, ro_z)
        rd = Vec3(rd_x, rd_y, rd_z)
        t, idx = cast_ray(map_fn, ro, rd, pv, checks)
        return (t, idx), (ro, rd, t, pv, checks)

    def bwd(res, cots):
        ro, rd, t, pv, checks = res
        t_cot, _idx_cot = cots

        p = ro + rd * t

        # Per-lane spatial gradient f_p of the scene SDF at the hit points:
        # one vjp of sum(d) w.r.t. the (elementwise-independent) positions.
        def f_of_p(px, py, pz, params):
            d, _ = map_fn(Vec3(px, py, pz), params, checks)
            return jnp.sum(d)

        _, vjp_fn = jax.vjp(f_of_p, p.x, p.y, p.z, pv)
        gpx, gpy, gpz, _ = vjp_fn(jnp.float32(1.0))
        g_p = Vec3(gpx, gpy, gpz)
        denom = g_p.dot(rd)
        safe = jnp.abs(denom) > _DENOM_EPS
        inv_denom = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)

        # Miss lanes (idx < 0 ~ t past far plane) and grazing hits get zero
        # gradient: t* is not a differentiable function of inputs there.
        scale = -t_cot * inv_denom  # dL/dt * dt/d(.) common factor

        def f_theta_seeded(params):
            d, _ = map_fn(Vec3(
                lax.stop_gradient(p.x), lax.stop_gradient(p.y),
                lax.stop_gradient(p.z)), params, checks)
            return jnp.sum(d * lax.stop_gradient(scale))

        pv_cot = jax.grad(f_theta_seeded)(pv)

        ro_cot = g_p * scale
        rd_cot = g_p * (scale * t)

        checks_cot = tuple(
            None if c is None else np.zeros(c.shape, jax.dtypes.float0)
            for c in checks
        )
        return (
            ro_cot.x, ro_cot.y, ro_cot.z,
            rd_cot.x, rd_cot.y, rd_cot.z,
            pv_cot,
            checks_cot,
        )

    cast.defvjp(fwd, bwd)

    def cast_fn(map_fn_unused, ro, rd, pv, checks):
        return cast(ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, pv, checks)

    return cast_fn


_CROSS_FLOOR = 2e-3  # min step while crossing a surface (anti MHD-creep)
# Min t-separation for the SECOND tracked closest-approach valley (corner-
# aware attribution, round 5): two taps closer than this along the ray are
# treated as refinements of the same silhouette valley, not a distinct edge.
_VALLEY_SEP = 0.05


def _march_closest(map_fn, ro: Vec3, rd: Vec3, pv, checks, excl=None,
                   excl_tmax=None, t_stop=None):
    """cast_ray's march additionally tracking the SIGNED closest approach:
    ``(d_min, t_at_min, idx_at_min)`` over all map taps of live lanes.

    Near a silhouette, sphere tracing samples densely (steps shrink with d),
    so the discrete minimum is a tight estimate of the continuous
    closest-approach distance - the quantity whose zero-crossing IS the
    visibility edge.

    Round 5 - the march continues THROUGH the first surface instead of
    stopping at |d| < MHD, so hit lanes track the SIGNED closest approach
    (the most-negative map value along the chord: rho - r for a sphere,
    -(lateral face margin) for a box).  The round-4 clamped min (d_min in
    [0, MHD] on every hit lane) structurally deleted the INTERIOR half of
    the coverage ramp - the measured ~2x cube-family deficit of
    edge_calibration_ext_r04 - and left interior pixels far from any edge
    carrying sigma' ~ 0.25.  With the signed continuation, near-edge
    interior lanes supply the missing half-ramp and deep-interior lanes
    saturate the sigmoid (sigma' -> 0).  Crossing steps are floored at
    ``_CROSS_FLOOR`` (the |d| march would otherwise creep at MHD/tap
    through the shell); the march stops on EXIT of the first penetrated
    shape (d > 0 after having been negative), so shapes BEHIND the first
    hit cannot saturate the min and erase the front silhouette's signal.

    ``excl`` (optional tuple of per-lane int32 shape ids) excludes taps whose
    map winner is one of those ids from the closest-approach TRACKING (the
    march itself is unchanged).  The secondary-bounce estimator passes the
    segment's own hit id (otherwise every hit lane's minimum lands ~0 at its
    own surface, drowning any occluder graze) and the surface the segment
    respawned from (whose OFFSET-distance would otherwise floor the min).
    ``excl_tmax`` (static, same length) limits an exclusion to taps with
    ``t <= tmax``: the respawn surface is excluded only near the origin, so
    a segment skimming its own emitter surface's EDGE at distance still
    registers the graze (self-occlusion edges, e.g. a wall shadowing its
    own far side).  ``t_stop`` (per lane) bounds the march: the secondary
    estimator passes the segment's own hit distance - with the winner
    excluded from tracking, grazes BEYOND the path's end are not
    visibility boundaries of this segment (round 3 measured ~3x phantom
    inflation without the cap, kernels/train.py:_make_excl_closest).

    CORNER-AWARE second valley (round 5): additionally tracks the best
    tap ``(d2, t2)`` at least ``_VALLEY_SEP`` along the ray from the
    running argmin.  At a silhouette corner two edges' valleys compete
    inside the coverage band and the argmin switches between them under
    parameter perturbation; the backward blends the two valleys' Danskin
    gradients with distance-softmax weights (see
    :func:`make_closest_approach`), which interpolates across the switch
    instead of jumping.  When both taps land in the same valley the two
    gradients coincide and the blend is a no-op.  Returns
    ``(d_min, t_min, i_min, d2, t2)``.
    """
    from ..constants import FP as _FP, STEPS as _STEPS

    t0 = ro.x * 0.0
    done0 = t0.astype(jnp.int32)
    idx0 = done0 - 1
    dmin0 = t0 + jnp.float32(1e9)

    def body(_, carry):
        t, idx, done_i, was_neg_i, d_min, t_min, i_min, d2, t2 = carry
        done = done_i != 0
        p = ro + rd * t
        d, mi = map_fn(Vec3(p.x, p.y, p.z), pv, checks)
        track = ~done
        if excl is not None:
            tmaxes = excl_tmax or (None,) * len(excl)
            for e, tm in zip(excl, tmaxes):
                skip = mi == e
                if tm is not None:
                    skip = skip & (t <= jnp.float32(tm))
                track = track & ~skip
        better = jnp.logical_and(track, d < d_min)
        # Second-valley bookkeeping against the OLD slot-1 state: a new
        # winner from a distinct valley demotes the old minimum; a
        # non-winning tap from a distinct valley competes for slot 2.
        sep = jnp.abs(t - t_min) > jnp.float32(_VALLEY_SEP)
        demote = better & sep & (d_min < d2)
        d2 = jnp.where(demote, d_min, d2)
        t2 = jnp.where(demote, t_min, t2)
        better2 = track & ~better & sep & (d < d2)
        d2 = jnp.where(better2, d, d2)
        t2 = jnp.where(better2, t, t2)
        d_min = jnp.where(better, d, d_min)
        t_min = jnp.where(better, t, t_min)
        i_min = jnp.where(better, mi, i_min)
        ad = jnp.abs(d)
        nt = jnp.where(done, t, t + jnp.maximum(ad, _CROSS_FLOOR))
        nidx = jnp.where(done, idx, mi)
        far = nt > _FP
        nidx = jnp.where(jnp.logical_and(~done, far), -1, nidx)
        exited = (was_neg_i != 0) & (d > 0.0)
        nwas_neg = was_neg_i | (d < 0.0).astype(jnp.int32)
        ndone = done | far | exited
        if t_stop is not None:
            ndone = ndone | (nt > t_stop)
        return (nt, nidx, ndone.astype(jnp.int32), nwas_neg,
                d_min, t_min, i_min, d2, t2)

    _, _, _, _, d_min, t_min, i_min, d2, t2 = lax.fori_loop(
        0, _STEPS, body, (t0, idx0, done0, done0, dmin0, t0, idx0,
                          dmin0, t0)
    )
    return d_min, t_min, i_min, d2, t2


def make_closest_approach(map_fn, excl_tmax=None):
    """``(ro, rd, pv, checks) -> (d_min, t_min, idx_min)`` with a Danskin
    (envelope-theorem) backward: at the along-ray minimum, d(d_min)/d(inputs)
    is the map's spatial/parameter gradient at the fixed argmin point

        d(d_min)/dpv = f_theta(p*),  d(d_min)/dro = f_p(p*),
        d(d_min)/drd = t* f_p(p*),

    one map vjp instead of an 80-step tape (same trick as
    :func:`make_implicit_cast`; the ``d/dt = 0`` envelope condition holds
    approximately for the discrete tap minimum).  ``t_min``/``idx_min`` are
    non-differentiable outputs.

    CORNER-AWARE blend (round 5): pass ``tie_scale`` (scalar; callers use
    the coverage bandwidth's footprint factor ``2 * edge_beta / (H * fov)``)
    to blend the Danskin gradients of the best TWO t-separated valleys
    (see :func:`_march_closest`) with weights

        w2 = sigmoid((d1 - d2) / gamma),  gamma = max(t1, 0.2) * tie_scale

    - at an argmin tie (silhouette corner) both edges contribute half
    instead of the switch-discontinuous single argmin; an empty second
    slot (d2 = 1e9) gives w2 = 0 exactly.  Measured on the rotated-cube
    per-column harness (rotgrad_profile_r05): total est/fd 0.74 -> 0.79,
    corner columns improved, interior columns unchanged.  The residual
    endpoint-column sign error is a COVERAGE-MODEL limitation, not an
    attribution bug - the per-pixel Danskin d(d_min)/dtheta matches FD
    within ~10% even at corner rows, and a gated product-of-ramps
    coverage model was probed and measured net-negative
    (corner_attrib_r05.jsonl: d2 measures 3D proximity to the second
    surface, not signed screen distance to its silhouette line).
    """

    @jax.custom_vjp
    def closest(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, pv, checks, excl, ts,
                tg):
        return _march_closest(map_fn, Vec3(ro_x, ro_y, ro_z),
                              Vec3(rd_x, rd_y, rd_z), pv, checks, excl,
                              excl_tmax, ts[0] if ts else None)[:3]

    def fwd(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, pv, checks, excl, ts, tg):
        ro = Vec3(ro_x, ro_y, ro_z)
        rd = Vec3(rd_x, rd_y, rd_z)
        out = _march_closest(map_fn, ro, rd, pv, checks, excl, excl_tmax,
                             ts[0] if ts else None)
        d_min, t_min, i_min, d2, t2 = out
        return out[:3], (ro, rd, t_min, pv, checks, excl, ts, tg,
                         d_min, d2, t2)

    def bwd(res, cots):
        ro, rd, t_min, pv, checks, excl, ts, tg, d_min, d2, t2 = res
        d_cot, _t_cot, _i_cot = cots
        p = ro + rd * t_min

        def f_at(px, py, pz, params, cot):
            d, _ = map_fn(Vec3(px, py, pz), params, checks)
            return jnp.sum(d * lax.stop_gradient(cot))

        if not tg:
            _, vjp_fn = jax.vjp(lambda a, b, c, q: f_at(a, b, c, q, d_cot),
                                p.x, p.y, p.z, pv)
            gpx, gpy, gpz, pv_cot = vjp_fn(jnp.float32(1.0))
            gro = Vec3(gpx, gpy, gpz)
            grd = gro * t_min
        else:
            gamma = jnp.maximum(t_min, 0.2) * lax.stop_gradient(tg[0])
            w2 = jax.nn.sigmoid((d_min - d2) / gamma)
            w1 = 1.0 - w2
            p2 = ro + rd * t2
            _, vjp1 = jax.vjp(lambda a, b, c, q: f_at(a, b, c, q,
                                                      d_cot * w1),
                              p.x, p.y, p.z, pv)
            g1x, g1y, g1z, pv1_cot = vjp1(jnp.float32(1.0))
            _, vjp2 = jax.vjp(lambda a, b, c, q: f_at(a, b, c, q,
                                                      d_cot * w2),
                              p2.x, p2.y, p2.z, pv)
            g2x, g2y, g2z, pv2_cot = vjp2(jnp.float32(1.0))
            g1 = Vec3(g1x, g1y, g1z)
            g2 = Vec3(g2x, g2y, g2z)
            gro = g1 + g2
            grd = g1 * t_min + g2 * t2
            pv_cot = pv1_cot + pv2_cot
        checks_cot = tuple(
            None if c is None else np.zeros(c.shape, jax.dtypes.float0)
            for c in checks
        )
        excl_cot = tuple(np.zeros(e.shape, jax.dtypes.float0) for e in excl)
        ts_cot = tuple(np.zeros(t.shape, jax.dtypes.float0) for t in ts)
        tg_cot = tuple(np.zeros(t.shape, jax.dtypes.float0) for t in tg)
        return (gro.x, gro.y, gro.z, grd.x, grd.y, grd.z,
                pv_cot, checks_cot, excl_cot, ts_cot, tg_cot)

    closest.defvjp(fwd, bwd)

    def closest_fn(ro, rd, pv, checks, excl=(), t_stop=None,
                   tie_scale=None):
        ts = () if t_stop is None else (t_stop,)
        tg = () if tie_scale is None else (
            jnp.asarray(tie_scale, jnp.float32),)
        return closest(ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, pv, checks,
                       tuple(excl), ts, tg)

    return closest_fn


def render_pixels_diff(
    spec: SceneSpec,
    params,
    xs,
    ys,
    frame,
    bounces: int,
    fov,
    aspect,
    *,
    width: int,
    height: int,
    implicit: bool = True,
    geometry: str = "faithful",
    edge_grad: bool = False,
    edge_beta: float = 0.5,
    edge_secondary: bool = False,
    edge_beta2: float = 2.0,
    march: str = "xla",
    march_interpret: bool = False,
    normals: str = "central",
    remat: bool = False,
) -> Vec3:
    """Differentiable path-traced pixels: static bounce count (scan loops)
    and, with ``implicit=True``, the O(1)-memory march backward.

    ``normals="autodiff"`` swaps the 6-tap central difference for the exact
    reverse-mode map gradient (render/reference.py:calc_normal_autodiff):
    ~3x fewer map taps in the XLA shading graph and a cheaper second-order
    term in the backward; values differ from the reference's eps=1e-4 finite
    difference at sub-eps level.  ``normals="detached"`` keeps the
    reference's central difference in the forward (values bit-identical to
    "central") but stop-gradients it, pruning the normal taps' reverse sweep
    - the dominant backward cost - at the price of dropping the second-order
    shading-normal gradient term (a standard approximation in differentiable
    rendering; geometry gradients still flow via the implicit hit-t and the
    edge estimator).  ``normals="kernel"`` (requires ``march="pallas"``) is
    the fused form of "detached": the march kernel itself emits the culled
    6-tap normal, so the forward taps leave XLA too - the fast-gradient
    configuration for training at scale.

    ``march="pallas"`` swaps the XLA sphere march for the on-chip kernel
    (kernels/march.py) in BOTH directions: the forward runs the Pallas
    t-interval-culled march, the backward the same one-tap implicit gradient
    - the training step never executes or tapes an 80-step march in XLA.

    ``geometry="baked"`` marches the leaf-baked affine map (render/baked.py);
    the bake is itself a differentiable jnp graph, so the implicit march's
    cotangent w.r.t. the baked vector chain-rules back to the raw parameters
    automatically.

    ``edge_grad=True`` adds PRIMARY-silhouette visibility gradients (the
    north-star "reparameterized edge handling"): in this shading model the
    radiance of a path is a product of material constants, so smooth autodiff
    sees zero geometry gradient almost everywhere - all pos/size/rotation
    signal lives in the visibility edges.  We recover it with a detached
    soft-coverage blend: per pixel, the closest-approach distance d_min of
    the primary march (Danskin-differentiable, :func:`make_closest_approach`)
    drives a sigmoid coverage c with bandwidth ~ the pixel footprint, and

        col += (c - stop_grad(c)) * stop_grad(proxy)

    leaves the rendered VALUE bit-identical while d(col)/d(theta) gains
    sigma'(d_min) * proxy - the same estimator AA-jittered expectation
    converges to.  ``proxy`` is the pixel's own radiance on hit lanes and the
    closest shape's emissive on miss lanes.  ``edge_beta`` scales
    the coverage bandwidth in pixel-footprint units; the default 0.5 is
    CALIBRATED against the spp-averaged finite difference of the loss on
    the flat-lit-sphere scene (benchmarks/edge_calibration.py; with the
    round-5 SIGNED closest approach - see :func:`_march_closest` - and
    the slope-aware bandwidth the ratios are 0.71-0.99 across target
    offsets on the sphere and 0.70-0.94 across the rotated/scaled CUBE
    families, artifacts edge_calibration_ext_r05.jsonl).

    ``edge_secondary=True`` (with ``edge_grad``) extends the estimator to
    SECONDARY-bounce visibility edges - the term round 3 measured DOMINANT
    on adversarial indirect lighting (benchmarks/secondary_edge.py: an
    off-frustum occluder's shadow boundary carries 4.4x the primary
    anchor's gradient, all invisible to the primary-only estimator).  Per
    bounce b >= 1, the segment's closest-approach march re-runs with the
    segment's own hit id and its respawn surface EXCLUDED from the min
    tracking (otherwise every hit lane's minimum lands at its own surface,
    drowning any occluder graze), and the coverage correction uses

        proxy_b = thr_b * emissive(i_min_b) - (col - ret_before_b)

    - the downstream radiance the lane would trade for the graze shape's
    emission if the edge flipped to a hit.  Values stay bit-identical (the
    correction is ``c - stop_grad(c)`` as for the primary term); cost is
    one extra closest-approach march per bounce.  ``edge_beta2`` is the
    secondary bandwidth scale (same footprint formula); the round-5
    default 2.0 is calibrated on the adversarial occluder scene across
    translation AND rotation/scale sweeps (bands 0.54-0.97 everywhere,
    artifacts secondary_calibration_ext_r05.jsonl) - the secondary d_b
    population is sampled by RANDOM bounce directions, far sparser than
    the primary's pixel raster, so its window must span more samples
    than the pixel-footprint formula alone suggests (narrower bandwidths
    MEASURED worse: 0.5 -> band 0.31-0.95, 0.25 -> 0.19-0.96).
    Self-shadowing by the respawn surface
    itself is excluded by construction (documented limitation).
    """
    if not implicit:
        return render_pixels(
            spec, params, xs, ys, frame, bounces, fov, aspect,
            width=width, height=height, debug=0, geometry=geometry,
        )
    if geometry == "baked":
        from ..render.baked import bake, make_bounds_baked, make_map_baked

        map_fn = make_map_baked(spec)
        bounds_fn = make_bounds_baked(spec)
        gv = bake(spec, params)
    elif geometry == "faithful":
        map_fn = make_map(spec)
        bounds_fn = make_bounds(spec)
        gv = params
    else:
        raise ValueError("geometry must be 'faithful' or 'baked'")
    mat_table = params[jnp.asarray(material_slot_matrix(spec))]

    def gather_mat(idx):
        return _ref.gather_material(mat_table, idx)

    from ..ops.camera import calc_uv, primary_ray
    from ..ops.rng import gen_rng, random_float01

    rng = gen_rng(xs, ys, frame, width, height)
    rng, jx = random_float01(rng)
    rng, jy = random_float01(rng)
    u, v = calc_uv(
        xs.astype(jnp.float32) + (jx - 0.5),
        ys.astype(jnp.float32) + (jy - 0.5),
        width, height, aspect,
    )
    ro, rd = primary_ray(u, v, fov)
    kernel_normal_fn = None
    if march == "pallas":
        from ..kernels.march import make_pallas_cast, make_pallas_cast_with_normal

        if normals == "kernel":
            cast_fn, kernel_normal_fn = make_pallas_cast_with_normal(
                spec, geometry=geometry, interpret=march_interpret
            )
        else:
            cast_fn = make_pallas_cast(
                spec, geometry=geometry, interpret=march_interpret
            )
    else:
        if normals == "kernel":
            raise ValueError('normals="kernel" requires march="pallas"')
        cast_fn = make_implicit_cast(map_fn)
    normal_fn = None
    if normals == "kernel":
        # Fused realization of "detached": 6-tap normal computed inside the
        # march kernel (kernels/march.py:make_pallas_cast_with_normal) and
        # stop-gradiented - no normal tap executes in XLA in either
        # direction of the training step.
        normal_fn = kernel_normal_fn
    elif normals == "autodiff":
        def normal_fn(map_fn_, p, pv_, checks_, _idx):
            return _ref.calc_normal_autodiff(map_fn_, p, pv_, checks_)
    elif normals == "detached":
        # Standard differentiable-rendering approximation: treat the surface
        # normal as a constant of the backward pass.  The rendered VALUE is
        # bit-identical to normals="central"; the gradient drops the
        # second-order shading-normal term (dL/dn * dn/dtheta) whose reverse
        # sweep re-differentiates all 6 central-difference map taps per
        # bounce segment - the single most expensive part of the XLA
        # backward at scale.  Geometry signal still flows through the
        # implicit hit-t and the edge estimator; materials are first-order
        # and unaffected.  Opt-in; default stays faithful.
        def normal_fn(map_fn_, p, pv_, checks_, _idx):
            sg = lax.stop_gradient
            n = _ref.calc_normal(
                map_fn_, Vec3(sg(p.x), sg(p.y), sg(p.z)), sg(pv_), checks_
            )
            return Vec3(sg(n.x), sg(n.y), sg(n.z))
    collect = edge_grad and edge_secondary
    if collect:
        col, _, segs = _ref.path_trace(
            map_fn, bounds_fn, gather_mat, ro, rd, gv, rng, bounces,
            cast_fn=cast_fn, normal_fn=normal_fn, remat=remat,
            collect_segments=True,
        )
    else:
        col, _ = _ref.path_trace(
            map_fn, bounds_fn, gather_mat, ro, rd, gv, rng, bounces,
            cast_fn=cast_fn, normal_fn=normal_fn, remat=remat,
        )
    if edge_grad:
        from ..constants import MHD
        from ..vecmath import vwhere

        checks0, _ = bounds_fn(ro, rd, gv)
        closest_fn = make_closest_approach(map_fn)
        d_min, t_min, i_min = closest_fn(
            ro, rd, gv, checks0,
            tie_scale=2.0 * edge_beta / (height * lax.stop_gradient(fov)))
        tsg = lax.stop_gradient(t_min)
        sg = lax.stop_gradient

        def edge_slope(ro_, rd_, t_, checks_):
            """Slope-aware bandwidth factor (round 5): d_min changes per
            unit PERPENDICULAR ray offset at the rate of the map
            gradient's ray-perpendicular component at the argmin point -
            1 for a sphere silhouette (the pose the global beta was
            calibrated on), < 1 for tilted faces/edges whose closest
            distance grows slower than the screen offset.  Dividing the
            effective bandwidth by it converts d_min into true
            screen-space edge distance, which is what the pixel-footprint
            sigmoid models; without it the estimator undershoots tilted
            and cube-family silhouettes ~2x (round-4 extended
            calibration, edge_calibration_ext_r04.jsonl)."""
            p_star = Vec3(sg(ro_.x + rd_.x * t_), sg(ro_.y + rd_.y * t_),
                          sg(ro_.z + rd_.z * t_))
            nrm = _ref.calc_normal(map_fn, p_star, sg(gv), checks_)
            g_par = nrm.x * sg(rd_.x) + nrm.y * sg(rd_.y) + nrm.z * sg(rd_.z)
            perp = jnp.sqrt(jnp.maximum(1.0 - g_par * g_par, 1e-6))
            return jnp.clip(perp, 0.15, 1.0)

        # Pixel footprint at the closest point: one pixel subtends ~2/(H*fov)
        # of the normalized image plane (ops/camera.py:calc_uv); the slope
        # factor projects it onto the local silhouette geometry.
        beta = jnp.maximum(tsg, 0.2) * (
            2.0 * edge_beta / (height * lax.stop_gradient(fov))
        ) * edge_slope(ro, rd, tsg, checks0)
        c = jax.nn.sigmoid((MHD - d_min) / beta)
        mat_min = gather_mat(i_min)
        proxy_emit = mat_min.light.normalize_safe() * mat_min.brightness
        hit = lax.stop_gradient(d_min) < MHD
        # Miss-lane proxy: what the pixel would show if coverage flipped to
        # a hit.  The closest shape's EMISSIVE alone (round 3) is exact for
        # emitters but zero for lit non-emissive shapes, silencing their
        # silhouettes (e.g. a wall edge against black: the round-3
        # secondary_edge artifact's uncaptured wall-x anchor).  When the
        # pixel grid is available, average the RENDERED radiance of nearby
        # hit pixels instead - the screen-space realization of the
        # soft-rasterizer boundary color - falling back to the emissive
        # where no neighbor hit exists.
        proxy_miss = Vec3(*[lax.stop_gradient(a) for a in
                            (proxy_emit.x, proxy_emit.y, proxy_emit.z)])
        if (getattr(xs, "ndim", 0) == 2 and xs.shape[0] >= 5
                and xs.shape[1] >= 5):
            hm = hit.astype(jnp.float32)

            def blur(p):
                acc = p * 0.0
                for dy in range(-2, 3):
                    r = jnp.roll(p, dy, axis=0)
                    for dx in range(-2, 3):
                        acc = acc + jnp.roll(r, dx, axis=1)
                return acc

            den = blur(hm)
            sgc = lax.stop_gradient
            nb = Vec3(blur(sgc(col.x) * hm), blur(sgc(col.y) * hm),
                      blur(sgc(col.z) * hm)) / jnp.maximum(den, 1e-6)
            proxy_miss = vwhere(den > 0.5, nb, proxy_miss)
        proxy = vwhere(
            hit,
            Vec3(*[lax.stop_gradient(a) for a in (col.x, col.y, col.z)]),
            proxy_miss,
        )
        corr = c - lax.stop_gradient(c)
        edge_corr = proxy * corr
        if collect:
            sg = lax.stop_gradient
            seg_ro, seg_rd, seg_thr, seg_ret, seg_alive, _seg_t, seg_idx = segs
            closest_fn2 = make_closest_approach(
                map_fn, excl_tmax=(None, _EDGE_T_SELF))
            inv_foot = 2.0 * edge_beta2 / (height * sg(fov))
            for b in range(1, bounces + 1):
                ro_b = Vec3(seg_ro.x[b], seg_ro.y[b], seg_ro.z[b])
                rd_b = Vec3(seg_rd.x[b], seg_rd.y[b], seg_rd.z[b])
                excl = (sg(seg_idx[b]), sg(seg_idx[b - 1]))
                checks_b, _ = bounds_fn(ro_b, rd_b, gv)
                # t_stop = the segment's own hit distance: with the winner
                # excluded from tracking AND the march continuing through
                # surfaces (signed closest approach), grazes beyond the
                # path's end must not register (round-3 phantom-inflation
                # finding, kernels/train.py:_make_excl_closest).
                d_b, t_b, i_b = closest_fn2(ro_b, rd_b, gv, checks_b, excl,
                                            t_stop=sg(_seg_t[b]),
                                            tie_scale=inv_foot)
                beta_b = (jnp.maximum(sg(t_b), 0.2) * inv_foot
                          * edge_slope(ro_b, rd_b, sg(t_b), checks_b))
                c_b = jax.nn.sigmoid((MHD - d_b) / beta_b)
                mat_b = gather_mat(i_b)
                emit_b = mat_b.light.normalize_safe() * mat_b.brightness
                thr_b = Vec3(sg(seg_thr.x[b]), sg(seg_thr.y[b]),
                             sg(seg_thr.z[b]))
                rem_b = Vec3(sg(col.x - seg_ret.x[b]),
                             sg(col.y - seg_ret.y[b]),
                             sg(col.z - seg_ret.z[b]))
                proxy_b = Vec3(sg(thr_b.x * emit_b.x) - rem_b.x,
                               sg(thr_b.y * emit_b.y) - rem_b.y,
                               sg(thr_b.z * emit_b.z) - rem_b.z)
                gate = ((seg_alive[b] != 0) & (i_b >= 0)).astype(jnp.float32)
                corr_b = (c_b - sg(c_b)) * gate
                edge_corr = edge_corr + proxy_b * corr_b
        col = col + edge_corr
    return col


@partial(
    jax.jit,
    static_argnames=("spec", "width", "height", "bounces", "spp", "implicit",
                     "geometry", "edge_grad", "edge_beta", "edge_secondary",
                     "edge_beta2", "march", "march_interpret", "normals",
                     "remat"),
)
def render_image_diff(
    spec: SceneSpec,
    params,
    *,
    width: int,
    height: int,
    bounces: int = 2,
    spp: int = 1,
    fov: float = DEFAULT_FOV,
    aspect: float = None,
    implicit: bool = True,
    geometry: str = "faithful",
    edge_grad: bool = False,
    edge_beta: float = 0.5,
    edge_secondary: bool = False,
    edge_beta2: float = 2.0,
    march: str = "xla",
    march_interpret: bool = False,
    normals: str = "central",
    remat: bool = False,
):
    """Differentiable full-frame render, averaging ``spp`` RNG streams
    (frames) per pixel.  Returns (H, W, 3)."""
    if aspect is None:
        aspect = width / height
    xs = lax.broadcasted_iota(jnp.int32, (height, width), 1)
    ys = lax.broadcasted_iota(jnp.int32, (height, width), 0)

    def one(f):
        return render_pixels_diff(
            spec, params, xs, ys, f, bounces,
            jnp.float32(fov), jnp.float32(aspect),
            width=width, height=height, implicit=implicit, geometry=geometry,
            edge_grad=edge_grad, edge_beta=edge_beta,
            edge_secondary=edge_secondary, edge_beta2=edge_beta2, march=march,
            march_interpret=march_interpret, normals=normals, remat=remat,
        ).stack()

    acc = one(jnp.int32(0))
    if spp > 1:
        # A fori_loop (static trip count -> reverse-differentiable scan)
        # instead of a Python unroll: tracing `one` once keeps compile time
        # flat in spp - the unrolled edge_secondary graph at spp=8 was a
        # multi-minute XLA compile.
        acc = lax.fori_loop(1, spp, lambda s, a: a + one(s), acc)
    return acc / float(spp)


def make_loss(
    spec: SceneSpec,
    target,
    *,
    width: int,
    height: int,
    bounces: int = 2,
    spp: int = 1,
    fov: float = DEFAULT_FOV,
    implicit: bool = True,
    geometry: str = "faithful",
    edge_grad: bool = False,
    edge_beta: float = 0.5,
    edge_secondary: bool = False,
    edge_beta2: float = 2.0,
    march: str = "xla",
    march_interpret: bool = False,
    normals: str = "central",
    remat: bool = False,
):
    """MSE-to-target loss over a differentiable render; use with jax.grad."""
    target = jnp.asarray(target, jnp.float32)

    def loss(params):
        img = render_image_diff(
            spec, params, width=width, height=height, bounces=bounces,
            spp=spp, fov=fov, implicit=implicit, geometry=geometry,
            edge_grad=edge_grad, edge_beta=edge_beta,
            edge_secondary=edge_secondary, edge_beta2=edge_beta2, march=march,
            march_interpret=march_interpret, normals=normals, remat=remat,
        )
        return jnp.mean((img - target) ** 2)

    return loss
