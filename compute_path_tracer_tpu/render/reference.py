"""The jax.numpy oracle renderer: sphere march, path trace, debug modes.

A complete, vectorized re-implementation of the reference's compute kernel
(reference: assets/shaders/path_tracer/test_compute.glsl) over whole (H, W)
image planes.  This renderer is:

* the *oracle* every other implementation is tested against (SURVEY.md §4) -
  it shares its RNG bit-for-bit with the Pallas kernels, so images are
  directly comparable;
* a real TPU renderer in its own right: everything is jit-compiled XLA with
  static shapes, masked fixed-trip loops instead of divergent breaks, and no
  host round-trips inside a frame;
* the differentiable path for plain ``jax.grad`` - all ops are jnp, so
  gradients of rendered pixels w.r.t. the flat scene parameter vector flow
  through the march, shading and accumulation.

GPU early-exit ``break``s become masked lanes (SURVEY.md §7 "divergence ->
masking"): every ray runs the full 80-step march and full bounce budget with
``where``-gated state updates, which preserves semantics exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import DEFAULT_BOUNCES, DEFAULT_FOV, FP, MHD, OFFSET, STEPS
from ..ops.camera import calc_uv, primary_ray
from ..ops.rng import gen_rng, random_float01, random_unit_vector
from ..scene.compile import SceneSpec
from ..vecmath import Vec3, reflect, vmix, vwhere
from .scenegen import make_bounds, make_map, material_slot_matrix


class Mat(NamedTuple):
    """SoA material planes, one entry per field of the reference's ``Mat``
    struct (test_compute.glsl:45-59)."""

    col: Vec3
    brightness: Any
    light: Vec3
    spec: Any
    spec_col: Vec3
    roughness: Any
    ior: Any
    refract_chance: Any
    refract_roughness: Any
    refract_col: Vec3


def gather_material(mat_table, idx) -> Mat:
    """Fetch per-ray materials by winning-shape id; ``idx < 0`` yields the
    all-zero MDEF material (test_compute.glsl:63)."""
    shape = idx.shape
    if mat_table.shape[0] == 0:
        z = jnp.zeros(shape, jnp.float32)
        zv = Vec3(z, z, z)
        return Mat(zv, z, zv, z, zv, z, z, z, z, zv)
    safe = jnp.maximum(idx, 0)
    valid = idx >= 0

    def chan(c):
        return jnp.where(valid, mat_table[:, c][safe], 0.0)

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


def cast_ray(map_fn, ro: Vec3, rd: Vec3, pv, checks):
    """Fixed-trip sphere march (test_compute.glsl:74-89).

    Returns ``(t, idx)``: the accumulated distance and the id of the material
    seen at the final map tap (-1 once t passed the far plane, i.e. MDEF).
    Break conditions become a ``done`` mask; iteration order, the
    increment-then-test sequencing and the |d| < MHD inside-surface hit all
    match the GLSL.

    One deliberate difference: the step is ``t += |d|`` where the GLSL adds
    the signed d (test_compute.glsl:81).  The two are identical whenever
    d >= 0 - every state the reference can reach, since it never continues
    rays into an interior - but the signed step makes negative-SDF regions
    un-traversable (it pulls t backward onto the entry surface), which the
    refraction extension requires.  In overshoot corner cases (|d| < MHD
    about to hit) the absolute step lands up to 2*MHD past where the GLSL
    would, at the same hit.
    """
    # Carry inits derive from ro so they inherit its mesh-axis visibility
    # under shard_map (a fresh constant would be unvarying and trip the scan
    # carry type check).  The done mask is carried as int32: Mosaic cannot
    # carry i1 vectors through scf.for.
    t0 = ro.x * 0.0
    done0 = t0.astype(jnp.int32)
    idx0 = done0 - 1

    def body(_, carry):
        t, idx, done_i = carry
        done = done_i != 0
        p = ro + rd * t
        d, mi = map_fn(p, pv, checks)
        ad = jnp.abs(d)
        nt = jnp.where(done, t, t + ad)
        nidx = jnp.where(done, idx, mi)
        far = nt > FP
        nidx = jnp.where(jnp.logical_and(~done, far), -1, nidx)
        ndone = done | (ad < MHD) | far
        return nt, nidx, ndone.astype(jnp.int32)

    t, idx, _ = lax.fori_loop(0, STEPS, body, (t0, idx0, done0))
    return t, idx


def calc_normal(map_fn, p: Vec3, pv, checks) -> Vec3:
    """Central-difference SDF gradient, 6 map taps, eps 1e-4
    (funcs.glsl:21-35)."""
    e = 1e-4

    def tap(dx, dy, dz):
        d, _ = map_fn(Vec3(p.x + dx, p.y + dy, p.z + dz), pv, checks)
        return d

    return Vec3(
        tap(e, 0.0, 0.0) - tap(-e, 0.0, 0.0),
        tap(0.0, e, 0.0) - tap(0.0, -e, 0.0),
        tap(0.0, 0.0, e) - tap(0.0, 0.0, -e),
    ).normalize_safe()


def calc_normal_autodiff(map_fn, p: Vec3, pv, checks) -> Vec3:
    """Exact SDF gradient by reverse-mode AD of one map tap.

    Replaces the 6-tap central difference (funcs.glsl:21-35) with ~2 taps of
    work (forward + transpose).  Unlike per-leaf analytic normals this is
    exact for EVERY fold the map performs - subtraction negations, AABB-guard
    skips, smooth-union blending - because it differentiates the very
    function the march hit.  Divergence from the reference: exact gradient
    instead of the eps=1e-4 finite difference (sub-eps image change).
    """

    def d_of(px, py, pz):
        d, _ = map_fn(Vec3(px, py, pz), pv, checks)
        return d

    _, vjp = jax.vjp(d_of, p.x, p.y, p.z)
    gx, gy, gz = vjp(jnp.ones_like(p.x))
    return Vec3(gx, gy, gz).normalize_safe()


def refract_dir(i: Vec3, n: Vec3, eta):
    """GLSL ``refract(I, N, eta)``: Snell refraction, zero vector on total
    internal reflection, with gradient-safe sqrt.

    The sqrt guard must be STRICT (k > 0): at exactly k == 0 (grazing
    incidence; reachable in fp when eta == 1) sqrt'(0) = inf enters the
    reverse sweep and 0 * inf = NaN poisons the ior/refract_chance
    cotangents even on lanes whose refracted direction is never consumed -
    observed as isolated-pixel NaNs in the fused kernel's material
    cotangent planes at 1080p."""
    cosi = n.dot(i)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    pos = k > 0.0
    root = jnp.where(pos, jnp.sqrt(jnp.where(pos, k, 1.0)), 0.0)
    ok = k >= 0.0
    out = i * eta - n * (eta * cosi + root)
    return vwhere(ok, out, Vec3.splat(jnp.zeros_like(k))), ok


def shade_bounce(rng, rd: Vec3, hit_pos: Vec3, n: Vec3, mat):
    """One hit's scatter + emission (test_compute.glsl:118-149), extended
    with refraction through the reference's four reserved-but-unshaded
    material slots (ior / refract chance / roughness / color;
    test_compute.glsl:54-58 are carried but never read by its lighting).

    A single RNG draw three-way-splits specular / refract / diffuse, so with
    ``refract_chance == 0`` (the default material) every draw, branch and
    value is bit-identical to the reference model.  The refractive index is
    ``1 + ior``; entering rays are offset inside the surface, exiting rays
    outside; total internal reflection falls back to mirror reflection.

    Returns ``(rng, new_ro, new_rd, emit, thr_factor, ray_prob)``; callers
    apply ``ret += emit * thr`` and ``thr *= thr_factor / ray_prob`` and run
    Russian roulette themselves (their alive-masking differs).
    """
    rng, r_branch = random_float01(rng)
    spec_c = mat.spec
    refr_c = mat.refract_chance
    do_spec = r_branch < spec_c
    do_refr = jnp.logical_and(~do_spec, r_branch < spec_c + refr_c)
    ray_prob = jnp.where(
        do_spec, spec_c, jnp.where(do_refr, refr_c, 1.0 - spec_c - refr_c)
    )
    ray_prob = jnp.maximum(ray_prob, 1e-4)

    rng, ruv = random_unit_vector(rng)
    diffuse_dir = (n + ruv).normalize_safe()
    spec_dir = vmix(
        reflect(rd, n), diffuse_dir, mat.roughness * mat.roughness
    ).normalize_safe()

    # Refraction: flip the normal when exiting (ray and outward normal
    # aligned), eta = n1/n2 with refractive index 1 + ior.
    entering = rd.dot(n) < 0.0
    n_eff = vwhere(entering, n, -n)
    idx_ref = 1.0 + mat.ior
    eta = jnp.where(entering, 1.0 / idx_ref, idx_ref)
    refr, ok = refract_dir(rd, n_eff, eta)
    refr = vwhere(ok, refr, reflect(rd, n_eff))
    trans_diffuse = (-n_eff + ruv).normalize_safe()
    refr = vmix(
        refr, trans_diffuse, mat.refract_roughness * mat.refract_roughness
    ).normalize_safe()

    new_rd = vwhere(do_spec, spec_dir, vwhere(do_refr, refr, diffuse_dir))
    # Respawn offset: along +n (test_compute.glsl:118) except refracted rays,
    # which continue through the surface (-n_eff: inside when entering,
    # outside when exiting).
    offset_n = vwhere(do_refr, -n_eff, n)
    new_ro = hit_pos + offset_n * OFFSET

    emit = mat.light.normalize_safe() * mat.brightness
    thr_factor = vwhere(
        do_spec, mat.spec_col, vwhere(do_refr, mat.refract_col, mat.col)
    )
    return rng, new_ro, new_rd, emit, thr_factor, ray_prob


def path_trace(map_fn, bounds_fn, gather_mat, ro: Vec3, rd: Vec3, pv, rng, bounces,
               cast_fn=None, normal_fn=None, remat=False,
               collect_segments=False):
    """Monte-Carlo bounce loop (test_compute.glsl:91-166).

    Runs ``bounces + 1`` iterations (the GLSL loop is ``i <= s.bounces``) with
    per-lane alive masks standing in for the miss / russian-roulette breaks.
    Returns ``(radiance Vec3, i_exit int32)`` where ``i_exit`` is the GLSL
    loop variable at exit, feeding the bounce-heatmap debug mode
    (test_compute.glsl:163).

    ``cast_fn`` overrides the sphere-march (same signature as
    :func:`cast_ray`); the differentiable path substitutes the O(1)-memory
    implicit-gradient march from diff/vjp.py here.  ``normal_fn`` overrides
    the surface normal: ``(map_fn, p, pv, checks, idx) -> Vec3`` (default =
    the 6-tap central difference; the baked path plugs its one-tap analytic
    gradient in here).  ``remat=True`` wraps the bounce body in
    ``jax.checkpoint``: under reverse-mode the scan then tapes only the
    ~16-plane carry per segment instead of every internal intermediate,
    trading a forward recompute for HBM residual traffic - at 1080p the
    taped residuals, not the FLOPs, bound the training step.

    ``collect_segments=True`` (requires a static ``bounces``) additionally
    returns per-bounce ray-segment state stacked on a leading (bounces+1)
    axis: ``(ro, rd, thr, ret_before, alive, t, idx)`` where the first five
    are the state ENTERING bounce b and ``t``/``idx`` are bounce b's march
    result - the inputs the per-bounce visibility-edge estimator needs
    (diff/vjp.py).  The stacked values stay differentiable (a secondary
    segment's origin moves with the previous bounce's hit point).
    """
    if cast_fn is None:
        cast_fn = cast_ray
    if normal_fn is None:
        def normal_fn(map_fn_, p, pv_, checks_, _idx):
            return calc_normal(map_fn_, p, pv_, checks_)
    # Inits derive from ro for shard_map axis-visibility (see cast_ray).
    zero = ro.x * 0.0
    one = zero + 1.0
    init = (
        rng,
        ro,
        rd,
        Vec3(zero, zero, zero),  # ret
        Vec3(one, one, one),  # throughput
        one.astype(jnp.int32),  # alive (int32: i1 can't be loop-carried)
        zero.astype(jnp.int32) - 1,  # i_exit (-1 = still running)
    )

    def body_seg(i, carry):
        rng, ro, rd, ret, thr, alive_i, i_exit = carry
        alive = alive_i != 0

        checks, _dbg = bounds_fn(ro, rd, pv)
        t, idx = cast_fn(map_fn, ro, rd, pv, checks)
        seg = (ro, rd, thr, ret, alive_i, t, idx)

        miss = t > FP
        i_exit = jnp.where(alive & miss, i, i_exit)
        act = alive & ~miss

        hit_pos = ro + rd * t
        n = normal_fn(map_fn, hit_pos, pv, checks, idx)
        mat = gather_mat(idx)

        # Scatter + emission (test_compute.glsl:118-149 + refraction ext).
        rng, new_ro, new_rd, emit, thr_factor, ray_prob = shade_bounce(
            rng, rd, hit_pos, n, mat
        )
        ro = vwhere(act, new_ro, ro)
        rd = vwhere(act, new_rd, rd)
        ret = vwhere(act, ret + emit * thr, ret)
        new_thr = thr * thr_factor / ray_prob

        # Russian roulette on the max throughput channel
        # (test_compute.glsl:153-159).
        p_rr = new_thr.max_component()
        rng, r_rr = random_float01(rng)
        rr_dead = act & (r_rr > p_rr)
        i_exit = jnp.where(rr_dead, i, i_exit)
        surv = act & ~rr_dead
        # 1/p with a guarded divide: p == 0 only on lanes the roulette just
        # killed (r > 0 >= p), but the unguarded inf would leak NaN into
        # reverse-mode through the select.
        p_pos = p_rr > 0.0
        inv_p = jnp.where(p_pos, 1.0 / jnp.where(p_pos, p_rr, 1.0), 0.0)
        thr = vwhere(surv, new_thr * inv_p, vwhere(act, new_thr, thr))

        return (rng, ro, rd, ret, thr, surv.astype(jnp.int32), i_exit), seg

    def body(i, carry):
        return body_seg(i, carry)[0]

    if collect_segments:
        carry, segs = lax.scan(
            lambda c, i: body_seg(i, c), init,
            jnp.arange(bounces + 1, dtype=jnp.int32),
        )
        _, _, _, ret, _, _, i_exit = carry
        i_exit = jnp.where(i_exit < 0, bounces + 1, i_exit)
        return ret, i_exit, segs
    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    _, _, _, ret, _, _, i_exit = lax.fori_loop(0, bounces + 1, body, init)
    # Natural loop exit leaves i == bounces + 1 in the GLSL.
    i_exit = jnp.where(i_exit < 0, bounces + 1, i_exit)
    return ret, i_exit


def normals_debug(map_fn, bounds_fn, ro, rd, pv, normal_fn=None) -> Vec3:
    """Debug mode 1: surface normals + AABB-hit tint (test_compute.glsl:170-179)."""
    checks, dbg = bounds_fn(ro, rd, pv)
    t, idx = cast_ray(map_fn, ro, rd, pv, checks)
    miss = t > FP
    if normal_fn is None:
        n = calc_normal(map_fn, ro + rd * t, pv, checks)
    else:
        n = normal_fn(map_fn, ro + rd * t, pv, checks, idx)
    shaded = (n.normalize_safe() * 0.5 + 0.5) * 0.2 + Vec3.splat(dbg)
    return vwhere(miss, Vec3.splat(dbg), shaded)


def colors_debug(map_fn, bounds_fn, gather_mat, ro, rd, pv) -> Vec3:
    """Debug mode 2: first-hit albedo (test_compute.glsl:183-195)."""
    checks, _dbg = bounds_fn(ro, rd, pv)
    _t, idx = cast_ray(map_fn, ro, rd, pv, checks)
    return gather_mat(idx).col


def render_pixels(
    spec: SceneSpec,
    params,
    xs,
    ys,
    frame,
    bounces,
    fov,
    aspect,
    *,
    width: int,
    height: int,
    debug: int,
    geometry: str = "faithful",
    normals: str = "central",
) -> Vec3:
    """Render an arbitrary block of pixels given their integer coordinates.

    The core of the renderer: the full-frame path, the Pallas megakernel and
    the shard_map tile-sharded path all reduce to this on their own coordinate
    blocks.  ``width``/``height`` are the *full* image dimensions (they seed
    the RNG and the NDC mapping); ``xs``/``ys`` may cover any sub-block.
    ``bounces`` may be a traced int32 or a Python int - pass a Python int to
    keep the bounce loop a scan (reverse-mode differentiable).

    ``geometry="baked"`` evaluates the scene through per-frame leaf-baked
    affine coefficients (render/baked.py) instead of the faithful per-tap
    transform chains - same results up to fp rounding, far fewer flops per
    map tap.  ``normals="autodiff"`` replaces the 6-tap central difference
    with the exact reverse-mode map gradient at the hit point.
    """
    if geometry == "baked":
        from .baked import bake, make_bounds_baked, make_map_baked

        bv = bake(spec, params)
        bmap = make_map_baked(spec)
        bbounds = make_bounds_baked(spec)

        def map_fn(p, _pv, checks):
            return bmap(p, bv, checks)

        def bounds_fn(ro, rd, _pv):
            return bbounds(ro, rd, bv)

    elif geometry == "faithful":
        map_fn = make_map(spec)
        bounds_fn = make_bounds(spec)
    else:
        raise ValueError("geometry must be 'faithful' or 'baked'")
    if normals == "autodiff":
        def normal_fn(map_fn_, p, pv_, checks_, _idx):
            return calc_normal_autodiff(map_fn_, p, pv_, checks_)
    elif normals == "central":
        normal_fn = None
    else:
        raise ValueError("normals must be 'central' or 'autodiff'")
    mat_table = params[jnp.asarray(material_slot_matrix(spec))]

    def gather_mat(idx):
        return gather_material(mat_table, idx)

    # Per-pixel RNG + subpixel AA jitter (test_compute.glsl:224-229).
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
        col, i_exit = path_trace(map_fn, bounds_fn, gather_mat, ro, rd, params, rng,
                                 bounces, normal_fn=normal_fn)
        if debug == 3:
            b = jnp.asarray(bounces, jnp.float32)
            col = Vec3.splat(i_exit.astype(jnp.float32) / b)
    elif debug == 1:
        col = normals_debug(map_fn, bounds_fn, ro, rd, params, normal_fn=normal_fn)
    elif debug == 2:
        col = colors_debug(map_fn, bounds_fn, gather_mat, ro, rd, params)
    else:
        col = Vec3.splat(jnp.zeros(xs.shape, jnp.float32))
    return col


@partial(jax.jit, static_argnames=("spec", "width", "height", "debug", "geometry", "normals"))
def _render_frame_impl(
    spec: SceneSpec,
    params,
    accum,
    frame,
    last_clear,
    bounces,
    fov,
    aspect,
    *,
    width: int,
    height: int,
    debug: int,
    geometry: str = "faithful",
    normals: str = "central",
):
    xs = lax.broadcasted_iota(jnp.int32, (height, width), 1)
    ys = lax.broadcasted_iota(jnp.int32, (height, width), 0)
    col = render_pixels(
        spec, params, xs, ys, frame, bounces, fov, aspect,
        width=width, height=height, debug=debug, geometry=geometry, normals=normals,
    )
    img = col.stack()
    if debug != 0:
        # Debug modes bypass accumulation (test_compute.glsl:240).
        return img
    # Progressive running mean (test_compute.glsl:242-245).
    w = 1.0 / (last_clear.astype(jnp.float32) + 1.0)
    return accum * (1.0 - w) + img * w


def render_frame(
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
    geometry: str = "faithful",
    normals: str = "central",
):
    """Render one frame; returns the (H, W, 3) linear-HDR image/accumulator.

    ``debug``: 0 path trace (accumulated), 1 normals+AABB, 2 albedo,
    3 bounce heatmap - the reference's Settings.debug slider
    (path_tracer.rs:159).
    """
    if aspect is None:
        aspect = width / height
    if accum is None:
        accum = jnp.zeros((height, width, 3), jnp.float32)
    return _render_frame_impl(
        spec,
        jnp.asarray(params, jnp.float32),
        accum,
        jnp.asarray(frame, jnp.int32),
        jnp.asarray(last_clear, jnp.int32),
        jnp.asarray(bounces, jnp.int32),
        jnp.asarray(fov, jnp.float32),
        jnp.asarray(aspect, jnp.float32),
        width=width,
        height=height,
        debug=debug,
        geometry=geometry,
        normals=normals,
    )


@partial(jax.jit, static_argnames=("spec", "width", "height", "n_frames"))
def _accumulate_impl(spec, params, bounces, fov, aspect, *, width, height, n_frames):
    accum0 = jnp.zeros((height, width, 3), jnp.float32)

    def body(f, accum):
        return _render_frame_impl(
            spec, params, accum, f, f, bounces, fov, aspect,
            width=width, height=height, debug=0,
        )

    return lax.fori_loop(0, n_frames, body, accum0)


def render_accumulated(
    spec: SceneSpec,
    params,
    n_frames: int,
    *,
    width: int = 256,
    height: int = 256,
    bounces: int = DEFAULT_BOUNCES,
    fov: float = DEFAULT_FOV,
    aspect: float = None,
):
    """Progressively accumulate ``n_frames`` frames in one compiled loop.

    Frame f uses RNG stream f and running-mean weight 1/(f+1); f = 0 fully
    overwrites the zero accumulator (the sane initialization - the reference
    mixes its first frame against stale texture memory at weight 1/2,
    path_tracer.rs:101-115).
    """
    if aspect is None:
        aspect = width / height
    return _accumulate_impl(
        spec,
        jnp.asarray(params, jnp.float32),
        jnp.asarray(bounces, jnp.int32),
        jnp.asarray(fov, jnp.float32),
        jnp.asarray(aspect, jnp.float32),
        width=width,
        height=height,
        n_frames=n_frames,
    )
