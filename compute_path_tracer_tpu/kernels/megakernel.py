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
from ..ops.camera import calc_uv, primary_ray
from ..ops.rng import gen_rng, random_float01
from ..render.baked import bake, baked_box_offsets, make_bounds_baked, make_map_baked
from ..render.reference import Mat, calc_normal, calc_normal_autodiff, shade_bounce
from ..render.scenegen import make_bounds, make_map, make_map_culled, material_slot_matrix
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
    material scalar straight from SMEM.  Only the channels the shading loop
    uses are materialized; the rest are zeros (test_compute.glsl:121-149
    reads col/brightness/light/spec/spec_col/roughness only).
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
            ior=zero,
            refract_chance=zero,
            refract_roughness=zero,
            refract_col=Vec3(zero, zero, zero),
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


def _march_while_tcull(map_culled, ro, rd, pv, checks, ivals, alive=None,
                       box_offs=None, p_margin=0.05):
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

    POSITION-BBOX culling (``box_offs`` not None, requires baked geometry):
    t-intervals are useless for secondary bounces - scattered directions make
    every live shape's [tn, tf] overlap the tile front - but the live lanes'
    POSITIONS stay clustered (a tile's primary hit points are a small surface
    patch).  Per step the live positions are reduced to a bounding box (six
    masked min/max, same cost class as the t-front) and each shape's baked
    world AABB (six SMEM scalars at ``box_offs[shape_id]``) is tested against
    it in scalar space: the per-axis gap's L-inf norm ``g_i`` lower-bounds
    every live lane's distance to the box, so a shape with ``g_i > p_margin``
    is excluded and ``g_i`` clamps the step exactly like a pending entry
    (``step = min(|d|, max(min(m - t, g), MHD))``).  The margin keeps the
    clamp from degenerating into an MHD crawl toward a nearly-touching box:
    excluded shapes sit > p_margin away, so clamped steps are >= p_margin.

    Divergence from the per-ray-guard reference semantics (test_compute.glsl
    :74-89 with the generated check[] guards): excluded shapes do not
    contribute to the |d| < MHD hit test, which can flip hit/miss for rays
    passing within MHD (1e-3) of a surface near a box boundary - an
    eps-level edge effect measured at <0.1% of pixels; everything else is
    exact because active shapes use the same fold.
    """
    t0 = ro.x * 0.0
    # Lanes already dead in the bounce loop start the march done: their
    # frozen rays must neither extend the while_loop nor widen the t-front.
    done0 = t0.astype(jnp.int32) if alive is None else (~alive).astype(jnp.int32)
    idx0 = (t0.astype(jnp.int32)) - 1

    def cond(c):
        step, _t, _idx, done_i = c
        return jnp.logical_and(step < STEPS, jnp.min(done_i) < 1)

    def body(c):
        step, t, idx, done_i = c
        done = done_i != 0
        t_hi = jnp.max(jnp.where(done, -_BIG, t))
        t_lo = jnp.min(jnp.where(done, _BIG, t))

        p = ro + rd * t
        if box_offs is not None:
            px_lo = jnp.min(jnp.where(done, _BIG, p.x))
            px_hi = jnp.max(jnp.where(done, -_BIG, p.x))
            py_lo = jnp.min(jnp.where(done, _BIG, p.y))
            py_hi = jnp.max(jnp.where(done, -_BIG, p.y))
            pz_lo = jnp.min(jnp.where(done, _BIG, p.z))
            pz_hi = jnp.max(jnp.where(done, -_BIG, p.z))

        active = []
        m = jnp.float32(_BIG)
        g = jnp.float32(_BIG)
        for si, iv in enumerate(ivals):
            if iv is None:
                active.append(None)
                continue
            any_h, tn_min, tf_max = iv
            not_reached = tn_min > t_hi
            act = any_h & ~not_reached & (tf_max >= t_lo)
            if box_offs is not None and box_offs[si] is not None:
                o = box_offs[si]
                zero = jnp.float32(0.0)
                gap = jnp.maximum(
                    jnp.maximum(
                        jnp.maximum(pv[o] - px_hi, px_lo - pv[o + 3]),
                        jnp.maximum(pv[o + 1] - py_hi, py_lo - pv[o + 4]),
                    ),
                    jnp.maximum(
                        jnp.maximum(pv[o + 2] - pz_hi, pz_lo - pv[o + 5]), zero
                    ),
                )
                near = gap <= p_margin
                act = act & near
                g = jnp.where(any_h & ~near, jnp.minimum(g, gap), g)
            active.append(act)
            m = jnp.where(any_h & not_reached, jnp.minimum(m, tn_min), m)

        d, mi = map_culled(p, pv, checks, tuple(active))
        ad = jnp.abs(d)
        step_len = jnp.minimum(ad, jnp.maximum(jnp.minimum(m - t, g), MHD))
        nt = jnp.where(done, t, t + step_len)
        nidx = jnp.where(done, idx, mi)
        far = nt > FP
        nidx = jnp.where(jnp.logical_and(~done, far), -1, nidx)
        ndone = done | (ad < MHD) | far
        return step + 1, nt, nidx, ndone.astype(jnp.int32)

    _, t, idx, _ = lax.while_loop(cond, body, (jnp.int32(0), t0, idx0, done0))
    return t, idx


def _march_while(map_fn, ro, rd, pv, checks, alive=None):
    """Sphere march with tile-uniform early exit.

    Identical lane semantics to render/reference.py:cast_ray (same masking,
    same |d| < MHD / far-plane conditions); the while_loop additionally stops
    as soon as EVERY lane in the tile is done, which is where most of the
    80-step budget is saved (sky tiles exit in a few steps).  ``alive`` marks
    lanes still live in the bounce loop: dead lanes start done so the
    early-exit fires as soon as the surviving lanes finish (their t/idx
    outputs are discarded by the caller's masks).
    """
    t0 = ro.x * 0.0
    done0 = t0.astype(jnp.int32) if alive is None else (~alive).astype(jnp.int32)
    idx0 = t0.astype(jnp.int32) - 1

    def cond(c):
        step, _t, _idx, done_i = c
        return jnp.logical_and(step < STEPS, jnp.min(done_i) < 1)

    def body(c):
        step, t, idx, done_i = c
        done = done_i != 0
        p = ro + rd * t
        d, mi = map_fn(p, pv, checks)
        ad = jnp.abs(d)  # absolute step: interior-traversable (see cast_ray)
        nt = jnp.where(done, t, t + ad)
        nidx = jnp.where(done, idx, mi)
        far = nt > FP
        nidx = jnp.where(jnp.logical_and(~done, far), -1, nidx)
        ndone = done | (ad < MHD) | far
        return step + 1, nt, nidx, ndone.astype(jnp.int32)

    _, t, idx, _ = lax.while_loop(cond, body, (jnp.int32(0), t0, idx0, done0))
    return t, idx


def _path_trace_tile(map_culled, bounds_fn, gather_mat, ro, rd, pv, rng, bounces,
                     normal_fn=calc_normal, t_cull=False, box_offs=None):
    """The bounce loop of render/reference.py:path_trace (same shading math,
    test_compute.glsl:91-166) restructured for a VMEM tile: a while_loop that
    exits once every lane is dead, with per-bounce tile-level AABB culling
    (plus per-step t-interval culling when ``t_cull``; the normal taps and
    the material fetch always use the bounce-level sets)."""
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
    )

    def cond(c):
        i, _rng, _ro, _rd, _ret, _thr, alive_i, _i_exit = c
        return jnp.logical_and(i <= bounces, jnp.max(alive_i) > 0)

    def body(c):
        i, rng, ro, rd, ret, thr, alive_i, i_exit = c
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
        if t_cull:
            ivals = _interval_scalars(checks, tns, tfs)
        anyhit = _anyhit(checks)

        def map_fn(p, pv_, checks_):
            return map_culled(p, pv_, checks_, anyhit)

        if t_cull:
            t, idx = _march_while_tcull(map_culled, ro, rd, pv, checks, ivals,
                                        alive=alive, box_offs=box_offs)
        else:
            t, idx = _march_while(map_fn, ro, rd, pv, checks, alive=alive)

        miss = t > FP
        i_exit = jnp.where(alive & miss, i, i_exit)
        act = alive & ~miss

        hit_pos = ro + rd * t
        n = normal_fn(map_fn, hit_pos, pv, checks)
        mat = gather_mat(idx)

        rng, new_ro, new_rd, emit, thr_factor, ray_prob = shade_bounce(
            rng, rd, hit_pos, n, mat
        )
        ro = vwhere(act, new_ro, ro)
        rd = vwhere(act, new_rd, rd)
        ret = vwhere(act, ret + emit * thr, ret)
        new_thr = thr * thr_factor / ray_prob

        p_rr = new_thr.max_component()
        rng, r_rr = random_float01(rng)
        rr_dead = act & (r_rr > p_rr)
        i_exit = jnp.where(rr_dead, i, i_exit)
        surv = act & ~rr_dead
        p_pos = p_rr > 0.0
        inv_p = jnp.where(p_pos, 1.0 / jnp.where(p_pos, p_rr, 1.0), 0.0)
        thr = vwhere(surv, new_thr * inv_p, vwhere(act, new_thr, thr))

        return i + 1, rng, ro, rd, ret, thr, surv.astype(jnp.int32), i_exit

    _, _, _, _, ret, _, _, i_exit = lax.while_loop(cond, body, init)
    i_exit = jnp.where(i_exit < 0, bounces + 1, i_exit)
    return ret, i_exit


def _make_kernel(spec: SceneSpec, width: int, height: int, debug: int,
                 tile_h: int, tile_w: int, sub_rows: int,
                 geometry: str = "faithful", normals: str = "central",
                 t_cull: bool = False, p_cull: bool = False):
    """Kernel body: one VMEM tile, processed as ``tile_h / sub_rows``
    independent (sub_rows, tile_w) subtiles via an in-kernel fori_loop.

    The subtile loop decouples culling/early-exit granularity from program
    granularity: per-program overhead is amortized over the whole tile while
    the AABB anyhit predicates, the march's all-done exit and the bounce
    loop's all-dead exit are evaluated per subtile (a ~1%-of-screen strip),
    where they are far sharper.  The loop is a fori (not unrolled) so the
    scene code is traced once regardless of subtile count.

    ``geometry="baked"`` reads leaf-baked affine coefficients (a second SMEM
    vector, render/baked.py) instead of re-deriving every transform chain per
    map tap; ``normals="autodiff"`` swaps the 6-tap central difference for
    reverse-mode AD of the map (~2 taps).
    """
    baked = geometry == "baked"
    if baked:
        map_culled = make_map_baked(spec)
        bounds_fn = make_bounds_baked(spec, with_t=t_cull)
    else:
        map_culled = make_map_culled(spec)
        bounds_fn = make_bounds(spec, with_t=t_cull)
    if p_cull and not (baked and t_cull):
        raise ValueError("p_cull requires geometry='baked' and t_cull=True")
    box_offs = baked_box_offsets(spec) if p_cull else None
    if normals == "autodiff":
        # Mosaic cannot yet compile the transpose of the anyhit lax.cond
        # skips, so the (~2-tap) AD normal differentiates the PLAIN per-lane
        # -guard map - same values, no conds.  The march keeps the culled map.
        map_plain = make_map_baked(spec) if baked else make_map(spec)

        def normal_fn(_map_fn, p, pv, checks):
            return calc_normal_autodiff(map_plain, p, pv, checks)
    else:
        normal_fn = calc_normal
    if tile_h % sub_rows:
        raise ValueError("tile_h must be a multiple of sub_rows")
    n_sub = tile_h // sub_rows

    def kernel(iparams_ref, fparams_ref, params_ref, *rest):
        if baked:
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

        y0 = pl.program_id(0) * tile_h
        x0 = pl.program_id(1) * tile_w
        gather_mat = _make_smem_gather_mat(spec, params_ref)

        def sub_body(st, carry):
            row = st * sub_rows
            xs = x0 + lax.broadcasted_iota(jnp.int32, (sub_rows, tile_w), 1)
            ys = y0 + row + lax.broadcasted_iota(jnp.int32, (sub_rows, tile_w), 0)

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
                    map_culled, bounds_fn, gather_mat, ro, rd, pv, rng, bounces,
                    normal_fn=normal_fn, t_cull=t_cull, box_offs=box_offs,
                )
                if debug == 3:
                    col = Vec3.splat(
                        i_exit.astype(jnp.float32) / bounces.astype(jnp.float32)
                    )
            elif debug in (1, 2):
                if t_cull:
                    checks, tns, tfs, dbg = bounds_fn(ro, rd, pv)
                    ivals = _interval_scalars(checks, tns, tfs)
                else:
                    checks, dbg = bounds_fn(ro, rd, pv)
                anyhit = _anyhit(checks)

                def map_fn(p, pv_, checks_):
                    return map_culled(p, pv_, checks_, anyhit)

                if t_cull:
                    t, idx = _march_while_tcull(map_culled, ro, rd, pv, checks,
                                                ivals, box_offs=box_offs)
                else:
                    t, idx = _march_while(map_fn, ro, rd, pv, checks)
                if debug == 1:
                    # normals + AABB tint (test_compute.glsl:170-179)
                    n = normal_fn(map_fn, ro + rd * t, pv, checks)
                    shaded = (n.normalize_safe() * 0.5 + 0.5) * 0.2 + Vec3.splat(dbg)
                    col = vwhere(t > FP, Vec3.splat(dbg), shaded)
                else:
                    # first-hit albedo (test_compute.glsl:183-195)
                    col = gather_mat(idx).col
            else:
                col = Vec3.splat(jnp.zeros((sub_rows, tile_w), jnp.float32))

            rows = pl.ds(row, sub_rows)
            if debug != 0:
                out_ref[0, rows, :] = col.x
                out_ref[1, rows, :] = col.y
                out_ref[2, rows, :] = col.z
            else:
                # Progressive running mean (test_compute.glsl:242-245).
                w = 1.0 / (last_clear.astype(jnp.float32) + 1.0)
                out_ref[0, rows, :] = accum_ref[0, rows, :] * (1.0 - w) + col.x * w
                out_ref[1, rows, :] = accum_ref[1, rows, :] * (1.0 - w) + col.y * w
                out_ref[2, rows, :] = accum_ref[2, rows, :] * (1.0 - w) + col.z * w
            return carry

        lax.fori_loop(0, n_sub, sub_body, 0)

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "spec", "width", "height", "debug", "tile_h", "tile_w", "sub_rows",
        "geometry", "normals", "t_cull", "p_cull", "interpret",
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
    *,
    width: int,
    height: int,
    debug: int,
    tile_h: int,
    tile_w: int,
    sub_rows: int = None,
    geometry: str = "faithful",
    normals: str = "central",
    t_cull: bool = False,
    p_cull: bool = False,
    interpret: bool = False,
):
    ph, pw = accum_planes.shape[1], accum_planes.shape[2]
    if sub_rows is None:
        sub_rows = tile_h
    grid = (ph // tile_h, pw // tile_w)
    iparams = jnp.stack(
        [
            jnp.asarray(frame, jnp.int32),
            jnp.asarray(last_clear, jnp.int32),
            jnp.asarray(bounces, jnp.int32),
        ]
    )
    fparams = jnp.stack(
        [jnp.asarray(fov, jnp.float32), jnp.asarray(aspect, jnp.float32)]
    )

    kernel = _make_kernel(spec, width, height, debug, tile_h, tile_w, sub_rows,
                          geometry, normals, t_cull, p_cull)
    tile_spec = pl.BlockSpec(
        (3, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    inputs = [iparams, fparams, params]
    in_specs = [smem, smem, smem]
    if geometry == "baked":
        # The per-frame bake: a tiny scalar XLA graph outside the kernel,
        # differentiable params -> bv, negligible next to one tile's work.
        inputs.append(bake(spec, params))
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
    sub_rows: int = None,
    geometry: str = "faithful",
    normals: str = "central",
    t_cull: bool = False,
    p_cull: bool = False,
    interpret: bool = False,
):
    """Drop-in replacement for render/reference.py:render_frame running the
    Pallas megakernel.  Same (H, W, 3) accumulator interface; the image is
    padded up to tile multiples internally and cropped on return.

    ``sub_rows`` subdivides each tile into (sub_rows, tile_w) subtiles for
    sharper culling/early-exit granularity; measured SLOWER on v5e (narrow
    vector work starves the VPU pipeline), so the default is one monolithic
    subtile per tile.
    """
    if aspect is None:
        aspect = width / height
    th, tw = tile
    th = min(th, -(-height // 8) * 8) if height < th else th
    tw = min(tw, max(128, tw)) if width < tw else tw
    sub = th if sub_rows is None else min(sub_rows, th)
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
        sub_rows=sub,
        geometry=geometry,
        normals=normals,
        t_cull=t_cull,
        p_cull=p_cull,
        interpret=interpret,
    )
    return jnp.transpose(out[:, :height, :width], (1, 2, 0))


@partial(
    jax.jit,
    static_argnames=("spec", "width", "height", "n_frames", "tile_h", "tile_w",
                     "geometry", "normals", "t_cull", "p_cull", "interpret"),
)
def _accumulate_pallas_impl(
    spec, params, bounces, fov, aspect,
    *, width, height, n_frames, tile_h, tile_w,
    geometry="faithful", normals="central", t_cull=False, p_cull=False,
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
            geometry=geometry, normals=normals, t_cull=t_cull, p_cull=p_cull,
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
    p_cull: bool = False,
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
        p_cull=p_cull,
        interpret=interpret,
    )
