"""QUARANTINED (round 3): experimental wavefront backend, frozen in round
2 - the compaction glue costs more than ray-decay saves and binning cannot
close the gap (ROADMAP).  Moved out of the package per the keep-or-kill
rule; kept under benchmarks/ for reference.  Run standalone with the repo
root on sys.path.

Wavefront path tracer: bounce-synchronous rendering with ray compaction.

The second TPU-native re-architecture of the reference's per-pixel megakernel
(reference: assets/shaders/path_tracer/test_compute.glsl:91-166).  The tile
megakernel (megakernel.py) wastes lanes on dead rays: once a ray misses or
loses the Russian roulette, its lane still rides every remaining bounce of
its tile.  Here the bounce loop is hoisted to XLA level and between bounces
the alive rays are **compacted** to the front of a flat ray buffer
(cumsum + scatter); the per-bounce Pallas kernel reads the alive count from
SMEM and whole blocks beyond it skip via ``pl.when`` - so the work per
bounce is proportional to the number of rays still alive, which decays
geometrically.

Exactness: outputs are identical to the megakernel/oracle. Per-ray uint32
RNG state travels with the ray, so compaction order cannot change any
sample; each pixel has exactly one ray, so the per-bounce radiance
scatter-add has a single contribution per pixel and no reassociation.

``bounces`` is static here (the XLA loop is unrolled); the bounce budget is
a Settings slider with range <= 32 (path_tracer.rs:159).

STATUS: EXPERIMENTAL / FROZEN (round-2 decision).  Measured on v5e at
1080p/64-prim/8-bounce: 2.13 s/frame vs 0.29 s for the megakernel; the
XLA compaction glue costs ~190 ms/bounce and per-bounce ray sorting to
restore direction coherence costs more than it saves (jnp.argsort over 2M
keys ~1 s/frame).  Round-2 diagnostics (benchmarks/diagnose.py) showed the
megakernel's bounce-liveness masking + envelope culling already capture most
of the decay this design targets, and its map work runs near the VPU's
dependent-chain rate - a counting-sort binning pass cannot close a 7x glue
gap.  Kept as a correct, tested alternative architecture; not on the
perf roadmap.  (ROADMAP.md "Wavefront findings".)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from compute_path_tracer_tpu.constants import DEFAULT_BOUNCES, DEFAULT_FOV, FP
from compute_path_tracer_tpu.ops.camera import calc_uv, primary_ray
from compute_path_tracer_tpu.ops.rng import gen_rng, random_float01
from compute_path_tracer_tpu.render.reference import calc_normal, shade_bounce
from compute_path_tracer_tpu.render.scenegen import make_bounds, make_map_culled
from compute_path_tracer_tpu.scene.compile import SceneSpec
from compute_path_tracer_tpu.vecmath import Vec3, vwhere
from compute_path_tracer_tpu.kernels.megakernel import _anyhit, _final_idx, _make_smem_gather_mat, _march_while

# Ray-block geometry: each grid program owns (BLOCK_ROWS, 128) rays of the
# flat (M, 128) ray buffer.
LANES = 128
BLOCK_ROWS = 32


def _make_bounce_kernel(spec: SceneSpec):
    """One bounce for a block of compacted rays.

    Inputs:  k (SMEM alive count), params (SMEM), ray SoA refs
             (ro*3, rd*3, thr*3, rng) as (BLOCK_ROWS, 128) blocks.
    Outputs: updated ray SoA, radiance contribution add*3, alive mask.
    Blocks fully beyond the alive count skip all scene work.
    """
    map_culled = make_map_culled(spec)
    bounds_fn = make_bounds(spec)

    def kernel(k_ref, params_ref,
               rox, roy, roz, rdx, rdy, rdz, thr_r, thr_g, thr_b, rng_ref,
               o_rox, o_roy, o_roz, o_rdx, o_rdy, o_rdz,
               o_thr_r, o_thr_g, o_thr_b, o_rng,
               o_add_r, o_add_g, o_add_b, o_alive):
        k = k_ref[0]
        pv = params_ref
        block_base = pl.program_id(0) * BLOCK_ROWS * LANES

        @pl.when(block_base >= k)
        def _skip():
            zero = jnp.zeros((BLOCK_ROWS, LANES), jnp.float32)
            o_add_r[:] = zero
            o_add_g[:] = zero
            o_add_b[:] = zero
            o_alive[:] = zero.astype(jnp.int32)
            # Ray state for dead blocks is never read again (compaction drops
            # it), but the buffers must be written: passthrough.
            o_rox[:] = rox[:]
            o_roy[:] = roy[:]
            o_roz[:] = roz[:]
            o_rdx[:] = rdx[:]
            o_rdy[:] = rdy[:]
            o_rdz[:] = rdz[:]
            o_thr_r[:] = thr_r[:]
            o_thr_g[:] = thr_g[:]
            o_thr_b[:] = thr_b[:]
            o_rng[:] = rng_ref[:]

        @pl.when(block_base < k)
        def _work():
            lane = block_base + (
                lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 0) * LANES
                + lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 1)
            )
            act = lane < k  # compacted: every lane below k is alive

            ro = Vec3(rox[:], roy[:], roz[:])
            rd = Vec3(rdx[:], rdy[:], rdz[:])
            thr = Vec3(thr_r[:], thr_g[:], thr_b[:])
            rng = rng_ref[:]

            checks, _dbg = bounds_fn(ro, rd, pv)
            anyhit = _anyhit(checks)

            def map_fn(p, pv_, checks_):
                return map_culled(p, pv_, checks_, anyhit)

            def map_d_culled(p, pv_, checks_, acts):
                return map_culled(p, pv_, checks_, acts)[0]

            t, tp = _march_while(map_d_culled, ro, rd, pv, checks, anyhit)
            idx = _final_idx(map_culled, ro, rd, pv, checks, anyhit, t, tp)

            # Shading: one iteration of the reference bounce loop
            # (test_compute.glsl:103-159), masked by `act`.
            miss = t > FP
            act2 = act & ~miss

            hit_pos = ro + rd * t
            n = calc_normal(map_fn, hit_pos, pv, checks)
            gather_mat = _make_smem_gather_mat(spec, pv)
            mat = gather_mat(idx)

            rng, new_ro, new_rd, emit, thr_factor, ray_prob = shade_bounce(
                rng, rd, hit_pos, n, mat
            )
            add = emit * thr
            new_thr = thr * thr_factor / ray_prob

            p_rr = new_thr.max_component()
            rng, r_rr = random_float01(rng)
            surv = act2 & (r_rr <= p_rr)
            p_pos = p_rr > 0.0
            inv_p = jnp.where(p_pos, 1.0 / jnp.where(p_pos, p_rr, 1.0), 0.0)
            out_thr = vwhere(surv, new_thr * inv_p, thr)

            zero = jnp.zeros((BLOCK_ROWS, LANES), jnp.float32)
            o_add_r[:] = jnp.where(act2, add.x, zero)
            o_add_g[:] = jnp.where(act2, add.y, zero)
            o_add_b[:] = jnp.where(act2, add.z, zero)
            o_alive[:] = surv.astype(jnp.int32)

            o_rox[:] = jnp.where(act2, new_ro.x, rox[:])
            o_roy[:] = jnp.where(act2, new_ro.y, roy[:])
            o_roz[:] = jnp.where(act2, new_ro.z, roz[:])
            o_rdx[:] = jnp.where(act2, new_rd.x, rdx[:])
            o_rdy[:] = jnp.where(act2, new_rd.y, rdy[:])
            o_rdz[:] = jnp.where(act2, new_rd.z, rdz[:])
            o_thr_r[:] = out_thr.x
            o_thr_g[:] = out_thr.y
            o_thr_b[:] = out_thr.z
            o_rng[:] = rng

    return kernel


def _bounce_call(spec, k, params, rays, interpret):
    """Invoke the bounce kernel over the full (M, 128) ray buffer."""
    m = rays[0].shape[0]
    grid = (m // BLOCK_ROWS,)
    bspec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((m, LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((m, LANES), jnp.int32)
    u32 = jax.ShapeDtypeStruct((m, LANES), jnp.uint32)
    outs = pl.pallas_call(
        _make_bounce_kernel(spec),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + [bspec] * 10,
        out_specs=tuple([bspec] * 14),
        out_shape=(
            f32, f32, f32,  # ro
            f32, f32, f32,  # rd
            f32, f32, f32,  # thr
            u32,            # rng
            f32, f32, f32,  # add
            i32,            # alive
        ),
        interpret=interpret,
    )(k, params, *rays)
    return outs


@partial(
    jax.jit,
    static_argnames=("spec", "width", "height", "bounces", "interpret", "sort_rays"),
)
def _wavefront_trace(
    spec: SceneSpec,
    params,
    frame,
    fov,
    aspect,
    *,
    width: int,
    height: int,
    bounces: int,
    interpret: bool = False,
    sort_rays: bool = False,
):
    """Path-trace one frame; returns the flat (n_pix, 3) radiance image."""
    n_pix = width * height
    # Tile-major ray order: each kernel block (BLOCK_ROWS*LANES = 4096 rays)
    # is a square 64x64 screen tile, so bounce-0 blocks have the same AABB-
    # culling locality as the tile megakernel (a flat pixel order would make
    # every block a 2-row stripe across the full width and defeat culling).
    ts = 64
    ph = -(-height // ts) * ts
    pw = -(-width // ts) * ts
    n = ph * pw
    m = n // LANES
    perm = (
        np.arange(n, dtype=np.int32)
        .reshape(ph // ts, ts, pw // ts, ts)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    xs_pad = jnp.asarray(perm % pw, jnp.int32)
    ys_pad = jnp.asarray(perm // pw, jnp.int32)
    valid0 = (xs_pad < width) & (ys_pad < height)
    xs = jnp.where(valid0, xs_pad, 0)
    ys = jnp.where(valid0, ys_pad, 0)
    pix = ys * width + xs  # flat pixel id in IMAGE order
    rng = gen_rng(xs, ys, frame, width, height)
    rng, jx = random_float01(rng)
    rng, jy = random_float01(rng)
    u, v = calc_uv(
        xs.astype(jnp.float32) + (jx - 0.5),
        ys.astype(jnp.float32) + (jy - 0.5),
        width, height, aspect,
    )
    ro, rd = primary_ray(u, v, fov)

    def reshape2(a):
        return a.reshape(m, LANES)

    rays = [
        reshape2(ro.x), reshape2(ro.y), reshape2(ro.z),
        reshape2(rd.x), reshape2(rd.y), reshape2(rd.z),
        reshape2(jnp.ones(n, jnp.float32)),
        reshape2(jnp.ones(n, jnp.float32)),
        reshape2(jnp.ones(n, jnp.float32)),
        reshape2(rng),
    ]
    pixel_id = pix  # identity before the first compaction
    # Padding lanes start dead: compact them away up front so k0 = n_pix.
    alive = valid0
    image = jnp.zeros((n_pix, 3), jnp.float32)

    def compact(rays, pixel_id, alive):
        """Scatter alive rays to the front of the buffer (order-preserving)."""
        k = jnp.sum(alive.astype(jnp.int32))
        pos = jnp.cumsum(alive.astype(jnp.int32)) - 1
        dest = jnp.where(alive, pos, n)  # out-of-range -> dropped
        def scat(a):
            flat = a.reshape(n)
            return jnp.zeros(n, flat.dtype).at[dest].set(flat, mode="drop").reshape(m, LANES)
        new_rays = [scat(a) for a in rays]
        new_pix = jnp.zeros(n, jnp.int32).at[dest].set(pixel_id, mode="drop")
        return new_rays, new_pix, k

    def compact_sorted(rays, pixel_id, alive):
        """Compact AND re-sort alive rays by (direction octant, origin cell).

        Secondary-bounce rays scattered from one screen tile diverge in every
        direction, which defeats per-block AABB culling; binning by octant +
        coarse spatial cell restores intra-block coherence.  Exactness is
        unaffected: RNG state rides with the ray and each pixel still owns
        exactly one ray.
        """
        rox_, roy_, roz_ = (rays[i].reshape(n) for i in range(3))
        rdx_, rdy_, rdz_ = (rays[i].reshape(n) for i in range(3, 6))
        octant = (
            (rdx_ > 0).astype(jnp.int32)
            + 2 * (rdy_ > 0).astype(jnp.int32)
            + 4 * (rdz_ > 0).astype(jnp.int32)
        )

        def cell1(a):
            return jnp.clip(((a + 16.0) * (8.0 / 32.0)).astype(jnp.int32), 0, 7)

        cell = (cell1(rox_) * 8 + cell1(roy_)) * 8 + cell1(roz_)
        key = jnp.where(alive, octant * 512 + cell, jnp.int32(2**30))
        order = jnp.argsort(key)
        k = jnp.sum(alive.astype(jnp.int32))
        new_rays = [a.reshape(n)[order].reshape(m, LANES) for a in rays]
        return new_rays, pixel_id[order], k

    rays, pixel_id, k = compact(rays, pixel_id, alive)

    for _b in range(bounces + 1):
        outs = _bounce_call(spec, k.reshape(1), jnp.asarray(params, jnp.float32),
                            rays, interpret)
        new_rays = list(outs[:10])
        add_r, add_g, add_b, alive_i = outs[10], outs[11], outs[12], outs[13]
        add = jnp.stack(
            [add_r.reshape(n), add_g.reshape(n), add_b.reshape(n)], axis=-1
        )
        image = image.at[jnp.minimum(pixel_id, n_pix - 1)].add(
            jnp.where((jnp.arange(n) < k)[:, None], add, 0.0)
        )
        alive = alive_i.reshape(n) != 0
        if sort_rays:
            rays, pixel_id, k = compact_sorted(new_rays, pixel_id, alive)
        else:
            rays, pixel_id, k = compact(new_rays, pixel_id, alive)

    return image


def render_frame_wavefront(
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
    interpret: bool = False,
    sort_rays: bool = False,
):
    """Drop-in frame renderer using the wavefront backend (debug 0/3 not
    distinguished: 0 only; other debug modes route to the tile megakernel,
    which is single-march anyway)."""
    if aspect is None:
        aspect = width / height
    if debug != 0:
        from compute_path_tracer_tpu.kernels.megakernel import render_frame_pallas

        return render_frame_pallas(
            spec, params, accum, frame, last_clear, width=width, height=height,
            debug=debug, bounces=bounces, fov=fov, aspect=aspect,
            interpret=interpret,
        )
    flat = _wavefront_trace(
        spec, jnp.asarray(params, jnp.float32), jnp.asarray(frame, jnp.int32),
        jnp.asarray(fov, jnp.float32), jnp.asarray(aspect, jnp.float32),
        width=width, height=height, bounces=int(bounces), interpret=interpret,
        sort_rays=sort_rays,
    )
    img = flat.reshape(height, width, 3)
    if accum is None:
        accum = jnp.zeros((height, width, 3), jnp.float32)
    w = 1.0 / (jnp.asarray(last_clear, jnp.float32) + 1.0)
    return accum * (1.0 - w) + img * w
