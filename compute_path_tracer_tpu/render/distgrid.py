"""Baked coarse lower-bound distance grid: the TPU-native spatial
acceleration structure (round-5 headline lever).

The reference cuts per-ray map cost with per-shape AABB ray tests baked
into the generated shader (``bounds()`` + ``check[]`` guards,
shader_out/test_compute.glsl:185-245, aabb.glsl:21-29).  That idea is
per-RAY and cull-only; on TPU the measured residual cost is per-TAP: even
with tile-uniform t-interval culling the benchmark scene evaluates ~12
shapes per map tap, ~759 shape evals per ray (BENCH_r04.json).  This
module generalizes the reference's idea to per-TAP spatial culling: a
per-frame-baked 3D grid of conservative lower bounds on the scene map,
sampled per lane with Mosaic's dynamic gather (measured 1.25-1.29
ns/lane-tap for 128-512-entry tables, benchmarks/artifacts/
gather_probe_r05.jsonl).  Far from every surface a lane advances by the
grid bound WITHOUT evaluating the exact map; the exact (culled) map runs
only for lanes within ``tau`` of a surface.

Safety argument (why the bound never tunnels, for ANY per-ray ``check[]``
configuration and ANY CSG tree):

* every leaf SDF this framework bakes (sphere, plane, cube, octahedron -
  render/baked.py:_leaf_distance) is 1-Lipschitz in world space (uniform
  scales make the baked leaf frames orthonormal, and distances are
  un-scaled at bake time);
* every fold value is bounded below by the min of the leaf distances that
  ever enter it: ``opUnion`` IS the min; ``opSubtraction(acc, d) =
  max(-acc, d) >= d >= min(acc, d)``; a smooth union can dip at most
  ``k/4`` below the min of its inputs (the ``-k*h*(1-h)`` term), so
  subtracting ``sum(k/4)`` over every smooth node bounds the whole tree;
* culling a shape (per-ray ``check[]`` false, or a fully-culled union
  folding to its ``empty`` value) only ever REMOVES a term from a
  min-like fold or replaces it with a large sentinel - the min over ALL
  leaves still bounds the result from below;
* therefore ``field(x) = min over all leaves of leaf_distance(x)`` minus
  the smooth penalty lower-bounds the map a ray marches on, everywhere,
  for every ray; and by 1-Lipschitz continuity ``min(field at the 8 cell
  corners) - half_cell_diagonal`` lower-bounds it anywhere inside the
  cell.

Outside the grid's bounding box the fallback bound is the euclidean
distance to the box (every BOUNDED leaf's geometry is contained in the
box by construction - supports computed from the baked coefficients, not
the user's exaggeration-scaled AABBs) combined with the exact distances
of the unbounded (plane) leaves.

Divergence contract (same eps discipline as the megakernel's ``t_cull``):
all hits fire on exact taps and a cheap advance can never cross a surface
(it advances by a proven lower bound of the marched map), but the TAP
SEQUENCE differs from the reference's 80x map schedule, so the sub-MHD
landing position and the step-budget accounting shift at eps level.  The
march counts EXACT taps against the STEPS budget (cheap advances are
free; a global iteration cap bounds them).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..scene.compile import SceneSpec
from ..scene.model import KIND_CUBE, KIND_OCTAHEDRON, KIND_PLANE, KIND_SPHERE
from ..vecmath import Vec3
from .baked import _leaf_distance, baked_layout, baked_shapes_in_order

DEFAULT_RES = (16, 16, 16)
META_SLOTS = 9  # lo.xyz, inv_cell.xyz, hi.xyz
_BBOX_MARGIN = 1e-3


@lru_cache(maxsize=None)
def _grid_static(spec: SceneSpec):
    """Static split of the leaf list: (bounded leaves, plane leaves,
    smooth-union k slot offsets)."""
    layout = baked_layout(spec)
    shapes = baked_shapes_in_order(spec)
    bounded = tuple(bs for bs in shapes if bs.kind != KIND_PLANE)
    planes = tuple(bs for bs in shapes if bs.kind == KIND_PLANE)
    k_offs = []

    def walk(bu):
        if bu.k_off >= 0:
            k_offs.append(bu.k_off)
        for cu in bu.children_unions:
            walk(cu)

    for root in layout.roots:
        walk(root)
    return bounded, planes, tuple(k_offs)


def grid_eligible(spec: SceneSpec) -> bool:
    """A scene can carry a distance grid iff it has at least one bounded
    leaf (otherwise there is no box to grid; an all-plane scene marches
    on exact closed forms anyway)."""
    bounded, _planes, _k = _grid_static(spec)
    return len(bounded) > 0


def _leaf_support(bs, bv):
    """World-space (lo, hi) of a bounded leaf, from its baked coefficients.

    Cube/octahedron leaf frames are orthonormal (uniform scales), so the
    support of ``|q_i| <= b_i`` under ``p = Mw^T (q - bw)`` is the center
    ``-Mw^T bw`` plus per-axis absolute row sums of ``Mw^T`` scaled by
    ``b`` (octahedron: its L1 ball lies inside the L2 ball of radius s)."""
    o = bs.off
    if bs.kind == KIND_SPHERE:
        c = jnp.stack([bv[o], bv[o + 1], bv[o + 2]])
        r = bv[o + 3]
        return c - r, c + r
    M = [bv[o + i] for i in range(9)]
    bw = [bv[o + 9], bv[o + 10], bv[o + 11]]
    cx = -(M[0] * bw[0] + M[3] * bw[1] + M[6] * bw[2])
    cy = -(M[1] * bw[0] + M[4] * bw[1] + M[7] * bw[2])
    cz = -(M[2] * bw[0] + M[5] * bw[1] + M[8] * bw[2])
    c = jnp.stack([cx, cy, cz])
    if bs.kind == KIND_CUBE:
        b = [bv[o + 12], bv[o + 13], bv[o + 14]]
        hx = jnp.abs(M[0]) * b[0] + jnp.abs(M[3]) * b[1] + jnp.abs(M[6]) * b[2]
        hy = jnp.abs(M[1]) * b[0] + jnp.abs(M[4]) * b[1] + jnp.abs(M[7]) * b[2]
        hz = jnp.abs(M[2]) * b[0] + jnp.abs(M[5]) * b[1] + jnp.abs(M[8]) * b[2]
        h = jnp.stack([hx, hy, hz])
    else:  # octahedron: L1 ball radius s fits in the L2 ball radius s
        h = jnp.stack([bv[o + 12]] * 3)
    return c - h, c + h


def n_chunks(res) -> int:
    gx, gy, gz = res
    return -(-(gx * gy * gz) // 128)


def bake_dist_grid(spec: SceneSpec, bv, res=DEFAULT_RES):
    """Bake ``(meta f32[9], chunks f32[n_chunks, 128])`` from the baked
    geometry vector.  A pure XLA graph (~(G+1)^3 x n_leaves leaf evals per
    frame, negligible next to one frame); the result is stop_gradient'ed -
    the grid is a conservative BOUND, parameter gradients flow through the
    exact taps it gates.
    """
    bounded, _planes, _k_offs = _grid_static(spec)
    if not bounded:
        raise ValueError("dist_grid requires at least one bounded leaf")
    gx, gy, gz = res
    shapes = baked_shapes_in_order(spec)

    lo = jnp.full((3,), jnp.inf, jnp.float32)
    hi = jnp.full((3,), -jnp.inf, jnp.float32)
    for bs in bounded:
        slo, shi = _leaf_support(bs, bv)
        lo = jnp.minimum(lo, slo)
        hi = jnp.maximum(hi, shi)
    lo = lo - _BBOX_MARGIN
    hi = hi + _BBOX_MARGIN
    cell = (hi - lo) / jnp.asarray([gx, gy, gz], jnp.float32)
    half_diag = 0.5 * jnp.sqrt(jnp.sum(cell * cell))

    # Corner lattice (gz+1, gy+1, gx+1), evaluated through every leaf
    # (planes included: inside the box their distance is part of the bound).
    zs = lo[2] + cell[2] * jnp.arange(gz + 1, dtype=jnp.float32)
    ys = lo[1] + cell[1] * jnp.arange(gy + 1, dtype=jnp.float32)
    xs = lo[0] + cell[0] * jnp.arange(gx + 1, dtype=jnp.float32)
    pz, py, px = jnp.meshgrid(zs, ys, xs, indexing="ij")
    p = Vec3(px, py, pz)
    field = jnp.full(px.shape, jnp.inf, jnp.float32)
    for bs in shapes:
        field = jnp.minimum(field, _leaf_distance(bs, p, bv))

    # Per-cell bound: min of the 8 corners, minus the half diagonal.
    m = jnp.minimum(field[:-1], field[1:])
    m = jnp.minimum(m[:, :-1], m[:, 1:])
    m = jnp.minimum(m[:, :, :-1], m[:, :, 1:])
    bound = jnp.maximum(m - half_diag, 0.0)

    flat = bound.reshape(-1)  # flat idx = (iz*gy + iy)*gx + ix
    nc = n_chunks(res)
    pad = nc * 128 - flat.shape[0]
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.float32)])
    chunks = flat.reshape(nc, 128)
    inv_cell = 1.0 / cell
    meta = jnp.concatenate([lo, inv_cell, hi])
    return jax.lax.stop_gradient(meta), jax.lax.stop_gradient(chunks)


def make_grid_tap(spec: SceneSpec, res=DEFAULT_RES):
    """Build ``tap(p, read_meta, read_chunk, bv) -> g``: the per-lane cheap
    lower bound.  ``read_meta(i)`` returns meta scalar i; ``read_chunk(k)``
    returns chunk k as a row broadcastable against ``p.x`` - the
    indirections let the same closure run inside a Pallas kernel (SMEM/VMEM
    refs) and in plain XLA (arrays, for the oracle-side tests)."""
    gx, gy, gz = res
    nc = n_chunks(res)
    _bounded, planes, k_offs = _grid_static(spec)

    def tap(p: Vec3, read_meta, read_chunk, bv, gather=None):
        shape = p.x.shape
        lox, loy, loz = read_meta(0), read_meta(1), read_meta(2)
        ivx, ivy, ivz = read_meta(3), read_meta(4), read_meta(5)
        hix, hiy, hiz = read_meta(6), read_meta(7), read_meta(8)

        fx = (p.x - lox) * ivx
        fy = (p.y - loy) * ivy
        fz = (p.z - loz) * ivz
        ix = jnp.clip(jnp.floor(fx), 0.0, gx - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.floor(fy), 0.0, gy - 1).astype(jnp.int32)
        iz = jnp.clip(jnp.floor(fz), 0.0, gz - 1).astype(jnp.int32)
        flat = (iz * gy + iy) * gx + ix
        if gather is not None:
            g = gather(flat)
        else:
            lo7 = flat & 127
            hi7 = flat >> 7
            g = jnp.take_along_axis(
                jnp.broadcast_to(read_chunk(0), shape), lo7, axis=-1
            )
            for k in range(1, nc):
                gk = jnp.take_along_axis(
                    jnp.broadcast_to(read_chunk(k), shape), lo7, axis=-1
                )
                g = jnp.where(hi7 == k, gk, g)

        inside = (
            (p.x >= lox) & (p.x <= hix)
            & (p.y >= loy) & (p.y <= hiy)
            & (p.z >= loz) & (p.z <= hiz)
        )
        # Outside fallback: euclidean distance to the grid box (contains
        # every bounded leaf), min'ed with the exact plane distances.
        qx = jnp.maximum(jnp.maximum(lox - p.x, p.x - hix), 0.0)
        qy = jnp.maximum(jnp.maximum(loy - p.y, p.y - hiy), 0.0)
        qz = jnp.maximum(jnp.maximum(loz - p.z, p.z - hiz), 0.0)
        db = jnp.sqrt(qx * qx + qy * qy + qz * qz)
        for bs in planes:
            o = bs.off
            dpl = bv[o] * p.x + bv[o + 1] * p.y + bv[o + 2] * p.z + bv[o + 3]
            db = jnp.minimum(db, dpl)
        g = jnp.where(inside, g, db)

        for ko in k_offs:  # smooth-union dip, sum of k/4 over smooth nodes
            g = g - 0.25 * bv[ko]
        return g

    return tap


def cheap_bound_xla(spec: SceneSpec, bv, p: Vec3, res=DEFAULT_RES):
    """The grid tap evaluated in plain XLA (tests / oracle side): bakes the
    grid and applies :func:`make_grid_tap` to array inputs."""
    meta, chunks = bake_dist_grid(spec, bv, res)
    tap = make_grid_tap(spec, res)
    flatb = chunks.reshape(-1)
    return tap(
        p,
        lambda i: meta[i],
        None,
        bv,
        gather=lambda flat: jnp.take(flatb, flat),
    )
