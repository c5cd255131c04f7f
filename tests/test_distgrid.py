"""Baked lower-bound distance grid (render/distgrid.py, round 5).

The grid is the TPU-native generalization of the reference's AABB culling
(shader_out/test_compute.glsl:185-245): a conservative per-cell lower
bound on the marched map, gathered per lane.  These tests pin

* the SAFETY property every cheap advance relies on: wherever the bound
  is at or above the exact-tap threshold ``tau``, it never exceeds the
  per-ray map - for any check[] configuration (all-true is the hardest:
  culling only raises min-like folds) and for every CSG op including
  subtraction and smooth union (the ``sum(k/4)`` dip bound);
* the outside-bbox fallback (euclidean distance to the grid box min'ed
  with exact plane distances);
* eligibility gating and interpret-mode image agreement of the
  ``dist_grid=True`` megakernel path at the documented eps class.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from compute_path_tracer_tpu.kernels.megakernel import (
    GRID_TAU,
    render_frame_pallas,
)
from compute_path_tracer_tpu.render.baked import bake, make_map_baked_d
from compute_path_tracer_tpu.render.distgrid import (
    bake_dist_grid,
    cheap_bound_xla,
    grid_eligible,
)
from compute_path_tracer_tpu.scene.compile import compile_scene
from compute_path_tracer_tpu.scene.library import (
    benchmark_scene,
    blend_demo,
    csg_demo,
    edge_demo,
)
from compute_path_tracer_tpu.scene.model import Scene, Shape, Union
from compute_path_tracer_tpu.vecmath import Vec3


def _bound_and_map(scene, n=128, lo=-20.0, hi=20.0, seed=0):
    cs = compile_scene(scene)
    spec, params = cs.spec, cs.params
    bv = bake(spec, jnp.asarray(params, jnp.float32))
    pts = np.random.default_rng(seed).uniform(lo, hi, (n, 128, 3))
    p = Vec3(*(jnp.asarray(pts[..., i], jnp.float32) for i in range(3)))
    checks = tuple(jnp.full(p.x.shape, True) for _ in range(spec.n_shapes))
    d = np.asarray(make_map_baked_d(spec)(p, bv, checks, None))
    g = np.asarray(cheap_bound_xla(spec, bv, p))
    return g, d


@pytest.mark.parametrize(
    "scene_fn", [lambda: benchmark_scene(16), csg_demo, blend_demo, edge_demo]
)
def test_bound_never_unsafe(scene_fn):
    """Wherever a lane would advance cheaply (g >= tau), the bound must
    not exceed the map it stands in for - subtraction carving, smooth
    dips, clamped-interior cells and the bbox fallback included."""
    g, d = _bound_and_map(scene_fn())
    unsafe = (g >= GRID_TAU) & (g > d + 1e-5)
    assert int(unsafe.sum()) == 0


def test_bound_useful_in_free_space():
    """The grid must actually fire: over uniform space around the
    benchmark scene a large fraction of points should clear tau."""
    g, _d = _bound_and_map(benchmark_scene(16))
    assert float((g >= GRID_TAU).mean()) > 0.25


def test_outside_bbox_fallback_is_box_distance():
    """Far outside the grid bbox (and away from planes) the bound equals
    the euclidean distance to the box, minus nothing."""
    scene = edge_demo()  # single bounded sphere, no planes
    cs = compile_scene(scene)
    spec, params = cs.spec, cs.params
    bv = bake(spec, jnp.asarray(params, jnp.float32))
    meta, _chunks = bake_dist_grid(spec, bv)
    lo, hi = np.asarray(meta[:3]), np.asarray(meta[6:9])
    p = Vec3(jnp.asarray([[hi[0] + 5.0]]), jnp.asarray([[hi[1] + 0.0]]),
             jnp.asarray([[lo[2] - 2.0]]))
    g = float(cheap_bound_xla(spec, bv, p)[0, 0])
    want = float(np.hypot(5.0, 2.0))
    assert abs(g - want) < 1e-4


def test_grid_eligibility():
    root = Union(name="R")
    p = root.add_shape(Shape(2, name="P"))  # plane only: nothing to grid
    p.transform.aabb = False
    plane_only = Scene([root])
    assert not grid_eligible(compile_scene(plane_only).spec)
    assert grid_eligible(compile_scene(edge_demo()).spec)
    with pytest.raises(ValueError):
        cs = compile_scene(plane_only)
        bv = bake(cs.spec, jnp.asarray(cs.params, jnp.float32))
        bake_dist_grid(cs.spec, bv)


def test_dist_grid_requires_baked_tcull():
    cs = compile_scene(edge_demo())
    with pytest.raises(ValueError):
        render_frame_pallas(cs.spec, cs.params, width=128, height=8,
                            dist_grid=True, interpret=True)


@pytest.mark.slow
def test_dist_grid_image_agreement_interpret():
    """Megakernel dist_grid path vs the faithful t_cull path, interpret
    mode: agreement at the documented eps class (sub-MHD landing shifts
    flip isolated MC paths; the bulk of the image is identical)."""
    cs = compile_scene(benchmark_scene(16))
    spec, params = cs.spec, cs.params
    kw = dict(width=128, height=64, bounces=3, geometry="baked",
              t_cull=True, interpret=True)
    f = np.asarray(render_frame_pallas(spec, params, **kw))
    g = np.asarray(render_frame_pallas(spec, params, dist_grid=True, **kw))
    diff = np.abs(f - g).max(axis=-1)
    assert float((diff > 1e-2).mean()) < 5e-3


@pytest.mark.slow
def test_dist_grid_csg_agreement_interpret():
    """Subtraction + smooth-union scenes through the grid march."""
    for scene in (csg_demo(), blend_demo()):
        cs = compile_scene(scene)
        kw = dict(width=128, height=64, bounces=2, geometry="baked",
                  t_cull=True, interpret=True)
        f = np.asarray(render_frame_pallas(cs.spec, cs.params, **kw))
        g = np.asarray(render_frame_pallas(cs.spec, cs.params,
                                           dist_grid=True, **kw))
        diff = np.abs(f - g).max(axis=-1)
        assert float((diff > 1e-2).mean()) < 5e-3
