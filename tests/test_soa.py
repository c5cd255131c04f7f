"""Shape-vectorized (SoA) analytic renderer (render/soa.py): the
compile-time-bounded scaling path.

The SoA cast must agree with the trace-unrolled ``analytic_all`` fold
(kernels/megakernel.py:_make_analytic_all) - same closed forms, same
membership semantics (AABB check[] + first-shape-assign clobbers,
containers.rs:244-252), same walk-order tie rule - while compiling in
O(1) traces regardless of prim count."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compute_path_tracer_tpu.render.baked import bake, make_bounds_baked
from compute_path_tracer_tpu.render.soa import (
    build_soa_plan,
    make_cast_soa,
    make_normal_soa,
    render_frame_soa,
)
from compute_path_tracer_tpu.scene.compile import compile_scene
from compute_path_tracer_tpu.scene.library import benchmark_scene, csg_demo
from compute_path_tracer_tpu.scene.model import (
    KIND_SPHERE,
    Scene,
    Shape,
    Union,
)
from compute_path_tracer_tpu.vecmath import Vec3


def _rand_rays(n=512, seed=3):
    r = np.random.default_rng(seed)
    ro = r.uniform(-6, 6, (n, 3)).astype(np.float32)
    to = r.uniform(-2, 2, (n, 3)).astype(np.float32)
    rd = to - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    mk = lambda a: Vec3(*(jnp.asarray(a[:, i]) for i in range(3)))
    return mk(ro), mk(rd)


def _unrolled_isect(spec, bv, ro, rd):
    from compute_path_tracer_tpu.kernels.megakernel import _make_analytic_all

    isect, _norm = _make_analytic_all(spec)
    bounds = make_bounds_baked(spec)
    checks, _ = bounds(ro, rd, bv)
    return isect(ro, rd, bv, checks, None)


@pytest.mark.parametrize("n_prims", [8, 16])
def test_soa_cast_matches_unrolled(n_prims):
    cs = compile_scene(benchmark_scene(n_prims))
    bv = bake(cs.spec, jnp.asarray(cs.params, jnp.float32))
    plan = build_soa_plan(cs.spec)
    assert plan is not None and plan.n_shapes >= n_prims
    ro, rd = _rand_rays()
    t_u, i_u = _unrolled_isect(cs.spec, bv, ro, rd)
    t_s, i_s = make_cast_soa(plan)(ro, rd, bv)
    t_u, i_u, t_s, i_s = map(np.asarray, (t_u, i_u, t_s, i_s))
    hit = t_u < 100.0  # _BIG = 4*FP = 200 on miss
    assert np.allclose(t_s[hit], t_u[hit], rtol=1e-5, atol=1e-5)
    assert (i_s == i_u).mean() > 0.999  # fp-tie lanes only
    assert (t_s[~hit] > 100.0).all()


def test_soa_cast_clobber_parity():
    """First-shape-assign clobber: a guarded first shape's passing check
    removes child-union shapes from the map (containers.rs:244-252)."""
    root = Union(name="R")
    child = Union(name="C")
    inner = child.add_shape(Shape(KIND_SPHERE, name="inner"))
    inner.transform.aabb = False
    inner.size.set(0.8)
    root.add_union(child)
    first = root.add_shape(Shape(KIND_SPHERE, name="first"))  # guarded
    first.transform.position.set(0.5, 0.0, 0.0)
    cs = compile_scene(Scene([root]))
    bv = bake(cs.spec, jnp.asarray(cs.params, jnp.float32))
    plan = build_soa_plan(cs.spec)
    ro, rd = _rand_rays(1024, seed=11)
    t_u, i_u = _unrolled_isect(cs.spec, bv, ro, rd)
    t_s, i_s = make_cast_soa(plan)(ro, rd, bv)
    t_u, i_u, t_s, i_s = map(np.asarray, (t_u, i_u, t_s, i_s))
    hit = t_u < 100.0  # _BIG = 4*FP = 200 on miss
    assert hit.any() and (~hit).any()
    assert np.allclose(t_s[hit], t_u[hit], rtol=1e-5, atol=1e-5)
    assert (i_s == i_u).all()


def test_soa_normals_match_unrolled():
    from compute_path_tracer_tpu.kernels.megakernel import _make_analytic_all

    cs = compile_scene(benchmark_scene(8))
    bv = bake(cs.spec, jnp.asarray(cs.params, jnp.float32))
    plan = build_soa_plan(cs.spec)
    ro, rd = _rand_rays()
    t_s, i_s = make_cast_soa(plan)(ro, rd, bv)
    p = ro + rd * t_s
    _isect, norm_u = _make_analytic_all(cs.spec)
    n_u = norm_u(p, i_s, bv, None)
    n_s = make_normal_soa(plan)(p, i_s, bv)
    hit = np.asarray(i_s) >= 0
    for a, b in ((n_u.x, n_s.x), (n_u.y, n_s.y), (n_u.z, n_s.z)):
        assert np.allclose(np.asarray(a)[hit], np.asarray(b)[hit],
                           atol=1e-5)


@pytest.mark.slow
def test_soa_render_bounces0_matches_oracle():
    from compute_path_tracer_tpu.render.reference import render_frame

    cs = compile_scene(benchmark_scene(8))
    o = np.asarray(render_frame(cs.spec, cs.params, width=128, height=32,
                                bounces=0))
    s = np.asarray(render_frame_soa(cs.spec, cs.params, width=128,
                                    height=32, bounces=0, fov=1.0))
    diff = np.abs(o - s).max(axis=-1)
    assert float((diff > 1e-2).mean()) < 1e-3


def test_soa_rejects_csg():
    cs = compile_scene(csg_demo())
    with pytest.raises(ValueError):
        render_frame_soa(cs.spec, cs.params, width=16, height=8, bounces=0,
                         fov=1.0)


@pytest.mark.slow
def test_soa_render_matches_analytic_all_interpret():
    from compute_path_tracer_tpu.kernels.megakernel import render_frame_pallas

    cs = compile_scene(benchmark_scene(16))
    kw = dict(width=128, height=64, bounces=3)
    a = np.asarray(render_frame_pallas(cs.spec, cs.params, geometry="baked",
                                       analytic_all=True, interpret=True,
                                       **kw))
    s = np.asarray(render_frame_soa(cs.spec, cs.params, fov=1.0, **kw))
    diff = np.abs(a - s).max(axis=-1)
    assert float((diff > 1e-2).mean()) < 5e-3


@pytest.mark.slow
def test_soa_compile_time_bounded():
    """The point of the path: a 256-prim scene must trace+compile in
    seconds (the unrolled faithful forward took tens of minutes,
    prim_scaling_r05.jsonl)."""
    cs = compile_scene(benchmark_scene(256))
    t0 = time.perf_counter()
    out = render_frame_soa(cs.spec, cs.params, width=64, height=32,
                           bounces=1, fov=1.0)
    # np.asarray forces materialization (on the axon TPU platform
    # block_until_ready alone can return early - bench.py:run).
    arr = np.asarray(out)
    elapsed = time.perf_counter() - t0
    assert np.isfinite(arr).all()
    assert elapsed < 120.0


@pytest.mark.slow
def test_soa_kernel_interpret_matches_analytic_all():
    """The Pallas analytic_soa kernel (in-kernel fori_loop over the packed
    SMEM tables) must be bit-exact with the trace-unrolled analytic_all
    kernel - same closed forms, same membership fold, same shading."""
    from compute_path_tracer_tpu.kernels.megakernel import render_frame_pallas

    cs = compile_scene(benchmark_scene(16))
    kw = dict(width=128, height=64, bounces=3, geometry="baked",
              interpret=True)
    a = np.asarray(render_frame_pallas(cs.spec, cs.params,
                                       analytic_all=True, **kw))
    s = np.asarray(render_frame_pallas(cs.spec, cs.params,
                                       analytic_soa=True, **kw))
    assert float(np.abs(a - s).max()) == 0.0


def test_soa_kernel_interpret_clobber_scene():
    """analytic_soa on a scene WITH ancestor clobbers matches analytic_all
    (exercises the in-kernel ancestor-guard membership path)."""
    from compute_path_tracer_tpu.kernels.megakernel import render_frame_pallas

    root = Union(name="R")
    child = Union(name="C")
    inner = child.add_shape(Shape(KIND_SPHERE, name="inner"))
    inner.transform.aabb = False
    inner.size.set(0.8)
    inner.material.brightness.set(2.0)
    inner.material.light_col.set(1.0, 1.0, 1.0)
    root.add_union(child)
    first = root.add_shape(Shape(KIND_SPHERE, name="first"))
    first.transform.position.set(0.5, 0.0, 0.0)
    first.material.brightness.set(1.0)
    first.material.light_col.set(1.0, 0.5, 0.2)
    cs = compile_scene(Scene([root]))
    kw = dict(width=128, height=32, bounces=1, geometry="baked",
              interpret=True)
    a = np.asarray(render_frame_pallas(cs.spec, cs.params,
                                       analytic_all=True, **kw))
    s = np.asarray(render_frame_pallas(cs.spec, cs.params,
                                       analytic_soa=True, **kw))
    assert float(np.abs(a - s).max()) == 0.0


@pytest.mark.tpu
def test_soa_kernel_tpu_matches_analytic_all():
    """Hardware lane: Mosaic-compile the SoA kernel on the real chip and
    require bit-exact agreement with the unrolled analytic_all kernel
    (round-5 silicon run: 0.0 mismatch at 256x128)."""
    from compute_path_tracer_tpu.kernels.megakernel import render_frame_pallas

    cs = compile_scene(benchmark_scene(16))
    kw = dict(width=256, height=128, bounces=3, geometry="baked")
    a = np.asarray(render_frame_pallas(cs.spec, cs.params,
                                       analytic_all=True, **kw))
    s = np.asarray(render_frame_pallas(cs.spec, cs.params,
                                       analytic_soa=True, **kw))
    assert float(np.abs(a - s).max()) == 0.0
