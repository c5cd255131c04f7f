"""Pallas megakernel parity tests in interpreter mode (CPU).

The megakernel must agree with the jax.numpy oracle exactly: both share the
scene codegen and the uint32 RNG, and the kernel's tile-level AABB culling
and early-exit while-loops are pure optimizations with identical lane
semantics.  Real-TPU parity is exercised separately on hardware.
"""

import numpy as np
import pytest

from compute_path_tracer_tpu.kernels import render_frame_pallas
from compute_path_tracer_tpu.render import render_frame
from compute_path_tracer_tpu.scene import (
    SUBTRACTION,
    KIND_CUBE,
    KIND_SPHERE,
    Scene,
    Shape,
    Union,
    compile_scene,
    csg_demo,
    sphere_and_plane,
)

W = H = 64
TILE = (8, 128)  # pad W=64 -> 128 exercises the crop path too


def _cmp(spec, params, debug, bounces=3, atol=0.0):
    pal = np.asarray(
        render_frame_pallas(
            spec, params, width=W, height=H, debug=debug, bounces=bounces,
            tile=TILE, interpret=True,
        )
    )
    ref = np.asarray(
        render_frame(spec, params, width=W, height=H, debug=debug, bounces=bounces)
    )
    np.testing.assert_allclose(pal, ref, atol=atol)
    return pal


@pytest.mark.parametrize("debug", [2, 1, 3, 0])
def test_kernel_matches_oracle_sphere_plane(debug):
    cs = compile_scene(sphere_and_plane())
    # debug 1 (normals) amplifies the 1-ulp map differences that lax.cond
    # culling branches introduce (different FMA fusion inside the branch)
    # through the central-difference gradient: ~1e-4 worst case.  The other
    # modes are bit-exact: albedo/heatmap are discrete and the march's step
    # rounding absorbs the ulp.
    img = _cmp(cs.spec, cs.params, debug, atol=1e-4 if debug == 1 else 0.0)
    assert np.isfinite(img).all()


@pytest.mark.slow
def test_kernel_matches_oracle_csg_demo():
    cs = compile_scene(csg_demo())
    _cmp(cs.spec, cs.params, 2)
    _cmp(cs.spec, cs.params, 0, bounces=2)


def test_kernel_matches_oracle_subtraction_and_culling():
    # Mixed AABB on/off with a subtraction node: exercises the culled-map
    # skip branches against the per-lane-guard oracle.
    root = Union(name="Root", op=SUBTRACTION)
    bite = root.add_shape(Shape(KIND_SPHERE, name="Bite"))
    bite.size.set(0.5)
    bite.transform.position.set(0.0, 0.0, -1.0)
    bite.material.color.set(1.0, 1.0, 0.0)
    block = root.add_shape(Shape(KIND_CUBE, name="Block"))
    block.size3.set(1.0, 1.0, 1.0)
    block.transform.aabb = False
    block.material.color.set(0.0, 0.0, 1.0)
    cs = compile_scene(Scene([root]))
    _cmp(cs.spec, cs.params, 2)


def test_kernel_accumulation_matches():
    cs = compile_scene(sphere_and_plane())
    acc_p = acc_r = None
    for f in range(2):
        acc_p = render_frame_pallas(
            cs.spec, cs.params, accum=acc_p, frame=f, last_clear=f,
            width=W, height=H, debug=0, bounces=1, tile=TILE, interpret=True,
        )
        acc_r = render_frame(
            cs.spec, cs.params, accum=acc_r, frame=f, last_clear=f,
            width=W, height=H, debug=0, bounces=1,
        )
    np.testing.assert_allclose(np.asarray(acc_p), np.asarray(acc_r), atol=0.0)


def test_march_pallas_matches_cast_ray_on_scattered_rays():
    """The standalone march kernel (kernels/march.py) on arbitrary
    secondary-style ray planes (scattered origins/directions, non-tile
    shapes exercising the padding path) must reproduce the oracle cast_ray
    exactly with culling off."""
    import numpy as np
    import jax.numpy as jnp

    from compute_path_tracer_tpu.kernels.march import march_pallas
    from compute_path_tracer_tpu.render.baked import bake, make_bounds_baked, make_map_baked
    from compute_path_tracer_tpu.render.reference import cast_ray
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene
    from compute_path_tracer_tpu.vecmath import Vec3

    cs = compile_scene(benchmark_scene(16))
    bv = bake(cs.spec, jnp.asarray(cs.params))
    rng = np.random.default_rng(3)
    h, w = 21, 97  # deliberately unaligned: forces benign-ray padding
    ro = Vec3(*(jnp.asarray(rng.uniform(-4, 4, (h, w)), jnp.float32) for _ in range(3)))
    d = rng.normal(size=(3, h, w)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    rd = Vec3(*(jnp.asarray(c) for c in d))

    t_k, idx_k = march_pallas(cs.spec, bv, ro, rd, geometry="baked",
                              t_cull=False, interpret=True, tile=(8, 128))

    map_fn = make_map_baked(cs.spec)
    checks, _ = make_bounds_baked(cs.spec)(ro, rd, bv)
    t_o, idx_o = cast_ray(map_fn, ro, rd, bv, checks)
    np.testing.assert_array_equal(np.asarray(t_k), np.asarray(t_o))
    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_o))
