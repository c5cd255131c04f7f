"""Multi-chip sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4):
tile-sharded rendering must be bit-identical to single-chip, and the psum'd
parameter gradient must equal the single-chip gradient."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from compute_path_tracer_tpu.diff import make_loss
from compute_path_tracer_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    render_frame_sharded,
)
from compute_path_tracer_tpu.render import render_frame
from compute_path_tracer_tpu.scene import compile_scene, sphere_and_plane

W = H = 32


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_render_bit_identical():
    cs = compile_scene(sphere_and_plane())
    mesh = make_mesh(8)
    for debug in (2, 0):
        img_s = np.asarray(
            render_frame_sharded(
                cs.spec, cs.params, mesh, width=W, height=H, debug=debug, bounces=1
            )
        )
        img_1 = np.asarray(
            render_frame(cs.spec, cs.params, width=W, height=H, debug=debug, bounces=1)
        )
        np.testing.assert_array_equal(img_s, img_1)


def test_sharded_render_on_smaller_mesh():
    cs = compile_scene(sphere_and_plane())
    mesh = make_mesh(4)
    img_s = np.asarray(
        render_frame_sharded(cs.spec, cs.params, mesh, width=W, height=H, debug=2)
    )
    img_1 = np.asarray(render_frame(cs.spec, cs.params, width=W, height=H, debug=2))
    np.testing.assert_array_equal(img_s, img_1)


def test_height_must_divide():
    cs = compile_scene(sphere_and_plane())
    mesh = make_mesh(8)
    try:
        render_frame_sharded(cs.spec, cs.params, mesh, width=W, height=30)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_sharded_session_frame_fn():
    from compute_path_tracer_tpu.app.config import Settings
    from compute_path_tracer_tpu.parallel import make_sharded_frame_fn
    from compute_path_tracer_tpu.render.session import RenderSession
    from compute_path_tracer_tpu.scene import sphere_and_plane

    mesh = make_mesh(8)
    sess = RenderSession(
        sphere_and_plane(), W, H, Settings(debug=2),
        frame_fn=make_sharded_frame_fn(mesh),
    )
    img_s = np.asarray(sess.step())
    cs = compile_scene(sphere_and_plane())
    img_1 = np.asarray(render_frame(cs.spec, cs.params, width=W, height=H, debug=2))
    np.testing.assert_array_equal(img_s, img_1)


@pytest.mark.slow
def test_psum_grad_matches_single_chip():
    cs = compile_scene(sphere_and_plane())
    mesh = make_mesh(8)
    target = jnp.zeros((H, W, 3), jnp.float32)
    params = jnp.asarray(cs.params)

    step = make_sharded_train_step(
        cs.spec, mesh, width=W, height=H, bounces=1, learning_rate=1.0
    )
    new_params, loss_sharded = step(params, target, jnp.int32(0))
    # learning_rate=1 => new = params - grad(mean loss).
    grad_sharded = np.asarray(params - new_params)

    loss_fn = make_loss(cs.spec, target, width=W, height=H, bounces=1, implicit=False)
    loss_single, grad_single = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single), rtol=1e-5)
    want = np.asarray(grad_single)
    # Near-silhouette per-pixel contributions are huge and cancel; band-wise
    # vs whole-image summation orders reassociate them differently, so the
    # comparison is relative to the gradient's overall scale - it validates
    # the distributed-gradient plumbing, not float associativity.
    scale = np.abs(want).max()
    np.testing.assert_allclose(grad_sharded, want, atol=1e-3 * scale, rtol=1e-3)


@pytest.mark.slow
def test_sharded_pallas_fast_config_matches_single_chip():
    """The bench configuration (Pallas megakernel, baked geometry, t-interval
    culling) sharded over the mesh must match the single-chip Pallas render
    up to the documented eps-level culling edge cases (<1% pixels)."""
    from compute_path_tracer_tpu.kernels.megakernel import render_frame_pallas
    from compute_path_tracer_tpu.scene import benchmark_scene

    cs = compile_scene(benchmark_scene(16))
    mesh = make_mesh(8)
    w, h = 64, 64
    kw = dict(width=w, height=h, debug=0, bounces=2, frame=2, last_clear=2)
    img_s = np.asarray(
        render_frame_sharded(
            cs.spec, cs.params, mesh, backend="pallas", geometry="baked",
            t_cull=True, interpret=True, **kw,
        )
    )
    img_1 = np.asarray(
        render_frame_pallas(
            cs.spec, cs.params, geometry="baked", t_cull=True,
            interpret=True, tile=(8, 128), **kw,
        )
    )
    d = np.abs(img_s - img_1)
    assert float((d.max(axis=2) > 1e-2).mean()) < 0.01


@pytest.mark.slow
def test_sharded_train_step_pallas_march_matches_oracle():
    """The distributed training step with the ON-CHIP march (kernels/march.py
    inside shard_map, implicit backward) must reproduce the oracle sharded
    step's loss and gradient."""
    cs = compile_scene(sphere_and_plane())
    mesh = make_mesh(8)
    target = jnp.zeros((H, W, 3), jnp.float32)
    params = jnp.asarray(cs.params)

    step_p = make_sharded_train_step(
        cs.spec, mesh, width=W, height=H, bounces=1, learning_rate=1.0,
        march="pallas", march_interpret=True,
    )
    new_p, loss_p = step_p(params, target, jnp.int32(0))
    assert np.isfinite(float(loss_p))
    grad_p = np.asarray(params - new_p)
    assert np.isfinite(grad_p).all()

    step_o = make_sharded_train_step(
        cs.spec, mesh, width=W, height=H, bounces=1, learning_rate=1.0
    )
    new_o, loss_o = step_o(params, target, jnp.int32(0))
    np.testing.assert_allclose(float(loss_p), float(loss_o), rtol=1e-5)
    grad_o = np.asarray(params - new_o)
    scale = np.abs(grad_o).max()
    # plain-autodiff vs implicit march gradients (see diff tests): equal
    # smooth terms, tiny march-truncation differences.
    np.testing.assert_allclose(grad_p, grad_o, atol=5e-3 * scale, rtol=5e-2)


@pytest.mark.slow
def test_sharded_train_step_kernel_normals():
    """The fast-gradient distributed step (normals="kernel": in-kernel
    detached normals, kernels/march.py) must see the SAME loss as the
    faithful pallas-march step - the forward value is unchanged by
    detachment - with finite psum-reduced gradients."""
    cs = compile_scene(sphere_and_plane())
    mesh = make_mesh(8)
    target = jnp.zeros((H, W, 3), jnp.float32)
    params = jnp.asarray(cs.params)

    step_f = make_sharded_train_step(
        cs.spec, mesh, width=W, height=H, bounces=1, learning_rate=1.0,
        march="pallas", march_interpret=True, normals="kernel",
    )
    new_f, loss_f = step_f(params, target, jnp.int32(0))
    grad_f = np.asarray(params - new_f)
    assert np.isfinite(float(loss_f)) and np.isfinite(grad_f).all()

    step_c = make_sharded_train_step(
        cs.spec, mesh, width=W, height=H, bounces=1, learning_rate=1.0,
        march="pallas", march_interpret=True,
    )
    _, loss_c = step_c(params, target, jnp.int32(0))
    np.testing.assert_allclose(float(loss_f), float(loss_c), rtol=1e-6)


@pytest.mark.slow
def test_fused_sharded_train_step_matches_single_chip():
    """The FUSED train kernel sharded over row bands (parallel/mesh.py:
    make_fused_sharded_train_step) must reproduce the single-chip fused
    step's loss and gradient: per-band reductions + psum count every pixel
    exactly once, so only summation order differs."""
    from compute_path_tracer_tpu.kernels.train import make_fused_value_and_grad
    from compute_path_tracer_tpu.parallel import make_fused_sharded_train_step

    cs = compile_scene(sphere_and_plane())
    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    target = rng.random((H, W, 3)).astype(np.float32) * 0.2
    params = jnp.asarray(cs.params)

    step = make_fused_sharded_train_step(
        cs.spec, mesh, width=W, height=H, bounces=1, learning_rate=1.0,
    )
    new_params, loss_sharded = step(params, jnp.asarray(target), jnp.int32(0))
    grad_sharded = np.asarray(params - new_params)

    single = make_fused_value_and_grad(
        cs.spec, target, width=W, height=H, bounces=1, interpret=True,
    )
    loss_single, grad_single = single(params)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)
    want = np.asarray(grad_single)
    scale = np.abs(want).max()
    np.testing.assert_allclose(grad_sharded, want, atol=1e-4 * scale,
                               rtol=1e-3)


@pytest.mark.slow
def test_fused_sharded_analytic_matches_single_chip():
    """analytic_unboxed plumbs through the sharded fused step: per-band
    closed-form capping must reproduce the single-chip fused-analytic
    loss/gradient exactly (same kernel, same absolute row offsets)."""
    from compute_path_tracer_tpu.kernels.train import make_fused_value_and_grad
    from compute_path_tracer_tpu.parallel import make_fused_sharded_train_step

    cs = compile_scene(sphere_and_plane())
    mesh = make_mesh(8)
    rng = np.random.default_rng(4)
    target = rng.random((H, W, 3)).astype(np.float32) * 0.2
    params = jnp.asarray(cs.params)

    step = make_fused_sharded_train_step(
        cs.spec, mesh, width=W, height=H, bounces=1, learning_rate=1.0,
        analytic_unboxed=True,
    )
    new_params, loss_sharded = step(params, jnp.asarray(target), jnp.int32(0))
    grad_sharded = np.asarray(params - new_params)

    single = make_fused_value_and_grad(
        cs.spec, target, width=W, height=H, bounces=1, interpret=True,
        analytic_unboxed=True,
    )
    loss_single, grad_single = single(params)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)
    want = np.asarray(grad_single)
    scale = np.abs(want).max()
    np.testing.assert_allclose(grad_sharded, want, atol=1e-4 * scale,
                               rtol=1e-3)
