"""Gradient correctness: autodiff vs finite differences vs the implicit-
function custom_vjp march (BASELINE.json correctness config: gradient
allclose vs the CPU reference)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from compute_path_tracer_tpu.diff import make_loss, optimize_to_target, render_image_diff
from compute_path_tracer_tpu.scene import (
    KIND_PLANE,
    KIND_SPHERE,
    Scene,
    Shape,
    Union,
    compile_scene,
)

W = H = 24


def _scene():
    root = Union(name="Root")
    ball = root.add_shape(Shape(KIND_SPHERE, name="Ball"))
    ball.size.set(1.0)
    ball.material.color.set(0.8, 0.4, 0.2)
    ball.material.brightness.set(0.5)  # emissive so bounces=0 sees light
    ground = root.add_shape(Shape(KIND_PLANE, name="Ground"))
    ground.transform.position.set(0.0, -1.2, 0.0)
    ground.transform.aabb = False
    return Scene([root])


@pytest.fixture(scope="module")
def cs():
    return compile_scene(_scene())


def test_autodiff_matches_finite_differences(cs):
    target = jnp.zeros((H, W, 3), jnp.float32)
    loss_fn = make_loss(cs.spec, target, width=W, height=H, bounces=0, implicit=False)
    p0 = jnp.asarray(cs.params)
    g = np.asarray(jax.grad(loss_fn)(p0))

    # Probe a handful of param slots: radius, color channel, position.
    ball = cs.spec.roots[0].children_shapes[0]
    slots = [ball.size[0], ball.material[0], ball.transform.pos[0]]
    eps = 1e-3
    for s in slots:
        dp = np.zeros_like(np.asarray(p0))
        dp[s] = eps
        fd = (float(loss_fn(p0 + jnp.asarray(dp))) - float(loss_fn(p0 - jnp.asarray(dp)))) / (
            2 * eps
        )
        # visibility edges make FD noisy; smooth interior terms dominate here
        assert np.isclose(g[s], fd, rtol=0.15, atol=2e-3), (s, g[s], fd)


def test_implicit_matches_autodiff(cs):
    target = jnp.zeros((H, W, 3), jnp.float32)
    g_auto = np.asarray(
        jax.grad(make_loss(cs.spec, target, width=W, height=H, bounces=0, implicit=False))(
            jnp.asarray(cs.params)
        )
    )
    g_impl = np.asarray(
        jax.grad(make_loss(cs.spec, target, width=W, height=H, bounces=0, implicit=True))(
            jnp.asarray(cs.params)
        )
    )
    assert np.isfinite(g_impl).all()
    # Same smooth-term gradients; the implicit path solves the march exactly
    # while autodiff differentiates the truncated iteration.
    np.testing.assert_allclose(g_impl, g_auto, rtol=0.05, atol=2e-3)


def test_render_image_diff_matches_oracle(cs):
    from compute_path_tracer_tpu.render import render_frame

    img_d = np.asarray(
        render_image_diff(cs.spec, jnp.asarray(cs.params), width=W, height=H, bounces=1)
    )
    img_r = np.asarray(
        render_frame(cs.spec, cs.params, width=W, height=H, debug=0, bounces=1)
    )
    np.testing.assert_allclose(img_d, img_r, atol=1e-6)


def test_inverse_rendering_recovers(cs):
    p_true = jnp.asarray(cs.params)
    target = render_image_diff(cs.spec, p_true, width=W, height=H, bounces=0)

    rng = np.random.default_rng(0)
    ball = cs.spec.roots[0].children_shapes[0]
    # brightness: the parameter the 0-bounce render directly sees (albedo
    # only matters from bounce 1 on, and the light color is normalized).
    perturb_slots = [ball.material[3]]
    p_init = np.asarray(p_true).copy()
    for s in perturb_slots:
        p_init[s] += rng.uniform(0.15, 0.3)
    mask = np.zeros_like(p_init)
    for s in perturb_slots:
        mask[s] = 1.0

    result = optimize_to_target(
        cs.spec, p_init, target, width=W, height=H, bounces=0, steps=40,
        learning_rate=5e-2, param_mask=mask,
    )
    assert result.losses[-1] < result.losses[0] * 0.2
    got = np.asarray(result.params)[perturb_slots]
    want = np.asarray(p_true)[perturb_slots]
    np.testing.assert_allclose(got, want, atol=0.05)


@pytest.mark.slow
def test_detached_normals_value_identical_grad_finite(cs):
    """normals="detached" must not change the rendered value at all (the
    forward still runs the reference's 6-tap central difference) while its
    gradient - the backward with the shading-normal term pruned - stays
    finite and keeps the dominant smooth terms (materials, implicit hit-t).
    """
    pv = jnp.asarray(cs.params)
    kw = dict(width=W, height=H, bounces=1)
    a = render_image_diff(cs.spec, pv, **kw)
    b = render_image_diff(cs.spec, pv, normals="detached", **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    target = np.asarray(a) * 0.9
    g_full = np.asarray(jax.grad(make_loss(cs.spec, target, **kw))(pv))
    g_det = np.asarray(
        jax.grad(make_loss(cs.spec, target, normals="detached", **kw))(pv)
    )
    assert np.isfinite(g_det).all()
    # First-order material slots see the normal only through the detached
    # shading chain, so their gradients agree closely; geometry slots may
    # differ (that is the approximation).
    ball = cs.spec.roots[0].children_shapes[0]
    mat_slots = list(ball.material[:4])
    np.testing.assert_allclose(
        g_det[mat_slots], g_full[mat_slots], rtol=0.05, atol=2e-4
    )


@pytest.mark.slow
def test_remat_grad_identical(cs):
    """remat=True (jax.checkpoint on the bounce body) is a pure
    memory/recompute trade: value and gradient must match the non-remat
    path exactly."""
    pv = jnp.asarray(cs.params)
    kw = dict(width=W, height=H, bounces=2)
    a = render_image_diff(cs.spec, pv, **kw)
    b = render_image_diff(cs.spec, pv, remat=True, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    target = np.asarray(a) * 0.9
    ga = np.asarray(jax.grad(make_loss(cs.spec, target, **kw))(pv))
    gb = np.asarray(
        jax.grad(make_loss(cs.spec, target, remat=True, **kw))(pv)
    )
    assert np.isfinite(gb).all()
    np.testing.assert_allclose(gb, ga, rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_kernel_normals_match_detached(cs):
    """normals="kernel" (in-kernel 6-tap normal, kernels/march.py) must be
    bit-identical in value AND gradient to normals="detached" over the XLA
    taps - same closures, same detachment, different execution site."""
    pv = jnp.asarray(cs.params)
    base = dict(width=W, height=H, bounces=1, geometry="baked",
                march="pallas", march_interpret=True)
    a = render_image_diff(cs.spec, pv, normals="detached", **base)
    b = render_image_diff(cs.spec, pv, normals="kernel", **base)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    target = np.asarray(a) * 0.9
    ga = jax.grad(
        make_loss(cs.spec, target, normals="detached", **base)
    )(pv)
    gb = jax.grad(
        make_loss(cs.spec, target, normals="kernel", **base)
    )(pv)
    assert np.isfinite(np.asarray(gb)).all()
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


@pytest.mark.slow
def test_pallas_march_cast_bit_matches_xla(cs):
    """The on-chip march cast (kernels/march.py) must produce bit-identical
    rendered values AND parameter gradients to the XLA implicit march in
    interpret mode (same map closures, same implicit backward)."""
    pv = jnp.asarray(cs.params)
    kw = dict(width=W, height=H, bounces=1, geometry="baked")
    a = render_image_diff(cs.spec, pv, **kw)
    b = render_image_diff(cs.spec, pv, march="pallas", march_interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    target = np.asarray(a) * 0.9
    ga = jax.grad(make_loss(cs.spec, target, **kw))(pv)
    gb = jax.grad(
        make_loss(cs.spec, target, march="pallas", march_interpret=True, **kw)
    )(pv)
    assert np.isfinite(np.asarray(gb)).all()
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
