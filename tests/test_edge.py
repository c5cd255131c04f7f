"""Edge (visibility) gradients: the reparameterized-silhouette estimator of
diff/vjp.py (``edge_grad=True``).

The shading model makes path radiance a product of material constants, so on
a flat-lit emissive shape the SMOOTH gradient w.r.t. its position is zero
almost everywhere - all positional signal lives where the silhouette sweeps
pixels (the north-star "reparameterized edge handling"; the soft-coverage
estimator is diff/vjp.py:render_pixels_diff edge_grad branch)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from compute_path_tracer_tpu.diff import make_loss, optimize_to_target, render_image_diff
from compute_path_tracer_tpu.scene import (
    KIND_SPHERE,
    Scene,
    Shape,
    Union,
    compile_scene,
)

W = H = 48


def _flat_scene():
    """A flat-lit (emissive-only, zero-albedo) sphere on a black background:
    with bounces=0 every pixel is either the constant emissive color or
    black, so d(image)/d(position) is zero everywhere except the edge."""
    root = Union(name="Root")
    ball = root.add_shape(Shape(KIND_SPHERE, name="Ball"))
    ball.size.set(0.8)
    ball.material.color.set(0.0, 0.0, 0.0)
    ball.material.brightness.set(2.0)
    ball.material.light_col.set(1.0, 1.0, 1.0)
    return Scene([root])


@pytest.fixture(scope="module")
def cs():
    return compile_scene(_flat_scene())


def _pos_x_slot(cs):
    return cs.spec.roots[0].children_shapes[0].transform.pos[0]


def _shifted_target(cs, dx):
    p = np.asarray(cs.params, np.float32).copy()
    p[_pos_x_slot(cs)] += dx
    return render_image_diff(
        cs.spec, jnp.asarray(p), width=W, height=H, bounces=0
    )


def test_smooth_position_grad_is_zero(cs):
    """Sanity of the premise: WITHOUT edge_grad, the flat-lit sphere's
    position gradient vanishes even though the target is visibly shifted."""
    target = _shifted_target(cs, 0.25)
    g = jax.grad(
        make_loss(cs.spec, target, width=W, height=H, bounces=0, edge_grad=False)
    )(jnp.asarray(cs.params))
    assert abs(float(g[_pos_x_slot(cs)])) < 1e-6


def test_edge_grad_leaves_value_unchanged(cs):
    """The estimator is a detached correction (c - stop_grad(c)) * proxy: the
    rendered VALUE must be bit-identical with edge_grad on and off."""
    pv = jnp.asarray(cs.params)
    a = render_image_diff(cs.spec, pv, width=W, height=H, bounces=0, edge_grad=False)
    b = render_image_diff(cs.spec, pv, width=W, height=H, bounces=0, edge_grad=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_edge_grad_matches_finite_difference_sign_and_scale(cs):
    """The edge gradient must point toward the shifted target and be within
    a factor-2 band of the finite difference of the loss (FD over a large
    step averages the same silhouette sweep the estimator models)."""
    target = _shifted_target(cs, 0.2)
    loss_fn = make_loss(
        cs.spec, target, width=W, height=H, bounces=0, edge_grad=True
    )
    pv = jnp.asarray(cs.params)
    g = float(jax.grad(loss_fn)(pv)[_pos_x_slot(cs)])

    eps = 0.1
    s = _pos_x_slot(cs)
    dp = np.zeros_like(np.asarray(pv))
    dp[s] = eps
    fd = (float(loss_fn(pv + jnp.asarray(dp))) - float(loss_fn(pv - jnp.asarray(dp)))) / (2 * eps)
    assert g != 0.0
    assert np.sign(g) == np.sign(fd), (g, fd)
    assert 0.2 < abs(g) / abs(fd) < 5.0, (g, fd)


@pytest.mark.slow
def test_edge_grad_calibrated_magnitude(cs):
    """Calibrated-band check: against the quantity the estimator actually
    models - the derivative of the spp-AVERAGED (AA-jitter expectation)
    loss - the default edge_beta must land within a 2x band.  The full
    sweep (3 offsets x 5 betas, spp 16) lives in
    benchmarks/artifacts/edge_calibration_r03.jsonl; this is its fast
    regression (one offset, spp 8): beta=0.5 measured ratios 0.79-1.51."""
    spp = 8
    p = np.asarray(cs.params, np.float32).copy()
    p[_pos_x_slot(cs)] += 0.2
    target = render_image_diff(cs.spec, jnp.asarray(p), width=W, height=H,
                               bounces=0, spp=spp)
    pv = jnp.asarray(cs.params)
    loss_spp = make_loss(cs.spec, target, width=W, height=H, bounces=0,
                         spp=spp, edge_grad=False)
    eps = 0.05
    s = _pos_x_slot(cs)
    dp = np.zeros_like(np.asarray(pv))
    dp[s] = eps
    fd = (float(loss_spp(pv + jnp.asarray(dp)))
          - float(loss_spp(pv - jnp.asarray(dp)))) / (2 * eps)
    loss_e = make_loss(cs.spec, target, width=W, height=H, bounces=0,
                       spp=spp, edge_grad=True)
    g = float(jax.grad(loss_e)(pv)[s])
    assert np.sign(g) == np.sign(fd), (g, fd)
    assert 0.5 < abs(g) / abs(fd) < 2.0, (g, fd, g / fd)


def test_edge_grad_recovers_position(cs):
    """Inverse rendering THROUGH the silhouette: recover a position offset
    that smooth gradients cannot see (the CLI exposes the same demo via
    ``optimize --edge-grad --perturb-what position``)."""
    p_true = jnp.asarray(cs.params)
    target = render_image_diff(cs.spec, p_true, width=W, height=H, bounces=0)

    s = _pos_x_slot(cs)
    p_init = np.asarray(p_true).copy()
    p_init[s] += 0.3
    mask = np.zeros_like(p_init)
    mask[s] = 1.0

    result = optimize_to_target(
        cs.spec, p_init, target, width=W, height=H, bounces=0, steps=60,
        learning_rate=2e-2, param_mask=mask, edge_grad=True,
    )
    err0 = abs(p_init[s] - float(p_true[s]))
    err1 = abs(float(result.params[s]) - float(p_true[s]))
    assert err1 < err0 * 0.25, (err0, err1)

    # Without edge gradients the same optimization cannot move at all.
    frozen = optimize_to_target(
        cs.spec, p_init, target, width=W, height=H, bounces=0, steps=10,
        learning_rate=2e-2, param_mask=mask, edge_grad=False,
    )
    assert abs(float(frozen.params[s]) - p_init[s]) < 1e-5


# ---------------------------------------------------------------------------
# Secondary-bounce visibility edges (edge_secondary=True)
# ---------------------------------------------------------------------------

def _occluder_scene():
    """The adversarial indirect-lighting scene of
    benchmarks/secondary_edge.py: the camera sees only a diffuse wall; an
    emissive sphere and an occluding cube sit outside the frustum, so the
    only light is one bounce wall -> emitter partially blocked by the
    occluder - moving the occluder sweeps a SECONDARY silhouette that the
    primary-only estimator measures as exactly zero."""
    from compute_path_tracer_tpu.scene import KIND_CUBE

    root = Union(name="Root")
    wall = root.add_shape(Shape(KIND_CUBE, name="Wall"))
    wall.size3.set(1.5, 1.5, 0.05)
    wall.transform.position.set(0.0, 0.0, 1.5)
    wall.material.color.set(0.7, 0.7, 0.7)
    emit = root.add_shape(Shape(KIND_SPHERE, name="Emitter"))
    emit.size.set(1.0)
    emit.transform.position.set(-3.5, 0.0, 0.3)
    emit.material.color.set(0.0, 0.0, 0.0)
    emit.material.brightness.set(40.0)
    emit.material.light_col.set(1.0, 1.0, 1.0)
    occ = root.add_shape(Shape(KIND_CUBE, name="Occluder"))
    occ.size3.set(0.05, 0.75, 1.5)
    occ.transform.position.set(-2.0, 0.75, 0.75)
    occ.material.color.set(0.02, 0.02, 0.02)
    return Scene([root])


@pytest.mark.slow
def test_edge_secondary_value_unchanged():
    """The per-bounce coverage correction is c - stop_grad(c): rendered
    values must be BIT-identical with and without edge_secondary."""
    cs2 = compile_scene(_occluder_scene())
    pv = jnp.asarray(cs2.params)
    kw = dict(width=16, height=16, bounces=1, fov=3.0)
    a = np.asarray(render_image_diff(cs2.spec, pv, **kw))
    b = np.asarray(render_image_diff(cs2.spec, pv, edge_grad=True,
                                     edge_secondary=True, **kw))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_edge_secondary_recovers_occluder_gradient():
    jax.clear_caches()  # see test_train_fused: the secondary grad compile is huge
    """Round-3 verdict item #1: on the adversarial occluder scene the
    secondary estimator must recover the spp-averaged finite-difference
    gradient of the off-frustum occluder's position within 2x (round-4
    measurement: FD +0.814, estimator +0.629 at this configuration), while
    smooth autodiff and the primary-only estimator report ~zero."""
    cs2 = compile_scene(_occluder_scene())
    pv = jnp.asarray(cs2.params, jnp.float32)
    slot_occ = cs2.spec.roots[0].children_shapes[2].transform.pos[1]
    # The canonical 48x48/spp16 measurement lives in the artifact
    # (benchmarks/artifacts/secondary_edge_r04.jsonl: FD +0.723, est
    # +0.660).  The suite re-verifies the mechanism at spp=1 - the
    # spp-scan's reverse compile was a multi-minute XLA build - where FD
    # with common random numbers is still deterministic and compares the
    # SAME single-sample stream the estimator differentiates; the accepted
    # band is wider accordingly.
    tgt32 = np.zeros((32, 32, 3), np.float32)
    kw = dict(width=32, height=32, bounces=1, spp=1, fov=3.0)
    loss_spp = make_loss(cs2.spec, tgt32, **kw)
    loss_sec = make_loss(cs2.spec, tgt32, edge_grad=True,
                         edge_secondary=True, **kw)

    eps = 0.1
    dp = np.zeros_like(np.asarray(pv))
    dp[slot_occ] = eps
    fd = (float(loss_spp(pv + jnp.asarray(dp)))
          - float(loss_spp(pv - jnp.asarray(dp)))) / (2 * eps)
    g_smooth = float(jax.grad(loss_spp)(pv)[slot_occ])
    g_sec = float(jax.grad(loss_sec)(pv)[slot_occ])

    assert abs(fd) > 0.2, fd  # the secondary term is real at this config
    assert abs(g_smooth) < 0.05 * abs(fd), (g_smooth, fd)
    ratio = g_sec / fd
    assert 0.3 < ratio < 3.0, (g_sec, fd, ratio)


@pytest.mark.slow
def test_corner_blend_danskin_matches_fd():
    """Round-5 corner-aware blend (make_closest_approach tie_scale): at a
    rotated cube's silhouette-endpoint rows the two-valley softmax-blend
    Danskin gradient of d_min must track the finite difference of d_min
    itself within 30% (benchmarks/corner_attrib.py measured ~10%), and an
    empty second slot must leave the single-argmin gradient unchanged on
    interior rows."""
    from compute_path_tracer_tpu.constants import DEFAULT_FOV
    from compute_path_tracer_tpu.diff import vjp as V
    from compute_path_tracer_tpu.ops.camera import calc_uv, primary_ray
    from compute_path_tracer_tpu.render.scenegen import make_bounds, make_map
    from compute_path_tracer_tpu.scene import KIND_CUBE

    root = Union(name="Root")
    box = root.add_shape(Shape(KIND_CUBE, name="Box"))
    box.size3.set(0.55, 0.35, 0.55)
    box.material.brightness.set(2.0)
    box.material.light_col.set(1.0, 1.0, 1.0)
    ccs = compile_scene(Scene([root]))
    sh = ccs.spec.roots[0].children_shapes[0]
    base = np.asarray(ccs.params, np.float32)
    slot = sh.transform.rot[2]
    base[slot] = 0.4
    res = 64
    map_fn = make_map(ccs.spec)
    bounds_fn = make_bounds(ccs.spec)
    col, row = 40, 32  # in-band corner row of the rz=0.4 pose

    ys = jnp.arange(res, dtype=jnp.float32)
    xs = jnp.full((res,), float(col), jnp.float32)
    u, v = calc_uv(xs, ys, res, res, 1.0)
    ro, rd = primary_ray(u, v, jnp.float32(DEFAULT_FOV))
    closest = V.make_closest_approach(map_fn)
    cot = np.zeros(res, np.float32)
    cot[row] = 1.0

    def dmin_row(pv):
        checks, _ = bounds_fn(ro, rd, pv)
        d1, _, _ = closest(ro, rd, pv, checks,
                           tie_scale=2.0 * 0.5 / (res * DEFAULT_FOV))
        return jnp.sum(d1 * jnp.asarray(cot))

    g = float(jax.grad(dmin_row)(jnp.asarray(base))[slot])
    eps = 0.01
    bp = base.copy(); bp[slot] += eps
    bm = base.copy(); bm[slot] -= eps
    fd = (float(dmin_row(jnp.asarray(bp))) -
          float(dmin_row(jnp.asarray(bm)))) / (2 * eps)
    assert np.sign(g) == np.sign(fd)
    assert abs(g - fd) <= 0.3 * abs(fd)
