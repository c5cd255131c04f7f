"""Fused training-step kernel (kernels/train.py): forward values must match
the renderer bit-for-bit, and gradients must match the detached-normals
oracle configuration it implements (diff/vjp.py ``march="pallas",
normals="detached"``).

Interpret mode on CPU; the real-hardware Mosaic compile of the same kernel
is covered by tests/test_tpu.py::test_fused_train_step_on_chip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from compute_path_tracer_tpu.diff import make_loss
from compute_path_tracer_tpu.diff.vjp import render_image_diff
from compute_path_tracer_tpu.kernels.train import make_fused_value_and_grad
from compute_path_tracer_tpu.scene import compile_scene, csg_demo

W, H, BOUNCES = 64, 32, 1


@pytest.fixture(scope="module")
def cs():
    return compile_scene(csg_demo())


@pytest.fixture(scope="module")
def target(cs):
    rng = np.random.default_rng(0)
    return rng.random((H, W, 3)).astype(np.float32) * 0.2


@pytest.fixture(scope="module")
def fused(cs, target):
    step = make_fused_value_and_grad(
        cs.spec, target, width=W, height=H, bounces=BOUNCES, interpret=True,
        with_image=True,
    )
    return step(jnp.asarray(cs.params))


@pytest.mark.slow
def test_fused_forward_matches_renderer(cs, fused):
    """The kernel's phase-1 forward is the megakernel pipeline: its rendered
    image must match the differentiable renderer's forward."""
    _, _, img = fused
    want = np.asarray(
        render_image_diff(cs.spec, jnp.asarray(cs.params), width=W, height=H,
                          bounces=BOUNCES, geometry="baked")
    )
    np.testing.assert_allclose(np.asarray(img), want, atol=1e-6)


@pytest.mark.slow
def test_fused_loss_matches_oracle(cs, target, fused):
    loss_f, _, _ = fused
    loss_fn = make_loss(cs.spec, target, width=W, height=H, bounces=BOUNCES,
                        geometry="baked", normals="detached", march="xla")
    assert abs(float(loss_f) - float(loss_fn(jnp.asarray(cs.params)))) < 1e-6


@pytest.mark.slow
def test_fused_grads_match_detached_pallas_oracle(cs, target, fused):
    """Same march (Pallas t-interval kernel), same detached-normal
    semantics: the fused per-pixel backward + XLA-side parameter reduction
    must reproduce the XLA reverse sweep's gradient almost exactly (the only
    deviation is the FD-vs-AD implicit-gradient g_p, O(eps^2))."""
    _, grad_f, _ = fused
    loss_fn = make_loss(cs.spec, target, width=W, height=H, bounces=BOUNCES,
                        geometry="baked", normals="detached", march="pallas",
                        march_interpret=True)
    grad_o = np.asarray(jax.grad(loss_fn)(jnp.asarray(cs.params)))
    scale = np.abs(grad_o).max()
    np.testing.assert_allclose(np.asarray(grad_f), grad_o, rtol=1e-4,
                               atol=1e-4 * scale)


@pytest.mark.slow
def test_winner_geom_backend_matches_oracle():
    """Union-only scenes take the winner-leaf geometry backend (per-pixel
    argmin-leaf partials in-kernel + one-hot-matmul segment sums outside,
    no map transpose anywhere); its gradients must match the detached
    oracle like the map-vjp fallback does."""
    from compute_path_tracer_tpu.kernels.train import _union_only
    from compute_path_tracer_tpu.scene import sphere_and_plane

    cs2 = compile_scene(sphere_and_plane())
    assert _union_only(cs2.spec)
    rng = np.random.default_rng(1)
    tgt = rng.random((H, W, 3)).astype(np.float32) * 0.3
    step = make_fused_value_and_grad(cs2.spec, tgt, width=W, height=H,
                                     bounces=BOUNCES, interpret=True)
    loss_f, grad_f = step(jnp.asarray(cs2.params))

    loss_fn = make_loss(cs2.spec, tgt, width=W, height=H, bounces=BOUNCES,
                        geometry="baked", normals="detached", march="pallas",
                        march_interpret=True)
    val_o, grad_o = jax.value_and_grad(loss_fn)(jnp.asarray(cs2.params))
    assert abs(float(loss_f) - float(val_o)) < 1e-6
    go = np.asarray(grad_o)
    scale = np.abs(go).max()
    np.testing.assert_allclose(np.asarray(grad_f), go, rtol=1e-3,
                               atol=1e-4 * scale)


@pytest.mark.slow
def test_fused_optimizer_path():
    """optimize_to_target(fused=True) drives Adam with the fused kernel and
    reduces the loss on a material-perturbation self-target."""
    from compute_path_tracer_tpu.diff import optimize_to_target, render_image_diff
    from compute_path_tracer_tpu.scene import sphere_and_plane

    cs2 = compile_scene(sphere_and_plane())
    target = np.asarray(render_image_diff(
        cs2.spec, jnp.asarray(cs2.params), width=32, height=16, bounces=1,
        geometry="baked",
    ))
    rng = np.random.default_rng(2)
    init = np.asarray(cs2.params, np.float32)
    init = init + rng.normal(0, 0.05, init.shape).astype(np.float32)
    # Keep refract_chance at zero: the fused entry rejects refracting
    # scenes (check_no_refraction), and the perturbation is about
    # materials the kernel actually shades.
    from compute_path_tracer_tpu.render.scenegen import material_slot_matrix

    init[material_slot_matrix(cs2.spec)[:, 13]] = 0.0
    res = optimize_to_target(
        cs2.spec, init, target, width=32, height=16, bounces=1, steps=12,
        learning_rate=2e-2, fused=True, interpret=True,
    )
    losses = np.asarray(res.losses)
    assert np.isfinite(losses).all()
    # Adam's early steps may wander; the trajectory must still descend.
    assert losses[1:].min() < losses[0]


@pytest.mark.slow
def test_fused_grad_descends(cs, target, fused):
    """One SGD step along the fused gradient must reduce the fused loss
    (end-to-end sanity that the gradient is a descent direction)."""
    loss0, grad, _ = fused
    step = make_fused_value_and_grad(
        cs.spec, target, width=W, height=H, bounces=BOUNCES, interpret=True,
    )
    # Pin refract_chance (channel 13): its gradient is only valid at 0 and
    # the entry guard rejects params stepped off zero (check_no_refraction).
    from compute_path_tracer_tpu.render.scenegen import material_slot_matrix

    grad = np.asarray(grad).copy()
    grad[material_slot_matrix(cs.spec)[:, 13]] = 0.0
    lr = 1e-2 / max(float(np.abs(grad).max()), 1e-8)
    loss1, _ = step(jnp.asarray(cs.params) - lr * grad)
    assert float(loss1) < float(loss0)


def test_refracting_scene_rejected():
    """A glass scene cannot silently train through the fused kernel: its
    forward/gradient use megakernel material semantics (refraction never
    shaded), so entry points reject nonzero refract_chance params with a
    pointer at the diff/vjp.py path."""
    from compute_path_tracer_tpu.diff import optimize_to_target
    from compute_path_tracer_tpu.scene import glass_demo

    cs2 = compile_scene(glass_demo())
    tgt = np.zeros((H, W, 3), np.float32)
    step = make_fused_value_and_grad(cs2.spec, tgt, width=W, height=H,
                                     bounces=BOUNCES, interpret=True)
    with pytest.raises(ValueError, match="refract"):
        step(jnp.asarray(cs2.params))
    with pytest.raises(ValueError, match="refract"):
        optimize_to_target(cs2.spec, cs2.params, tgt, width=W, height=H,
                           bounces=BOUNCES, fused=True, interpret=True)


def test_fused_rejects_xla_knob_requests():
    """optimize_to_target(fused=True) must not silently ignore explicit
    XLA-path knobs (the fused kernel has fixed semantics)."""
    from compute_path_tracer_tpu.diff import optimize_to_target
    from compute_path_tracer_tpu.scene import sphere_and_plane

    cs2 = compile_scene(sphere_and_plane())
    tgt = np.zeros((16, 32, 3), np.float32)
    for kw in ({"geometry": "baked"}, {"march": "pallas"},
               {"implicit": False}):
        with pytest.raises(ValueError, match="fused=True ignores"):
            optimize_to_target(cs2.spec, cs2.params, tgt, width=32,
                               height=16, bounces=1, fused=True,
                               interpret=True, **kw)


@pytest.mark.slow
def test_fused_analytic_subtraction_tree():
    """Round 4: the fused trainer's analytic_unboxed accepts subtraction
    trees via per-shape eligibility (csg_demo's Environment plane + lamp
    leave the map; the carved body stays faithful) - gradients stay finite
    and close to the faithful-fused step."""
    from compute_path_tracer_tpu.render.baked import analytic_eligible_ids

    cs2 = compile_scene(csg_demo())
    assert len(analytic_eligible_ids(cs2.spec)) == 2
    rng = np.random.default_rng(3)
    tgt = (rng.random((H, W, 3)) * 0.2).astype(np.float32)
    kw = dict(width=W, height=H, bounces=BOUNCES, interpret=True)
    l0, g0 = make_fused_value_and_grad(cs2.spec, tgt, **kw)(
        jnp.asarray(cs2.params))
    l1, g1 = make_fused_value_and_grad(cs2.spec, tgt, analytic_unboxed=True,
                                       **kw)(jnp.asarray(cs2.params))
    g0, g1 = np.asarray(g0), np.asarray(g1)
    assert np.isfinite(g1).all()
    scale = np.abs(g0).max()
    rel = np.abs(g1 - g0) / (np.abs(g0) + 1e-3 * scale)
    assert float(rel.max()) < 0.15, float(rel.max())


@pytest.mark.slow
def test_fused_analytic_unboxed():
    """The fused trainer's analytic_unboxed mode (guard-less shapes in
    closed form, round 3: 475 -> 385 ms on HW) produces finite gradients
    close to the faithful-fused step (divergence confined to the
    shell-vs-surface / budget-exit pixel classes)."""
    from compute_path_tracer_tpu.scene import benchmark_scene

    # benchmark_scene(8) keeps the guard-less ground plane + lamp spheres
    # that the analytic path targets while cutting the interpret-mode trace
    # cost ~8x vs the n=16/bounces=2 config (same 0.061 measured band).
    cs2 = compile_scene(benchmark_scene(8))
    pv = jnp.asarray(cs2.params)
    rng = np.random.default_rng(0)
    tgt = (rng.random((32, 64, 3)) * 0.2).astype(np.float32)
    kw = dict(width=64, height=32, bounces=1, interpret=True)
    l0, g0 = make_fused_value_and_grad(cs2.spec, tgt, **kw)(pv)
    l1, g1 = make_fused_value_and_grad(cs2.spec, tgt, analytic_unboxed=True,
                                       **kw)(pv)
    g0, g1 = np.asarray(g0), np.asarray(g1)
    assert np.isfinite(g1).all()
    scale = np.abs(g0).max()
    rel = np.abs(g1 - g0) / (np.abs(g0) + 1e-3 * scale)
    assert float(rel.max()) < 0.15, float(rel.max())


# ---------------------------------------------------------------------------
# Fused edge gradients (edge_grad=True): the round-4 geometry-signal fix
# ---------------------------------------------------------------------------

def _flat_ball_cs():
    from compute_path_tracer_tpu.scene import KIND_SPHERE, Scene, Shape, Union

    root = Union(name="Root")
    ball = root.add_shape(Shape(KIND_SPHERE, name="Ball"))
    ball.size.set(0.8)
    ball.material.color.set(0.0, 0.0, 0.0)
    ball.material.brightness.set(2.0)
    ball.material.light_col.set(1.0, 1.0, 1.0)
    return compile_scene(Scene([root]))


@pytest.mark.slow
def test_fused_edge_grad_matches_xla_estimator():
    """The fused primary edge term must reproduce diff/vjp.py's calibrated
    estimator: same beta formula, same proxy; only the closest-approach tap
    sequence differs (t-interval-culled vs plain march)."""
    cs2 = _flat_ball_cs()
    pv = jnp.asarray(cs2.params, jnp.float32)
    sx = cs2.spec.roots[0].children_shapes[0].transform.pos[0]
    p_shift = np.asarray(pv).copy()
    p_shift[sx] += 0.25
    tgt = np.asarray(render_image_diff(
        cs2.spec, jnp.asarray(p_shift), width=48, height=48, bounces=0))

    l0, g0 = make_fused_value_and_grad(
        cs2.spec, tgt, width=48, height=48, bounces=0, interpret=True)(pv)
    l1, g1 = make_fused_value_and_grad(
        cs2.spec, tgt, width=48, height=48, bounces=0, interpret=True,
        edge_grad=True)(pv)
    # Loss/image values are unchanged; only the gradient gains the term.
    assert float(l0) == float(l1)
    assert float(g0[sx]) == 0.0  # smooth geometry gradient is zero
    gx = jax.grad(make_loss(
        cs2.spec, tgt, width=48, height=48, bounces=0, edge_grad=True,
        geometry="baked", normals="detached"))(pv)
    assert abs(float(g1[sx]) - float(gx[sx])) < 0.05 * abs(float(gx[sx]))
    corr = np.corrcoef(np.asarray(g1), np.asarray(gx))[0, 1]
    assert corr > 0.99, corr


@pytest.mark.slow
def test_fused_edge_grad_recovers_position():
    """Round-3 verdict item #2's done criterion: the position-recovery demo
    routed through the FUSED kernel converges (without edge_grad the fused
    trainer is structurally blind to geometry)."""
    from compute_path_tracer_tpu.diff import optimize_to_target

    cs2 = _flat_ball_cs()
    p_true = jnp.asarray(cs2.params)
    target = np.asarray(render_image_diff(
        cs2.spec, p_true, width=48, height=48, bounces=0))
    s = cs2.spec.roots[0].children_shapes[0].transform.pos[0]
    p_init = np.asarray(p_true).copy()
    p_init[s] += 0.3
    mask = np.zeros_like(p_init)
    mask[s] = 1.0

    res = optimize_to_target(
        cs2.spec, p_init, target, width=48, height=48, bounces=0, steps=60,
        learning_rate=2e-2, param_mask=mask, fused=True, edge_grad=True,
        interpret=True,
    )
    err0 = abs(p_init[s] - float(p_true[s]))
    err1 = abs(float(res.params[s]) - float(p_true[s]))
    assert err1 < err0 * 0.25, (err0, err1)

    # Without the edge term the fused step cannot move the position at all.
    frozen = optimize_to_target(
        cs2.spec, p_init, target, width=48, height=48, bounces=0, steps=5,
        learning_rate=2e-2, param_mask=mask, fused=True, edge_grad=False,
        interpret=True,
    )
    assert abs(float(frozen.params[s]) - p_init[s]) < 1e-5


# ---------------------------------------------------------------------------
# Fused SECONDARY edge gradients (edge_secondary=True, round 4)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_fused_secondary_matches_xla_estimator():
    # The XLA-secondary grad compile is the suite's biggest XLA build; on
    # this small-RAM host it aborted when stacked on ~160 tests' worth of
    # retained executables - drop them first.
    jax.clear_caches()
    """On the adversarial occluder scene (only indirect light; the
    secondary term dominates), the fused secondary estimator must agree
    with the XLA edge_secondary estimator at matched spp=1 and leave the
    loss value unchanged; the plain fused gradient is exactly zero for the
    occluder."""
    import sys

    sys.path.insert(0, "benchmarks")
    from secondary_edge import _scene

    cs2 = compile_scene(_scene())
    pv = jnp.asarray(cs2.params, jnp.float32)
    slot = cs2.spec.roots[0].children_shapes[2].transform.pos[1]
    tgt = np.zeros((32, 32, 3), np.float32)
    kw = dict(width=32, height=32, bounces=1, fov=3.0, interpret=True)

    l0, g0 = make_fused_value_and_grad(cs2.spec, tgt, **kw)(pv)
    l2, g2 = make_fused_value_and_grad(cs2.spec, tgt, edge_grad=True,
                                       edge_secondary=True, **kw)(pv)
    assert float(l0) == float(l2)
    assert float(g0[slot]) == 0.0

    loss_x = make_loss(cs2.spec, tgt, width=32, height=32, bounces=1,
                       spp=1, fov=3.0, edge_grad=True, edge_secondary=True,
                       geometry="baked", normals="detached")
    gx = float(jax.grad(loss_x)(pv)[slot])
    gf = float(g2[slot])
    assert gx != 0.0
    assert abs(gf - gx) < 0.1 * abs(gx), (gf, gx)


@pytest.mark.slow
def test_fused_secondary_nonwinner_tree():
    jax.clear_caches()
    """csg_demo (subtraction -> map-vjp backend): the secondary rows route
    through the dedicated winner-leaf block; gradients stay finite, values
    unchanged, and the term adds signal."""
    cs2 = compile_scene(csg_demo())
    pv = jnp.asarray(cs2.params)
    rng = np.random.default_rng(5)
    tgt = (rng.random((H, W, 3)) * 0.2).astype(np.float32)
    kw = dict(width=W, height=H, bounces=1, interpret=True)
    l0, g0 = make_fused_value_and_grad(cs2.spec, tgt, **kw)(pv)
    l2, g2 = make_fused_value_and_grad(cs2.spec, tgt, edge_grad=True,
                                       edge_secondary=True, **kw)(pv)
    assert float(l0) == float(l2)
    g0, g2 = np.asarray(g0), np.asarray(g2)
    assert np.isfinite(g2).all()
    assert np.abs(g2 - g0).max() > 0.0


def test_fused_bounces_zero_edge():
    """bounces=0 (B1=1) regression: JAX inlines a trip-count-1 fori_loop,
    which used to place the with_closest march outside any loop and trip
    the Mosaic relayout failure on hardware (the CLI edge_demo fused
    recovery path); the kernel now uses a non-unrolling while_loop there."""
    from compute_path_tracer_tpu.scene import edge_demo

    cs2 = compile_scene(edge_demo())
    pv = jnp.asarray(cs2.params)
    tgt = np.zeros((16, 32, 3), np.float32)
    l, g = make_fused_value_and_grad(
        cs2.spec, tgt, width=32, height=16, bounces=0, interpret=True,
        edge_grad=True,
    )(pv)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


@pytest.mark.slow
def test_fused_spp_averages_frame_streams(cs, target):
    """Round 5: the fused step's spp>1 mode is EXACTLY the mean of the
    spp=1 steps over the consecutive frame window [frame*spp, frame*spp
    + spp) - the reference's own sample axis (frame accumulation,
    test_compute.glsl:242-245) realized as gradient averaging."""
    one = make_fused_value_and_grad(cs.spec, target, width=W, height=H,
                                    bounces=BOUNCES, interpret=True)
    two = make_fused_value_and_grad(cs.spec, target, width=W, height=H,
                                    bounces=BOUNCES, interpret=True, spp=2)
    pv = jnp.asarray(cs.params)
    l0, g0 = one(pv, frame=6)
    l1, g1 = one(pv, frame=7)
    l2, g2 = two(pv, frame=3)
    np.testing.assert_allclose(float(l2), (float(l0) + float(l1)) / 2,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g2),
                               (np.asarray(g0) + np.asarray(g1)) / 2,
                               rtol=1e-5, atol=1e-8)


def test_fused_optimizer_spp():
    """optimize_to_target(fused=True, spp=2) runs and descends."""
    from compute_path_tracer_tpu.diff.inverse import optimize_to_target
    from compute_path_tracer_tpu.scene.library import edge_demo

    cs2 = compile_scene(edge_demo())
    tgt = np.asarray(
        render_image_diff(cs2.spec, jnp.asarray(cs2.params), width=32,
                          height=16, bounces=1, geometry="baked"))
    p0 = np.asarray(cs2.params).copy()
    res = optimize_to_target(
        cs2.spec, p0 * 1.05, tgt, steps=2, width=32, height=16, bounces=1,
        fused=True, spp=2, edge_grad=True, interpret=True,
    )
    assert np.isfinite(res.losses).all()


@pytest.mark.slow
def test_fused_analytic_all(target):
    """Round 5: the fused trainer's FULL-analytic phase 1 (no march, no FD
    normal taps; exact winner ids/normals from closed-form intersections).
    Its loss must equal the MSE of the megakernel analytic_all render, and
    its gradient must agree with the faithful fused step up to the
    documented shell-landing divergence classes."""
    from compute_path_tracer_tpu.kernels.megakernel import render_frame_pallas
    from compute_path_tracer_tpu.scene.library import benchmark_scene

    cs = compile_scene(benchmark_scene(8))
    pv = jnp.asarray(cs.params)
    step = make_fused_value_and_grad(
        cs.spec, target, width=W, height=H, bounces=BOUNCES, interpret=True,
        analytic_all=True, edge_grad=True)
    loss, g = step(pv)
    img = np.asarray(render_frame_pallas(
        cs.spec, pv, width=W, height=H, bounces=BOUNCES, geometry="baked",
        analytic_all=True, interpret=True))
    want = float(((img - target) ** 2).mean())
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    f_step = make_fused_value_and_grad(
        cs.spec, target, width=W, height=H, bounces=BOUNCES, interpret=True,
        edge_grad=True)
    _, gf = f_step(pv)
    gf, ga = np.asarray(gf), np.asarray(g)
    nz = np.abs(gf) > 1e-5
    corr = np.corrcoef(gf[nz], ga[nz])[0, 1]
    assert corr > 0.95
    assert np.isfinite(ga).all()


def test_fused_analytic_all_rejects_csg():
    cs2 = compile_scene(csg_demo())
    with pytest.raises(ValueError):
        make_fused_value_and_grad(
            cs2.spec, np.zeros((H, W, 3), np.float32), width=W, height=H,
            bounces=1, interpret=True, analytic_all=True)(
                jnp.asarray(cs2.params))
