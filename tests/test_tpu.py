"""Real-hardware lane: Mosaic-compile the kernels on an actual TPU chip.

Run with ``pytest -m tpu tests/`` (the conftest keeps the ambient TPU
platform for this lane).  The default CPU suite exercises the same code in
interpret mode; this lane exists because Mosaic LOWERING can fail where the
interpreter succeeds (the known case: the AD-normal transpose at 64 prims,
xfailed below) and because the bench configuration should never be validated
by bench.py alone.

Oracles run on the host CPU backend inside the same process (cheap compiles,
platform-independent reference values); comparisons use small tolerances for
cross-platform fp differences, with the reference's deterministic debug
modes (normals/albedo, test_compute.glsl:170-195) as the cheap fixtures
SURVEY.md §4 prescribes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.tpu

W, H, BOUNCES = 128, 64, 2


@pytest.fixture(scope="module")
def cs():
    from compute_path_tracer_tpu.scene import compile_scene, csg_demo

    return compile_scene(csg_demo())


@pytest.fixture(scope="module")
def cpu():
    return jax.devices("cpu")[0]


def _oracle_cpu(cpu, cs, **kw):
    from compute_path_tracer_tpu.render import render_frame

    with jax.default_device(cpu):
        return np.asarray(
            render_frame(cs.spec, jnp.asarray(cs.params), width=W, height=H, **kw)
        )


def test_device_is_tpu():
    assert jax.devices()[0].platform == "tpu", jax.devices()


def test_debug_modes_match_cpu_oracle(cs, cpu):
    """Deterministic debug fixtures (albedo + normals) compiled by Mosaic on
    the chip vs the CPU oracle."""
    from compute_path_tracer_tpu.kernels import render_frame_pallas

    for debug, tol in ((2, 1e-5), (1, 1e-3)):
        got = np.asarray(
            render_frame_pallas(
                cs.spec, jnp.asarray(cs.params), width=W, height=H,
                debug=debug, geometry="baked",
            )
        )
        want = _oracle_cpu(cpu, cs, debug=debug, geometry="baked")
        bad = np.abs(got - want).max(axis=2) > tol
        assert bad.mean() < 0.005, f"debug={debug}: {bad.mean():.4f} pixels differ"


def test_bench_config_path_trace_matches_cpu_oracle(cs, cpu):
    """The bench configuration (baked + t-interval culling) on hardware vs
    the CPU oracle full path trace: same RNG stream, so differences are
    cross-platform fp + the documented eps-level culling cases."""
    from compute_path_tracer_tpu.kernels import render_frame_pallas

    got = np.asarray(
        render_frame_pallas(
            cs.spec, jnp.asarray(cs.params), width=W, height=H, debug=0,
            bounces=BOUNCES, frame=3, last_clear=3,
            geometry="baked", t_cull=True,
        )
    )
    want = _oracle_cpu(
        cpu, cs, debug=0, bounces=BOUNCES, frame=3, last_clear=3,
        geometry="baked",
    )
    bad = np.abs(got - want).max(axis=2) > 1e-2
    assert bad.mean() < 0.01, f"{bad.mean():.4f} pixels differ"


def test_march_kernel_grads_match_cpu_oracle(cs, cpu):
    """fwd+bwd of the Pallas-march training step on hardware vs the CPU
    oracle's implicit-march gradient (the BASELINE.json correctness config:
    param-gradient allclose against the CPU reference)."""
    from compute_path_tracer_tpu.diff import make_loss

    target = np.zeros((H, W, 3), np.float32)
    kw = dict(width=W, height=H, bounces=1, geometry="baked")
    pv = jnp.asarray(cs.params)

    loss_tpu = make_loss(cs.spec, target, march="pallas", **kw)
    val, grad = jax.value_and_grad(loss_tpu)(pv)
    grad = np.asarray(grad)
    assert np.isfinite(float(val))
    assert np.isfinite(grad).all()

    with jax.default_device(cpu):
        loss_cpu = make_loss(cs.spec, target, **kw)
        val_c, grad_c = jax.value_and_grad(loss_cpu)(jnp.asarray(cs.params))
    np.testing.assert_allclose(float(val), float(val_c), rtol=1e-4)
    grad_c = np.asarray(grad_c)
    # rtol 1e-4 on every coordinate that carries meaningful signal; tiny
    # coordinates are compared against the gradient's scale (cross-platform
    # transcendental ulps can flip isolated RNG branches).
    scale = np.abs(grad_c).max()
    np.testing.assert_allclose(grad, grad_c, rtol=1e-4, atol=1e-4 * scale)


def test_fused_train_step_on_chip(cs, cpu):
    """The fused per-pixel-backward training kernel (kernels/train.py)
    Mosaic-compiles and its gradients match the CPU oracle's detached-normal
    configuration.

    Gradient band: rtol 5e-3.  The kernel's per-(shape, channel) cotangent
    sums are one-hot MATMULS (kernels/train.py:_segment_matmul) while the
    oracle's reverse sweep scatter-adds in pixel order; combined with
    TPU-vs-CPU transcendental ulps, the reassociated f32 reductions differ
    by up to ~0.35% relative on cancellation-heavy coordinates (measured on
    this scene).  Same-platform exactness is pinned by the interpret-mode
    tests (tests/test_train_fused.py, ~2e-7), and the faithful gradient
    path keeps the BASELINE rtol-1e-4 criterion in
    test_march_kernel_grads_match_cpu_oracle above."""
    from compute_path_tracer_tpu.kernels.train import make_fused_value_and_grad

    target = np.zeros((H, W, 3), np.float32)
    pv = jnp.asarray(cs.params)
    step = make_fused_value_and_grad(cs.spec, target, width=W, height=H,
                                     bounces=1)
    val, grad = step(pv)
    grad = np.asarray(grad)
    assert np.isfinite(float(val)) and np.isfinite(grad).all()

    with jax.default_device(cpu):
        loss_cpu = make_loss_detached(cs, target)
        val_c, grad_c = jax.value_and_grad(loss_cpu)(jnp.asarray(cs.params))
    np.testing.assert_allclose(float(val), float(val_c), rtol=1e-4)
    grad_c = np.asarray(grad_c)
    scale = np.abs(grad_c).max()
    np.testing.assert_allclose(grad, grad_c, rtol=5e-3, atol=1e-4 * scale)


def make_loss_detached(cs, target):
    from compute_path_tracer_tpu.diff import make_loss

    return make_loss(cs.spec, target, width=W, height=H, bounces=1,
                     geometry="baked", normals="detached", march="xla")


def test_fused_winner_mode_on_chip(cpu):
    """WINNER mode (union-only tree) of the fused kernel on real hardware,
    in every edge configuration - this is the path that runs the in-kernel
    MXU segment reductions (kernels/train.py:seg_accumulate, round 4) and
    the grid-accumulated (n_shapes, C) outputs, which csg_demo's
    subtraction tree (the test above) never exercises.  Oracle: the same
    step in interpret mode on CPU (identical semantics; the HIGHEST-
    precision matmul keeps the reduction exact-f32, so only cross-platform
    transcendental ulps remain - band 1e-4 of the gradient scale, with the
    secondary config's extra exclusion march allowed 5e-4: the round-5
    SIGNED closest-approach march crosses surfaces with floored steps, and
    an argmin landing on a crossing tap lets a 1-ulp map difference move
    the tap the seed evaluates at - measured 5.4e-4 relative on 1 of 89
    slots, sign and the other 88 slots identical)."""
    from compute_path_tracer_tpu.kernels.train import make_fused_value_and_grad
    from compute_path_tracer_tpu.render.baked import spec_is_union_only
    from compute_path_tracer_tpu.scene import compile_scene, sphere_and_plane

    scs = compile_scene(sphere_and_plane())
    assert spec_is_union_only(scs.spec)
    target = np.random.default_rng(7).random((H, W, 3)).astype(np.float32)
    pv = jnp.asarray(scs.params)
    for cfg, tol in ((dict(), 1e-4), (dict(edge_grad=True), 1e-4),
                     (dict(edge_grad=True, edge_secondary=True), 5e-4)):
        step = make_fused_value_and_grad(scs.spec, target, width=W, height=H,
                                         bounces=1, **cfg)
        val, grad = step(pv)
        grad = np.asarray(grad)
        assert np.isfinite(float(val)) and np.isfinite(grad).all(), cfg
        with jax.default_device(cpu):
            step_c = make_fused_value_and_grad(scs.spec, target, width=W,
                                               height=H, bounces=1,
                                               interpret=True, **cfg)
            val_c, grad_c = step_c(jnp.asarray(scs.params))
        np.testing.assert_allclose(float(val), float(val_c), rtol=1e-5)
        grad_c = np.asarray(grad_c)
        scale = np.abs(grad_c).max()
        np.testing.assert_allclose(grad, grad_c, atol=tol * scale,
                                   err_msg=str(cfg))


def test_benchmark_scene_compiles_on_chip():
    """The 64-prim benchmark scene's megakernel Mosaic-compiles and runs at
    reduced resolution (guards the bench.py configuration)."""
    from compute_path_tracer_tpu.kernels import render_frame_pallas
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    bs = compile_scene(benchmark_scene(64))
    img = np.asarray(
        render_frame_pallas(
            bs.spec, jnp.asarray(bs.params), width=256, height=128, debug=0,
            bounces=2, geometry="baked", t_cull=True,
        )
    )
    assert np.isfinite(img).all() and img.shape == (128, 256, 3)


# The toolchain the repo's three load-bearing Mosaic workarounds were
# observed on (relayout-safe march formulation megakernel.py:_march_while,
# debug-mode ids fold megakernel.py:_make_kernel debug 1/2 branch, and the
# parameter-cotangent scatter split kernels/train.py).  A version bump may
# fix or re-break any of them with only this slow lane to notice; this
# witness turns a silent flip into an actionable failure pointing at the
# workaround sites.
_WORKAROUND_TOOLCHAIN = {"jax": "0.9.0", "jaxlib": "0.9.0",
                         "libtpu": "0.0.34"}


def test_mosaic_workaround_toolchain_witness():
    import jaxlib

    try:
        import libtpu
        libtpu_version = getattr(libtpu, "__version__", "unknown")
    except ImportError:
        libtpu_version = "missing"
    got = {"jax": jax.__version__, "jaxlib": jaxlib.__version__,
           "libtpu": libtpu_version}
    if got != _WORKAROUND_TOOLCHAIN:
        # A version bump is not itself a defect: surface it as an xfail
        # (actionable notice in the report) instead of failing the lane -
        # the three workaround-covering tests in this lane are what actually
        # detect a behavioral flip.
        pytest.xfail(
            f"toolchain changed ({got} != {_WORKAROUND_TOOLCHAIN}): re-probe "
            "the three Mosaic workarounds (grep 'Mosaic workaround'; run "
            "benchmarks/probe_fused_bwd.py and the xfailed AD-normal test), "
            "then update _WORKAROUND_TOOLCHAIN"
        )


@pytest.mark.xfail(
    reason="Mosaic cannot compile the AD-normal transpose at 64 prims "
    "(megakernel normals='autodiff'); tracked in ROADMAP", strict=False,
)
def test_autodiff_normals_64_prims():
    from compute_path_tracer_tpu.kernels import render_frame_pallas
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    bs = compile_scene(benchmark_scene(64))
    img = np.asarray(
        render_frame_pallas(
            bs.spec, jnp.asarray(bs.params), width=128, height=64, debug=1,
            geometry="baked", normals="autodiff",
        )
    )
    assert np.isfinite(img).all()


def test_analytic_all_on_chip(cpu):
    """Round 5: the FULL-analytic bounce Mosaic-compiles and matches the
    CPU oracle at the documented eps class (hits ON the surface instead of
    the MHD shell flip isolated MC paths)."""
    from compute_path_tracer_tpu.kernels import render_frame_pallas
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    bs = compile_scene(benchmark_scene(16))
    img = np.asarray(render_frame_pallas(
        bs.spec, jnp.asarray(bs.params), width=W, height=H, bounces=BOUNCES,
        geometry="baked", analytic_all=True,
    ))
    assert np.isfinite(img).all()
    from compute_path_tracer_tpu.render import render_frame

    with jax.default_device(cpu):
        want = np.asarray(render_frame(
            bs.spec, jnp.asarray(bs.params), width=W, height=H,
            bounces=BOUNCES))
    diff = np.abs(img - want).max(axis=-1)
    assert float((diff > 1e-2).mean()) < 5e-3


def test_fused_analytic_all_on_chip():
    """The fused trainer's full-analytic phase 1 Mosaic-compiles with edge
    gradients and returns finite grads."""
    from compute_path_tracer_tpu.kernels.train import make_fused_value_and_grad
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    bs = compile_scene(benchmark_scene(16))
    target = np.zeros((H, W, 3), np.float32)
    step = make_fused_value_and_grad(
        bs.spec, target, width=W, height=H, bounces=BOUNCES,
        analytic_all=True, edge_grad=True)
    loss, g = step(jnp.asarray(bs.params))
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g)).all()
