"""Sample-axis (ray-batch) sharding: per-chip frame subsets all-reduced to a
mean must equal the single-chip progressive accumulation of the same frames
(the running mean is frame-order invariant)."""

import numpy as np

from compute_path_tracer_tpu.parallel import make_mesh, render_samples_sharded
from compute_path_tracer_tpu.render import render_frame
from compute_path_tracer_tpu.scene import compile_scene, sphere_and_plane

W = H = 32


def test_samples_sharded_equals_accumulation():
    cs = compile_scene(sphere_and_plane())
    mesh = make_mesh(4)
    fpd = 2  # frames per device -> 8 total samples
    img_s = np.asarray(
        render_samples_sharded(
            cs.spec, cs.params, mesh, frames_per_device=fpd,
            width=W, height=H, bounces=1,
        )
    )
    acc = None
    for f in range(mesh.devices.size * fpd):
        acc = render_frame(
            cs.spec, cs.params, accum=acc, frame=f, last_clear=f,
            width=W, height=H, debug=0, bounces=1,
        )
    np.testing.assert_allclose(img_s, np.asarray(acc), atol=1e-6)


def test_perf_helpers():
    from compute_path_tracer_tpu.app.perf import TimePackage, rays_per_second
    from compute_path_tracer_tpu.app.profiling import FrameCost

    tp = TimePackage()
    tp.update()
    assert tp.delta_time >= 0

    assert rays_per_second(100, 100, 10, 1.0, bounces=0) == 100 * 100 * 10
    assert rays_per_second(10, 10, 1, 0.0) == float("inf")

    fc = FrameCost(width=1920, height=1080, n_prims=64, bounces=8)
    assert fc.flops > 1e12
    assert fc.achieved_tflops(1.0) == fc.flops / 1e12


def test_samples_sharded_pallas_equals_accumulation():
    """Sample sharding through the megakernel (fused on-device accumulation
    per chip, psum of the mean) must equal the single-chip progressive
    accumulation of the same frames."""
    cs = compile_scene(sphere_and_plane())
    mesh = make_mesh(4)
    fpd = 2
    img_s = np.asarray(
        render_samples_sharded(
            cs.spec, cs.params, mesh, frames_per_device=fpd,
            width=W, height=H, bounces=1,
            backend="pallas", geometry="baked", t_cull=False, interpret=True,
        )
    )
    acc = None
    for f in range(mesh.devices.size * fpd):
        acc = render_frame(
            cs.spec, cs.params, accum=acc, frame=f, last_clear=f,
            width=W, height=H, debug=0, bounces=1, geometry="baked",
        )
    np.testing.assert_allclose(img_s, np.asarray(acc), atol=1e-5)
