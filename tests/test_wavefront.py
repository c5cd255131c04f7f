"""Wavefront backend parity tests (interpreter mode, CPU).

The compacting wavefront renderer must produce EXACTLY the oracle's pixels:
per-ray RNG state makes compaction order irrelevant and each pixel owns one
ray, so no tolerance is needed.
"""

import numpy as np
import pytest

from compute_path_tracer_tpu.kernels.wavefront import render_frame_wavefront
from compute_path_tracer_tpu.render import render_frame
from compute_path_tracer_tpu.scene import compile_scene, csg_demo, sphere_and_plane


@pytest.mark.parametrize("sort_rays", [False, True])
def test_wavefront_matches_oracle(sort_rays):
    cs = compile_scene(sphere_and_plane())
    wf = np.asarray(
        render_frame_wavefront(
            cs.spec, cs.params, width=70, height=50, debug=0, bounces=3,
            interpret=True, sort_rays=sort_rays,
        )
    )
    ref = np.asarray(
        render_frame(cs.spec, cs.params, width=70, height=50, debug=0, bounces=3)
    )
    np.testing.assert_array_equal(wf, ref)


def test_wavefront_csg_demo():
    cs = compile_scene(csg_demo())
    wf = np.asarray(
        render_frame_wavefront(
            cs.spec, cs.params, width=64, height=64, debug=0, bounces=2,
            interpret=True,
        )
    )
    ref = np.asarray(
        render_frame(cs.spec, cs.params, width=64, height=64, debug=0, bounces=2)
    )
    np.testing.assert_array_equal(wf, ref)


def test_wavefront_accumulation():
    cs = compile_scene(sphere_and_plane())
    acc = None
    for f in range(2):
        acc = render_frame_wavefront(
            cs.spec, cs.params, accum=acc, frame=f, last_clear=f,
            width=64, height=32, debug=0, bounces=1, interpret=True,
        )
    ref = None
    for f in range(2):
        ref = render_frame(
            cs.spec, cs.params, accum=ref, frame=f, last_clear=f,
            width=64, height=32, debug=0, bounces=1,
        )
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(ref))
