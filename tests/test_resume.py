"""Deterministic checkpoint/resume: a render interrupted at frame k and
resumed from a checkpoint must finish bit-identical to an uninterrupted run
(SURVEY.md §5 checkpoint/resume - possible because the RNG is a pure
function of (pixel, frame))."""

import pytest
import numpy as np

from compute_path_tracer_tpu.app.config import Settings
from compute_path_tracer_tpu.io import load_checkpoint, save_checkpoint
from compute_path_tracer_tpu.render.session import RenderSession
from compute_path_tracer_tpu.scene import compile_scene, sphere_and_plane


def test_resume_bit_identical(tmp_path):
    settings = Settings(debug=0, bounces=1)
    w = h = 32

    # Uninterrupted: 4 frames.
    s1 = RenderSession(sphere_and_plane(), w, h, settings)
    full = np.asarray(s1.render(4))

    # Interrupted after 2 frames, checkpointed, resumed in a new session.
    s2 = RenderSession(sphere_and_plane(), w, h, settings)
    s2.render(2)
    ck = str(tmp_path / "ck")
    save_checkpoint(
        ck, scene=s2.scene, params=np.asarray(s2.params),
        accum=np.asarray(s2.accum), frame=s2.frame, last_clear=s2.last_clear,
    )

    state = load_checkpoint(ck)
    s3 = RenderSession(state["scene"], w, h, settings)
    import jax.numpy as jnp

    s3.accum = jnp.asarray(state["accum"])
    s3.frame = state["frame"]
    s3.last_clear = state["last_clear"]
    resumed = np.asarray(s3.render(2))

    np.testing.assert_array_equal(full, resumed)


@pytest.mark.slow
def test_recompile_on_structure_change_resets_progress():
    s = RenderSession(sphere_and_plane(), 16, 16, Settings(debug=0, bounces=0))
    s.render(3)
    assert s.last_clear == 3
    from compute_path_tracer_tpu.scene import KIND_SPHERE, Shape

    s.scene.roots[0].add_shape(Shape(KIND_SPHERE, name="new"))
    s.mark_structure_changed()
    s.step()
    # Accumulation restarted (reset-on-change, path_tracer.rs:101-106)...
    assert s.last_clear == 1
    # ...but the global frame counter (RNG stream) kept advancing.
    assert s.frame == 4
