"""PNG round-trip, checkpointing, and RenderSession two-speed update tests
(reference behaviors: state.rs:237-303 export, sdf_editor.rs:35-47 dirty
flags, path_tracer.rs:101-106 accumulation reset)."""

import numpy as np

from compute_path_tracer_tpu.app.config import Settings
from compute_path_tracer_tpu.io import (
    hdr_to_rgba8,
    load_checkpoint,
    load_png_rgba,
    save_checkpoint,
    save_png,
)
from compute_path_tracer_tpu.render.session import RenderSession
from compute_path_tracer_tpu.scene import sphere_and_plane


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((16, 24, 3), dtype=np.float32)
    path = str(tmp_path / "t.png")
    save_png(path, img, flip_y=False)
    back = load_png_rgba(path)
    expect = hdr_to_rgba8(img, flip_y=False)
    np.testing.assert_array_equal(back, expect)


def test_png_gamma_and_flip(tmp_path):
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = [1.0, 0.5, 0.25]
    rgba = hdr_to_rgba8(img)  # flip_y=True
    # flipped: original row 0 is now row 1
    assert rgba[1, 0, 0] == 255
    assert rgba[1, 0, 1] == int(0.5 ** (1 / 2.2) * 255 + 0.5)
    assert rgba[0, 0, 3] == 255


def test_checkpoint_roundtrip(tmp_path):
    scene = sphere_and_plane()
    params = np.arange(5, dtype=np.float32)
    accum = np.ones((4, 4, 3), np.float32) * 0.5
    path = str(tmp_path / "ckpt")
    save_checkpoint(
        path, scene=scene, params=params, accum=accum, frame=7, last_clear=3,
        extra={"opt_step": np.int64(11)},
    )
    back = load_checkpoint(path)
    assert back["frame"] == 7 and back["last_clear"] == 3
    np.testing.assert_array_equal(back["params"], params)
    np.testing.assert_array_equal(back["accum"], accum)
    assert back["extra"]["opt_step"] == 11
    # Scene round-trips to the same compiled spec.
    from compute_path_tracer_tpu.scene import compile_scene

    assert compile_scene(back["scene"]).spec == compile_scene(scene).spec


def test_session_two_speed_update():
    scene = sphere_and_plane()
    sess = RenderSession(scene, 32, 32, Settings(debug=2, bounces=1))
    img1 = np.asarray(sess.step())
    assert sess.frame == 1 and sess.last_clear == 1

    # Value-only edit: param refresh, same spec object identity.
    spec_before = sess.compiled.spec
    scene.roots[0].children_shapes[0].material.color.set(0.0, 1.0, 0.0)
    sess.mark_values_changed()
    img2 = np.asarray(sess.step())
    assert sess.compiled.spec is spec_before
    assert sess.last_clear == 1  # accumulation was reset before the frame
    assert not np.allclose(img1, img2)

    # Structural edit: recompile to a new (equal-topology-or-not) spec.
    from compute_path_tracer_tpu.scene import KIND_SPHERE, Shape

    scene.roots[0].add_shape(Shape(KIND_SPHERE, name="extra"))
    sess.mark_structure_changed()
    sess.step()
    assert sess.compiled.spec is not spec_before
    assert sess.compiled.spec.n_shapes == 4


def test_session_resolution_scale():
    sess = RenderSession(sphere_and_plane(), 64, 64, Settings(debug=2, scale=0.5))
    img = np.asarray(sess.step())
    assert img.shape == (32, 32, 3)
    sess.set_scale(1.0)
    img = np.asarray(sess.step())
    assert img.shape == (64, 64, 3)
    assert sess.last_clear == 1


def test_session_save_image(tmp_path):
    sess = RenderSession(sphere_and_plane(), 16, 16, Settings(debug=2))
    sess.step()
    p = str(tmp_path / "out.png")
    sess.save_image(p)
    img = load_png_rgba(p)
    assert img.shape == (16, 16, 4)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """The Orbax backend round-trips the same logical checkpoint contents as
    the npz format (scene + params + accumulator + frame counters)."""
    import numpy as np

    from compute_path_tracer_tpu.io.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )
    from compute_path_tracer_tpu.scene import compile_scene, sphere_and_plane

    scene = sphere_and_plane()
    cs = compile_scene(scene)
    accum = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "ckpt")
    save_checkpoint_orbax(
        p, scene=scene, params=np.asarray(cs.params), accum=accum,
        frame=7, last_clear=3, extra={"note": np.int32(42)},
    )
    out = load_checkpoint_orbax(p)
    assert out["frame"] == 7 and out["last_clear"] == 3
    np.testing.assert_array_equal(np.asarray(out["params"]), np.asarray(cs.params))
    np.testing.assert_array_equal(np.asarray(out["accum"]), accum)
    assert int(out["extra"]["note"]) == 42
    assert out["scene"].name == scene.name
