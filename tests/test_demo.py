"""Two-speed live-editing demo (app/demo.py): a value-only edit to the
watched scene JSON must reuse the compiled kernel (the reference's
queue_update path, primitives.rs:153-156); a structural edit must re-lower
(queue_compile / remake_pipeline, sdf_editor.rs:35-47)."""

import numpy as np

from compute_path_tracer_tpu.app.config import Settings
from compute_path_tracer_tpu.app.demo import apply_scene_file, watch_scene
from compute_path_tracer_tpu.render.session import RenderSession
from compute_path_tracer_tpu.scene import sphere_and_plane
from compute_path_tracer_tpu.scene.io import load_scene, save_scene
from compute_path_tracer_tpu.scene.model import KIND_CUBE, Shape


def _session(tmp_path):
    scene = sphere_and_plane()
    path = str(tmp_path / "live.json")
    save_scene(scene, path)
    sess = RenderSession(load_scene(path), 16, 16, Settings(debug=2, bounces=1))
    return sess, path


def test_value_edit_routes_to_refresh(tmp_path):
    sess, path = _session(tmp_path)
    img0 = np.asarray(sess.step())
    spec_before = sess.compiled.spec

    edited = load_scene(path)
    edited.roots[0].children_shapes[0].transform.position.set(0.4, 0.0, 0.0)
    save_scene(edited, path)

    kind, _dt = apply_scene_file(sess, path)
    assert kind == "refresh"
    assert sess.compiled.spec is spec_before  # kernel/trace reused
    img1 = np.asarray(sess.step())
    assert not np.array_equal(img0, img1)  # the edit actually rendered


def test_structure_edit_routes_to_recompile(tmp_path):
    sess, path = _session(tmp_path)
    sess.step()
    spec_before = sess.compiled.spec

    edited = load_scene(path)
    edited.roots[0].add_shape(Shape(KIND_CUBE, name="New"))
    save_scene(edited, path)

    kind, _dt = apply_scene_file(sess, path)
    assert kind == "recompile"
    assert sess.compiled.spec is not spec_before
    assert sess.compiled.spec != spec_before
    img = np.asarray(sess.step())
    assert np.isfinite(img).all()


def test_watch_scene_processes_edit_events(tmp_path):
    import os
    import threading
    import time

    sess, path = _session(tmp_path)

    def edit_later():
        time.sleep(0.4)
        edited = load_scene(path)
        edited.roots[0].children_shapes[0].size.set(1.5)
        save_scene(edited, path)
        # ensure a visible mtime bump even on coarse filesystems
        st = os.stat(path)
        os.utime(path, (st.st_atime, st.st_mtime + 1))

    logs = []
    t = threading.Thread(target=edit_later)
    t.start()
    n = watch_scene(sess, path, frames=1, poll_s=0.1, max_events=1,
                    log=logs.append)
    t.join()
    assert n == 1
    assert any("value edit" in line for line in logs)
