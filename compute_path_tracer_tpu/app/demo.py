"""Interactive two-speed editing demo (headless).

The reference's defining UX is live editing: a GUI edit either refreshes the
``data[]`` parameter buffer (cheap) or regenerates + recompiles the compute
shader (expensive), driven by dirty flags (reference:
src/sdf_editor/sdf_editor.rs:35-47, printed timings at
src/path_tracer/path_tracer.rs:66,75).  Headless on TPU, the editor surface
is the scene JSON file: this module watches it and routes every change down
the same two-speed split -

* **value edit** (same topology, a number changed): the compiled kernel is
  reused; only the flat parameter vector is re-read - the ``queue_update``
  path (primitives.rs:153-156);
* **structure edit** (shape added/removed, type/op/AABB changed): the scene
  is re-lowered and the renderer re-jitted - the ``queue_compile`` /
  ``remake_pipeline`` path (path_tracer.rs:62-76).

Both paths print their cost, reproducing the reference's compile-timing
prints for the headless workflow:

    python -m compute_path_tracer_tpu demo --scene data/maps/live.json
    # ... edit live.json in another terminal; the demo re-renders on save.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax.numpy as jnp

from ..scene.compile import compile_scene
from ..scene.io import load_scene


def apply_scene_file(sess, path: str):
    """Apply the scene file's current contents to a live RenderSession.

    Returns ``(kind, seconds)`` where kind is "refresh" (value-only edit,
    kernel reused) or "recompile" (structural edit, scene re-lowered and the
    next step re-jits).  The discriminator is SceneSpec equality: identical
    lowered topology means every compiled closure stays valid and parameter
    identities (Param.hash, preserved by JSON round-trips) can be re-read in
    place.
    """
    t0 = time.perf_counter()
    new_scene = load_scene(path)
    new_compiled = compile_scene(new_scene)
    if new_compiled.spec == sess.compiled.spec:
        params = sess.compiled.refresh(new_scene)
        sess.scene = new_scene
        sess.params = jnp.asarray(params)
        sess.reset_accumulation()
        return "refresh", time.perf_counter() - t0
    sess.scene = new_scene
    sess.compiled = new_compiled
    sess.params = jnp.asarray(new_compiled.params)
    sess.reset_accumulation()
    return "recompile", time.perf_counter() - t0


def watch_scene(
    sess,
    path: str,
    *,
    frames: int = 4,
    out: Optional[str] = None,
    poll_s: float = 0.5,
    max_events: Optional[int] = None,
    log: Callable[[str], None] = print,
):
    """Poll ``path`` for mtime changes and re-render through the two-speed
    pipeline.  ``max_events`` bounds the loop for scripted use/tests."""
    last_mtime = os.path.getmtime(path)
    events = 0
    t0 = time.perf_counter()
    sess.render(frames)
    if out:
        sess.save_image(out)
    log(
        f"initial render: {frames} frames in {time.perf_counter() - t0:.2f}s"
        + (f" -> {out}" if out else "")
    )
    while max_events is None or events < max_events:
        time.sleep(poll_s)
        try:
            mtime = os.path.getmtime(path)
        except OSError:
            continue  # mid-save; retry
        if mtime == last_mtime:
            continue
        last_mtime = mtime
        try:
            kind, lower_s = apply_scene_file(sess, path)
        except Exception as e:  # malformed mid-edit JSON: keep watching
            log(f"edit ignored ({type(e).__name__}: {e})")
            continue
        t0 = time.perf_counter()
        sess.render(frames)
        render_s = time.perf_counter() - t0
        if out:
            sess.save_image(out)
        if kind == "refresh":
            log(
                f"[value edit] param refresh {lower_s * 1e3:.2f} ms "
                f"(kernel reused) + {frames} frames {render_s:.2f}s"
            )
        else:
            log(
                f"[structure edit] re-lower {lower_s * 1e3:.2f} ms + "
                f"pipeline recompile+render {render_s:.2f}s"
            )
        events += 1
    return events
