"""Checkpoint / resume for render and optimization state.

The reference only persists the editable scene tree (sdf_editor.rs:131-167)
and throws accumulation state away on any edit.  The TPU build checkpoints
more (SURVEY.md §5 "Checkpoint / resume"): scene JSON, the flat parameter
vector, the progressive accumulator with its frame counters (deterministic
resume - the RNG is a pure function of pixel+frame, so restoring
``frame``/``last_clear`` resumes the exact sample sequence), and optimizer
state for inverse rendering.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

from ..scene.io import save_scene, load_scene
from ..scene.model import Scene


def save_checkpoint(
    path: str,
    *,
    scene: Optional[Scene] = None,
    params: Optional[np.ndarray] = None,
    accum: Optional[np.ndarray] = None,
    frame: int = 0,
    last_clear: int = 0,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a checkpoint directory: scene.json + state.npz + meta.json."""
    os.makedirs(path, exist_ok=True)
    if scene is not None:
        save_scene(scene, os.path.join(path, "scene.json"))
    arrays = {}
    if params is not None:
        arrays["params"] = np.asarray(params, np.float32)
    if accum is not None:
        arrays["accum"] = np.asarray(accum, np.float32)
    if extra:
        for k, v in extra.items():
            arrays[f"extra_{k}"] = np.asarray(v)
    np.savez(os.path.join(path, "state.npz"), **arrays)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"frame": int(frame), "last_clear": int(last_clear)}, f)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint directory back into a dict."""
    out: Dict[str, Any] = {}
    scene_path = os.path.join(path, "scene.json")
    if os.path.exists(scene_path):
        out["scene"] = load_scene(scene_path)
    npz_path = os.path.join(path, "state.npz")
    if os.path.exists(npz_path):
        with np.load(npz_path) as z:
            for k in z.files:
                if k.startswith("extra_"):
                    out.setdefault("extra", {})[k[len("extra_"):]] = z[k]
                else:
                    out[k] = z[k]
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            out.update(json.load(f))
    return out


# -- Orbax backend -----------------------------------------------------------
#
# For large accumulators / multi-host runs the npz path above serializes
# through host memory on one process; Orbax writes sharded arrays directly
# (OCDBT), handles atomicity, and is the standard JAX checkpoint layer.
# Same logical contents as the npz format: scene JSON rides along as a file,
# arrays + counters go through the Orbax pytree handler.


def save_checkpoint_orbax(
    path: str,
    *,
    scene: Optional[Scene] = None,
    params=None,
    accum=None,
    frame: int = 0,
    last_clear: int = 0,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Orbax (OCDBT) checkpoint with the same logical layout as
    :func:`save_checkpoint`.  ``params``/``accum`` may be (sharded) jax
    arrays; they are written as-is by Orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    if scene is not None:
        save_scene(scene, os.path.join(path, "scene.json"))
    tree: Dict[str, Any] = {
        "frame": np.int64(frame),
        "last_clear": np.int64(last_clear),
    }
    if params is not None:
        tree["params"] = params
    if accum is not None:
        tree["accum"] = accum
    if extra:
        tree["extra"] = dict(extra)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state.orbax"), tree, force=True)


def load_checkpoint_orbax(path: str) -> Dict[str, Any]:
    """Load an Orbax checkpoint written by :func:`save_checkpoint_orbax`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    out: Dict[str, Any] = {}
    scene_path = os.path.join(path, "scene.json")
    if os.path.exists(scene_path):
        out["scene"] = load_scene(scene_path)
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.join(path, "state.orbax"))
    for k, v in tree.items():
        out[k] = v
    out["frame"] = int(out.get("frame", 0))
    out["last_clear"] = int(out.get("last_clear", 0))
    return out
