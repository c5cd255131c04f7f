"""Golden-file test of the scene compiler.

The reference keeps its generated GLSL checked in as an accidental golden
file (assets/shaders/path_tracer/shader_out/test_compute.glsl, SURVEY.md §4);
our analog is the compiled SceneSpec of a checked-in scene JSON: any change
to slot assignment, walk order or spec structure shows up as a diff here.
"""

import dataclasses
import json
import os

import numpy as np

from compute_path_tracer_tpu.scene import compile_scene, load_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden", "csg_demo_spec.json")
SCENE = os.path.join(REPO, "data", "maps", "csg_demo.json")


def _spec_dict(spec):
    return dataclasses.asdict(spec)


def test_compiled_spec_matches_golden():
    cs = compile_scene(load_scene(SCENE))
    got = json.loads(json.dumps(_spec_dict(cs.spec)))  # normalize tuples
    with open(GOLDEN) as f:
        want = json.load(f)
    assert got == want


def test_param_vector_matches_golden():
    cs = compile_scene(load_scene(SCENE))
    with open(GOLDEN.replace("_spec.json", "_params.json")) as f:
        want = json.load(f)
    np.testing.assert_allclose(cs.params, np.asarray(want, np.float32), atol=0)
