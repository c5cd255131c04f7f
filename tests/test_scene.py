"""Scene model / compiler tests: slot dedupe, two-speed refresh,
duplicate-with-rehash, JSON round-trips, spec stability
(reference behaviors: src/sdf_editor/primitives.rs, sdf_editor.rs:131-167)."""

import numpy as np
import pytest

from compute_path_tracer_tpu.scene import (
    KIND_CUBE,
    KIND_SPHERE,
    SUBTRACTION,
    Param,
    Scene,
    Shape,
    Union,
    compile_scene,
    load_scene,
    save_scene,
    sphere_and_plane,
)
from compute_path_tracer_tpu.scene.params import SENTINEL, ParamTable


def test_param_table_dedupes_by_uid():
    t = ParamTable()
    p = Param("a", 1.5)
    i1 = t.slot(p)
    i2 = t.slot(p)
    assert i1 == i2
    q = Param("a", 1.5)  # same value, different identity
    assert t.slot(q) != i1


def test_param_table_sentinel():
    t = ParamTable()
    v = t.vector()
    assert v.shape == (1,)
    assert np.isclose(v[0], SENTINEL)


def test_compile_assigns_dense_shape_ids():
    scene = sphere_and_plane()
    cs = compile_scene(scene)
    ids = sorted(s.shape_id for s in cs.spec.iter_shapes())
    assert ids == list(range(cs.spec.n_shapes))
    assert cs.spec.n_shapes == 3


def test_compile_order_child_unions_before_shapes():
    root = Union(name="Root")
    inner = root.add_union(Union(name="Inner"))
    inner.add_shape(Shape(KIND_SPHERE, name="nested"))
    root.add_shape(Shape(KIND_SPHERE, name="own"))
    cs = compile_scene(Scene([root]))
    names_in_order = [s.shape_id for s in cs.spec.iter_shapes()]
    # nested union's shape compiles first (containers.rs:156-166)
    assert cs.spec.roots[0].children_unions[0].children_shapes[0].shape_id == 0
    assert cs.spec.roots[0].children_shapes[0].shape_id == 1
    assert names_in_order == [0, 1]


def test_refresh_updates_values_without_recompile():
    scene = sphere_and_plane()
    cs = compile_scene(scene)
    spec_before = cs.spec
    ball = scene.roots[0].children_shapes[0]
    slot = cs.spec.roots[0].children_shapes[0].size[0]
    assert np.isclose(cs.params[slot], 1.0)

    ball.size.set(2.5)
    new_params = cs.refresh(scene)
    assert np.isclose(new_params[slot], 2.5)
    assert cs.spec is spec_before  # structure untouched


def test_refresh_rejects_structural_change():
    scene = sphere_and_plane()
    cs = compile_scene(scene)
    scene.roots[0].add_shape(Shape(KIND_SPHERE, name="new"))
    with pytest.raises(KeyError):
        cs.refresh(scene)


def test_duplicate_gets_fresh_slots():
    scene = sphere_and_plane()
    ball = scene.roots[0].children_shapes[0]
    dupe = ball.duplicate()
    scene.roots[0].add_shape(dupe)
    cs = compile_scene(scene)
    s0 = cs.spec.roots[0].children_shapes[0]
    s3 = cs.spec.roots[0].children_shapes[3]
    # duplicate-with-rehash (containers.rs:135-138): no shared slots
    assert s0.size[0] != s3.size[0]
    assert set(s0.material).isdisjoint(s3.material)


def test_shared_param_shares_slot():
    # Two shapes literally sharing one Param object share a data slot,
    # like reference params sharing a Float.hash.
    root = Union(name="Root")
    a = root.add_shape(Shape(KIND_SPHERE))
    b = root.add_shape(Shape(KIND_SPHERE))
    b.size = a.size
    cs = compile_scene(Scene([root]))
    sa, sb = cs.spec.roots[0].children_shapes
    assert sa.size[0] == sb.size[0]


def test_json_roundtrip_preserves_identity_and_values(tmp_path):
    scene = sphere_and_plane()
    cs1 = compile_scene(scene)
    path = str(tmp_path / "scene.json")
    save_scene(scene, path)
    loaded = load_scene(path)
    cs2 = compile_scene(loaded)
    # Identical structure and identical param layout/values after reload.
    assert cs1.spec == cs2.spec
    np.testing.assert_array_equal(cs1.params, cs2.params)


def test_spec_is_hashable_and_stable():
    scene = sphere_and_plane()
    cs1 = compile_scene(scene)
    cs2 = compile_scene(scene)
    assert hash(cs1.spec) == hash(cs2.spec)
    assert cs1.spec == cs2.spec  # same jit cache entry


def test_subtraction_and_cube_compile():
    root = Union(name="Root", op=SUBTRACTION)
    c = root.add_shape(Shape(KIND_CUBE))
    c.size3.set(1.0, 2.0, 3.0)
    cs = compile_scene(Scene([root]))
    ss = cs.spec.roots[0].children_shapes[0]
    assert len(ss.size) == 3
    vals = [cs.params[i] for i in ss.size]
    np.testing.assert_allclose(vals, [1.0, 2.0, 3.0])


def test_save_map_overwrite_guard(tmp_path):
    """save_map refuses to clobber an existing map unless overwrite=True
    (the reference's overwrite-warning dialog, sdf_editor.rs:169-181)."""
    import pytest

    from compute_path_tracer_tpu.scene import save_map, sphere_and_plane
    from compute_path_tracer_tpu.scene.io import load_map

    scene = sphere_and_plane()
    save_map(scene, "guard", maps_dir=str(tmp_path))
    with pytest.raises(FileExistsError):
        save_map(scene, "guard", maps_dir=str(tmp_path))
    save_map(scene, "guard", maps_dir=str(tmp_path), overwrite=True)
    assert load_map("guard", maps_dir=str(tmp_path)).name == scene.name


def test_benchmark_scene_spacing_variant():
    """The sparse-regime knob (benchmarks/optin_benchmark.py) produces a
    distinct deterministic scene with the same shape count."""
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    a = compile_scene(benchmark_scene(16))
    b = compile_scene(benchmark_scene(16, spacing=6.4))
    assert a.spec.n_shapes == b.spec.n_shapes
    assert a.spec != b.spec or (a.params != b.params).any()
    b2 = compile_scene(benchmark_scene(16, spacing=6.4))
    import numpy as np
    np.testing.assert_array_equal(np.asarray(b.params), np.asarray(b2.params))
