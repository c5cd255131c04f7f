"""Reference (oracle) renderer tests: debug modes as cheap deterministic
fixtures, accumulation math, CSG semantics end-to-end (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from compute_path_tracer_tpu.scene import (
    KIND_CUBE,
    KIND_PLANE,
    KIND_SPHERE,
    SUBTRACTION,
    Scene,
    Shape,
    Union,
    compile_scene,
    csg_demo,
    sphere_and_plane,
)
from compute_path_tracer_tpu.render import render_accumulated, render_frame

W = H = 64


def _simple_sphere_scene(color=(0.9, 0.3, 0.2)):
    root = Union(name="Root")
    s = root.add_shape(Shape(KIND_SPHERE, name="Ball"))
    s.size.set(1.0)
    s.material.color.set(*color)
    return Scene([root])


def test_albedo_mode_sees_sphere_color():
    cs = compile_scene(_simple_sphere_scene())
    img = np.asarray(
        render_frame(cs.spec, cs.params, width=W, height=H, debug=2)
    )
    assert img.shape == (H, W, 3)
    center = img[H // 2, W // 2]
    np.testing.assert_allclose(center, [0.9, 0.3, 0.2], atol=1e-5)
    # corners miss -> MDEF black
    np.testing.assert_allclose(img[0, 0], [0, 0, 0], atol=1e-6)


def test_normals_mode_shape_and_range():
    cs = compile_scene(_simple_sphere_scene())
    img = np.asarray(render_frame(cs.spec, cs.params, width=W, height=H, debug=1))
    assert np.isfinite(img).all()
    # center pixel hits the sphere head on: normal ~ (0,0,-1) ->
    # (n*0.5+0.5)*0.2 + aabb tint (one AABB hit = +0.1)
    center = img[H // 2, W // 2]
    np.testing.assert_allclose(center, [0.2, 0.2, 0.1], atol=0.02)
    # corners: miss -> just the aabb debug tint (0 there)
    np.testing.assert_allclose(img[0, 0], [0.0, 0.0, 0.0], atol=1e-6)


def test_aabb_culling_preserves_image():
    # With AABB on (default) vs off, the albedo image must match: culling
    # only skips work for rays that can't hit.
    scene = _simple_sphere_scene()
    cs_on = compile_scene(scene)
    img_on = np.asarray(render_frame(cs_on.spec, cs_on.params, width=W, height=H, debug=2))
    scene.roots[0].children_shapes[0].transform.aabb = False
    cs_off = compile_scene(scene)
    img_off = np.asarray(render_frame(cs_off.spec, cs_off.params, width=W, height=H, debug=2))
    np.testing.assert_allclose(img_on, img_off, atol=1e-6)


def test_subtraction_carves():
    # Cube with a sphere dimple carved into its front face: the center ray
    # enters the dimple and hits the concave (bite) surface at z=-0.5.
    root = Union(name="Root", op=SUBTRACTION)
    bite = root.add_shape(Shape(KIND_SPHERE, name="Bite"))
    bite.size.set(0.5)
    bite.transform.position.set(0.0, 0.0, -1.0)
    bite.material.color.set(1.0, 1.0, 0.0)
    block = root.add_shape(Shape(KIND_CUBE, name="Block"))
    block.size3.set(1.0, 1.0, 1.0)
    block.material.color.set(0.0, 0.0, 1.0)
    cs = compile_scene(Scene([root]))
    img = np.asarray(render_frame(cs.spec, cs.params, width=W, height=H, debug=2))
    center = img[H // 2, W // 2]
    # The carved hole shows the bite's material on the concave surface.
    np.testing.assert_allclose(center, [1.0, 1.0, 0.0], atol=1e-5)
    # Away from the hole the cube's own face is visible.
    edge = img[H // 2, int(W * 0.25)]
    np.testing.assert_allclose(edge, [0.0, 0.0, 1.0], atol=1e-5)


def test_path_trace_runs_and_is_finite():
    cs = compile_scene(sphere_and_plane())
    img = np.asarray(
        render_frame(cs.spec, cs.params, width=W, height=H, debug=0, bounces=3)
    )
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert img.max() > 0  # the sky light is findable


def test_accumulation_running_mean():
    cs = compile_scene(sphere_and_plane())
    f0 = render_frame(cs.spec, cs.params, width=W, height=H, debug=0, bounces=2,
                      frame=0, last_clear=0)
    f1 = render_frame(cs.spec, cs.params, width=W, height=H, debug=0, bounces=2,
                      frame=1, last_clear=1, accum=f0)
    one_shot_1 = render_frame(cs.spec, cs.params, width=W, height=H, debug=0,
                              bounces=2, frame=1, last_clear=0)
    # mix(f0, s1, 1/2) == (f0 + s1)/2
    np.testing.assert_allclose(
        np.asarray(f1), (np.asarray(f0) + np.asarray(one_shot_1)) / 2.0, atol=1e-6
    )


def test_render_accumulated_matches_manual_loop():
    cs = compile_scene(sphere_and_plane())
    n = 3
    acc = None
    for f in range(n):
        acc = render_frame(cs.spec, cs.params, accum=acc, frame=f, last_clear=f,
                           width=W, height=H, debug=0, bounces=2)
    fused = render_accumulated(cs.spec, cs.params, n, width=W, height=H, bounces=2)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(fused), atol=1e-6)


def test_bounce_heatmap_mode():
    cs = compile_scene(sphere_and_plane())
    img = np.asarray(
        render_frame(cs.spec, cs.params, width=W, height=H, debug=3, bounces=4)
    )
    assert np.isfinite(img).all()
    # heatmap is grayscale (all channels equal) in units of i/bounces
    np.testing.assert_allclose(img[..., 0], img[..., 1])
    assert img.max() <= (4 + 1) / 4 + 1e-6


def test_empty_scene_is_black():
    cs = compile_scene(Scene([Union(name="Root")]))
    img = np.asarray(render_frame(cs.spec, cs.params, width=W, height=H, debug=0))
    np.testing.assert_allclose(img, 0.0)


def test_csg_demo_renders():
    cs = compile_scene(csg_demo())
    img = np.asarray(render_frame(cs.spec, cs.params, width=W, height=H, debug=2))
    assert np.isfinite(img).all()
    # The CSG objects (not just the ground plane) must be visible: expect the
    # block's blue, the orb's white and the ground gray among first hits.
    colors = np.unique(img.reshape(-1, 3), axis=0)
    assert len(colors) >= 4


def test_first_shape_assign_clobbers_child_unions():
    # Faithful reference quirk (containers.rs:156-166 + 244-252): a union's
    # first shape ASSIGNS into the accumulator, overwriting whatever its
    # child unions contributed - unless the shape's AABB guard fails.
    import warnings as _w

    root = Union(name="Root")
    inner = root.add_union(Union(name="Inner"))
    s_in = inner.add_shape(Shape(KIND_SPHERE, name="InnerBall"))
    s_in.size.set(0.5)
    s_in.material.color.set(0.0, 1.0, 0.0)
    plane = Shape(KIND_PLANE, name="Floor")
    plane.transform.position.set(0.0, -2.0, 0.0)
    plane.transform.aabb = False
    plane.material.color.set(1.0, 0.0, 0.0)
    root.children_shapes.append(plane)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        cs = compile_scene(Scene([root]))
    assert any("ASSIGN" in str(r.message) for r in rec)
    img = np.asarray(render_frame(cs.spec, cs.params, width=W, height=H, debug=2))
    center = img[H // 2, W // 2]
    # The inner sphere is clobbered by the floor's unguarded assign: the
    # center ray sees no green, only background (floor is below the ray).
    np.testing.assert_allclose(center, [0, 0, 0], atol=1e-6)


def test_nested_union_transform_and_scale():
    # A sphere inside a scaled+translated union must appear where the
    # composed transform puts it, with distances still correct (no
    # over/under-stepping artifacts): check via albedo hit location.
    root = Union(name="Root")
    inner = root.add_union(Union(name="Inner"))
    inner.transform.position.set(1.0, 0.0, 0.0)
    inner.transform.scale.set(0.5)
    s = inner.add_shape(Shape(KIND_SPHERE))
    s.size.set(1.0)  # world radius 0.5 at world x=+1
    s.material.color.set(0.0, 1.0, 0.0)
    cs = compile_scene(Scene([root]))
    img = np.asarray(render_frame(cs.spec, cs.params, width=128, height=128, debug=2))
    # the sphere is right of center
    right = img[64, 96]
    center = img[64, 64]
    np.testing.assert_allclose(right, [0.0, 1.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(center, [0.0, 0.0, 0.0], atol=1e-5)
