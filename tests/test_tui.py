"""The in-process TUI editor's controller (app/tui.py): every edit path
drives the live RenderSession through the correct side of the two-speed
split (refresh vs recompile), headlessly - the curses layer is presentation
only."""

import numpy as np
import pytest

from compute_path_tracer_tpu.app.tui import TuiController
from compute_path_tracer_tpu.render.session import RenderSession
from compute_path_tracer_tpu.scene import csg_demo


@pytest.fixture()
def ctl():
    sess = RenderSession(csg_demo(), 32, 32)
    sess.settings.bounces = 1
    return TuiController(sess)


def _row_index(ctl, pred):
    for i, r in enumerate(ctl.rows):
        if pred(r):
            return i
    raise AssertionError("row not found")


def test_rows_cover_tree(ctl):
    kinds = {r.kind for r in ctl.rows}
    assert kinds == {"union", "shape", "param", "flag"}
    assert any("sub" in r.label for r in ctl.rows)  # csg_demo has a subtraction


def test_nudge_is_refresh_not_recompile(ctl):
    """A value drag must reuse the compiled spec (the queue_update path,
    primitives.rs:153-156) and change the live parameter vector."""
    ctl.sel = _row_index(ctl, lambda r: r.kind == "param" and r.label == "pos.x")
    spec_before = ctl.session.compiled.spec
    params_before = np.asarray(ctl.session.params).copy()
    val_before = ctl.current.param.val

    kind, _ms = ctl.nudge(+1)
    assert kind == "refresh"
    assert ctl.current.param.val != val_before
    assert ctl.session.compiled.spec is spec_before
    assert not np.array_equal(np.asarray(ctl.session.params), params_before)
    assert "refresh" in ctl.status


def test_nudge_respects_param_range(ctl):
    ctl.sel = _row_index(ctl, lambda r: r.kind == "param" and r.label == "spec")
    p = ctl.current.param  # percent param, hi = 1.0
    for _ in range(5000):
        p.set(min(p.hi, p.val + 1.0))
        break
    ctl.nudge(+1, factor=1e9)
    assert ctl.current.param.val <= p.hi


def test_toggle_aabb_recompiles(ctl):
    ctl.sel = _row_index(ctl, lambda r: r.kind == "flag")
    shape = ctl.current.node
    before = shape.transform.aabb
    spec_before = ctl.session.compiled.spec
    kind, _ms = ctl.toggle()
    assert kind == "recompile"
    assert shape.transform.aabb is (not before)
    assert ctl.session.compiled.spec is not spec_before


def test_toggle_union_op(ctl):
    ctl.sel = _row_index(ctl, lambda r: r.kind == "union" and "(union)" in r.label)
    u = ctl.current.node
    kind, _ms = ctl.toggle()
    assert kind == "recompile"
    assert u.op == "subtraction"


def test_duplicate_with_rehash_and_delete(ctl):
    ctl.sel = _row_index(ctl, lambda r: r.kind == "shape")
    shape = ctl.current.node
    parent = ctl.current.parent
    n_before = len(parent.children_shapes)
    uid_before = shape.transform.position.x.uid

    kind, _ms = ctl.duplicate()
    assert kind == "recompile"
    assert len(parent.children_shapes) == n_before + 1
    dup = parent.children_shapes[-1]
    # duplicate-with-rehash (containers.rs:135-138): fresh param identities
    assert dup.transform.position.x.uid != uid_before

    ctl.sel = _row_index(ctl, lambda r: r.node is dup)
    kind, _ms = ctl.delete()
    assert kind == "recompile"
    assert len(parent.children_shapes) == n_before


def test_add_shape(ctl):
    ctl.sel = _row_index(ctl, lambda r: r.kind == "union")
    u = ctl.current.node
    n = len(u.children_shapes)
    kind, _ms = ctl.add_shape()
    assert kind == "recompile"
    assert len(u.children_shapes) == n + 1


def test_ascii_preview_renders(ctl):
    lines = ctl.render_ascii(cols=24, rows=8)
    assert len(lines) == 8 and all(len(s) == 24 for s in lines)
    assert any(c != " " for s in lines for c in s)


def test_move_clamps(ctl):
    ctl.move(-100)
    assert ctl.sel == 0
    ctl.move(10**6)
    assert ctl.sel == len(ctl.rows) - 1
