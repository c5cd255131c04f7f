"""CLI surface tests (app/cli.py): render to PNG + checkpoint, optimize
self-target demo, info, scene loading from JSON path and builtin names."""

import json
import os

import numpy as np
import pytest

from compute_path_tracer_tpu.app.cli import main
from compute_path_tracer_tpu.io.png import load_png_rgba


def test_render_builtin_scene(tmp_path):
    out = str(tmp_path / "r.png")
    ck = str(tmp_path / "ck")
    rc = main([
        "render", "--scene", "sphere_and_plane", "--width", "32", "--height", "32",
        "--frames", "2", "--bounces", "1", "--out", out, "--checkpoint", ck,
    ])
    assert rc == 0
    img = load_png_rgba(out)
    assert img.shape == (32, 32, 4)
    assert sorted(os.listdir(ck)) == ["meta.json", "scene.json", "state.npz"]
    meta = json.load(open(os.path.join(ck, "meta.json")))
    assert meta["frame"] == 2


def test_render_scene_json_and_aces(tmp_path):
    from compute_path_tracer_tpu.scene import save_scene, sphere_and_plane

    p = str(tmp_path / "s.json")
    save_scene(sphere_and_plane(), p)
    out = str(tmp_path / "o.png")
    rc = main([
        "render", "--scene", p, "--width", "16", "--height", "16",
        "--frames", "1", "--bounces", "0", "--debug", "2",
        "--out", out, "--tonemap", "aces",
    ])
    assert rc == 0
    assert load_png_rgba(out).shape == (16, 16, 4)


def test_unknown_scene_lists_builtins():
    with pytest.raises(SystemExit) as e:
        main(["render", "--scene", "nope_nothing"])
    assert "sphere_and_plane" in str(e.value)


def test_optimize_self_target():
    rc = main([
        "optimize", "--scene", "sphere_and_plane", "--width", "16",
        "--height", "16", "--bounces", "0", "--steps", "3", "--perturb", "0.02",
    ])
    assert rc == 0


def test_info(capsys):
    assert main(["info"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["platform"] == "cpu"
    assert out["global_devices"] == 8


def test_optimize_position_recovery_cli(capsys):
    rc = main([
        "optimize", "--scene", "edge_demo", "--width", "24", "--height", "24",
        "--bounces", "0", "--steps", "5", "--perturb", "0.2",
        "--perturb-what", "position", "--edge-grad", "--lr", "0.05",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "position slot" in out and "recovered" in out


def test_demo_cli_seeds_and_renders(tmp_path, capsys):
    scene = str(tmp_path / "live.json")
    out = str(tmp_path / "live.png")
    rc = main([
        "demo", "--scene", scene, "--seed", "sphere_and_plane",
        "--width", "16", "--height", "16", "--frames", "1", "--bounces", "0",
        "--debug", "2", "--out", out, "--max-events", "0",
    ])
    assert rc == 0
    assert os.path.exists(scene) and os.path.exists(out)
    assert "seeded" in capsys.readouterr().out
