"""Command-line interface: headless render, benchmark, inverse rendering.

The reference is a windowed interactive app with no CLI (SURVEY.md §5
"Config / flag system"); on TPU the interaction model is headless: render N
progressive frames to a PNG, benchmark, or run an inverse-rendering
optimization - with scene JSON files (scene/io.py) taking the place of the
live editor.

Usage:
  python -m compute_path_tracer_tpu.app.cli render --scene csg_demo --frames 64 --out out.png
  python -m compute_path_tracer_tpu.app.cli render --scene path/to/scene.json --backend pallas
  python -m compute_path_tracer_tpu.app.cli optimize --scene sphere_and_plane --steps 50
  python -m compute_path_tracer_tpu.app.cli info
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _load_scene(name: str):
    from ..scene import library
    from ..scene.io import load_scene

    if os.path.exists(name):
        return load_scene(name)
    builder = getattr(library, name, None)
    if builder is None:
        builders = [
            n for n in dir(library)
            if not n.startswith("_") and callable(getattr(library, n))
        ]
        raise SystemExit(f"unknown scene {name!r}; builtins: {', '.join(builders)}")
    return builder()


def cmd_render(args) -> int:
    from ..app.config import Settings
    from ..render.session import RenderSession

    scene = _load_scene(args.scene)
    settings = Settings(
        debug=args.debug, bounces=args.bounces, scale=args.scale, fov=args.fov
    ).validate()

    frame_fn = None
    if args.backend == "pallas":
        from functools import partial

        from ..kernels import render_frame_pallas

        frame_fn = render_frame_pallas
        if args.mode == "analytic":
            # Full-analytic bounce (kernels/megakernel.py analytic_all):
            # union-only scenes, 6.4x the faithful march on TPU.
            frame_fn = partial(render_frame_pallas, geometry="baked",
                               analytic_all=True)
        elif args.mode == "tcull":
            frame_fn = partial(render_frame_pallas, geometry="baked",
                               t_cull=True)
    sess = RenderSession(scene, args.width, args.height, settings, frame_fn=frame_fn)

    t0 = time.perf_counter()
    sess.render(args.frames)
    dt = time.perf_counter() - t0
    sess.save_image(args.out, tonemap=args.tonemap)
    px = sess.render_width * sess.render_height
    print(
        f"rendered {args.frames} frames at {sess.render_width}x{sess.render_height} "
        f"({args.backend}) in {dt:.2f}s "
        f"({px * args.frames / dt / 1e6:.1f} Mpix/s) -> {args.out}"
    )
    if args.checkpoint:
        import numpy as np

        from ..io.checkpoint import save_checkpoint

        save_checkpoint(
            args.checkpoint,
            scene=scene,
            params=np.asarray(sess.params),
            accum=np.asarray(sess.accum),
            frame=sess.frame,
            last_clear=sess.last_clear,
        )
        print(f"checkpoint -> {args.checkpoint}")
    return 0


def cmd_optimize(args) -> int:
    import jax.numpy as jnp
    import numpy as np

    from ..diff import optimize_to_target, render_image_diff
    from ..scene import compile_scene

    scene = _load_scene(args.scene)
    cs = compile_scene(scene)

    if args.target:
        from ..io.png import load_png_rgba

        rgba = load_png_rgba(args.target).astype(np.float32) / 255.0
        target = jnp.asarray(rgba[..., :3] ** 2.2)  # undo export gamma
    else:
        # Self-target demo: perturb params, recover the original scene.
        target = render_image_diff(
            cs.spec, jnp.asarray(cs.params), width=args.width, height=args.height,
            bounces=args.bounces, spp=args.spp,
        )

    rng = np.random.default_rng(0)
    init = np.asarray(cs.params, np.float32)
    mask = None
    pos_slot = None
    if args.perturb_what == "position":
        # Silhouette-recovery demo: offset one shape's x-position and
        # optimize ONLY that slot back.  Smooth gradients are (near) zero for
        # a position - this is the case --edge-grad exists for.
        pos_slot = cs.spec.roots[0].children_shapes[0].transform.pos[0]
        init[pos_slot] += args.perturb
        mask = np.zeros_like(init)
        mask[pos_slot] = 1.0
        print(f"perturbed position slot {pos_slot} by {args.perturb:+.3f}")
    else:
        init = init + rng.normal(0, args.perturb, init.shape).astype(np.float32)

    result = optimize_to_target(
        cs.spec, init, target, width=args.width, height=args.height,
        bounces=args.bounces, spp=args.spp, steps=args.steps,
        learning_rate=args.lr, param_mask=mask, edge_grad=args.edge_grad,
        edge_secondary=args.edge_secondary, fused=args.fused,
        callback=lambda i, l: print(f"step {i:4d} loss {l:.6f}")
        if i % max(1, args.steps // 10) == 0 else None,
    )
    print(f"final loss {result.losses[-1]:.6f} (from {result.losses[0]:.6f})")
    if pos_slot is not None:
        true_x = float(np.asarray(cs.params)[pos_slot])
        got_x = float(np.asarray(result.params)[pos_slot])
        print(f"position slot {pos_slot}: true {true_x:+.4f} "
              f"recovered {got_x:+.4f} (started {init[pos_slot]:+.4f})")
    return 0


def cmd_demo(args) -> int:
    """Two-speed live-editing demo: watch a scene JSON and re-render on save,
    printing refresh-vs-recompile cost (the reference's live editor loop,
    sdf_editor.rs:35-47, headless)."""
    from ..app.config import Settings
    from ..app.demo import watch_scene
    from ..render.session import RenderSession
    from ..scene.io import load_scene, save_scene

    if not os.path.exists(args.scene):
        # Seed the watch file from a builtin so there's something to edit.
        seed = _load_scene(args.seed)
        save_scene(seed, args.scene)
        print(f"seeded {args.scene} from builtin '{args.seed}' - edit it and save")
    scene = load_scene(args.scene)
    settings = Settings(debug=args.debug, bounces=args.bounces).validate()
    frame_fn = None
    if args.backend == "pallas":
        from ..kernels import render_frame_pallas

        frame_fn = render_frame_pallas
    if args.tui:
        from ..app.tui import run_tui

        run_tui(scene, args.width, args.height, settings=settings,
                frame_fn=frame_fn)
        return 0
    sess = RenderSession(scene, args.width, args.height, settings, frame_fn=frame_fn)
    print(f"watching {args.scene} (ctrl-c to stop); renders -> {args.out}")
    try:
        watch_scene(
            sess, args.scene, frames=args.frames, out=args.out,
            max_events=args.max_events,
        )
    except KeyboardInterrupt:
        pass
    return 0


def cmd_info(args) -> int:
    import jax

    from ..parallel import local_device_info

    info = local_device_info()
    info["devices"] = [str(d) for d in jax.devices()]
    print(json.dumps(info, indent=2))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="compute_path_tracer_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render", help="headless progressive render to PNG")
    r.add_argument("--scene", default="csg_demo", help="builtin name or JSON path")
    r.add_argument("--width", type=int, default=512)
    r.add_argument("--height", type=int, default=512)
    r.add_argument("--frames", type=int, default=16)
    r.add_argument("--bounces", type=int, default=8)
    r.add_argument("--debug", type=int, default=0, choices=(0, 1, 2, 3))
    r.add_argument("--fov", type=float, default=1.0)
    r.add_argument("--scale", type=float, default=1.0)
    r.add_argument("--backend", default="xla", choices=("xla", "pallas"))
    r.add_argument("--mode", default="faithful",
                   choices=("faithful", "tcull", "analytic"),
                   help="pallas only: faithful march, t-interval-culled "
                        "march, or the full-analytic bounce (union-only "
                        "scenes; fastest)")
    r.add_argument("--out", default="image.png")
    r.add_argument("--tonemap", default="gamma", choices=("gamma", "aces"))
    r.add_argument("--checkpoint", default=None)
    r.set_defaults(fn=cmd_render)

    o = sub.add_parser("optimize", help="inverse rendering to a target image")
    o.add_argument("--scene", default="sphere_and_plane")
    o.add_argument("--target", default=None, help="PNG target (default: self-target demo)")
    o.add_argument("--width", type=int, default=64)
    o.add_argument("--height", type=int, default=64)
    o.add_argument("--bounces", type=int, default=2)
    o.add_argument("--spp", type=int, default=1,
                   help="samples per optimizer step (works on the XLA AND "
                        "the fused path; fused averages frame streams)")
    o.add_argument("--steps", type=int, default=50)
    o.add_argument("--lr", type=float, default=2e-2)
    o.add_argument("--perturb", type=float, default=0.05)
    o.add_argument("--fused", action="store_true",
                   help="use the fused train kernel (kernels/train.py): "
                   "forward + per-pixel backward on-chip")
    o.add_argument("--perturb-what", default="all", choices=("all", "position"),
                   help="'position': offset one shape's x and recover it "
                        "(pair with --edge-grad)")
    o.add_argument("--edge-grad", action="store_true",
                   help="add reparameterized silhouette gradients (with "
                        "--fused: the fused primary edge term)")
    o.add_argument("--edge-secondary", action="store_true",
                   help="extend edge gradients to SECONDARY-bounce "
                        "visibility (per-bounce coverage; works with "
                        "--fused too)")
    o.set_defaults(fn=cmd_optimize)

    d = sub.add_parser(
        "demo", help="watch a scene JSON; re-render on save (two-speed edits)"
    )
    d.add_argument("--scene", default="data/maps/live.json", help="JSON to watch")
    d.add_argument("--seed", default="csg_demo", help="builtin to seed the file from")
    d.add_argument("--width", type=int, default=256)
    d.add_argument("--height", type=int, default=256)
    d.add_argument("--frames", type=int, default=4)
    d.add_argument("--bounces", type=int, default=4)
    d.add_argument("--debug", type=int, default=0, choices=(0, 1, 2, 3))
    d.add_argument("--backend", default="xla", choices=("xla", "pallas"))
    d.add_argument("--out", default="live.png")
    d.add_argument("--max-events", type=int, default=None,
                   help="stop after N edits (default: run until ctrl-c)")
    d.add_argument("--tui", action="store_true",
                   help="interactive terminal editor (arrow-key param "
                   "nudging on the live scene tree) instead of file-watch")
    d.set_defaults(fn=cmd_demo)

    i = sub.add_parser("info", help="device / topology info")
    i.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
