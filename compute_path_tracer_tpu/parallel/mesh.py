"""Device-mesh tile sharding and parameter-gradient collectives.

The distribution layer the reference doesn't have (SURVEY.md §2.3: the
reference is single-process single-GPU; its only parallelism is the pixel
workgroup grid).  The TPU-native scaling story from BASELINE.json:

* **tile data parallelism**: the image's row bands are sharded over a 1-D
  ``tiles`` mesh axis with ``shard_map``; each chip renders its band with the
  same per-pixel RNG it would get in a single-chip render (the RNG is a pure
  function of absolute pixel coords, so sharding is bit-invariant);
* **replicated scene parameters**: the flat param vector (the ``data[]``
  analog) is replicated, like the single SSBO shared by all GPU threads
  (primitives.rs:59-157);
* **gradient all-reduce over ICI**: the backward pass produces per-band
  partial parameter gradients which ``lax.psum`` reduces across chips - the
  NCCL-equivalent is XLA collectives over ICI, not a port of any GPU
  transport;
* **multi-host**: the same program runs under ``jax.distributed.initialize``
  (see distributed.py); the mesh simply spans all processes' devices.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import DEFAULT_BOUNCES, DEFAULT_FOV
from ..render.reference import render_pixels
from ..scene.compile import SceneSpec

TILE_AXIS = "tiles"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the tile axis.  On a multi-host pod slice the device
    order keeps each host's chips contiguous so bands ride ICI."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (TILE_AXIS,))


def _band_coords(height: int, width: int, n_bands: int):
    """Per-shard absolute pixel coordinates for this chip's row band."""
    band_h = height // n_bands
    y0 = lax.axis_index(TILE_AXIS) * band_h
    xs = lax.broadcasted_iota(jnp.int32, (band_h, width), 1)
    ys = y0 + lax.broadcasted_iota(jnp.int32, (band_h, width), 0)
    return xs, ys


def render_frame_sharded(
    spec: SceneSpec,
    params,
    mesh: Mesh,
    accum=None,
    frame=0,
    last_clear=0,
    *,
    width: int = 256,
    height: int = 256,
    debug: int = 0,
    bounces: int = DEFAULT_BOUNCES,
    fov: float = DEFAULT_FOV,
    aspect: float = None,
    backend: str = "pallas",
    tile: tuple = None,
    geometry: str = "faithful",
    t_cull: bool = False,
    analytic_all: bool = False,
    interpret: bool = None,
):
    """One progressively-accumulated frame with row bands sharded over the
    mesh.  Bit-identical to the single-chip renderer for the same inputs:
    only the pixel->chip assignment changes.

    ``backend="pallas"`` (default) runs the Pallas MEGAKERNEL inside each
    shard - the sharded layer distributes the same whole-screen dispatch the
    reference issues (src/path_tracer/path_tracer.rs:141-145), not the slower
    XLA oracle; each shard's kernel gets its band's absolute row offset so
    the per-pixel RNG/camera (pure functions of absolute coords) match the
    single-chip render bit-for-bit.  ``backend="oracle"`` keeps the jnp
    reference path.  ``interpret`` forces Pallas interpret mode (defaults to
    True off-TPU so the virtual CPU mesh can execute the kernel).

    ``height`` must be divisible by the mesh size.
    """
    if aspect is None:
        aspect = width / height
    n = mesh.devices.size
    if height % n:
        raise ValueError(f"height {height} not divisible by mesh size {n}")
    band_h = height // n
    if accum is None:
        accum = jnp.zeros((height, width, 3), jnp.float32)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if tile is None:
        th = band_h if band_h < 64 else 64
        tile = (th, 128)

    run = _sharded_frame_runner(
        spec, mesh, backend, width, height, debug, band_h, tile,
        geometry, t_cull, interpret, analytic_all,
    )
    return run(
        jnp.asarray(params, jnp.float32),
        jnp.asarray(accum, jnp.float32),
        jnp.asarray(frame, jnp.int32),
        jnp.asarray(last_clear, jnp.int32),
        jnp.asarray(bounces, jnp.int32),
        jnp.asarray(fov, jnp.float32),
        jnp.asarray(aspect, jnp.float32),
    )


@lru_cache(maxsize=64)
def _sharded_frame_runner(spec, mesh, backend, width, height, debug, band_h,
                          tile, geometry, t_cull, interpret,
                          analytic_all=False):
    """Build (once per static configuration) the jitted shard_map'd frame
    function.  Building it inside every render_frame_sharded call re-traced
    the whole sharded program per frame - measured as a 4x 'overhead' on the
    1-device-mesh scaling benchmark before round 3 cached it here."""
    n = mesh.devices.size

    if backend == "pallas":
        from ..kernels.megakernel import _pad_to, _pallas_frame_planes

        th, tw = tile
        if band_h % th:
            raise ValueError(f"band height {band_h} not a multiple of tile {th}")

        @jax.jit
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(TILE_AXIS), P(), P(), P(), P(), P()),
            out_specs=P(TILE_AXIS),
            # pallas_call outputs can't declare varying-mesh-axes metadata
            # yet; the kernel is pointwise per band, so the vma check adds
            # nothing here.
            check_vma=False,
        )
        def run_pallas(params, accum_band, frame, last_clear, bounces, fov, aspect):
            y0 = lax.axis_index(TILE_AXIS) * band_h
            planes = _pad_to(
                jnp.transpose(accum_band, (2, 0, 1)), th, tw
            )
            out = _pallas_frame_planes(
                spec, params, planes, frame, last_clear, bounces, fov, aspect,
                y0,
                width=width, height=height, debug=debug,
                tile_h=th, tile_w=tw,
                geometry=geometry, t_cull=t_cull,
                analytic_all=analytic_all, interpret=interpret,
            )
            return jnp.transpose(out[:, :band_h, :width], (1, 2, 0))

        return run_pallas

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(TILE_AXIS), P(), P(), P(), P(), P()),
        out_specs=P(TILE_AXIS),
    )
    def run(params, accum_band, frame, last_clear, bounces, fov, aspect):
        xs, ys = _band_coords(height, width, n)
        col = render_pixels(
            spec, params, xs, ys, frame, bounces, fov, aspect,
            width=width, height=height, debug=debug,
        ).stack()
        if debug != 0:
            return col
        w = 1.0 / (last_clear.astype(jnp.float32) + 1.0)
        return accum_band * (1.0 - w) + col * w

    return run


def make_sharded_frame_fn(mesh: Mesh):
    """Adapt the tile-sharded renderer to the RenderSession frame_fn
    signature, so a session can run distributed:
    ``RenderSession(scene, w, h, frame_fn=make_sharded_frame_fn(mesh))``."""

    def frame_fn(spec, params, accum=None, frame=0, last_clear=0, **kw):
        return render_frame_sharded(
            spec, params, mesh, accum=accum, frame=frame, last_clear=last_clear, **kw
        )

    return frame_fn


def render_samples_sharded(
    spec: SceneSpec,
    params,
    mesh: Mesh,
    frames_per_device: int = 1,
    frame0: int = 0,
    *,
    width: int = 256,
    height: int = 256,
    bounces: int = DEFAULT_BOUNCES,
    fov: float = DEFAULT_FOV,
    aspect: float = None,
    backend: str = "oracle",
    tile: tuple = None,
    geometry: str = "baked",
    t_cull: bool = True,
    interpret: bool = None,
):
    """Sample (ray-batch) parallelism: every chip renders the FULL image with
    a disjoint set of frame indices (= RNG sample streams), and the running
    mean is an all-reduce.

    This is the second sharding axis from BASELINE.json ("ray batches over
    chips"): orthogonal to tile sharding, it scales samples-per-second at a
    fixed resolution.  The result equals a single-chip progressive
    accumulation of ``n_devices * frames_per_device`` frames starting at
    ``frame0`` (the running mean is frame-order invariant).

    ``backend="pallas"`` runs each chip's frame loop through the MEGAKERNEL
    with the accumulator held planar on-device (the fused accumulation of
    kernels/megakernel.py), psum-ing only the final mean.
    """
    if aspect is None:
        aspect = width / height
    n = mesh.devices.size
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    if backend == "pallas":
        from ..kernels.megakernel import DEFAULT_TILE, _pallas_frame_planes

        th, tw = tile or DEFAULT_TILE
        th = min(th, -(-height // 8) * 8) if height < th else th
        ph = -(-height // th) * th
        pw = -(-width // tw) * tw

        @jax.jit
        @partial(jax.shard_map, mesh=mesh, in_specs=(P(),), out_specs=P(),
                 check_vma=False)
        def run_pallas(params):
            dev = lax.axis_index(TILE_AXIS)
            acc0 = jnp.zeros((3, ph, pw), jnp.float32) + dev.astype(jnp.float32) * 0.0

            def body(k, accum):
                # Disjoint RNG stream per (chip, k); the chip-local running
                # mean weights by k, so psum/n is the global equal-weight
                # mean over all n * frames_per_device frames.
                f = frame0 + dev * frames_per_device + k
                return _pallas_frame_planes(
                    spec, params, accum, f, k,
                    jnp.int32(bounces), jnp.float32(fov), jnp.float32(aspect),
                    width=width, height=height, debug=0,
                    tile_h=th, tile_w=tw,
                    geometry=geometry, t_cull=t_cull, interpret=interpret,
                )

            acc = lax.fori_loop(0, frames_per_device, body, acc0)
            img = jnp.transpose(acc[:, :height, :width], (1, 2, 0))
            return lax.psum(img, TILE_AXIS) / n

        return run_pallas(jnp.asarray(params, jnp.float32))

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=(P(),), out_specs=P())
    def run(params):
        dev = lax.axis_index(TILE_AXIS)
        xs = lax.broadcasted_iota(jnp.int32, (height, width), 1)
        ys = lax.broadcasted_iota(jnp.int32, (height, width), 0)

        def body(k, acc):
            f = frame0 + dev * frames_per_device + k
            col = render_pixels(
                spec, params, xs, ys, f, jnp.int32(bounces),
                jnp.float32(fov), jnp.float32(aspect),
                width=width, height=height, debug=0,
            ).stack()
            return acc + col

        # Derive the init from the (varying) device index so the scan carry
        # has consistent mesh-axis visibility.
        acc0 = jnp.zeros((height, width, 3), jnp.float32) + dev.astype(jnp.float32) * 0.0
        acc = lax.fori_loop(0, frames_per_device, body, acc0)
        return lax.psum(acc, TILE_AXIS) / (n * frames_per_device)

    return run(jnp.asarray(params, jnp.float32))


def make_sharded_train_step(
    spec: SceneSpec,
    mesh: Mesh,
    *,
    width: int,
    height: int,
    bounces: int = 2,
    fov: float = DEFAULT_FOV,
    aspect: float = None,
    learning_rate: float = 2e-2,
    march: str = "xla",
    geometry: str = "faithful",
    march_interpret: bool = None,
    normals: str = "central",
):
    """Build the distributed inverse-rendering training step.

    Loss = mean squared error between the rendered frame and a target image;
    each chip differentiates its own row band w.r.t. the *replicated* param
    vector and the per-band partial gradients are ``psum``-reduced over ICI
    (BASELINE.json config #5).  Returns ``step(params, target, frame)`` ->
    ``(new_params, loss)``; plain SGD here - optimizer-state variants live in
    diff/inverse.py.

    ``bounces`` is static so the bounce loop is a scan (reverse-mode
    differentiable).  ``march="pallas"`` marches each band's rays with the
    on-chip kernel in BOTH directions (kernels/march.py: Pallas forward +
    implicit-gradient custom_vjp) - the sharded training step then never
    runs an 80-tap march in XLA, matching the single-chip fwd+bwd bench
    configuration.  ``normals`` passes through to render_pixels_diff
    (diff/vjp.py): "kernel" computes the (detached) 6-tap normal inside the
    march kernel - the fast-gradient training configuration.
    """
    if aspect is None:
        aspect = width / height
    if march != "pallas" and normals != "central":
        # The XLA branch below calls render_pixels without a normals
        # argument; silently ignoring a non-default request would return
        # default-normal gradients with no error.
        raise ValueError(
            f'normals="{normals}" requires march="pallas" '
            "(the XLA branch always uses central-difference normals)"
        )
    n = mesh.devices.size
    if height % n:
        raise ValueError(f"height {height} not divisible by mesh size {n}")
    denom = float(width * height * 3)
    if march_interpret is None:
        march_interpret = jax.devices()[0].platform != "tpu"

    # Forward-only sharded sum of squared error; differentiation happens
    # OUTSIDE the shard_map region so its AD inserts the correct psums for
    # the replicated parameter cotangent (the backward's parameter-gradient
    # all-reduce over ICI).  Hand-psumming a grad taken inside the region
    # double-counts contributions that shard_map's varying-axis transpose
    # already reduces (e.g. the material-table gather).
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(TILE_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    def sse(params, target_band, frame):
        xs, ys = _band_coords(height, width, n)
        if march == "pallas":
            from ..diff.vjp import render_pixels_diff

            col = render_pixels_diff(
                spec, params, xs, ys, frame, bounces,
                jnp.float32(fov), jnp.float32(aspect),
                width=width, height=height, geometry=geometry,
                march="pallas", march_interpret=march_interpret,
                normals=normals,
            ).stack()
        else:
            col = render_pixels(
                spec, params, xs, ys, frame, bounces,
                jnp.float32(fov), jnp.float32(aspect),
                width=width, height=height, debug=0,
            ).stack()
        return lax.psum(jnp.sum((col - target_band) ** 2), TILE_AXIS)

    @jax.jit
    def step(params, target, frame):
        def loss_fn(p):
            return sse(p, target, frame) / denom

        loss, grad = jax.value_and_grad(loss_fn)(params)
        new_params = params - learning_rate * grad
        return new_params, loss

    return step


def make_fused_sharded_train_step(
    spec: SceneSpec,
    mesh: Mesh,
    *,
    width: int,
    height: int,
    bounces: int = 2,
    fov: float = DEFAULT_FOV,
    aspect: float = None,
    learning_rate: float = 2e-2,
    tile=None,
    interpret: bool = None,
    analytic_unboxed: bool = False,
    edge_grad: bool = False,
    edge_beta: float = 0.5,
    edge_secondary: bool = False,
    edge_beta2: float = 2.0,
):
    """Distributed training step over the FUSED kernel (kernels/train.py):
    each chip runs the forward+per-pixel-backward kernel on its row band
    (absolute row offsets keep RNG/camera bit-identical to single-chip),
    reduces its band to a parameter-gradient contribution in XLA, and the
    per-band partials are psum-reduced over ICI.

    Unlike make_sharded_train_step (AD outside shard_map), the fused path's
    gradient is built from explicit reductions, so the hand-psum of the
    partial gradients is exact: every pixel's contribution is counted once
    on the chip that owns its band.  Returns
    ``step(params, target, frame) -> (new_params, loss)``.
    """
    from ..kernels.train import DEFAULT_TILE, _fused_sse_and_grad_impl, _pad_planes

    if aspect is None:
        aspect = width / height
    n = mesh.devices.size
    if height % n:
        raise ValueError(f"height {height} not divisible by mesh size {n}")
    band_h = height // n
    if tile is None:
        th, tw = DEFAULT_TILE
        if edge_secondary:
            th = 16  # VMEM headroom for the secondary rows (kernels/train.py)
        th = min(th, -(-band_h // 8) * 8)
    else:
        th, tw = tile
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    inv_n = 1.0 / float(width * height * 3)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(TILE_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def sse_and_grad(params, target_band, frame):
        row0 = lax.axis_index(TILE_AXIS) * band_h
        band_planes = _pad_planes(
            jnp.transpose(target_band, (2, 0, 1)), th, tw
        )
        sse, grad, _col = _fused_sse_and_grad_impl(
            spec, params, band_planes, frame, jnp.float32(fov),
            jnp.float32(aspect), row0, width=width, height=height,
            crop_h=band_h, bounces=bounces, tile_h=th, tile_w=tw,
            interpret=interpret, analytic_unboxed=analytic_unboxed,
            edge_grad=edge_grad, edge_beta=edge_beta,
            edge_secondary=edge_secondary, edge_beta2=edge_beta2,
        )
        return lax.psum(sse, TILE_AXIS), lax.psum(grad, TILE_AXIS)

    @jax.jit
    def _step(params, target, frame):
        sse, grad = sse_and_grad(
            jnp.asarray(params, jnp.float32),
            jnp.asarray(target, jnp.float32), jnp.asarray(frame, jnp.int32),
        )
        new_params = params - learning_rate * grad
        return new_params, sse * inv_n

    def step(params, target, frame):
        from ..kernels.train import check_no_refraction

        check_no_refraction(spec, params)
        return _step(params, target, frame)

    return step
