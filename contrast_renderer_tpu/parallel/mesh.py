"""Sharded rendering across a device mesh.

Rendering is embarrassingly parallel over pixels once the geometry is
known, so the multi-chip strategy is: replicate the (small) geometry
tables to every device, shard the output image over a 1D (row bands) or
2D (row × column tiles) mesh, and give each device a *sub-rect-adjusted
projection*: rendering rect (by, bx) of an (ny, nx) grid at local size
(H/ny, W/nx) equals rendering the full frame with NDC remapped by
``x' = nx·x + (nx−1−2bx)·w`` and ``y' = ny·y + (1−ny+2by)·w`` — row
operations on the clip-space matrix, so the per-device executor is the
unmodified single-device frame program (prepare + Pallas kernel).

The only cross-device data movement is the sharded output layout (ICI
all-gather if the host requests the full image).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def band_adjusted_transform(transform, band, num_bands):
    """Remap a model→clip matrix so the full frame's row band `band`
    fills the whole viewport of a 1/num_bands-height render."""
    transform = jnp.asarray(transform, jnp.float32)
    n = jnp.float32(num_bands)
    offset = 1.0 - n + 2.0 * jnp.asarray(band, jnp.float32)
    row_y = n * transform[..., 1, :] + offset * transform[..., 3, :]
    return transform.at[..., 1, :].set(row_y)


def rect_adjusted_transform(transform, by, ny, bx, nx):
    """Remap a model→clip matrix so grid rect (by, bx) of an (ny, nx)
    split fills the whole viewport of a (H/ny, W/nx) render."""
    transform = band_adjusted_transform(transform, by, ny)
    fx = jnp.float32(nx)
    offset = fx - 1.0 - 2.0 * jnp.asarray(bx, jnp.float32)
    row_x = fx * transform[..., 0, :] + offset * transform[..., 3, :]
    return transform.at[..., 0, :].set(row_x)


def _sub_renderer(renderer, width, height, platform):
    from ..renderer import Renderer

    sub = Renderer(
        renderer.config,
        width,
        height,
        tile_size=(
            None if renderer.tile_h is None
            else min(renderer.tile_h, height)
        ),
        tile_capacity=renderer.tile_capacity,
        interpret=(platform == "cpu"),
    )
    # Inherit the outer renderer's (possibly pre-sized) binning
    # capacities: every overflow retry recompiles the sharded program.
    sub._global_capacity = renderer._global_capacity
    sub._tile_global_capacity = renderer._tile_global_capacity
    sub._clip_pool = renderer._clip_pool
    return sub


def _packed_pipeline(sub, commands):
    from ..renderer import Renderer, _optimize_commands, _paint_kind

    sub._validate(commands)
    commands, _ = _optimize_commands(commands)
    shapes, shape_index = sub._unique_shapes(commands)
    _, scene = sub._scene_arrays(shapes)
    ops = tuple(int(c.operation) for c in commands)
    cmd_shape = tuple(shape_index[id(c.shape)] for c in commands)
    paints = tuple(_paint_kind(c.color) for c in commands)
    spec = sub._spec(ops, cmd_shape, (), scene, paints)
    prepare, rasterize = sub._get_executors(spec)
    cmd_i, cmd_f = Renderer._pack_commands_runtime(commands)
    desc_f, desc_i = Renderer._pack_descriptors(shapes)
    desc_static = np.ascontiguousarray(desc_i[:, [9, 8]])
    transform = np.stack(
        [np.asarray(c.transform, np.float32) for c in commands]
    )
    return (scene.arrays, prepare, rasterize, cmd_i, cmd_f, desc_f, desc_i,
            desc_static, transform, Renderer._pack_paints(commands))


def _run_with_growth(sub, commands, run_once):
    """Run a sharded frame, growing binning capacities on overflow (the
    same contract as Renderer.render's retry loop)."""
    for _attempt in range(4):
        packed = _packed_pipeline(sub, commands)
        image, overflow = run_once(*packed)
        limits = (
            sub.tile_capacity,
            sub._global_capacity,
            sub._tile_global_capacity,
            sub._clip_pool,
        )
        worst = np.asarray(overflow).reshape(-1, 4).max(axis=0)
        if not sub._grow_capacities(worst, limits):
            return np.asarray(image)
    raise RuntimeError("sharded tile binning capacity did not converge")


def render_sharded(renderer, commands, mesh: Mesh, axis: str = "y"):
    """Render a frame with rows sharded over `mesh`'s `axis`
    (1D row bands).  `renderer` is sized to the FULL frame; its height
    must be divisible by the mesh axis size.  Returns the full
    (H, W, 4) image (gathered to host)."""
    num_bands = mesh.shape[axis]
    assert renderer.height % num_bands == 0, "height must divide the mesh axis"
    band_height = renderer.height // num_bands
    platform = mesh.devices.reshape(-1)[0].platform
    sub = _sub_renderer(renderer, renderer.width, band_height, platform)

    def run_once(scene_arrays, prepare, rasterize, cmd_i, cmd_f,
                 desc_f, desc_i, desc_static, transform, paint_model):
        def per_band(band_index, transforms):
            adjusted = band_adjusted_transform(
                transforms, band_index[0], num_bands
            )
            prepared = prepare(
                *scene_arrays, adjusted, jnp.asarray(desc_static),
                None if paint_model is None else jnp.asarray(paint_model),
            )
            image = rasterize(prepared, cmd_i, cmd_f, desc_f, desc_i)
            return image, prepared.overflow[None]

        bands = jnp.arange(num_bands, dtype=jnp.int32)
        mapped = jax.shard_map(
            per_band,
            mesh=mesh,
            in_specs=(P(axis), None),
            out_specs=(P(axis, None, None), P(axis, None)),
            check_vma=False,
        )
        return mapped(bands, jnp.asarray(transform))

    return _run_with_growth(sub, commands, run_once)


class ShardedFrameProgram:
    """A persistent band-sharded frame step: the shard_map pipeline is
    traced and jitted ONCE, then each frame feeds a new (C, 4, 4)
    transform stack — the multi-chip analogue of renderer.FrameProgram
    (per-frame `render_sharded` re-traces the mapped pipeline every
    call, which dominates under camera animation).

    Binning capacities are settled strictly at build time; scenes that
    outgrow them afterwards raise (rebuild the program), keeping the
    hot path recompile-free.
    """

    def __init__(self, renderer, commands, mesh: Mesh, axis: str = "y"):
        num_bands = mesh.shape[axis]
        assert renderer.height % num_bands == 0, (
            "height must divide the mesh axis"
        )
        band_height = renderer.height // num_bands
        platform = mesh.devices.reshape(-1)[0].platform
        self._sub = _sub_renderer(
            renderer, renderer.width, band_height, platform
        )
        self._mesh = mesh
        self._axis = axis
        self._num_bands = num_bands
        # Settle capacities with the build-time transforms (the same
        # strict contract FrameProgram uses).
        render_sharded(renderer, commands, mesh, axis)
        self._sub._global_capacity = renderer._global_capacity
        self._sub._tile_global_capacity = renderer._tile_global_capacity
        self._sub._clip_pool = renderer._clip_pool
        packed = _packed_pipeline(self._sub, commands)
        (scene_arrays, prepare, rasterize, cmd_i, cmd_f, desc_f, desc_i,
         desc_static, transform, paint_model) = packed
        self._default_transform = transform
        self._limits = None  # filled below

        def per_band(band_index, transforms):
            adjusted = band_adjusted_transform(
                transforms, band_index[0], num_bands
            )
            prepared = prepare(
                *scene_arrays, adjusted, jnp.asarray(desc_static),
                None if paint_model is None else jnp.asarray(paint_model),
            )
            image = rasterize(prepared, cmd_i, cmd_f, desc_f, desc_i)
            return image, prepared.overflow[None]

        from jax.sharding import PartitionSpec as P_

        self._bands = jnp.arange(num_bands, dtype=jnp.int32)
        self._mapped = jax.jit(
            jax.shard_map(
                per_band,
                mesh=mesh,
                in_specs=(P_(axis), None),
                out_specs=(P_(axis, None, None), P_(axis, None)),
                check_vma=False,
            )
        )
        self._limits = (
            self._sub.tile_capacity,
            self._sub._global_capacity,
            self._sub._tile_global_capacity,
            self._sub._clip_pool,
        )

    def __call__(self, transforms=None):
        """Render one frame; returns the band-sharded (H, W, 4) device
        array.  ``transforms``: (C, 4, 4), one row per command (the
        sharded pipeline's single-instance layout)."""
        if transforms is None:
            transforms = self._default_transform
        transforms = jnp.asarray(np.asarray(transforms, np.float32))
        image, overflow = self._mapped(self._bands, transforms)
        worst = np.asarray(overflow).reshape(-1, 4).max(axis=0)
        if np.any(worst > np.asarray(self._limits)):
            raise RuntimeError(
                "scene outgrew the program's binning capacities "
                f"({list(worst)} > {list(self._limits)}); rebuild the "
                "ShardedFrameProgram"
            )
        return image


class ShardedFrameProgram2D:
    """2D tile-grid variant of :class:`ShardedFrameProgram` (rows over
    ``axes[0]``, columns over ``axes[1]``)."""

    def __init__(
        self, renderer, commands, mesh: Mesh, axes: tuple = ("y", "x")
    ):
        ay, ax = axes
        ny, nx = mesh.shape[ay], mesh.shape[ax]
        assert renderer.height % ny == 0 and renderer.width % nx == 0
        platform = mesh.devices.reshape(-1)[0].platform
        self._sub = _sub_renderer(
            renderer, renderer.width // nx, renderer.height // ny, platform
        )
        render_sharded_2d(renderer, commands, mesh, axes)
        self._sub._global_capacity = renderer._global_capacity
        self._sub._tile_global_capacity = renderer._tile_global_capacity
        self._sub._clip_pool = renderer._clip_pool
        (scene_arrays, prepare, rasterize, cmd_i, cmd_f, desc_f, desc_i,
         desc_static, transform, paint_model) = _packed_pipeline(
            self._sub, commands
        )
        self._default_transform = transform

        def per_rect(by, bx, transforms):
            adjusted = rect_adjusted_transform(
                transforms, by[0], ny, bx[0], nx
            )
            prepared = prepare(
                *scene_arrays, adjusted, jnp.asarray(desc_static),
                None if paint_model is None else jnp.asarray(paint_model),
            )
            image = rasterize(prepared, cmd_i, cmd_f, desc_f, desc_i)
            return image, prepared.overflow[None, None]

        from jax.sharding import PartitionSpec as P_

        self._bys = jnp.arange(ny, dtype=jnp.int32)
        self._bxs = jnp.arange(nx, dtype=jnp.int32)
        self._mapped = jax.jit(
            jax.shard_map(
                per_rect,
                mesh=mesh,
                in_specs=(P_(ay), P_(ax), None),
                out_specs=(P_(ay, ax, None), P_(ay, ax, None)),
                check_vma=False,
            )
        )
        self._limits = (
            self._sub.tile_capacity,
            self._sub._global_capacity,
            self._sub._tile_global_capacity,
            self._sub._clip_pool,
        )

    def __call__(self, transforms=None):
        if transforms is None:
            transforms = self._default_transform
        transforms = jnp.asarray(np.asarray(transforms, np.float32))
        image, overflow = self._mapped(self._bys, self._bxs, transforms)
        worst = np.asarray(overflow).reshape(-1, 4).max(axis=0)
        if np.any(worst > np.asarray(self._limits)):
            raise RuntimeError(
                "scene outgrew the program's binning capacities "
                f"({list(worst)} > {list(self._limits)}); rebuild the "
                "ShardedFrameProgram2D"
            )
        return image


def render_sharded_2d(
    renderer, commands, mesh: Mesh, axes: tuple = ("y", "x")
):
    """Render a frame sharded over a 2D device mesh: rows over
    ``axes[0]``, columns over ``axes[1]`` — the tile-grid layout that
    keeps every collective on ICI neighbors.  Returns the full
    (H, W, 4) image."""
    ay, ax = axes
    ny = mesh.shape[ay]
    nx = mesh.shape[ax]
    assert renderer.height % ny == 0 and renderer.width % nx == 0
    sub_h = renderer.height // ny
    sub_w = renderer.width // nx
    platform = mesh.devices.reshape(-1)[0].platform
    sub = _sub_renderer(renderer, sub_w, sub_h, platform)

    def run_once(scene_arrays, prepare, rasterize, cmd_i, cmd_f,
                 desc_f, desc_i, desc_static, transform, paint_model):
        def per_rect(by, bx, transforms):
            adjusted = rect_adjusted_transform(
                transforms, by[0], ny, bx[0], nx
            )
            prepared = prepare(
                *scene_arrays, adjusted, jnp.asarray(desc_static),
                None if paint_model is None else jnp.asarray(paint_model),
            )
            image = rasterize(prepared, cmd_i, cmd_f, desc_f, desc_i)
            return image, prepared.overflow[None, None]

        bys = jnp.arange(ny, dtype=jnp.int32)
        bxs = jnp.arange(nx, dtype=jnp.int32)
        mapped = jax.shard_map(
            per_rect,
            mesh=mesh,
            in_specs=(P(ay), P(ax), None),
            out_specs=(P(ay, ax, None), P(ay, ax, None)),
            check_vma=False,
        )
        return mapped(bys, bxs, jnp.asarray(transform))

    return _run_with_growth(sub, commands, run_once)
