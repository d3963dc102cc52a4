"""Band-sharded rendering across a device mesh.

Rendering is embarrassingly parallel over pixels once the geometry is
known, so the multi-chip strategy is: replicate the (small) geometry
tables to every device, shard the output image's rows, and give each
device a *band-adjusted projection*: rendering band b of n at local
height H/n equals rendering the full frame with NDC y remapped by
``y' = n·y + (1 - n + 2b)`` — a row operation on the clip-space matrix,
so the per-band executor is the unmodified single-device frame program.

The only cross-device data movement is the sharded output layout (ICI
all-gather if the host requests the full image).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def band_adjusted_transform(transform, band, num_bands):
    """Remap a model→clip matrix so the full frame's band `band` fills
    the whole viewport of a 1/num_bands-height render."""
    transform = jnp.asarray(transform, jnp.float32)
    n = jnp.float32(num_bands)
    offset = 1.0 - n + 2.0 * jnp.asarray(band, jnp.float32)
    row_y = n * transform[..., 1, :] + offset * transform[..., 3, :]
    return transform.at[..., 1, :].set(row_y)


def render_sharded(renderer, commands, mesh: Mesh, axis: str = "y"):
    """Render a frame with rows sharded over `mesh`'s `axis`.

    `renderer` is a `Renderer` sized to the FULL frame; its height must
    be divisible by the mesh axis size.  Returns the full (H, W, 4)
    image (gathered to host).
    """
    from ..renderer import Renderer

    num_bands = mesh.shape[axis]
    assert renderer.height % num_bands == 0, "height must divide the mesh axis"
    band_height = renderer.height // num_bands
    platform = mesh.devices.reshape(-1)[0].platform
    band_renderer = Renderer(
        renderer.config,
        renderer.width,
        band_height,
        tile_size=min(renderer.tile_h, band_height),
        tile_capacity=renderer.tile_capacity,
        interpret=(platform == "cpu"),
    )

    # Pack the scene once; each band runs the full prepare+raster
    # pipeline on a band-adjusted projection (geometry replicated over
    # the mesh, output rows sharded — the only collective is the
    # gather of disjoint bands).
    band_renderer._validate(commands)
    shapes, shape_index = band_renderer._unique_shapes(commands)
    _, scene = band_renderer._scene_arrays(shapes)
    ops = tuple(int(c.operation) for c in commands)
    cmd_shape = tuple(shape_index[id(c.shape)] for c in commands)
    spec = band_renderer._spec(ops, cmd_shape, scene)
    prepare, rasterize = band_renderer._get_executors(spec)
    cmd_i, cmd_f = Renderer._pack_commands_runtime(commands)
    desc_f, desc_i = Renderer._pack_descriptors(shapes)
    transform = np.stack(
        [np.asarray(c.transform, np.float32) for c in commands]
    )
    scene_arrays = scene.arrays

    def per_band(band_index, transforms):
        adjusted = band_adjusted_transform(
            transforms, band_index[0], num_bands
        )
        prepared = prepare(*scene_arrays, adjusted)
        return rasterize(prepared, cmd_i, cmd_f, desc_f, desc_i)

    bands = jnp.arange(num_bands, dtype=jnp.int32)
    mapped = jax.shard_map(
        per_band,
        mesh=mesh,
        in_specs=(P(axis), None),
        out_specs=P(axis, None, None),
        check_vma=False,
    )
    image = mapped(bands, jnp.asarray(transform))
    return np.asarray(image)
