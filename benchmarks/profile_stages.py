"""Per-stage timing of the frame pipeline on the current device.

Splits a frame into its three costs:

- ``prepare``  — triangle setup + tile binning (XLA; cached for static
  cameras, re-run per frame under camera motion),
- ``rasterize`` — the Pallas coverage kernel,
- ``host``     — per-frame Python: command building, packing, cache keys.

Usage: python benchmarks/profile_stages.py [WxH]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from contrast_renderer_tpu.models import showcase
from contrast_renderer_tpu.renderer import Configuration, Renderer


def timeit(fn, *args, n=20, **kw):
    """Times fn with every call forced to completion through a scalar
    checksum chain fetched once (a bare block_until_ready can
    under-report on asynchronous remote backends)."""
    import jax.numpy as jnp

    def head(out):
        x = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(x).astype(jnp.float32)

    acc = head(fn(*args, **kw))
    float(acc)
    start = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(n):
        acc = acc + head(fn(*args, **kw))
    float(acc)
    return (time.perf_counter() - start) / n * 1e3


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    width, height = (int(x) for x in size.split("x"))
    tile_capacity = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    renderer = Renderer(
        Configuration(), width, height, tile_capacity=tile_capacity
    )
    shape = showcase.build_shape(with_text=True)
    commands = showcase.showcase_commands(shape, width, height)

    # Full render (all caches warm).
    full_ms = timeit(renderer.render, commands, to_host=False)

    # Isolate the stages the way Renderer.render stages them.
    shapes, shape_index = renderer._unique_shapes(commands)
    _, scene = renderer._scene_arrays(shapes)
    ops = tuple(int(c.operation) for c in commands)
    cmd_shape = tuple(shape_index[id(c.shape)] for c in commands)
    spec = renderer._spec(ops, cmd_shape, (), scene)
    prepare, rasterize = renderer._get_executors(spec)
    transforms = np.stack(
        [np.asarray(c.transform, np.float32) for c in commands]
    )
    tfs = jax.device_put(transforms)
    cmd_i, cmd_f = Renderer._pack_commands_runtime(commands)
    desc_f, desc_i = Renderer._pack_descriptors(shapes)
    desc_static = jax.device_put(np.ascontiguousarray(desc_i[:, [9, 8]]))
    prep_ms = timeit(prepare, *scene.arrays, tfs, desc_static)
    prepared = prepare(*scene.arrays, tfs, desc_static)
    jax.block_until_ready(prepared)
    cmd_i_d, cmd_f_d = jax.device_put(cmd_i), jax.device_put(cmd_f)
    desc_f_d, desc_i_d = jax.device_put(desc_f), jax.device_put(desc_i)
    rast_ms = timeit(rasterize, prepared, cmd_i_d, cmd_f_d,
                     desc_f_d, desc_i_d)

    # Host-side per-frame work under camera motion: rebuild commands,
    # validate, pack, key the cache (prepare/rasterize mocked out).
    start = time.perf_counter()
    n = 50
    for i in range(n):
        cmds = showcase.showcase_commands(
            shape, width, height,
            view_rotation=np.array([1.0, 0.0, 1e-3 * i, 0.0]),
        )
        renderer._validate(cmds)
        np.stack([np.asarray(c.transform, np.float32) for c in cmds]).tobytes()
        Renderer._pack_commands_runtime(cmds)
        Renderer._pack_descriptors(shapes)
    host_ms = (time.perf_counter() - start) / n * 1e3

    print(f"device={jax.devices()[0].platform} {width}x{height} "
          f"commands={len(commands)} t_max={scene.t_max} "
          f"tiles={spec.n_tiles} capacity={spec.capacity}")
    print(f"stats={renderer.stats}")
    print(f"full render        {full_ms:8.2f} ms  ({1e3 / full_ms:6.1f} FPS)")
    print(f"prepare (binning)  {prep_ms:8.2f} ms")
    print(f"rasterize (Pallas) {rast_ms:8.2f} ms")
    print(f"host per-frame     {host_ms:8.2f} ms")


if __name__ == "__main__":
    main()
