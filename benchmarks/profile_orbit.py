"""Break down the orbiting-camera frame cost (re-binning every frame)."""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from contrast_renderer_tpu.models import showcase
from contrast_renderer_tpu.renderer import Configuration, Renderer


def main():
    width, height = 1920, 1080
    renderer = Renderer(Configuration(), width, height, strict_capacity=False)
    shape = showcase.build_shape(with_text=True)

    def frame(t):
        angle = 0.05 * t
        rotor = np.array([math.cos(angle / 2), 0.0, math.sin(angle / 2), 0.0])
        cmds = showcase.showcase_commands(
            shape, width, height, view_rotation=rotor
        )
        shape.set_dynamic_stroke_options(0, showcase.dashed_options(t * 2.0))
        return renderer.render(cmds, to_host=False)

    frame(0.0).block_until_ready()
    frame(0.016).block_until_ready()

    n = 32
    start = time.perf_counter()
    image = None
    for i in range(n):
        image = frame(i * 0.016)
    image.block_until_ready()
    total = (time.perf_counter() - start) / n * 1e3
    print(f"orbit frame total      {total:8.2f} ms ({1e3 / total:.1f} FPS)")

    # Host-only cost: run frame() but skip the final device dispatch by
    # timing its components.
    start = time.perf_counter()
    for i in range(n):
        angle = 0.05 * i * 0.016
        rotor = np.array([math.cos(angle / 2), 0.0, math.sin(angle / 2), 0.0])
        cmds = showcase.showcase_commands(
            shape, width, height, view_rotation=rotor
        )
        shape.set_dynamic_stroke_options(0, showcase.dashed_options(i * 0.032))
    cmd_ms = (time.perf_counter() - start) / n * 1e3
    print(f"  build commands       {cmd_ms:8.2f} ms")

    cmds = showcase.showcase_commands(shape, width, height)
    start = time.perf_counter()
    for i in range(n):
        renderer._validate(cmds)
        shapes, shape_index = renderer._unique_shapes(cmds)
        renderer._scene_arrays(shapes)
        np.stack([np.asarray(c.transform, np.float32) for c in cmds]).tobytes()
        Renderer._pack_commands_runtime(cmds)
        Renderer._pack_descriptors(shapes)
    pack_ms = (time.perf_counter() - start) / n * 1e3
    print(f"  render() host work   {pack_ms:8.2f} ms")

    # Device dispatch-only: same commands each frame → prepared cache hit,
    # isolates rasterize dispatch + pending-overflow handling.
    def frame_static(t):
        shape.set_dynamic_stroke_options(0, showcase.dashed_options(t * 2.0))
        return renderer.render(cmds, to_host=False)

    frame_static(0.0).block_until_ready()
    start = time.perf_counter()
    for i in range(n):
        image = frame_static(i * 0.016)
    image.block_until_ready()
    static_ms = (time.perf_counter() - start) / n * 1e3
    print(f"  static frame (cached bin) {static_ms:5.2f} ms")


if __name__ == "__main__":
    main()
