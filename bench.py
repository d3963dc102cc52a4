"""Benchmark: showcase frame rate on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
The north-star target (BASELINE.json) is the full showcase at 4K
>= 60 FPS on one TPU v5e; vs_baseline = fps / 60.

Resolution and scene size are scaled down automatically if the
environment is slow (CPU fallback) so the bench always completes.
"""

import json
import os
import sys
import time


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_bench")
    import jax
    import numpy as np

    from contrast_renderer_tpu.models import showcase
    from contrast_renderer_tpu.renderer import Configuration, Renderer

    platform = jax.devices()[0].platform
    on_accelerator = platform not in ("cpu",)
    if os.environ.get("BENCH_SIZE"):
        width, height = (int(x) for x in os.environ["BENCH_SIZE"].split("x"))
    elif on_accelerator:
        width, height = 1920, 1080
    else:
        width, height = 256, 256
    with_text = on_accelerator or bool(os.environ.get("BENCH_TEXT"))

    renderer = Renderer(
        Configuration(), width, height, tile_size=32, tile_capacity=1024
    )
    shape = showcase.build_shape(with_text=with_text)
    if on_accelerator:
        commands = showcase.showcase_commands(shape, width, height)
    else:
        commands = showcase.showcase_commands(shape, width, height)[:4]

    def frame(t):
        shape.set_dynamic_stroke_options(0, showcase.dashed_options(t * 2.0))
        return renderer.render(commands)

    frame(0.0)  # compile
    frames = 16 if on_accelerator else 2
    start = time.perf_counter()
    for i in range(frames):
        image = frame(i * 0.016)
    elapsed = time.perf_counter() - start
    fps = frames / elapsed
    label = f"showcase_fps_{width}x{height}" + ("" if with_text else "_notext")
    print(
        json.dumps(
            {
                "metric": label,
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
