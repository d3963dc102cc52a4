"""Sweep tile_h / fill_batch / strips on the INSTANCED 10k-glyph scene.

The instanced path (text.text_commands: one (STENCIL, COLOR) pair per
unique glyph, ~36 commands × ~280 instances) has a different cost
profile from the monolith: per-(tile, command) entry ranges are SHORT
(tiny shapes), so wide batches waste masked lanes, while the
per-(tile, unit) walk overhead multiplies with the command count —
short tiles / square strip footprints shrink the number of (tile,
unit) visits.  This measures the actual grid so the default is a
number, not a guess (round-8: 28.6 FPS at the auto (32, 2, 1)).

Usage: python benchmarks/profile_text_inst.py [--frames N]
         [--variants 32x2x1,8x2x4,...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def timed(frame, n):
    import jax.numpy as jnp

    _, acc = frame(0, jnp.float32(0.0))
    _, acc = frame(1, acc)
    float(acc)
    best = 0.0
    for b in range(3):
        start = time.perf_counter()
        acc = jnp.float32(0.0)
        for i in range(n):
            _, acc = frame(b * n + i + 1, acc)
        assert np.isfinite(float(acc))
        best = max(best, n / (time.perf_counter() - start))
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=16)
    parser.add_argument(
        "--variants", default="32x2x1,32x2x4,16x2x2,8x2x4,16x4x2,8x4x4"
    )
    args = parser.parse_args()
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_cache_bench_configs"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    from contrast_renderer_tpu.assets import load_default_font
    from contrast_renderer_tpu.renderer import Configuration, Renderer
    from contrast_renderer_tpu.text import (
        Alignment, Layout, Orientation, text_commands)

    width, height = 1920, 1080
    font = load_default_font()
    layout = Layout(
        size=16.0,
        orientation=Orientation.LEFT_TO_RIGHT,
        major_alignment=Alignment.BEGIN,
        minor_alignment=Alignment.BEGIN,
    )
    text = "\n".join(
        "the quick brown fox jumps over the lazy dog 0123456789 " * 2
        for _ in range(112)
    )
    n_glyphs = sum(1 for ch in text if not ch.isspace())
    t = np.diag([2.0 / 1800.0, 2.0 / 1500.0, 1.0, 1.0]).astype(np.float32)
    t[0, 3] = -1.0
    t[1, 3] = 0.95
    commands = text_commands(font.face, layout, text, t, color=(1, 1, 1, 1))

    for variant in args.variants.split(","):
        parts = [int(x) for x in variant.split("x")]
        tile_h, nb = parts[0], parts[1]
        strips = parts[2] if len(parts) > 2 else 1
        renderer = Renderer(
            Configuration(), width, height, tile_size=tile_h,
            fill_batch=nb, tile_strips=strips,
        )

        def frame(i, acc):
            return renderer.render(commands, to_host=False, carry=acc)

        fps = timed(frame, args.frames)
        print(json.dumps({
            "metric": "glyphs_1080p_instanced",
            "tile_h": tile_h,
            "fill_batch": nb,
            "strips": strips,
            "value": round(fps, 2),
            "unit": "frames/s",
            "glyphs_per_s": round(fps * n_glyphs),
        }), flush=True)


if __name__ == "__main__":
    main()
