"""Sweep stroke_batch / tile_h on the dense-stroke scene (config 3).

The round-3 sweep showed dashed strokes at 68.7 FPS (1080p) vs fills at
159.2 with twice the triangles — the per-entry stroke walk (stroke_batch
defaults to 1, tuned for *sparse* ranges) was never tuned for the dense
case.  This prints one JSON line per (stroke_batch, tile_h) variant so
the dense default can be picked from measured numbers.

Usage: python benchmarks/profile_strokes.py [--frames N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def build_scene():
    from contrast_renderer_tpu.path import (
        Cap, CurveApproximation, DashInterval, DynamicStrokeOptions,
        Join, LineSegment, Path, StrokeOptions)
    from contrast_renderer_tpu.renderer import Shape

    width, height = 1920, 1080

    def dashed(join, phase):
        return DynamicStrokeOptions.make_dashed(
            join,
            [
                DashInterval(gap_start=2.0, gap_end=3.0,
                             dash_start=Cap.ROUND, dash_end=Cap.OUT),
                DashInterval(gap_start=5.0, gap_end=5.5,
                             dash_start=Cap.BUTT, dash_end=Cap.BUTT),
            ],
            phase=phase,
        )

    joins = [Join.MITER, Join.BEVEL, Join.ROUND]
    paths = []
    rng = np.random.default_rng(1)
    for i in range(60):
        p = Path(start=(rng.uniform(100, width - 100),
                        rng.uniform(100, height - 100)))
        for _ in range(6):
            p.push_line(LineSegment([
                (rng.uniform(50, width - 50), rng.uniform(50, height - 50))
            ]))
        p.stroke_options = StrokeOptions(
            width=10.0, offset=0.0, miter_clip=2.0, closed=False,
            dynamic_stroke_options_group=i % 3,
            curve_approximation=CurveApproximation.uniform_tangent_angle(0.1),
        )
        paths.append(p)
    options = [dashed(j, 0.0) for j in joins]
    return Shape(paths, options), dashed, joins, width, height


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
    parser.add_argument("--batches", default="1,2,4,8")
    # tile_h [x strips]: strips>1 folds (tile_h, 128) onto a
    # (tile_h*strips, 128/strips) screen footprint.
    parser.add_argument("--tiles", default="8,16,32,8x4,8x8,16x4,32x4")
    args = parser.parse_args()
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_cache_bench_configs"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    from contrast_renderer_tpu.renderer import (
        Configuration, DrawCommand, RenderOperation, Renderer)

    shape, dashed, joins, width, height = build_scene()
    t = np.diag(
        [2.0 / width, 2.0 / height, 1.0, 1.0]
    ).astype(np.float32)
    t[0, 3] = -1.0
    t[1, 3] = -1.0
    commands = [
        DrawCommand(RenderOperation.STENCIL, shape, t),
        DrawCommand(RenderOperation.COLOR, shape, t, color=(1, 1, 1, 1)),
    ]
    for tile_spec in args.tiles.split(","):
        parts = [int(x) for x in tile_spec.split("x")]
        tile_h = parts[0]
        strips = parts[1] if len(parts) > 1 else 1
        for sbs in (int(x) for x in args.batches.split(",")):
            renderer = Renderer(
                Configuration(), width, height,
                tile_size=tile_h, stroke_batch=sbs, tile_strips=strips,
            )

            def frame(i, acc):
                for g, join in enumerate(joins):
                    shape.set_dynamic_stroke_options(g, dashed(join, i * 0.3))
                return renderer.render(commands, to_host=False, carry=acc)

            fps = timed(frame, args.frames)
            print(json.dumps({
                "metric": "strokes_1080p",
                "stroke_batch": sbs,
                "tile_h": tile_h,
                "strips": strips,
                "value": round(fps, 2),
                "unit": "frames/s",
                "stats": {
                    k: v for k, v in renderer.stats.items()
                    if k in ("max_tile_entries", "tiles")
                },
            }), flush=True)


if __name__ == "__main__":
    main()
