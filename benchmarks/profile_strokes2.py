"""Isolate WHERE the dense-stroke frame time goes (config-3 family).

The stroke_batch/tile_h sweep (profile_strokes.py) showed the scene is
per-tile SPARSE (max 12 entries/tile) and that wider batches only lose
— so the cost is per-entry math, per-unit walk overhead, or per-frame
host work.  This isolates them:

- ``solid_miter``  — same polylines, solid strokes, miter joins, butt
                     caps: the cheapest predicate set (no dash, no
                     atan2 discs).
- ``dash_butt``    — dashed with butt dash caps (dash interval math,
                     no round-cap circles).
- ``config3``      — the full mixed-join round/out-cap dashed scene.
- ``*_static``     — same, but the dash phase is NOT animated: removes
                     the per-frame descriptor rebuild + upload, leaving
                     pure dispatch+raster.

Usage: python benchmarks/profile_strokes2.py [--frames N]
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


def polylines(width, height, group_of):
    from contrast_renderer_tpu.path import (
        CurveApproximation, LineSegment, Path, StrokeOptions)

    rng = np.random.default_rng(1)
    paths = []
    for i in range(60):
        p = Path(start=(rng.uniform(100, width - 100),
                        rng.uniform(100, height - 100)))
        for _ in range(6):
            p.push_line(LineSegment([
                (rng.uniform(50, width - 50), rng.uniform(50, height - 50))
            ]))
        p.stroke_options = StrokeOptions(
            width=10.0, offset=0.0, miter_clip=2.0, closed=False,
            dynamic_stroke_options_group=group_of(i),
            curve_approximation=CurveApproximation.uniform_tangent_angle(0.1),
        )
        paths.append(p)
    return paths


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=16)
    args = parser.parse_args()
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_cache_bench_configs"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    from contrast_renderer_tpu.path import (
        Cap, DashInterval, DynamicStrokeOptions, Join)
    from contrast_renderer_tpu.renderer import (
        Configuration, DrawCommand, RenderOperation, Renderer, Shape)

    width, height = 1920, 1080
    t = np.diag([2.0 / width, 2.0 / height, 1.0, 1.0]).astype(np.float32)
    t[0, 3] = -1.0
    t[1, 3] = -1.0

    def dashed_config3(join, phase):
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

    def dashed_butt(join, phase):
        return DynamicStrokeOptions.make_dashed(
            join,
            [
                DashInterval(gap_start=2.0, gap_end=3.0,
                             dash_start=Cap.BUTT, dash_end=Cap.BUTT),
                DashInterval(gap_start=5.0, gap_end=5.5,
                             dash_start=Cap.BUTT, dash_end=Cap.BUTT),
            ],
            phase=phase,
        )

    def solid(join, phase):
        return DynamicStrokeOptions.make_solid(
            join, Cap.BUTT, Cap.BUTT
        )

    joins3 = [Join.MITER, Join.BEVEL, Join.ROUND]
    variants = [
        ("solid_miter", solid, [Join.MITER], False),
        ("solid_miter_anim", solid, [Join.MITER], True),
        ("dash_butt", dashed_butt, joins3, True),
        ("config3", dashed_config3, joins3, True),
        ("config3_static", dashed_config3, joins3, False),
    ]
    for label, make, joins, animate in variants:
        paths = polylines(width, height, lambda i: i % len(joins))
        options = [make(j, 0.0) for j in joins]
        shape = Shape(paths, options)
        renderer = Renderer(Configuration(), width, height)
        commands = [
            DrawCommand(RenderOperation.STENCIL, shape, t),
            DrawCommand(RenderOperation.COLOR, shape, t, color=(1, 1, 1, 1)),
        ]

        def frame(i, acc, animate=animate, joins=joins, make=make):
            if animate:
                for g, join in enumerate(joins):
                    shape.set_dynamic_stroke_options(g, make(join, i * 0.3))
            return renderer.render(commands, to_host=False, carry=acc)

        fps = timed(frame, args.frames)
        print(json.dumps({
            "metric": f"strokes2_{label}",
            "value": round(fps, 2),
            "unit": "frames/s",
            "triangles": len(shape.triangles),
        }), flush=True)


if __name__ == "__main__":
    main()
