"""Randomized device-vs-ground-truth fuzzing of the full render path.

Scenes of random polygons, circles, rounded rects and free-form
quadratic/cubic loops run through the complete Renderer (stencil +
color cover) and are compared against the analytic polyline winding of
the same paths (oracle.ground_truth_winding — dense flattening, no
shared code with the device path).  Seeded for determinism; one shape
per scene keeps a single compiled frame program.
"""

import numpy as np

from contrast_renderer_tpu import oracle
from contrast_renderer_tpu.path import (
    IntegralCubicCurveSegment,
    IntegralQuadraticCurveSegment,
    LineSegment,
    Path,
)
from contrast_renderer_tpu.renderer import (
    Configuration,
    DrawCommand,
    RenderOperation,
    Renderer,
    Shape,
)

SIZE = 64


def ortho(size=SIZE):
    t = np.diag([2.0 / size, 2.0 / size, 1.0, 1.0]).astype(np.float32)
    t[0, 3] = -1.0
    t[1, 3] = -1.0
    return t


def random_blob(rng, center, radius, n_segments):
    """Closed path around `center`: random mix of line / quadratic /
    cubic segments through points jittered around a circle."""
    angles = np.sort(rng.uniform(0.0, 2.0 * np.pi, n_segments))
    radii = rng.uniform(0.4 * radius, radius, n_segments)
    pts = [
        (
            center[0] + r * np.cos(a),
            center[1] + r * np.sin(a),
        )
        for a, r in zip(angles, radii)
    ]
    p = Path(start=pts[0])
    for i in range(1, n_segments + 1):
        target = pts[i % n_segments]
        prev = pts[i - 1]
        kind = rng.integers(0, 3)
        mid = (
            0.5 * (prev[0] + target[0]) + rng.uniform(-8, 8),
            0.5 * (prev[1] + target[1]) + rng.uniform(-8, 8),
        )
        if kind == 0:
            p.push_line(LineSegment([target]))
        elif kind == 1:
            p.push_integral_quadratic_curve(
                IntegralQuadraticCurveSegment([mid, target])
            )
        else:
            mid2 = (
                0.5 * (mid[0] + target[0]) + rng.uniform(-8, 8),
                0.5 * (mid[1] + target[1]) + rng.uniform(-8, 8),
            )
            p.push_integral_cubic_curve(
                IntegralCubicCurveSegment([mid, mid2, target])
            )
    return p


def random_scene(rng):
    paths = []
    for _ in range(3):
        cx, cy = rng.uniform(16, SIZE - 16, 2)
        r = rng.uniform(7, 13)
        shape_kind = rng.integers(0, 4)
        if shape_kind == 0:
            paths.append(Path.from_circle((cx, cy), r))
        elif shape_kind == 1:
            paths.append(
                Path.from_rounded_rect((cx, cy), (r, 0.8 * r), 0.3 * r)
            )
        elif shape_kind == 2:
            k = int(rng.integers(3, 8))
            ang = rng.uniform(0, 2 * np.pi)
            paths.append(
                Path.from_regular_polygon((cx, cy), r, ang, k)
            )
        else:
            paths.append(
                random_blob(rng, (cx, cy), r, int(rng.integers(3, 7)))
            )
    return paths


class TestFuzzFills:
    def test_random_scenes_match_ground_truth(self):
        rng = np.random.default_rng(20260817)
        renderer = Renderer(Configuration(), SIZE, SIZE)
        positions = oracle.sample_positions(SIZE, SIZE)

        def m2p(pts):
            out = pts.copy()
            out[:, 1] = SIZE - out[:, 1]
            return out

        covered = 0.0
        for scene_index in range(2):
            paths = random_scene(rng)
            shape = Shape(paths)
            image = np.asarray(
                renderer.render(
                    [
                        DrawCommand(RenderOperation.STENCIL, shape, ortho()),
                        DrawCommand(
                            RenderOperation.COLOR, shape, ortho(),
                            color=(1.0, 1.0, 1.0, 1.0),
                        ),
                    ]
                )
            )
            truth = oracle.ground_truth_winding(paths, positions, m2p, 512)
            alpha_truth = (
                oracle.coverage_from_winding(truth)
                .mean(axis=-1)
                .astype(np.float32)
            )
            err = np.abs(image[..., 3] - alpha_truth).mean()
            covered += float(alpha_truth.sum())
            assert err < 2e-3, (
                f"scene {scene_index}: mean alpha error {err}"
            )
        assert covered > 100.0  # sanity: scenes were non-empty
