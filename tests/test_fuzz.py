"""Randomized device-vs-ground-truth fuzzing of the full render path.

Scenes of random polygons, circles, rounded rects and free-form
quadratic/cubic loops run through the complete Renderer (stencil +
color cover) and are compared against the analytic polyline winding of
the same paths (oracle.ground_truth_winding — dense flattening, no
shared code with the device path).  Seeded for determinism; one shape
per scene keeps a single compiled frame program.
"""

import numpy as np
import pytest

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

# Each randomized scene compiles its own frame program — minutes of XLA
# compile time cold; excluded from the fast gate (pytest.ini).
pytestmark = pytest.mark.slow

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


class TestFuzzRational:
    """Random scenes of rational quadratics/cubics (ellipses, SVG
    elliptical arcs, weight-lifted blobs) vs the analytic polyline
    ground truth — covering the two segment types the fill fuzz above
    does not (shaders.wgsl:252-266 predicates)."""

    def test_rational_scenes_match_ground_truth(self):
        rng = np.random.default_rng(20260818)
        renderer = Renderer(Configuration(), SIZE, SIZE)
        positions = oracle.sample_positions(SIZE, SIZE)

        def m2p(pts):
            out = pts.copy()
            out[:, 1] = SIZE - out[:, 1]
            return out

        covered = 0.0
        for scene_index in range(2):
            paths = []
            # Ellipse: four weight-1/sqrt(2) rational quadratics.
            cx, cy = rng.uniform(18, SIZE - 18, 2)
            paths.append(
                Path.from_ellipse(
                    (cx, cy), (rng.uniform(8, 14), rng.uniform(5, 10))
                )
            )
            # SVG elliptical arcs: rational quadratics with general
            # weights (path.rs:639-708).
            cx, cy = rng.uniform(18, SIZE - 18, 2)
            p = Path(start=(cx - 10.0, cy))
            p.push_elliptical_arc(
                (rng.uniform(8, 12), rng.uniform(5, 8)),
                rng.uniform(0, np.pi),
                bool(rng.integers(0, 2)),
                True,
                (cx + 10.0, cy),
            )
            p.push_line(LineSegment([(cx - 10.0, cy)]))
            paths.append(p)
            # Weight-lifted blob: integral -> rational, quadratics ->
            # rational cubics with non-unit weights (path.rs:490-615).
            cx, cy = rng.uniform(20, SIZE - 20, 2)
            blob = random_blob(rng, (cx, cy), rng.uniform(8, 12), 5)
            blob = blob.convert_integral_curves_to_rational_curves()
            blob = blob.convert_quadratic_curves_to_cubic_curves()
            paths.append(blob)

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
        assert covered > 100.0


def _distance_to_polyline(flat_positions, polyline, closed):
    """Min distance from each (N, 2) position to the polyline's
    segments ((M, 2); closed appends the wrap edge)."""
    a = np.asarray(polyline, np.float64)
    b = np.roll(a, -1, axis=0)
    if not closed:
        a, b = a[:-1], b[:-1]
    ab = b - a
    denom = np.maximum((ab * ab).sum(-1), 1e-30)
    best = np.full(len(flat_positions), np.inf)
    # Chunk over segments to bound the (N, M) temporaries.
    for lo in range(0, len(a), 512):
        aa = a[lo:lo + 512]
        dd = ab[lo:lo + 512]
        t = np.clip(
            ((flat_positions[:, None, :] - aa[None]) * dd[None]).sum(-1)
            / denom[lo:lo + 512][None],
            0.0,
            1.0,
        )
        proj = aa[None] + t[..., None] * dd[None]
        d2 = ((flat_positions[:, None, :] - proj) ** 2).sum(-1)
        best = np.minimum(best, np.sqrt(d2.min(axis=1)))
    return best


class TestFuzzStrokes:
    """Random stroked paths (round joins, round caps, solid) vs the
    analytic stroke region: with round joins and round caps the exact
    stroke is {p : dist(p, curve) <= width/2} — no shared code with the
    stroke tessellator or the device predicates.  Samples within a
    small band of the region boundary are excluded (the polygon
    approximation of curves, stroke.rs:134-168 semantics, legitimately
    deviates there); everything else must match exactly."""

    def test_random_strokes_match_distance_oracle(self):
        from contrast_renderer_tpu.path import (
            Cap,
            CurveApproximation,
            DynamicStrokeOptions,
            Join,
            StrokeOptions,
        )

        rng = np.random.default_rng(20260819)
        renderer = Renderer(Configuration(), SIZE, SIZE)
        positions = oracle.sample_positions(SIZE, SIZE)
        flat = positions.reshape(-1, 2)
        solid = DynamicStrokeOptions.make_solid(
            Join.ROUND, Cap.ROUND, Cap.ROUND
        )

        for scene_index in range(2):
            width = float(rng.uniform(3.0, 6.0))
            paths = []
            for _ in range(2):
                cx, cy = rng.uniform(16, SIZE - 16, 2)
                p = random_blob(rng, (cx, cy), rng.uniform(8, 13), 4)
                closed = bool(rng.integers(0, 2))
                p.stroke_options = StrokeOptions(
                    width=width,
                    offset=0.0,
                    miter_clip=1.0,
                    closed=closed,
                    dynamic_stroke_options_group=0,
                    curve_approximation=(
                        CurveApproximation.uniform_tangent_angle(0.05)
                    ),
                )
                paths.append(p)
            shape = Shape(paths, [solid])
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

            # Analytic region: union over paths of dist <= width/2.
            dist = np.full(len(flat), np.inf)
            for p in paths:
                poly = oracle.flatten_path(p, 256)
                poly[:, 1] = SIZE - poly[:, 1]  # model -> pixel
                dist = np.minimum(
                    dist,
                    _distance_to_polyline(
                        flat, poly, p.stroke_options.closed
                    ),
                )
            inside = dist <= width / 2.0
            band = np.abs(dist - width / 2.0) < 0.4
            # Compare resolved coverage against the oracle's resolved
            # coverage with boundary-band samples forgiven.
            inside_px = inside.reshape(SIZE, SIZE, 4)
            band_px = band.reshape(SIZE, SIZE, 4)
            want = inside_px.mean(axis=-1)
            have = image[..., 3]
            forgiven = band_px.any(axis=-1)
            exact = ~forgiven
            assert np.abs(have[exact] - want[exact]).max() < 1e-6, (
                f"scene {scene_index}: off-band mismatch"
            )
            # Sanity: the stroke drew something substantial.
            assert want.sum() > 50.0


def _hull_mask(shape, flat_positions):
    """Inside-convex-hull mask in pixel space for a shape drawn under
    `ortho()` (model -> pixel is (x, SIZE - y))."""
    hull = np.asarray(shape.convex_hull, np.float64)
    if len(hull) < 3:
        return np.zeros(len(flat_positions), bool)
    pts = hull.copy()
    pts[:, 1] = SIZE - pts[:, 1]
    nxt = np.roll(pts, -1, axis=0)
    area = np.sum(pts[:, 0] * nxt[:, 1] - nxt[:, 0] * pts[:, 1])
    if area < 0:
        pts = pts[::-1]
        nxt = np.roll(pts, -1, axis=0)
    inside = np.ones(len(flat_positions), bool)
    for a, b in zip(pts, nxt):
        e = (b[0] - a[0]) * (flat_positions[:, 1] - a[1]) - (
            b[1] - a[1]
        ) * (flat_positions[:, 0] - a[0])
        inside &= e >= 0.0
    return inside


class TestFuzzClipAlpha:
    """Random nested clip + transparency-group command stacks vs a
    numpy per-sample compositing oracle implementing the documented
    stencil/blend algebra (renderer.rs:692-861) directly from the
    ground-truth winding — no shared code with the Pallas kernel."""

    def test_random_stacks_match_compositing_oracle(self):
        rng = np.random.default_rng(20260820)
        config = Configuration(
            alpha_layer_count=1, blending="front_to_back"
        )
        renderer = Renderer(config, SIZE, SIZE)
        positions = oracle.sample_positions(SIZE, SIZE)
        flat = positions.reshape(-1, 2)
        winding_mask = 15

        def m2p(pts):
            out = pts.copy()
            out[:, 1] = SIZE - out[:, 1]
            return out

        def random_shape_paths():
            cx, cy = rng.uniform(20, SIZE - 20, 2)
            r = rng.uniform(10, 16)
            kind = rng.integers(0, 3)
            if kind == 0:
                return [Path.from_circle((cx, cy), r)]
            if kind == 1:
                return [
                    Path.from_rounded_rect((cx, cy), (r, 0.7 * r), 0.3 * r)
                ]
            return [
                Path.from_regular_polygon((cx, cy), r, rng.uniform(0, 3), 5)
            ]

        from contrast_renderer_tpu.renderer import (
            LinearGradient,
            RadialGradient,
            _paint_kind,
        )

        for scene_index in range(2):
            path_lists = [random_shape_paths() for _ in range(3)]
            shapes = [Shape(p) for p in path_lists]
            clip_shape, content, overlay = shapes
            colors = rng.uniform(0.1, 1.0, (3, 4)).astype(np.float32)
            group_opacity = float(rng.uniform(0.3, 0.9))
            # Scene 1 paints the group content with a random gradient
            # (linear then radial would need a third scene; alternate).
            if scene_index == 1:
                pts = rng.uniform(10, SIZE - 10, (2, 2))
                n_stops = int(rng.integers(2, 5))
                offsets = np.sort(rng.uniform(0.0, 1.0, n_stops))
                stop_colors = rng.uniform(0.1, 1.0, (n_stops, 4))
                paint_cls = LinearGradient if rng.integers(2) else RadialGradient
                content_color = paint_cls(
                    tuple(pts[0]), tuple(pts[1]),
                    stops=tuple(
                        (float(o), tuple(c))
                        for o, c in zip(offsets, stop_colors)
                    ),
                )
            else:
                content_color = tuple(colors[1])

            commands = [
                DrawCommand(RenderOperation.STENCIL, clip_shape, ortho()),
                DrawCommand(
                    RenderOperation.CLIP, clip_shape, ortho(), clip_depth=1
                ),
                DrawCommand(
                    RenderOperation.SAVE_ALPHA_CONTEXT, overlay, ortho(),
                    clip_depth=1, alpha_layer=0,
                ),
                DrawCommand(
                    RenderOperation.SCALE_ALPHA_CONTEXT, overlay, ortho(),
                    clip_depth=1,
                    color=(0.0, 0.0, 0.0, group_opacity),
                ),
                DrawCommand(
                    RenderOperation.STENCIL, content, ortho(), clip_depth=1
                ),
                DrawCommand(
                    RenderOperation.COLOR, content, ortho(),
                    color=content_color, clip_depth=1,
                ),
                DrawCommand(
                    RenderOperation.RESTORE_ALPHA_CONTEXT, overlay,
                    ortho(), clip_depth=1,
                    color=(0.0, 0.0, 0.0, group_opacity), alpha_layer=0,
                ),
                DrawCommand(
                    RenderOperation.UNCLIP, clip_shape, ortho(),
                    clip_depth=0,
                ),
                DrawCommand(RenderOperation.STENCIL, overlay, ortho()),
                DrawCommand(
                    RenderOperation.COLOR, overlay, ortho(),
                    color=tuple(colors[2]),
                ),
            ]
            image = np.asarray(renderer.render(commands))

            # ---- oracle: per-sample state machine --------------------
            n = len(flat)
            wind = np.zeros(n, np.int64)
            clipb = np.zeros(n, np.int64)
            color = np.zeros((n, 4), np.float64)
            layer = np.zeros(n, np.float64)
            truth = {
                id(s): oracle.ground_truth_winding(
                    p, positions, m2p, 512
                ).reshape(-1)
                for s, p in zip(shapes, path_lists)
            }
            hull = {id(s): _hull_mask(s, flat) for s in shapes}

            for cmd in commands:
                op = cmd.operation
                depth = cmd.clip_depth
                clip_ok = clipb == depth
                if op == RenderOperation.STENCIL:
                    wind += np.where(clip_ok, truth[id(cmd.shape)], 0)
                    continue
                in_hull = hull[id(cmd.shape)]
                nonzero = (wind & winding_mask) != 0
                pk = _paint_kind(cmd.color)
                ca = 0.0 if pk else float(np.asarray(cmd.color)[3])
                if op == RenderOperation.COLOR:
                    mask = in_hull & nonzero & clip_ok
                    if pk:
                        # Gradient: per-sample multi-stop interpolation
                        # in pixel space (endpoints through the same
                        # model→pixel map as the winding positions).
                        pts = m2p(
                            cmd.color.points().astype(np.float64).copy()
                        )
                        delta = pts[1] - pts[0]
                        den = max(float(delta @ delta), 1e-12)
                        rel = flat - pts[0][None]
                        if pk == 1:
                            t = (rel @ delta) / den
                        else:
                            t = np.sqrt((rel * rel).sum(-1) / den)
                        t = np.clip(t, 0.0, 1.0)[:, None]
                        offs, cols = cmd.color.stop_table()
                        offs = offs.astype(np.float64)
                        cols = cols.astype(np.float64)
                        rgba = np.broadcast_to(
                            cols[0][None], (len(t), 4)
                        ).copy()
                        for si in range(len(offs) - 1):
                            f = np.clip(
                                (t[:, 0] - offs[si])
                                / max(offs[si + 1] - offs[si], 1e-6),
                                0.0, 1.0,
                            )
                            rgba += (cols[si + 1] - cols[si])[None] * (
                                f[:, None]
                            )
                        src = np.concatenate(
                            [rgba[:, :3] * rgba[:, 3:4], rgba[:, 3:4]],
                            axis=1,
                        )
                    else:
                        s = np.asarray(cmd.color, np.float64)
                        src = np.broadcast_to(
                            np.array([s[0] * ca, s[1] * ca, s[2] * ca, ca]),
                            (n, 4),
                        )
                    remaining = 1.0 - color[:, 3]
                    color = np.where(
                        mask[:, None],
                        color + src * remaining[:, None],
                        color,
                    )
                    wind = np.where(mask, 0, wind)
                elif op == RenderOperation.CLIP:
                    mask = in_hull & nonzero
                    clipb = np.where(mask, depth, clipb)
                    wind = np.where(mask, 0, wind)
                elif op == RenderOperation.UNCLIP:
                    mask = in_hull & (clipb > depth)
                    clipb = np.where(mask, depth, clipb)
                    wind = np.where(mask, 0, wind)
                elif op == RenderOperation.SAVE_ALPHA_CONTEXT:
                    mask = in_hull & clip_ok
                    layer = np.where(mask, color[:, 3], layer)
                elif op == RenderOperation.SCALE_ALPHA_CONTEXT:
                    mask = in_hull & clip_ok
                    color[:, 3] = np.where(
                        mask, (1.0 - ca) + ca * color[:, 3], color[:, 3]
                    )
                elif op == RenderOperation.RESTORE_ALPHA_CONTEXT:
                    mask = in_hull & clip_ok
                    color[:, 3] = np.where(
                        mask,
                        color[:, 3] - (1.0 - layer) * (1.0 - ca),
                        color[:, 3],
                    )

            want = (
                color.reshape(SIZE, SIZE, 4, 4).mean(axis=2)
            ).astype(np.float32)
            err = np.abs(image - want).max()
            assert err < 1e-5, f"scene {scene_index}: max error {err}"
            assert want[..., 3].sum() > 20.0  # non-trivial scene
