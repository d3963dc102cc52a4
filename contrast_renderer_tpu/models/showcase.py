"""The showcase scene: dashed rounded-rect stroke + "Hello World" glyphs,
46 instances under a perspective camera.

Mirrors the reference's showcase example (examples/showcase/main.rs):
the same paths (main.rs:59-94), the same dashed stroke group with
animated phase (main.rs:59-68, 155-161), the same 1 + 9x5 instance grid
with per-instance color (main.rs:173-200) and the same perspective
camera (main.rs:162-172).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from ..path import (
    Cap,
    CurveApproximation,
    DashInterval,
    DynamicStrokeOptions,
    Join,
    Path,
    StrokeOptions,
)
from ..assets import load_default_font
from ..renderer import DrawCommand, RenderOperation, Shape
from ..text import Alignment, Font, Layout, Orientation, paths_of_text
from ..utils import matrix

ROWS = 9
COLUMNS = 5


def dashed_options(phase: float) -> DynamicStrokeOptions:
    """The showcase's animated dash group (main.rs:59-68, 155-161)."""
    return DynamicStrokeOptions.make_dashed(
        Join.MITER,
        [
            DashInterval(
                gap_start=3.0, gap_end=4.0, dash_start=Cap.BUTT, dash_end=Cap.BUTT
            )
        ],
        phase=phase,
    )


def build_shape(font: Optional[Font] = None, with_text: bool = True) -> Shape:
    """The showcase Shape: stroked rounded rect + reversed glyph fills
    (main.rs:70-94)."""
    paths: List[Path] = []
    rect = Path.from_rounded_rect((0.0, 0.0), (5.8, 1.3), 0.5)
    rect.stroke_options = StrokeOptions(
        width=0.1,
        offset=0.0,
        miter_clip=1.0,
        closed=True,
        dynamic_stroke_options_group=0,
        curve_approximation=CurveApproximation.uniform_tangent_angle(0.1),
    )
    paths.append(rect)
    if with_text:
        if font is None:
            font = load_default_font()
        text_paths = paths_of_text(
            font.face,
            Layout(
                size=2.7,
                orientation=Orientation.LEFT_TO_RIGHT,
                major_alignment=Alignment.CENTER,
                minor_alignment=Alignment.CENTER,
            ),
            "Hello World",
        )
        for path in text_paths:
            path.reverse()
        paths.extend(text_paths)
    return Shape(paths, [dashed_options(0.0)])


def instance_transforms_and_colors(
    width: int, height: int, view_rotation=None, view_distance: float = 5.0
) -> Tuple[np.ndarray, np.ndarray]:
    """The 1 + ROWS*COLUMNS instance matrices and colors
    (main.rs:162-200)."""
    if view_rotation is None:
        view_rotation = np.array([1.0, 0.0, 0.0, 0.0])
    projection = matrix.matrix_multiplication(
        matrix.perspective_projection(
            math.pi * 0.5, width / height, 1.0, 1000.0
        ),
        matrix.motor3d_to_mat4(
            matrix.motor3d_product(
                matrix.motor3d_new(
                    [1.0, 0, 0, 0, 0, 0, 0, -0.5 * view_distance]
                ),
                matrix.rotor_to_motor3d(view_rotation),
            )
        ),
    )
    # The grid instances are pure-translation motors (dual part d,
    # translation -2d); their mat4 product with the projection is the
    # projection with a recombined last column — batched numpy instead
    # of 45 Python-loop motor conversions (this runs per frame under
    # camera animation).
    n = ROWS * COLUMNS
    x_idx = np.tile(np.arange(COLUMNS, dtype=np.float64), ROWS)
    y_idx = np.repeat(np.arange(ROWS, dtype=np.float64), COLUMNS)
    d = np.stack(
        [
            (x_idx + 0.5 - COLUMNS * 0.5) * 7.0,
            (y_idx + 0.5 - ROWS * 0.5) * 3.0,
            np.full(n, -5.0),
        ],
        axis=-1,
    )
    trans = -2.0 * d
    col3 = (
        projection[0][None] * trans[:, 0:1]
        + projection[1][None] * trans[:, 1:2]
        + projection[2][None] * trans[:, 2:3]
        + projection[3][None]
    )
    mats = np.broadcast_to(projection, (n, 4, 4)).copy()
    mats[:, 3, :] = col3
    transforms = np.concatenate([np.asarray(projection)[None], mats])
    red = x_idx / COLUMNS
    green = y_idx / ROWS
    colors = np.concatenate(
        [
            np.array([[1.0, 1.0, 1.0, 1.0]]),
            np.stack([red, green, 1.0 - red - green, np.ones(n)], axis=-1),
        ]
    )
    # Column-layout mat4 → standard row-major for the renderer.
    return transforms.transpose(0, 2, 1), colors


def showcase_commands(
    shape: Shape, width: int, height: int, **camera
) -> List[DrawCommand]:
    """Per-instance Stencil then Color (main.rs:236-250)."""
    transforms, colors = instance_transforms_and_colors(width, height, **camera)
    commands: List[DrawCommand] = []
    for transform, color in zip(transforms, colors):
        commands.append(
            DrawCommand(RenderOperation.STENCIL, shape, transform)
        )
        commands.append(
            DrawCommand(
                RenderOperation.COLOR, shape, transform, color=tuple(color)
            )
        )
    return commands
