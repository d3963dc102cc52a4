"""2D convex hull (Andrew's monotone chain).

Mirrors reference src/convex_hull.rs:7-40: lexicographic sort, pop while
the turn is not strictly counterclockwise beyond ERROR_MARGIN (removing
collinear points), two chains.  Output is the hull in counterclockwise
order, which downstream code triangulates as a fan of CCW triangles for
the cover passes.
"""

from __future__ import annotations

import numpy as np

from .error import ERROR_MARGIN


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def andrew(input_points) -> np.ndarray:
    """Convex hull of (n, 2) points, counterclockwise, collinear points
    removed (up to ERROR_MARGIN in doubled-area units)."""
    pts = np.asarray(input_points, dtype=np.float64).reshape(-1, 2)
    if len(pts) < 3:
        return pts.copy()
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]
    hull = []
    for p in pts:
        while len(hull) > 1 and _cross(hull[-2], hull[-1], p) <= ERROR_MARGIN:
            hull.pop()
        hull.append(p)
    hull.pop()
    t = len(hull) + 1
    for p in pts[::-1]:
        while len(hull) > t and _cross(hull[-2], hull[-1], p) <= ERROR_MARGIN:
            hull.pop()
        hull.append(p)
    hull.pop()
    return np.array(hull)
