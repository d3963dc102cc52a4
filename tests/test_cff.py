"""CFF (OpenType .otf) outline support.

The reference's text feature parses CFF outlines through ttf-parser
(src/text.rs:25); here `ttf.Face` dispatches to `cff.py`.  Test fonts
are synthesized with fontTools (test-only tool), and outlines are
verified against fontTools's own Type 2 charstring interpreter as an
independent oracle.  A real CFF font with local subroutines (a pygame
test fixture, if installed) cross-checks every glyph.
"""

import io
import os

import numpy as np
import pytest

pytest.importorskip("fontTools")

from fontTools.fontBuilder import FontBuilder
from fontTools.misc.psCharStrings import T2CharString
from fontTools.pens.recordingPen import RecordingPen
from fontTools.pens.t2CharStringPen import T2CharStringPen
from fontTools.ttLib import TTFont

from contrast_renderer_tpu.error import UnsupportedFontFormat
from contrast_renderer_tpu.text import Font, paths_of_glyph
from contrast_renderer_tpu.ttf import Face

PYGAME_OTF = (
    "/opt/venv/lib/python3.12/site-packages/pygame/tests/fixtures/"
    "fonts/test_fixed.otf"
)


class RecBuilder:
    """Records ttf.Face outline callbacks in RecordingPen's shape."""

    def __init__(self):
        self.ops = []
        self._start = None
        self._cur = None

    def move_to(self, x, y):
        self.ops.append(("moveTo", ((x, y),)))
        self._start = self._cur = (x, y)

    def line_to(self, x, y):
        self.ops.append(("lineTo", ((x, y),)))
        self._cur = (x, y)

    def quad_to(self, x1, y1, x, y):
        self.ops.append(("qCurveTo", ((x1, y1), (x, y))))
        self._cur = (x, y)

    def curve_to(self, x1, y1, x2, y2, x, y):
        self.ops.append(("curveTo", ((x1, y1), (x2, y2), (x, y))))
        self._cur = (x, y)

    def close(self):
        self.ops.append(("closePath", ()))


def _assert_outlines_match(got_ops, want_ops, label=""):
    """Compare our callback stream to RecordingPen's value stream.

    fontTools' T2 interpreter emits an explicit closing lineTo back to
    the contour start when the last point differs; ours relies on the
    fill's implicit contour closing (as the reference's OutlineBuilder
    does).  Normalize by dropping a lineTo-to-start directly preceding
    closePath on both sides."""

    def normalize(ops):
        out = []
        start = None
        for op, args in ops:
            if op == "moveTo":
                start = args[0]
            if (
                op == "closePath"
                and out
                and out[-1][0] == "lineTo"
                and start is not None
                and np.allclose(out[-1][1][0], start, atol=1e-6)
            ):
                out.pop()
            out.append((op, args))
        return out

    got = normalize(got_ops)
    want = normalize(want_ops)
    assert len(got) == len(want), (
        f"{label}: {len(got)} ops vs oracle {len(want)}\n{got}\n{want}"
    )
    for (g_op, g_args), (w_op, w_args) in zip(got, want):
        assert g_op == w_op, f"{label}: {g_op} vs {w_op}"
        ga = np.asarray(g_args, np.float64).reshape(-1)
        wa = np.asarray(w_args, np.float64).reshape(-1)
        assert np.allclose(ga, wa, atol=1e-6), (
            f"{label}: {g_op} {g_args} vs {w_args}"
        )


def build_otf(charstrings_extra=None, draw_fns=None, upem=1000):
    """Synthesize a minimal OTF: .notdef + the given glyphs, mapped to
    their single-character names."""
    draw_fns = draw_fns or {}
    charstrings_extra = charstrings_extra or {}
    order = [".notdef"] + sorted(draw_fns) + sorted(charstrings_extra)
    fb = FontBuilder(upem, isTTF=False)
    fb.setupGlyphOrder(order)
    fb.setupCharacterMap(
        {ord(g): g for g in list(draw_fns) + list(charstrings_extra)}
    )
    charstrings = {".notdef": T2CharStringPen(600, None).getCharString()}
    for name, fn in draw_fns.items():
        pen = T2CharStringPen(600, None)
        fn(pen)
        charstrings[name] = pen.getCharString()
    charstrings.update(charstrings_extra)
    fb.setupCFF("TestCFF", {}, charstrings, {})
    fb.setupHorizontalMetrics({g: (600, 50) for g in order})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "TestCFF", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()
    buf = io.BytesIO()
    fb.save(buf)
    return buf.getvalue()


def _oracle_ops(font_bytes, glyph_name):
    tt = TTFont(io.BytesIO(font_bytes))
    pen = RecordingPen()
    tt["CFF "].cff[0].CharStrings[glyph_name].draw(pen)
    return pen.value


def _our_ops(font_bytes, glyph_name):
    face = Face(font_bytes)
    # Resolve the glyph id via the font's glyph order (fontTools) so the
    # comparison does not depend on our cmap.
    gid = TTFont(io.BytesIO(font_bytes)).getGlyphID(glyph_name)
    rec = RecBuilder()
    face.outline_glyph(gid, rec)
    return rec.ops


class TestCFFOutlines:
    def test_lines_and_cubics_roundtrip(self):
        def draw_a(pen):
            pen.moveTo((100, 100))
            pen.lineTo((500, 100))
            pen.lineTo((500, 500))
            pen.lineTo((100, 500))
            pen.closePath()

        def draw_b(pen):
            pen.moveTo((100, 0))
            pen.curveTo((150, 200), (450, 600), (300, 700))
            pen.curveTo((250, 650), (120, 380), (100, 300))
            pen.closePath()
            # Second contour: a counter.
            pen.moveTo((200, 200))
            pen.lineTo((200, 300))
            pen.curveTo((250, 330), (300, 280), (280, 210))
            pen.closePath()

        data = build_otf(draw_fns={"A": draw_a, "B": draw_b})
        for g in ("A", "B"):
            _assert_outlines_match(
                _our_ops(data, g), _oracle_ops(data, g), g
            )

    def test_specialized_operators_match_oracle(self):
        """Hand-assembled charstrings per Type 2 operator family,
        cross-checked against fontTools's interpreter."""
        progs = {
            # hlineto/vlineto alternation, odd and even counts.
            "C": [100, 100, "rmoveto", 50, 40, 30, "hlineto",
                  25, 35, "vlineto", "endchar"],
            # vvcurveto with leading dx1; hhcurveto with leading dy1.
            "D": [100, 100, "rmoveto",
                  13, 10, 20, 30, 40, 10, 20, 30, 40, "vvcurveto",
                  7, 10, 20, 30, 40, "hhcurveto", "endchar"],
            # vhcurveto with trailing 5th arg; rcurveline; rlinecurve.
            "E": [50, 50, "rmoveto",
                  10, 20, 30, 40, 50, 60, 70, 80, 15, "vhcurveto",
                  5, 6, 7, 8, 9, 10, 11, 12, "rcurveline",
                  3, 4, 5, 6, 1, 2, 3, 4, 5, 6, "rlinecurve",
                  "endchar"],
            # Stems + hintmask skipping; width argument present (601).
            "F": [601, 20, 40, 100, 40, "hstemhm", 30, 50, "vstemhm",
                  "hintmask", b"\xf0",
                  80, 80, "rmoveto", 200, "hlineto", 100, "vlineto",
                  "endchar"],
            # The flex family.
            "G": [100, 400, "rmoveto",
                  10, 20, 30, 40, 50, -20, 30, -40, 20, -10, 10, 30, 50,
                  "flex",
                  20, 30, 40, 50, 60, 70, 80, "hflex",
                  10, 20, 30, 40, 50, 60, 70, -30, 80, "hflex1",
                  11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, "flex1",
                  "endchar"],
        }
        charstrings = {
            name: T2CharString(program=prog) for name, prog in progs.items()
        }
        data = build_otf(charstrings_extra=charstrings)
        for g in progs:
            _assert_outlines_match(
                _our_ops(data, g), _oracle_ops(data, g), g
            )

    def test_face_integration(self):
        """glyph_index / bounding box / paths_of_glyph over a CFF face."""

        def draw_a(pen):
            pen.moveTo((100, 100))
            pen.lineTo((500, 100))
            pen.lineTo((300, 500))
            pen.closePath()

        data = build_otf(draw_fns={"A": draw_a})
        font = Font("synthetic-otf", data)
        gid = font.face.glyph_index("A")
        assert gid is not None
        paths = paths_of_glyph(font.face, gid)
        assert len(paths) == 1
        bbox = font.face.glyph_bounding_box(gid)
        assert bbox == (100, 100, 500, 500)
        assert font.face.glyph_hor_advance(gid) == 600

    @pytest.mark.skipif(
        not os.path.exists(PYGAME_OTF), reason="pygame OTF fixture absent"
    )
    def test_real_font_with_local_subrs_matches_oracle(self):
        """Every glyph of a real CFF font (378 local subroutine calls,
        biased indices) decodes identically to fontTools."""
        with open(PYGAME_OTF, "rb") as fh:
            data = fh.read()
        face = Face(data)
        tt = TTFont(io.BytesIO(data))
        cs = tt["CFF "].cff[0].CharStrings
        n_checked = 0
        for name in tt.getGlyphOrder():
            want = RecordingPen()
            cs[name].draw(want)
            rec = RecBuilder()
            face.outline_glyph(tt.getGlyphID(name), rec)
            _assert_outlines_match(rec.ops, want.value, name)
            n_checked += 1
        assert n_checked > 300

    def test_unsupported_formats_fail_loudly(self):
        def draw_a(pen):
            pen.moveTo((0, 0))
            pen.lineTo((10, 0))
            pen.closePath()

        data = build_otf(draw_fns={"A": draw_a})
        with pytest.raises(UnsupportedFontFormat):
            Face(data.replace(b"CFF ", b"CFF2"))
        with pytest.raises(UnsupportedFontFormat):
            Face(data.replace(b"CFF ", b"XYZ "))
