"""Application framework: frame loop, event queue, resize, sinks
(the reference's winit loop semantics, application_framework.rs:236-263)."""

import numpy as np

from contrast_renderer_tpu.app import Application, CollectSink, FrameLoop
from contrast_renderer_tpu.path import Path
from contrast_renderer_tpu.renderer import (
    DrawCommand,
    RenderOperation,
    Shape,
)


def ortho(width, height):
    t = np.diag([2.0 / width, 2.0 / height, 1.0, 1.0]).astype(np.float32)
    t[0, 3] = -1.0
    t[1, 3] = -1.0
    return t


class MovingRectApp(Application):
    """A rect whose x position follows the pointer; red while the
    button is held, green otherwise."""

    def __init__(self):
        self.x = 16.0
        self.pressed = False
        self.created = 0
        self.resized = 0
        self.shape = Shape([Path.from_rect((0.0, 0.0), (8.0, 8.0))])

    def create(self, renderer):
        self.created += 1

    def resize(self, renderer):
        self.resized += 1

    def pointer_moved(self, x, y):
        self.x = x

    def pointer_button(self, pressed):
        self.pressed = pressed

    def render(self, renderer, frame_index, time_s):
        t = ortho(renderer.width, renderer.height)
        t[0, 3] += 2.0 * self.x / renderer.width
        t[1, 3] += 1.0  # vertical center
        color = (1.0, 0.0, 0.0, 1.0) if self.pressed else (0.0, 1.0, 0.0, 1.0)
        return renderer.render(
            [
                DrawCommand(RenderOperation.STENCIL, self.shape, t),
                DrawCommand(
                    RenderOperation.COLOR, self.shape, t, color=color
                ),
            ],
            to_host=False,
        )


class TestFrameLoop:
    def test_events_resize_and_sink(self):
        app = MovingRectApp()
        sink = CollectSink()
        loop = FrameLoop(app, 64, 64, sink=sink)
        assert app.created == 1

        frame0 = loop.step()
        assert frame0.shape == (64, 64, 4) and frame0.dtype == np.uint8
        # Rect centered at x=16: covered there, empty at x=48.
        assert frame0[32, 16, 1] == 255 and frame0[32, 16, 3] == 255
        assert frame0[32, 48, 3] == 0

        # Events queue until the next frame boundary.
        loop.send_pointer(48.0, 32.0)
        loop.send_button(True)
        frame1 = loop.step()
        assert frame1[32, 48, 0] == 255  # moved and red
        assert frame1[32, 16, 3] == 0

        # Resize rebuilds per-resolution state and notifies the app.
        loop.request_resize(64, 32)
        frame2 = loop.step()
        assert app.resized == 1
        assert frame2.shape == (32, 64, 4)
        assert frame2[16, 48, 0] == 255

        # The sink saw every presented frame; timing accumulated.
        assert len(sink.frames) == 3
        assert loop.timer.frame_index == 3 and loop.timer.average_s > 0

    def test_background_composite(self):
        app = MovingRectApp()
        loop = FrameLoop(app, 64, 64, background=(1.0, 1.0, 1.0, 1.0))
        frame = loop.step()
        # Outside the rect: the white background, not transparent black.
        assert tuple(frame[2, 60]) == (255, 255, 255, 255)
