"""The rendering interface: Configuration, Shape, Renderer.

The TPU-native replacement for the reference's wgpu runtime
(src/renderer.rs).  A frame is a sequence of draw commands — the same
operations as the reference's `RenderOperation`
(renderer.rs:143-160): Stencil, Clip, UnClip, Color, SaveAlphaContext,
ScaleAlphaContext, RestoreAlphaContext — executed by one jitted array
program that carries explicit per-sample state instead of stencil bits
and auxiliary textures:

- ``winding`` (H, W, S) int32 — the stencil winding counter
  (renderer.rs:565-582)
- ``clip_depth`` (H, W, S) int32 — the clip nesting counter
  (renderer.rs:692-729)
- ``color`` (H, W, S, 4) f32 premultiplied RGBA — the MSAA framebuffer
- ``alpha_layers`` (L, H, W, S) f32 — the alpha-context textures
  (renderer.rs:892-929)

Stencil commands rasterize the shape's triangle table (tiled, binned,
MSAA) and add winding where the sample's clip depth matches; cover
commands apply the winding rule inside the shape's transformed convex
hull and composite/clip/save alpha exactly as the reference's stencil
and blend states prescribe (see the per-op comments in `_apply_cover`).
"""

from __future__ import annotations

import enum
import functools
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import dynamic_stroke as ds
from .convex_hull import andrew
from .error import (
    ClipStackOverflow,
    DynamicStrokeOptionsIndexOutOfBounds,
    NumberOfStencilBitsIsUnsupported,
    TooManyNestedOpacityGroups,
)
from .fill import FillBuilder
from .ops import raster
from .path import DynamicStrokeOptions, Path
from .stroke import JOINT_TIP_FLAG, StrokeBuilder
from .vertex import (
    END_CAP_FLAG,
    KIND_STROKE_JOINT,
    KIND_STROKE_LINE,
    TriangleTable,
)


class RenderOperation(enum.IntEnum):
    """What a draw command does (reference renderer.rs:143-160)."""

    STENCIL = 0
    CLIP = 1
    UNCLIP = 2
    COLOR = 3
    SAVE_ALPHA_CONTEXT = 4
    SCALE_ALPHA_CONTEXT = 5
    RESTORE_ALPHA_CONTEXT = 6


@dataclass
class Configuration:
    """Configurable renderer parameters (reference renderer.rs:379-405).

    `msaa_sample_count` ∈ {1, 4}; up to 2**clip_nesting_counter_bits
    nested clip shapes; the winding rule is nonzero modulo
    2**winding_counter_bits (1 bit = even-odd); up to
    `alpha_layer_count` nested transparency groups.
    """

    msaa_sample_count: int = 4
    clip_nesting_counter_bits: int = 4
    winding_counter_bits: int = 4
    alpha_layer_count: int = 0
    #: "back_to_front": premultiplied-alpha OVER (the showcase's blend
    #: state, examples/showcase/main.rs:30-45); "front_to_back":
    #: src·(1-dstAlpha) accumulation — required by the opacity-group
    #: machinery, whose save/scale/restore algebra (renderer.rs:756-861)
    #: treats frame alpha as accumulated occlusion.
    blending: str = "back_to_front"

    def __post_init__(self):
        if self.blending not in ("back_to_front", "front_to_back"):
            raise ValueError(f"unknown blending {self.blending!r}")
        if (
            self.winding_counter_bits == 0
            or self.clip_nesting_counter_bits + self.winding_counter_bits > 8
        ):
            raise NumberOfStencilBitsIsUnsupported(
                f"clip={self.clip_nesting_counter_bits} winding={self.winding_counter_bits}"
            )
        if self.msaa_sample_count not in (1, 4):
            raise ValueError("msaa_sample_count must be 1 or 4")


class Shape:
    """A set of paths always rendered together
    (reference Shape, renderer.rs:163-249).

    Tessellates stroked and filled paths into one triangle table (stroke
    triangles first, preserving the reference's draw order,
    renderer.rs:275-336) plus the convex hull used by the cover
    operations.
    """

    def __init__(
        self,
        paths: Sequence[Path],
        dynamic_stroke_options: Sequence[DynamicStrokeOptions] = (),
    ):
        proto_hull: List = []
        stroke_builder = StrokeBuilder()
        fill_builder = FillBuilder()
        for path in paths:
            if path.stroke_options is not None:
                if path.stroke_options.dynamic_stroke_options_group >= len(
                    dynamic_stroke_options
                ):
                    raise DynamicStrokeOptionsIndexOutOfBounds(
                        f"group {path.stroke_options.dynamic_stroke_options_group}"
                    )
                stroke_builder.add_path(proto_hull, path)
            else:
                fill_builder.add_path(proto_hull, path)
        self.triangles = TriangleTable.concatenate(
            [stroke_builder.build(), fill_builder.build()]
        )
        self.convex_hull = andrew(
            np.asarray(proto_hull).reshape(-1, 2)
            if proto_hull
            else np.zeros((0, 2))
        )
        self.dynamic_stroke_options = list(dynamic_stroke_options)
        self.descriptors = ds.StrokeDescriptorTable.from_options(
            self.dynamic_stroke_options
        )

    def set_dynamic_stroke_options(
        self, index: int, options: DynamicStrokeOptions
    ):
        """Update one descriptor group (dash pattern / phase animation)
        without re-tessellating (reference renderer.rs:360-376)."""
        if index >= len(self.dynamic_stroke_options):
            raise DynamicStrokeOptionsIndexOutOfBounds(str(index))
        self.dynamic_stroke_options[index] = options
        self.descriptors = ds.StrokeDescriptorTable.from_options(
            self.dynamic_stroke_options
        )


@dataclass
class DrawCommand:
    """One step of a frame (the reference's Shape::render call with a
    RenderOperation, renderer.rs:267-355)."""

    operation: RenderOperation
    shape: Shape
    transform: np.ndarray  # (4, 4) row-major model→clip
    color: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 1.0)
    clip_depth: int = 0  # reference set_clip_depth (renderer.rs:931-938)
    alpha_layer: int = 0


class Renderer:
    """Executes frames of draw commands on the device
    (replaces reference Renderer, renderer.rs:408-884)."""

    def __init__(
        self,
        config: Configuration,
        width: int,
        height: int,
        tile_size: int = 32,
        tile_capacity: int = 512,
    ):
        self.config = config
        self.width = int(width)
        self.height = int(height)
        self.tile_size = int(tile_size)
        self.tile_capacity = int(tile_capacity)
        self._executors = {}

    # ------------------------------------------------------------------

    def render(self, commands: Sequence[DrawCommand], background=None):
        """Render a frame; returns (H, W, 4) premultiplied RGBA float32.

        Commands sharing a Shape reuse its tables; the jitted executor is
        cached by the frame's static signature (command count, padded
        table sizes), so animating transforms/colors/dash phases does not
        retrace.
        """
        packed = self._pack_commands(commands)
        (xy, aux, kind, meta, hull, desc_arrays, op, cmd_shape,
         transform, color, scalar, signature) = packed
        executor = self._executors.get(signature)
        if executor is None:
            executor = self._build_executor(signature)
            self._executors[signature] = executor
        image = executor(
            xy, aux, kind, meta, hull, desc_arrays, op, cmd_shape,
            transform, color, scalar,
        )
        if isinstance(image, tuple):
            self._debug = tuple(np.asarray(x) for x in image[1:])
            image = image[0]
        image = np.asarray(image)
        if background is not None:
            alpha = image[..., 3:4]
            image = image + np.asarray(background, np.float32) * (1.0 - alpha)
        return image


    def _pack_commands(self, commands):
        """Validate and pack a command list into padded device arrays +
        the executor cache signature (shared by render and the
        band-sharded multi-chip path)."""
        config = self.config
        for command in commands:
            if command.clip_depth >= (1 << config.clip_nesting_counter_bits):
                raise ClipStackOverflow(str(command.clip_depth))
            if command.operation in (
                RenderOperation.SAVE_ALPHA_CONTEXT,
                RenderOperation.SCALE_ALPHA_CONTEXT,
                RenderOperation.RESTORE_ALPHA_CONTEXT,
            ) and command.alpha_layer >= config.alpha_layer_count:
                raise TooManyNestedOpacityGroups(str(command.alpha_layer))

        shapes = []
        shape_ids = {}
        for command in commands:
            if id(command.shape) not in shape_ids:
                shape_ids[id(command.shape)] = len(shapes)
                shapes.append(command.shape)

        t_max = max(1, max(len(s.triangles) for s in shapes))
        h_max = max(3, max(len(s.convex_hull) for s in shapes))
        g_max = max(1, max(len(s.descriptors.phase) for s in shapes))

        def pad_tables(shape):
            t = shape.triangles
            pad = t_max - len(t)
            xy = np.concatenate([t.xy, np.zeros((pad, 3, 2), np.float32)])
            aux = np.concatenate([t.aux, np.zeros((pad, 3, 4), np.float32)])
            kind = np.concatenate([t.kind, np.zeros(pad, np.int32)])
            meta = np.concatenate([t.meta, np.zeros((pad, 2), np.float32)])
            hull = shape.convex_hull.astype(np.float32)
            if len(hull) == 0:
                hull = np.zeros((1, 2), np.float32)
            hull = np.concatenate(
                [hull, np.repeat(hull[-1:], h_max - len(hull), axis=0)]
            )
            return xy, aux, kind, meta, hull

        padded = [pad_tables(s) for s in shapes]
        xy = np.stack([p[0] for p in padded])
        aux = np.stack([p[1] for p in padded])
        kind = np.stack([p[2] for p in padded])
        meta = np.stack([p[3] for p in padded])
        hull = np.stack([p[4] for p in padded])

        def pad_descriptors(shape):
            d = shape.descriptors
            g = len(d.phase)
            pad = g_max - g

            def p(a, fill=0):
                return np.concatenate(
                    [a, np.full((pad,) + a.shape[1:], fill, a.dtype)]
                )

            return [
                p(d.gap_start),
                p(d.gap_end, 1),
                p(d.end_caps),
                p(d.start_caps),
                p(d.last_interval),
                p(d.dashed),
                p(d.join),
                p(d.phase),
                p(d.solid_start_cap),
                p(d.solid_end_cap),
            ]

        desc_arrays = [np.stack(a) for a in zip(*(pad_descriptors(s) for s in shapes))]

        op = np.array([int(c.operation) for c in commands], np.int32)
        cmd_shape = np.array(
            [shape_ids[id(c.shape)] for c in commands], np.int32
        )
        transform = np.stack(
            [np.asarray(c.transform, np.float32) for c in commands]
        )
        color = np.stack(
            [np.asarray(c.color, np.float32) for c in commands]
        )
        scalar = np.stack(
            [
                np.array(
                    [c.clip_depth, c.alpha_layer], np.int32
                )
                for c in commands
            ]
        )

        signature = (len(commands), len(shapes), t_max, h_max, g_max)
        return (
            xy, aux, kind, meta, hull, desc_arrays, op, cmd_shape,
            transform, color, scalar, signature,
        )

    # ------------------------------------------------------------------

    def _build_executor(self, signature):
        n_commands, n_shapes, t_max, h_max, g_max = signature
        width, height = self.width, self.height
        tile_size = self.tile_size
        capacity = min(self.tile_capacity, t_max)
        config = self.config
        num_tiles_x = -(-width // tile_size)
        num_tiles_y = -(-height // tile_size)
        n_tiles = num_tiles_x * num_tiles_y
        pad_w = num_tiles_x * tile_size
        pad_h = num_tiles_y * tile_size
        offsets = raster.MSAA4 if config.msaa_sample_count == 4 else raster.MSAA1
        offsets = jnp.asarray(offsets)
        n_samples = offsets.shape[0]
        winding_mask = (1 << config.winding_counter_bits) - 1
        n_layers = max(1, config.alpha_layer_count)

        yy, xx = jnp.meshgrid(
            jnp.arange(tile_size, dtype=jnp.float32),
            jnp.arange(tile_size, dtype=jnp.float32),
            indexing="ij",
        )
        base = jnp.stack([xx, yy], axis=-1)
        local = (base[:, :, None, :] + offsets[None, None, :, :]).reshape(-1, 2)

        def tiled(array):
            """(pad_h, pad_w, S, *extra) → (n_tiles, tile²·S, *extra);
            the flattened per-tile axis matches `local`'s (pixel, sample)
            ordering."""
            extra = array.shape[3:]
            a = array.reshape(
                num_tiles_y, tile_size, num_tiles_x, tile_size, n_samples, *extra
            )
            a = jnp.moveaxis(a, 2, 1)
            return a.reshape(n_tiles, tile_size * tile_size * n_samples, *extra)

        def untiled(a, extra=()):
            out = a.reshape(
                num_tiles_y, num_tiles_x, tile_size, tile_size, n_samples, *extra
            )
            out = jnp.moveaxis(out, 1, 2)
            return out.reshape(pad_h, pad_w, n_samples, *extra)

        def executor(
            xy, aux, kind, meta, hull, desc_arrays, op, cmd_shape,
            transform, color, scalar,
        ):
            descriptors = ds.StrokeDescriptorTable(*desc_arrays)

            def command_step(state, command):
                winding, clip, colorbuf, layers = state
                (c_op, c_shape, c_transform, c_color, c_scalar) = command
                setup = raster.setup_triangles(
                    xy[c_shape], aux[c_shape], kind[c_shape], meta[c_shape],
                    c_transform, width, height,
                )
                indices, valid, _ = raster.bin_triangles(
                    setup.aabb, setup.contribution,
                    num_tiles_x, num_tiles_y, tile_size, capacity,
                )
                # Transformed hull edges for cover coverage (convex
                # point-in-polygon; hull is CCW in model space).
                hp = hull[c_shape]  # (Hmax, 2)
                ones = jnp.ones((h_max, 1), jnp.float32)
                hclip = (
                    jnp.concatenate(
                        [hp, jnp.zeros((h_max, 1), jnp.float32), ones], axis=1
                    )
                    @ c_transform.T
                )
                hw = hclip[:, 3]
                hndc = hclip[:, :2] / hw[:, None]
                hpx = (hndc[:, 0] + 1.0) * (0.5 * width)
                hpy = (1.0 - hndc[:, 1]) * (0.5 * height)
                hv = jnp.stack([hpx, hpy], axis=-1)
                hv_next = jnp.roll(hv, -1, axis=0)
                hull_valid = jnp.all(hw > 0.0)
                # Hull orientation in pixel space (shoelace).
                hull_area = jnp.sum(
                    hv[:, 0] * hv_next[:, 1] - hv_next[:, 0] * hv[:, 1]
                )
                hull_sign = jnp.where(hull_area >= 0, 1.0, -1.0)

                current_depth = c_scalar[0]
                layer_index = c_scalar[1]
                group_flags = setup.meta[:, 0].astype(jnp.int32)
                tri_group = jnp.clip(group_flags & 0xFFFF, 0, g_max - 1)
                tri_end_flag = (group_flags & END_CAP_FLAG) != 0
                tri_tip_flag = (group_flags & JOINT_TIP_FLAG) != 0
                tri_is_stroke = (setup.kind == KIND_STROKE_LINE) | (
                    setup.kind == KIND_STROKE_JOINT
                )
                tri_is_joint = setup.kind == KIND_STROKE_JOINT
                shape_desc = ds.StrokeDescriptorTable(
                    *[a[c_shape] for a in desc_arrays]
                )

                def tile_body(tile_index, tw, tc, tcol, tlay):
                    tx = (tile_index % num_tiles_x).astype(jnp.float32) * tile_size
                    ty = (tile_index // num_tiles_x).astype(jnp.float32) * tile_size
                    pos = local + jnp.stack([tx, ty])  # (P, 2)
                    clip_ok = tc == current_depth

                    def stencil():
                        idx = indices[tile_index]
                        tvalid = valid[tile_index]
                        edge = setup.edge[idx]
                        top_left = setup.edge_top_left[idx]
                        bary = setup.bary[idx]
                        aux_w = setup.aux_w[idx]
                        inv_w = setup.inv_w[idx]
                        tkind = setup.kind[idx]
                        contrib = setup.contribution[idx]
                        e = (
                            (pos[:, None, None, 0] - edge[None, :, :, 2])
                            * edge[None, :, :, 0]
                            + (pos[:, None, None, 1] - edge[None, :, :, 3])
                            * edge[None, :, :, 1]
                        )
                        inside = jnp.all(
                            (e > 0.0) | ((e == 0.0) & top_left[None, :, :]),
                            axis=-1,
                        )
                        lam = (
                            (pos[:, None, None, 0] - bary[None, :, :, 2])
                            * bary[None, :, :, 0]
                            + (pos[:, None, None, 1] - bary[None, :, :, 3])
                            * bary[None, :, :, 1]
                        )
                        interp_aux = raster.interpolate_attributes(lam, aux_w)
                        fill_keep = raster._fill_predicates(tkind, interp_aux)
                        # Strokes need the true texcoords (persp division).
                        interp_inv_w = raster.interpolate_scalar(lam, inv_w)
                        tex = interp_aux / interp_inv_w[..., None]
                        k_group = tri_group[idx]
                        line_keep = ds.stroke_line_predicate(
                            jnp, shape_desc, k_group,
                            tex[..., 0], tex[..., 1],
                            tri_end_flag[idx][None, :],
                            setup.meta[idx, 1][None, :],
                        )
                        joint_keep = ds.stroke_joint_predicate(
                            jnp, shape_desc, k_group,
                            tex[..., 0], tex[..., 1], tex[..., 2],
                            tri_tip_flag[idx][None, :],
                        )
                        stroke_keep = jnp.where(
                            tri_is_joint[idx][None, :], joint_keep, line_keep
                        )
                        is_stroke = tri_is_stroke[idx]
                        active = inside & tvalid[None, :]
                        fill_active = active & ~is_stroke[None, :] & fill_keep
                        stroke_active = active & is_stroke[None, :] & stroke_keep
                        delta = jnp.sum(
                            jnp.where(fill_active, contrib[None, :], 0),
                            axis=1, dtype=jnp.int32,
                        )
                        stroke_cover = jnp.any(stroke_active, axis=1)
                        new_w = tw + jnp.where(
                            clip_ok,
                            delta + jnp.where(
                                stroke_cover & (tw == 0), 1, 0
                            ),
                            0,
                        )
                        return new_w, tc, tcol, tlay

                    def cover():
                        # Convex hull coverage for this tile's samples.
                        he = (
                            (hv_next[None, :, 0] - hv[None, :, 0])
                            * (pos[:, None, 1] - hv[None, :, 1])
                            - (hv_next[None, :, 1] - hv[None, :, 1])
                            * (pos[:, None, 0] - hv[None, :, 0])
                        ) * hull_sign
                        in_hull = jnp.all(he >= 0.0, axis=1) & hull_valid
                        nonzero = (tw & winding_mask) != 0
                        clip_ok_ = tc == current_depth

                        def color_cover():
                            # Stencil Less → Zero: paint where winding
                            # nonzero within clip, reset winding
                            # (renderer.rs:736-754, shaders.wgsl:304-309).
                            m = in_hull & clip_ok_ & nonzero
                            src = jnp.concatenate(
                                [c_color[:3] * c_color[3], c_color[3:4]]
                            )
                            if config.blending == "back_to_front":
                                blended = src[None, :] + tcol * (1.0 - c_color[3])
                            else:
                                # Front-to-back: weight by remaining
                                # transparency (1 - dst alpha).
                                remaining = 1.0 - tcol[:, 3:4]
                                blended = tcol + src[None, :] * remaining
                            new_col = jnp.where(m[:, None], blended, tcol)
                            new_w = jnp.where(m, 0, tw)
                            return new_w, tc, new_col, tlay

                        def clip_push():
                            # Replace on NotEqual(winding): promote
                            # winding≠0 samples into the clip counter
                            # (renderer.rs:692-710).
                            m = in_hull & nonzero
                            new_c = jnp.where(m, current_depth, tc)
                            new_w = jnp.where(m, 0, tw)
                            return new_w, new_c, tcol, tlay

                        def clip_pop():
                            # Replace on Less(clip): demote deeper samples
                            # (renderer.rs:711-729).
                            m = in_hull & (tc > current_depth)
                            new_c = jnp.where(m, current_depth, tc)
                            new_w = jnp.where(m, 0, tw)
                            return new_w, new_c, tcol, tlay

                        def save_alpha():
                            # Copy frame alpha into the layer texture
                            # (renderer.rs:767-799, shaders.wgsl:323-338).
                            m = in_hull & clip_ok_
                            new_layer = jnp.where(m, tcol[:, 3], tlay[layer_index])
                            new_lay = tlay.at[layer_index].set(new_layer)
                            return tw, tc, tcol, new_lay

                        def scale_alpha():
                            # frame.alpha ← (1-g) + g*frame.alpha
                            # (renderer.rs:800-828, shaders.wgsl:311-316).
                            m = in_hull & clip_ok_
                            g = c_color[3]
                            new_a = jnp.where(
                                m, (1.0 - g) + g * tcol[:, 3], tcol[:, 3]
                            )
                            new_col = tcol.at[:, 3].set(new_a)
                            return tw, tc, new_col, tlay

                        def restore_alpha():
                            # frame.alpha ← frame.alpha − (1−saved)(1−g)
                            # (reverse subtract, renderer.rs:829-861,
                            # shaders.wgsl:340-355).
                            m = in_hull & clip_ok_
                            saved = tlay[layer_index]
                            g = c_color[3]
                            new_a = jnp.where(
                                m,
                                tcol[:, 3] - (1.0 - saved) * (1.0 - g),
                                tcol[:, 3],
                            )
                            new_col = tcol.at[:, 3].set(new_a)
                            return tw, tc, new_col, tlay

                        return jax.lax.switch(
                            jnp.clip(c_op - 1, 0, 5),
                            [
                                clip_push,
                                clip_pop,
                                color_cover,
                                save_alpha,
                                scale_alpha,
                                restore_alpha,
                            ],
                        )

                    return jax.lax.cond(c_op == 0, stencil, cover)

                w_t = tiled(winding)
                c_t = tiled(clip)
                col_t = tiled(colorbuf)
                lay_t = jnp.moveaxis(
                    jnp.stack([tiled(layers[i]) for i in range(n_layers)]),
                    0, 1,
                )  # (n_tiles, L, P)

                def mapped(args):
                    tile_index, tw, tc, tcol, tlay = args
                    return tile_body(tile_index, tw, tc, tcol, tlay)

                new_w, new_c, new_col, new_lay = jax.lax.map(
                    mapped,
                    (
                        jnp.arange(n_tiles, dtype=jnp.int32),
                        w_t,
                        c_t,
                        col_t,
                        lay_t,
                    ),
                )
                winding = untiled(new_w)
                clip = untiled(new_c)
                colorbuf = untiled(new_col, (4,))
                layers = jnp.stack(
                    [untiled(new_lay[:, i]) for i in range(n_layers)]
                )
                return (winding, clip, colorbuf, layers), None

            winding0 = jnp.zeros((pad_h, pad_w, n_samples), jnp.int32)
            clip0 = jnp.zeros((pad_h, pad_w, n_samples), jnp.int32)
            color0 = jnp.zeros((pad_h, pad_w, n_samples, 4), jnp.float32)
            layers0 = jnp.zeros((n_layers, pad_h, pad_w, n_samples), jnp.float32)

            (winding, clip, colorbuf, layers), _ = jax.lax.scan(
                command_step,
                (winding0, clip0, color0, layers0),
                (op, cmd_shape, transform, color, scalar),
            )
            resolved = jnp.mean(colorbuf, axis=2)  # MSAA resolve
            import os as _os
            if _os.environ.get("CONTRAST_DEBUG_STATE"):
                return resolved[:height, :width], winding, clip
            return resolved[:height, :width]

        return jax.jit(executor)
