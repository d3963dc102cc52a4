"""The Pallas frame executor: tile-resident stencil-and-cover.

This is the TPU-native replacement for the reference's whole GPU
runtime — the 14 wgpu render pipelines (renderer.rs:593-861), the
stencil winding/clip algebra (renderer.rs:565-582, 692-729), the cover
blend states (renderer.rs:736-861) and the per-sample fragment
predicates (shaders.wgsl:155-300).

Architecture (two stages, both jitted):

1. ``prepare`` (plain XLA): transforms every stencil command's triangle
   table by its instance matrix (batched, full f32), computes
   screen-space edge/interpolation coefficients, and **bins** triangles
   to pixel tiles.  Binning classifies every (triangle, tile) pair by
   evaluating the three edge functions at the tile corners:

   - *reject* (tile fully outside an edge) — dropped,
   - *trivial accept* of a SOLID triangle (tile fully inside all
     edges) — folded into a per-(tile, command) scalar ``bulk``
     winding delta, so the interiors of large cover fans cost one
     vector add instead of per-sample edge tests,
   - otherwise — an *entry* in the tile's triangle list.

   Small triangles are enumerated directly over their (few) covered
   tiles and compacted by a stable sort; triangles spanning more tiles
   than the slot budget go through a dense (tiles × globals) matrix
   (their count is small — they are the big fans).  Convex-hull cover
   commands get the same corner classification per tile
   (skip / boundary / fully-inside).

2. ``rasterize`` (Pallas): one grid step per tile.  The per-sample
   frame state — winding counter, clip depth, premultiplied RGBA, alpha
   layers — lives in VMEM scratch for the *whole command sequence*;
   only the resolved tile color is written to HBM.  Per tile the kernel
   walks the active-command list; stencil commands loop over the tile's
   binned triangle entries (stroke entries before fill entries,
   preserving the reference's draw order, renderer.rs:275-336) and
   evaluate the implicit-curve / dash / cap / joint predicates exactly
   as shaders.wgsl does; cover commands apply the winding rule inside
   the hull and composite/clip/save alpha per the reference's stencil
   and blend states.

All arithmetic on the coverage path is explicit f32 multiply-add on
the VPU (never the MXU) — the Loop-Blinn predicates are cancellation
sensitive and bf16-grade matmul precision visibly corrupts them.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..path import MAX_DASH_INTERVALS, Cap, Join
from ..vertex import (
    KIND_INTEGRAL_CUBIC,
    KIND_INTEGRAL_QUADRATIC,
    KIND_RATIONAL_CUBIC,
    KIND_RATIONAL_QUADRATIC,
    KIND_SOLID,
    KIND_STROKE_JOINT,
    KIND_STROKE_LINE,
)

TAU = 2.0 * math.pi

OP_STENCIL = 0
OP_CLIP = 1
OP_UNCLIP = 2
OP_COLOR = 3
OP_SAVE_ALPHA = 4
OP_SCALE_ALPHA = 5
OP_RESTORE_ALPHA = 6
#: Fused SAVE then SCALE over the same hull (renderer._optimize_commands):
#: the alpha-group prologue is always this adjacent pair on one cover, and
#: one fused full-screen pass costs half the per-sample traffic of two.
OP_SAVE_SCALE = 7

#: Gradient stop budget (cmd_f row: MAX_STOPS RGBA colors + MAX_STOPS
#: offsets; see renderer.MAX_GRADIENT_STOPS).
MAX_STOPS = 4

#: Standard MSAA sample positions (x, y) within a pixel, y-down.
SAMPLE_PATTERNS = {
    1: np.array([[0.5, 0.5]], np.float32),
    2: np.array([[0.75, 0.75], [0.25, 0.25]], np.float32),
    4: np.array(
        [[0.375, 0.125], [0.875, 0.375], [0.125, 0.625], [0.625, 0.875]],
        np.float32,
    ),
    8: np.array(
        [
            [0.5625, 0.3125], [0.4375, 0.6875], [0.8125, 0.5625],
            [0.3125, 0.1875], [0.1875, 0.8125], [0.0625, 0.4375],
            [0.6875, 0.9375], [0.9375, 0.0625],
        ],
        np.float32,
    ),
    16: np.array(
        [
            [0.5625, 0.5625], [0.4375, 0.3125], [0.3125, 0.625],
            [0.75, 0.4375], [0.1875, 0.375], [0.625, 0.8125],
            [0.8125, 0.6875], [0.6875, 0.1875], [0.375, 0.875],
            [0.5, 0.0625], [0.25, 0.125], [0.125, 0.75],
            [0.03125, 0.5], [0.9375, 0.25], [0.875, 0.9375],
            [0.0625, 0.03125],
        ],
        np.float32,
    ),
}

# Float row layout (one packed row per screen-space triangle).
RF_EDGE = 0        # 0..8: (a, b, c) × 3 oriented edges (inside ⇒ e ≥ 0)
RF_INV_AREA = 9    # 1/|pixel area| (λ_k = ẽ_k · invA)
RF_AW = 10         # 10..21: aux·(1/w), vertex paired with edge k
RF_IW = 22         # 22..24: 1/w, vertex paired with edge k
RF_END_Y = 25      # end-cap provoking texcoord.y
RF_AABB = 26       # 26..29: pixel-space min_x, min_y, max_x, max_y
D_F = 32

# Int row layout.
RI_KIND = 0
RI_CONTRIB = 1
RI_GROUP = 2
RI_FLAGS = 3       # bits 0..2 top-left edge rule, 3 end-cap, 4 joint tip
RI_FILL = 4        # 1 for fill kinds, 0 for strokes
RI_CMD = 5         # originating command index
RI_CLASS = 6       # processing class (CLS_*)
D_I = 8

#: Entries are range-sorted per (tile, command, class) so the kernel
#: runs a specialized, branch-free body per class.  Stroke entries are
#: additionally split by their group's dash mode (solid /
#: single-interval / multi-interval) so no per-entry runtime branch is
#: needed to pick the dash predicate; stroke classes sort before fill
#: classes, preserving the reference's draw order (renderer.rs:275-336).
CLS_LINE_SOLID = 0
CLS_LINE_DASH1 = 1
CLS_LINE_DASHN = 2
CLS_JOINT_SOLID = 3
CLS_JOINT_DASH1 = 4
CLS_JOINT_DASHN = 5
CLS_FILL_SOLID = 6
CLS_FILL_QUAD = 7
CLS_FILL_CUBIC = 8
N_CLASSES = 9
#: Default fill batch width: fill entries are processed NB at a time
#: with the per-triangle coefficients broadcast as (NB, 1, 1) vectors.
#: NB=2 measured best on v5e for the showcase; FrameSpec.fill_batch
#: overrides per frame program.
NB = 2

FLAG_END_CAP = 8
FLAG_JOINT_TIP = 16

# Descriptor row layout (global dynamic-stroke table).
# floats: 0..3 gap_start, 4..7 gap_end, 8 phase
# ints:   0..3 end_caps, 4..7 start_caps, 8 last_interval, 9 dashed,
#         10 join, 11 solid_start_cap, 12 solid_end_cap
DESC_F = 12
DESC_I = 16


@dataclass(frozen=True)
class FrameSpec:
    """Static signature of a frame program.

    ``ops`` / ``cmd_shape`` / ``cmd_inst`` fix the command structure;
    everything that animates per frame (transforms, colors, clip
    depths, dash descriptors) stays a runtime input, so re-rendering
    with new values reuses the compiled program.
    """

    width: int
    height: int
    ops: tuple            # per-command RenderOperation ints
    #: Per-command shape index — an int shared by the command's
    #: instances, or a per-INSTANCE tuple of shape indices (one draw
    #: stream over many vertex buffers: the reference's per-glyph
    #: buffers under one instanced pipeline, renderer.rs:462-466 +
    #: text.rs:97-104).  A multi-shape stencil command walks as ONE
    #: unit with contiguous per-tile entry ranges — monolith-speed
    #: batching with per-shape geometry reuse.
    cmd_shape: tuple
    n_shapes: int
    t_max: int            # padded triangle count per shape
    h_max: int            # padded hull vertex count per shape
    samples: int
    winding_bits: int
    n_layers: int
    #: Named mode ("back_to_front" / "front_to_back" / "additive") or a
    #: canonical BlendState tuple ((src, op, dst), (src, op, dst)) for
    #: color/alpha — see renderer.BlendState (reference renderer.rs:381).
    blending: object
    #: Per-command instance counts (the reference's instance_range,
    #: renderer.rs:267, 462-466): a stencil command accumulates winding
    #: from all its instances' triangles; a cover command replays its
    #: per-instance hull covers in instance order.  () = all 1.
    cmd_inst: tuple = ()
    #: Per-command paint kinds (0 solid, 1 linear gradient, 2 radial
    #: gradient).  () = all solid; any nonzero compiles the gradient
    #: interpolation into the color cover (a TPU-native extension — the
    #: reference's color cover is always solid, shaders.wgsl:304-309,
    #: and custom paints require user shaders).
    paints: tuple = ()
    #: Depth compare function of the color cover (wgpu CompareFunction;
    #: reference Configuration.depth_compare, renderer.rs:387-390).  In
    #: the reference ONLY the color cover pipeline carries the
    #: configured depth state — every other pipeline is Always/no-write
    #: (renderer.rs:601-841) — so stencil/clip/alpha ops here never
    #: touch the depth buffer either.  "always" + no write (the
    #: default) compiles the depth machinery out entirely.
    depth_compare: str = "always"
    #: Whether the color cover writes back fragment depth (wgpu
    #: depth_write_enabled, renderer.rs:389-390).
    depth_write: bool = False
    #: Resolve straight to packed RGBA8 in the kernel: each tile writes
    #: one int32 lane per pixel (R | G<<8 | B<<16 | A<<24, i.e. RGBA8
    #: little-endian — the reference presents to an 8-bit swapchain
    #: surface the same way) at its final mosaic position, so the
    #: float de-tiling transpose, the separate quantize pass, and 3/4
    #: of the output HBM traffic disappear.  Bit-identical to
    #: Renderer._quantize of the float output.
    out_uint8: bool = False
    tile_h: int = 32
    tile_w: int = 128
    #: Vertical strips per tile: the physical (tile_h, tile_w) VMEM
    #: block covers a (tile_h·strips, tile_w/strips) SCREEN rectangle,
    #: laid out as `strips` vertical slabs side by side along the lane
    #: dimension.  The VPU always computes all tile_w lanes, so a
    #: narrower, taller footprint costs nothing per step — but compact
    #: geometry (glyphs, stroke segments) lands in fewer tiles when the
    #: footprint is square-ish (strips=4 → 32×32 at tile_h=8), cutting
    #: the per-tile entry walks that dominate dense scenes.  1 = the
    #: classic row tile (footprint == block).
    tile_strips: int = 1
    capacity: int = 256             # per-tile local entry rows
    global_capacity: int = 2048     # big-triangle rows
    tile_global_capacity: int = 128  # per-tile big-triangle entries
    clip_pool: int = 64             # near-plane-crossing triangle slots
    slots_x: int = 2
    slots_y: int = 2
    fill_batch: int = NB            # fill entries evaluated per step
    stroke_batch: int = 1           # stroke entries evaluated per step
    #: Per-draw command tables (cmd_f colors/gradients, paint
    #: endpoints, depth planes, hull lines) live in SMEM for small
    #: frames — cheapest for the kernel's scalar control reads — but
    #: SMEM is ~1 MiB and each table row pads to a 512-byte window, so
    #: a few hundred cover draws overflow it (the 10k-instanced-glyph
    #: frame needs ~15 MB).  Above the threshold the tables concatenate
    #: into ONE VMEM array with a 512-byte row per draw (the reference
    #: streams instance attributes from storage buffers for the same
    #: reason, renderer.rs:462-466).  None = decide from the draw
    #: count; True/False forces (tests exercise both layouts).
    stream_draws: "bool | None" = None
    #: Clip/alpha bracket gating (renderer._gate_spans): tuples of
    #: ``(content_units, machinery_units, row_pairs)`` — per outermost
    #: balanced clip/alpha bracket, the FRAME-wide non-machinery unit
    #: indices whose per-tile activity marks the tile as touched, the
    #: machinery unit indices (clip stencils, CLIP/UNCLIP covers,
    #: SAVE/SCALE/RESTORE covers) to drop from untouched tiles, and
    #: the transform-row index pairs that must compare equal at
    #: runtime for the bracket's opener/closer hulls to coincide
    #: (checked traced in `prepare`; unequal rows disable the span's
    #: gating that frame).  On an untouched tile frame alpha is
    #: exactly 0 and the complete bracket is BIT-exact identity on the
    #: color buffer — see renderer._gate_spans for the proof
    #: obligations — so dropping it usually leaves the tile on the
    #: acount == 0 empty fast path.  The reference gets the analogous
    #: saving from hardware early-stencil rejection
    #: (renderer.rs:692-729); a software per-tile walk bins it away.
    gate_spans: tuple = ()
    #: Whether any shape in the scene carries stroke descriptor groups.
    #: False compiles the six stroke classes out of the per-(tile,
    #: command) walk — a scene without stroke groups cannot produce
    #: stroke entries, and the empty-range prologue (two scalar range
    #: reads + a branch, × 6 classes × 2 walks, per active command per
    #: tile) is a real cost for many-command fill scenes (instanced
    #: text).
    has_strokes: bool = True
    interpret: bool = False

    def __post_init__(self):
        if self.tile_w % self.tile_strips:
            raise ValueError(
                f"tile_strips={self.tile_strips} must divide "
                f"tile_w={self.tile_w}"
            )
        # Cache the hash: specs key executor caches and are hashed
        # several times per frame; cmd_shape alone can be a
        # 10k-instance tuple (multi-shape commands), making the
        # default dataclass hash a real per-frame cost.
        object.__setattr__(self, "_hash", None)

    def __hash__(self):
        h = self._hash
        if h is None:
            h = hash(tuple(
                getattr(self, f.name)
                for f in dataclasses.fields(self)
            ))
            object.__setattr__(self, "_hash", h)
        return h
    @property
    def entry_pad(self):
        """Row padding past the capacity so batched `pl.ds` slices of
        width fill_batch / stroke_batch stay in bounds."""
        return max(self.fill_batch, self.stroke_batch)

    @property
    def n_commands(self):
        return len(self.ops)

    @property
    def screen_tile_w(self):
        """Screen-footprint width of one tile (= tile_w when strips=1)."""
        return self.tile_w // self.tile_strips

    @property
    def screen_tile_h(self):
        """Screen-footprint height of one tile (= tile_h when strips=1)."""
        return self.tile_h * self.tile_strips

    @property
    def ntx(self):
        return -(-self.width // self.screen_tile_w)

    @property
    def nty(self):
        return -(-self.height // self.screen_tile_h)

    @property
    def n_tiles(self):
        return self.ntx * self.nty


#: Named blend modes as canonical (src_factor, operation, dst_factor)
#: components, matching renderer.NAMED_BLEND_STATES.
_NAMED_BLEND = {
    "back_to_front": ("one", "add", "one_minus_src_alpha"),
    "front_to_back": ("one_minus_dst_alpha", "add", "one"),
    "additive": ("one", "add", "one"),
}


def _canonical_blend(blending):
    """spec.blending → (color_component, alpha_component) tuples."""
    if isinstance(blending, str):
        comp = _NAMED_BLEND[blending]
        return comp, comp
    color, alpha = blending
    return tuple(color), tuple(alpha)


def blend_uses_constant(blending) -> bool:
    """True when the blend state references the runtime blend-constant
    color (wgpu's set_blend_constant); the packer then appends the
    constant to cmd_f and the kernel reads it back."""
    color, alpha = _canonical_blend(blending)
    return any(
        f in ("constant", "one_minus_constant")
        for comp in (color, alpha)
        for f in (comp[0], comp[2])
    )


def _blend_channel(comp, s, d, ca, da, chan=0, const=None):
    """out = op(s·src_factor, d·dst_factor) for one channel, wgpu
    semantics (shaders are premultiplied; `min`/`max` ignore factors).

    `ca`: the draw's scalar source alpha; `da`: the destination alpha
    sampled before this draw touched any channel; `chan`: which channel
    (0-3 — src_alpha_saturated and the constant factors are
    channel-dependent); `const`: the 4 runtime blend-constant scalars
    (present iff the state uses constant factors)."""
    src_f, op, dst_f = comp
    if op == "min":
        return jnp.minimum(s, d)
    if op == "max":
        return jnp.maximum(s, d)

    def factor(name):
        if name == "zero":
            return 0.0
        if name == "one":
            return 1.0
        if name == "src_alpha":
            return ca
        if name == "one_minus_src_alpha":
            return 1.0 - ca
        if name == "dst_alpha":
            return da
        if name == "one_minus_dst_alpha":
            return 1.0 - da
        if name == "src_alpha_saturated":
            # wgpu SrcAlphaSaturated: min(αs, 1−αd) on RGB, 1 on alpha.
            return jnp.minimum(ca, 1.0 - da) if chan < 3 else 1.0
        if name == "constant":
            return const[chan]
        if name == "one_minus_constant":
            return 1.0 - const[chan]
        raise ValueError(f"unknown blend factor {name!r}")

    st = s * factor(src_f) if src_f != "zero" else 0.0
    dt = d * factor(dst_f) if dst_f != "zero" else 0.0
    if op == "add":
        return st + dt
    if op == "subtract":
        return st - dt
    return dt - st  # reverse_subtract


class PreparedFrame(NamedTuple):
    """Device arrays produced by `prepare`, consumed by `rasterize`."""

    tri_f: jnp.ndarray    # (n_tiles, K, D_F)
    tri_i: jnp.ndarray    # (n_tiles, K, D_I)
    off: jnp.ndarray      # (n_tiles, 1, 5C+1) per-(cmd, class) entry ranges
    g_tri_f: jnp.ndarray  # (n_tiles, Kg, D_F) per-tile big-triangle rows
    g_tri_i: jnp.ndarray  # (n_tiles, Kg, D_I)
    g_off: jnp.ndarray    # (n_tiles, 1, 5C+1)
    bulk: jnp.ndarray     # (n_tiles, 1, C) trivially-accepted solid winding
    cls: jnp.ndarray      # (n_tiles, 1, Rc) cover-draw class 0/1/2
    hbits: jnp.ndarray    # (n_tiles, 1, Rc) crossing hull-line bitmask
    aclist: jnp.ndarray   # (n_tiles, 1, U) active unit indices
    acount: jnp.ndarray   # (n_tiles, 1, 1)
    hull_lines: jnp.ndarray  # (Rc, Hm, 4) inward-oriented pixel lines
    paint_xy: jnp.ndarray    # (Rc, 4) gradient endpoints in pixels
    zplane: jnp.ndarray      # (Rc, 3) NDC-z = a·px + b·py + c per draw
    overflow: jnp.ndarray    # (4,) max local count, global count,
    #                          max tile globals, near-plane crossings


# ---------------------------------------------------------------------------
# prepare: setup + binning (plain XLA)
# ---------------------------------------------------------------------------


class DrawTables(NamedTuple):
    """Static (compile-time) expansion of the command list into draws.

    A *draw* is one (command, instance) pair.  Stencil draws contribute
    triangle rows; cover draws contribute one hull cover each.  A *unit*
    is one kernel walk step in global draw order: a whole stencil
    command (all its instances' triangles share its entry ranges) or a
    single cover draw.
    """

    inst: np.ndarray        # (C,) per-command instance count
    row_base: np.ndarray    # (C+1,) transform-row offset per command
    s_cmd: np.ndarray       # (Rs,) stencil draw → command
    s_row: np.ndarray       # (Rs,) stencil draw → transform row
    c_cmd: np.ndarray       # (Rc,) cover draw → command
    c_row: np.ndarray       # (Rc,) cover draw → transform row
    unit_cmd: np.ndarray    # (U,) unit → command
    unit_draw: np.ndarray   # (U,) unit → cover draw (-1 for stencil)


def draw_tables(spec: FrameSpec) -> DrawTables:
    C = spec.n_commands
    ops = np.asarray(spec.ops, np.int32)
    inst = np.asarray(
        spec.cmd_inst if spec.cmd_inst else (1,) * C, np.int32
    )
    assert len(inst) == C and (inst >= 1).all()
    row_base = np.concatenate([[0], np.cumsum(inst)]).astype(np.int32)
    s_cmd, s_row, c_cmd, c_row = [], [], [], []
    unit_cmd, unit_draw = [], []
    for c in range(C):
        rows = range(int(row_base[c]), int(row_base[c + 1]))
        if ops[c] == OP_STENCIL:
            s_cmd += [c] * int(inst[c])
            s_row += list(rows)
            unit_cmd.append(c)
            unit_draw.append(-1)
        else:
            for r in rows:
                unit_cmd.append(c)
                unit_draw.append(len(c_cmd))
                c_cmd.append(c)
                c_row.append(r)
    # Zero-size operands crash the TPU compiler; bind dummy draws that
    # no unit references (the kernel reads stencil ranges only under
    # op == STENCIL and cover state only through unit_draw >= 0).
    if not s_cmd:
        s_cmd, s_row = [0], [0]
    if not c_cmd:
        c_cmd, c_row = [0], [0]
    i32 = np.int32
    return DrawTables(
        inst=inst,
        row_base=row_base,
        s_cmd=np.asarray(s_cmd, i32),
        s_row=np.asarray(s_row, i32),
        c_cmd=np.asarray(c_cmd, i32),
        c_row=np.asarray(c_row, i32),
        unit_cmd=np.asarray(unit_cmd, i32),
        unit_draw=np.asarray(unit_draw, i32),
    )


def _corner_min_max(a, b, c, x0, y0, tw, th):
    """Min/max of the linear function a·x+b·y+c over the tile rectangle
    [x0, x0+tw] × [y0, y0+th] (all broadcastable)."""
    base = a * x0 + b * y0 + c
    lo = base + jnp.minimum(a * tw, 0.0) + jnp.minimum(b * th, 0.0)
    hi = base + jnp.maximum(a * tw, 0.0) + jnp.maximum(b * th, 0.0)
    return lo, hi


def make_prepare(spec: FrameSpec):
    C = spec.n_commands
    draws = draw_tables(spec)
    # Per-draw shape indices (cmd_shape entries are per-command ints or
    # per-instance tuples).
    _row_base = draws.row_base

    def _shape_at(c, r):
        e = spec.cmd_shape[c]
        return e[r - _row_base[c]] if isinstance(e, (tuple, list)) else e

    s_shape_np = np.asarray(
        [_shape_at(c, r) for c, r in zip(draws.s_cmd, draws.s_row)],
        np.int32,
    )
    c_shape_np = np.asarray(
        [_shape_at(c, r) for c, r in zip(draws.c_cmd, draws.c_row)],
        np.int32,
    )
    Rs = len(draws.s_cmd)
    Rc = len(draws.c_cmd)
    U = len(draws.unit_cmd)
    T = spec.t_max
    Hm = spec.h_max
    W, H = spec.width, spec.height
    # Screen footprint of one tile (may differ from the kernel's
    # physical (tile_h, tile_w) block shape — see FrameSpec.tile_strips);
    # ALL binning geometry here is in screen space, so it uses the
    # footprint exclusively.
    tw, th = spec.screen_tile_w, spec.screen_tile_h
    ntx, nty, n_tiles = spec.ntx, spec.nty, spec.n_tiles
    K = spec.capacity
    G = spec.global_capacity
    Kg = spec.tile_global_capacity
    NB = spec.fill_batch
    PAD = spec.entry_pad
    mx, my = spec.slots_x, spec.slots_y
    M = mx * my
    def prepare(xy, aux, kind, meta, gbase, hull, transforms, desc_static,
                paint_model=None):
        """xy (Ns,T,3,2) aux (Ns,T,3,4) kind (Ns,T) meta (Ns,T,2)
        gbase (Ns,) hull (Ns,Hm,2) transforms (R,4,4) — one row per
        (command, instance) draw, commands in order
        (see DrawTables / FrameSpec.cmd_inst);
        desc_static (n_groups, 2) = [dashed, last_interval] per stroke
        group — determines each stroke entry's dash class so the kernel
        dispatches statically (re-binning when a pattern's interval
        count changes; phase/gap animation stays runtime);
        paint_model (Rc, 2, 2) optional model-space gradient endpoints
        per cover draw — transformed alongside the hulls so gradients
        track camera motion."""
        f32 = jnp.float32
        i32 = jnp.int32

        # ---- per-stencil-draw triangle setup --------------------------
        s_cmd = jnp.asarray(draws.s_cmd)
        sshape = jnp.asarray(s_shape_np)
        sxy = xy[sshape]                     # (Rs, T, 3, 2)
        saux = aux[sshape]
        stf = transforms[jnp.asarray(draws.s_row)]   # (Rs, 4, 4)

        v = jnp.concatenate(
            [sxy, jnp.zeros(sxy.shape[:-1] + (1,), f32),
             jnp.ones(sxy.shape[:-1] + (1,), f32)], axis=-1,
        )
        clip = jnp.einsum(
            "ctvk,crk->ctvr", v, stf, precision=jax.lax.Precision.HIGHEST
        )

        # ---- flatten to rows (one row per screen triangle) ------------
        N0 = Rs * T
        clip_flat = clip.reshape(N0, 3, 4)
        aux_flat = saux.reshape(N0, 3, 4)
        kind_flat = kind[sshape].reshape(N0)
        meta_flat = meta[sshape].reshape(N0, 2)
        gbase_flat = jnp.repeat(gbase[sshape], T)
        cmd_flat = jnp.repeat(s_cmd, T)

        # ---- near-plane clipping of crossing triangles -----------------
        # The GPU hardware clips primitives against w > 0 before
        # rasterization; triangles crossing the near plane are
        # Sutherland-Hodgman clipped here into up to two sub-triangles
        # (a fixed pool of E slots; overflow is reported so the host can
        # regrow).  Clip-space coordinates and the per-vertex implicit
        # weights both interpolate linearly along a clip-space edge.
        E = spec.clip_pool
        w_eps = jnp.float32(1e-6)
        w_all = clip_flat[..., 3]
        win = w_all > w_eps
        n_in = jnp.sum(win.astype(i32), axis=-1)
        crossing = (n_in >= 1) & (n_in <= 2)
        cross_total = jnp.sum(crossing.astype(i32))
        ckey = jnp.where(crossing, N0 - jnp.arange(N0, dtype=i32), -1)
        _cvals, cidx = jax.lax.top_k(ckey, min(E, N0))
        if E > N0:
            cidx = jnp.pad(cidx, (0, E - N0))
        slot_ok = jnp.arange(E, dtype=i32) < jnp.minimum(cross_total, E)

        attr = jnp.concatenate(
            [clip_flat[cidx], aux_flat[cidx]], axis=-1
        )  # (E, 3, 8)
        wa = attr[..., 3]
        a_in = wa > w_eps
        nxt = attr[:, jnp.asarray([1, 2, 0]), :]
        wb = wa[:, jnp.asarray([1, 2, 0])]
        b_in = wb > w_eps
        denom = jnp.where(wb - wa != 0.0, wb - wa, 1.0)
        t_cross = (w_eps - wa) / denom
        inter = attr + t_cross[..., None] * (nxt - attr)
        # Pin the intersection w to exactly eps: the lerp's rounding can
        # land slightly negative for large |w| endpoints, which would
        # cull the whole sub-triangle downstream.
        inter = inter.at[..., 3].set(w_eps)
        out_v = jnp.stack([attr, inter], axis=2).reshape(E, 6, 8)
        out_ok = jnp.stack([a_in, a_in != b_in], axis=2).reshape(E, 6)
        rank = jnp.cumsum(out_ok.astype(i32), axis=1) - 1
        cnt = jnp.sum(out_ok.astype(i32), axis=1)
        rows_e = jnp.broadcast_to(jnp.arange(E, dtype=i32)[:, None], (E, 6))
        slot = jnp.where(out_ok, jnp.minimum(rank, 4), 4)
        poly = jnp.zeros((E * 5, 8), f32).at[
            (rows_e * 5 + slot).reshape(-1)
        ].set(out_v.reshape(-1, 8), mode="drop").reshape(E, 5, 8)[:, :4]
        in_use = (
            jnp.arange(4, dtype=i32)[None, :] < jnp.minimum(cnt, 4)[:, None]
        )
        poly = jnp.where(in_use[..., None], poly, poly[:, 0:1])
        # Fan: (p0, p1, p2) and (p0, p2, p3); with a 3-vertex polygon the
        # second is degenerate (zero area) and culled downstream.
        tri0 = poly[:, jnp.asarray([0, 1, 2])]
        tri1 = poly[:, jnp.asarray([0, 2, 3])]
        pool_attr = jnp.concatenate([tri0, tri1], axis=0)   # (2E, 3, 8)
        pool_valid = jnp.tile(slot_ok, 2)
        pool_clip = jnp.where(
            pool_valid[:, None, None], pool_attr[..., :4], 0.0
        )
        pool_aux = pool_attr[..., 4:]
        pool_src = jnp.tile(jnp.where(slot_ok, cidx, 0), 2)

        clip_all = jnp.concatenate([clip_flat, pool_clip])   # (N, 3, 4)
        aux_all = jnp.concatenate([aux_flat, pool_aux])
        kind_all = jnp.concatenate([kind_flat, kind_flat[pool_src]])
        meta_all = jnp.concatenate([meta_flat, meta_flat[pool_src]])
        gbase_all = jnp.concatenate([gbase_flat, gbase_flat[pool_src]])
        cmd_of = jnp.concatenate([cmd_flat, cmd_flat[pool_src]])
        # Original crossing rows are superseded by their pool
        # sub-triangles; fully-behind rows fail the w test either way.
        near_ok = jnp.concatenate(
            [jnp.all(win, axis=-1),
             jnp.all(pool_clip[..., 3] > 0.0, axis=-1) & pool_valid]
        )
        n_rows = N0 + 2 * E

        # ---- screen-space projection + edge setup ----------------------
        w = clip_all[..., 3]
        inv_w = jnp.where(w != 0.0, 1.0 / w, 0.0)
        ndc = clip_all[..., :2] * inv_w[..., None]
        px = (ndc[..., 0] + 1.0) * (0.5 * W)
        py = (1.0 - ndc[..., 1]) * (0.5 * H)
        pix = jnp.stack([px, py], axis=-1)   # (N, 3, 2)

        v0, v1, v2 = pix[..., 0, :], pix[..., 1, :], pix[..., 2, :]
        area = (v1[..., 0] - v0[..., 0]) * (v2[..., 1] - v0[..., 1]) - (
            v1[..., 1] - v0[..., 1]
        ) * (v2[..., 0] - v0[..., 0])
        orient = jnp.sign(area)
        finite = jnp.all(jnp.isfinite(pix), axis=(-1, -2)) & jnp.isfinite(area)
        visible = finite & (area != 0.0) & near_ok

        edges = []
        tl_bits = jnp.zeros(area.shape, i32)
        for e_index, (ai, bi) in enumerate(((0, 1), (1, 2), (2, 0))):
            a_v = pix[..., ai, :]
            b_v = pix[..., bi, :]
            ea = -(b_v[..., 1] - a_v[..., 1]) * orient
            eb = (b_v[..., 0] - a_v[..., 0]) * orient
            ec = -(ea * a_v[..., 0] + eb * a_v[..., 1])
            aa = jnp.where(orient[..., None] > 0, a_v, b_v)
            bb = jnp.where(orient[..., None] > 0, b_v, a_v)
            top_left = ((aa[..., 1] == bb[..., 1]) & (bb[..., 0] > aa[..., 0])) | (
                bb[..., 1] > aa[..., 1]
            )
            tl_bits = tl_bits | (top_left.astype(i32) << e_index)
            edges.append(jnp.stack([ea, eb, ec], axis=-1))
        edge = jnp.stack(edges, axis=-2)     # (N, 3, 3)
        inv_area = jnp.where(area != 0.0, 1.0 / jnp.abs(area), 0.0)

        aux_w = aux_all * inv_w[..., None]
        perm = jnp.asarray([2, 0, 1])
        aw = aux_w[..., perm, :]             # aw[k] pairs edge k
        iw = inv_w[..., perm]

        is_fill = kind_all <= KIND_RATIONAL_CUBIC
        contribution = jnp.where(
            visible & is_fill, -orient.astype(i32), 0
        )
        contribution = jnp.where(visible & ~is_fill, 1, contribution)

        group_flags = meta_all[..., 0].astype(i32)
        group = gbase_all + (group_flags & 0xFFFF)
        flags = (
            tl_bits
            | jnp.where((group_flags & 0x10000) != 0, FLAG_END_CAP, 0)
            | jnp.where((group_flags & 0x20000) != 0, FLAG_JOINT_TIP, 0)
        )

        aabb = jnp.concatenate(
            [jnp.min(pix, axis=-2), jnp.max(pix, axis=-2)], axis=-1
        )
        live = (
            (contribution != 0)
            & (aabb[..., 0] <= W) & (aabb[..., 2] >= 0.0)
            & (aabb[..., 1] <= H) & (aabb[..., 3] >= 0.0)
        )
        contribution = jnp.where(live, contribution, 0)

        rows_f = jnp.concatenate(
            [
                edge.reshape(n_rows, 9),
                inv_area[..., None],
                aw.reshape(n_rows, 12),
                iw,
                meta_all[..., 1:2],
                aabb,
                jnp.zeros((n_rows, D_F - 30), f32),
            ],
            axis=-1,
        )
        # Per-group dash mode looked up via a one-hot reduction: 1D
        # element gathers are serial on TPU, and the group table is
        # tiny (a handful of rows).
        n_groups = desc_static.shape[0]
        mode_tbl = jnp.where(
            desc_static[:, 0] == 0,
            0,
            jnp.where(desc_static[:, 1] == 0, 1, 2),
        )  # (n_groups,)
        one_hot_grp = (
            group[:, None] == jnp.arange(n_groups, dtype=i32)[None, :]
        )
        dash_mode = jnp.sum(
            jnp.where(one_hot_grp, mode_tbl[None, :], 0), axis=1
        )
        clsk = jnp.where(
            kind_all == KIND_STROKE_LINE, CLS_LINE_SOLID + dash_mode,
            jnp.where(
                kind_all == KIND_STROKE_JOINT, CLS_JOINT_SOLID + dash_mode,
                jnp.where(
                    kind_all == KIND_SOLID, CLS_FILL_SOLID,
                    jnp.where(
                        (kind_all == KIND_INTEGRAL_QUADRATIC)
                        | (kind_all == KIND_RATIONAL_QUADRATIC),
                        CLS_FILL_QUAD, CLS_FILL_CUBIC,
                    ),
                ),
            ),
        )
        rows_i = jnp.stack(
            [
                kind_all,
                contribution,
                group,
                flags,
                is_fill.astype(i32),
                cmd_of,
                clsk,
                jnp.zeros(n_rows, i32),
            ],
            axis=-1,
        )

        live = live.reshape(-1)
        aabb_flat = aabb
        solid_flat = kind_all == KIND_SOLID
        contrib_flat = rows_i[:, RI_CONTRIB]
        class_flat = rows_i[:, RI_CLASS]
        key2_flat = cmd_of * N_CLASSES + class_flat

        tx0 = jnp.clip(jnp.floor(aabb_flat[:, 0] / tw), 0, ntx - 1).astype(i32)
        ty0 = jnp.clip(jnp.floor(aabb_flat[:, 1] / th), 0, nty - 1).astype(i32)
        tx1 = jnp.clip(jnp.floor(aabb_flat[:, 2] / tw), 0, ntx - 1).astype(i32)
        ty1 = jnp.clip(jnp.floor(aabb_flat[:, 3] / th), 0, nty - 1).astype(i32)
        span_ok = ((tx1 - tx0) < mx) & ((ty1 - ty0) < my)
        is_local = live & span_ok
        is_global = live & ~span_ok

        bulk = jnp.zeros((n_tiles, C), i32)

        # ---- local slot enumeration ----------------------------------
        m = jnp.arange(M, dtype=i32)
        etx = tx0[:, None] + (m % mx)[None, :]      # (N, M)
        ety = ty0[:, None] + (m // mx)[None, :]
        in_range = (
            (etx <= tx1[:, None]) & (ety <= ty1[:, None])
            & (etx < ntx) & (ety < nty) & is_local[:, None]
        )
        ex0 = etx.astype(f32) * tw
        ey0 = ety.astype(f32) * th
        reject = jnp.zeros(etx.shape, bool)
        accept = jnp.ones(etx.shape, bool)
        for e_index in range(3):
            a = rows_f[:, 3 * e_index + 0][:, None]
            b = rows_f[:, 3 * e_index + 1][:, None]
            c = rows_f[:, 3 * e_index + 2][:, None]
            lo, hi = _corner_min_max(a, b, c, ex0, ey0, tw, th)
            reject = reject | (hi < 0.0)
            accept = accept & (lo > 0.0)
        valid = in_range & ~reject
        tile_of = ety * ntx + etx
        solid_acc = valid & accept & solid_flat[:, None]
        entry = valid & ~solid_acc

        # Trivial-accept scatter, cond-guarded: most scenes (small
        # triangles only) never fully cover a tile, and the scatter-add
        # costs ~0.5 ms even when every contribution is zero.
        bulk_vals = jnp.where(solid_acc, contrib_flat[:, None], 0)
        bulk = jax.lax.cond(
            jnp.any(solid_acc),
            lambda b: b.at[
                tile_of.reshape(-1), jnp.repeat(cmd_of, M)
            ].add(bulk_vals.reshape(-1), mode="drop"),
            lambda b: b,
            bulk,
        )

        # Stable sort of local entries by (tile, cmd, class) — stroke
        # classes precede fill classes within each command.
        key = (tile_of * C + cmd_of[:, None]) * N_CLASSES + class_flat[:, None]
        big = n_tiles * C * N_CLASSES
        key = jnp.where(entry, key, big).reshape(-1)
        payload = jnp.broadcast_to(
            jnp.arange(n_rows, dtype=i32)[:, None], (n_rows, M)
        ).reshape(-1)
        skey, srow = jax.lax.sort((key, payload), num_keys=1, is_stable=True)

        counts2 = jnp.zeros(n_tiles * N_CLASSES * C, i32).at[
            jnp.where(key < big, key, 0)
        ].add(jnp.where(key < big, 1, 0)).reshape(n_tiles, N_CLASSES * C)
        off = jnp.concatenate(
            [jnp.zeros((n_tiles, 1), i32), jnp.cumsum(counts2, axis=1)],
            axis=1,
        )
        tile_count = off[:, -1]
        # Start of each tile's segment in the sorted order — an
        # exclusive cumsum of the per-tile counts (invalid entries key
        # past every tile and sink to the tail).
        tile_begin = jnp.concatenate(
            [jnp.zeros(1, i32), jnp.cumsum(tile_count)[:-1]]
        )

        kk = jnp.arange(K + PAD, dtype=i32)
        gidx = jnp.clip(tile_begin[:, None] + kk[None, :], 0, skey.shape[0] - 1)
        # Gather wide rows through the sorted order rather than gathering
        # the 1D index vector first: element gathers of s32[tiles*K] are
        # serial on TPU (measured 0.9 ms at 1080p) while row gathers of
        # (…, 32)-wide rows vectorize on the (8,128) tiling.  Rows past a
        # tile's entry count are garbage from the neighbouring segment —
        # the kernel never reads past the `off` ranges (batch tails are
        # masked by batch_ok).
        sorted_f = rows_f[srow]
        sorted_i = rows_i[srow]
        tri_f = sorted_f[gidx]
        tri_i = sorted_i[gidx]
        # Clamp offsets to capacity so kernel ranges stay in bounds even
        # on overflow (the host detects it via `overflow` and retries).
        off = jnp.minimum(off, K)

        # ---- globals (big triangles) via small dense matrix -----------
        gkey = jnp.where(is_global, key2_flat, C * N_CLASSES + 1)
        gskey, gsrow = jax.lax.sort((gkey, jnp.arange(n_rows, dtype=i32)),
                                    num_keys=1, is_stable=True)
        g_total = jnp.sum(is_global.astype(i32))
        g_ids = gsrow[:G] if n_rows >= G else jnp.pad(gsrow, (0, G - n_rows))
        g_valid = jnp.arange(G, dtype=i32) < jnp.minimum(g_total, G)
        g_rows_f = rows_f[g_ids]
        g_rows_i = rows_i[g_ids]

        tile_x0 = (jnp.arange(ntx, dtype=f32) * tw)
        tile_y0 = (jnp.arange(nty, dtype=f32) * th)
        # AABB overlap, separable.
        gaabb = g_rows_f[:, RF_AABB:RF_AABB + 4]
        ovx = (gaabb[:, 0:1] <= tile_x0[None, :] + tw) & (
            gaabb[:, 2:3] >= tile_x0[None, :]
        )  # (G, ntx)
        ovy = (gaabb[:, 1:2] <= tile_y0[None, :] + th) & (
            gaabb[:, 3:4] >= tile_y0[None, :]
        )  # (G, nty)
        g_reject = jnp.zeros((G, nty, ntx), bool)
        g_accept = jnp.ones((G, nty, ntx), bool)
        for e_index in range(3):
            a = g_rows_f[:, 3 * e_index + 0][:, None, None]
            b = g_rows_f[:, 3 * e_index + 1][:, None, None]
            c = g_rows_f[:, 3 * e_index + 2][:, None, None]
            lo, hi = _corner_min_max(
                a, b, c, tile_x0[None, None, :], tile_y0[None, :, None], tw, th
            )
            g_reject = g_reject | (hi < 0.0)
            g_accept = g_accept & (lo > 0.0)
        g_over = ovy[:, :, None] & ovx[:, None, :] & g_valid[:, None, None]
        g_solid = g_rows_i[:, RI_KIND] == KIND_SOLID
        g_acc_mask = g_over & g_accept & g_solid[:, None, None]
        g_entry = (g_over & ~g_reject & ~g_acc_mask).transpose(1, 2, 0).reshape(
            n_tiles, G
        )
        g_acc_flat = g_acc_mask.transpose(1, 2, 0).reshape(n_tiles, G)

        # Million-element scatters are sort-based (slow) on TPU; the
        # per-(tile, command) reductions over globals are one-hot
        # matmuls on the (otherwise idle) MXU instead — values are
        # small integers, exact in f32 accumulation.
        g_cmd = g_rows_i[:, RI_CMD]
        cmd_one_hot = (
            g_cmd[:, None] == jnp.arange(C, dtype=i32)[None, :]
        ).astype(jnp.float32)
        bulk = bulk + jnp.dot(
            jnp.where(g_acc_flat, g_rows_i[None, :, RI_CONTRIB], 0).astype(
                jnp.float32
            ),
            cmd_one_hot,
            preferred_element_type=jnp.float32,
        ).astype(i32)

        # Per-tile global entry list, ordered by ascending g (already
        # (cmd, class)-sorted): top_k over a descending key.
        gl_key = jnp.where(
            g_entry, G - jnp.arange(G, dtype=i32)[None, :], -1
        )
        _gl_vals, gl_idx = jax.lax.top_k(gl_key, Kg)
        glist = jnp.concatenate(
            [gl_idx.astype(i32), jnp.zeros((n_tiles, PAD), i32)], axis=1
        )
        # Materialize each tile's global rows densely: the kernel then
        # reads them with the same contiguous pl.ds pattern as local
        # entries (the per-entry glist indirection — scalar index load
        # plus a row gather from the full table — was the dominant cost
        # of global-heavy scenes).
        g_tri_f = g_rows_f[glist]     # (n_tiles, Kg+PAD, D_F)
        g_tri_i = g_rows_i[glist]
        g_key2 = g_cmd * N_CLASSES + g_rows_i[:, RI_CLASS]
        key2_one_hot = (
            g_key2[:, None]
            == jnp.arange(N_CLASSES * C, dtype=i32)[None, :]
        ).astype(jnp.float32)
        g_counts2 = jnp.dot(
            g_entry.astype(jnp.float32),
            key2_one_hot,
            preferred_element_type=jnp.float32,
        ).astype(i32)
        g_off = jnp.concatenate(
            [jnp.zeros((n_tiles, 1), i32), jnp.cumsum(g_counts2, axis=1)],
            axis=1,
        )
        tile_g_count = g_off[:, -1]
        g_off = jnp.minimum(g_off, Kg)

        # ---- cover draws: near-plane clip + hull lines + class ---------
        # Computed per cover draw (one hull cover per (command,
        # instance)); stencil draws never read hull rows.
        hp = hull[jnp.asarray(c_shape_np)]               # (Rc, Hm, 2)
        ctf = transforms[jnp.asarray(draws.c_row)]       # (Rc, 4, 4)
        Cc = Rc

        # ---- gradient paint endpoints: model → pixel space -------------
        # Two points per cover draw (linear: start/end; radial:
        # center/rim); the same projection as the hulls, so paints ride
        # camera motion for free.  Zeros when the frame has no paints.
        if paint_model is None:
            paint_xy = jnp.zeros((Rc, 4), f32)
        else:
            ph = jnp.concatenate(
                [
                    jnp.asarray(paint_model, f32),
                    jnp.zeros((Rc, 2, 1), f32),
                    jnp.ones((Rc, 2, 1), f32),
                ],
                axis=-1,
            )
            pclip = jnp.einsum(
                "cpk,crk->cpr", ph, ctf,
                precision=jax.lax.Precision.HIGHEST,
            )
            pw = pclip[..., 3]
            piw = jnp.where(jnp.abs(pw) > 1e-6, 1.0 / pw, 0.0)
            pndc = pclip[..., :2] * piw[..., None]
            ppx = (pndc[..., 0] + 1.0) * (0.5 * W)
            ppy = (1.0 - pndc[..., 1]) * (0.5 * H)
            paint_xy = jnp.stack(
                [ppx[:, 0], ppy[:, 0], ppx[:, 1], ppy[:, 1]], axis=-1
            )

        # ---- per-cover-draw depth planes --------------------------------
        # For planar model geometry (z=0), NDC z is an affine function
        # of pixel coordinates (the same screen-space linearity GPUs
        # exploit to interpolate depth): solve z_ndc = a·px + b·py + c
        # from the transform rows without any perspective divide, using
        # px·w = (x_clip + w)·W/2 and py·w = (w − y_clip)·H/2 — both
        # affine over the model plane — so behind-the-eye sample points
        # can never poison the solve.  Consumed by the color cover's
        # depth test (reference depth_compare/depth_write_enabled,
        # renderer.rs:387-390); zeros when depth is compiled out.
        if spec.depth_write or spec.depth_compare != "always":
            mcols = jnp.asarray([0, 1, 3])  # coefficients over (x, y, 1)
            Xr = ctf[:, 0, mcols]
            Yr = ctf[:, 1, mcols]
            Zr = ctf[:, 2, mcols]
            Wr = ctf[:, 3, mcols]
            # Match coefficients of (x, y, 1) in
            #   Z = a·(X + W)·W/2 + b·(W − Y)·H/2 + c·W.
            A = jnp.stack(
                [(Xr + Wr) * (0.5 * W), (Wr - Yr) * (0.5 * H), Wr],
                axis=-1,
            )  # (Rc, 3, 3): rows over (x, y, 1), columns over (a, b, c)
            det = jnp.linalg.det(A)
            safe = jnp.abs(det) > 1e-30
            zplane = jnp.where(
                safe[:, None],
                jnp.linalg.solve(
                    jnp.where(
                        safe[:, None, None], A,
                        jnp.broadcast_to(jnp.eye(3, dtype=f32), A.shape),
                    ),
                    Zr[..., None],
                )[..., 0],
                jnp.zeros((Rc, 3), f32),
            )
        else:
            zplane = jnp.zeros((Rc, 3), f32)
        ones = jnp.ones((Cc, Hm, 1), f32)
        hclip = jnp.einsum(
            "chk,crk->chr",
            jnp.concatenate([hp, jnp.zeros((Cc, Hm, 1), f32), ones], axis=-1),
            ctf,
            precision=jax.lax.Precision.HIGHEST,
        )
        # Sutherland–Hodgman clip of the convex hull against w > eps —
        # the GPU hardware near-plane clip the reference relies on.  A
        # hull vertex behind the camera therefore no longer disables the
        # whole cover command; the visible part keeps rendering.
        H2 = Hm + 2
        eps = jnp.float32(1e-5)
        b_vert = jnp.roll(hclip, -1, axis=1)
        wa = hclip[..., 3]
        wb = b_vert[..., 3]
        in_a = wa > eps
        denom = jnp.where(wb - wa != 0.0, wb - wa, 1.0)
        t_int = (eps - wa) / denom
        inter = hclip + t_int[..., None] * (b_vert - hclip)
        out_v = jnp.stack([hclip, inter], axis=2).reshape(Cc, 2 * Hm, 4)
        out_valid = jnp.stack(
            [in_a, in_a != (wb > eps)], axis=2
        ).reshape(Cc, 2 * Hm)
        h_rank = jnp.cumsum(out_valid.astype(i32), axis=1) - 1
        h_count = jnp.sum(out_valid.astype(i32), axis=1)  # (Cc,)
        rows_c = jnp.broadcast_to(
            jnp.arange(Cc, dtype=i32)[:, None], (Cc, 2 * Hm)
        )
        slot = jnp.where(out_valid, jnp.minimum(h_rank, H2), H2)
        clipped = jnp.zeros((Cc * (H2 + 1), 4), f32).at[
            (rows_c * (H2 + 1) + slot).reshape(-1)
        ].set(out_v.reshape(-1, 4), mode="drop").reshape(Cc, H2 + 1, 4)[
            :, :H2
        ]
        # Pad unused slots with the first clipped vertex so the padded
        # edges are degenerate (replaced by pass lines below).
        in_use = (
            jnp.arange(H2, dtype=i32)[None, :] < jnp.minimum(h_count, H2)[:, None]
        )
        clipped = jnp.where(in_use[..., None], clipped, clipped[:, 0:1, :])
        hvalid = h_count >= 3

        hw = clipped[..., 3]
        hiw = jnp.where(hw > 0.0, 1.0 / hw, 0.0)
        hndc = clipped[..., :2] * hiw[..., None]
        hx = (hndc[..., 0] + 1.0) * (0.5 * W)
        hy = (1.0 - hndc[..., 1]) * (0.5 * H)
        hxn = jnp.roll(hx, -1, axis=-1)
        hyn = jnp.roll(hy, -1, axis=-1)
        h_area = jnp.sum(hx * hyn - hxn * hy, axis=-1)
        hsign = jnp.where(h_area >= 0, 1.0, -1.0)[:, None]
        ha = -(hyn - hy) * hsign
        hb = (hxn - hx) * hsign
        hc = -(ha * hx + hb * hy)
        degenerate = (ha == 0.0) & (hb == 0.0)
        ha = jnp.where(degenerate, 0.0, ha)
        hb = jnp.where(degenerate, 0.0, hb)
        hc = jnp.where(degenerate, 1.0, hc)
        hull_lines = jnp.stack(
            [ha, hb, hc, jnp.zeros_like(ha)], axis=-1
        )  # (Rc, H2, 4)

        hx_min = jnp.min(hx, axis=-1)
        hx_max = jnp.max(hx, axis=-1)
        hy_min = jnp.min(hy, axis=-1)
        hy_max = jnp.max(hy, axis=-1)
        hovx = (hx_min[:, None] <= tile_x0[None, :] + tw) & (
            hx_max[:, None] >= tile_x0[None, :]
        )
        hovy = (hy_min[:, None] <= tile_y0[None, :] + th) & (
            hy_max[:, None] >= tile_y0[None, :]
        )
        h_reject = jnp.zeros((Cc, nty, ntx), bool)
        h_accept = jnp.ones((Cc, nty, ntx), bool)
        # Per-(tile, cover) bitmask of hull lines actually crossing the
        # tile: boundary tiles evaluate only those lines in the kernel
        # (typically 1-4 of up to 18 after hull decimation).  Lines the
        # tile is fully inside of are skipped; lines the tile is fully
        # outside of reject the whole tile (cls 0).
        h_bits = jnp.zeros((Cc, nty, ntx), i32)
        assert H2 <= 31, "hull-line bitmask needs a single i32 word"
        for h_index in range(H2):
            a = ha[:, h_index][:, None, None]
            b = hb[:, h_index][:, None, None]
            c = hc[:, h_index][:, None, None]
            lo, hi = _corner_min_max(
                a, b, c, tile_x0[None, None, :], tile_y0[None, :, None], tw, th
            )
            h_reject = h_reject | (hi < 0.0)
            h_accept = h_accept & (lo > 0.0)
            h_bits = h_bits | jnp.where(lo > 0.0, 0, 1 << h_index)
        h_over = hovy[:, :, None] & hovx[:, None, :] & hvalid[:, None, None]
        cls = jnp.where(
            h_over,
            jnp.where(h_accept, 2, jnp.where(h_reject, 0, 1)),
            0,
        ).astype(i32).transpose(1, 2, 0).reshape(n_tiles, Rc)
        hbits = h_bits.transpose(1, 2, 0).reshape(n_tiles, Rc)

        # ---- active unit list ------------------------------------------
        # A unit is a kernel walk step in global draw order: a whole
        # stencil command or one cover draw (see DrawTables).
        start = off[:, 0:N_CLASSES * C:N_CLASSES]
        end = off[:, N_CLASSES:N_CLASSES * C + 1:N_CLASSES]
        local_any = (end - start) > 0
        g_start = g_off[:, 0:N_CLASSES * C:N_CLASSES]
        g_end = g_off[:, N_CLASSES:N_CLASSES * C + 1:N_CLASSES]
        global_any = (g_end - g_start) > 0
        stencil_active = local_any | global_any | (bulk != 0)
        cover_active = cls > 0
        # Static column gathers route each unit to its activity source.
        act_s = stencil_active[:, jnp.asarray(draws.unit_cmd)]
        act_c = cover_active[:, jnp.asarray(np.maximum(draws.unit_draw, 0))]
        is_cover_u = jnp.asarray(draws.unit_draw >= 0)
        active = jnp.where(is_cover_u[None, :], act_c, act_s)
        # ---- clip/alpha bracket gating ------------------------------
        # Drop a balanced bracket's machinery units from tiles NO
        # content unit of the whole frame touches: frame alpha is
        # exactly 0 there, and the complete bracket is then bit-exact
        # identity on the color buffer (save/scale/restore over a0 = 0
        # computes fl(1−g) − fl(1·fl(1−g)) = 0 with no rounding slack;
        # clip ops never touch color; wind/layerb are written and read
        # only by the equally-gated machinery).  The static proof
        # obligations (depth protocol, shape/layer/opacity pairing,
        # identical issue-time clip state) were discharged by
        # renderer._gate_spans; hull coincidence (equal opener/closer
        # transform rows) is the one runtime condition, checked here
        # per frame.
        for _content_u, _mach_u, _row_pairs in spec.gate_spans:
            valid = jnp.bool_(True)
            for _ra, _rb in _row_pairs:
                valid = valid & jnp.all(
                    transforms[_ra] == transforms[_rb]
                )
            _content_m = np.zeros(U, bool)
            _content_m[list(_content_u)] = True
            _mach_m = np.zeros(U, bool)
            _mach_m[list(_mach_u)] = True
            content_any = jnp.any(
                active & jnp.asarray(_content_m)[None, :], axis=1
            )
            active = active & (
                jnp.asarray(~_mach_m)[None, :]
                | content_any[:, None]
                | ~valid
            )
        # Compact active unit indices per tile by a row-wise sort
        # (inactive slots key to U and sink to the tail) — cheaper than
        # a scatter on TPU and order-preserving.
        aclist = jnp.sort(
            jnp.where(
                active, jnp.arange(U, dtype=i32)[None, :], jnp.int32(U)
            ),
            axis=1,
        )
        acount = jnp.sum(active.astype(i32), axis=1)

        overflow = jnp.stack(
            [jnp.max(tile_count), g_total, jnp.max(tile_g_count), cross_total]
        ).astype(i32)

        return PreparedFrame(
            tri_f=tri_f,
            tri_i=tri_i,
            off=off[:, None, :],
            g_tri_f=g_tri_f,
            g_tri_i=g_tri_i,
            g_off=g_off[:, None, :],
            bulk=bulk[:, None, :],
            cls=cls[:, None, :],
            hbits=hbits[:, None, :],
            aclist=aclist[:, None, :],
            acount=acount[:, None, None],
            hull_lines=hull_lines,
            paint_xy=paint_xy,
            zplane=zplane,
            overflow=overflow,
        )

    return prepare


# ---------------------------------------------------------------------------
# rasterize: the Pallas kernel
# ---------------------------------------------------------------------------


def _atan2(y, x):
    """Vectorized atan2 from elementary ops (Mosaic has no atan2
    lowering).  Minimax polynomial on [0, 1] + octant reduction;
    max error ~2e-7 rad — the consumer maps angle/τ into dash pattern
    space, where this is far below a sample width."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    a = lo / jnp.maximum(hi, 1e-30)
    s = a * a
    # atan(a) for a in [0, 1] (Estrin on a degree-17 odd minimax fit).
    r = jnp.float32(2.90188402868554e-3)
    r = r * s - jnp.float32(1.62907683983662e-2)
    r = r * s + jnp.float32(4.30330487210615e-2)
    r = r * s - jnp.float32(7.53012846110272e-2)
    r = r * s + jnp.float32(1.06614349190831e-1)
    r = r * s - jnp.float32(1.42070654521002e-1)
    r = r * s + jnp.float32(1.99934912843697e-1)
    r = r * s - jnp.float32(3.33331017859204e-1)
    r = r * s * a + a
    r = jnp.where(ay > ax, jnp.float32(0.5 * math.pi) - r, r)
    r = jnp.where(x < 0.0, jnp.float32(math.pi) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _cap_mask(cap_type, tex_x, tex_y):
    """Analytic cap predicates (shaders.wgsl:165-189); `cap_type` may be
    a scalar or a per-sample array; evaluated as a where-chain."""
    ax = jnp.abs(tex_x)
    # Boolean algebra instead of select: Mosaic cannot legalize selects
    # over i1 vectors (and scalar-predicate selects of vectors).
    out = (cap_type == int(Cap.BUTT)) & (tex_y < 0.0)
    cases = [
        tex_y <= 0.5,                                   # SQUARE
        tex_x * tex_x + tex_y * tex_y < 0.25,           # ROUND
        0.5 - tex_y > ax,                               # OUT
        tex_y < ax,                                     # IN
        0.5 - tex_y > tex_x,                            # RIGHT
        tex_y - 0.5 < tex_x,                            # LEFT
    ]
    for value, case in enumerate(cases):
        out = out | ((cap_type == value) & case)
    return out


def _cap_mask_scalar(cap_type, tex_x, tex_y):
    """Cap predicate for a *scalar* cap type: `lax.switch` dispatches to
    the one analytic case (shaders.wgsl:165-189) instead of evaluating
    the 7-way where-chain over every sample.  Solid strokes and
    single-interval dash patterns (the common cases) have scalar caps."""
    branches = [
        lambda: (tex_y <= 0.5).astype(jnp.int32),                    # SQUARE
        lambda: (tex_x * tex_x + tex_y * tex_y < 0.25).astype(jnp.int32),
        lambda: (0.5 - tex_y > jnp.abs(tex_x)).astype(jnp.int32),    # OUT
        lambda: (tex_y < jnp.abs(tex_x)).astype(jnp.int32),          # IN
        lambda: (0.5 - tex_y > tex_x).astype(jnp.int32),             # RIGHT
        lambda: (tex_y - 0.5 < tex_x).astype(jnp.int32),             # LEFT
        lambda: (tex_y < 0.0).astype(jnp.int32),                     # BUTT
    ]
    return jax.lax.switch(cap_type, branches) != 0


def _dash_mask_single(desc_f_row, desc_i_row, tex_x, tex_y):
    """Dashed coverage for a single-interval pattern: no per-sample
    interval search, scalar cap types.  Entries are routed here
    statically by their binning class (CLS_*_DASH1)."""
    pattern_len = desc_f_row[4]
    position = jnp.remainder(tex_y - desc_f_row[8], pattern_len)
    past = position - desc_f_row[0]
    in_dash = past <= 0.0
    cap_a = _cap_mask_scalar(desc_i_row[0], tex_x, past)
    cap_b = _cap_mask_scalar(desc_i_row[4], tex_x, pattern_len - position)
    return in_dash | cap_a | cap_b


def _dash_mask_general(desc_f_row, desc_i_row, tex_x, tex_y):
    """Dashed coverage (shaders.wgsl:205-231) for one descriptor row
    (scalars) at per-sample pattern position tex_y, side tex_x."""
    last = desc_i_row[8]
    phase = desc_f_row[8]
    gap_start = [desc_f_row[i] for i in range(4)]
    gap_end = [desc_f_row[4 + i] for i in range(4)]
    end_caps = [desc_i_row[i] for i in range(4)]
    start_caps = [desc_i_row[4 + i] for i in range(4)]
    pattern_len = gap_end[0]
    for i in range(1, MAX_DASH_INTERVALS):
        pattern_len = jnp.where(last == i, gap_end[i], pattern_len)
    position = jnp.remainder(tex_y - phase, pattern_len)
    interval = jnp.full(position.shape, 0, jnp.int32) + last
    for i in range(MAX_DASH_INTERVALS - 1, -1, -1):
        hit = (gap_end[i] - position >= 0.0) & (i <= last)
        interval = jnp.where(hit, i, interval)
    g_s = jnp.zeros_like(position)
    g_e = jnp.zeros_like(position)
    e_cap = jnp.zeros(position.shape, jnp.int32)
    s_cap = jnp.zeros(position.shape, jnp.int32)
    for i in range(MAX_DASH_INTERVALS):
        sel = interval == i
        g_s = jnp.where(sel, gap_start[i], g_s)
        g_e = jnp.where(sel, gap_end[i], g_e)
        e_cap = jnp.where(sel, end_caps[i], e_cap)
        s_cap = jnp.where(sel, start_caps[i], s_cap)
    past = position - g_s
    in_dash = past <= 0.0
    cap_a = _cap_mask(e_cap, tex_x, past)
    cap_b = _cap_mask(s_cap, tex_x, g_e - position)
    return in_dash | cap_a | cap_b


def make_rasterize(spec: FrameSpec):
    C = spec.n_commands
    draws = draw_tables(spec)
    Rc = len(draws.c_cmd)
    U = len(draws.unit_cmd)
    # Hull lines after near-plane clipping (prepare) have h_max+2 rows.
    Hm = spec.h_max + 2
    W, H = spec.width, spec.height
    tw, th = spec.tile_w, spec.tile_h
    strips = spec.tile_strips
    lw, lh = spec.screen_tile_w, spec.screen_tile_h
    ntx, nty, n_tiles = spec.ntx, spec.nty, spec.n_tiles
    K = spec.capacity
    Kg = spec.tile_global_capacity
    G = spec.global_capacity
    NB = spec.fill_batch
    SBS = spec.stroke_batch
    PAD = spec.entry_pad
    S = spec.samples
    L = max(1, spec.n_layers)
    winding_mask = (1 << spec.winding_bits) - 1
    offsets = SAMPLE_PATTERNS[S]
    blend_color, blend_alpha = _canonical_blend(spec.blending)
    uses_blend_const = blend_uses_constant(spec.blending)
    depth_compare = spec.depth_compare
    depth_write = spec.depth_write
    has_depth = depth_write or depth_compare != "always"
    out_u8 = spec.out_uint8
    # Static frame-program specialization: frames with no clip / alpha
    # commands (the common case) skip the per-tile state zeroing and the
    # per-command per-sample clip compare entirely.
    ops_np = np.asarray(spec.ops, np.int32)
    has_clip = bool(np.any((ops_np == OP_CLIP) | (ops_np == OP_UNCLIP)))
    has_alpha = bool(
        np.any(
            (ops_np == OP_SAVE_ALPHA)
            | (ops_np == OP_SCALE_ALPHA)
            | (ops_np == OP_RESTORE_ALPHA)
            | (ops_np == OP_SAVE_SCALE)
        )
    )
    has_paint = bool(any(spec.paints))
    # ---- per-draw table layout (small: SMEM, large: one VMEM array) --
    # cmd_f is (Rc, DF) with DF = 20 (+4 blend-constant columns); the
    # streamed layout appends paint_xy (4), zplane (3) and the
    # flattened hull lines (4·Hm) as extra columns of one combined
    # (Rc, DF+7+4·Hm) f32 array in VMEM — one 512-byte padded row per
    # draw instead of four, scaling to tens of thousands of draws
    # (SMEM holds ~1 MiB total; every 2-D window row pads to 512 B).
    DF = 24 if uses_blend_const else 20
    PXB = DF              # paint_xy column base (streamed layout)
    ZPB = DF + 4          # zplane column base
    HLB = DF + 7          # hull-line column base (4 per line)
    DRAW_F_W = HLB + 4 * Hm
    Rc_rows = max(1, Rc)
    if spec.stream_draws is None:
        # ~512 B per padded SMEM row across cmd_f/paint_xy/zplane (Rc
        # rows each) + cmd_i (C rows); stream past ~half the budget.
        stream_draws = (3 * Rc_rows + C) * 512 > (1 << 19)
    else:
        stream_draws = bool(spec.stream_draws)
    # Per-tile SMEM that scales with the command structure even in the
    # streamed layout: aclist/unit tables (U), cls/hbits (Rc), the
    # per-(command, class) range tables (9C+1) and cmd_i.  Reject
    # frames that cannot fit rather than failing deep in the TPU
    # compiler.
    U_units = U
    smem_fixed = (
        3 * U_units * 4            # aclist + unit_cmd + unit_draw
        + 2 * Rc_rows * 4          # cls + hbits
        + 4 * (N_CLASSES * C + 1) * 4  # off + g_off (+ slack)
        + C * 4                    # bulk
    )
    cmd_i_vmem = stream_draws and C > 1024
    if not cmd_i_vmem:
        smem_fixed += C * 512
    if not stream_draws:
        smem_fixed += 3 * Rc_rows * 512
    if smem_fixed > (1 << 20) - (1 << 16):
        from ..error import FrameTooComplex
        raise FrameTooComplex(
            f"frame needs ~{smem_fixed >> 10} KiB of scalar memory for "
            f"{C} commands / {Rc_rows} cover draws (budget ~1 MiB); "
            "instance repeated shapes so draws share commands, or "
            "split the frame"
        )
    if stream_draws and Rc_rows * 512 > 12 * (1 << 20):
        from ..error import FrameTooComplex
        raise FrameTooComplex(
            f"{Rc_rows} cover draws need "
            f"{Rc_rows * 512 >> 20} MiB of on-chip vector memory for "
            "the streamed draw table (budget ~12 MiB); split the frame"
        )
    # Distinct user-paint functions in first-appearance order over the
    # command walk — matches renderer._pack_commands_runtime's code
    # assignment (code = 3 + index).
    user_fns = []
    _seen_fns = set()
    for p in spec.paints:
        fn = getattr(p, "fn", None)
        if fn is not None and id(fn) not in _seen_fns:
            _seen_fns.add(id(fn))
            user_fns.append(fn)

    def kernel(*refs):
        # Two input layouts (see FrameSpec.stream_draws): the draw
        # payload is either four small SMEM tables or one combined VMEM
        # array whose first DF columns coincide with cmd_f — so the
        # cmd_f reads below are literal either way, and the accessors
        # only shift paint/zplane/hull columns.
        if stream_draws:
            (cmd_i, cmd_f, unit_cmd_s, unit_draw_s, acount, aclist,
             off, g_off, bulk, cls, hbits, tri_f, tri_i, g_tri_f,
             g_tri_i, desc_f, desc_i, out_ref, *scratch) = refs
            paint_tab = zp_tab = hull_tab = cmd_f
            px_base, zp_base, hl_base = PXB, ZPB, HLB
        else:
            (cmd_i, cmd_f, paint_tab, zp_tab, hull_tab, unit_cmd_s,
             unit_draw_s, acount, aclist, off, g_off, bulk, cls, hbits,
             tri_f, tri_i, g_tri_f, g_tri_i, desc_f, desc_i, out_ref,
             *scratch) = refs
            px_base = zp_base = hl_base = 0

        def paint_at(d, k):
            return paint_tab[d, px_base + k]

        def zplane_at(d, k):
            return zp_tab[d, zp_base + k]

        def hull_at(d, h_index, k):
            # Hull lines are stored flattened (Rc, 4·Hm): h_index and k
            # are Python statics, so the column is static too.
            return hull_tab[d, hl_base + 4 * h_index + k]

        wind, colorb, maskb = scratch[0], scratch[1], scratch[2]
        extra = 3
        if has_clip:
            clipb = scratch[extra]
            extra += 1
        if has_alpha:
            layerb = scratch[extra]
            extra += 1
        if has_depth:
            depthb = scratch[extra]
        t = pl.program_id(0)
        tile_x0 = (t % ntx).astype(jnp.float32) * lw
        tile_y0 = (t // ntx).astype(jnp.float32) * lh
        # Strip layout: lane l of row r covers screen pixel
        # (x0 + l % lw, y0 + (l // lw)·th + r) — `strips` vertical slabs
        # of the (lh, lw) screen footprint packed side by side along the
        # lane dimension (identity when strips == 1).
        col_i = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
        if strips == 1:
            col = col_i.astype(jnp.float32)
            row = row_i.astype(jnp.float32)
        else:
            col = (col_i % lw).astype(jnp.float32)
            row = ((col_i // lw) * th + row_i).astype(jnp.float32)
        # Per-sample offsets as python floats (a captured constant array
        # would be rejected by pallas_call).
        px = jnp.stack([tile_x0 + col + float(ox) for ox, _ in offsets])
        py = jnp.stack([tile_y0 + row + float(oy) for _, oy in offsets])
        # Pixel centers: the batched fill path evaluates all linear
        # functions once at centers and reaches each MSAA sample by a
        # scalar threshold shift (linear in screen space).
        pxc = tile_x0 + col + 0.5
        pyc = tile_y0 + row + 0.5

        def process_stroke_batch(rf4, ri4, j0, hi, clip_ok, joint,
                                 dash_mode):
            """SBS stroke entries at once against the whole tile.
            `joint` and `dash_mode` (0 solid / 1 single-interval /
            2 general) are Python statics — the binning class routed the
            entries here, so the body is branch-free (strip subdivision
            was measured a net loss on v5e: 4K showcase 69→56 FPS;
            whole-tile it is).

            The geometry/interpolation stage is vectorized over the
            batch with (SBS, 1, 1) coefficient slices, eliminating the
            ~30 scalar VMEM extracts per entry that dominated the
            single-entry cost.  The edge functions and the interpolation
            numerators / denominator are all linear in screen space, so
            they are evaluated once at pixel centers and shifted to each
            MSAA sample by per-entry scalars; only the perspective
            divide and the cap/dash/joint predicates are inherently
            per-sample (and those run per entry, keeping the scalar
            cap-type dispatch).

            Stroke stencil semantics are Equal-0 + IncrementWrap
            (renderer.rs:571-576): a sample ends at winding 1 iff any
            stroke entry of the command covers it — an OR across
            entries — so the batch folds into one winding update per
            sample."""

            if SBS == 1:
                # Mosaic cannot broadcast (1,1,1)→(1,th,tw) (sublanes
                # and lanes at once), and scalar extracts measured
                # faster than slice-broadcasts for short entry ranges —
                # the single-entry path uses scalars with no batch axis.
                def cf(idx):
                    return rf4[0, idx]

                def ci(idx):
                    return ri4[0, idx]
            else:
                def cf(idx):
                    return rf4[:, idx:idx + 1][:, :, None]

                def ci(idx):
                    return ri4[:, idx:idx + 1][:, :, None]

            ea = [cf(0), cf(3), cf(6)]
            eb = [cf(1), cf(4), cf(7)]
            ecv = [cf(2), cf(5), cf(8)]
            ec = [ea[k] * pxc + eb[k] * pyc + ecv[k] for k in range(3)]
            invA = cf(RF_INV_AREA)
            lc = [ec[k] * invA for k in range(3)]
            n_ch = 3 if joint else 2
            aw = [
                [cf(RF_AW + 4 * k + cc) for k in range(3)]
                for cc in range(n_ch)
            ]
            ch_c = [
                lc[0] * aw[cc][0] + lc[1] * aw[cc][1] + lc[2] * aw[cc][2]
                for cc in range(n_ch)
            ]
            gx = [
                invA * (ea[0] * aw[cc][0] + ea[1] * aw[cc][1]
                        + ea[2] * aw[cc][2])
                for cc in range(n_ch)
            ]
            gy = [
                invA * (eb[0] * aw[cc][0] + eb[1] * aw[cc][1]
                        + eb[2] * aw[cc][2])
                for cc in range(n_ch)
            ]
            iwv = [cf(RF_IW + k) for k in range(3)]
            iw_c = lc[0] * iwv[0] + lc[1] * iwv[1] + lc[2] * iwv[2]
            gxw = invA * (ea[0] * iwv[0] + ea[1] * iwv[1] + ea[2] * iwv[2])
            gyw = invA * (eb[0] * iwv[0] + eb[1] * iwv[1] + eb[2] * iwv[2])
            flags4 = ci(RI_FLAGS)
            tl = [(flags4 & (1 << k)) != 0 for k in range(3)]
            batch_ok = (
                None if SBS == 1 else (
                    j0 + jax.lax.broadcasted_iota(
                        jnp.int32, (SBS, 1, 1), 0
                    )
                ) < hi
            )
            # Per-entry scalars for the predicate stage.
            grp_k = [ri4[k, RI_GROUP] for k in range(SBS)]
            flg_k = [ri4[k, RI_FLAGS] for k in range(SBS)]
            endy_k = [rf4[k, RF_END_Y] for k in range(SBS)]
            if dash_mode:
                df_k = [desc_f[grp_k[k], :] for k in range(SBS)]
            di_k = [desc_i[grp_k[k], :] for k in range(SBS)]

            def entry_keep(k, tex_x, tex_y, tex_z):
                if joint:
                    radius = jnp.sqrt(tex_x * tex_x + tex_y * tex_y)
                    join = di_k[k][10]
                    is_tip = (flg_k[k] & FLAG_JOINT_TIP) != 0
                    is_bevel = join == int(Join.BEVEL)
                    is_round = join == int(Join.ROUND)
                    # Boolean algebra (no i1-vector selects): miter
                    # keeps everything, bevel drops tip triangles, round
                    # keeps the half-width disc (shaders.wgsl:191-203).
                    keep = (
                        ((~is_bevel & ~is_round) & (radius >= 0.0))
                        | ((is_bevel & ~is_tip) & (radius >= 0.0))
                        | (is_round & (radius <= 0.5))
                    )
                    if dash_mode:
                        angle = _atan2(tex_y, tex_x) * jnp.float32(
                            1.0 / TAU
                        )
                        dm = (
                            _dash_mask_single if dash_mode == 1
                            else _dash_mask_general
                        )(df_k[k], di_k[k], radius, tex_z + angle)
                        keep = keep & dm
                    return keep
                if dash_mode:
                    return (
                        _dash_mask_single if dash_mode == 1
                        else _dash_mask_general
                    )(df_k[k], di_k[k], tex_x, tex_y)
                end_cap = _cap_mask_scalar(
                    di_k[k][12], tex_x, tex_y - endy_k[k]
                )
                start_cap = _cap_mask_scalar(di_k[k][11], tex_x, -tex_y)
                end_flag = (flg_k[k] & FLAG_END_CAP) != 0
                return (
                    (end_flag & end_cap)
                    | (~end_flag & ((tex_y >= 0.0) | start_cap))
                )

            for s in range(S):
                dx = float(offsets[s, 0]) - 0.5
                dy = float(offsets[s, 1]) - 0.5
                inside = None
                for k in range(3):
                    nt = -(ea[k] * dx + eb[k] * dy)
                    t = (ec[k] > nt) | ((ec[k] == nt) & tl[k])
                    inside = t if inside is None else (inside & t)
                if batch_ok is not None:
                    inside = inside & batch_ok
                iws = iw_c + (gxw * dx + gyw * dy)
                inv = 1.0 / jnp.where(iws != 0.0, iws, 1.0)
                texs = [
                    (ch_c[cc] + (gx[cc] * dx + gy[cc] * dy)) * inv
                    for cc in range(n_ch)
                ]
                cov = None
                for k in range(SBS):
                    keep = entry_keep(
                        k,
                        texs[0] if SBS == 1 else texs[0][k],
                        texs[1] if SBS == 1 else texs[1][k],
                        (texs[2] if SBS == 1 else texs[2][k])
                        if joint else None,
                    )
                    ck = (inside if SBS == 1 else inside[k]) & keep
                    cov = ck if cov is None else (cov | ck)
                if clip_ok is not None:
                    cov = cov & clip_ok[s]
                current = wind[s]
                wind[s] = jnp.where(cov & (current == 0), 1, current)

        def process_fill_batch(rf4, ri4, j0, hi, class_code, clip_ok):
            """NB fill triangles at once.  All per-triangle quantities
            are (NB, 1, 1) vectors instead of scalar extracts; the
            linear edge and Loop-Blinn weight functions are evaluated
            once at pixel centers (NB, th, tw) and shifted to each MSAA
            sample by per-triangle scalars (they are linear in screen
            space); the batch's winding deltas sum before the single
            per-sample state update."""

            def cf(idx):
                return rf4[:, idx:idx + 1][:, :, None]

            def ci(idx):
                return ri4[:, idx:idx + 1][:, :, None]

            a0, b0, c0 = cf(0), cf(1), cf(2)
            a1, b1, c1 = cf(3), cf(4), cf(5)
            a2, b2, c2 = cf(6), cf(7), cf(8)
            flags4 = ci(RI_FLAGS)
            batch_ok = (
                j0 + jax.lax.broadcasted_iota(jnp.int32, (NB, 1, 1), 0)
            ) < hi
            contrib4 = jnp.where(batch_ok, ci(RI_CONTRIB), 0)
            e0 = a0 * pxc + b0 * pyc + c0     # (NB, th, tw)
            e1 = a1 * pxc + b1 * pyc + c1
            e2 = a2 * pxc + b2 * pyc + c2
            tl0 = (flags4 & 1) != 0
            tl1 = (flags4 & 2) != 0
            tl2 = (flags4 & 4) != 0

            n_ch = {
                CLS_FILL_SOLID: 0, CLS_FILL_QUAD: 3, CLS_FILL_CUBIC: 4,
            }[class_code]
            if n_ch:
                inv_area = cf(RF_INV_AREA)
                l0 = e0 * inv_area
                l1 = e1 * inv_area
                l2 = e2 * inv_area
                aw = [
                    [cf(RF_AW + 4 * k + cch) for k in range(3)]
                    for cch in range(n_ch)
                ]
                ch_c = [
                    l0 * aw[cch][0] + l1 * aw[cch][1] + l2 * aw[cch][2]
                    for cch in range(n_ch)
                ]
                gx = [
                    inv_area
                    * (a0 * aw[cch][0] + a1 * aw[cch][1] + a2 * aw[cch][2])
                    for cch in range(n_ch)
                ]
                gy = [
                    inv_area
                    * (b0 * aw[cch][0] + b1 * aw[cch][1] + b2 * aw[cch][2])
                    for cch in range(n_ch)
                ]

            for s in range(S):
                dx = float(offsets[s, 0]) - 0.5
                dy = float(offsets[s, 1]) - 0.5
                nt0 = -(a0 * dx + b0 * dy)
                nt1 = -(a1 * dx + b1 * dy)
                nt2 = -(a2 * dx + b2 * dy)
                keep = (
                    ((e0 > nt0) | ((e0 == nt0) & tl0))
                    & ((e1 > nt1) | ((e1 == nt1) & tl1))
                    & ((e2 > nt2) | ((e2 == nt2) & tl2))
                )
                if class_code == CLS_FILL_QUAD:
                    xs = ch_c[0] + (gx[0] * dx + gy[0] * dy)
                    ys = ch_c[1] + (gx[1] * dx + gy[1] * dy)
                    zs = ch_c[2] + (gx[2] * dx + gy[2] * dy)
                    keep = keep & (xs * xs - ys * zs <= 0.0)
                elif class_code == CLS_FILL_CUBIC:
                    xs = ch_c[0] + (gx[0] * dx + gy[0] * dy)
                    ys = ch_c[1] + (gx[1] * dx + gy[1] * dy)
                    zs = ch_c[2] + (gx[2] * dx + gy[2] * dy)
                    ws = ch_c[3] + (gx[3] * dx + gy[3] * dy)
                    keep = keep & (xs * xs * xs - ys * zs * ws <= 0.0)
                delta = jnp.sum(
                    jnp.where(keep, contrib4, 0), axis=0
                )  # (th, tw)
                if clip_ok is not None:
                    delta = jnp.where(clip_ok[s], delta, 0)
                wind[s] = wind[s] + delta

        def cmd_body(k, carry):
            # A unit is a whole stencil command or one cover draw
            # (instance); the walk replays units in global draw order.
            uid = aclist[0, 0, k]
            c = unit_cmd_s[uid]
            d = unit_draw_s[uid]  # cover-draw index; -1 for stencil
            op = cmd_i[c, 0]
            depth = cmd_i[c, 1]
            layer = cmd_i[c, 2]
            clip_ok = (clipb[...] == depth) if has_clip else None

            # Without clip commands the clip buffer is identically zero,
            # so the per-sample clip test collapses to the scalar
            # `depth == 0` — commands at nonzero depth are no-ops.
            sel_ok = True if has_clip else (depth == 0)

            @pl.when((op == OP_STENCIL) & sel_ok if not has_clip
                     else op == OP_STENCIL)
            def _stencil():
                base = N_CLASSES * c

                # Stroke classes — six branch-free specializations
                # (lines/joints × solid/single-dash/general-dash); they
                # run before fills, matching the reference's draw order.
                # Compiled out entirely for scenes without stroke
                # groups (FrameSpec.has_strokes).
                for cls_code, joint, dash_mode in (
                    (CLS_LINE_SOLID, False, 0),
                    (CLS_LINE_DASH1, False, 1),
                    (CLS_LINE_DASHN, False, 2),
                    (CLS_JOINT_SOLID, True, 0),
                    (CLS_JOINT_DASH1, True, 1),
                    (CLS_JOINT_DASHN, True, 2),
                ) if spec.has_strokes else ():
                    # pl.when guards: an empty range skips the loop
                    # prologue entirely — most (visit, class) pairs are
                    # empty.
                    s_lo = off[0, 0, base + cls_code]
                    s_hi = off[0, 0, base + cls_code + 1]

                    def local_stroke(b_ix, inner, joint=joint,
                                     dash_mode=dash_mode,
                                     s_lo=s_lo, s_hi=s_hi):
                        j0 = s_lo + b_ix * SBS
                        process_stroke_batch(
                            tri_f[0, pl.ds(j0, SBS), :],
                            tri_i[0, pl.ds(j0, SBS), :],
                            j0, s_hi, clip_ok, joint, dash_mode,
                        )
                        return inner

                    @pl.when(s_hi > s_lo)
                    def _local_strokes(s_lo=s_lo, s_hi=s_hi,
                                       local_stroke=local_stroke):
                        jax.lax.fori_loop(
                            0, (s_hi - s_lo + SBS - 1) // SBS,
                            local_stroke, 0,
                        )

                    gs_lo = g_off[0, 0, base + cls_code]
                    gs_hi = g_off[0, 0, base + cls_code + 1]

                    def global_stroke(b_ix, inner, joint=joint,
                                      dash_mode=dash_mode,
                                      gs_lo=gs_lo, gs_hi=gs_hi):
                        j0 = gs_lo + b_ix * SBS
                        process_stroke_batch(
                            g_tri_f[0, pl.ds(j0, SBS), :],
                            g_tri_i[0, pl.ds(j0, SBS), :],
                            j0, gs_hi, clip_ok, joint, dash_mode,
                        )
                        return inner

                    @pl.when(gs_hi > gs_lo)
                    def _global_strokes(gs_lo=gs_lo, gs_hi=gs_hi,
                                        global_stroke=global_stroke):
                        jax.lax.fori_loop(
                            0, (gs_hi - gs_lo + SBS - 1) // SBS,
                            global_stroke, 0,
                        )

                # Fill classes (solid, quadratic, cubic) — NB entries at
                # a time with coefficients as (NB, 1, 1) vectors;
                # winding adds commute within a command.
                for cls_code in (CLS_FILL_SOLID, CLS_FILL_QUAD,
                                 CLS_FILL_CUBIC):
                    lo = off[0, 0, base + cls_code]
                    hi = off[0, 0, base + cls_code + 1]

                    def local_batch(b_ix, inner, lo=lo, hi=hi,
                                    cls_code=cls_code):
                        j0 = lo + b_ix * NB
                        process_fill_batch(
                            tri_f[0, pl.ds(j0, NB), :],
                            tri_i[0, pl.ds(j0, NB), :],
                            j0, hi, cls_code, clip_ok,
                        )
                        return inner

                    @pl.when(hi > lo)
                    def _local_fills(lo=lo, hi=hi, local_batch=local_batch):
                        jax.lax.fori_loop(
                            0, (hi - lo + NB - 1) // NB, local_batch, 0
                        )

                    glo = g_off[0, 0, base + cls_code]
                    ghi = g_off[0, 0, base + cls_code + 1]

                    def global_batch(b_ix, inner, glo=glo, ghi=ghi,
                                     cls_code=cls_code):
                        j0 = glo + b_ix * NB
                        process_fill_batch(
                            g_tri_f[0, pl.ds(j0, NB), :],
                            g_tri_i[0, pl.ds(j0, NB), :],
                            j0, ghi, cls_code, clip_ok,
                        )
                        return inner

                    @pl.when(ghi > glo)
                    def _global_fills(glo=glo, ghi=ghi,
                                      global_batch=global_batch):
                        jax.lax.fori_loop(
                            0, (ghi - glo + NB - 1) // NB, global_batch, 0
                        )

                b = bulk[0, 0, c]

                @pl.when(b != 0)
                def _bulk():
                    if clip_ok is not None:
                        wind[...] = wind[...] + jnp.where(clip_ok, b, 0)
                    else:
                        wind[...] = wind[...] + b

            @pl.when((op != OP_STENCIL) & sel_ok if not has_clip
                     else op != OP_STENCIL)
            def _cover():
                cl = cls[0, 0, d]

                @pl.when(cl > 0)
                def _active():
                    @pl.when(cl == 2)
                    def _full():
                        maskb[...] = jnp.ones((S, th, tw), jnp.int32)

                    @pl.when(cl == 1)
                    def _boundary():
                        # Only the hull lines that actually cross this
                        # tile (prepare's bitmask) are evaluated; padded
                        # and non-crossing lines are skipped.
                        bits = hbits[0, 0, d]
                        maskb[...] = jnp.ones((S, th, tw), jnp.int32)
                        for h_index in range(Hm):
                            @pl.when(((bits >> h_index) & 1) != 0)
                            def _line(h_index=h_index):
                                he = (
                                    hull_at(d, h_index, 0) * px
                                    + hull_at(d, h_index, 1) * py
                                    + hull_at(d, h_index, 2)
                                )
                                maskb[...] = maskb[...] & (
                                    he >= 0.0
                                ).astype(jnp.int32)

                    in_hull = maskb[...] != 0
                    nonzero = (wind[...] & winding_mask) != 0
                    # Per-draw color: the reference's instance-rate
                    # color attribute (renderer.rs:462-466).
                    cr = cmd_f[d, 0]
                    cg = cmd_f[d, 1]
                    cb = cmd_f[d, 2]
                    ca = cmd_f[d, 3]

                    @pl.when(op == OP_COLOR)
                    def _color():
                        # Stencil Less → Zero: paint where winding nonzero
                        # within clip, reset winding (renderer.rs:736-754).
                        mask = in_hull & nonzero
                        if clip_ok is not None:
                            mask = mask & clip_ok
                        if has_depth:
                            # Fragment depth: the draw's NDC-z plane
                            # evaluated at each sample (prepare solved
                            # the affine coefficients from the
                            # transform).  Only the color cover tests /
                            # writes depth, like the reference's
                            # pipelines (renderer.rs:736-745 vs 601-841);
                            # stencil pass_op fires only when depth also
                            # passes, so the winding reset below already
                            # uses the combined mask (depth_fail_op is
                            # Keep, renderer.rs:442).
                            zval = (
                                zplane_at(d, 0) * px
                                + zplane_at(d, 1) * py
                                + zplane_at(d, 2)
                            )
                            dbuf = depthb[...]
                            dcmp = {
                                "never": None,
                                "less": lambda: zval < dbuf,
                                "equal": lambda: zval == dbuf,
                                "less_equal": lambda: zval <= dbuf,
                                "greater": lambda: zval > dbuf,
                                "not_equal": lambda: zval != dbuf,
                                "greater_equal": lambda: zval >= dbuf,
                                "always": None,
                            }[depth_compare]
                            if depth_compare == "never":
                                mask = mask & jnp.zeros(
                                    (S, th, tw), jnp.bool_
                                )
                            elif dcmp is not None:
                                mask = mask & dcmp()

                        def blend(src, sa):
                            # Generic wgpu blend state (renderer.rs:381),
                            # emitted statically per spec — the named
                            # modes (over, front-to-back, additive) fold
                            # to the same arithmetic their hand-written
                            # forms had.  Destination alpha is sampled
                            # before any channel updates (dst_alpha
                            # factors must see the pre-draw value).
                            da = colorb[3]
                            # The runtime blend constant (wgpu
                            # set_blend_constant) rides cmd_f columns
                            # 20:24 when the state references it.
                            const = (
                                (cmd_f[d, 20], cmd_f[d, 21],
                                 cmd_f[d, 22], cmd_f[d, 23])
                                if uses_blend_const
                                else None
                            )
                            for chan in range(4):
                                comp = (
                                    blend_alpha if chan == 3
                                    else blend_color
                                )
                                colorb[chan] = jnp.where(
                                    mask,
                                    _blend_channel(
                                        comp, src[chan], colorb[chan],
                                        sa, da, chan, const,
                                    ),
                                    colorb[chan],
                                )
                            wind[...] = jnp.where(mask, 0, wind[...])

                        if not has_paint:
                            blend((cr * ca, cg * ca, cb * ca, ca), ca)
                        else:
                            # Solid covers keep the cheap scalar-source
                            # path even in frames that carry gradients.
                            pk = cmd_i[c, 3]

                            @pl.when(pk == 0)
                            def _solid_cover():
                                blend((cr * ca, cg * ca, cb * ca, ca), ca)

                            # User paints (renderer.UserPaint): each
                            # distinct fn compiles its own branch,
                            # selected by the packed code 3+i (the
                            # reference's user-defined fragment shaders,
                            # README.md:28-33, via custom wgpu
                            # pipelines, lib.rs:4-7).  The fn returns
                            # straight RGBA; premultiplied here like
                            # the gradient path.
                            for u_ix, u_fn in enumerate(user_fns):
                                @pl.when(pk == 3 + u_ix)
                                def _user_cover(u_fn=u_fn):
                                    anchor = (
                                        paint_at(d, 0), paint_at(d, 1),
                                        paint_at(d, 2), paint_at(d, 3),
                                    )
                                    ur, ug, ub, ua = u_fn(px, py, anchor)
                                    blend(
                                        (ur * ua, ug * ua, ub * ua, ua),
                                        ua,
                                    )

                            @pl.when((pk == 1) | (pk == 2))
                            def _gradient_cover():
                                # Gradient paints (TPU-native extension):
                                # per-sample t along the projected
                                # endpoints, multi-stop ramp, then
                                # premultiply.
                                pax = paint_at(d, 0)
                                pay = paint_at(d, 1)
                                pdx = paint_at(d, 2) - pax
                                pdy = paint_at(d, 3) - pay
                                pden = jnp.maximum(
                                    pdx * pdx + pdy * pdy,
                                    jnp.float32(1e-12),
                                )
                                rel_x = px - pax
                                rel_y = py - pay
                                t_lin = (
                                    rel_x * pdx + rel_y * pdy
                                ) / pden
                                t_rad = jnp.sqrt(
                                    (rel_x * rel_x + rel_y * rel_y)
                                    / pden
                                )
                                t = jnp.clip(
                                    jnp.where(pk == 2, t_rad, t_lin),
                                    0.0, 1.0,
                                )
                                # Piecewise-linear multi-stop ramp:
                                # c(t) = c0 + Σᵢ (cᵢ₊₁−cᵢ)·
                                #        clip((t−oᵢ)/Δoᵢ) — each term
                                # ramps in over its own segment
                                # (degenerate Δo → hard stop via eps).
                                fs = []
                                for i in range(MAX_STOPS - 1):
                                    o_lo = cmd_f[d, 16 + i]
                                    o_hi = cmd_f[d, 17 + i]
                                    fs.append(
                                        jnp.clip(
                                            (t - o_lo)
                                            / jnp.maximum(
                                                o_hi - o_lo,
                                                jnp.float32(1e-6),
                                            ),
                                            0.0,
                                            1.0,
                                        )
                                    )

                                def ramp(ch):
                                    out = cmd_f[d, ch]
                                    for i in range(MAX_STOPS - 1):
                                        out = out + (
                                            cmd_f[d, 4 * (i + 1) + ch]
                                            - cmd_f[d, 4 * i + ch]
                                        ) * fs[i]
                                    return out

                                pr, pg, pb, pa = (
                                    ramp(0), ramp(1), ramp(2), ramp(3)
                                )
                                blend(
                                    (pr * pa, pg * pa, pb * pa, pa), pa
                                )

                        if has_depth and depth_write:
                            # Write-back for fragments that passed every
                            # test (wgpu writes depth after the combined
                            # stencil+depth pass).
                            depthb[...] = jnp.where(
                                mask, zval, depthb[...]
                            )

                    if has_clip:
                        @pl.when(op == OP_CLIP)
                        def _clip():
                            # Replace on NotEqual: promote winding≠0 into
                            # the clip counter (renderer.rs:692-710).
                            mask = in_hull & nonzero
                            clipb[...] = jnp.where(mask, depth, clipb[...])
                            wind[...] = jnp.where(mask, 0, wind[...])

                        @pl.when(op == OP_UNCLIP)
                        def _unclip():
                            # Replace on Less: demote deeper samples
                            # (renderer.rs:711-729).
                            mask = in_hull & (clipb[...] > depth)
                            clipb[...] = jnp.where(mask, depth, clipb[...])
                            wind[...] = jnp.where(mask, 0, wind[...])

                    if has_alpha:
                        @pl.when(op == OP_SAVE_ALPHA)
                        def _save():
                            # Copy frame alpha into the layer texture
                            # (renderer.rs:767-799, shaders.wgsl:323-338).
                            mask = in_hull
                            if clip_ok is not None:
                                mask = mask & clip_ok
                            layerb[layer] = jnp.where(
                                mask, colorb[3], layerb[layer]
                            )

                        @pl.when(op == OP_SCALE_ALPHA)
                        def _scale():
                            # frame.alpha ← (1-g) + g·frame.alpha
                            # (renderer.rs:800-828, shaders.wgsl:311-316).
                            mask = in_hull
                            if clip_ok is not None:
                                mask = mask & clip_ok
                            colorb[3] = jnp.where(
                                mask, (1.0 - ca) + ca * colorb[3], colorb[3]
                            )

                        @pl.when(op == OP_SAVE_SCALE)
                        def _save_scale():
                            # Fused alpha-group prologue (save, then
                            # scale, over the identical hull/clip mask):
                            # one pass reads frame alpha once, snapshots
                            # it, and rewrites it in place.
                            mask = in_hull
                            if clip_ok is not None:
                                mask = mask & clip_ok
                            a0 = colorb[3]
                            layerb[layer] = jnp.where(
                                mask, a0, layerb[layer]
                            )
                            colorb[3] = jnp.where(
                                mask, (1.0 - ca) + ca * a0, colorb[3]
                            )

                        @pl.when(op == OP_RESTORE_ALPHA)
                        def _restore():
                            # frame.alpha ← frame.alpha − (1−saved)(1−g)
                            # (reverse subtract, renderer.rs:829-861,
                            # shaders.wgsl:340-355).
                            mask = in_hull
                            if clip_ok is not None:
                                mask = mask & clip_ok
                            colorb[3] = jnp.where(
                                mask,
                                colorb[3]
                                - (1.0 - layerb[layer]) * (1.0 - ca),
                                colorb[3],
                            )

            return carry

        n_active = acount[0, 0, 0]

        # Empty-tile fast path: tiles no command touches (typically the
        # majority of a sparse frame) write transparent black and skip
        # all scratch zeroing and the resolve read entirely.
        @pl.when(n_active == 0)
        def _empty_tile():
            if out_u8:
                out_ref[...] = jnp.zeros(out_ref.shape, jnp.int32)
            else:
                out_ref[...] = jnp.zeros((1, 4, th, tw), jnp.float32)

        @pl.when(n_active > 0)
        def _tile_body():
            wind[...] = jnp.zeros((S, th, tw), jnp.int32)
            colorb[...] = jnp.zeros((4, S, th, tw), jnp.float32)
            if has_clip:
                clipb[...] = jnp.zeros((S, th, tw), jnp.int32)
            if has_alpha:
                layerb[...] = jnp.zeros((L, S, th, tw), jnp.float32)
            if has_depth:
                # The reference render pass clears depth to 1.0
                # (examples/showcase/main.rs LoadOp::Clear(1.0)).
                depthb[...] = jnp.ones((S, th, tw), jnp.float32)

            jax.lax.fori_loop(0, n_active, cmd_body, 0)

            inv_s = jnp.float32(1.0 / S)
            if out_u8:
                # Quantize + pack at resolve time (bit-identical to
                # Renderer._quantize: floor(clip·255 + 0.5)).  A<<24
                # wraps into the int32 sign bit for A >= 128 — the bit
                # pattern is exactly the little-endian RGBA8 quad the
                # host bitcasts back to uint8.
                q = []
                for chan in range(4):
                    v = jnp.sum(colorb[chan], axis=0) * inv_s
                    q.append(
                        jnp.floor(
                            jnp.clip(v, 0.0, 1.0) * 255.0 + 0.5
                        ).astype(jnp.int32)
                    )
                packed = q[0] | (q[1] << 8) | (q[2] << 16) | (q[3] << 24)
                out_ref[...] = packed.reshape(out_ref.shape)
            else:
                for chan in range(4):
                    out_ref[0, chan] = (
                        jnp.sum(colorb[chan], axis=0) * inv_s
                    )

    grid = (n_tiles,)
    _draw_specs = (
        [
            pl.BlockSpec(
                memory_space=pltpu.VMEM if cmd_i_vmem else pltpu.SMEM
            ),                                                       # cmd_i
            pl.BlockSpec(memory_space=pltpu.VMEM),                   # draw_f
        ]
        if stream_draws
        else [
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # cmd_i
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # cmd_f
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # paint_xy
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # zplane
            pl.BlockSpec(memory_space=pltpu.VMEM),                   # hull_f2
        ]
    )
    in_specs = _draw_specs + [
        pl.BlockSpec(memory_space=pltpu.SMEM),                       # unit_cmd
        pl.BlockSpec(memory_space=pltpu.SMEM),                       # unit_draw
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),                       # acount
        pl.BlockSpec((1, 1, U), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),                       # aclist
        pl.BlockSpec((1, 1, N_CLASSES * C + 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),                       # off
        pl.BlockSpec((1, 1, N_CLASSES * C + 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),                       # g_off
        pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),                       # bulk
        pl.BlockSpec((1, 1, Rc), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),                       # cls
        pl.BlockSpec((1, 1, Rc), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),                       # hbits
        pl.BlockSpec((1, K + PAD, D_F), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),                       # tri_f
        pl.BlockSpec((1, K + PAD, D_I), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),                       # tri_i
        pl.BlockSpec((1, Kg + PAD, D_F), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),                       # g_tri_f
        pl.BlockSpec((1, Kg + PAD, D_I), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),                       # g_tri_i
        pl.BlockSpec(memory_space=pltpu.VMEM),                       # desc_f
        pl.BlockSpec(memory_space=pltpu.VMEM),                       # desc_i
    ]

    if out_u8 and strips == 1:
        # Each tile's packed-RGBA8 block lands at its final mosaic
        # position — no de-tiling transpose downstream.
        out_specs = pl.BlockSpec((th, tw), lambda i: (i // ntx, i % ntx))
        out_shape = jax.ShapeDtypeStruct((nty * th, ntx * tw), jnp.int32)
    elif out_u8:
        # Strip tiles are not contiguous screen rectangles; the packed
        # blocks de-tile downstream like the float path.
        out_specs = pl.BlockSpec((1, th, tw), lambda i: (i, 0, 0))
        out_shape = jax.ShapeDtypeStruct((n_tiles, th, tw), jnp.int32)
    else:
        out_specs = pl.BlockSpec((1, 4, th, tw), lambda i: (i, 0, 0, 0))
        out_shape = jax.ShapeDtypeStruct((n_tiles, 4, th, tw), jnp.float32)

    raster_call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [
                pltpu.VMEM((S, th, tw), jnp.int32),       # wind
                pltpu.VMEM((4, S, th, tw), jnp.float32),  # colorb
                pltpu.VMEM((S, th, tw), jnp.int32),       # maskb
            ]
            + ([pltpu.VMEM((S, th, tw), jnp.int32)] if has_clip else [])
            + ([pltpu.VMEM((L, S, th, tw), jnp.float32)] if has_alpha
               else [])
            + ([pltpu.VMEM((S, th, tw), jnp.float32)] if has_depth
               else [])
        ),
        interpret=spec.interpret,
    )

    unit_cmd_dev = jnp.asarray(draws.unit_cmd)
    unit_draw_dev = jnp.asarray(draws.unit_draw)

    def rasterize(prepared: PreparedFrame, cmd_i, cmd_f, desc_f, desc_i):
        # Hull lines flatten to (Rc, 4·Hm) so every kernel read is a
        # (dynamic row, static column) scalar — and so the VMEM window
        # is one padded row per draw, not one padded (Hm, 4) tile.
        hull_f2 = prepared.hull_lines.reshape(Rc, 4 * Hm)
        if stream_draws:
            draw_f = jnp.concatenate(
                [
                    jnp.asarray(cmd_f, jnp.float32),
                    prepared.paint_xy,
                    prepared.zplane,
                    hull_f2,
                ],
                axis=1,
            )
            draw_args = (cmd_i, draw_f)
        else:
            draw_args = (
                cmd_i, cmd_f, prepared.paint_xy, prepared.zplane, hull_f2,
            )
        tiles = raster_call(
            *draw_args,
            unit_cmd_dev, unit_draw_dev,
            prepared.acount, prepared.aclist, prepared.off, prepared.g_off,
            prepared.bulk, prepared.cls, prepared.hbits,
            prepared.tri_f, prepared.tri_i,
            prepared.g_tri_f, prepared.g_tri_i,
            desc_f, desc_i,
        )
        if out_u8 and strips == 1:
            # (H', W') int32 → (H, W, 4) uint8: a pure bitcast view of
            # the little-endian RGBA quads; no data movement.
            return jax.lax.bitcast_convert_type(
                tiles[:H, :W], jnp.uint8
            )
        if out_u8:
            # De-strip: lane l of row r is screen pixel
            # ((l // lw)·th + r, l % lw) within the tile's footprint.
            image = tiles.reshape(nty, ntx, th, strips, lw)
            image = image.transpose(0, 3, 2, 1, 4).reshape(
                nty * lh, ntx * lw
            )
            return jax.lax.bitcast_convert_type(
                image[:H, :W], jnp.uint8
            )
        image = tiles.reshape(nty, ntx, 4, th, strips, lw)
        image = image.transpose(0, 4, 3, 1, 5, 2).reshape(
            nty * lh, ntx * lw, 4
        )
        return image[:H, :W]

    rasterize.raw_call = raster_call  # for benchmarks/ablation
    return rasterize
