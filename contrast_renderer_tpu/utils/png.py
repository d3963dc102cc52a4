"""Minimal PNG writer (pure Python, zlib only).

Replaces the reference's windowing/present path for offline frame
output — there is no surface to present to on a TPU host, so frames go
to RGBA PNG files (SURVEY §2 crate-replacement table: winit → frame
driver)."""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def write_png(path: str, image: np.ndarray) -> None:
    """Write an (H, W, 4) float [0,1] or uint8 RGBA image as PNG."""
    image = np.asarray(image)
    if image.dtype != np.uint8:
        image = (np.clip(image, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if image.ndim == 2:
        image = np.repeat(image[..., None], 3, axis=-1)
    if image.shape[-1] == 3:
        image = np.concatenate(
            [image, np.full(image.shape[:-1] + (1,), 255, np.uint8)], axis=-1
        )
    height, width = image.shape[:2]
    raw = b"".join(
        b"\x00" + image[y].tobytes() for y in range(height)
    )
    header = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", header)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )
    with open(path, "wb") as fh:
        fh.write(data)


def unpremultiply(image: np.ndarray) -> np.ndarray:
    """Convert premultiplied RGBA float to straight RGBA."""
    image = np.asarray(image, np.float32)
    alpha = image[..., 3:4]
    rgb = np.where(alpha > 0, image[..., :3] / np.maximum(alpha, 1e-6), 0.0)
    return np.concatenate([rgb, alpha], axis=-1)
