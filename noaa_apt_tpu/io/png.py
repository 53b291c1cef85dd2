"""Minimal fast PNG writer for 8-bit grayscale images.

The fleet serving path (``serve.decode_fleet``) writes one PNG per
pass, and on small serving hosts encode is a top-2 host stage.  PIL's
encoder runs a per-scanline filter heuristic before deflate; for the
decoder's noisy satellite imagery the heuristic buys ~20% smaller
files for ~2x the CPU.  This writer emits filter-type-0 scanlines
straight into one zlib stream — decoded pixels are identical (PNG is
lossless either way), only the compression container differs.

No reference counterpart (the reference encodes via the ``image``
crate, one pass per process); single-file CLI output keeps PIL for
byte-compatibility with existing goldens.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_gray_png(img: np.ndarray, level: int = 1) -> bytes:
    """[H, W] uint8 -> PNG bytes (color type 0, bit depth 8,
    filter 0 scanlines, one zlib stream at ``level``)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError(f"expected [H, W] uint8, got {img.shape} {img.dtype}")
    h, w = img.shape
    raw = np.empty((h, w + 1), np.uint8)
    raw[:, 0] = 0  # filter type None per scanline
    raw[:, 1:] = img
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def write_gray_png(path, img: np.ndarray, level: int = 1) -> None:
    Path(path).write_bytes(encode_gray_png(img, level))
