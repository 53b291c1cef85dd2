"""Histogram equalization utilities (grayscale and Lab-color).

Behavioral contract: reference ``src/imageext.rs`` (via the ``image``
and ``lab`` crates): grayscale equalization maps each pixel to
``trunc(255 * cdf[r]/total)`` using the R-channel histogram; color
equalization converts sRGB -> CIE Lab (D65), equalizes the L channel
over 101 integer bins, and converts back.  Vectorized NumPy (the Rust
code is a per-pixel loop).
"""

from __future__ import annotations

import numpy as np

# sRGB <-> linear <-> XYZ (D65) <-> Lab, standard CIE formulas — the
# same math (and the same Lindbloom matrix constants) the `lab` crate
# v0.11 implements (imageext.rs:50-92 contract).  Computed in f32 like
# the crate, with Rust's half-away-from-zero rounding for the final u8
# (np.round would use banker's rounding: 122.5 -> 122 vs Rust's 123).
# Exact op-order parity with the crate is best-effort — its source is
# not vendored here — but dtype and rounding-mode now match.

_M_RGB2XYZ = np.array(
    [
        [0.4124108464885388, 0.3575845678529519, 0.18045380393360833],
        [0.21264934272065283, 0.7151691357059038, 0.07218152157344333],
        [0.019331758429150258, 0.11919485595098397, 0.9503900340503373],
    ],
    dtype=np.float32,
)
_M_XYZ2RGB = np.linalg.inv(_M_RGB2XYZ.astype(np.float64)).astype(np.float32)
_WHITE = np.array(
    [0.9504492182750991, 1.0, 1.0889166484304715], dtype=np.float32
)
_EPS = np.float32((6.0 / 29.0) ** 3)


def _srgb_to_linear(c: np.ndarray) -> np.ndarray:
    c = c / np.float32(255.0)
    return np.where(
        c <= np.float32(0.04045),
        c / np.float32(12.92),
        ((c + np.float32(0.055)) / np.float32(1.055)) ** np.float32(2.4),
    )


def _linear_to_srgb(c: np.ndarray) -> np.ndarray:
    c = np.where(
        c <= np.float32(0.0031308),
        c * np.float32(12.92),
        np.float32(1.055) * np.maximum(c, np.float32(0.0)) ** np.float32(1 / 2.4)
        - np.float32(0.055),
    )
    # Rust `.round()` is half away from zero; values are clamped
    # non-negative so floor(x + 0.5) implements it.
    return np.clip(np.floor(c * np.float32(255.0) + np.float32(0.5)), 0, 255)


def _f(t: np.ndarray) -> np.ndarray:
    return np.where(
        t > _EPS,
        np.cbrt(t),
        t / np.float32(3 * (6.0 / 29.0) ** 2) + np.float32(4.0 / 29.0),
    )


def _f_inv(t: np.ndarray) -> np.ndarray:
    return np.where(
        t > np.float32(6.0 / 29.0),
        t**3,
        np.float32(3 * (6.0 / 29.0) ** 2) * (t - np.float32(4.0 / 29.0)),
    )


def rgb_to_lab(rgb: np.ndarray) -> np.ndarray:
    """[..., 3] u8 sRGB -> [..., 3] f32 Lab (L in 0..100)."""
    lin = _srgb_to_linear(rgb.astype(np.float32))
    xyz = lin @ _M_RGB2XYZ.T
    fxyz = _f(xyz / _WHITE)
    l = np.float32(116.0) * fxyz[..., 1] - np.float32(16.0)
    a = np.float32(500.0) * (fxyz[..., 0] - fxyz[..., 1])
    b = np.float32(200.0) * (fxyz[..., 1] - fxyz[..., 2])
    return np.stack([l, a, b], axis=-1)


def lab_to_rgb(lab: np.ndarray) -> np.ndarray:
    """[..., 3] f32 Lab -> [..., 3] u8 sRGB."""
    lab = lab.astype(np.float32, copy=False)
    l, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (l + np.float32(16.0)) / np.float32(116.0)
    fx = fy + a / np.float32(500.0)
    fz = fy - b / np.float32(200.0)
    xyz = np.stack([_f_inv(fx), _f_inv(fy), _f_inv(fz)], axis=-1) * _WHITE
    lin = xyz @ _M_XYZ2RGB.T
    return _linear_to_srgb(lin).astype(np.uint8)


def equalize_histogram_grayscale(region: np.ndarray) -> None:
    """In place, on an RGBA u8 view: R-channel CDF drives all of RGB;
    alpha untouched (imageext.rs:23-46)."""
    r = region[..., 0]
    hist = np.bincount(r.reshape(-1), minlength=256).astype(np.uint64)
    cdf = np.cumsum(hist)
    total = np.float32(cdf[255])
    # (255 * fraction) as u8 — Rust cast truncates toward zero.
    lut = np.trunc(np.float32(255.0) * (cdf.astype(np.float32) / total)).astype(np.uint8)
    region[..., 0] = lut[r]
    region[..., 1] = region[..., 0]
    region[..., 2] = region[..., 0]


def equalize_histogram_color(region: np.ndarray) -> None:
    """In place, on an RGBA u8 view: equalize L in Lab space over 101
    integer bins (imageext.rs:50-92)."""
    lab = rgb_to_lab(region[..., :3])
    l_idx = np.clip(lab[..., 0].astype(np.int64), 0, 100)  # trunc toward 0
    hist = np.bincount(l_idx.reshape(-1), minlength=101)
    cdf = np.cumsum(hist)
    total = np.float32(cdf[100])
    frac = cdf.astype(np.float32) / total
    lab[..., 0] = 100.0 * frac[l_idx]
    region[..., :3] = lab_to_rgb(lab)
