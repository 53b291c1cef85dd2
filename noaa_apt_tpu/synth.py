"""APT signal synthesizer — golden-input generation.

The reference repo's test WAVs are stripped (``.MISSING_LARGE_BLOBS``),
so golden inputs are generated here: build a pixel-exact APT line
structure (sync A/B, space, image, telemetry wedges — layout constants
from ``src/decode.rs:11-38`` and https://www.sigidwiki.com/wiki/APT),
amplitude-modulate it onto the 2400 Hz subcarrier and sample at an
arbitrary rate.  This provides exact ground truth for PSNR and
sync-position assertions.
"""

from __future__ import annotations

import numpy as np

from . import (
    CARRIER_FREQ,
    FINAL_RATE,
    PX_CHANNEL_IMAGE_DATA,
    PX_PER_CHANNEL,
    PX_PER_ROW,
    PX_SPACE_DATA,
    PX_SYNC_FRAME,
)

# Telemetry wedge nominal values (wedges 1..9 fixed for contrast,
# telemetry.rs:129-133).
WEDGE_VALUES = [31.0, 63.0, 95.0, 127.0, 159.0, 191.0, 224.0, 255.0, 0.0]


def sync_a_pixels() -> np.ndarray:
    """Channel-A sync: 1040 Hz square, 2-px pulses (decode.rs:164-199)."""
    px = np.zeros(PX_SYNC_FRAME, dtype=np.float32)
    pat = [0.0] * 2 + ([0.0] * 2 + [255.0] * 2) * 7 + [0.0] * 8
    px[: len(pat)] = pat
    return px


def sync_b_pixels() -> np.ndarray:
    """Channel-B sync: 832 Hz pulse train, 3-px pulses."""
    px = np.zeros(PX_SYNC_FRAME, dtype=np.float32)
    pat = [0.0] * 4 + ([255.0] * 3 + [0.0] * 2) * 7
    px[: len(pat)] = pat
    return px


def telemetry_column(n_rows: int, channel_id_wedge: float, start_frame_row: int = 0) -> np.ndarray:
    """Per-row telemetry luminance for one channel.

    16 wedges x 8 rows per 128-row frame; wedges 1-9 are the contrast
    staircase, 10-15 sensor data (synthesized as a fixed ramp), 16 the
    channel-identification value.
    """
    frame = np.zeros(128, dtype=np.float32)
    vals = WEDGE_VALUES + [30.0, 60.0, 90.0, 120.0, 150.0, 180.0, channel_id_wedge]
    for w, v in enumerate(vals):
        frame[w * 8 : (w + 1) * 8] = v
    reps = -(-(n_rows + start_frame_row) // 128) + 1
    col = np.tile(frame, reps)
    return col[start_frame_row : start_frame_row + n_rows]


def apt_pattern(
    n_rows: int,
    image_a: np.ndarray | None = None,
    image_b: np.ndarray | None = None,
    channel_a_id: float = 63.0,  # "2"
    channel_b_id: float = 127.0,  # "4"
    telemetry_start_row: int = 0,
) -> np.ndarray:
    """Build a full [n_rows, 2080] luminance matrix (values 0..255)."""
    if image_a is None:
        x = np.linspace(0, 255, PX_CHANNEL_IMAGE_DATA, dtype=np.float32)
        image_a = np.tile(x, (n_rows, 1))
    if image_b is None:
        y = np.linspace(255, 0, PX_CHANNEL_IMAGE_DATA, dtype=np.float32)
        image_b = np.tile(y, (n_rows, 1))
    assert image_a.shape == (n_rows, PX_CHANNEL_IMAGE_DATA)
    assert image_b.shape == (n_rows, PX_CHANNEL_IMAGE_DATA)

    rows = np.zeros((n_rows, PX_PER_ROW), dtype=np.float32)
    x0 = PX_SYNC_FRAME + PX_SPACE_DATA
    # Channel A
    rows[:, :PX_SYNC_FRAME] = sync_a_pixels()
    rows[:, PX_SYNC_FRAME:x0] = 0.0  # deep space (dark)
    rows[:, x0 : x0 + PX_CHANNEL_IMAGE_DATA] = image_a
    rows[:, x0 + PX_CHANNEL_IMAGE_DATA : PX_PER_CHANNEL] = telemetry_column(
        n_rows, channel_a_id, telemetry_start_row
    )[:, None]
    # Channel B
    b0 = PX_PER_CHANNEL
    rows[:, b0 : b0 + PX_SYNC_FRAME] = sync_b_pixels()
    rows[:, b0 + PX_SYNC_FRAME : b0 + PX_SYNC_FRAME + PX_SPACE_DATA] = 255.0
    rows[:, b0 + x0 : b0 + x0 + PX_CHANNEL_IMAGE_DATA] = image_b
    rows[:, b0 + x0 + PX_CHANNEL_IMAGE_DATA :] = telemetry_column(
        n_rows, channel_b_id, telemetry_start_row
    )[:, None]
    return rows


def modulate(
    pattern: np.ndarray,
    sample_rate: int,
    amp_low: float = 0.2,
    amp_high: float = 1.0,
    noise_db: float | None = None,
    seed: int = 0,
) -> np.ndarray:
    """AM-modulate a [rows, 2080] pattern onto the 2400 Hz subcarrier.

    Luminance 0 maps to carrier amplitude ``amp_low``, 255 to
    ``amp_high`` (envelope detection needs a nonzero carrier floor).
    Piecewise-constant amplitude per pixel, sampled at ``sample_rate``.
    """
    flat = pattern.reshape(-1).astype(np.float64)
    n_px = flat.shape[0]
    duration = n_px / FINAL_RATE
    n = int(duration * sample_rate)
    t = np.arange(n, dtype=np.float64) / sample_rate
    px = np.minimum((t * FINAL_RATE).astype(np.int64), n_px - 1)
    amp = amp_low + (amp_high - amp_low) * flat[px] / 255.0
    sig = amp * np.cos(2 * np.pi * CARRIER_FREQ * t)
    if noise_db is not None:
        rng = np.random.default_rng(seed)
        p_sig = np.mean(sig**2)
        p_noise = p_sig / (10 ** (noise_db / 10))
        sig = sig + rng.normal(0.0, np.sqrt(p_noise), n)
    return sig.astype(np.float32)


def impair(
    signal: np.ndarray,
    sample_rate: int,
    dropouts: "list[tuple[float, float]] | None" = None,
    dc_drift: float = 0.0,
    clip_frac: float | None = None,
    rate_error_ppm: float = 0.0,
    seed: int = 0,
) -> np.ndarray:
    """Apply channel impairments a real ground station sees.

    ``dropouts``: list of (start_s, duration_s) spans replaced by
    receiver noise floor (no carrier — the regime where the reference
    synthesizes missed sync peaks, ``decode.rs:244-246``).
    ``dc_drift``: peak amplitude (fraction of signal peak) of a slow
    baseline wander (0.1 Hz sine + linear ramp) — exercises the
    DC-removal ingest filter (``filters.rs:97-139``).
    ``clip_frac``: hard-clip at this fraction of the original peak
    (overdriven soundcard).
    ``rate_error_ppm``: resample by (1 + ppm*1e-6) without telling the
    decoder — a doppler-ish/soundcard-clock rate error that slowly
    walks the sync phase.
    """
    sig = signal.astype(np.float64).copy()
    peak = np.abs(sig).max() or 1.0
    rng = np.random.default_rng(seed + 1)
    if dropouts:
        floor = 0.02 * peak
        for start_s, dur_s in dropouts:
            a = min(len(sig), max(0, int(start_s * sample_rate)))
            b = min(len(sig), a + max(0, int(dur_s * sample_rate)))
            if b > a:  # spans past the recording are clamped/ignored
                sig[a:b] = rng.normal(0.0, floor, b - a)
    if dc_drift and len(sig) > 1:
        t = np.arange(len(sig)) / sample_rate
        sig += dc_drift * peak * (
            0.6 * np.sin(2 * np.pi * 0.1 * t) + 0.4 * t / t[-1]
        )
    if clip_frac is not None:
        lim = clip_frac * peak
        sig = np.clip(sig, -lim, lim)
    if rate_error_ppm:
        n = len(sig)
        src = np.arange(n, dtype=np.float64) * (1.0 + rate_error_ppm * 1e-6)
        i0 = np.minimum(src.astype(np.int64), n - 1)
        i1 = np.minimum(i0 + 1, n - 1)
        frac = src - i0
        sig = sig[i0] * (1 - frac) + sig[i1] * frac
    return sig.astype(np.float32)


def synth_recording(
    n_rows: int = 128,
    sample_rate: int = 11025,
    noise_db: float | None = None,
    seed: int = 0,
    **kwargs,
) -> tuple[np.ndarray, np.ndarray]:
    """Convenience: (signal at sample_rate, ground-truth pattern)."""
    pattern = apt_pattern(n_rows, **kwargs)
    return modulate(pattern, sample_rate, noise_db=noise_db, seed=seed), pattern
