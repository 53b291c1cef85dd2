"""Off-nominal end-to-end regimes (VERDICT r4 item 8): odd input rates
(44100/22050 — the large-L gather-dot resample regime), dropout bursts,
DC drift, clipping, and clock-rate error, decoded end-to-end with sync
positions and PSNR pinned.  Reference anchor: ``test/test.sh:44-56``'s
rate matrix and the dropout-peak synthesis of ``decode.rs:244-246``.

Default-suite cases run 2-minute passes; the same regimes at full
10-minute length run when ``NOAA_APT_SLOW_TESTS=1`` (nightly).
"""

import math
import os

import numpy as np
import pytest

from noaa_apt_tpu.core.frequency import Rate
from noaa_apt_tpu.core.profiles import STANDARD
from noaa_apt_tpu.graph.decode import Decoder
from noaa_apt_tpu.ops import resample as rs
from noaa_apt_tpu.synth import impair, synth_recording

from test_decode_e2e import IMG_COLS, _align_and_compare

SLOW = os.environ.get("NOAA_APT_SLOW_TESTS") == "1"
N_ROWS = 1200 if SLOW else 240  # 10 min nightly, 2 min default


def _spr(rate_hz: int = 12480) -> int:
    return 2080 * STANDARD.work_rate // 4160


def _sync_spacing_ok(pos):
    """(offsets-from-row-multiple, row-multiples) per spacing.  The
    FIRST spacing is excluded: the ingest filter's warm-up attenuates
    the very first sync pulse, so the initial lock always skips one row
    (a decode startup property, present on clean nominal-rate signals
    too).  Impaired spans may synthesize peaks at sub-row spacings
    (the forced-peak dropout handling, decode.rs:244-246) — callers
    assert the statistics appropriate to their regime."""
    spr = _spr()
    deltas = np.diff(pos)[1:]
    k = np.round(deltas / spr)
    off = np.abs(deltas - k * spr)
    return off, k


@pytest.mark.parametrize("rate_hz", [44100, 22050])
def test_gather_regime_rates(rate_hz):
    """44100/22050 Hz force huge interpolation factors (l=208/416) —
    the gather-dot resample regime (ops/resample.py) — and must decode
    with clean sync tracking and image-area PSNR like the nominal
    rates."""
    g = math.gcd(rate_hz, STANDARD.work_rate)
    l, m = STANDARD.work_rate // g, rate_hz // g
    dec = Decoder(STANDARD)
    filt = dec._ingest_filter(Rate(rate_hz))
    coeff = filt.resample(Rate(rate_hz), Rate(rate_hz * l)).design()
    plan = rs.resample_plan(8 * l, l, m, coeff)
    assert plan.mode == "gather", (rate_hz, plan.mode)  # the regime under test

    sig, pattern = synth_recording(
        n_rows=N_ROWS, sample_rate=rate_hz, noise_db=25.0
    )
    res = dec.decode(sig, Rate(rate_hz), sync=True)
    assert res.n_rows >= N_ROWS - 2
    off, k = _sync_spacing_ok(res.sync_positions)
    assert (k == 1).all(), "no dropouts here: all spacings one row"
    assert off.max() <= 1
    psnr = _align_and_compare(res.image_np(), pattern[: res.n_rows], IMG_COLS)
    assert psnr > 28.0, f"{rate_hz}: image-area PSNR {psnr:.1f}"


def test_dropout_bursts_resync():
    """Deep dropouts (carrier gone) synthesize sync peaks through the
    gap (decode.rs:244-246) and re-lock after; rows outside the bursts
    stay high-PSNR."""
    rate_hz = 11025
    sig, pattern = synth_recording(n_rows=N_ROWS, sample_rate=rate_hz, noise_db=25.0)
    t1, t2 = N_ROWS * 0.15 / 2, N_ROWS * 0.55 / 2  # row 15% and 55%, seconds
    sig = impair(sig, rate_hz, dropouts=[(t1, 3.0), (t2, 5.0)])
    dec = Decoder(STANDARD)
    res = dec.decode(sig, Rate(rate_hz), sync=True)
    assert res.n_rows >= N_ROWS - 4
    off, k = _sync_spacing_ok(res.sync_positions)
    # Most spacings exact one-row; the forced peaks inside each burst
    # are synthesized at scan positions (decode.rs:244-246), so a
    # handful sit off-grid or sub-row — bounded by the burst length.
    assert float(np.mean((k == 1) & (off <= 1))) > 0.9
    # PSNR over rows clear of both bursts (2-row guard).
    rows_bad = set()
    for t0, dur in [(t1, 3.0), (t2, 5.0)]:
        for r in range(int(t0 * 2) - 2, int((t0 + dur) * 2) + 3):
            rows_bad.add(r)
    rows_ok = [r for r in range(res.n_rows) if r not in rows_bad]
    img = res.image_np()[rows_ok]
    pat = pattern[: res.n_rows][rows_ok]
    psnr = _align_and_compare(img, pat, IMG_COLS)
    assert psnr > 26.0, f"clear-region PSNR {psnr:.1f}"


def test_dc_drift_rejected():
    """Slow baseline wander is removed by the DC-removal ingest filter;
    decode quality is unaffected."""
    rate_hz = 11025
    sig, pattern = synth_recording(n_rows=N_ROWS, sample_rate=rate_hz, noise_db=25.0)
    sig = impair(sig, rate_hz, dc_drift=0.5)
    res = Decoder(STANDARD).decode(sig, Rate(rate_hz), sync=True)
    off, k = _sync_spacing_ok(res.sync_positions)
    assert (k == 1).all() and off.max() <= 1
    psnr = _align_and_compare(res.image_np(), pattern[: res.n_rows], IMG_COLS)
    assert psnr > 28.0, f"DC-drift PSNR {psnr:.1f}"


def test_hard_clipping_still_decodes():
    """An overdriven recording (clipped at 55% of peak) distorts the
    envelope but sync tracking and a recognizable image survive."""
    rate_hz = 11025
    sig, pattern = synth_recording(n_rows=N_ROWS, sample_rate=rate_hz, noise_db=25.0)
    sig = impair(sig, rate_hz, clip_frac=0.55)
    res = Decoder(STANDARD).decode(sig, Rate(rate_hz), sync=True)
    assert res.n_rows >= N_ROWS - 2
    off, k = _sync_spacing_ok(res.sync_positions)
    assert float(np.mean((k == 1) & (off <= 1))) > 0.95
    psnr = _align_and_compare(res.image_np(), pattern[: res.n_rows], IMG_COLS)
    assert psnr > 15.0, f"clipped PSNR {psnr:.1f}"


def test_clock_rate_error_tracks():
    """A 200 ppm capture-clock error walks the sync phase ~1.25 work
    samples per row-hundred; the per-row greedy re-lock keeps rows
    aligned (spacing stays within +-1 of one row)."""
    rate_hz = 11025
    sig, pattern = synth_recording(n_rows=N_ROWS, sample_rate=rate_hz, noise_db=25.0)
    sig = impair(sig, rate_hz, rate_error_ppm=200.0)
    res = Decoder(STANDARD).decode(sig, Rate(rate_hz), sync=True)
    assert res.n_rows >= N_ROWS - 3
    off, k = _sync_spacing_ok(res.sync_positions)
    # The degraded template match may drop an isolated peak (a 2-row
    # spacing) or jump tens of samples at a re-lock a few times per
    # pass; the bulk tracks the walking phase within +-2 samples.
    assert float(np.mean(k == 1)) > 0.97
    assert (k <= 2).all()
    assert float(np.median(off)) <= 2
    psnr = _align_and_compare(res.image_np(), pattern[: res.n_rows], IMG_COLS)
    assert psnr > 22.0, f"rate-error PSNR {psnr:.1f}"


@pytest.mark.skipif(not SLOW, reason="full-length nightly regime (NOAA_APT_SLOW_TESTS=1)")
def test_full_length_combined_48k():
    """Nightly: a full 10-minute 48 kHz pass with dropouts + drift +
    mild clipping together — the realistic worst case."""
    rate_hz = 48000
    sig, pattern = synth_recording(n_rows=1200, sample_rate=rate_hz, noise_db=18.0)
    sig = impair(
        sig, rate_hz,
        dropouts=[(60.0, 4.0), (300.0, 8.0)],
        dc_drift=0.3,
        clip_frac=0.8,
    )
    res = Decoder(STANDARD).decode(sig, Rate(rate_hz), sync=True)
    assert res.n_rows >= 1195
    off, k = _sync_spacing_ok(res.sync_positions)
    assert float(np.mean(off <= 1)) > 0.95
    psnr = _align_and_compare(res.image_np(), pattern[: res.n_rows], IMG_COLS)
    assert psnr > 20.0, f"combined PSNR {psnr:.1f}"


def test_large_l_matmul_formulation_matches_gather():
    """The 3-dot blocked matmul the TPU backend uses for large-L pairs
    (gather is catastrophic there — measured 2,170 ms/pass vs ~1 ms)
    computes the same resample as the gather-dot formulation to f32
    reorder noise, at both off-nominal rates."""
    import dataclasses

    import jax
    import numpy as np

    from noaa_apt_tpu.core import LowpassDcRemoval
    from noaa_apt_tpu.core.frequency import Freq

    for rate_hz in (44100, 22050):
        g = math.gcd(rate_hz, STANDARD.work_rate)
        l, m = STANDARD.work_rate // g, rate_hz // g
        filt = LowpassDcRemoval(
            cutout=Freq.hz(4800.0, Rate(rate_hz)),
            atten=30.0,
            delta_w=Freq.hz(1000.0, Rate(rate_hz)),
        )
        coeff = filt.resample(Rate(rate_hz), Rate(rate_hz * l)).design()
        n = 120_000
        x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
        plan_g = dataclasses.replace(
            rs.resample_plan(n, l, m, coeff), mode="gather", j_pack=1
        )
        plan_m = dataclasses.replace(plan_g, mode="matmul")
        yg = np.asarray(jax.jit(lambda v, p=plan_g: rs.fast_resample(v, p))(x))
        ym = np.asarray(jax.jit(lambda v, p=plan_m: rs.fast_resample(v, p))(x))
        rel = np.max(np.abs(yg - ym)) / max(np.max(np.abs(yg)), 1e-9)
        assert rel < 1e-5, (rate_hz, rel)
