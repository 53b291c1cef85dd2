"""End-to-end decode of synthesized APT recordings (the reference's
integration-test analog, with actual assertions instead of eyeballing:
SURVEY.md section 4 implication (d)).

Fidelity is asserted two ways:
- PSNR after optimal sub-pixel alignment + affine (gain/bias) fit,
  over the full frame and — much tighter — over the channel image
  areas, where the only error source is the decode chain itself (the
  sync/telemetry columns are square waves whose band-limited ringing
  puts a physics ceiling on full-frame PSNR).
- A pinned golden image (tests/golden/) decoded from a fixed seed and
  asserted byte-exact, catching any numeric drift between rounds that
  PSNR bands would absorb.
"""

from pathlib import Path

import numpy as np
import pytest

from noaa_apt_tpu import PX_PER_ROW, FINAL_RATE
from noaa_apt_tpu.core.frequency import Rate
from noaa_apt_tpu.core.profiles import FAST, SLOW, STANDARD
from noaa_apt_tpu.err import InternalError
from noaa_apt_tpu.graph.decode import Decoder
from noaa_apt_tpu.synth import synth_recording

GOLDEN_DIR = Path(__file__).parent / "golden"

# Channel A/B image areas with a small margin off the area edges
# (x offset 86, width 909 per channel: processing.rs:21-37).
IMG_COLS = np.r_[86 + 8 : 995 - 8, 1040 + 86 + 8 : 1040 + 995 - 8]


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse > 0 else np.inf


def _frac_shift(img: np.ndarray, s: float) -> np.ndarray:
    n = img.shape[1]
    xs = np.arange(n) + s
    return np.stack([np.interp(xs, np.arange(n), row) for row in img])


def _align_and_compare(img: np.ndarray, pattern: np.ndarray, cols=None) -> float:
    """Decoded rows start at the sync-pulse position shifted by the
    post-demod filter group delay; find the best sub-pixel column shift
    and affine (gain/bias) map, then PSNR over ``cols`` (default: full
    rows minus roll-wrap margins)."""
    img = img.astype(np.float64)
    pattern = pattern.astype(np.float64)
    row_mean = img[2:-2].mean(axis=0)
    pat_mean = pattern[2:-2].mean(axis=0)
    shifts = np.arange(-12, 13)
    scores = [np.corrcoef(np.roll(row_mean, -s), pat_mean)[0, 1] for s in shifts]
    s0 = int(shifts[int(np.argmax(scores))])
    if cols is None:
        cols = np.arange(16, img.shape[1] - 16)
    best = -np.inf
    for ds in np.arange(-1.0, 1.01, 0.125):
        shifted = _frac_shift(img, s0 + ds)
        n = min(shifted.shape[0], pattern.shape[0]) - 4
        a_flat = shifted[2 : 2 + n][:, cols].ravel()
        b_flat = pattern[2 : 2 + n][:, cols].ravel()
        gain, bias = np.polyfit(a_flat, b_flat, 1)
        best = max(best, _psnr(np.clip(gain * a_flat + bias, 0, 255), b_flat))
    return best


@pytest.mark.parametrize(
    "rate,profile", [(11025, STANDARD), (48000, FAST), (48000, SLOW)]
)
def test_decode_clean_signal(rate, profile):
    n_rows = 40
    signal, pattern = synth_recording(n_rows=n_rows, sample_rate=rate)
    dec = Decoder(profile)
    res = dec.decode(signal, Rate(rate), sync=True)

    assert res.n_rows >= n_rows - 2
    img = res.image_np()
    assert img.shape[1] == PX_PER_ROW

    # Clean signal: consecutive sync positions must be exactly one row
    # apart at the work rate.
    spr = dec.samples_per_work_row
    pos = np.array(res.sync_positions)
    diffs = np.diff(pos[1:-1])  # first interval may include start garbage
    assert np.all(np.abs(diffs - spr) <= 1), diffs

    pat = pattern[: res.n_rows]
    full = _align_and_compare(img, pat)
    assert full > 27.0, f"full-frame PSNR {full:.1f}"
    image_area = _align_and_compare(img, pat, IMG_COLS)
    assert image_area > 45.0, f"image-area PSNR {image_area:.1f}"


def test_decode_noisy_signal():
    signal, pattern = synth_recording(n_rows=32, sample_rate=11025, noise_db=10.0)
    dec = Decoder(STANDARD)
    res = dec.decode(signal, Rate(11025), sync=True)
    assert res.n_rows >= 28
    psnr = _align_and_compare(res.image_np(), pattern[: res.n_rows], IMG_COLS)
    assert psnr > 17.0, f"noisy image-area PSNR {psnr:.1f}"


def test_decode_no_sync_path():
    signal, _ = synth_recording(n_rows=16, sample_rate=11025)
    dec = Decoder(STANDARD)
    res = dec.decode(signal, Rate(11025), sync=False)
    assert res.sync_positions is None
    assert res.n_rows >= 15
    assert res.image_np()[0, 0] == 0.0  # NoFilter causal-path quirk


def test_decode_too_short_errors():
    signal, _ = synth_recording(n_rows=4, sample_rate=11025)
    dec = Decoder(STANDARD)
    with pytest.raises(InternalError, match="less than 10 rows"):
        dec.decode(signal, Rate(11025), sync=True)


def test_decode_deterministic():
    signal, _ = synth_recording(n_rows=16, sample_rate=11025)
    dec = Decoder(STANDARD)
    a = dec.decode(signal, Rate(11025)).image_np()
    b = dec.decode(signal, Rate(11025)).image_np()
    np.testing.assert_array_equal(a, b)


GOLDEN_COMBOS = {
    "decode_11025_standard": (STANDARD, 11025),
    "decode_48000_fast": (FAST, 48000),
    "decode_48000_slow": (SLOW, 48000),
}


def golden_decode(profile, rate_hz: int) -> tuple[np.ndarray, list[int]]:
    """The fixed decode a golden image pins: 24 rows, clean signal,
    percent contrast rendered u8 on device."""
    signal, _ = synth_recording(n_rows=24, sample_rate=rate_hz)
    dec = Decoder(profile)
    res = dec.decode(signal, Rate(rate_hz), sync=True)
    return dec.render_u8(res, "percent"), res.sync_positions


@pytest.mark.parametrize("name", sorted(GOLDEN_COMBOS))
def test_decode_golden_image(name):
    """Byte-exact regression pin (VERDICT r1 item 7), one per profile:
    the committed u8 PNG must be reproduced exactly, sync positions
    included.  If a numeric change is *intended*, regenerate with
    ``python -m tests.test_decode_e2e`` and justify in the commit."""
    from PIL import Image

    golden_png = GOLDEN_DIR / f"{name}.png"
    golden_sync = GOLDEN_DIR / f"{name}.sync.txt"
    assert golden_png.exists(), "golden image missing; run python -m tests.test_decode_e2e"
    u8, sync_pos = golden_decode(*GOLDEN_COMBOS[name])
    want = np.asarray(Image.open(golden_png))
    np.testing.assert_array_equal(u8, want)
    assert sync_pos == [int(x) for x in golden_sync.read_text().split()]


if __name__ == "__main__":
    # Regenerate the golden artifacts.
    from PIL import Image

    GOLDEN_DIR.mkdir(exist_ok=True)
    for name, (profile, rate_hz) in GOLDEN_COMBOS.items():
        u8, sync_pos = golden_decode(profile, rate_hz)
        Image.fromarray(u8).save(GOLDEN_DIR / f"{name}.png")
        (GOLDEN_DIR / f"{name}.sync.txt").write_text(
            " ".join(str(p) for p in sync_pos) + "\n"
        )
        print(f"wrote golden {name} {u8.shape} with {len(sync_pos)} sync positions")


def test_host16_quantized_ingest_near_lossless():
    """ingest="host16" ships the work signal as i16+scale (half the
    link bytes); the decoded image must be visually identical to the
    f32 host-ingest path (>= 60 dB PSNR, i.e. far below the u8
    quantization floor) and sync positions must not move."""
    signal, _ = synth_recording(n_rows=24, sample_rate=48000, noise_db=15.0)
    sig_i16 = np.clip(
        np.round(signal / np.abs(signal).max() * 32767), -32768, 32767
    ).astype(np.int16)

    dec32 = Decoder(STANDARD, ingest="host")
    dec16 = Decoder(STANDARD, ingest="host16")
    r32 = dec32.decode(sig_i16, Rate(48000))
    r16 = dec16.decode(sig_i16, Rate(48000))
    assert r16.sync_positions == r32.sync_positions
    a, b = r32.image_np(), r16.image_np()
    scale = max(np.abs(a).max(), 1e-9)
    mse = np.mean(((a - b) / scale * 255.0) ** 2)
    psnr = 10 * np.log10(255.0**2 / mse) if mse > 0 else np.inf
    assert psnr > 60.0, f"host16 PSNR vs f32 ingest: {psnr:.1f} dB"


def test_host8_quantized_ingest_lossy_but_faithful():
    """ingest="host8" ships the work signal as i8+scale (a QUARTER of
    the f32 link bytes, ~42 dB SNR) — the lossy serving mode for
    upload-starved links.  Contract: sync positions must not move on a
    clean recording, and the decoded image must stay >= 40 dB PSNR vs
    the exact f32 host-ingest path (sub-LSB at u8 for most pixels,
    below the channel noise real APT recordings carry)."""
    signal, _ = synth_recording(n_rows=24, sample_rate=48000, noise_db=15.0)
    sig_i16 = np.clip(
        np.round(signal / np.abs(signal).max() * 32767), -32768, 32767
    ).astype(np.int16)

    dec32 = Decoder(STANDARD, ingest="host")
    dec8 = Decoder(STANDARD, ingest="host8")
    r32 = dec32.decode(sig_i16, Rate(48000))
    r8 = dec8.decode(sig_i16, Rate(48000))
    payload = dec8.prepare_work(sig_i16, Rate(48000))
    assert payload is not None and payload.data.dtype == np.int8
    assert r8.sync_positions == r32.sync_positions
    a, b = r32.image_np(), r8.image_np()
    scale = max(np.abs(a).max(), 1e-9)
    mse = np.mean(((a - b) / scale * 255.0) ** 2)
    psnr = 10 * np.log10(255.0**2 / mse) if mse > 0 else np.inf
    assert psnr > 40.0, f"host8 PSNR vs f32 ingest: {psnr:.1f} dB"


def test_work_payload_device_preupload_matches():
    """A loader thread can pad + upload the work signal ahead of time
    (WorkPayload with a device array); decode must accept it and match
    the host-array path exactly."""
    import jax.numpy as jnp

    signal, _ = synth_recording(n_rows=16, sample_rate=11025)
    dec = Decoder(STANDARD, ingest="host")
    direct = dec.decode(signal, Rate(11025))

    payload = dec.prepare_work(signal, Rate(11025), to_device=True)
    assert payload is not None and payload.inv_scale is None
    pre = dec.decode(signal, Rate(11025), host_work=payload)
    assert pre.sync_positions == direct.sync_positions
    np.testing.assert_array_equal(direct.image_np(), pre.image_np())

    q = dec.prepare_work(signal, Rate(11025), quantize=True, to_device=True)
    assert q.inv_scale is not None
    assert q.data.dtype == jnp.int16
    res_q = dec.decode(signal, Rate(11025), host_work=q)
    assert res_q.n_rows == direct.n_rows


@pytest.mark.parametrize("kind", ["percent", "minmax"])
def test_fused_render_matches_two_step(kind):
    """The single-round-trip serving path (decode_render) must produce
    byte-identical u8 rows and identical sync positions to the regular
    decode() + render_u8() pipeline, including the device percent
    bucket-scan vs the host sequential scan."""
    signal, _ = synth_recording(n_rows=20, sample_rate=48000, noise_db=14.0)
    dec = Decoder(STANDARD, ingest="host")
    res = dec.decode(signal, Rate(48000))
    want = dec.render_u8(res, kind)

    payload = dec.prepare_work(signal, Rate(48000))
    gray, sync_pos = dec.decode_render(payload, contrast_kind=kind)
    assert sync_pos == res.sync_positions
    assert gray.shape == want.shape
    np.testing.assert_array_equal(gray, want)


def test_fused_render_deferred_fetch_equivalent():
    """fetch=False returns a PendingRender whose .get() (possibly from
    another thread) equals the eager result — the fleet pipeline's
    dispatch/fetch overlap must not change a single byte."""
    import threading

    from noaa_apt_tpu.graph.decode import PendingRender

    signal, _ = synth_recording(n_rows=16, sample_rate=48000, noise_db=14.0)
    dec = Decoder(STANDARD, ingest="host")
    payload = dec.prepare_work(signal, Rate(48000))
    want_gray, want_sync = dec.decode_render(payload, contrast_kind="percent")

    pending = dec.decode_render(payload, contrast_kind="percent", fetch=False)
    assert isinstance(pending, PendingRender)
    out = {}
    t = threading.Thread(target=lambda: out.update(zip(("g", "s"), pending.get())))
    t.start()
    t.join(120)
    assert out["s"] == want_sync
    np.testing.assert_array_equal(out["g"], want_gray)

    sig_i16 = np.clip(
        np.round(signal / np.abs(signal).max() * 32767), -32768, 32767
    ).astype(np.int16)
    dec2 = Decoder(STANDARD)
    want2 = dec2.decode_render_input(sig_i16, len(sig_i16), Rate(48000))
    pending2 = dec2.decode_render_input(sig_i16, len(sig_i16), Rate(48000), fetch=False)
    got2 = pending2.get()
    assert got2[1] == want2[1]
    np.testing.assert_array_equal(got2[0], want2[0])


def test_fused_render_quantized_payload():
    signal, _ = synth_recording(n_rows=16, sample_rate=11025)
    dec = Decoder(STANDARD, ingest="host16")
    payload = dec.prepare_work(signal, Rate(11025), quantize=True, to_device=True)
    gray, sync_pos = dec.decode_render(payload)
    assert gray.shape[1] == PX_PER_ROW
    assert gray.shape[0] >= 14
    assert len(sync_pos) >= 15


def test_fused_render_input_matches_two_step():
    """The raw-input fused path (device-resident polyphase included)
    must be byte-identical to decode() + render_u8()."""
    signal, _ = synth_recording(n_rows=20, sample_rate=48000, noise_db=14.0)
    sig_i16 = np.clip(
        np.round(signal / np.abs(signal).max() * 32767), -32768, 32767
    ).astype(np.int16)
    dec = Decoder(STANDARD)
    res = dec.decode(sig_i16, Rate(48000))
    want = dec.render_u8(res, "percent")
    gray, sync_pos = dec.decode_render_input(sig_i16, len(sig_i16), Rate(48000))
    assert sync_pos == res.sync_positions
    np.testing.assert_array_equal(gray, want)


def test_fused_render_telemetry_matches_two_step():
    """The telemetry-contrast fused serving path (image resident, wedge
    math on host between two small fetches) must be byte-identical to
    decode() + telemetry_stats() + render_u8_levels()."""
    from noaa_apt_tpu.post.telemetry import telemetry_from_stats

    signal, _ = synth_recording(n_rows=440, sample_rate=11025)
    dec = Decoder(STANDARD, ingest="host")
    res = dec.decode(signal, Rate(11025))
    ma, mb, var = dec.telemetry_stats(res)
    tel = telemetry_from_stats(ma, mb, var)
    want = dec.render_u8_levels(
        res, tel.get_wedge_value(9, None), tel.get_wedge_value(8, None)
    )

    payload = dec.prepare_work(signal, Rate(11025))
    gray, sync_pos = dec.decode_render(payload, contrast_kind="telemetry")
    assert sync_pos == res.sync_positions
    np.testing.assert_array_equal(gray, want)

    # Raw-input fused path (device polyphase included).
    gray2, sync2 = dec.decode_render_input(
        signal, len(signal), Rate(11025), contrast_kind="telemetry"
    )
    assert sync2 == res.sync_positions
    np.testing.assert_array_equal(gray2, want)


def test_batched_fused_telemetry_isolates_short_member():
    """Batched telemetry render: per-pass wedge levels, and a member
    too short for telemetry decoding yields an error entry without
    failing its batchmates."""
    from noaa_apt_tpu.err import AptError

    dec = Decoder(STANDARD)
    rows = (408, 104)  # second is >= 10 rows but < the 200-row telemetry frame span
    sigs, trues = [], []
    for i, r in enumerate(rows):
        s, _ = synth_recording(n_rows=r, sample_rate=11025, seed=i)
        sigs.append(s)
        trues.append(len(s))
    got = dec.decode_render_input_batch(
        sigs, trues, Rate(11025), contrast_kind="telemetry"
    )
    assert len(got) == 2
    want_gray, want_sync = dec.decode_render_input(
        sigs[0], trues[0], Rate(11025), contrast_kind="telemetry"
    )
    gray, sync_pos = got[0]
    assert sync_pos == want_sync
    np.testing.assert_array_equal(gray, want_gray)
    assert isinstance(got[1], AptError) and "too short" in str(got[1])


def test_batched_fused_render_matches_unbatched():
    """One vmapped dispatch over a mixed-length batch must reproduce
    each pass's unbatched fused render byte-for-byte (the batch pads
    everyone to the largest member's bucket; zero padding = the
    reference's out-of-range skip, so values are unaffected)."""
    from noaa_apt_tpu.graph.decode import PendingRenderBatch

    dec = Decoder(STANDARD)
    sigs, trues = [], []
    for i, rows in enumerate((20, 16, 24)):
        s, _ = synth_recording(n_rows=rows, sample_rate=48000, noise_db=13.0, seed=i)
        s16 = np.clip(
            np.round(s / np.abs(s).max() * 32767), -32768, 32767
        ).astype(np.int16)
        sigs.append(s16)
        trues.append(len(s16))

    got = dec.decode_render_input_batch(sigs, trues, Rate(48000))
    assert len(got) == 3
    for s16, nt, out in zip(sigs, trues, got):
        want_gray, want_sync = dec.decode_render_input(s16, nt, Rate(48000))
        gray, sync_pos = out
        assert sync_pos == want_sync
        np.testing.assert_array_equal(gray, want_gray)

    # Deferred-fetch variant returns the same thing.
    pending = dec.decode_render_input_batch(sigs, trues, Rate(48000), fetch=False)
    assert isinstance(pending, PendingRenderBatch)
    got2 = pending.get()
    for a, b in zip(got, got2):
        assert a[1] == b[1]
        np.testing.assert_array_equal(a[0], b[0])


def test_batched_fused_render_isolates_too_short_member():
    """A member too short to decode at all (< 10 rows) becomes an error
    ENTRY at its original index; batchmates decode normally (previously
    one short member failed the whole batch)."""
    from noaa_apt_tpu.err import AptError

    dec = Decoder(STANDARD)
    good, _ = synth_recording(n_rows=16, sample_rate=11025, seed=0)
    tiny, _ = synth_recording(n_rows=12, sample_rate=11025, seed=1)
    tiny = tiny[: 11025 * 2]  # ~4 rows of audio: under the 10-row guard
    sigs = [good, tiny, good]
    trues = [len(s) for s in sigs]

    got = dec.decode_render_input_batch(sigs, trues, Rate(11025))
    assert len(got) == 3
    assert isinstance(got[1], AptError) and "too short" in str(got[1])
    want_gray, want_sync = dec.decode_render_input(good, len(good), Rate(11025))
    for idx in (0, 2):
        gray, sync_pos = got[idx]
        assert sync_pos == want_sync
        np.testing.assert_array_equal(gray, want_gray)

    # Deferred variant splices identically; all-short batch is all errors.
    pending = dec.decode_render_input_batch(sigs, trues, Rate(11025), fetch=False)
    got2 = pending.get()
    assert isinstance(got2[1], AptError)
    np.testing.assert_array_equal(got2[0][0], want_gray)

    all_short = dec.decode_render_input_batch([tiny, tiny], [len(tiny)] * 2, Rate(11025))
    assert all(isinstance(g, AptError) for g in all_short)


def test_fused_native_ingest_matches_numpy():
    """The one-call C++ serving ingest (i16 PCM -> streamed polyphase
    -> i16 quantize, prepare_work's fast path) must be bit-identical
    to the numpy host16 pipeline it replaced."""
    from noaa_apt_tpu.graph.decode import pad_bucket
    from noaa_apt_tpu.native import ingest_i16_native

    signal, _ = synth_recording(n_rows=18, sample_rate=48000, noise_db=15.0)
    sig_i16 = np.clip(
        np.round(signal / np.abs(signal).max() * 32767), -32768, 32767
    ).astype(np.int16)
    dec = Decoder(STANDARD, ingest="host16")

    plan = dec._ingest_plan(Rate(48000), len(sig_i16))
    assert plan is not None
    l, m, coeff, out_len = plan
    fused = ingest_i16_native(sig_i16, l, m, coeff, out_len, pad_bucket(out_len))
    if fused is None:
        pytest.skip("native library unavailable")
    buf, inv_scale = fused

    # The pre-fusion numpy pipeline, step by step.
    work = dec._host_ingest(sig_i16, Rate(48000), exact=False)
    peak = float(np.max(np.abs(work))) or 1.0
    scale = np.float32(32767.0 / peak)
    want = np.round(work * scale).astype(np.int16)
    want_inv = float(np.float32(1.0) / scale)

    assert buf.shape[0] == pad_bucket(out_len)
    np.testing.assert_array_equal(buf[:out_len], want)
    assert not buf[out_len:].any()
    assert inv_scale == want_inv

    # prepare_work routes int16 input through the fused kernel.
    payload = dec.prepare_work(sig_i16, Rate(48000), to_device=False)
    assert payload.inv_scale == want_inv
    np.testing.assert_array_equal(np.asarray(payload.data), want)


def test_fused_native_ingest_i8_matches_numpy():
    """The C++ fused ingest's i8 variant (the host8 mode's fast path)
    must be bit-identical to the numpy i8 pipeline: same dot kernel,
    np.float32(127/peak) scale, round-half-even quantizer."""
    from noaa_apt_tpu.graph.decode import pad_bucket
    from noaa_apt_tpu.native import ingest_i16_native

    signal, _ = synth_recording(n_rows=18, sample_rate=48000, noise_db=15.0)
    sig_i16 = np.clip(
        np.round(signal / np.abs(signal).max() * 32767), -32768, 32767
    ).astype(np.int16)
    dec = Decoder(STANDARD, ingest="host8")

    plan = dec._ingest_plan(Rate(48000), len(sig_i16))
    assert plan is not None
    l, m, coeff, out_len = plan
    fused = ingest_i16_native(sig_i16, l, m, coeff, out_len, pad_bucket(out_len), bits=8)
    if fused is None:
        pytest.skip("native library unavailable")
    buf, inv_scale = fused
    assert buf.dtype == np.int8

    work = dec._host_ingest(sig_i16, Rate(48000), exact=False)
    peak = float(np.max(np.abs(work))) or 1.0
    scale = np.float32(127.0 / peak)
    want = np.round(work * scale).astype(np.int8)
    want_inv = float(np.float32(1.0) / scale)

    assert buf.shape[0] == pad_bucket(out_len)
    np.testing.assert_array_equal(buf[:out_len], want)
    assert not buf[out_len:].any()
    assert inv_scale == want_inv

    # prepare_work routes int16 input on a host8 decoder through the
    # fused i8 kernel.
    payload = dec.prepare_work(sig_i16, Rate(48000), to_device=False)
    assert payload.data.dtype == np.int8
    assert payload.inv_scale == want_inv
    np.testing.assert_array_equal(np.asarray(payload.data), want)


def test_fused_native_ingest_short_input():
    """A few hundred samples must behave like the numpy path: tail
    windows read only what exists, no out-of-bounds."""
    from noaa_apt_tpu.graph.decode import pad_bucket
    from noaa_apt_tpu.native import ingest_i16_native

    rng = np.random.default_rng(3)
    sig = (rng.standard_normal(4000) * 8000).astype(np.int16)
    dec = Decoder(STANDARD, ingest="host16")
    plan = dec._ingest_plan(Rate(48000), len(sig))
    l, m, coeff, out_len = plan
    assert out_len > 0
    fused = ingest_i16_native(sig, l, m, coeff, out_len, pad_bucket(out_len))
    if fused is None:
        pytest.skip("native library unavailable")
    buf, inv_scale = fused
    work = dec._host_ingest(sig, Rate(48000), exact=False)
    scale = np.float32(32767.0 / (float(np.max(np.abs(work))) or 1.0))
    np.testing.assert_array_equal(buf[:out_len], np.round(work * scale).astype(np.int16))


def test_input_batch_pad_to_and_device_arrays():
    """decode_render_input_batch accepts pre-uploaded (padded) device
    buffers and a pad_to batch size.  Integer decisions (sync
    positions, row counts) must match the unbatched render exactly;
    pixel values are ulp-scoped across batch sizes (the vmapped
    polyphase accumulates per batch shape), so images are compared at
    tolerance here — serve's byte-exact grouping uses the work-domain
    batch instead."""
    import jax

    from noaa_apt_tpu.graph.decode import pad_bucket

    dec = Decoder(STANDARD)
    sigs, trues, devs = [], [], []
    for i, rows in enumerate((20, 16)):
        s, _ = synth_recording(n_rows=rows, sample_rate=48000, noise_db=13.0, seed=i)
        sigs.append(s.astype(np.float32))
        trues.append(len(s))
    n_pad = pad_bucket(max(trues))
    for s in sigs:
        buf = np.zeros(n_pad, np.float32)
        buf[: len(s)] = s
        devs.append(jax.device_put(buf))

    got = dec.decode_render_input_batch(devs, trues, Rate(48000), pad_to=4)
    assert len(got) == 2
    for s, nt, out in zip(sigs, trues, got):
        want_gray, want_sync = dec.decode_render_input(s, nt, Rate(48000))
        gray, sync_pos = out
        assert sync_pos == want_sync
        assert gray.shape == want_gray.shape
        # <= 1 u8 LSB anywhere (knife-edge rounding under ulp shifts).
        assert np.abs(gray.astype(int) - want_gray.astype(int)).max() <= 1

    # Mismatched pre-upload length is rejected.
    import pytest as _pytest

    from noaa_apt_tpu import err as _err

    with _pytest.raises(_err.InternalError, match="pre-uploaded"):
        dec.decode_render_input_batch(
            [jax.device_put(np.zeros(n_pad // 2, np.float32))], [trues[0]],
            Rate(48000),
        )
