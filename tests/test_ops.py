"""Ops: exactness of the TPU mappings vs literal transliterations of the
reference loops (fast_resampling, filter, demodulate, find_sync), plus
the reference's own golden sync-template vectors (``decode.rs:270-319``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from noaa_apt_tpu.core.frequency import Freq, Rate
from noaa_apt_tpu.ops import (
    causal_filter,
    decimate,
    demodulate,
    fast_resample,
    find_sync_peaks,
    generate_sync_frame,
    resample_plan,
    sync_correlate,
)
from noaa_apt_tpu.ops.demod import demod_constants
from noaa_apt_tpu.ops.resample import expanded_filtered
from noaa_apt_tpu.ops.sync import find_sync_peaks_reference


# ---------------------------------------------------------------------------
# Literal transliterations of the reference's scalar loops (specs).


def naive_fast_resampling(signal, l, m, coeff):
    """dsp.rs:186-289, literal."""
    n = len(signal)
    interp = n * l
    offset = (len(coeff) - 1) // 2
    out = []
    t = offset
    while t < interp:
        if t > offset:
            nn = t - offset
            r = nn % l
            if r:
                nn += l - r
        else:
            nn = 0
        s = np.float32(0.0)
        x = nn // l
        while nn <= t + offset:
            if x < n:
                s = np.float32(s + np.float32(coeff[nn + offset - t]) * np.float32(signal[x]))
            x += 1
            nn += l
        out.append(s)
        t += m
    return np.array(out, np.float32)


def naive_filter(signal, coeff):
    """dsp.rs:386-410, literal (note the strict `i > j` guard)."""
    n = len(signal)
    out = np.zeros(n, np.float32)
    for i in range(n):
        s = np.float32(0.0)
        for j in range(len(coeff)):
            if i > j:
                s = np.float32(s + signal[i - j] * coeff[j])
        out[i] = s
    return out


def naive_demodulate(signal, carrier):
    """dsp.rs:350-383, literal."""
    cosphi2, sinphi = demod_constants(carrier)
    out = np.zeros(len(signal), np.float32)
    prev = signal[0]
    for i in range(1, len(signal)):
        curr = signal[i]
        out[i] = np.sqrt(prev * prev + curr * curr - prev * curr * cosphi2) / sinphi
        prev = curr
    return out


# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "l,m,k,n",
    [
        (3, 2, 31, 500),
        (2, 5, 100, 400),  # even-length coeff: last tap unused
        (26, 100, 501, 5000),  # 48000 -> 12480 shape
        (832, 735, 1001, 4000),  # 11025 -> 12480 shape (gather mode)
        (1, 3, 21, 300),
        (5, 1, 41, 200),
    ],
)
def test_fast_resample_matches_reference(l, m, k, n):
    rng = np.random.default_rng(1234)
    x = rng.standard_normal(n).astype(np.float32)
    coeff = rng.standard_normal(k).astype(np.float32) / k

    expected = naive_fast_resampling(x, l, m, coeff)
    plan = resample_plan(n, l, m, coeff)
    got = np.asarray(fast_resample(jnp.asarray(x), plan))

    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_fast_resample_all_modes_agree():
    import dataclasses

    rng = np.random.default_rng(7)
    x = rng.standard_normal(2000).astype(np.float32)
    coeff = rng.standard_normal(301).astype(np.float32) / 301
    p1 = resample_plan(2000, 26, 100, coeff)
    # The default for decimation-style l>1 resamples: the wide packed
    # dot (J = 32 windows/row for m=100).
    assert p1.mode == "matmul_packed" and p1.j_pack == 32
    ys = {}
    for mode in ("matmul_packed", "matmul", "conv", "gather"):
        p = dataclasses.replace(p1, mode=mode)
        ys[mode] = np.asarray(fast_resample(jnp.asarray(x), p))
    np.testing.assert_allclose(ys["conv"], ys["gather"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ys["matmul"], ys["conv"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ys["matmul_packed"], ys["matmul"], rtol=2e-4, atol=2e-5)


def test_fast_resample_coeff_longer_than_signal():
    # dsp.rs tests: coeffs longer than signal must not blow up.
    x = np.zeros(100, np.float32)
    coeff = np.zeros(1000, np.float32)
    plan = resample_plan(100, 3, 2, coeff)
    y = np.asarray(fast_resample(jnp.asarray(x), plan))
    assert y.shape == naive_fast_resampling(x, 3, 2, coeff).shape


def test_causal_filter_matches_reference():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(300).astype(np.float32)
    coeff = rng.standard_normal(37).astype(np.float32) / 6
    expected = naive_filter(x, coeff)
    got = np.asarray(causal_filter(jnp.asarray(x), coeff))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)
    assert got[0] == 0.0


def test_decimate():
    x = jnp.arange(17, dtype=jnp.float32)
    assert np.asarray(decimate(x, 3)).tolist() == [0.0, 3.0, 6.0, 9.0, 12.0]


def test_demodulate_matches_reference():
    rng = np.random.default_rng(6)
    x = rng.standard_normal(500).astype(np.float32)
    carrier = Freq.hz(2400.0, Rate(12480))
    expected = naive_demodulate(x, carrier)
    got = np.asarray(demodulate(jnp.asarray(x), carrier))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)
    assert got[0] == 0.0


def test_expanded_filtered_consistency():
    # Debug export: stride-1 interpolated output must contain the
    # resampler's outputs at positions k*m.
    rng = np.random.default_rng(8)
    x = rng.standard_normal(200).astype(np.float32)
    coeff = rng.standard_normal(31).astype(np.float32)
    l, m = 3, 2
    plan = resample_plan(200, l, m, coeff)
    y = np.asarray(fast_resample(jnp.asarray(x), plan))
    ef = np.asarray(expanded_filtered(jnp.asarray(x), l, coeff))
    np.testing.assert_allclose(ef[:: m][: y.size], y, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Sync template goldens (decode.rs:270-319).


def _golden_sync(pw: int) -> list[int]:
    """The exact vectors printed in decode.rs:274-318: -1 x 4pw, then
    six (+1 x 2pw, -1 x 2pw) pairs, a final +1 x 2pw, then -1 x 10pw."""
    ref = [-1] * 4 * pw
    for _ in range(6):
        ref += [1] * 2 * pw + [-1] * 2 * pw
    ref += [1] * 2 * pw
    ref += [-1] * 8 * pw
    return ref


def test_sync_frame_golden_5x():
    got = generate_sync_frame(Rate(4160 * 5)).tolist()
    assert got == _golden_sync(5)
    assert len(got) == 38 * 5


def test_sync_frame_golden_2x():
    got = generate_sync_frame(Rate(4160 * 2)).tolist()
    assert got == _golden_sync(2)
    assert len(got) == 38 * 2


def test_sync_frame_requires_multiple():
    with pytest.raises(ValueError):
        generate_sync_frame(Rate(10000))


def test_sync_correlate():
    rng = np.random.default_rng(9)
    sig = rng.standard_normal(400).astype(np.float32)
    t = generate_sync_frame(Rate(8320))
    corr = np.asarray(sync_correlate(jnp.asarray(sig), t))
    assert corr.shape[0] == 400 - len(t)
    i = 13
    np.testing.assert_allclose(
        corr[i], float(np.sum(t * sig[i : i + len(t)])), rtol=1e-4
    )


@pytest.mark.parametrize("seed", range(8))
def test_find_sync_peaks_matches_reference_scan(seed):
    rng = np.random.default_rng(seed)
    wr = Rate(4160 * 2)
    spr = 2080 * 2
    n = spr * 7 + rng.integers(0, spr)
    corr = rng.standard_normal(n).astype(np.float32)
    # Plant plausible peaks to exercise the replacement chain.
    for r in range(1, 6):
        corr[r * spr + rng.integers(-20, 20)] += 50.0
    fast = find_sync_peaks(corr, wr)
    ref = find_sync_peaks_reference(corr, wr)
    assert fast == ref


@pytest.mark.parametrize("case", [
    "noise", "planted", "ascending", "descending", "zeros", "ties",
    "dropout", "short", "peak_at_zero", "negative_start",
])
def test_device_peak_backends_bit_equal(case):
    """The settle-table device selector must match the jump-form device
    selector, the host scan, and the literal reference transliteration
    on adversarial shapes: monotone ramps (longest chains), exact ties
    (first-argmax semantics), dead regions (forced appends), and
    near-empty tails."""
    from noaa_apt_tpu.ops.sync import _find_sync_peaks_device

    wr = Rate(4160 * 2)
    spr = 2080 * 2
    rng = np.random.default_rng(hash(case) % 2**32)
    n = spr * 6 + 1234
    if case == "noise":
        corr = rng.standard_normal(n).astype(np.float32)
    elif case == "planted":
        corr = rng.standard_normal(n).astype(np.float32)
        for r in range(1, 5):
            corr[r * spr + rng.integers(-30, 30)] += 40.0
    elif case == "ascending":
        corr = np.linspace(0, 100, n, dtype=np.float32)
    elif case == "descending":
        corr = np.linspace(100, 0, n, dtype=np.float32)
    elif case == "zeros":
        corr = np.zeros(n, np.float32)
    elif case == "ties":
        corr = np.tile(np.array([1.0, 3.0, 3.0, 2.0], np.float32), n // 4 + 1)[:n]
    elif case == "dropout":
        corr = np.full(n, -1.0, np.float32)
        corr[5] = 7.0
        corr[4 * spr + 17] = 9.0
    elif case == "peak_at_zero":
        # Recording starts exactly on a sync pulse: the reference's
        # i=0 replacement makes 0 the first peak (decode.rs:250-253).
        corr = rng.standard_normal(n).astype(np.float32)
        corr[0] = 80.0
    elif case == "negative_start":
        corr = rng.standard_normal(n).astype(np.float32) - 5.0
        corr[0] = -0.5
    else:  # short: barely past the minimum
        n = spr + 77
        corr = rng.standard_normal(n).astype(np.float32)

    ref = find_sync_peaks_reference(corr, wr)
    host = find_sync_peaks(corr, wr)
    md = spr * 8 // 10
    max_peaks = max(16, n // spr + 16)
    cd = jnp.asarray(corr)
    pj, kj = _find_sync_peaks_device(cd, n, spr, md, max_peaks)
    jump = np.asarray(pj[: int(kj)]).tolist()
    assert host == ref
    assert jump == ref
    # Pallas kernel backend (interpreter mode on CPU).
    from noaa_apt_tpu.ops.pallas_select import select_peaks

    pp, kp = select_peaks(cd, n, spr, md, max_peaks, interpret=True)
    assert np.asarray(pp[: int(kp)]).tolist() == ref
    # The NumPy fallback (native scan unavailable) must agree too.
    import noaa_apt_tpu.native as native_mod
    import noaa_apt_tpu.ops.sync as sync_mod

    orig = native_mod.find_sync_peaks_native
    try:
        native_mod.find_sync_peaks_native = lambda *a, **k: None
        assert sync_mod.find_sync_peaks(corr, wr) == ref
    finally:
        native_mod.find_sync_peaks_native = orig


def test_find_sync_peaks_dropout_forced_append():
    # A long dead (all -inf-ish) region forces synthesized peaks
    # (decode.rs:244-246).
    wr = Rate(4160 * 2)
    spr = 2080 * 2
    corr = np.full(spr * 10, -1.0, np.float32)
    corr[10] = 5.0
    fast = find_sync_peaks(corr, wr)
    ref = find_sync_peaks_reference(corr, wr)
    assert fast == ref

@pytest.mark.parametrize("seed", range(3))
def test_pallas_selector_chunk_boundaries(seed):
    """The Pallas selector streams corr through VMEM in chunks; windows
    straddling a chunk boundary read the lookahead block, and appends
    that land beyond the current chunk defer their value load.  Force
    tiny chunks so a random signal crosses many boundaries, and check
    peak-for-peak equality with the host scan."""
    from noaa_apt_tpu.ops.pallas_select import select_peaks

    wr = Rate(4160)
    spr = 2080
    md = spr * 8 // 10
    block = 4096  # >= the md superwindow (3072 samples), far below default
    rng = np.random.default_rng(seed)
    n = int(rng.integers(block * 6, block * 9))
    corr = rng.standard_normal(n).astype(np.float32)
    if seed == 2:
        # Dropout spanning several chunks: forced appends march across
        # block boundaries and exercise the deferred-v path.
        corr[block : block * 4] = -100.0
    max_peaks = max(16, n // spr + 16)
    # n_valid below the array length: the tail must be masked in-kernel.
    n_valid = n - 777
    peaks, k = select_peaks(
        jnp.asarray(corr), n_valid, spr, md, max_peaks, interpret=True, block=block
    )
    got = np.asarray(peaks[: int(k)]).tolist()
    assert got == find_sync_peaks(corr[:n_valid], wr)


def test_export_resample_filtered_changes_decimation_grid():
    """Reference quirk (dsp.rs:265-276): the export branch advances t
    by 1 and emits when (t+1) % m == 0, so --export-resample-filtered
    shifts the decimation phase relative to the flag-off grid
    offset + k*m.  The debug path must reproduce it (oracle: literal
    port of the reference export loop)."""
    import jax.numpy as jnp

    from noaa_apt_tpu.core import Lowpass
    from noaa_apt_tpu.core.frequency import Freq, Rate
    from noaa_apt_tpu.graph.debug import resample_with_filter
    from noaa_apt_tpu.io.context import Context

    def oracle_export(signal, l, m, coeff):
        # dsp.rs:233-276 export branch, f32, literal
        f32 = np.float32
        interpolated_len = len(signal) * l
        offset = (len(coeff) - 1) // 2
        out = []
        t = offset
        while t < interpolated_len:
            if t > offset:
                n = t - offset
                rem = n % l
                if rem:
                    n += l - rem
            else:
                n = 0
            s = f32(0.0)
            x = n // l
            while n <= t + offset:
                if x < len(signal):
                    s = f32(s + f32(coeff[n + offset - t]) * f32(signal[x]))
                x += 1
                n += l
            t += 1
            if t % m == 0:
                out.append(s)
        return np.array(out, f32)

    rng = np.random.default_rng(7)
    signal = rng.normal(0, 0.5, 400).astype(np.float32)
    in_rate, out_rate = Rate(5000), Rate(12480)  # l=312, m=125
    filt = Lowpass(cutout=Freq.hz(2400.0, in_rate), atten=30.0, delta_w=Freq.hz(500.0, in_rate))

    outputs = {}
    for flag in (False, True):
        ctx = Context.decode(
            lambda *_: None, Rate(12480), Rate(4160),
            export_wav=False, export_resample_filtered=flag,
        )
        outputs[flag] = np.asarray(
            resample_with_filter(ctx, jnp.asarray(signal), in_rate, out_rate, filt)
        )

    l, m = 312, 125
    coeff = filt.resample(in_rate, Rate(in_rate.get_hz() * l)).design()
    want = oracle_export(signal, l, m, coeff)
    assert outputs[True].shape == want.shape
    np.testing.assert_allclose(outputs[True], want, rtol=2e-4, atol=2e-5)
    # ...and it is genuinely a different grid than the flag-off output.
    assert (len(coeff) - 1) // 2 % m != m - 1
    assert not np.allclose(outputs[True][:200], outputs[False][:200], atol=1e-4)


@pytest.mark.parametrize("seed", range(2))
def test_pallas_selector_batched(seed):
    """The batched selector (one launch, grid over (element, chunk),
    per-element state re-seed) must match the unbatched kernel and the
    host scan row for row — including rows of different n_valid and a
    dropout row exercising cross-chunk forced appends."""
    from noaa_apt_tpu.ops.pallas_select import select_peaks, select_peaks_batch

    wr = Rate(4160)
    spr = 2080
    md = spr * 8 // 10
    block = 4096
    rng = np.random.default_rng(100 + seed)
    B = 4
    n = block * 5
    corr = rng.standard_normal((B, n)).astype(np.float32)
    corr[1, block : block * 3] = -100.0  # dropout: forced appends
    corr[2, 0] = 50.0  # i=0 replacement case
    n_valids = np.array([n, n - 777, n - spr, spr + 99], np.int32)
    max_peaks = max(16, n // spr + 16)

    pb, kb = select_peaks_batch(
        jnp.asarray(corr), jnp.asarray(n_valids), spr, md, max_peaks,
        interpret=True, block=block,
    )
    for b in range(B):
        want = find_sync_peaks(corr[b, : int(n_valids[b])], wr)
        got = np.asarray(pb[b, : int(kb[b])]).tolist()
        assert got == want, f"row {b}"
        pu, ku = select_peaks(
            jnp.asarray(corr[b]), int(n_valids[b]), spr, md, max_peaks,
            interpret=True, block=block,
        )
        assert np.asarray(pu[: int(ku)]).tolist() == got, f"row {b} unbatched"
