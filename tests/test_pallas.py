"""Pallas fused kernel (demod+FIR+corr) equals the jnp op composition.

Runs in interpreter mode on the CPU backend; the compiled TPU path is
exercised by bench.py and the Decoder on real hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from noaa_apt_tpu.core import Lowpass
from noaa_apt_tpu.core.frequency import Freq, Rate
from noaa_apt_tpu.ops import demod as dm
from noaa_apt_tpu.ops import resample as rs
from noaa_apt_tpu.ops import sync as sy
from noaa_apt_tpu.ops.demod import demod_constants
from noaa_apt_tpu.ops.pallas_stage import make_demod_fir_corr, _template_runs


@pytest.mark.parametrize("work_mult,n", [(3, 20_000), (4, 9_000)])
def test_fused_kernel_matches_ops(work_mult, n):
    wr = Rate(4160 * work_mult)
    carrier = Freq.hz(2400.0, wr)
    cutout = Freq.from_pi_rad(np.float32(4160) / np.float32(wr.get_hz()))
    dcoeff = Lowpass(cutout, 25.0, cutout / 5.0).design()
    template = sy.generate_sync_frame(wr)
    c2, sp = demod_constants(carrier)

    y = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    yd = jnp.asarray(y)
    f_ref = rs.causal_filter(dm.demodulate(yd, carrier), dcoeff)
    c_ref = np.asarray(sy.sync_correlate(f_ref, template))
    f_ref = np.asarray(f_ref)

    fn = make_demod_fir_corr(dcoeff, template, c2, sp, n, interpret=True, block=4096)
    f_p, c_p = fn(yd)
    f_p, c_p = np.asarray(f_p), np.asarray(c_p)

    scale = max(1.0, np.abs(f_ref).max())
    np.testing.assert_allclose(f_p, f_ref, atol=2e-5 * scale)
    cscale = max(1.0, np.abs(c_ref).max())
    np.testing.assert_allclose(c_p[: len(c_ref)], c_ref, atol=2e-5 * cscale)
    assert f_p[0] == 0.0


def test_adaptive_block_fits_vmem_budget():
    """Fast/slow profiles have more FIR taps + a longer template than
    standard; the kernel must shrink its block so the unrolled
    shift-reads stay under the 16 MB scoped-VMEM limit (the fast
    profile OOM'd the TPU compiler at the fixed 64K block).  The
    chosen block must also keep the halo index maps integral."""
    from noaa_apt_tpu.core.profiles import FAST, SLOW, STANDARD
    from noaa_apt_tpu.graph.decode import Decoder
    from noaa_apt_tpu.ops.pallas_stage import BLOCK, LANES

    budget = 160 * BLOCK
    for prof, expect_shrunk in ((STANDARD, False), (FAST, True), (SLOW, True)):
        dec = Decoder(prof)
        _, dcoeff, template = dec._chain_params()
        k, g = len(dcoeff), len(template)
        blk = BLOCK
        while (k + g) * blk > budget and blk > 64 * LANES:
            blk //= 2
        assert (k + g) * blk <= budget or blk == 64 * LANES
        assert (blk < BLOCK) == expect_shrunk
        # halo divisibility: blk must be a multiple of both halo sizes
        def pow2_at_least(v):
            p = 8 * LANES
            while p < v:
                p <<= 1
            return p
        halo_l = pow2_at_least(k + 1 + LANES + 1)
        halo_r = pow2_at_least(g + LANES + 1)
        assert blk % halo_l == 0 and blk % halo_r == 0

    # And the shrunken kernel still computes the right thing.
    wr = Rate(20800)  # slow-profile work rate
    carrier = Freq.hz(2400.0, wr)
    cutout = Freq.from_pi_rad(np.float32(4160) / np.float32(wr.get_hz()))
    dcoeff = Lowpass(cutout, 50.0, cutout / 5.0).design()
    template = sy.generate_sync_frame(wr)
    c2, sp = demod_constants(carrier)
    n = 30_000
    y = np.random.default_rng(1).standard_normal(n).astype(np.float32)
    yd = jnp.asarray(y)
    f_ref = rs.causal_filter(dm.demodulate(yd, carrier), dcoeff)
    c_ref = np.asarray(sy.sync_correlate(f_ref, template))
    f_ref = np.asarray(f_ref)
    fn = make_demod_fir_corr(dcoeff, template, c2, sp, n, interpret=True, block=8192)
    f_p, c_p = np.asarray(fn(yd)[0]), np.asarray(fn(yd)[1])
    scale = max(1.0, np.abs(f_ref).max())
    np.testing.assert_allclose(f_p, f_ref, atol=2e-5 * scale)
    cscale = max(1.0, np.abs(c_ref).max())
    np.testing.assert_allclose(c_p[: len(c_ref)], c_ref, atol=2e-5 * cscale)


def test_template_runs_reconstruct():
    for mult in (2, 3, 4, 5):
        t = sy.generate_sync_frame(Rate(4160 * mult))
        runs = _template_runs(t)
        rebuilt = np.concatenate([np.full(l, s, np.int8) for s, _, l in runs])
        np.testing.assert_array_equal(rebuilt, t)
        assert len(runs) == 15  # 4pw low, 13 alternating pulses, 8pw low
