"""Eager decode path with full intermediate-step export.

Behavioral contract: reference ``src/decode.rs:43-162`` +
``src/dsp.rs:62-126`` including every ``Context::step`` call in order
(the ``--wav-steps`` debug mode, SURVEY.md section 5.1).  This path runs
the same jitted ops as the fast graph but stage-by-stage so each
intermediate can be fetched and dumped; it is debug-only and slower.
"""

from __future__ import annotations

import logging
import math

import jax.numpy as jnp
import numpy as np

from .. import CARRIER_FREQ, FINAL_RATE, PX_PER_ROW, err
from ..core import Lowpass, LowpassDcRemoval, NoFilter
from ..core.frequency import Freq, Rate
from ..core.profiles import DecodeProfile
from ..io.context import Context
from ..ops import demod as dm
from ..ops import resample as rs
from ..ops import sync as sy

log = logging.getLogger(__name__)


def resample_with_filter(
    context: Context | None,
    signal: jnp.ndarray,
    input_rate: Rate,
    output_rate: Rate,
    filt,
) -> jnp.ndarray:
    """Eager ``dsp::resample_with_filter`` (``dsp.rs:62-126``) with
    step export."""
    if output_rate.get_hz() == 0:
        raise err.InternalError("Can't resample to 0Hz")
    g = math.gcd(input_rate.get_hz(), output_rate.get_hz())
    l = output_rate.get_hz() // g
    m = input_rate.get_hz() // g

    if l > 1:
        interpolated = input_rate.checked_mul(l)
        if interpolated is None:
            raise err.RateOverflowError(
                "Can't resample, looks like the sample rates do not have a big "
                f"divisor in common. input_rate: {input_rate.get_hz()}, "
                f"output_rate: {output_rate.get_hz()}, l: {l}, m: {m}"
            )
        coeff = filt.resample(input_rate, interpolated).design()
        export_grid = context is not None and context.export_resample_filtered
        ef = (
            np.asarray(rs.expanded_filtered(signal, l, coeff))
            if export_grid
            else np.zeros(0, np.float32)
        )
        if context is not None:
            context.step_filter("resample_filter", coeff)
            # The reference always sends this step (empty when the flag
            # is off) so the expected-step slot advances (dsp.rs:281-285).
            context.step_signal("resample_filtered", ef, Rate(input_rate.get_hz() * l))
        if export_grid:
            # Reference quirk (dsp.rs:265-276): the export branch
            # advances t by 1 and emits when (t+1) % m == 0, so outputs
            # sit at interpolated positions t ≡ m-1 (mod m) — a
            # DIFFERENT decimation phase than the flag-off grid
            # offset + k*m.  --export-resample-filtered therefore
            # changes the decoded samples in the reference, and this
            # path reproduces that (documented in PARITY.md).
            offset = (len(coeff) - 1) // 2
            first = offset + ((m - 1 - offset) % m)
            result = jnp.asarray(ef[first - offset :: m])
        else:
            plan = rs.resample_plan(int(signal.shape[0]), l, m, coeff)
            result = rs.fast_resample(signal, plan)
        if context is not None:
            context.step_signal("resample_decimated", np.asarray(result), output_rate)
        return result
    else:
        coeff = filt.design()
        if context is not None:
            context.step_filter("resample_filter", coeff)
        filtered = rs.causal_filter(signal, coeff)
        if context is not None:
            context.step_signal("resample_filtered", np.asarray(filtered), input_rate)
        result = rs.decimate(filtered, m)
        if context is not None:
            context.step_signal("resample_decimated", np.asarray(result), output_rate)
        return result


def resample(
    context: Context | None,
    signal: jnp.ndarray,
    input_rate: Rate,
    output_rate: Rate,
    atten: float,
    delta_w: Freq,
) -> jnp.ndarray:
    """Eager ``dsp::resample`` (``dsp.rs:132-162``): anti-aliasing
    cutout at half the smaller rate."""
    if output_rate > input_rate:
        cutout = Freq.hz(input_rate.get_hz() / 2.0, input_rate)
    else:
        cutout = Freq.hz(output_rate.get_hz() / 2.0, input_rate)
    return resample_with_filter(
        context, signal, input_rate, output_rate,
        Lowpass(cutout=cutout, atten=atten, delta_w=delta_w),
    )


def decode_with_steps(
    context: Context,
    profile: DecodeProfile,
    signal: np.ndarray,
    input_rate: Rate,
    sync: bool = True,
) -> np.ndarray:
    """Step-exporting decode; returns the flat FINAL_RATE signal."""
    final_rate = Rate(FINAL_RATE)
    work_rate = Rate(profile.work_rate)
    spr = PX_PER_ROW * profile.work_rate // FINAL_RATE

    context.step_signal("input", signal, input_rate)
    context.status(0.1, f"Resampling to {work_rate.get_hz()}")

    filt = LowpassDcRemoval(
        cutout=Freq.hz(profile.resample_cutout, input_rate),
        atten=profile.resample_atten,
        delta_w=Freq.hz(profile.resample_delta_freq, input_rate),
    )
    x = jnp.asarray(np.asarray(signal, np.float32))
    x = resample_with_filter(context, x, input_rate, work_rate, filt)

    if int(x.shape[0]) < 10 * spr:
        raise err.InternalError(
            "Got less than 10 rows of samples, audio file is too short"
        )

    context.status(0.4, "Demodulating")
    x = dm.demodulate(x, Freq.hz(float(CARRIER_FREQ), work_rate))
    context.step_signal("demodulation_result", np.asarray(x), None)

    context.status(0.42, "Filtering")
    cutout = Freq.from_pi_rad(np.float32(FINAL_RATE) / np.float32(work_rate.get_hz()))
    dfilt = Lowpass(cutout=cutout, atten=profile.demodulation_atten, delta_w=cutout / 5.0)
    dcoeff = dfilt.design()
    context.step_filter("filter_filter", dcoeff)
    x = rs.causal_filter(x, dcoeff)
    context.step_signal("filter_result", np.asarray(x), None)

    if sync:
        context.status(0.5, "Syncing")
        template = sy.generate_sync_frame(work_rate)
        corr = np.asarray(sy.sync_correlate(x, template))
        context.step_signal("sync_correlation", corr, None)
        sync_pos = sy.find_sync_peaks(corr, work_rate)
        log.info("Found %d sync frames", len(sync_pos))
        if len(sync_pos) < 5:
            raise err.InternalError(
                "Found less than 5 sync frames, audio file is too short or too noisy"
            )
        xs = np.asarray(x)
        n = xs.shape[0]
        aligned = np.concatenate(
            [xs[p : p + spr] for p in sync_pos[:-1] if p + spr < n]
            or [np.zeros(0, np.float32)]
        )
        x = jnp.asarray(aligned)
    else:
        context.status(0.5, "Skipping Syncing")
        context.step_signal("sync_correlation", np.zeros(0, np.float32), work_rate)
        n = int(x.shape[0])
        x = x[: n // spr * spr]

    context.step_signal("sync_result", np.asarray(x), work_rate)

    context.status(0.90, "Resampling to 4160")
    x = resample_with_filter(context, x, work_rate, final_rate, NoFilter())
    return np.asarray(x)
