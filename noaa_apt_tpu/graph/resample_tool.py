"""WAV -> WAV resampling tool.

Behavioral contract: reference ``src/resample.rs`` — load, resample
with a lowpass at half the smaller rate, write 16-bit WAV, copy the
modification timestamp.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from .. import err
from ..core.frequency import Freq, Rate
from ..io import wav
from ..io.context import Context
from ..io.misc import read_timestamp, write_timestamp
from . import debug

log = logging.getLogger(__name__)


def resample(
    context: Context,
    settings,
    input_filename,
    output_filename,
    output_rate: int,
) -> None:
    log.info("Reading WAV file")
    context.status(0.0, "Reading WAV file")

    input_signal, spec = wav.load_wav(input_filename)
    input_rate = Rate(spec.sample_rate)
    timestamp = read_timestamp(input_filename)

    context.step_signal("input", input_signal, input_rate)

    log.info("Resampling")
    context.status(0.2, f"Resampling to {output_rate}")

    resampled = debug.resample(
        context,
        jnp.asarray(input_signal),
        input_rate,
        Rate(output_rate),
        settings.wav_resample_atten,
        Freq.from_pi_rad(settings.wav_resample_delta_freq),
    )
    resampled = np.asarray(resampled)
    if resampled.size == 0:
        raise err.InternalError(
            "Got zero samples after resampling, audio file too short or "
            "output sampling frequency too low"
        )

    log.info("Writing WAV to '%s'", output_filename)
    context.status(0.8, f"Writing WAV to '{output_filename}'")
    wav.write_wav(output_filename, resampled, wav.WavSpec(1, output_rate, 16, "int"))
    write_timestamp(timestamp, output_filename)
    context.status(1.0, "Finished")
