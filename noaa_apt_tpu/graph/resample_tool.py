"""WAV -> WAV resampling tool.

Behavioral contract: reference ``src/resample.rs`` — load, resample
with a lowpass at half the smaller rate, write 16-bit WAV, copy the
modification timestamp.  User-visible strings and progress fractions
match the reference; the implementation below is organised as an
announce-helper over the package's own load/resample/write layers.
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

_EMPTY_OUTPUT = (
    "Got zero samples after resampling, audio file too short or "
    "output sampling frequency too low"
)


def _announce(context: Context, fraction: float, status: str, info: str | None = None):
    """One log line + one progress tick, as the reference pairs
    ``info!`` with ``context.status`` (resample.rs:24-63).  The log
    text differs from the status line only where the reference's does
    (the resample stage logs without the target rate)."""
    if info != "":
        log.info(info if info is not None else status)
    context.status(fraction, status)


def resample(
    context: Context,
    settings,
    input_filename,
    output_filename,
    output_rate: int,
) -> None:
    out_rate = Rate(output_rate)

    _announce(context, 0.0, "Reading WAV file")
    signal, spec = wav.load_wav(input_filename)
    mtime = read_timestamp(input_filename)
    context.step_signal("input", signal, Rate(spec.sample_rate))

    _announce(context, 0.2, f"Resampling to {output_rate}", "Resampling")
    out = np.asarray(
        debug.resample(
            context,
            jnp.asarray(signal),
            Rate(spec.sample_rate),
            out_rate,
            settings.wav_resample_atten,
            Freq.from_pi_rad(settings.wav_resample_delta_freq),
        )
    )
    if not out.size:
        raise err.InternalError(_EMPTY_OUTPUT)

    _announce(context, 0.8, f"Writing WAV to '{output_filename}'")
    wav.write_wav(output_filename, out, wav.WavSpec(1, output_rate, 16, "int"))
    write_timestamp(mtime, output_filename)
    _announce(context, 1.0, "Finished", "")
