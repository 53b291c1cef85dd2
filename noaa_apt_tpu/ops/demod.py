"""AM envelope demodulation.

Behavioral contract: reference ``src/dsp.rs:350-383`` (expression from
pietern/apt137):

    y[i] = sqrt(x[i-1]^2 + x[i]^2 - x[i-1]*x[i]*2*cos(phi)) / sin(phi)
    phi  = 2*pi * carrier_freq / sample_rate,   y[0] = 0

Pure elementwise work; XLA fuses it into neighboring stages so it never
touches HBM on its own.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.frequency import Freq


def demod_constants(carrier: Freq) -> tuple[np.float32, np.float32]:
    """(2*cos(phi), sin(phi)) in f32, phi = 2 * carrier.rad (dsp.rs:360-363)."""
    phi = np.float32(2.0) * carrier.get_rad()
    return np.float32(np.cos(phi) * np.float32(2.0)), np.float32(np.sin(phi))


@partial(jax.jit, static_argnums=1)
def demodulate(x: jnp.ndarray, carrier: Freq) -> jnp.ndarray:
    cosphi2, sinphi = demod_constants(carrier)
    prev = x[:-1]
    curr = x[1:]
    body = prev * prev + curr * curr - prev * curr * cosphi2
    # The reference's sqrt of a (numerically) tiny negative is NaN there
    # too only if body < 0 exactly; clamp at 0 like hardware sqrt of
    # f32 rounding noise — values are mathematically >= 0.
    y = jnp.sqrt(jnp.maximum(body, 0.0)) / sinphi
    return jnp.concatenate([jnp.zeros((1,), x.dtype), y])
