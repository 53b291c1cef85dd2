"""AM envelope demodulation.

Behavioral contract: reference ``src/dsp.rs:350-383`` (expression from
pietern/apt137):

    y[i] = sqrt(x[i-1]^2 + x[i]^2 - x[i-1]*x[i]*2*cos(phi)) / sin(phi)
    phi  = 2 * (2*pi * carrier_freq / sample_rate),   y[0] = 0

The doubled phi reproduces the reference verbatim (dsp.rs:361 does
``2. * carrier_freq.get_rad()``, get_rad() already being the per-sample
phase step) — the envelope identity itself would want the single step,
but bit-parity wins; do NOT "fix" the factor.

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
    """(2*cos(phi), sin(phi)) in f32, phi = 2 * carrier.get_rad() — the
    reference's deliberately doubled phase step (dsp.rs:360-363; see
    module docstring)."""
    phi = np.float32(2.0) * carrier.get_rad()
    return np.float32(np.cos(phi) * np.float32(2.0)), np.float32(np.sin(phi))


def _det_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """Deterministic f32 sqrt for x >= 0: bit-hack rsqrt seed + three
    Newton steps, built only from ops every backend rounds identically
    (integer arithmetic, IEEE mul/sub).  XLA's ``sqrt`` lowers to
    backend- and fusion-context-dependent approximations whose last ulp
    differs between e.g. a loop's scalar peel and its vector body —
    which broke single-chip vs sharded bit-equality.  Accuracy: within
    ~1-2 ulp of true sqrt over the normal range (quadratic convergence
    from a <=3.5% seed); x == 0 maps to exactly 0.

    The barrier keeps the ``1.5 - v`` subtraction from being
    FMA-contracted with the product chain (the only contractible site).
    """
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    y = jax.lax.bitcast_convert_type(np.int32(0x5F3759DF) - (i >> 1), jnp.float32)
    half, three_half = np.float32(0.5), np.float32(1.5)
    hx = half * x
    for _ in range(3):
        v = jax.lax.optimization_barrier(hx * y * y)
        y = y * (three_half - v)
    return x * y


def demod_body(prev: jnp.ndarray, curr: jnp.ndarray, cosphi2, sinphi) -> jnp.ndarray:
    """The envelope expression with every operation individually and
    reproducibly rounded to f32.

    Two sources of cross-graph nondeterminism are removed so the
    sequence-sharded decode is bit-identical to single-chip:
    ``optimization_barrier`` stops XLA from FMA-contracting the
    products into the sums (LLVM/TPU codegen may contract a fused
    expression differently in a loop's peel region than in its vector
    body), and sqrt/division — which XLA lowers to context-dependent
    approximations — become a deterministic Newton sqrt and an exact
    reciprocal multiply.  Costs a few extra O(N) elementwise passes
    (HBM-trivial); the TPU hot path uses the fused Pallas kernel
    instead.  Value vs the reference's libm sqrt + division: <= 2 ulp,
    far inside the decode's tolerance contract.
    """
    p2, c2, pc = jax.lax.optimization_barrier((prev * prev, curr * curr, prev * curr))
    s, t = jax.lax.optimization_barrier((p2 + c2, pc * cosphi2))
    body = s - t
    # The reference's sqrt of a (numerically) tiny negative is NaN there
    # too only if body < 0 exactly; clamp at 0 like hardware sqrt of
    # f32 rounding noise — values are mathematically >= 0.
    root = _det_sqrt(jnp.maximum(body, 0.0))
    if isinstance(sinphi, (float, np.floating, int)):
        inv = np.float32(np.float32(1.0) / np.float32(sinphi))
    else:
        # sinphi is a (traced or eager) device value: keep the division
        # in-graph.  XLA constant-folds 1/c with the same correctly
        # rounded IEEE f32 division the host would use, so the result is
        # bit-identical to the host-scalar path — and, critically, this
        # never calls __array__ on a device value at trace time (an
        # eager-result fetch through the axon tunnel costs minutes).
        inv = jnp.float32(1.0) / jnp.asarray(sinphi, jnp.float32)
    return root * inv


@partial(jax.jit, static_argnums=1)
def demodulate(x: jnp.ndarray, carrier: Freq) -> jnp.ndarray:
    cosphi2, sinphi = demod_constants(carrier)
    y = demod_body(x[:-1], x[1:], cosphi2, sinphi)
    return jnp.concatenate([jnp.zeros((1,), x.dtype), y])
