"""Demod + post-demod FIR + sync correlation as banded MXU matmuls.

Behavioral contract: the composition ``demodulate`` (``dsp.rs:350-383``)
→ ``filter`` (``dsp.rs:386-410``, including the strict ``i > j``
start-up: ``dem[0] = 0`` makes the excluded ``coeff[i]*x[0]`` terms
vanish identically) → ``sync_correlate`` (``decode.rs:225-234``).  Same
signature and output contract as
:func:`noaa_apt_tpu.ops.pallas_stage.make_demod_fir_corr`: ``fn(y) ->
(filt[n], corr[n])`` with ``corr`` entries past ``n - len(template)``
computed against zero padding (callers mask them).

Why matmuls: both convolutions have short kernels (K ≈ 60 FIR taps,
G ≈ 114-190 template samples).  Viewed per 128-lane row of the signal,
output row ``r`` is one product of the extended row window
``[x[128(r-a)] .. x[128(r+b))]`` against a static banded matrix whose
``(u, v)`` entry holds the tap connecting window sample ``u`` to output
lane ``v`` — so the whole chain is two ``[R, (a+b)*128] @ [(a+b)*128,
128]`` dots.  The MXU does the shifting implicitly through the band
structure; the unrolled lane-rotation reads that dominate the VPU
Pallas kernel (ops/pallas_stage.py, kept for non-matmul fallback and
cross-checking) disappear — measured ~2.5 ms → under the measurement
floor (< 0.3 ms) for a 10-minute pass on a v5e.

Numerics: per-output accumulation is one dot over the band (XLA's
fixed K-tiling), which differs from the reference's sequential tap sum
in f32 rounding only — sync positions are selected from consistently
computed correlations, and every TPU path shares this implementation
(tested against the op-chain composition and for peak equality in
tests/test_banded.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import demod as dm

LANES = 128


def make_demod_fir_corr_banded(
    dcoeff: np.ndarray,
    template: np.ndarray,
    cosphi2: float,
    sinphi: float,
    n: int,
):
    """Build ``fn(y[n]) -> (filt[n], corr[n])`` for padded length ``n``."""
    dcoeff = np.asarray(dcoeff, np.float32)
    tmpl = np.asarray(template, np.float32)
    k = len(dcoeff)
    g = len(tmpl)
    r_rows = -(-n // LANES)
    npad = r_rows * LANES

    # FIR looks back k-1 samples: prepend `back` rows to each window.
    back = -(-(k - 1) // LANES)
    wf = (back + 1) * LANES
    band_f = np.zeros((wf, LANES), np.float32)
    for v in range(LANES):
        for j in range(k):
            band_f[back * LANES + v - j, v] = dcoeff[j]

    # Correlation looks forward g-1 samples: append `fwd` rows.
    fwd = -(-(LANES - 1 + g - 1) // LANES)
    wc = (1 + fwd) * LANES
    band_c = np.zeros((wc, LANES), np.float32)
    for v in range(LANES):
        for j in range(g):
            band_c[v + j, v] = tmpl[j]

    # Host (np) constants, NOT jnp/device arrays: an eager jnp.asarray
    # here creates a committed device array, and every device-array
    # constant closed over by the traced fn is fetched BACK to host at
    # MLIR lowering time (_array_mlir_constant_handler) — through the
    # axon tunnel the first such fetch costs minutes.  np values embed
    # as compile-time constants with identical numerics and zero round
    # trips.  Same rule for the demod scalars: demod_body's reciprocal
    # would fetch a device scalar at trace time.
    bf = band_f
    bc = band_c
    c2 = np.float32(cosphi2)
    sp = np.float32(sinphi)
    hi = jax.lax.Precision.HIGHEST

    @jax.jit
    def fn(y: jnp.ndarray):
        yp = jnp.pad(y, (0, npad - n))
        prev = jnp.concatenate([jnp.zeros((1,), jnp.float32), yp[:-1]])
        dem = dm.demod_body(prev, yp, c2, sp)
        # Sample 0 has no predecessor (dsp.rs:369); zeroing it also
        # realizes the causal FIR's strict `i > j` exclusion of every
        # coeff[i]*x[0] term.
        dem = dem.at[0].set(0.0)
        d2 = dem.reshape(r_rows, LANES)

        zrow = jnp.zeros((1, LANES), jnp.float32)
        parts = [
            jnp.concatenate([jnp.tile(zrow, (b + 1, 1)), d2[: -(b + 1)]], axis=0)
            for b in reversed(range(back))
        ]
        xf = jnp.concatenate(parts + [d2], axis=1)
        filt = jnp.dot(xf, bf, precision=hi)

        parts = [filt] + [
            jnp.concatenate([filt[e + 1 :], jnp.tile(zrow, (e + 1, 1))], axis=0)
            for e in range(fwd)
        ]
        xc = jnp.concatenate(parts, axis=1)
        corr = jnp.dot(xc, bc, precision=hi)
        return filt.reshape(-1)[:n], corr.reshape(-1)[:n]

    return fn
