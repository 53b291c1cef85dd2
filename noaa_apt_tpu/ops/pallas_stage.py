"""Fused Pallas TPU kernel: AM demod + post-demod FIR + sync correlation.

One VMEM pass instead of three HBM-bound ops.  Each grid block sees an
overlapping window of the resampled work signal — assembled from three
aligned BlockSpec inputs (left-halo tail, body, right-halo head), so
Pallas's own pipelining double-buffers the fetches — and computes the
envelope (``dsp.rs:350-383``), the causal FIR (``dsp.rs:386-410``,
including the ``i > j`` start-up semantics) and the +-1 sync
cross-correlation (``decode.rs:225-234``).

TPU-shape strategy: the signal lives in VMEM as row-major [rows, 128]
tiles.  A shifted read ``d[base + j + u]`` decomposes into an aligned
row slice, one lane rotation (``pltpu.roll``) and a lane-index select —
so the FIR's K taps and the correlation's G template positions unroll
into pure VPU work with no unaligned memrefs.

The composition equals ``demodulate -> causal_filter ->
sync_correlate`` (tested in tests/test_pallas.py); the jnp op path
remains the portable reference implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK = 1 << 16  # filtered/corr samples produced per grid step


def _template_runs(template: np.ndarray) -> list[tuple[int, int, int]]:
    """(sign, start, length) runs of the +-1 sync template."""
    runs = []
    start = 0
    for j in range(1, len(template) + 1):
        if j == len(template) or template[j] != template[start]:
            runs.append((int(template[start]), start, j - start))
            start = j
    return runs


def _shift_read(arr, base: int, j: int, u: int):
    """Read ``u`` samples starting at flat position ``base + j`` from a
    row-major [rows, 128] array, as [u//128, 128].

    ``base`` and ``u`` must be multiples of 128; ``j`` may be any
    offset with ``base + j >= 0`` and room for one spill row.
    """
    q, s = divmod(base + j, LANES)
    rows = u // LANES
    if s == 0:
        return arr[q : q + rows, :]
    x = arr[q : q + rows + 1, :]
    a = pltpu.roll(x, LANES - s, axis=1)  # a[r, c] = x[r, (c + s) % LANES]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return jnp.where(lane < LANES - s, a[:rows, :], a[1 : rows + 1, :])


def make_demod_fir_corr(
    dcoeff: np.ndarray,
    template: np.ndarray,
    cosphi2: float,
    sinphi: float,
    n: int,
    interpret: bool = False,
    block: int | None = None,
):
    """Build the fused kernel for signals of (padded) length ``n``.

    Returns ``fn(y) -> (filtered[n], corr[n])``; ``corr`` entries past
    ``n - len(template)`` are computed against zero padding, as the
    callers already mask.
    """
    k = int(len(dcoeff))
    g = int(len(template))
    blk = block
    if blk is None:
        # Scoped VMEM scales with blk x the number of unrolled tap /
        # template shift-reads (k + g).  The standard profile
        # (k+g = 151) fits a 64K block under the 16 MB scoped limit;
        # the fast/slow profiles (195 / 251 reads) overflowed it, so
        # halve the block until the product is back inside the
        # measured budget.  Smaller blocks only add grid steps — the
        # kernel is VPU-bound, throughput is unchanged.
        blk = BLOCK
        budget = 160 * BLOCK
        while (k + g) * blk > budget and blk > 64 * LANES:
            blk //= 2

    def _pow2_at_least(v: int) -> int:
        # Power of two, and at least 8 sublane rows (Mosaic block minimum).
        p = 8 * LANES
        while p < v:
            p <<= 1
        return p

    # Halos sized to powers of two so halo-block index maps stay integral.
    halo_l = _pow2_at_least(k + 1 + LANES + 1)
    halo_r = _pow2_at_least(g + LANES + 1)
    e = halo_l + blk + halo_r
    span = blk + halo_r
    n_blocks = -(-n // blk)
    n_pad = n_blocks * blk
    taps = np.asarray(dcoeff, np.float32)
    runs = _template_runs(np.asarray(template))
    c2 = np.float32(cosphi2)
    sp = np.float32(sinphi)

    def kernel(tail_ref, mid_ref, head_ref, filt_out, corr_out):
        i = pl.program_id(0)
        ext2 = jnp.concatenate([tail_ref[:, :], mid_ref[:, :], head_ref[:, :]], axis=0)

        # AM envelope for window positions [LANES, e): prev = d[t-1].
        curr = ext2[1:, :]
        prev = _shift_read(ext2, LANES, -1, e - LANES)
        dem = jnp.sqrt(jnp.maximum(prev * prev + curr * curr - prev * curr * c2, 0.0)) / sp
        # Global dem[0] = 0 (dsp.rs:369: sample 0 has no predecessor):
        # window position halo_l, i.e. dem row-space position
        # halo_l - LANES, in block 0 only.
        rows_d = e // LANES - 1
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (rows_d, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (rows_d, LANES), 1)
        )
        dem = jnp.where((i == 0) & (pos == halo_l - LANES), 0.0, dem)

        # Causal FIR at window positions [halo_l, halo_l + span); dem
        # holds positions [LANES, e), so its base is halo_l - LANES.
        base = halo_l - LANES
        filt = taps[0] * _shift_read(dem, base, 0, span)
        for j in range(1, k):
            filt = filt + taps[j] * _shift_read(dem, base, -j, span)
        filt_out[:, :] = filt[: blk // LANES, :]

        # Sync correlation: corr[u] = sum_j t[j] * filt[u + j].
        corr = None
        for sign, start, length in runs:
            for j in range(start, start + length):
                seg = _shift_read(filt, 0, j, blk)
                if corr is None:
                    corr = seg if sign > 0 else -seg
                else:
                    corr = corr + seg if sign > 0 else corr - seg
        corr_out[:, :] = corr

    rows_out = n_pad // LANES
    block_rows = blk // LANES

    @jax.jit
    def fn(y: jnp.ndarray):
        y_padded = jnp.concatenate(
            [
                jnp.zeros((halo_l,), jnp.float32),
                y,
                jnp.zeros((n_pad - n + halo_l + halo_r, ), jnp.float32),
            ]
        ).reshape(-1, LANES)
        filt, corr = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                # Left halo: rows [i*B, i*B + halo_l) of the padded array.
                pl.BlockSpec(
                    (halo_l // LANES, LANES),
                    lambda i: (i * (blk // halo_l), 0),
                    memory_space=pltpu.VMEM,
                ),
                # Body: rows [i*B + halo_l, (i+1)*B + halo_l).
                pl.BlockSpec(
                    (block_rows, LANES),
                    lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                # Right halo: rows [(i+1)*B + halo_l, ... + halo_r).
                pl.BlockSpec(
                    (halo_r // LANES, LANES),
                    lambda i: ((i + 1) * (blk // halo_r), 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((rows_out, LANES), jnp.float32),
                jax.ShapeDtypeStruct((rows_out, LANES), jnp.float32),
            ),
            interpret=interpret,
        )(y_padded, y_padded[halo_l // LANES :, :], y_padded[halo_l // LANES :, :])
        return filt.reshape(-1)[:n], corr.reshape(-1)[:n]

    return fn
