"""Lossless fixed-width residual codec for the i16 work signal.

Cuts the host->device bytes of the byte-faithful serving mode
(``ingest="host16c"``) on real signals with a scheme whose DECODER runs
inside the XLA graph (the link moves whatever ``device_put`` ships, so
host-side entropy coding would not help — decompression must happen on
device, which rules out variable-length entropy codes and leaves
fixed-width packing).

Scheme (integer-exact on both sides — the decoded i16 equals the
encoder input bit-for-bit, so downstream results are byte-identical to
``host16``):

- **Resonant 2-tap predictor** tuned to the 2400 Hz AM carrier at the
  work rate (``decode.rs:38``; the work signal is a bandpass around
  the carrier, ``filters.rs:97-139``)::

      pred[n] = (C * x[n-1]) >> 14  -  x[n-2]
      C       = round(2 * cos(2*pi*2400/work_rate) * 2^14)

  For a pure carrier the prediction is near-exact; residuals carry
  only envelope slope + channel noise.  Plain delta coding does NOT
  work here — the carrier dominates sample-to-sample deltas (measured
  16.1 bits/sample, i.e. negative gain).

- **Pass-level fixed width** ``w_lo`` (chosen by exact byte-cost
  argmin over the per-block width histogram): every 128-sample block
  stores 2 raw i16 anchors plus 126 residuals at ``w_lo`` bits, at a
  FIXED stride, bit-positions aligned so that ``lcm(w_lo, 32)`` bits =
  one "unit" of ``g`` residuals in ``u`` whole words — the device
  decoder then unpacks with STATIC slices and shifts only.  (A
  previous per-block-width layout needed two [nb, 126] u32 gathers to
  locate each block's words; TPU gather made that decode 12x the cost
  of the whole rest of the pipeline — 145 ms/pass vs the ~13 ms
  graph.)

- **Escape rows**: blocks whose residuals exceed ``w_lo`` ship their
  raw 128 i16 samples in a side region and are scattered over the
  reconstructed output at the end (their base-region bits are
  deterministic truncations that both decoders overwrite).  This keeps
  the scheme lossless for arbitrary content; an incompressible signal
  is declined by the caller instead (>0.97x guard in
  ``Decoder._pack_payload``).

Sealed single-buffer layout (u32 words; one upload, one jit arg)::

    [nb anchors] [n_esc_pad esc indices] [n_esc_pad * 64 esc rows]
    [nb * block_words(w_lo) base bits]

Measured on the bench fleet (synthesized 10-min passes, 15 dB noise):
~14.3 bits/sample vs 16; clean recordings drop to w_lo ~8-10 and
compress ~1.6-2x (width tracks the noise floor).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

BLOCK = 128
RES_PER_BLOCK = BLOCK - 2  # two raw anchors per block
PRED_SHIFT = 14
W_MIN, W_MAX = 4, 16
ESC_ROW_WORDS = BLOCK // 2  # raw i16 block = 64 u32 words


def predictor_coeff(work_rate_hz: int, carrier_hz: float = 2400.0) -> int:
    """Fixed-point resonator coefficient C (see module docstring)."""
    return int(round(2.0 * np.cos(2.0 * np.pi * carrier_hz / work_rate_hz)
                     * (1 << PRED_SHIFT)))


def unit_geometry(w_lo: int) -> tuple[int, int, int, int]:
    """(g, u, n_units, block_words): ``g`` residuals per word-aligned
    unit of ``u`` words (``g*w_lo == u*32``), units per block, and the
    block's base-region stride in words."""
    d = math.gcd(w_lo, 32)
    g = 32 // d
    u = w_lo // d
    n_units = -(-RES_PER_BLOCK // g)
    return g, u, n_units, n_units * u


@dataclass
class PackedWork:
    """Encoded work signal (host arrays, seal-ready)."""

    base: np.ndarray     # u32 [nb * block_words] fixed-stride residual bits
    anchors: np.ndarray  # i16 [nb, 2] first two samples of each block
    esc_idx: np.ndarray  # i32 [n_esc] block indices shipped raw
    esc_rows: np.ndarray  # i16 [n_esc, BLOCK] raw samples of those blocks
    w_lo: int
    n_samples: int       # true sample count (<= nb*BLOCK)
    coeff: int           # predictor coefficient C

    @property
    def nb(self) -> int:
        return self.anchors.shape[0]

    @property
    def nbytes(self) -> int:
        return (self.base.nbytes + self.anchors.nbytes
                + self.esc_idx.nbytes + self.esc_rows.nbytes)


def _block_residuals(x: np.ndarray, coeff: int) -> tuple[np.ndarray, np.ndarray]:
    """(blocks [nb, BLOCK] i64, residuals [nb, RES_PER_BLOCK] i64);
    ``>>`` on negatives is an arithmetic (floor) shift — the exact
    semantics the device decoder and the C++ encoder use."""
    n = int(x.shape[0])
    nb = -(-n // BLOCK)
    xb = np.zeros(nb * BLOCK, np.int16)
    xb[:n] = x
    blocks = xb.reshape(nb, BLOCK).astype(np.int64)
    pred = ((coeff * blocks[:, 1:-1]) >> PRED_SHIFT) - blocks[:, :-2]
    return blocks, blocks[:, 2:] - pred


def block_widths(r: np.ndarray) -> np.ndarray:
    """Smallest signed width per block: -2^(w-1) <= r <= 2^(w-1)-1."""
    neg = np.ceil(np.log2(np.maximum(-r.min(axis=1), 1))).astype(np.int64)
    pos = np.ceil(np.log2(np.maximum(r.max(axis=1) + 1, 1))).astype(np.int64)
    w = np.maximum(np.maximum(neg, pos) + 1, 1)
    lo, hi = -(np.int64(1) << (w - 1)), (np.int64(1) << (w - 1)) - 1
    bad = ~(((r >= lo[:, None]) & (r <= hi[:, None])).all(axis=1))
    if bad.any():  # float log2 rounding edge
        w = np.where(bad, w + 1, w)
    return w


def choose_width(widths: np.ndarray) -> int:
    """Exact byte-cost argmin of the pass-level width: base stride at
    w_lo for every block + a 65-word escape row per block wider than
    w_lo."""
    best_w, best_cost = W_MAX, None
    for w in range(W_MIN, W_MAX + 1):
        _, _, _, bw = unit_geometry(w)
        n_esc = int((widths > w).sum())
        cost = widths.shape[0] * bw * 4 + n_esc * (1 + ESC_ROW_WORDS) * 4
        if best_cost is None or cost < best_cost:
            best_w, best_cost = w, cost
    return best_w


def pack_work_i16(x: np.ndarray, work_rate_hz: int) -> PackedWork:
    """Encode an i16 work signal (vectorized numpy reference encoder;
    the C++ encoder in native/ is bit-identical and faster)."""
    assert x.dtype == np.int16
    coeff = predictor_coeff(work_rate_hz)
    blocks, r = _block_residuals(x, coeff)
    nb = blocks.shape[0]
    widths = block_widths(r)
    w_lo = choose_width(widths)
    g, u, n_units, bw = unit_geometry(w_lo)

    esc = widths > w_lo
    esc_idx = np.nonzero(esc)[0].astype(np.int32)
    esc_rows = blocks[esc].astype(np.int16)

    # Base region: residuals truncated to w_lo bits (two's complement),
    # padded to whole units, packed at fixed stride.  Escape blocks'
    # truncations are deterministic and overwritten at decode.
    mask = (np.int64(1) << w_lo) - 1
    field = (r & mask).astype(np.uint64)  # [nb, 126]
    fpad = np.zeros((nb, n_units * g), np.uint64)
    fpad[:, :RES_PER_BLOCK] = field
    fpad = fpad.reshape(nb * n_units, g)
    # Pack one unit (g residuals -> u words) vectorized: accumulate
    # into a u64 column per word.
    words = np.zeros((nb * n_units, u), np.uint64)
    for j in range(g):
        bit = j * w_lo
        wi, sh = bit >> 5, np.uint64(bit & 31)
        v = fpad[:, j] << sh
        words[:, wi] |= v & np.uint64(0xFFFFFFFF)
        if wi + 1 < u:
            words[:, wi + 1] |= v >> np.uint64(32)
    base = words.astype(np.uint32).reshape(-1)
    return PackedWork(
        base=base, anchors=blocks[:, :2].astype(np.int16),
        esc_idx=esc_idx, esc_rows=esc_rows,
        w_lo=w_lo, n_samples=int(x.shape[0]), coeff=coeff,
    )


def seal_packed(p: PackedWork, n_esc_pad: int) -> np.ndarray:
    """Coalesce into ONE u32 upload buffer (see module docstring).
    ``n_esc_pad >= len(esc_idx)``; padded escape indices point past nb
    (dropped by the decoder's scatter)."""
    nb = p.nb
    assert len(p.esc_idx) <= n_esc_pad
    _, _, _, bw = unit_geometry(p.w_lo)
    buf = np.zeros(nb + n_esc_pad * (1 + ESC_ROW_WORDS) + nb * bw, np.uint32)
    buf[:nb] = p.anchors.view(np.uint32).reshape(-1)
    idx = np.full(n_esc_pad, nb, np.uint32)  # out of range -> dropped
    idx[: len(p.esc_idx)] = p.esc_idx.astype(np.uint32)
    buf[nb : nb + n_esc_pad] = idx
    o = nb + n_esc_pad
    rows = np.zeros((n_esc_pad, BLOCK), np.int16)
    rows[: len(p.esc_idx)] = p.esc_rows
    buf[o : o + n_esc_pad * ESC_ROW_WORDS] = rows.view(np.uint32).reshape(-1)
    o += n_esc_pad * ESC_ROW_WORDS
    buf[o : o + len(p.base)] = p.base
    return buf


def sealed_len(nb: int, w_lo: int, n_esc_pad: int) -> int:
    _, _, _, bw = unit_geometry(w_lo)
    return nb + n_esc_pad * (1 + ESC_ROW_WORDS) + nb * bw


def _unpack_base_np(base: np.ndarray, nb: int, w_lo: int) -> np.ndarray:
    """Base-region residuals [nb, RES_PER_BLOCK] (i64, sign-extended)."""
    g, u, n_units, bw = unit_geometry(w_lo)
    words = base.astype(np.uint64).reshape(nb * n_units, u)
    vals = np.zeros((nb * n_units, g), np.uint64)
    mask = np.uint64((1 << w_lo) - 1)
    for j in range(g):
        bit = j * w_lo
        wi, sh = bit >> 5, np.uint64(bit & 31)
        v = words[:, wi] >> sh
        if (bit & 31) + w_lo > 32:
            v |= words[:, wi + 1] << (np.uint64(32) - sh)
        vals[:, j] = v & mask
    vals = vals.reshape(nb, n_units * g)[:, :RES_PER_BLOCK]
    sign = (vals >> np.uint64(w_lo - 1)) & np.uint64(1)
    return vals.astype(np.int64) - (sign.astype(np.int64) << w_lo)


def unpack_work_np(p: PackedWork) -> np.ndarray:
    """Host reference decoder — the oracle the device graph and the
    C++ encoder are tested against."""
    nb = p.nb
    r = _unpack_base_np(p.base, nb, p.w_lo)
    out = np.zeros((nb, BLOCK), np.int64)
    out[:, :2] = p.anchors.astype(np.int64)
    for jj in range(RES_PER_BLOCK):
        pred = ((p.coeff * out[:, jj + 1]) >> PRED_SHIFT) - out[:, jj]
        out[:, jj + 2] = pred + r[:, jj]
    out[p.esc_idx] = p.esc_rows.astype(np.int64)
    return out.reshape(-1)[: p.n_samples].astype(np.int16)


def unpack_sealed_device(buf, nb: int, w_lo: int, n_esc_pad: int, coeff: int):
    """On-device decoder: sealed u32 buffer -> i16 work signal
    [nb*BLOCK].  Gather-free: the fixed stride makes every residual's
    word index and shift STATIC (g slices + shifts per unit class);
    the only data-dependent addressing is the tiny escape-row scatter.
    Bit-identical to :func:`unpack_work_np` (tested).

    Corrupt streams produce garbage samples (i32 wraparound), never a
    crash — the same contract as feeding a corrupt WAV."""
    import jax
    import jax.numpy as jnp

    g, u, n_units, bw = unit_geometry(w_lo)
    anchors = jax.lax.bitcast_convert_type(buf[:nb], jnp.int16)  # [nb, 2]
    esc_idx = buf[nb : nb + n_esc_pad].astype(jnp.int32)
    o = nb + n_esc_pad
    esc_rows = jax.lax.bitcast_convert_type(
        buf[o : o + n_esc_pad * ESC_ROW_WORDS], jnp.int16
    ).reshape(n_esc_pad, BLOCK)
    o += n_esc_pad * ESC_ROW_WORDS
    words = buf[o : o + nb * bw].reshape(nb * n_units, u)

    mask = jnp.uint32((1 << w_lo) - 1)
    vals = []
    for j in range(g):
        bit = j * w_lo
        wi, sh = bit >> 5, bit & 31
        v = words[:, wi] >> jnp.uint32(sh)
        if sh + w_lo > 32:
            v = v | (words[:, wi + 1] << jnp.uint32(32 - sh))
        vals.append(v & mask)
    v = jnp.stack(vals, axis=-1).reshape(nb, n_units * g)[:, :RES_PER_BLOCK]
    sign = (v >> jnp.uint32(w_lo - 1)) & jnp.uint32(1)
    r = v.astype(jnp.int32) - (sign.astype(jnp.int32) << w_lo)

    a0 = anchors[:, 0].astype(jnp.int32)
    a1 = anchors[:, 1].astype(jnp.int32)
    cc = jnp.int32(coeff)

    def body(carry, rj):
        x0, x1 = carry
        pred = ((cc * x1) >> PRED_SHIFT) - x0
        xn = pred + rj
        return (x1, xn), xn

    (_, _), xs = jax.lax.scan(body, (a0, a1), r.T)  # [RES_PER_BLOCK, nb]
    out = jnp.concatenate([a0[:, None], a1[:, None], xs.T], axis=1)
    out = out.at[esc_idx].set(esc_rows.astype(jnp.int32), mode="drop")
    return out.reshape(-1).astype(jnp.int16)
