"""Lossless fixed-width residual codec for the i16 work signal.

Cuts the host->device bytes of the byte-faithful serving mode
(``ingest="host16c"``) ~1.2x on real signals with a scheme whose
DECODER runs inside the XLA graph (the link moves whatever
``device_put`` ships, so host-side entropy coding would not help —
decompression must happen on device, which rules out variable-length
entropy codes and leaves fixed-width packing).

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

- **Per-block packing**: blocks of 128 samples = 2 raw i16 anchors +
  126 residuals at the block's own bit width ``w = bits(max |r|)``.
  Block data is word-aligned (``ceil(126*w/32)`` u32 words); block
  offsets are derived from the width array by prefix sum on device, so
  only ``words``, ``widths`` (u8) and ``anchors`` (i16 pairs) ship.

Measured on the bench fleet (synthesized 10-min passes, 15 dB noise):
13.4 bits/sample vs 16 -> upload 15.0 MB -> 12.6 MB per pass.  Clean
signals compress further (width tracks the noise floor); the scheme
never expands beyond w=18 blocks (the residual's worst case is
|r| <= |x| + |pred| < 2^17.5, handled like any other width).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK = 128
RES_PER_BLOCK = BLOCK - 2  # two raw anchors per block
PRED_SHIFT = 14
MAX_WIDTH = 18


def predictor_coeff(work_rate_hz: int, carrier_hz: float = 2400.0) -> int:
    """Fixed-point resonator coefficient C (see module docstring)."""
    return int(round(2.0 * np.cos(2.0 * np.pi * carrier_hz / work_rate_hz)
                     * (1 << PRED_SHIFT)))


@dataclass
class PackedWork:
    """Encoded work signal (host arrays, upload-ready)."""

    words: np.ndarray    # u32 [n_words] packed residual bits
    widths: np.ndarray   # u8  [nb] per-block residual bit width
    anchors: np.ndarray  # i16 [nb, 2] first two samples of each block
    n_samples: int       # true sample count (<= nb*BLOCK)
    coeff: int           # predictor coefficient C

    @property
    def nbytes(self) -> int:
        return self.words.nbytes + self.widths.nbytes + self.anchors.nbytes


def seal_packed(p: PackedWork, nb: int, nw_pad: int) -> np.ndarray:
    """Coalesce a PackedWork into ONE u32 upload buffer:

        [ceil(nb/4) words: u8 widths] [nb words: i16 anchor pairs]
        [nw_pad words: packed residual bits]

    One buffer = one gated (chunked, pipelined) upload and a single
    jit argument per pass — measured on the tunnel backend, three
    small per-pass ``device_put``s cost more wire wall than the codec
    saved (~0.15-0.3 s of per-put overhead each under load)."""
    assert p.widths.shape[0] <= nb and len(p.words) <= nw_pad
    nwid = -(-nb // 4)
    buf = np.zeros(nwid + nb + nw_pad, np.uint32)
    w8 = np.zeros(nwid * 4, np.uint8)
    w8[: p.widths.shape[0]] = p.widths
    buf[:nwid] = w8.view(np.uint32)
    an = np.zeros((nb, 2), np.int16)
    an[: p.anchors.shape[0]] = p.anchors
    buf[nwid : nwid + nb] = an.view(np.uint32).reshape(-1)
    buf[nwid + nb : nwid + nb + len(p.words)] = p.words
    return buf


def open_packed_device(buf, nb: int):
    """Split a sealed buffer back into (words, widths, anchors) on
    device (pure bitcasts/slices — no host round trip).  ``nb`` is
    static; ``nw_pad`` is implied by the buffer length."""
    import jax
    import jax.numpy as jnp

    nwid = -(-nb // 4)
    widths = jax.lax.bitcast_convert_type(
        buf[:nwid], jnp.uint8
    ).reshape(-1)[:nb]
    anchors = jax.lax.bitcast_convert_type(
        buf[nwid : nwid + nb], jnp.int16
    )  # [nb, 2]: low half = anchor 0
    words = buf[nwid + nb :]
    return words, widths, anchors


def _residuals_np(x: np.ndarray, coeff: int) -> np.ndarray:
    """Residual stream for samples [2:] (i64 to hold the worst case).

    ``>>`` on a negative int in numpy is an arithmetic (floor) shift —
    the exact semantics the device decoder and the C++ encoder use."""
    xi = x.astype(np.int64)
    pred = ((coeff * xi[1:-1]) >> PRED_SHIFT) - xi[:-2]
    return xi[2:] - pred


def pack_work_i16(x: np.ndarray, work_rate_hz: int) -> PackedWork:
    """Encode an i16 work signal (vectorized numpy reference encoder;
    the C++ encoder in native/ is bit-identical and faster)."""
    assert x.dtype == np.int16
    n = int(x.shape[0])
    nb = -(-n // BLOCK)
    xb = np.zeros(nb * BLOCK, np.int16)
    xb[:n] = x
    blocks = xb.reshape(nb, BLOCK)
    anchors = blocks[:, :2].copy()

    coeff = predictor_coeff(work_rate_hz)
    # Residuals are block-local (each block re-seeds from its anchors).
    xi = blocks.astype(np.int64)
    pred = ((coeff * xi[:, 1:-1]) >> PRED_SHIFT) - xi[:, :-2]
    r = xi[:, 2:] - pred  # [nb, RES_PER_BLOCK]

    # Signed width per block: smallest w with
    # -2^(w-1) <= r <= 2^(w-1)-1 for every residual in the block.
    neg_bits = np.ceil(np.log2(np.maximum(-r.min(axis=1), 1))).astype(np.int64)
    pos_bits = np.ceil(np.log2(np.maximum(r.max(axis=1) + 1, 1))).astype(np.int64)
    w = np.maximum(np.maximum(neg_bits, pos_bits) + 1, 1)
    # Exactness check of the closed form (cheap, catches edge cases
    # like r_min == -2^(w-1) exactly and float log2 rounding):
    lo, hi = -(np.int64(1) << (w - 1)), (np.int64(1) << (w - 1)) - 1
    bad = ~(((r >= lo[:, None]) & (r <= hi[:, None])).all(axis=1))
    if bad.any():  # widen any block the float log2 under-sized
        w = np.where(bad, w + 1, w)
        lo, hi = -(np.int64(1) << (w - 1)), (np.int64(1) << (w - 1)) - 1
        assert ((r >= lo[:, None]) & (r <= hi[:, None])).all()

    nw = (RES_PER_BLOCK * w + 31) >> 5
    off = np.concatenate([[0], np.cumsum(nw)[:-1]])
    total = int(nw.sum())
    words = np.zeros(total, np.uint64)  # u64 accumulate, fold to u32 after

    # Vectorized packing: scatter-add each residual's bits into its
    # word (and spill into the next word via the u64 accumulator).
    field = (r & ((np.int64(1) << w[:, None]) - 1)).astype(np.uint64)  # two's compl.
    j = np.arange(RES_PER_BLOCK, dtype=np.int64)[None, :]
    bit = j * w[:, None]
    wi = off[:, None] + (bit >> 5)
    sh = (bit & 31).astype(np.uint64)
    lo64 = field << sh  # up to 18+31 = 49 bits
    np.bitwise_or.at(words, wi.reshape(-1), lo64.reshape(-1) & np.uint64(0xFFFFFFFF))
    spill = (lo64 >> np.uint64(32)).reshape(-1)
    has_spill = spill != 0
    np.bitwise_or.at(
        words, (wi.reshape(-1) + 1)[has_spill], spill[has_spill]
    )
    return PackedWork(
        words=words.astype(np.uint32),
        widths=w.astype(np.uint8),
        anchors=anchors,
        n_samples=n,
        coeff=coeff,
    )


def unpack_work_np(p: PackedWork) -> np.ndarray:
    """Host reference decoder (numpy, sequential per block but
    vectorized across blocks) — the oracle the device graph and the
    C++ encoder are tested against."""
    nb = p.widths.shape[0]
    w = p.widths.astype(np.int64)
    nw = (RES_PER_BLOCK * w + 31) >> 5
    off = np.concatenate([[0], np.cumsum(nw)[:-1]])
    words = p.words.astype(np.uint64)
    j = np.arange(RES_PER_BLOCK, dtype=np.int64)[None, :]
    bit = j * w[:, None]
    wi = off[:, None] + (bit >> 5)
    sh = (bit & 31).astype(np.uint64)
    lo = words[wi]
    hi = words[np.minimum(wi + 1, len(words) - 1)] if len(words) else np.zeros_like(wi, np.uint64)
    val = ((lo >> sh) | np.where(sh == 0, np.uint64(0), hi << (np.uint64(32) - sh))) & (
        (np.uint64(1) << w[:, None].astype(np.uint64)) - np.uint64(1)
    )
    sign = (val >> (w[:, None] - 1).astype(np.uint64)) & np.uint64(1)
    r = val.astype(np.int64) - (sign.astype(np.int64) << w[:, None])

    out = np.zeros((nb, BLOCK), np.int64)
    out[:, :2] = p.anchors.astype(np.int64)
    for jj in range(RES_PER_BLOCK):
        pred = ((p.coeff * out[:, jj + 1]) >> PRED_SHIFT) - out[:, jj]
        out[:, jj + 2] = pred + r[:, jj]
    flat = out.reshape(-1)[: p.n_samples]
    return flat.astype(np.int16)


def unpack_work_device(words, widths, anchors, coeff: int, nb: int):
    """On-device decoder: (u32 words, u8 widths, i16 anchors[nb,2]) ->
    i16 work signal [nb*BLOCK].  Pure integer arithmetic; jit-traceable
    with static nb.  Bit-identical to :func:`unpack_work_np` (tested).

    Corrupt streams produce garbage samples (i32 wraparound), never a
    crash — the same contract as feeding a corrupt WAV."""
    import jax
    import jax.numpy as jnp

    w = widths.astype(jnp.int32)  # [nb]
    nw = (RES_PER_BLOCK * w + 31) >> 5
    off = jnp.cumsum(nw) - nw  # exclusive prefix sum
    j = jnp.arange(RES_PER_BLOCK, dtype=jnp.int32)[None, :]
    bit = j * w[:, None]
    wi = off[:, None] + (bit >> 5)
    n_words = words.shape[0]
    wu = words.astype(jnp.uint32)
    lo = wu[jnp.clip(wi, 0, n_words - 1)]
    hi = wu[jnp.clip(wi + 1, 0, n_words - 1)]
    sh = (bit & 31).astype(jnp.uint32)
    # (hi << (32 - sh)) at sh == 0 would shift by 32 (undefined): the
    # select routes that lane to 0 before the shift result is used,
    # and the shift amount is clamped to 31 to keep the op defined.
    hi_part = jnp.where(
        sh == 0, jnp.uint32(0), hi << jnp.minimum(jnp.uint32(32) - sh, jnp.uint32(31))
    )
    mask = ((jnp.uint32(1) << jnp.minimum(w, 31).astype(jnp.uint32)[:, None])
            - jnp.uint32(1))
    val = ((lo >> sh) | hi_part) & mask
    sign = (val >> jnp.maximum(w - 1, 0).astype(jnp.uint32)[:, None]) & jnp.uint32(1)
    r = val.astype(jnp.int32) - jnp.where(
        sign == 1, jnp.int32(1) << jnp.minimum(w, 30)[:, None], 0
    )

    a0 = anchors[:, 0].astype(jnp.int32)
    a1 = anchors[:, 1].astype(jnp.int32)
    cc = jnp.int32(coeff)

    def body(carry, rj):
        x0, x1 = carry
        pred = ((cc * x1) >> PRED_SHIFT) - x0
        xn = pred + rj
        return (x1, xn), xn

    (_, _), xs = jax.lax.scan(body, (a0, a1), r.T)  # xs: [RES_PER_BLOCK, nb]
    out = jnp.concatenate([a0[:, None], a1[:, None], xs.T], axis=1)
    return out.reshape(-1).astype(jnp.int16)
