"""Streaming (live) APT decode: feed PCM chunks, get image rows out.

No reference counterpart — the reference (decode.rs:43-162) requires
the whole recording in RAM.  A ground station decoding DURING the pass
instead pushes samples as they arrive:

    sd = StreamingDecoder(STANDARD, Rate(11025))
    for block in audio_source:        # any chunk sizes
        for row in sd.push(block):    # [2080] f32 rows as they finalize
            ...
    rows = sd.finish()                # the tail
    sd.sync_positions                 # same list the offline decode logs

The contract: pushing a recording through in arbitrary chunk sizes
yields exactly ``Decoder(profile).decode(signal, rate)``'s sync
positions on every backend, and **bit-identical rows vs the portable
(conv-op) decode graph** — asserted in tests/test_stream.py on CPU.
On TPU the offline fast path runs the banded-MXU chain whose f32
accumulation order differs, so row floats there sit within a few ulp
(measured max rel ~4e-6 on hardware) with integer decisions
identical — the same scoping as the batched-vs-unbatched fast paths
(docs/PERFORMANCE.md "Numerics").  The exactness falls out of the same
chunk math the sequence-sharded decoder uses (parallel/shard.py):
work-chunk boundaries aligned to the packed-matmul row granularity so
f32 accumulations coincide with the single-chip graph, halos wide
enough for the resampler window, the demod's one-sample history, the
FIR tail and the correlation guard — here the "halo exchange" is just
slicing a host ring buffer instead of a ``ppermute``.

Device work is one fixed-shape jit per (profile, input-rate): every
pushed chunk reuses it, so a live session compiles once.  The greedy
sync selection runs incrementally on host — it is the reference's
sequential fold (decode.rs:236-254), which makes it a pure left fold
over the correlation stream; peaks other than the current last are
final and their rows can be emitted immediately.
"""

from __future__ import annotations

import logging
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import CARRIER_FREQ, FINAL_RATE, PX_PER_ROW, err
from .core import Lowpass, LowpassDcRemoval
from .core.frequency import Freq, Rate
from .core.profiles import DecodeProfile
from .ops import demod as dm
from .ops import resample as rs
from .ops import sync as sy
from .ops.resample import _phase_tables

log = logging.getLogger(__name__)


def _ceil_to(x: int, q: int) -> int:
    return -(-x // q) * q


class _GreedyState:
    """Incremental greedy sync selection — the reference's sequential
    fold (decode.rs:236-254) fed segment by segment.  ``peaks[:-1]``
    are final (the loop only appends, or replaces the LAST entry)."""

    def __init__(self, spr: int):
        self.spr = spr
        self.md = spr * 8 // 10
        self.peaks: list[tuple[int, float]] = [(0, 0.0)]
        self.i = 0  # next corr index to consume

    def feed(self, corr: np.ndarray) -> None:
        peaks, spr, md = self.peaks, self.spr, self.md
        i = self.i
        for c in corr.astype(np.float32, copy=False):
            c = float(c)
            if i - peaks[-1][0] > md:
                while i // spr > len(peaks):
                    peaks.append((i, c))
            elif c > peaks[-1][1]:
                peaks[-1] = (i, c)
            i += 1
        self.i = i

    def positions(self) -> list[int]:
        return [p for p, _ in self.peaks]


class StreamingDecoder:
    """Decode an APT pass incrementally, bit-exact vs the offline path.

    ``push(samples)`` accepts float32 PCM at ``input_rate`` in any
    chunk sizes and returns newly-finalized image rows
    ``[k, PX_PER_ROW] float32``; ``finish()`` flushes the tail.
    ``sync_positions`` (after finish) matches the offline decoder's.

    ``sync=False`` slices rows at the nominal rate instead (the
    reference's --no-sync behavior).
    """

    def __init__(
        self,
        profile: DecodeProfile,
        input_rate: Rate,
        sync: bool = True,
        chunk_rows: int = 8,
    ):
        self.profile = profile
        self.input_rate = input_rate
        self.sync = sync
        self.work_rate = Rate(profile.work_rate)
        self.spr = PX_PER_ROW * profile.work_rate // FINAL_RATE
        self.m_final = profile.work_rate // FINAL_RATE

        g = math.gcd(input_rate.get_hz(), self.work_rate.get_hz())
        l = self.work_rate.get_hz() // g
        m = input_rate.get_hz() // g
        self.l, self.m = l, m

        filt = LowpassDcRemoval(
            cutout=Freq.hz(profile.resample_cutout, input_rate),
            atten=profile.resample_atten,
            delta_w=Freq.hz(profile.resample_delta_freq, input_rate),
        )
        if l > 1:
            interpolated = input_rate.checked_mul(l)
            if interpolated is None:
                raise err.RateOverflowError("interpolated rate overflows u32")
            coeff = filt.resample(input_rate, interpolated).design()
            offset = (len(coeff) - 1) // 2

            def work_len(n: int) -> int:
                interp = n * l
                return max(0, -(-(interp - offset) // m)) if interp > offset else 0

        else:
            coeff = filt.design()

            def work_len(n: int) -> int:
                return n // m

        self._work_len = work_len

        align = rs.out_alignment(l, m, len(coeff))
        # Work chunk size W: ~chunk_rows rows, aligned so packed-matmul
        # dot rows coincide with the single-chip graph bit-for-bit.
        w = _ceil_to(max(1, chunk_rows) * self.spr, align)
        ci = w * m // l
        self.w, self.ci = w, ci

        carrier = Freq.hz(float(CARRIER_FREQ), self.work_rate)
        cutout = Freq.from_pi_rad(
            np.float32(FINAL_RATE) / np.float32(self.work_rate.get_hz())
        )
        demod_coeff = Lowpass(
            cutout=cutout, atten=profile.demodulation_atten, delta_w=cutout / 5.0
        ).design()
        template = sy.generate_sync_frame(self.work_rate)
        self.guard = len(template)

        k_d = len(demod_coeff)
        l_ctx = _ceil_to(k_d + 1, align)
        g_ctx = _ceil_to(self.guard, l)
        if l > 1:
            _, s_c, _, t_taps, _ = _phase_tables(rs.resample_plan(8 * l, l, m, coeff))
            l_in = l_ctx * m // l
            r_in = g_ctx * m // l + int(s_c.max()) + t_taps + 1
        else:
            k_r = len(coeff)
            l_in = l_ctx * m + k_r - 1
            r_in = g_ctx * m
        self.l_ctx, self.g_ctx, self.l_in, self.r_in = l_ctx, g_ctx, l_in, r_in
        ext_n = l_in + ci + r_in
        ext_out = l_ctx + w + g_ctx

        cosphi2, sinphi = dm.demod_constants(carrier)
        # np constants (not eager jnp arrays): device-array constants
        # are fetched back at lowering time — minutes over the tunnel.
        dcoeff = np.asarray(demod_coeff)
        tmpl = np.ascontiguousarray(template.astype(np.float32))
        self.chunk_bit_exact = True  # may flip below (ADVICE r4)
        if l > 1:
            plan = rs.resample_plan(ext_n, l, m, coeff, out_len=ext_out)
            # ADVICE r4: surface the VMEM-fallback degraded mode
            # programmatically (chunked != single-chip bit equality).
            self.chunk_bit_exact = plan.chunk_bit_stable
            if not self.chunk_bit_exact:
                log.warning(
                    "rate pair l=%d m=%d falls back to the batch-shape-"
                    "sensitive dot; streamed decode is not bit-identical "
                    "to the offline graph (chunk_bit_exact=False)", l, m,
                )
            quirk = None
            coeff_j = None
        else:
            plan = None
            # Reference FIR `i > j` startup quirk at global sample 0
            # (first chunk only) — identical to parallel/shard.py.
            k_r = len(coeff)
            q = np.zeros(ext_out, dtype=np.float32)
            for k in range(l_ctx, min(ext_out, l_ctx + (k_r - 1) // m + 1)):
                idx = (k - l_ctx) * m
                if idx < k_r:
                    q[k] = coeff[idx]
            quirk = q
            coeff_j = np.ascontiguousarray(coeff[::-1].astype(np.float32))

        def chunk_fn(ext, first):
            # `first` (traced bool) plays shard_fn's `idx == 0` role:
            # work samples before global 0 do not exist single-chip.
            if l > 1:
                y = rs.fast_resample(ext, plan)
                y = jnp.where(first & (jnp.arange(ext_out) < l_ctx), 0.0, y)
            else:
                f_full = jax.lax.conv_general_dilated(
                    ext[None, None, :],
                    coeff_j[None, None, :],
                    window_strides=(1,),
                    padding=[(len(coeff) - 1, 0)],
                    dimension_numbers=("NCH", "OIH", "NCH"),
                    precision=jax.lax.Precision.HIGHEST,
                )[0, 0]
                y = jax.lax.slice(
                    f_full, (len(coeff) - 1,), (len(coeff) - 1 + ext_out * m,), (m,)
                )
                y = y - jnp.where(first, 1.0, 0.0) * (quirk * ext[l_in])
                y = jnp.where(first & (jnp.arange(ext_out) <= l_ctx), 0.0, y)
            dem = dm.demod_body(y[:-1], y[1:], cosphi2, sinphi)
            dem = jnp.concatenate([jnp.zeros((1,), y.dtype), dem])
            dem = jnp.where(first & (jnp.arange(ext_out) == l_ctx), 0.0, dem)
            f = rs.causal_filter(dem, dcoeff)
            f_seg = f[l_ctx : l_ctx + w]
            fc = f[l_ctx : l_ctx + w + g_ctx]
            corr = jax.lax.conv_general_dilated(
                fc[None, None, :],
                tmpl[None, None, :],
                window_strides=(1,),
                padding=[(0, 0)],
                dimension_numbers=("NCH", "OIH", "NCH"),
                precision=jax.lax.Precision.HIGHEST,
            )[0, 0][:w]
            return f_seg, corr

        self._chunk_fn = jax.jit(chunk_fn)

        # -- mutable stream state --
        self._in_buf = np.zeros(0, np.float32)  # input tail (absolute)
        self._in_start = 0  # absolute index of _in_buf[0]
        self._n_in = 0  # total input samples received
        self._k = 0  # chunks processed
        self._f_buf = np.zeros(0, np.float32)  # work-signal tail
        self._f_start = 0  # absolute work index of _f_buf[0]
        self._corr_buf = np.zeros(0, np.float32)  # unconsumed corr tail
        self._corr_fed = 0  # corr samples handed to the selector
        self._greedy = _GreedyState(self.spr)
        self._emitted = 0  # rows emitted so far
        self._finished = False
        self.sync_positions: list[int] | None = None

    # -- internals -----------------------------------------------------
    def _run_chunk(self, pad_to: int | None = None) -> None:
        """Process chunk self._k; ``pad_to`` zero-pads a final partial
        window (finish), mirroring the offline bucket padding."""
        k, ci, l_in, r_in = self._k, self.ci, self.l_in, self.r_in
        a = k * ci - l_in  # absolute window start (may be < 0)
        b = (k + 1) * ci + r_in
        ext = np.zeros(b - a, np.float32)
        lo = max(a, self._in_start)
        hi = min(b, self._n_in if pad_to is None else pad_to)
        if hi > lo:
            src = self._in_buf[lo - self._in_start : hi - self._in_start]
            ext[lo - a : hi - a] = src
        f_seg, corr = self._chunk_fn(jnp.asarray(ext), k == 0)
        f_seg = np.asarray(f_seg)
        corr = np.asarray(corr)
        if self._f_buf.size == 0:
            self._f_start = k * self.w
            self._f_buf = f_seg
        else:
            self._f_buf = np.concatenate([self._f_buf, f_seg])
        self._corr_buf = np.concatenate([self._corr_buf, corr])
        self._k += 1
        # Drop input this and all future chunks no longer need.
        keep_from = max(self._in_start, self._k * ci - l_in)
        self._in_buf = self._in_buf[keep_from - self._in_start :]
        self._in_start = keep_from

    def _feed_selector(self, n_valid_cap: int) -> None:
        """Hand the selector corr up to ``n_valid_cap`` (monotone lower
        bound of the offline n_valid, so it never overshoots)."""
        have = self._corr_fed + self._corr_buf.shape[0]
        take = min(have, n_valid_cap) - self._corr_fed
        if take > 0:
            self._greedy.feed(self._corr_buf[:take])
            self._corr_buf = self._corr_buf[take:]
            self._corr_fed += take

    def _emit_rows(self, work_true_bound: int, final: bool) -> np.ndarray:
        """Rows for finalized peaks (offline: sync_pos[:-1] filtered by
        p + spr < work_true).  ``work_true_bound`` is the current lower
        bound of work_true (exact when ``final``)."""
        spr, m_final = self.spr, self.m_final
        if self.sync:
            peaks = self._greedy.peaks
            candidates = [p for p, _ in (peaks[:-1] if not final else peaks[:-1])]
            rows_pos = [p for p in candidates if p + spr < work_true_bound]
        else:
            n_rows = work_true_bound // spr if final else max(
                0, (work_true_bound - spr) // spr  # strict: wait for full row
            )
            rows_pos = [r * spr for r in range(n_rows)]
        new_pos = rows_pos[self._emitted :]
        out = []
        for p in new_pos:
            if p + spr > self._f_start + self._f_buf.shape[0]:
                new_pos = new_pos[: len(out)]
                break
            seg = self._f_buf[p - self._f_start : p - self._f_start + spr]
            out.append(seg[::m_final])
        if not out:
            return np.zeros((0, PX_PER_ROW), np.float32)
        rows = np.stack(out)
        if self._emitted == 0:
            rows[0, 0] = 0.0  # NoFilter causal-path quirk (decode.rs:158)
        self._emitted += len(out)
        # Trim f no earlier row will need.
        if self.sync:
            frontier = min(
                (p for p, _ in self._greedy.peaks[self._emitted :]),
                default=self._f_start + self._f_buf.shape[0],
            )
        else:
            frontier = self._emitted * spr
        keep_from = max(self._f_start, frontier)
        self._f_buf = self._f_buf[keep_from - self._f_start :]
        self._f_start = keep_from
        return rows

    # -- API -------------------------------------------------------------
    def push(self, samples: np.ndarray) -> np.ndarray:
        """Feed PCM samples; returns newly-final rows [k, 2080] f32."""
        if self._finished:
            raise err.InternalError("push() after finish()")
        samples = np.asarray(samples, np.float32).reshape(-1)
        if samples.size:
            self._in_buf = np.concatenate([self._in_buf, samples])
            self._n_in += samples.size
        while self._n_in >= (self._k + 1) * self.ci + self.r_in:
            self._run_chunk()
        bound = self._work_len(self._n_in)
        if self.sync:
            self._feed_selector(max(0, bound - self.guard))
        return self._emit_rows(bound, final=False)

    def finish(self) -> np.ndarray:
        """Flush: process the zero-padded tail, finalize peaks, emit the
        remaining rows.  Afterwards ``sync_positions`` is set."""
        if self._finished:
            return np.zeros((0, PX_PER_ROW), np.float32)
        self._finished = True
        work_true = self._work_len(self._n_in)
        # Process remaining chunks (zero-padded) until every work
        # sample in [0, work_true) exists.
        while self._k * self.w < work_true:
            self._run_chunk(pad_to=self._n_in)
        if self.sync:
            self._feed_selector(max(0, work_true - self.guard))
            self.sync_positions = self._greedy.positions()
        rows = self._emit_rows(work_true, final=True)
        return rows

    @property
    def n_rows(self) -> int:
        return self._emitted
