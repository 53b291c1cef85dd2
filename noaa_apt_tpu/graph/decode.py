"""Single-chip jit-compiled APT decode pipeline.

Behavioral contract: reference ``src/decode.rs:43-162`` (``decode()``).
Stage order and all numeric parameters match; the execution model does
not: every stage is traced once per (padded-length, rate, profile)
into one XLA graph with static shapes, so the whole DSP chain —
polyphase resample -> AM demod -> post-demod FIR -> sync correlation —
runs as a handful of fused convolutions on the TPU.  Only the greedy
peak bookkeeping (tiny, adaptive-window-sequential) runs on host.

Static-shape strategy: inputs are zero-padded up to a geometric bucket
(~12.5% max overhead).  Zero padding is *semantically identical* to the
reference, which treats out-of-range samples as zero (``dsp.rs:256``),
and every stage is causal or windowed, so all outputs below the true
length are unaffected.  True lengths are tracked on host.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import CARRIER_FREQ, FINAL_RATE, PX_PER_ROW, err
from ..core import Lowpass, LowpassDcRemoval
from ..core.frequency import Freq, Rate
from ..core.profiles import DecodeProfile
from ..ops import demod as dm
from ..ops import resample as rs
from ..ops import sync as sy

log = logging.getLogger(__name__)


def pad_bucket(n: int, shift: int = 3) -> int:
    """Round ``n`` up to a coarse geometric bucket (limits jit variants
    to ~2^shift per octave while wasting at most ~1/2^shift work)."""
    if n <= 0:
        return 1
    g = max(1, 1 << max(0, n.bit_length() - 1 - shift))
    return -(-n // g) * g


def _plan_resample_with_filter(
    n_in: int, input_rate: Rate, output_rate: Rate, filt
) -> tuple[Callable[[jnp.ndarray], jnp.ndarray], Callable[[int], int], np.ndarray]:
    """TPU analog of ``dsp::resample_with_filter`` (``dsp.rs:62-126``).

    Returns (jittable stage fn for padded length ``n_in``, a function
    mapping a true input length to the true output length, and the
    designed coefficients for step export).
    """
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
        plan = rs.resample_plan(n_in, l, m, coeff)
        offset = (len(coeff) - 1) // 2

        def out_len(n_true: int) -> int:
            interp = n_true * l
            return max(0, -(-(interp - offset) // m)) if interp > offset else 0

        return (lambda x: rs.fast_resample(x, plan)), out_len, coeff
    else:
        coeff = filt.design()

        def fn(x):
            return rs.decimate(rs.causal_filter(x, coeff), m)

        return fn, (lambda n_true: n_true // m), coeff


@dataclass
class DecodeResult:
    """Raw decoded image data, line by line (``decode.rs:43`` contract:
    one float sample per pixel at FINAL_RATE)."""

    image: jax.Array  # [n_rows_pad, PX_PER_ROW] float32, device
    n_rows: int
    sync_positions: Optional[list[int]]

    def image_np(self) -> np.ndarray:
        return np.asarray(self.image[: self.n_rows])

    def signal(self) -> np.ndarray:
        """Flat signal, API-compatible with the reference's return."""
        return self.image_np().reshape(-1)


class Decoder:
    """Compiles and caches decode graphs per (length-bucket, rate)."""

    def __init__(
        self,
        profile: DecodeProfile,
        peak_backend: str = "device",
        use_pallas: bool | None = None,
        ingest: str = "device",
    ):
        if profile.work_rate % FINAL_RATE != 0:
            raise err.InternalError("work_rate is not multiple of FINAL_RATE")
        self.profile = profile
        self.work_rate = Rate(profile.work_rate)
        self.samples_per_work_row = PX_PER_ROW * profile.work_rate // FINAL_RATE
        self.peak_backend = peak_backend  # "device" | "host"
        # Fused Pallas demod+FIR+corr kernel: ~17x over the XLA op chain
        # on TPU; defaults on for the TPU backend, off elsewhere (the
        # interpreter is correctness-only).
        self.use_pallas = use_pallas
        # ingest="host": rate-convert to the work rate with the native
        # C++ polyphase before upload — ~4x fewer bytes to the device.
        # Worth it when the host<->device link is the bottleneck (e.g.
        # a tunnel); "device" keeps the resample in the XLA graph.
        self.ingest = ingest
        self._stage1: dict = {}
        self._stage2: dict = {}
        # Every jit-variant built, in order — fleet mode logs this so a
        # heterogeneous batch triggering one compile per (bucket, rate)
        # pair is visible instead of silent wall-clock.
        self.compile_log: list = []

    def _note_compile(self, key) -> None:
        self.compile_log.append(key)
        log.info(
            "Building decode graph variant %s (%d variants so far)",
            key, len(self.compile_log),
        )

    def _pallas_enabled(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        return jax.default_backend() == "tpu"

    def _select_peaks(self, corr_dev, n_corr_valid: int) -> list[int]:
        """Greedy sync selection: on-device while_loop by default (only
        the peak list crosses the interconnect), host scan fallback."""
        if self.peak_backend == "device":
            return sy.find_sync_peaks_device(corr_dev, n_corr_valid, self.work_rate)
        corr = np.asarray(corr_dev[:n_corr_valid])
        return sy.find_sync_peaks(corr, self.work_rate)

    # ------------------------------------------------------------------
    def _chain_params(self):
        """Demod carrier constants, post-demod FIR taps, sync template
        (decode.rs:89-102,164-199) — shared by all stage-1 variants."""
        p = self.profile
        carrier = Freq.hz(float(CARRIER_FREQ), self.work_rate)
        cutout = Freq.from_pi_rad(
            np.float32(FINAL_RATE) / np.float32(self.work_rate.get_hz())
        )
        demod_coeff = Lowpass(
            cutout=cutout, atten=p.demodulation_atten, delta_w=cutout / 5.0
        ).design()
        template = sy.generate_sync_frame(self.work_rate)
        return carrier, demod_coeff, template

    def _get_work_chain(self, n_work_pad: int, with_corr: bool):
        """jit(work signal) -> (filtered, corr) for host-ingested input."""
        key = ("work", n_work_pad, with_corr)
        if key in self._stage1:
            return self._stage1[key]
        self._note_compile(key)
        carrier, demod_coeff, template = self._chain_params()

        fused = None
        if with_corr and self._pallas_enabled():
            from ..ops.pallas_stage import make_demod_fir_corr

            cosphi2, sinphi = dm.demod_constants(carrier)
            fused = make_demod_fir_corr(demod_coeff, template, cosphi2, sinphi, n_work_pad)

        @jax.jit
        def chain(y):
            if fused is not None:
                return fused(y)
            d = dm.demodulate(y, carrier)
            f = rs.causal_filter(d, demod_coeff)
            if with_corr:
                return f, sy.sync_correlate(f, template)
            return f, None

        entry = (chain, len(template))
        self._stage1[key] = entry
        return entry

    def _get_stage1(self, n_pad: int, input_rate: Rate, with_corr: bool, in_dtype=np.float32):
        key = (n_pad, input_rate.get_hz(), with_corr, np.dtype(in_dtype).name)
        if key in self._stage1:
            return self._stage1[key]
        self._note_compile(key)

        p = self.profile
        filt = LowpassDcRemoval(
            cutout=Freq.hz(p.resample_cutout, input_rate),
            atten=p.resample_atten,
            delta_w=Freq.hz(p.resample_delta_freq, input_rate),
        )
        res_fn, work_len_fn, _ = _plan_resample_with_filter(
            n_pad, input_rate, self.work_rate, filt
        )
        carrier, demod_coeff, template = self._chain_params()

        fused = None
        if with_corr and self._pallas_enabled():
            from ..ops.pallas_stage import make_demod_fir_corr

            cosphi2, sinphi = dm.demod_constants(carrier)
            fused = make_demod_fir_corr(
                demod_coeff, template, cosphi2, sinphi, work_len_fn(n_pad)
            )

        @jax.jit
        def stage1(x):
            # 16-bit PCM ships to the device raw (half the interconnect
            # bytes) and converts exactly to the reference's f32 values.
            x = x.astype(jnp.float32)
            y = res_fn(x)
            if fused is not None:
                return fused(y)
            d = dm.demodulate(y, carrier)
            f = rs.causal_filter(d, demod_coeff)
            if with_corr:
                return f, sy.sync_correlate(f, template)
            return f, None

        entry = (stage1, work_len_fn, len(template))
        self._stage1[key] = entry
        return entry

    def _get_stage2(self, work_pad: int, n_rows_pad: int):
        key = (work_pad, n_rows_pad)
        if key in self._stage2:
            return self._stage2[key]
        self._note_compile(("stage2",) + key)
        spr = self.samples_per_work_row
        m_final = self.work_rate.get_hz() // FINAL_RATE

        @jax.jit
        def stage2(f, pos):
            idx = pos[:, None] + jnp.arange(spr, dtype=jnp.int32)[None, :]
            rows = f[jnp.clip(idx, 0, work_pad - 1)]
            img = rows[:, ::m_final]
            # resample work->FINAL via NoFilter takes the causal-filter
            # path (dsp.rs:105-123) whose `i > j` guard zeroes sample 0.
            img = img.at[0, 0].set(0.0)
            return img

        self._stage2[key] = stage2
        return stage2

    # -- device contrast + u8 rendering (tunnel/PCIe byte reduction) ---
    @staticmethod
    @jax.jit
    def _levels_stage(img, n_rows):
        """Masked min/max + the reference's 1000-bucket histogram
        (misc.rs:129-149 semantics in f32), all on device; only 4 KB of
        buckets crosses back for the sequential scan."""
        mask = jnp.arange(img.shape[0], dtype=jnp.int32)[:, None] < n_rows
        mn = jnp.min(jnp.where(mask, img, jnp.inf))
        mx = jnp.max(jnp.where(mask, img, -jnp.inf))
        rng = mx - mn
        idx = jnp.trunc((img - mn) / rng * jnp.float32(1000.0))
        idx = jnp.clip(jnp.nan_to_num(idx, nan=0.0), 0, 999).astype(jnp.int32)
        idx = jnp.where(mask, idx, 1000)  # masked rows -> overflow bucket
        hist = jnp.zeros(1001, jnp.int32).at[idx.reshape(-1)].add(1)[:1000]
        return mn, mx, hist

    @staticmethod
    @jax.jit
    def _u8_stage(img, low, high):
        """map_signal_u8 on device (noaa_apt.rs:249-259; round half-up)."""
        v = (img - low) / (high - low) * jnp.float32(255.0)
        v = jnp.minimum(jnp.maximum(v, 0.0), 255.0)
        return jnp.floor(v + jnp.float32(0.5)).astype(jnp.uint8)

    @staticmethod
    @jax.jit
    def _telemetry_stats_stage(img):
        """Per-row telemetry band means + pooled variance on device
        (telemetry.rs:147-170); only [3, rows] floats cross back."""
        a = img[:, 994 : 994 + 44]
        b = img[:, 2034 : 2034 + 44]
        mean_a = a.mean(axis=1)
        mean_b = b.mean(axis=1)
        variance = (
            ((a - mean_a[:, None]) ** 2).sum(axis=1)
            + ((b - mean_b[:, None]) ** 2).sum(axis=1)
        ) / jnp.float32(88.0)
        return mean_a, mean_b, variance

    def telemetry_stats(self, result: "DecodeResult"):
        ma, mb, var = Decoder._telemetry_stats_stage(result.image)
        n = result.n_rows
        return np.asarray(ma[:n]), np.asarray(mb[:n]), np.asarray(var[:n])

    def render_u8(self, result: "DecodeResult", contrast_kind: str, pct: float = 0.98) -> np.ndarray:
        """Grayscale u8 image with device-computed contrast levels.

        ``contrast_kind``: "percent" or "minmax".  Exactly matches the
        host path (post.contrast) — the histogram uses identical f32
        bucket mapping and the same sequential scan.
        """
        from ..post.contrast import scan_buckets

        mn, mx, hist = Decoder._levels_stage(result.image, result.n_rows)
        if contrast_kind == "minmax":
            low, high = float(np.float32(mn)), float(np.float32(mx))
        elif contrast_kind == "percent":
            remainder = np.float32((np.float32(1.0) - np.float32(pct)) / np.float32(2.0))
            low, high = scan_buckets(
                np.asarray(hist),
                result.n_rows * PX_PER_ROW,
                remainder,
                np.float32(mn),
                np.float32(np.float32(mx) - np.float32(mn)),
            )
        else:
            raise err.InternalError(f"render_u8 does not handle contrast {contrast_kind!r}")
        return self.render_u8_levels(result, low, high)

    def render_u8_levels(self, result: "DecodeResult", low: float, high: float) -> np.ndarray:
        """u8 map with explicit levels (e.g. from telemetry wedges)."""
        u8 = Decoder._u8_stage(result.image, np.float32(low), np.float32(high))
        return np.asarray(u8[: result.n_rows])

    # ------------------------------------------------------------------
    def decode(
        self,
        signal: np.ndarray,
        input_rate: Rate,
        sync: bool = True,
        context=None,
        host_work: np.ndarray | None = None,
    ) -> DecodeResult:
        """Decode an APT recording into raw image rows.

        Mirrors reference ``decode()`` (``decode.rs:43-162``): resample
        to work rate with DC-removal lowpass, AM-demodulate at 2400 Hz,
        lowpass, sync-align (or truncate), resample to 4160 Hz.

        ``host_work``: a pre-computed work-rate signal from
        :meth:`_host_ingest` (lets a serving pipeline overlap the native
        ingest resample with device work on other passes).
        """
        spr = self.samples_per_work_row
        n_true = int(signal.shape[0])

        if host_work is None and self.ingest == "host":
            host_work = self._host_ingest(signal, input_rate, context)

        if host_work is not None:
            work_true = int(host_work.shape[0])
            if work_true < 10 * spr:
                raise err.InternalError(
                    "Got less than 10 rows of samples, audio file is too short"
                )
            w_pad = pad_bucket(work_true)
            chain, guard_len = self._get_work_chain(w_pad, sync)
            wbuf = np.zeros(w_pad, dtype=np.float32)
            wbuf[:work_true] = host_work
            f_dev, corr_dev = chain(jnp.asarray(wbuf))
        else:
            n_pad = pad_bucket(n_true)
            in_dtype = np.int16 if signal.dtype == np.int16 else np.float32

            stage1, work_len_fn, guard_len = self._get_stage1(n_pad, input_rate, sync, in_dtype)
            work_true = work_len_fn(n_true)

            if context is not None:
                context.status(0.1, f"Resampling to {self.work_rate.get_hz()}")
            if work_true < 10 * spr:
                raise err.InternalError(
                    "Got less than 10 rows of samples, audio file is too short"
                )

            x = np.zeros(n_pad, dtype=in_dtype)
            x[:n_true] = signal
            f_dev, corr_dev = stage1(jnp.asarray(x))
        work_pad = int(f_dev.shape[0])

        if sync:
            if context is not None:
                context.status(0.5, "Syncing")
            sync_pos = self._select_peaks(corr_dev, max(0, work_true - guard_len))
            log.info("Found %d sync frames", len(sync_pos))
            if len(sync_pos) < 5:
                raise err.InternalError(
                    "Found less than 5 sync frames, audio file is too short "
                    "or too noisy"
                )
            rows_pos = [p for p in sync_pos[:-1] if p + spr < work_true]
        else:
            if context is not None:
                context.status(0.5, "Skipping Syncing")
            sync_pos = None
            rows_pos = list(range(0, (work_true // spr) * spr, spr))

        if context is not None:
            context.status(0.90, "Resampling to 4160")

        n_rows = len(rows_pos)
        n_rows_pad = max(8, pad_bucket(n_rows))
        pos = np.zeros(n_rows_pad, dtype=np.int32)
        pos[:n_rows] = rows_pos
        stage2 = self._get_stage2(work_pad, n_rows_pad)
        img = stage2(f_dev, jnp.asarray(pos))

        return DecodeResult(image=img, n_rows=n_rows, sync_positions=sync_pos)

    def _host_ingest(self, signal: np.ndarray, input_rate: Rate, context=None):
        """Native C++ polyphase resample to the work rate on host
        (reference accumulation order, dsp.rs:186-289); returns the
        work signal or None to fall back to the device path."""
        import math as _math

        from ..native import fast_resample_native

        p = self.profile
        g = _math.gcd(input_rate.get_hz(), self.work_rate.get_hz())
        l = self.work_rate.get_hz() // g
        m = input_rate.get_hz() // g
        if l <= 1:
            return None  # decimation path stays on device
        interpolated = input_rate.checked_mul(l)
        if interpolated is None:
            raise err.RateOverflowError(
                "Can't resample, looks like the sample rates do not have a big "
                f"divisor in common. input_rate: {input_rate.get_hz()}, "
                f"output_rate: {self.work_rate.get_hz()}, l: {l}, m: {m}"
            )
        filt = LowpassDcRemoval(
            cutout=Freq.hz(p.resample_cutout, input_rate),
            atten=p.resample_atten,
            delta_w=Freq.hz(p.resample_delta_freq, input_rate),
        )
        coeff = filt.resample(input_rate, interpolated).design()
        n_true = int(signal.shape[0])
        interp = n_true * l
        offset = (len(coeff) - 1) // 2
        out_len = max(0, -(-(interp - offset) // m)) if interp > offset else 0
        if context is not None:
            context.status(0.1, f"Resampling to {self.work_rate.get_hz()} (host)")
        return fast_resample_native(
            np.asarray(signal, np.float32), l, m, coeff, out_len
        )
