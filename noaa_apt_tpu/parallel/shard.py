"""Multi-chip decode: sequence sharding with ring halo exchange.

The reference is single-threaded over one in-RAM Vec (SURVEY.md
section 2.2/5.7) — this module is the TPU re-architecture it cannot do:

- **Sequence parallelism (SP)** over a ``Mesh("seq")``: the recording's
  time axis is split into per-device chunks.  FIR/resample windows and
  the sync-correlation guard need neighbor context, exchanged as
  fixed-width boundary tails via ``jax.lax.ppermute`` (a ring halo —
  the moral analog of ring attention for chunked convolution).
- **Data parallelism (DP)**: a batch of recordings shards over a
  ``"data"`` axis (BASELINE config 5: fleets of passes per host).

Exactness: chunk boundaries are phase-aligned to the polyphase
decimator (per-device output count W is a multiple of the interpolation
factor l), so every device evaluates exactly the same input windows the
single-chip graph does; halo masking reproduces the global zero-padding
at the recording edges.  The sharded decode is bit-identical to
single-chip (tested in tests/test_parallel.py), which replaces the
reference's nonexistent distributed tests.
"""

from __future__ import annotations

import logging
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import CARRIER_FREQ, FINAL_RATE, err
from ..core import Lowpass, LowpassDcRemoval
from ..core.frequency import Freq, Rate
from ..core.profiles import DecodeProfile
from ..graph.decode import DecodeResult, Decoder, _check_sync_count, pad_bucket
from ..ops import demod as dm
from ..ops import resample as rs
from ..ops import sync as sy
from ..ops.resample import _phase_tables

log = logging.getLogger(__name__)


def _ceil_to(x: int, q: int) -> int:
    return -(-x // q) * q


class ShardedDecoder(Decoder):
    """Decode one long recording across a device mesh (time-sharded).

    Drop-in for :class:`Decoder`; stage 1 (resample/demod/FIR/corr)
    runs under ``shard_map`` over ``mesh`` axis ``"seq"``; greedy sync
    selection stays on host; row gather runs GSPMD-sharded.
    """

    def __init__(self, profile: DecodeProfile, mesh: Mesh, axis: str = "seq"):
        super().__init__(profile)
        self.mesh = mesh
        self.axis = axis
        self.n_dev = mesh.shape[axis]
        # False when a compiled rate pair's resample had to fall back
        # to the batch-shape-sensitive dot (ResamplePlan.chunk_bit_stable)
        # — callers relying on sharded==single-chip byte equality must
        # check this.
        self.chunk_bit_exact = True

    # -- geometry ------------------------------------------------------
    def _geometry(self, n_true: int, input_rate: Rate, align: int | None = None):
        g = math.gcd(input_rate.get_hz(), self.work_rate.get_hz())
        l = self.work_rate.get_hz() // g
        m = input_rate.get_hz() // g
        d = self.n_dev
        # Per-device work-output count W: multiple of ``align`` — at
        # least l (every chunk shares the polyphase phase pattern), and
        # the packed-matmul row granularity J*l when that mode applies
        # (rs.out_alignment), so chunk dot rows coincide with the
        # single-chip ones bit-for-bit.  Input chunk Ci = W*m/l.
        # +align margin guarantees n_pad = D*Ci >= n_true after rounding.
        align = l if align is None else align
        out_needed = pad_bucket(max(1, -(-n_true * l // m)) + align)
        w = _ceil_to(_ceil_to(out_needed, d) // d, align)
        ci = w * m // l
        n_pad = d * ci
        return l, m, d, w, ci, n_pad

    def _get_stage1_sharded(self, n_true_key: int, input_rate: Rate):
        key = ("sharded", n_true_key, input_rate.get_hz())
        if key in self._stage1:
            return self._stage1[key]
        self._note_compile(key)

        p = self.profile
        gdiv = math.gcd(input_rate.get_hz(), self.work_rate.get_hz())
        l0 = self.work_rate.get_hz() // gdiv
        m0 = input_rate.get_hz() // gdiv

        filt = self._ingest_filter(input_rate)
        if l0 > 1:
            interpolated = input_rate.checked_mul(l0)
            if interpolated is None:
                raise err.RateOverflowError("interpolated rate overflows u32")
            coeff = filt.resample(input_rate, interpolated).design()
        else:
            # Decimation-only rates (input a multiple of the work rate):
            # the single-chip path is causal_filter + decimate
            # (dsp.rs:105-123); sharded, each chunk filters with a
            # (K-1)-sample left halo and decimates in phase (Ci = W*m).
            coeff = filt.design()

        align = rs.out_alignment(l0, m0, len(coeff))
        l, m, d, w, ci, n_pad = self._geometry(n_true_key, input_rate, align)

        carrier = Freq.hz(float(CARRIER_FREQ), self.work_rate)
        cutout = Freq.from_pi_rad(
            np.float32(FINAL_RATE) / np.float32(self.work_rate.get_hz())
        )
        demod_coeff = Lowpass(
            cutout=cutout, atten=p.demodulation_atten, delta_w=cutout / 5.0
        ).design()
        template = sy.generate_sync_frame(self.work_rate)

        k_d = len(demod_coeff)
        guard = len(template)
        # Work-domain contexts.  The left context is rounded to the
        # resampler's alignment (chunk-local output 0 sits at global
        # dW - l_ctx, which must land on a packed-dot row boundary);
        # the right context only needs phase (l) integrality.
        l_ctx = _ceil_to(k_d + 1, align)
        g_ctx = _ceil_to(guard, l)
        # Input-domain halos.
        if l > 1:
            _, s_c, _, t_taps, _ = _phase_tables(rs.resample_plan(8 * l, l, m, coeff))
            l_in = l_ctx * m // l
            r_in = g_ctx * m // l + int(s_c.max()) + t_taps + 1
        else:
            k_r = len(coeff)
            l_in = l_ctx * m + k_r - 1
            r_in = g_ctx * m
        if max(l_in, r_in) > ci:
            raise err.InternalError(
                f"Chunk too small for halo exchange: Ci={ci}, halo={max(l_in, r_in)}; "
                "use fewer devices or a longer recording"
            )
        ext_n = l_in + ci + r_in
        ext_out = l_ctx + w + g_ctx
        if l > 1:
            plan = rs.resample_plan(ext_n, l, m, coeff, out_len=ext_out)
            if not plan.chunk_bit_stable:
                # ADVICE r4: the VMEM-overflow einsum fallback is
                # batch-shape sensitive, so this rate pair's sharded
                # decode is only ulp-close to single-chip — record it
                # programmatically, don't just log.
                self.chunk_bit_exact = False
                log.warning(
                    "rate pair l=%d m=%d falls back to the batch-shape-"
                    "sensitive dot; sharded decode is not bit-identical "
                    "to single-chip (ShardedDecoder.chunk_bit_exact=False)",
                    l, m,
                )
            quirk = None
        else:
            plan = None
            # The reference FIR's strict `i > j` guard removes the
            # coeff[i]*x[0] term from the first K outputs
            # (dsp.rs:386-410); at work sample k of the extended chunk
            # that term is coeff[(k - l_ctx) * m] * x_global[0], present
            # only on device 0.
            quirk = np.zeros(ext_out, dtype=np.float32)
            for k in range(l_ctx, min(ext_out, l_ctx + (k_r - 1) // m + 1)):
                i = (k - l_ctx) * m
                if i < k_r:
                    quirk[k] = coeff[i]
            # Keep constants as np arrays: eager jnp.asarray makes
            # committed device arrays that lowering fetches back to
            # host (minutes through the axon tunnel).
            coeff_j = np.ascontiguousarray(coeff[::-1].astype(np.float32))
        cosphi2, sinphi = dm.demod_constants(carrier)
        dcoeff = np.asarray(demod_coeff)
        tmpl = np.ascontiguousarray(template.astype(np.float32))
        axis = self.axis

        def shard_fn(x_chunk):  # [1?, Ci] -> per-device chunk
            x_chunk = x_chunk.reshape(ci)
            idx = jax.lax.axis_index(axis)
            nd = jax.lax.axis_size(axis)
            # Ring halo exchange of boundary tails (ICI neighbors).
            left = jax.lax.ppermute(
                x_chunk[-l_in:], axis, [(i, (i + 1) % nd) for i in range(nd)]
            )
            right = jax.lax.ppermute(
                x_chunk[:r_in], axis, [(i, (i - 1) % nd) for i in range(nd)]
            )
            # Global edges: the recording is zero-padded outside [0, N).
            left = jnp.where(idx == 0, 0.0, left)
            right = jnp.where(idx == nd - 1, 0.0, right)
            ext = jnp.concatenate([left, x_chunk, right])

            if l > 1:
                y = rs.fast_resample(ext, plan)  # work [dW-Lctx, (d+1)W+Gctx)
                # Work samples before global 0 do not exist single-chip
                # (the FIR sees zero-padding there); device 0 must zero
                # them even though their windows touch real samples near
                # the boundary.
                y = jnp.where((idx == 0) & (jnp.arange(ext_out) < l_ctx), 0.0, y)
            else:
                # Plain causal FIR over the extended chunk, then in-phase
                # decimation: work sample k sits at filtered index
                # (K-1) + k*m (the left halo length makes this exact).
                f_full = jax.lax.conv_general_dilated(
                    ext[None, None, :],
                    coeff_j[None, None, :],
                    window_strides=(1,),
                    padding=[(len(coeff) - 1, 0)],
                    dimension_numbers=("NCH", "OIH", "NCH"),
                    precision=jax.lax.Precision.HIGHEST,
                )[0, 0]
                y = jax.lax.slice(f_full, (len(coeff) - 1,), (len(coeff) - 1 + ext_out * m,), (m,))
                # Reference `i > j` FIR quirk + the zero-padding edge,
                # device 0 only; k <= l_ctx covers both the nonexistent
                # pre-start work samples and y_global[0] = 0 exactly.
                y = y - jnp.where(idx == 0, 1.0, 0.0) * (quirk * ext[l_in])
                y = jnp.where((idx == 0) & (jnp.arange(ext_out) <= l_ctx), 0.0, y)
            # AM demod (dsp.rs:350-383); position 0 of ext lacks a
            # predecessor but lies deep in discarded context.
            dem = dm.demod_body(y[:-1], y[1:], cosphi2, sinphi)
            dem = jnp.concatenate([jnp.zeros((1,), y.dtype), dem])
            # Global demod[0] = 0 lives at ext position l_ctx on device 0.
            dem = jnp.where(
                (idx == 0) & (jnp.arange(ext_out) == l_ctx), 0.0, dem
            )
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
            return f_seg[None], corr[None]

        mapped = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=P(axis),
            out_specs=(P(axis), P(axis)),
        )

        @jax.jit
        def stage1(x):  # [n_pad] sharded over seq
            f, corr = mapped(x.reshape(d, ci))
            return f.reshape(-1), corr.reshape(-1)

        if l > 1:

            def work_len_fn(n_true: int) -> int:
                interp = n_true * l
                offset = (len(coeff) - 1) // 2
                return max(0, -(-(interp - offset) // m)) if interp > offset else 0

        else:
            # Decimation-only: the single-chip path is causal_filter
            # (length-preserving) + decimate, so the work length is
            # n_true // m — the interpolation offset formula above
            # would run ~offset/m samples short and drop trailing
            # rows/peaks the single-chip decode keeps.
            def work_len_fn(n_true: int) -> int:
                return n_true // m

        entry = (stage1, work_len_fn, guard, n_pad, d * w)
        self._stage1[key] = entry
        return entry

    # -- fused serving tail under the mesh -----------------------------
    def _get_fused_render_sharded(
        self, n_true_key: int, input_rate: Rate, kind: str, pct: float
    ):
        """ONE jit from the sharded raw recording to rendered u8 rows:
        shard_map stage 1 (ring-halo SP) feeding the fused tail —
        on-device greedy sync, row gather, contrast levels, u8 map —
        in the same dispatch, so a single long recording gets both
        sequence parallelism and the one-upload/one-fetch link profile
        of the single-chip serving path (graph/decode.py:_fused_tail).

        The tail runs as plain XLA ops on the global (GSPMD-resharded)
        arrays: the greedy selector is the jump-form while_loop (the
        Pallas kernel is not meshable), and XLA inserts the all-gather
        of the sharded FIR output that the row gather needs."""
        key = (
            "sharded_fused", n_true_key, input_rate.get_hz(), kind,
            np.float32(pct).tobytes(),
        )
        if key in self._stage1:
            return self._stage1[key]
        stage1, work_len_fn, guard, n_pad, work_pad = self._get_stage1_sharded(
            n_true_key, input_rate
        )
        self._note_compile(key)
        tail = self._fused_tail(work_pad, kind, pct, pallas=False)

        @jax.jit
        def step(x, work_true):
            f, corr = stage1(x)
            return tail(f, corr, work_true)

        entry = (step, work_len_fn, n_pad)
        self._stage1[key] = entry
        return entry

    def decode_render_input(
        self,
        signal,
        n_true: int,
        input_rate: Rate,
        contrast_kind: str = "percent",
        pct: float = 0.98,
        fetch: bool = True,
    ):
        """Sharded counterpart of
        :meth:`~noaa_apt_tpu.graph.decode.Decoder.decode_render_input`:
        same contract (u8 rows + sync positions, or a
        :class:`~noaa_apt_tpu.graph.decode.PendingRender` with
        ``fetch=False``), byte-equal to the single-chip fused render
        (tested), with stage 1 time-sharded over the mesh."""
        from ..graph.decode import PendingRender, PendingRenderTelemetry

        n_true = int(n_true)
        step, work_len_fn, n_pad = self._get_fused_render_sharded(
            pad_bucket(n_true), input_rate, contrast_kind, pct
        )
        work_true = work_len_fn(n_true)
        if work_true < 10 * self.samples_per_work_row:
            raise err.InternalError(
                "Got less than 10 rows of samples, audio file is too short"
            )
        sharding = NamedSharding(self.mesh, P(self.axis))
        if isinstance(signal, jax.Array):
            if int(signal.shape[0]) != n_pad:
                raise err.InternalError(
                    f"pre-uploaded input is {int(signal.shape[0])}, expected {n_pad}"
                )
            x_dev = signal
        else:
            x = np.zeros(n_pad, dtype=np.float32)
            x[:n_true] = signal
            x_dev = jax.device_put(x, sharding)
        cls = PendingRenderTelemetry if contrast_kind == "telemetry" else PendingRender
        pending = cls(step(x_dev, np.int32(work_true)))
        return pending.get() if fetch else pending

    # ------------------------------------------------------------------
    def decode(self, signal: np.ndarray, input_rate: Rate, sync: bool = True, context=None, host_work=None) -> DecodeResult:
        if host_work is not None:
            # Host ingest pre-resamples to the work rate; the sharded
            # stage-1 graph shards the *input* domain, so the two are
            # mutually exclusive rather than silently ignored.
            raise err.InternalError(
                "host_work is not supported by the sequence-sharded decoder; "
                "use ingest='device' (the default) with --distributed"
            )
        spr = self.samples_per_work_row
        n_true = int(signal.shape[0])
        # Key geometry off the padded bucket so recompiles stay bounded.
        stage1, work_len_fn, guard, n_pad, work_pad = self._get_stage1_sharded(
            pad_bucket(n_true), input_rate
        )
        work_true = work_len_fn(n_true)
        if context is not None:
            context.status(
                0.1, f"Resampling to {self.work_rate.get_hz()} ({self.n_dev}-chip)"
            )
        if work_true < 10 * spr:
            raise err.InternalError(
                "Got less than 10 rows of samples, audio file is too short"
            )
        if n_pad < n_true or work_pad < work_true:
            raise err.InternalError("Sharded geometry smaller than recording")

        x = np.zeros(n_pad, dtype=np.float32)
        x[:n_true] = signal
        sharding = NamedSharding(self.mesh, P(self.axis))
        x_dev = jax.device_put(jnp.asarray(x), sharding)
        f_dev, corr_dev = stage1(x_dev)

        if sync:
            if context is not None:
                context.status(0.5, "Syncing")
            sync_pos = self._select_peaks(corr_dev, max(0, work_true - guard))
            bad = _check_sync_count(sync_pos)
            if bad is not None:
                raise bad
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
        stage2 = self._get_stage2(int(f_dev.shape[0]), n_rows_pad)
        img = stage2(f_dev, jnp.asarray(pos))
        return DecodeResult(image=img, n_rows=n_rows, sync_positions=sync_pos)


def batch_decode(
    decoder: Decoder,
    signals: np.ndarray,
    input_rate: Rate,
    mesh: Mesh,
    axis: str = "data",
    sync: bool = True,
    n_true: int | None = None,
) -> list[DecodeResult]:
    """Data-parallel fleet decode: ``signals`` is [B, N] (equal-length
    recordings, e.g. one batch of passes per host); stage 1 runs as one
    vmapped, batch-sharded graph, per-recording sync selection and row
    gather follow on host/device.

    ``signals`` may also be an already batch-sharded ``jax.Array``
    (e.g. from :func:`~noaa_apt_tpu.parallel.global_batch` spanning
    hosts), in which case it must already be padded to a bucket length.
    """
    b, n_in = signals.shape
    if isinstance(signals, jax.Array):
        n_pad = n_in  # pre-padded by the caller (global_batch path)
        n_true = n_in if n_true is None else n_true
    else:
        n_true = n_in if n_true is None else n_true
        n_pad = pad_bucket(n_in)
    stage1, work_len_fn, guard = decoder._get_stage1(n_pad, input_rate, sync)
    work_true = work_len_fn(n_true)
    spr = decoder.samples_per_work_row
    if work_true < 10 * spr:
        raise err.InternalError("Got less than 10 rows of samples, audio file is too short")

    if isinstance(signals, jax.Array):
        x_dev = signals
    else:
        x = np.zeros((b, n_pad), dtype=np.float32)
        x[:, :n_in] = signals
        sharding = NamedSharding(mesh, P(axis, None))
        x_dev = jax.device_put(jnp.asarray(x), sharding)

    vstage1 = jax.jit(jax.vmap(stage1))
    f_dev, corr_dev = vstage1(x_dev)

    results = []
    for i in range(b):
        if sync:
            # On-device greedy selection per recording: only the peak
            # list crosses the link, like the single-chip path (the full
            # correlation row would be work_pad * 4 bytes per pass).
            sync_pos = decoder._select_peaks(corr_dev[i], max(0, work_true - guard))
            bad = _check_sync_count(sync_pos)
            if bad is not None:
                raise bad
            rows_pos = [p for p in sync_pos[:-1] if p + spr < work_true]
        else:
            sync_pos = None
            rows_pos = list(range(0, (work_true // spr) * spr, spr))
        n_rows = len(rows_pos)
        n_rows_pad = max(8, pad_bucket(n_rows))
        pos = np.zeros(n_rows_pad, dtype=np.int32)
        pos[:n_rows] = rows_pos
        stage2 = decoder._get_stage2(int(f_dev.shape[1]), n_rows_pad)
        img = stage2(f_dev[i], jnp.asarray(pos))
        results.append(DecodeResult(image=img, n_rows=n_rows, sync_positions=sync_pos))
    return results
