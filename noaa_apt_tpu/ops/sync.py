"""Sync-frame detection: correlation on device, greedy selection on host.

Behavioral contract: reference ``src/decode.rs:164-263``.

- ``generate_sync_frame``: the channel-A sync template (square wave,
  2-px pulses, values exactly +-1), ``decode.rs:171-199``.
- ``sync_correlate``: the +-1 cross-correlation over the whole signal
  (``decode.rs:225-234``) — the reference's hottest loop, here one
  1-D convolution the TPU chews through in microseconds.
- ``find_sync_peaks``: the greedy peak bookkeeping
  (``decode.rs:236-254``).  Its adaptive-window semantics are inherently
  sequential, but each peak is reachable by "jump to the first argmax of
  the window after the current peak" — O(rows) tiny-window argmaxes on
  host instead of an O(N) scalar scan.  ``find_sync_peaks_reference``
  is the literal transliteration used to cross-check equivalence in
  tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import FINAL_RATE, PX_PER_ROW
from ..core.frequency import Rate


def generate_sync_frame(work_rate: Rate) -> np.ndarray:
    """Sync A template at work_rate; int8 values in {-1, +1}."""
    if work_rate.get_hz() % FINAL_RATE != 0:
        raise ValueError("work_rate is not multiple of FINAL_RATE")
    pw = work_rate.get_hz() // FINAL_RATE  # pixel width in samples
    spw = 2 * pw  # sync pulse width
    parts = [-np.ones(spw, np.int8)]
    cycle = np.concatenate([-np.ones(spw, np.int8), np.ones(spw, np.int8)])
    reps = np.tile(cycle, 8)[: 7 * 2 * spw]
    parts.append(reps)
    parts.append(-np.ones(8 * pw, np.int8))
    return np.concatenate(parts)


@partial(jax.jit, static_argnums=2)
def sync_correlate(signal: jnp.ndarray, template, n_valid: int | None = None) -> jnp.ndarray:
    """corr[i] = sum_j template[j] * signal[i+j], for i in [0, N - len).

    ``n_valid`` (static) limits the output to the true (pre-padding)
    signal length; correlations past it would read padded zeros and are
    never consumed by the greedy selector.
    """
    t = jnp.asarray(template, jnp.float32)
    g = t.shape[0]
    out = jax.lax.conv_general_dilated(
        signal[None, None, :],
        t[None, None, :],
        window_strides=(1,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]
    # The reference loops i in 0..N-G (decode.rs:225), one fewer than
    # the number of valid windows — drop the last.
    out = out[: max(0, signal.shape[0] - g)]
    if n_valid is not None:
        out = out[: max(0, n_valid - g)]
    return out


def _row_samples(work_rate_hz: int) -> int:
    return PX_PER_ROW * work_rate_hz // FINAL_RATE


def find_sync_peaks(corr: np.ndarray, work_rate: Rate) -> list[int]:
    """Greedy peak selection, exactly reference ``decode.rs:236-254``.

    Prefers the native C++ scan (noaa_apt_tpu.native — a literal
    transliteration of the reference loop).  The NumPy fallback jumps
    from the current peak ``(p, v)`` to the first maximum of
    ``corr[(p, p+md]]`` while it beats ``v`` (reproducing the scalar
    scan's running-argmax-with-expanding-window endpoint); once no
    improvement exists within ``md``, the next peak is force-appended at
    the first index ``i`` with ``i//spr > len(peaks)`` (possibly several
    copies, as the reference's ``while`` does on long dropouts).
    """
    spr = _row_samples(work_rate.get_hz())
    md = spr * 8 // 10
    n = corr.shape[0]
    corr = np.asarray(corr)

    from ..native import find_sync_peaks_native

    native = find_sync_peaks_native(corr, spr, md)
    if native is not None:
        return native

    peaks_pos: list[int] = [0]
    # The reference's i=0 iteration replaces the seed (0, 0.0) with
    # (0, corr[0]) when positive (decode.rs:250-253).
    p, v = 0, max(float(corr[0]), 0.0) if n > 0 else 0.0
    while True:
        # Replacement chain (the `elif corr > last` branch).
        while True:
            lo, hi = p + 1, min(p + md + 1, n)
            if lo >= hi:
                break
            w = corr[lo:hi]
            q = int(np.argmax(w))
            if w[q] > v:
                p, v = lo + q, float(w[q])
                peaks_pos[-1] = p
            else:
                break
        # Forced append (the `if i - last > min_distance` branch).
        k = len(peaks_pos)
        i0 = max(p + md + 1, spr * (k + 1))
        if i0 >= n:
            break
        # i0 >= spr*(k+1) guarantees at least one append.
        appended = i0 // spr - k
        peaks_pos.extend([i0] * appended)
        p, v = i0, float(corr[i0])
    return peaks_pos


@partial(jax.jit, static_argnums=(2, 3, 4))
def _find_sync_peaks_device(corr: jnp.ndarray, n_valid, spr: int, md: int, max_peaks: int):
    """Greedy peak selection on-device (exact jump-algorithm form).

    Equivalent to :func:`find_sync_peaks` (and therefore to the
    reference scalar scan, ``decode.rs:236-254``): a ``while_loop``
    whose body either advances the current peak to the first argmax of
    the ``md``-window after it, or force-appends the next peak(s).
    Only the final peak list (a few KB) ever crosses back to the host.

    The iteration count (~2/image row) is the cost driver on TPU — the
    loop is dispatch-bound, not width-bound: a hierarchical block-max
    argmax (less data, more ops/iteration) measured SLOWER than the
    flat window argmax, so the body stays minimal.  The only hoistable
    work, masking indices >= n_valid, happens once before the loop.

    ``n_valid`` is a traced scalar (true correlation length), so one
    compilation serves every recording in a length bucket.
    """
    neg = jnp.float32(-jnp.inf)
    n = jnp.asarray(n_valid, jnp.int32)
    L = corr.shape[0]
    pm = jnp.concatenate(
        [
            jnp.where(jnp.arange(L) < n, corr, neg),
            jnp.full((md + 1,), neg, corr.dtype),
        ]
    )

    def cond(state):
        _, _, _, done, _ = state
        return jnp.logical_not(done)

    def body(state):
        p, v, k, _, peaks = state
        # Replacement chain step: first argmax of corr[(p, p+md]].
        w = jax.lax.dynamic_slice(pm, (p + 1,), (md,))
        q = jnp.argmax(w)
        improved = w[q] > v

        def do_improve(_):
            np_ = (p + 1 + q).astype(jnp.int32)
            return np_, w[q], k, jnp.array(False), peaks.at[k - 1].set(np_)

        def do_append(_):
            i0 = jnp.maximum(p + md + 1, spr * (k + 1)).astype(jnp.int32)
            done = i0 >= n
            appended = jnp.where(done, 0, i0 // spr - k)
            idx = jnp.arange(max_peaks, dtype=jnp.int32)
            new_peaks = jnp.where((idx >= k) & (idx < k + appended), i0, peaks)
            new_k = k + appended
            new_v = jnp.where(done, v, pm[jnp.minimum(i0, L - 1)])
            return jnp.where(done, p, i0), new_v, new_k, done, new_peaks

        return jax.lax.cond(improved, do_improve, do_append, None)

    peaks0 = jnp.zeros(max_peaks, dtype=jnp.int32)
    # The reference's i=0 iteration replaces the seed (0, 0.0) with
    # (0, corr[0]) when positive (decode.rs:250-253) — the chain's
    # effective start value is max(corr[0], 0), not 0.  pm[0] is
    # corr[0] masked by n > 0, which the outer where already handles.
    v0 = jnp.where(n > 0, jnp.maximum(pm[0], jnp.float32(0.0)), jnp.float32(0.0))
    state = (jnp.int32(0), v0, jnp.int32(1), jnp.array(False), peaks0)
    _, _, k, _, peaks = jax.lax.while_loop(cond, body, state)
    return peaks, k


def selector_params(corr_len: int, work_rate: Rate) -> tuple[int, int, int]:
    """(spr, min-distance, max_peaks) for the greedy selector — the one
    definition every backend (and the conformance sweep) must share."""
    spr = _row_samples(work_rate.get_hz())
    return spr, spr * 8 // 10, max(16, corr_len // spr + 16)


def find_sync_peaks_device(corr_dev, n_valid: int, work_rate: Rate) -> list[int]:
    """On-device greedy selection over ``corr_dev[:n_valid]``; returns
    the host peak list (a tiny fetch instead of the whole correlation).

    On the TPU backend this runs the Pallas kernel (corr streams
    through VMEM; ~4x the while_loop's speed — ops/pallas_select.py);
    elsewhere the XLA jump-form while_loop.  Both are selected
    peak-for-peak identically (tests/test_ops.py cross-checks)."""
    spr, md, max_peaks = selector_params(int(corr_dev.shape[0]), work_rate)
    if jax.default_backend() == "tpu":
        from .pallas_select import select_peaks_jit

        peaks, k = select_peaks_jit(corr_dev, n_valid, spr, md, max_peaks)
    else:
        peaks, k = _find_sync_peaks_device(corr_dev, n_valid, spr, md, max_peaks)
    k = int(k)
    return np.asarray(peaks[:k]).tolist()


def find_sync_peaks_reference(corr: np.ndarray, work_rate: Rate) -> list[int]:
    """Literal transliteration of ``decode.rs:236-254`` (tests only)."""
    spr = _row_samples(work_rate.get_hz())
    md = spr * 8 // 10
    peaks: list[tuple[int, float]] = [(0, 0.0)]
    for i in range(corr.shape[0]):
        c = float(corr[i])
        if i - peaks[-1][0] > md:
            while i // spr > len(peaks):
                peaks.append((i, c))
        elif c > peaks[-1][1]:
            peaks[-1] = (i, c)
    return [p for p, _ in peaks]
