"""Native (C++) runtime kernels, loaded via ctypes.

Compiled lazily with g++ into ``_libapt.so`` next to the sources; all
callers fall back to NumPy implementations when no toolchain exists.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "peak_finder.cpp"
_LIB = _DIR / "_libapt.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # -ffp-contract=off: without it -O3 (-march=native especially)
    # fuses mul+add into FMA inside the exact-mode dot products,
    # skipping the intermediate f32 rounding the bit-exactness
    # contract (and the NumPy fallback) requires — decoded pixels
    # would differ between native and fallback hosts.
    base = [
        "g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC", "-pthread",
        "-o", str(_LIB), str(_SRC),
    ]
    for flags in (["-march=native"], []):
        try:
            subprocess.run(
                base[:2] + flags + base[2:],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return True
        except Exception as e:
            last = e
    log.info("Native kernel build unavailable (%s); using NumPy fallback", last)
    return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
            lib.apt_find_sync_peaks.restype = ctypes.c_int64
            lib.apt_find_sync_peaks.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ]
            lib.apt_best_quality_row.restype = ctypes.c_int64
            lib.apt_best_quality_row.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ]
            lib.apt_fast_resample.restype = ctypes.c_int64
            lib.apt_fast_resample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.apt_ingest_i16.restype = ctypes.c_int64
            lib.apt_ingest_i16.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ]
            lib.apt_pack_work_i16.restype = ctypes.c_int64
            lib.apt_pack_work_i16.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int16),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.apt_ingest_i8.restype = ctypes.c_int64
            lib.apt_ingest_i8.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int8), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ]
            _lib = lib
        except OSError as e:
            log.info("Native kernel load failed (%s); using NumPy fallback", e)
        return _lib


def fast_resample_native(
    x: np.ndarray, l: int, m: int, coeff: np.ndarray, out_len: int,
    threads: int | None = None, exact: bool = True,
) -> np.ndarray | None:
    """Host polyphase L/M resample (dsp.rs:186-289); None if the
    native library is unavailable.

    ``exact=True``: the reference's per-output sequential accumulation,
    bit-identical to the scalar loop.  ``exact=False``: same taps with
    a SIMD-vectorized reduction (different f32 summation order, ~1e-7
    relative noise) — used by the i16-quantized ``host16`` ingest whose
    quantization floor is far above that."""
    lib = get_lib()
    if lib is None:
        return None
    import os

    x = np.ascontiguousarray(x, dtype=np.float32)
    coeff = np.ascontiguousarray(coeff, dtype=np.float32)
    out = np.empty(out_len, dtype=np.float32)
    nthreads = threads or min(8, os.cpu_count() or 1)
    lib.apt_fast_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.shape[0],
        l, m,
        coeff.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), coeff.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_len, nthreads,
        0 if exact else 1,
    )
    return out


def ingest_i16_native(
    x: np.ndarray, l: int, m: int, coeff: np.ndarray,
    out_true: int, out_pad: int, threads: int | None = None,
    bits: int = 16,
) -> tuple[np.ndarray, float] | None:
    """Fused serving ingest: raw int16 PCM -> polyphase work signal ->
    i16 (``bits=16``, the host16 mode) or i8 (``bits=8``, the lossy
    host8 mode) quantization, one native call, streamed conversion (no
    full f32 copy of the recording).  Returns ``(padded int work
    buffer, inv_scale)``, bit-identical to the corresponding numpy
    pipeline (f32 convert -> vectorized resample -> np.round
    quantize), or None if the native library is unavailable.

    ``x`` may be a read-only np.memmap straight over the WAV data
    chunk (see ``wav.load_device_ready``): the kernel only reads it.
    """
    lib = get_lib()
    if lib is None:
        return None
    import os

    if x.dtype != np.int16:
        raise ValueError(f"ingest_i16 needs int16 input, got {x.dtype}")
    if bits not in (8, 16):
        raise ValueError(f"ingest quantization must be 8 or 16 bits, got {bits}")
    if not x.flags.c_contiguous:
        x = np.ascontiguousarray(x)
    coeff = np.ascontiguousarray(coeff, dtype=np.float32)
    inv_scale = ctypes.c_float(0.0)
    nthreads = threads or min(8, os.cpu_count() or 1)
    if bits == 8:
        out = np.empty(out_pad, dtype=np.int8)
        fn, ctype = lib.apt_ingest_i8, ctypes.c_int8
    else:
        out = np.empty(out_pad, dtype=np.int16)
        fn, ctype = lib.apt_ingest_i16, ctypes.c_int16
    rc = fn(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), x.shape[0],
        l, m,
        coeff.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), coeff.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctype)),
        out_true, out_pad,
        ctypes.byref(inv_scale), nthreads,
    )
    if rc < 0:
        return None
    return out, float(inv_scale.value)


def pack_work_i16_native(
    x: np.ndarray, work_rate_hz: int, threads: int | None = None,
):
    """Native encoder for the host16c lossless work-signal codec
    (ops/pack.py scheme), bit-identical to ``pack.pack_work_i16``
    (tested) at ~100x its speed.  Returns a ``PackedWork``, None if
    the native library is unavailable, or the string ``"incompressible"``
    when more than 1/4 of the blocks would escape (callers fall back
    to the plain i16 payload without re-trying in numpy)."""
    lib = get_lib()
    if lib is None:
        return None
    import os

    from ..ops.pack import BLOCK, PackedWork, predictor_coeff, unit_geometry

    if x.dtype != np.int16:
        raise ValueError(f"pack_work_i16 needs int16 input, got {x.dtype}")
    if not x.flags.c_contiguous:
        x = np.ascontiguousarray(x)
    n = int(x.shape[0])
    nb = -(-n // BLOCK)
    coeff = predictor_coeff(work_rate_hz)
    base = np.empty(nb * 63, np.uint32)  # worst-case stride (w_lo = 16)
    anchors = np.empty((nb, 2), np.int16)
    esc_cap = nb // 4 + 1
    esc_idx = np.empty(esc_cap, np.int32)
    esc_rows = np.empty((esc_cap, BLOCK), np.int16)
    n_esc = ctypes.c_int64(0)
    nthreads = threads or min(8, os.cpu_count() or 1)
    w_lo = lib.apt_pack_work_i16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n,
        coeff,
        base.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), base.shape[0],
        anchors.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        esc_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        esc_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        esc_cap,
        nb, nthreads, ctypes.byref(n_esc),
    )
    if w_lo == -2:
        return "incompressible"
    if w_lo < 0:
        return None
    _, _, _, bw = unit_geometry(int(w_lo))
    ne = int(n_esc.value)
    return PackedWork(
        base=base[: nb * bw].copy(),
        anchors=anchors,
        esc_idx=esc_idx[:ne].copy(),
        esc_rows=esc_rows[:ne].copy(),
        w_lo=int(w_lo), n_samples=n, coeff=coeff,
    )


def find_sync_peaks_native(corr: np.ndarray, spr: int, md: int) -> list[int] | None:
    """Exact reference greedy scan in C++; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    corr = np.ascontiguousarray(corr, dtype=np.float32)
    n = corr.shape[0]
    cap = max(16, n // spr + 16) if spr > 0 else 16
    out = np.empty(cap, dtype=np.int64)
    count = lib.apt_find_sync_peaks(
        corr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, spr, md,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cap,
    )
    if count < 0:
        return None
    return out[:count].tolist()
