"""Benchmark: decode a 10-minute 48 kHz APT pass on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline anchor (BASELINE.md): the reference decodes a full pass at
~13x realtime on a Raspberry Pi (fast profile, ~46 s for a ~10 min
pass).  APT realtime is 2 lines/s, so value = recorded_seconds /
wall_seconds on the end-to-end path: WAV samples in host RAM ->
resample -> demod -> FIR -> sync correlate -> greedy peaks -> row
gather -> contrast -> u8 image fetched to host.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np


def main():
    t_setup = time.time()
    # Persistent compilation cache: the remote TPU compile of the full
    # graph set can take minutes; cache it across bench invocations.
    import jax

    cache_dir = Path(__file__).parent / ".jax_cache"
    try:
        cache_dir.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"compilation cache unavailable: {e}", file=sys.stderr)

    from noaa_apt_tpu.core.frequency import Rate
    from noaa_apt_tpu.core.profiles import STANDARD
    from noaa_apt_tpu.graph.decode import Decoder
    from noaa_apt_tpu.graph.process import process
    from noaa_apt_tpu.synth import synth_recording
    from noaa_apt_tpu.types import Contrast, Rotate

    n_rows = 1200  # 10-minute pass at 2 lines/s
    sample_rate = 48000
    cache = Path(__file__).parent / ".bench_input.npy"
    if cache.exists():
        signal = np.load(cache)
        print("loaded cached bench input", file=sys.stderr)
    else:
        print(f"synthesizing {n_rows}-row pass at {sample_rate} Hz...", file=sys.stderr)
        signal, _ = synth_recording(n_rows=n_rows, sample_rate=sample_rate, noise_db=15.0)
        # Quantize like a real 16-bit WAV capture; the pipeline ships i16
        # to the device and converts there (exact, half the bytes).
        signal = np.clip(
            np.round(signal / np.abs(signal).max() * 32767), -32768, 32767
        ).astype(np.int16)
        try:
            np.save(cache, signal)
        except OSError:
            pass
    duration_s = n_rows / 2.0
    rate = Rate(sample_rate)

    # Host ingest: the native C++ polyphase rate-converts 48 kHz -> the
    # 12.48 kHz work rate before upload (~4x fewer bytes over the
    # host<->device link, which dominates wall time on this tunnel).
    dec = Decoder(STANDARD, ingest="host")

    def run():
        res = dec.decode(signal, rate, sync=True)
        img = process(res, Contrast.from_percent(0.98), Rotate.NO, decoder=dec)
        return res, img

    print(f"setup {time.time()-t_setup:.1f}s; warmup (compile)...", file=sys.stderr)
    for w in range(2):  # second pass warms late-bound stage variants
        t0 = time.time()
        res, img = run()
        print(
            f"warmup {w}: {time.time()-t0:.1f}s, rows={res.n_rows}, img={img.shape}",
            file=sys.stderr,
        )

    times = []
    for i in range(5):
        t0 = time.time()
        res, img = run()
        times.append(time.time() - t0)
        print(f"run {i}: {times[-1]*1e3:.0f} ms", file=sys.stderr)

    wall = min(times)
    value = duration_s / wall
    baseline = 13.0  # reference: ~13x realtime (Raspberry Pi, fast profile)
    print(
        json.dumps(
            {
                "metric": "decode_realtime_factor",
                "value": round(value, 1),
                "unit": "x_realtime_10min_48k_pass",
                "vs_baseline": round(value / baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
