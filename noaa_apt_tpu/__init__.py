"""noaa-apt-tpu: a TPU-native NOAA APT weather-satellite decode engine.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
martinber/noaa-apt (reference: pure-Rust, single-threaded DSP).  The
reference's *semantics* — filter designs, AM demodulation formula, greedy
sync detection, telemetry calibration, palette LUTs, spherical geometry —
are the behavioral contract; the *architecture* here is TPU-first:

- every hot loop (polyphase resample, FIR, sync cross-correlation) is a
  batched convolution/matmul that XLA maps onto the MXU,
- the decode pipeline is a single jit-compiled static-shape graph,
- long recordings shard over the time axis via ``jax.shard_map`` with
  ring halo exchange; fleets of recordings shard over a data axis,
- the only truly sequential step (greedy sync-peak bookkeeping,
  reference ``src/decode.rs:204-263``) runs on-host over the tiny
  correlation stream, optionally via a native C++ kernel.

Layer map (mirrors SURVEY.md section 7):

- :mod:`noaa_apt_tpu.core`     units (Freq/Rate), filter design, constants
- :mod:`noaa_apt_tpu.ops`      XLA/Pallas compute primitives
- :mod:`noaa_apt_tpu.graph`    jitted single-chip decode pipeline
- :mod:`noaa_apt_tpu.parallel` multi-chip sharding (sequence + data)
- :mod:`noaa_apt_tpu.post`     image-space post-processing
- :mod:`noaa_apt_tpu.geo`      SGP4, spherical trig, map overlay
- :mod:`noaa_apt_tpu.io`       WAV/PNG/config/progress+step-export
- :mod:`noaa_apt_tpu.serve`    pipelined many-pass fleet serving
- :mod:`noaa_apt_tpu.stream`   live (chunked) decode, bit-exact vs offline
- :mod:`noaa_apt_tpu.gui`      tkinter GUI over a headless logic core
"""

__version__ = "0.1.0"

FINAL_RATE = 4160
PX_SYNC_FRAME = 39
PX_SPACE_DATA = 47
PX_CHANNEL_IMAGE_DATA = 909
PX_TELEMETRY_DATA = 45
PX_PER_CHANNEL = 1040
PX_PER_ROW = 2080
CARRIER_FREQ = 2400
