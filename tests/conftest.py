"""Test env: force the CPU backend with 8 virtual devices so multi-chip
sharding tests run anywhere.

Note: this environment ships a site config pinning ``jax_platforms`` to
"axon,cpu" (the TPU tunnel), which overrides the JAX_PLATFORMS env var —
so the platform must be forced through jax.config after import, and the
XLA flag for virtual host devices must be in place before backend init.

Setting ``NOAA_APT_TPU_TESTS=1`` keeps the real backend so the
on-hardware numeric-parity canaries run (VERDICT r2 item 5):

    NOAA_APT_TPU_TESTS=1 python -m pytest tests/ -m tpu_conformance -q

Only the ``tpu_conformance``-marked tests are meaningful in that mode
(the sharding tests need the 8-device virtual CPU mesh).
"""

import os

import pytest

_TPU_MODE = os.environ.get("NOAA_APT_TPU_TESTS") == "1"

if not _TPU_MODE:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
else:
    # The remote-TPU compile of the full graph set is slow; reuse the
    # bench's persistent compilation cache.
    _cache = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def synth_i16(n_rows, sample_rate, noise_db=None, seed=0, **kwargs):
    """(i16 signal, pattern): a synthesized recording quantized like a
    16-bit WAV capture (full-scale round-clip) — the shared idiom of
    the e2e/serving tests (import via ``from conftest import synth_i16``)."""
    import numpy as np

    from noaa_apt_tpu.synth import synth_recording

    sig, pattern = synth_recording(
        n_rows=n_rows, sample_rate=sample_rate, noise_db=noise_db,
        seed=seed, **kwargs,
    )
    q = np.clip(
        np.round(sig / np.abs(sig).max() * 32767), -32768, 32767
    ).astype(np.int16)
    return q, pattern


def pytest_collection_modifyitems(config, items):
    """In the default CPU suite, tpu_conformance tests self-skip (their
    assertions are only meaningful on hardware); in TPU mode, everything
    NOT marked tpu_conformance is skipped (the suite expects the 8-device
    virtual mesh)."""
    if _TPU_MODE:
        skip = pytest.mark.skip(reason="NOAA_APT_TPU_TESTS=1 runs only tpu_conformance tests")
        for item in items:
            if "tpu_conformance" not in item.keywords:
                item.add_marker(skip)
