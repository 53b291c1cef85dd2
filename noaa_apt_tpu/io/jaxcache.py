"""Persistent XLA compilation cache for user-facing entry points.

On the TPU backend a cold compile of the fused decode graph can take
minutes (remote compile through the device tunnel); the jit cache only
lives for one process.  Every user-facing entry point (CLI, GUI, fleet
server, bench) therefore enables JAX's persistent compilation cache so
the second invocation of the same graph variant loads in seconds.

The reference binary has no analog (its DSP is AOT-compiled Rust); this
is the TPU-native equivalent of "the binary is already compiled".
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path

log = logging.getLogger(__name__)

_enabled = False


def cache_dir() -> Path:
    xdg = os.environ.get("XDG_CACHE_HOME", str(Path.home() / ".cache"))
    return Path(xdg) / "noaa-apt-tpu" / "jax_cache"


def enable_persistent_compile_cache(directory: os.PathLike | None = None) -> bool:
    """Point JAX's persistent compilation cache at a per-user dir.

    Idempotent; safe to call before or after the backend initializes
    (the cache config is read at compile time).  Returns True when the
    cache is active.  Honors an explicit ``jax_compilation_cache_dir``
    already set by the caller (e.g. tests pin a repo-local dir).
    """
    global _enabled
    import jax

    if _enabled:
        if directory is not None:
            # An explicit request after the cache is live: honor it by
            # repointing (the cache dir is read per-compile, so this is
            # safe mid-process) instead of silently keeping the first
            # caller's directory (ADVICE r4).
            try:
                active = jax.config.jax_compilation_cache_dir
            except AttributeError:
                active = None
            d = Path(directory)
            if active and str(d) != str(active):
                try:
                    d.mkdir(parents=True, exist_ok=True)
                    jax.config.update("jax_compilation_cache_dir", str(d))
                    log.info(
                        "persistent XLA compile cache repointed %s -> %s",
                        active, d,
                    )
                except Exception as e:  # noqa: BLE001 - optimization only
                    log.info(
                        "keeping persistent compile cache at %s "
                        "(could not repoint to %s: %s)", active, d, e,
                    )
        return True

    try:
        if jax.config.jax_compilation_cache_dir:
            if directory is not None and str(Path(directory)) != str(
                jax.config.jax_compilation_cache_dir
            ):
                log.info(
                    "persistent compile cache already at %s; explicit "
                    "request for %s ignored (caller-pinned directory wins)",
                    jax.config.jax_compilation_cache_dir, directory,
                )
            _enabled = True  # caller already configured one; leave it
            return True
    except AttributeError:
        pass
    d = Path(directory) if directory is not None else cache_dir()
    try:
        d.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(d))
        # Anything over a second is worth keeping: the remote-TPU graph
        # compiles measured here are seconds to minutes each.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
        log.debug("persistent XLA compile cache at %s", d)
        return True
    except Exception as e:  # noqa: BLE001 - cache is an optimization only
        log.debug("persistent compile cache unavailable: %s", e)
        return False


_warm_thread = None


def warm_link_async() -> None:
    """Start the device<->host link handshake in a daemon thread.

    On the tunneled TPU backend the FIRST device-to-host readback of a
    process can block from seconds to minutes (server-side session
    bring-up / cleanup of a predecessor's claim), after which every
    fetch is milliseconds.  User entry points call this right after
    startup so the handshake overlaps WAV loading, graph tracing and
    compilation instead of serializing in front of the first result
    fetch.  Idempotent; errors are swallowed (the real fetch will then
    surface them)."""
    global _warm_thread
    if _warm_thread is not None:
        return
    import threading

    def _warm():
        try:
            import numpy as np
            import jax

            t0 = time.time()
            np.asarray(jax.device_put(np.zeros(8, np.float32)))
            dt = time.time() - t0
            if dt > 5.0:
                log.info("device link handshake took %.0f s (one-time per process)", dt)
        except Exception as e:  # noqa: BLE001 - warmup is best-effort
            log.debug("link warmup failed: %s", e)

    _warm_thread = threading.Thread(target=_warm, daemon=True, name="link-warmup")
    _warm_thread.start()
