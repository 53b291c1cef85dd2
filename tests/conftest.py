"""Test env: force the CPU backend with 8 virtual devices so multi-chip
sharding tests run anywhere.

Note: this environment ships a site config pinning ``jax_platforms`` to
"axon,cpu" (the TPU tunnel), which overrides the JAX_PLATFORMS env var —
so the platform must be forced through jax.config after import, and the
XLA flag for virtual host devices must be in place before backend init.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
