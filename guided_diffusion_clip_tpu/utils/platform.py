"""Platform selection that survives environment monkeypatching.

Some TPU runtimes pre-import jax at interpreter start and force their own
jax_platforms selection (overriding the JAX_PLATFORMS env var). Calling this
first thing in every CLI entry point restores the user's env choice — without
it, CPU-targeted runs try to initialize the TPU plugin (and hang if the
device/relay is unavailable).
"""

from __future__ import annotations

import os


def honor_env_platform() -> None:
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def force_cpu_if_virtual_mesh() -> None:
    """Force the CPU backend when the caller asked for a virtual device mesh.

    `XLA_FLAGS=--xla_force_host_platform_device_count=N` only affects the CPU
    ("host") platform; if a TPU plugin/relay is also registered, jax would try
    it first — and hang forever if the relay is dead. Whenever the virtual
    mesh flag is the device source, CPU is the only platform that can satisfy
    it, so select it explicitly before any backend initialization.
    """
    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        import jax

        jax.config.update("jax_platforms", "cpu")
