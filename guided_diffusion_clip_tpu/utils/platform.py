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
