"""Test harness: run everything on a virtual 8-device CPU mesh.

The TPU-native analog of the reference's gloo-on-CPU trick (SURVEY.md §4):
XLA's host-platform device count lets multi-device sharding tests run on any
box.

Note: some environments pre-import jax at interpreter start (sitecustomize)
with JAX_PLATFORMS pointing at a TPU platform; env vars set here are too late
for jax's config snapshot, so we update jax.config directly. XLA_FLAGS is
still read lazily at backend creation, so setting it here works as long as no
backend has been instantiated yet.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
