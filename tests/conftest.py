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

import signal  # noqa: E402

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Per-test wall-clock bound (pytest-timeout is not available in this image).
# A wedged test raises instead of hanging the whole suite; override per test
# with @pytest.mark.timeout(seconds).
# ---------------------------------------------------------------------------

DEFAULT_TEST_TIMEOUT = int(os.environ.get("PYTEST_PER_TEST_TIMEOUT", 900))


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    marker = item.get_closest_marker("timeout")
    secs = int(marker.args[0]) if marker and marker.args else DEFAULT_TEST_TIMEOUT

    def _on_alarm(signum, frame):
        raise TimeoutError(f"test exceeded {secs}s wall-clock limit")

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(secs)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


# ---------------------------------------------------------------------------
# Process-global sharding state (parallel/sp.py, parallel/tp.py) must never
# leak across tests: a leaked (data, space) mesh makes every later
# with_sharding_constraint trace against it (seen: a TrainLoop whose
# constructor raised mid-setup left SP active and broke 12 unrelated parity
# tests). Per-file fixtures exist in test_spatial/test_tensor; this is the
# suite-wide backstop.
# ---------------------------------------------------------------------------


@pytest.fixture(autouse=True)
def _clear_global_sharding_state():
    yield
    from guided_diffusion_clip_tpu.parallel import sp, tp

    sp.clear_spatial_sharding()
    tp.clear_tensor_sharding()
