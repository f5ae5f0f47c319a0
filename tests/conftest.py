"""Test configuration.

Distributed tests run on a virtual 8-device CPU mesh via XLA's host-platform
device multiplication (SURVEY.md §4: "no mocks need to be written").

Gotcha: this environment's sitecustomize imports jax at interpreter start to
register the remote-TPU (axon) PJRT plugin, so setting JAX_PLATFORMS in
os.environ here is TOO LATE — jax has already read it. jax.config.update
works because backends are created lazily, at first use inside the tests.
XLA_FLAGS is also still effective for the same reason (read at CPU client
creation).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_sessionstart(session):
    assert jax.device_count() == 8, (
        f"expected 8 virtual CPU devices, got {jax.device_count()} "
        f"on {jax.devices()[0].platform}"
    )
