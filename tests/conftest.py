"""Test configuration.

Distributed tests run on a virtual 8-device CPU mesh via XLA's host-platform
device multiplication (SURVEY.md §4: "no mocks need to be written"). The env
vars must be set before jax is imported anywhere, hence this module-level
code in conftest.
"""

import os

# Force, don't setdefault: the session env presets JAX_PLATFORMS=axon (the
# remote TPU tunnel), which would route every test compile through remote
# compilation at ~30 s each.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
