"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are testable without TPU hardware.

Note: the TPU platform plugin in this environment ignores the JAX_PLATFORMS
environment variable; ``jax.config.update`` is required, and XLA_FLAGS must
be set before the backend initialises.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
