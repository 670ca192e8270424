"""Test environment: force JAX onto CPU with 8 virtual devices so sharding
/ pjit paths run in CI without TPU hardware (SURVEY.md §4 test plan).

Note: the TPU environment registers its backend from sitecustomize before
pytest starts, so JAX_PLATFORMS in the environment is not enough — we must
update jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
