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

# Persistent compilation cache: the smoke tier is dominated by XLA CPU
# compiles of the seven full train steps (~6 of its ~7.5 min); with the
# cache warm it runs in well under 5 min. Keyed by HLO hash, so code
# changes re-compile exactly the affected steps.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
