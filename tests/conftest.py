"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that all multi-chip sharding
paths (mesh construction, shard_map'd samplers, GSPMD collectives) are
exercised without TPU hardware — the strategy the reference never needed
(it is single-device; SURVEY.md section 4).

x64 is enabled globally here (individual test modules must NOT touch
``jax_enable_x64``: module-level config updates run at collection time and
the last import would win for the whole process).
"""
import os
import sys

# The environment's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon (the TPU tunnel) already in the env, so the env var is
# captured before this file runs — override through the config API instead
# (backends are still uninitialised at this point).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} on "
    f"{jax.default_backend()}; JAX was initialised before conftest ran")
