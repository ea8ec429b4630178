"""Test configuration: force an 8-device virtual CPU mesh so sharding
paths are exercised without TPU hardware."""

import os

# Force the CPU backend for tests even when the environment points JAX at
# TPU hardware — sharding paths run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A sitecustomize may have imported jax before this file runs, so the env
# var alone is not enough — update the config directly too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
