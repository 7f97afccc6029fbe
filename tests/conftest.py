"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run anywhere (including under the axon TPU-tunnel environment, whose
sitecustomize overrides JAX_PLATFORMS — jax.config wins over it), and use
highest matmul precision for f32 fidelity."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
