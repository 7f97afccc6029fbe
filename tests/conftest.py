"""Test configuration.

Default lane: an 8-device virtual CPU platform, so sharding tests run
anywhere (including under the axon TPU-tunnel environment, whose
sitecustomize overrides JAX_PLATFORMS — jax.config wins over it), with
highest matmul precision for f32 fidelity.

TPU lane: set QCT_PLATFORM=tpu to keep the real accelerator backend —
this un-skips the Pallas kernel suites (test_fused_admm.py,
test_pallas_kernels.py's on-device cases) that the CPU lane can only
exercise in interpreter mode:

    QCT_PLATFORM=tpu python -m pytest tests/test_pallas_kernels.py tests/test_fused_admm.py
"""

import os

QCT_PLATFORM = os.environ.get("QCT_PLATFORM", "cpu")

if QCT_PLATFORM == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if QCT_PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
