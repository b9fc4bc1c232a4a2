"""Test configuration: force an 8-device CPU platform.

The reference runs its distributed tests with
``torchrun --nproc_per_node=8`` on 8 real GPUs
(tests/modules/test_mha_parallel.py:1-2).  On TPU/JAX we instead force the
host platform to expose 8 virtual CPU devices so every sharding test runs on
a laptop or in CI — and Pallas kernels run in interpret mode.

Note: this environment's sitecustomize registers an `axon` TPU backend and
forces jax_platforms="axon,cpu"; we must override the config *after* jax
import, not just via JAX_PLATFORMS.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Pallas kernels run in interpret mode on CPU.
os.environ.setdefault("XFA_INTERPRET", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
