"""Test configuration: force the CPU backend with a virtual 8-device mesh.

Note: this machine's sitecustomize registers the TPU "axon" platform and clobbers
JAX_PLATFORMS in the environment, so the env var alone is NOT enough — we must also
override via jax.config after import (verified: env-only leaves tests running on the
TPU with bf16 matmuls).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
