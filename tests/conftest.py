"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

The machine's sitecustomize registers the axon TPU plugin and pins
jax_platforms to it, so an env var alone is not enough — we must override
the jax config before any backend initializes.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
