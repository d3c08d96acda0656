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

# Persistent compile cache: the suite is compile-bound on CPU (single-core
# hosts pay ~3.5 min of XLA compiles cold); with a warm cache it runs in
# ~2 min. Entries are keyed by content hash + jax/XLA version, so a stale
# cache just misses. The cache dir is gitignored (it grows to tens of MB);
# it only speeds up repeat local runs — delete it freely.
_CACHE = Path(__file__).resolve().parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:  # older jax: flag absent
    pass

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
