r"""Test configuration.

Unit tests run on a virtual 8-device CPU mesh so data-parallel sharding is
exercised without TPU hardware (SURVEY.md §4f). Must be set before jax import.
"""

import os

# Force CPU: the ambient environment exports JAX_PLATFORMS=axon (single
# tunneled TPU); concurrent test processes would contend for it. Unit tests
# must run on the virtual CPU mesh; only bench.py touches the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment's sitecustomize registers a tunneled TPU backend and
# overrides jax_platforms via jax.config.update, which beats the env var —
# re-override here so tests really run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite compiles many large scan graphs;
# caching makes re-runs and parallel test shards dramatically faster.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
