"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths (vslam_tpu.parallel) are validated here without
TPU pod hardware, per SURVEY.md §4's distributed-test strategy.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell env points at the TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: keeps repeated test runs fast. Set via
# jax.config (env vars are frozen early by a site-startup jax pre-import).
_cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
