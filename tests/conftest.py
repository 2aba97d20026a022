"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths (vslam_tpu.parallel) are validated here without
TPU pod hardware, per SURVEY.md §4's distributed-test strategy.

NOTE: env vars (JAX_PLATFORMS / XLA_FLAGS) are frozen before we run — a
site-startup hook pre-imports jax — so everything must go through
jax.config.update, which works post-import.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")  # force: the shell env points at the TPU
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: keeps repeated test runs fast.
_cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
