"""Test config: run on CPU with 8 virtual devices so operator tests are fast
and sharding tests work without N real chips (mirrors the reference's
in-process DistributedQueryRunner — testing/trino-testing/.../
DistributedQueryRunner.java:99).

The environment force-registers a remote-TPU ("axon") backend via
sitecustomize, overriding JAX_PLATFORMS, so we must override back after
import but before any array is created.
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # quiet AOT-cache notes
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent XLA compile cache: the eager executor compiles many small
# per-shape programs; caching them across test runs cuts suite time ~5x
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
