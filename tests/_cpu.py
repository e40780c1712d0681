"""Importable CPU-forcing helper for ad-hoc scripts (mirrors conftest.py)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("BN_TPU_BACKEND", "jnp")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/bn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
