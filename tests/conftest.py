"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on faked CPU devices per SURVEY.md §4
("multi-node testing"); the real-TPU path is exercised by bench.py and the
driver's compile checks.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("BN_TPU_BACKEND", "jnp")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA:CPU compiles these integer graphs slowly
# (~500 HLO/s); caching makes repeat test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/bn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
