import os

# Protocol/kernel tests run on a virtual 8-device CPU mesh so that multi-chip
# sharding is exercised without TPU hardware (bench runs on the real chip).
# The axon sitecustomize forces JAX_PLATFORMS=axon, so override through the
# jax config instead of the environment.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_vmpc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
