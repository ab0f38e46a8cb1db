import os

# Protocol/kernel tests run on a virtual 8-device CPU mesh so that multi-chip
# sharding is exercised without TPU hardware (bench runs on the real chip).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
