import os

# Force a virtual 8-device CPU mesh for all tests: sharding logic must be
# exercised without TPU hardware, and CPU gives float64 for oracle comparison.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
