import os

# Force a virtual 8-device CPU mesh for all tests: sharding logic must be
# exercised without TPU hardware, and CPU gives float64 for oracle comparison.
#
# The environment pins JAX_PLATFORMS=axon (a remote-TPU tunnel) via a
# sitecustomize hook that overrides the env var through jax.config, so we must
# override back through jax.config as well — env vars alone are ignored.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the suite's cost is dominated by XLA:CPU
# compiles of ~8 kernel shapes; caching them makes re-runs (and the smoke
# tier) fast.
_cache = os.path.expanduser("~/.cache/hipstr_tpu_xla_tests")
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
