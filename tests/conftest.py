"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test session.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from zeronotesamba_tpu.utils.hostcache import cpu_cache_dir, with_aot_safe_flag  # noqa: E402

# Host-keyed CPU cache dir: a cache written by a different-featured host
# AOT-rejects every entry and forces full recompiles (utils/hostcache.py).
os.environ["JAX_COMPILATION_CACHE_DIR"] = cpu_cache_dir()
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# AVX2 cap: same-host AOT cache reuse is broken above AVX2 (hostcache.py).
os.environ["XLA_FLAGS"] = with_aot_safe_flag(flags)

# The harness presets JAX_PLATFORMS=axon (tunneled TPU) and its sitecustomize
# imports jax at interpreter startup, so env vars are read before conftest
# runs — override through jax.config instead.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # backend already initialized; XLA_FLAGS fallback applies

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
