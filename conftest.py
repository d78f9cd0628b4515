"""Pytest root conftest.

Tests run on CPU with 8 virtual XLA host devices so the multi-chip sharding
paths (tyleri_tpu.parallel) are exercised without TPU hardware.  These env
vars must be set before the first ``import jax`` anywhere in the test
process, which is why this lives in the repo-root conftest.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent compile cache (the framework's pipeline-cache analog) so repeated
# test runs skip XLA compilation.
import jax  # noqa: E402

# The axon TPU plugin in this environment ignores the JAX_PLATFORMS env var;
# force CPU through the config so the 8 virtual devices take effect.
jax.config.update("jax_platforms", "cpu")
# honor an explicit env override (e.g. a throwaway dir for a cold-cache
# stability run) so such runs don't touch the shared .jax_cache with its
# expensive TPU executables
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# jax's cache writer is not atomic; concurrent processes sharing .jax_cache
# (a TPU bench next to a CPU test run) can tear entries.  Harden it.
from tyleri_tpu.utils.cache_hardening import install as _harden_cache  # noqa: E402

_harden_cache()
