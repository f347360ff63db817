"""Test harness bootstrap.

Tests run on CPU with 8 virtual XLA devices so sharding/collective tests work
without TPU hardware (SURVEY.md §4). This environment force-registers a TPU
backend (axon) from sitecustomize and pins ``jax_platforms`` to it, so we
override the platform selection back to CPU before any backend initializes.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-dominated on CPU; this
# makes repeat runs (and CI re-runs) fast. Also exported as env so (a) bin
# modules imported in-process DON'T retarget the cache to the user-level
# default (they skip their config.update when the env var is set), and (b)
# subprocess children (multihost/run.sh E2Es) inherit the suite cache.
# The cache directory is LOCAL-ONLY (gitignored): XLA:CPU serialized
# executables are AOT-compiled for the build host's CPU features, and
# entries committed from one machine fail to load on another
# (cpu_aot_loader errors) with churn that blew test_preemption's 900 s
# deadline in round 4 — never commit entries, only the .gitignore.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache_dir
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
