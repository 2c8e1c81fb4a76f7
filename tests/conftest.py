"""Hermetic test configuration.

Runs every test on the CPU backend with 8 virtual devices so pjit/shard_map sharding is
exercised without TPU hardware (SURVEY.md §4 — the 'fake backend' strategy the reference
never had). The session environment force-prepends the 'axon' TPU platform to
JAX_PLATFORMS, so the env var alone is not enough — we must override via jax.config
before any device is touched.
"""

import os

_platform = os.environ.get("SIMT_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

# Persistent compilation cache: the big train-step programs take minutes to compile;
# reuse across test runs. Keyed by the resolved backend name (not the platform
# string) so e.g. SIMT_TEST_PLATFORM="axon,cpu" shares .jax_cache/tpu with bench.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache",
                      jax.default_backend())
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
