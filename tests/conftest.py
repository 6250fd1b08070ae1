"""Test configuration: force CPU backend with a virtual 8-device mesh.

Tests validate correctness of the (pure-JAX) kernels on the CPU backend;
TPU-specific performance is exercised by bench.py on real hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the limb kernels are large graphs compiled
# per (field, shape); caching them across test runs cuts minutes of XLA time.
import jax

_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
