"""spartan2_tpu: a TPU-native Spartan/NeutronNova zkSNARK library.

Package layout mirrors the reference's layer map (SURVEY.md section 1):
field/ (L1 limb kernels), transcript/ (Keccak Fiat-Shamir), polys/ +
sumcheck/ (L3), r1cs/ (L4), ec/ + pcs/ (L2 curve/MSM/Hyrax), frontend/
(L5 circuit synthesis), snark/ (L6 proof systems).
"""

import os


def _init_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache for every entry point.

    The 12-bit-limb field kernels compile into large XLA graphs (minutes
    on a small host, once per shape); the persistent cache turns that
    into a one-time cost shared by tests, benches, and library users.
    Opt out with SPARTAN2_TPU_NO_CACHE=1 or override the directory with
    SPARTAN2_TPU_CACHE_DIR.
    """
    if os.environ.get("SPARTAN2_TPU_NO_CACHE"):
        return
    cache_dir = os.environ.get(
        "SPARTAN2_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "spartan2_tpu", "jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_init_compilation_cache()
