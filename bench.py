"""Benchmark harness (reference: benches/sha256_spartan.rs).

Default workload: SpartanSNARK prove latency over the SHA-256 circuit —
the reference's headline benchmark.  ``prove`` excludes setup and
prep_prove (witness prefix synthesis + precommitted commits), matching
the reference's criterion target which benches prove() with a reused
PrepSNARK (benches/sha256_spartan.rs:219-236).

Env knobs:
  BENCH_WORKLOAD   sha256_prove (default) | sumcheck | neutronnova
  BENCH_PREIMAGE_BYTES   preimage size for sha256_prove (default 1024;
                         the reference benches 1024 and 2048,
                         benches/sha256_spartan.rs:167)
  BENCH_NN_STEPS   NeutronNova batch size (default 16; reference 16/32,
                   benches/sha256_neutronnova.rs:37-45)
  BENCH_SIZE       log2 hypercube size for sumcheck (default 20)
  BENCH_ENGINE     engine name (default P256HyraxEngine — the stand-in
                   for the reference's T256HyraxEngine bench engine,
                   provider/engines.py)
  BENCH_ITERS      timed prove iterations (default 3; prewarm.py uses 1
                   to compile-and-cache every kernel with minimum device
                   time)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline``: the reference publishes no absolute numbers
(BASELINE.md); we normalize against documented ESTIMATES of the Rust
prover on a 16-core x86 host, and mark that in "baseline" fields.
"""

import json
import os
import time


def bench_sumcheck():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spartan2_tpu.field.constants import get_field
    from spartan2_tpu.field.jnp_ops import NL, FieldOps
    from spartan2_tpu.sumcheck.prove import SumcheckProverQuad
    from spartan2_tpu.transcript.device import DeviceTranscript

    size = int(os.environ.get("BENCH_SIZE", "20"))
    ops = FieldOps(get_field("pallas_scalar"))
    n = 1 << size
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.integers(0, 4096, (NL, n), dtype=np.int32))
    B = jnp.asarray(rng.integers(0, 4096, (NL, n), dtype=np.int32))
    prover = SumcheckProverQuad(ops)

    def run():
        td = DeviceTranscript(ops, label=b"bench")
        claim = ops.sum_products(A, B)
        coeffs, rs, finals, claim_out = prover.prove(td, A, B, claim, size)
        return jax.block_until_ready(finals[0])

    run()  # warm-up: compiles every round size
    t0 = time.time()
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters
    field_muls = 5 * n  # 2 sums + 2 binds per round, halving; + initial claim
    value = field_muls / dt
    # Rust estimate: ~4e8 field-muls/s on a 16-core x86 host (256-bit
    # field, delayed reduction, ~25 ns/mul/core amortized).
    return {
        "metric": f"sumcheck_quad_2^{size}_field_muls_per_s",
        "value": round(value, 1),
        "unit": "field_muls/s",
        "vs_baseline": round(value / 4.0e8, 4),
    }


def bench_sha256_prove():
    import random

    from spartan2_tpu.frontend.gadgets.sha256 import Sha256Circuit
    from spartan2_tpu.provider.engines import get_engine
    from spartan2_tpu.snark.spartan import SpartanSNARK

    n_bytes = int(os.environ.get("BENCH_PREIMAGE_BYTES", "1024"))
    preimage = bytes(i & 0xFF for i in range(n_bytes))
    circuit = Sha256Circuit(preimage)
    engine = get_engine(os.environ.get("BENCH_ENGINE", "P256HyraxEngine"))

    det = lambda seed: (lambda q, r=random.Random(seed).randrange: r(q))
    # all four reference phases (benches/sha256_spartan.rs:198-258)
    t0 = time.time()
    pk, vk = SpartanSNARK.setup(engine, circuit, width=2048)
    setup_s = time.time() - t0
    t0 = time.time()
    prep = SpartanSNARK.prep_prove(pk, circuit, is_small=True, rng=det(1))
    prep_s = time.time() - t0

    # warm-up prove (compiles all per-round kernels once; cached on disk)
    proof, prep = SpartanSNARK.prove(pk, circuit, prep, is_small=True, rng=det(2))
    t0 = time.time()
    assert SpartanSNARK.verify(proof, vk) == circuit.public_values()
    verify_s = time.time() - t0
    from spartan2_tpu.utils.serde import spartan_proof_to_bytes

    proof_bytes = len(spartan_proof_to_bytes(proof, engine))

    iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.time()
    for i in range(iters):
        proof, prep = SpartanSNARK.prove(pk, circuit, prep, is_small=True,
                                         rng=det(3 + i))
    dt = (time.time() - t0) / iters
    # Rust estimate for this workload class: ~50 ms/block prove on a
    # 16-core x86 host (no published numbers; see BASELINE.md).
    blocks = (n_bytes + 9 + 63) // 64
    baseline_s = 0.05 * blocks
    return {
        "metric": f"sha256_{n_bytes}B_spartan_prove_latency",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(baseline_s / dt, 4),  # >1 means faster than est.
        "baseline": f"estimated Rust 16-core x86: {baseline_s:.2f}s (no published numbers)",
        "proof_bytes": proof_bytes,
        "engine": engine.name,
        "setup_s": round(setup_s, 2),
        "prep_prove_s": round(prep_s, 2),
        "verify_s": round(verify_s, 3),
    }


def bench_neutronnova():
    """Batch folding prove latency (reference benches/sha256_neutronnova.rs:
    N steps folded + core).  BENCH_NN_STEPS controls N (reference: 16/32)."""
    import random

    from spartan2_tpu.frontend.gadgets.sha256 import Sha256Circuit
    from spartan2_tpu.provider.engines import get_engine
    from spartan2_tpu.snark.neutronnova import NeutronNovaZkSNARK
    from spartan2_tpu.utils.serde import neutronnova_proof_to_bytes

    n_steps = int(os.environ.get("BENCH_NN_STEPS", "16"))
    # reference shape: one 64-byte block (one SHA-256 compression,
    # ~26k constraints) per step (benches/sha256_neutronnova.rs:37-45)
    step_circuits = [Sha256Circuit(bytes([i] * 55)) for i in range(n_steps)]
    core = Sha256Circuit(bytes(55))
    engine = get_engine(os.environ.get("BENCH_ENGINE", "P256HyraxEngine"))
    det = lambda seed: (lambda q, r=random.Random(seed).randrange: r(q))

    t0 = time.time()
    pk, vk = NeutronNovaZkSNARK.setup(engine, step_circuits[0], core, n_steps,
                                      width=2048)
    setup_s = time.time() - t0
    t0 = time.time()
    prep = NeutronNovaZkSNARK.prep_prove(pk, step_circuits, core,
                                         is_small=True, rng=det(1))
    prep_s = time.time() - t0
    proof, prep = NeutronNovaZkSNARK.prove(pk, step_circuits, core, prep,
                                           is_small=True, rng=det(2))
    t0 = time.time()
    NeutronNovaZkSNARK.verify(proof, vk, n_steps)
    verify_s = time.time() - t0
    size = len(neutronnova_proof_to_bytes(proof, engine))

    t0 = time.time()
    proof, prep = NeutronNovaZkSNARK.prove(pk, step_circuits, core, prep,
                                           is_small=True, rng=det(3))
    dt = time.time() - t0
    # Rust estimate: ~40 ms/step fold + prove overhead on 16 cores.
    baseline_s = 0.04 * n_steps + 0.3
    return {
        "metric": f"neutronnova_{n_steps}steps_sha256_prove_latency",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(baseline_s / dt, 4),
        "baseline": f"estimated Rust 16-core x86: {baseline_s:.2f}s (no published numbers)",
        "proof_bytes": size,
        "engine": engine.name,
        "setup_s": round(setup_s, 2),
        "prep_prove_s": round(prep_s, 2),
        "verify_s": round(verify_s, 3),
    }


def main() -> None:
    workload = os.environ.get("BENCH_WORKLOAD", "sha256_prove")
    if workload == "sumcheck":
        result = bench_sumcheck()
    elif workload == "neutronnova":
        result = bench_neutronnova()
    else:
        result = bench_sha256_prove()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
