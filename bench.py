"""Benchmark: device sum-check prover throughput (reference hot loop #1).

Runs the quad sum-check prover (BDDT two-sums-per-round, device-resident
Keccak transcript) on a 2^SIZE hypercube — the same workload as the
reference's sum-check perf tests (src/sumcheck.rs:1431-1573, sizes
2^16..2^24) — and reports field-multiplications per second.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline``: the reference publishes no absolute numbers
(BASELINE.md); we normalize against a documented estimate of the Rust
prover on a 16-core x86 host: ~4e8 field-muls/s (256-bit field, delayed
reduction, ~25ns/mul/core amortized).
"""

import json
import os
import time

import numpy as np

SIZE = int(os.environ.get("BENCH_SIZE", "20"))
RUST_BASELINE_MULS_PER_S = 4.0e8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from spartan2_tpu.field.constants import get_field
    from spartan2_tpu.field.jnp_ops import NL, FieldOps
    from spartan2_tpu.sumcheck.prove import SumcheckProverQuad
    from spartan2_tpu.transcript.device import DeviceTranscript

    ops = FieldOps(get_field("pallas_scalar"))
    n = 1 << SIZE
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.integers(0, 4096, (NL, n), dtype=np.int32))
    B = jnp.asarray(rng.integers(0, 4096, (NL, n), dtype=np.int32))

    prover = SumcheckProverQuad(ops)

    def run():
        td = DeviceTranscript(ops, label=b"bench")
        claim = ops.sum_products(A, B)
        coeffs, rs, finals, claim_out = prover.prove(td, A, B, claim, SIZE)
        return jax.block_until_ready(finals[0])

    run()  # warm-up: compiles every round size
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters

    # per round at size m: t0 (m/2 muls) + t_inf (m/2) + two binds (2*m/2)
    # = 2m; sum over rounds = 4n; plus the initial claim (n) = 5n.
    field_muls = 5 * n
    value = field_muls / dt
    print(json.dumps({
        "metric": f"sumcheck_quad_2^{SIZE}_field_muls_per_s",
        "value": round(value, 1),
        "unit": "field_muls/s",
        "vs_baseline": round(value / RUST_BASELINE_MULS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
