"""Mesh scaling measurement: sharded outer sum-check at 1/2/4/8 devices.

BASELINE.md north-star: >= 80% ops/s scaling efficiency at 1 chip /
1 host / 4 hosts.  Real multi-chip hardware is not reachable from this
build host (one TPU v5e via a tunnel), so this harness measures the
sharded prover on a virtual CPU mesh
(xla_force_host_platform_device_count).  All virtual devices timeshare
ONE physical core, so wall-clock "efficiency" here is dominated by the
host, not the interconnect; the meaningful outputs are

  * correctness: the sharded transcript is byte-identical at every
    device count (asserted), and
  * comm_overhead: how much extra total device time the collectives +
    remainder gather add versus the single-device run (TN * N / T1) —
    on a real mesh this bounds the efficiency loss from communication.

Run:  python bench_scaling.py            (spawns one subprocess per N)
      BENCH_SCALING_SIZE=16 to change the hypercube size (default 2^14).
Prints one JSON line per device count plus a summary table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SIZES = (1, 2, 4, 8)


def _child(n_devices: int) -> None:
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from spartan2_tpu.field.constants import get_field
    from spartan2_tpu.field.jnp_ops import NL, FieldOps
    from spartan2_tpu.parallel.mesh import lane_sharding, make_mesh
    from spartan2_tpu.parallel.sumcheck_shard import ShardedSumcheckCubic
    from spartan2_tpu.transcript.device import DeviceTranscript

    size = int(os.environ.get("BENCH_SCALING_SIZE", "14"))
    n = 1 << size
    ops = FieldOps(get_field("pallas_scalar"))
    mesh = make_mesh(n_devices)
    sharding = lane_sharding(mesh)
    rng = np.random.default_rng(7)

    def mk():
        arr = jnp.asarray(rng.integers(0, 4096, (NL, n), dtype=np.int32))
        return jax.device_put(arr, sharding)

    eq, A, B, C = mk(), mk(), mk(), mk()
    prover = ShardedSumcheckCubic(ops, mesh)

    def run():
        td = DeviceTranscript(ops, label=b"scaling")
        (eq2, A2, B2, C2), coeffs, rs, claim = prover.prove(
            td, eq, A, B, C, ops.const(0))
        jax.block_until_ready(A2)
        return bytes(np.asarray(td.state)), len(coeffs)

    state, rounds = run()  # warm-up / compile
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        state2, _ = run()
    dt = (time.time() - t0) / iters
    assert state2 == state
    print(json.dumps({
        "devices": n_devices,
        "size": size,
        "sharded_rounds": rounds,
        "wall_s": round(dt, 4),
        "transcript": state.hex()[:16],
    }), flush=True)


def main() -> None:
    if len(sys.argv) > 1:
        _child(int(sys.argv[1]))
        return

    results = []
    for n in SIZES:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        flags.append(f"--xla_force_host_platform_device_count={n}")
        env["XLA_FLAGS"] = " ".join(flags)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(n)],
            env=env, capture_output=True, text=True, check=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
        print(line, flush=True)

    t1 = results[0]["wall_s"]
    tr0 = results[0]["transcript"]
    print(f"\n{'devices':>8} {'wall_s':>9} {'speedup':>8} {'comm_overhead':>14}")
    for r in results:
        assert r["transcript"] == tr0, "sharded transcript diverged"
        n, tn = r["devices"], r["wall_s"]
        print(f"{n:>8} {tn:>9.4f} {t1 / tn:>8.2f} {tn * n / t1:>14.2f}")
    print("transcripts byte-identical across device counts: OK")


if __name__ == "__main__":
    main()
