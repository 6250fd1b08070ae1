"""Mesh scaling measurement: the sharded outer sum-check ROUND STEP at
1/2/4/8 devices.

BASELINE.md north-star: >= 80% ops/s scaling efficiency at 1 chip /
1 host / 4 hosts.  Real multi-chip hardware is not reachable from this
build host (one TPU v5e via a tunnel), so this harness measures the
sharded prover on a virtual CPU mesh
(xla_force_host_platform_device_count).  All virtual devices timeshare
ONE physical core, so wall-clock "efficiency" here is dominated by the
host, not the interconnect; the meaningful outputs are

  * correctness: the round-0 polynomial + transcript state of the
    sharded step are byte-identical at every device count (asserted
    against the 1-device run), and
  * comm_overhead: how much extra total device time the collectives
    add versus the single-device run (TN * N / T1) — on a real mesh
    this bounds the efficiency loss from communication.

Methodology note: we time ONE fixed-size round step (the size-2^SIZE
first round of the outer sum-check — the only round shape whose cost
matters; later rounds halve) rather than the full 13-round prove.
Full-chain sharded-vs-single transcript identity is covered by
tests/test_mesh.py; XLA:CPU compiles at minutes per kernel make the
full chain x device-count sweep intractable on this host.

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

    def mk_half():
        arr = jnp.asarray(rng.integers(0, 4096, (NL, n // 2), dtype=np.int32))
        return jax.device_put(arr, sharding)

    # one round step at size n: 8 sharded half-arrays in, psum'd coeffs out
    halves = [mk_half() for _ in range(8)]
    prover = ShardedSumcheckCubic(ops, mesh)
    step = prover._step(n)
    td = DeviceTranscript(ops, label=b"scaling")
    claim = ops.const(0)

    def run():
        out = step(*halves, claim, td.state, int(td.round))
        jax.block_until_ready(out[4])
        return out

    out = run()  # warm-up / compile
    coeffs_hex = np.asarray(out[6]).tobytes().hex()[:32]
    state_hex = np.asarray(out[7]).tobytes().hex()[:16]

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters
    print(json.dumps({
        "devices": n_devices,
        "size": size,
        "step_wall_s": round(dt, 4),
        "coeffs": coeffs_hex,
        "transcript": state_hex,
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

    t1 = results[0]["step_wall_s"]
    c0, s0 = results[0]["coeffs"], results[0]["transcript"]
    print(f"\n{'devices':>8} {'step_s':>9} {'speedup':>8} {'comm_overhead':>14}")
    for r in results:
        assert r["coeffs"] == c0 and r["transcript"] == s0, \
            "sharded round diverged"
        n, tn = r["devices"], r["step_wall_s"]
        print(f"{n:>8} {tn:>9.4f} {t1 / tn:>8.2f} {tn * n / t1:>14.2f}")
    print("round coeffs + transcript byte-identical across device counts: OK")


if __name__ == "__main__":
    main()
