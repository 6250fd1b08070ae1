"""Multi-chip sum-check: lane-sharded round evaluation with psum.

This is the TPU-native form of the reference's two-level blocked
reduction (sumcheck.rs:389-491; SURVEY.md section 5 "eq-split"):
the hypercube axis is sharded across the mesh's data axis; each chip
computes its local wide-accumulator COLUMN SUMS (delayed reduction —
no Montgomery reduce inside the loop), the (ACC_COLS,) integer column
vectors are psum'd over ICI (tiny: ~46 int32 values per evaluation
point), and the single REDC runs replicated.

The per-round transcript (Keccak squeeze) is replicated compute on all
chips — O(100) bytes, negligible — keeping the whole round a single
jitted SPMD program with no host round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..field.jnp_ops import NL, FieldOps
from ..utils.jitcache import cached_jit
from ..sumcheck.prove import absorb_unipoly, from_evals4_dev, unipoly_eval_dev
from ..transcript.device import DeviceTranscript
from .mesh import DATA_AXIS


class ShardedSumcheckCubic:
    """prove_cubic_with_three_inputs with the batch axis sharded.

    Semantically identical to sumcheck.prove.SumcheckProverCubic (same
    transcript bytes, same messages); the evaluation sums and binds run
    sharded, with one psum of integer columns per evaluation point.
    """

    def __init__(self, ops: FieldOps, mesh: Mesh):
        self.ops = ops
        self.mesh = mesh

    def _partial_cols(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Local delayed-reduction column sums of <a, b>: (ACC_COLS,)."""
        ops = self.ops
        t = ops._mul_cols(a, b)
        cols = ops._parallel_carry(t)
        n = a.shape[-1]
        while n > 1:
            k = min(n, 4096)
            cols = cols.reshape(cols.shape[:-1] + (n // k, k)).sum(axis=-1)
            cols = ops._parallel_carry(cols)
            n //= k
        return cols[..., 0]

    @functools.lru_cache(maxsize=None)
    def _step(self, n: int):
        ops = self.ops
        mesh = self.mesh
        spec = P(None, DATA_AXIS)

        def local_evals(eq, A, Bp, C):
            """Per-shard evaluation-point column sums; psum over chips."""
            half = eq.shape[1] // 2
            eq_l, eq_h = eq[:, :half], eq[:, half:]
            A_l, A_h = A[:, :half], A[:, half:]
            B_l, B_h = Bp[:, :half], Bp[:, half:]
            C_l, C_h = C[:, :half], C[:, half:]

            def eval_at(eqv, Av, Bv, Cv):
                u = ops.sub(ops.mont_mul(Av, Bv), Cv)
                return self._partial_cols(eqv, u)

            eq_d, A_d = ops.sub(eq_h, eq_l), ops.sub(A_h, A_l)
            B_d, C_d = ops.sub(B_h, B_l), ops.sub(C_h, C_l)
            t0 = eval_at(eq_l, A_l, B_l, C_l)
            eq2, A2 = ops.add(eq_h, eq_d), ops.add(A_h, A_d)
            B2, C2 = ops.add(B_h, B_d), ops.add(C_h, C_d)
            t2 = eval_at(eq2, A2, B2, C2)
            eq3, A3 = ops.add(eq2, eq_d), ops.add(A2, A_d)
            B3, C3 = ops.add(B2, B_d), ops.add(C2, C_d)
            t3 = eval_at(eq3, A3, B3, C3)
            cols = jnp.stack([t0, t2, t3])  # (3, ACC_COLS)
            return jax.lax.psum(cols, DATA_AXIS)

        # NOTE: each shard's [lo | hi] halves must correspond to the global
        # halves — we shard the HALF arrays, not the full array, so the
        # shard boundary never crosses the lo/hi split.
        def step(eq_l, eq_h, A_l, A_h, B_l, B_h, C_l, C_h, claim, tstate, t_round):
            def shard_body(eq_l, eq_h, A_l, A_h, B_l, B_h, C_l, C_h):
                eq = jnp.concatenate([eq_l, eq_h], axis=1)
                A = jnp.concatenate([A_l, A_h], axis=1)
                Bp = jnp.concatenate([B_l, B_h], axis=1)
                C = jnp.concatenate([C_l, C_h], axis=1)
                return local_evals(eq, A, Bp, C)

            cols3 = shard_map(
                shard_body, mesh=mesh,
                in_specs=(spec,) * 8,
                out_specs=P(),
            )(eq_l, eq_h, A_l, A_h, B_l, B_h, C_l, C_h)

            t0 = ops.acc_reduce(cols3[0])
            t2 = ops.acc_reduce(cols3[1])
            t3 = ops.acc_reduce(cols3[2])
            e1 = ops.sub(claim, t0)
            coeffs = from_evals4_dev(ops, t0, e1, t2, t3)

            td = DeviceTranscript(ops, state=tstate,
                                  round=jnp.asarray(t_round, jnp.uint32))
            absorb_unipoly(td, coeffs)
            r = td.squeeze_mont(b"c")
            new_claim = unipoly_eval_dev(ops, coeffs, r)

            def bind_shard(lo, hi, r):
                rb = jnp.broadcast_to(r[:, None], lo.shape)
                return ops.add(lo, ops.mont_mul(rb, ops.sub(hi, lo)))

            bind = shard_map(
                bind_shard, mesh=mesh,
                in_specs=(spec, spec, P()),
                out_specs=spec,
            )
            eq_n = bind(eq_l, eq_h, r)
            A_n = bind(A_l, A_h, r)
            B_n = bind(B_l, B_h, r)
            C_n = bind(C_l, C_h, r)
            return eq_n, A_n, B_n, C_n, new_claim, r, coeffs, td.state

        return cached_jit(step, devices=list(self.mesh.devices.flat))

    def prove(self, td: DeviceTranscript, eq, A, Bp, C, claim):
        """Run all rounds; arrays are (NL, n) device-sharded on axis 1."""
        n = eq.shape[1]
        coeffs_out, r_out = [], []
        n_dev = self.mesh.devices.size
        while n > max(1, n_dev):  # sharded rounds while each chip has work
            half = n // 2
            step = self._step(n)
            parts = []
            for arr in (eq, A, Bp, C):
                parts.extend([arr[:, :half], arr[:, half:]])
            eq, A, Bp, C, claim, r, coeffs, tstate = step(*parts, claim,
                                                          td.state, int(td.round))
            td.state = tstate
            td.round += 1
            coeffs_out.append(coeffs)
            r_out.append(r)
            n = half
        return (eq, A, Bp, C), coeffs_out, r_out, claim
