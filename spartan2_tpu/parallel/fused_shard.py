"""Whole-sum-check fused kernel, sharded: ONE shard_map dispatch.

Multi-chip twin of sumcheck.fused.FusedSumcheckCubicEq (byte-identical
wire messages — equality-tested against it, which is itself equality-
tested against the per-round Gruen prover).  Layout:

* Phase A (large rounds): the Gruen grid (NL, rows, R) is sharded on
  the INNER column axis R — each chip owns R/ndev columns of every row.
  Row binds are chip-local; the two-level weighted sums compute local
  delayed-reduction COLUMN sums (46 int32s) and psum them over ICI —
  the only per-round collective, ~200 bytes.  After the per-device
  carry the columns are < 2^17, so an 8-chip psum stays far from int32
  overflow.  The transcript squeeze and Gruen algebra run replicated.
* Phase B (rounds at/below 2R elements): one all_gather moves the
  surviving (NL, 2, R/ndev) head to every chip (~tens of KB), and the
  tail rounds run replicated — the data is too small to shard usefully
  (SCALING.md: sharded tail rounds are latency-bound, not FLOP-bound).

Compile economics: the per-round sharded prover
(parallel/sumcheck_shard.py) compiles one kernel per round size — the
round-3 multichip gate timed out on exactly those XLA:CPU compiles.
This kernel compiles ONCE per (m, mesh) pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field.jnp_ops import NL, FieldOps
from ..polys.eq import eq_evals_device
from ..sumcheck.fused import _dus, fused_cubic_pack, fused_cubic_ok
from ..sumcheck.prove import gruen_finish, round_dev
from ..utils.jitcache import cached_jit
from .mesh import DATA_AXIS

I32 = jnp.int32


class FusedShardedCubicEq:
    """One-dispatch sharded Gruen/BDDT cubic sum-check."""

    def __init__(self, ops: FieldOps, mesh: Mesh):
        self.ops = ops
        self.mesh = mesh

    def shardable(self, m: int) -> bool:
        nd = self.mesh.devices.size
        R = 1 << (m - m // 2)
        return m >= 6 and R % nd == 0 and R // nd >= 2

    def _two_level_cols(self, ER_loc, EL_masked, f):
        """Local two-level weighted sum -> wide accumulator columns
        (pre-psum): sum_a EL[a] * sum_b ER[b] * f[a, b]."""
        ops = self.ops
        t = ops._mul_cols(ER_loc[:, None, :], f)  # (43, L, R_loc)
        t = ops._parallel_carry(t)
        n = f.shape[2]
        while n > 1:
            k = min(n, 4096)
            t = t.reshape(t.shape[:2] + (n // k, k)).sum(axis=-1)
            t = ops._parallel_carry(t)
            n //= k
        inner = ops.acc_reduce(t[..., 0])  # (NL, L) — local field elems
        u = ops._mul_cols(EL_masked, inner)
        cols = ops._parallel_carry(u)
        L = inner.shape[-1]
        while L > 1:
            k = min(L, 4096)
            cols = cols.reshape(cols.shape[:-1] + (L // k, k)).sum(axis=-1)
            cols = ops._parallel_carry(cols)
            L //= k
        return cols[..., 0]  # (ACC_COLS,)

    @functools.lru_cache(maxsize=None)
    def _kernel(self, m: int):
        ops = self.ops
        mesh = self.mesh
        nd = mesh.devices.size
        fh = m // 2
        R = 1 << (m - fh)
        R_loc = R // nd
        rows0 = 1 << fh
        ELmax = rows0 // 2
        grid_spec = P(None, None, DATA_AXIS)

        def kernel(A, B, C, consts, el0, taus_hi, claim, tstate, t_round):
            def body_shard(A, B, C, consts, el0, taus_hi, claim, tstate,
                           t_round):
                # A/B/C local: (NL, rows0, R_loc)
                ER = eq_evals_device(ops, taus_hi)  # replicated (NL, R)
                idx = jax.lax.axis_index(DATA_AXIS)
                ER_loc = jax.lax.dynamic_slice(
                    ER, (0, idx * R_loc), (NL, R_loc))
                cbuf = jnp.zeros((NL, m, 4), I32)
                rbuf = jnp.zeros((NL, m), I32)
                P_run = ops.const(ops.spec.r_mod)

                def finish(j, c5, t0s, tinfs, Pr, claim, tstate):
                    scale = c5[:, 4]
                    t0_raw = ops.mont_mul(t0s, scale)
                    tinf_raw = ops.mont_mul(tinfs, scale)
                    return gruen_finish(ops, False, False, c5[:, :4],
                                        t0_raw, tinf_raw, None, Pr, claim,
                                        tstate, t_round + j)

                def body_a(j, carry):
                    A, B, C, Pr, claim, tstate, cbuf, rbuf = carry
                    el_len = ELmax >> j
                    c5 = jax.lax.dynamic_slice(
                        consts, (0, j, 0), (NL, 1, 5))[:, 0, :]
                    A_l, B_l, C_l = (A[:, :ELmax], B[:, :ELmax], C[:, :ELmax])
                    sl = lambda X: jax.lax.dynamic_slice(
                        X, (0, el_len, 0), (NL, ELmax, R_loc))
                    A_h, B_h, C_h = sl(A), sl(B), sl(C)
                    A_d, B_d, C_d = (ops.sub(A_h, A_l), ops.sub(B_h, B_l),
                                     ops.sub(C_h, C_l))
                    ELm = jnp.where(jnp.arange(ELmax) < el_len, el0, 0)
                    f0 = ops.sub(ops.mont_mul(A_l, B_l), C_l)
                    finf = ops.mont_mul(A_d, B_d)
                    cols2 = jnp.stack([
                        self._two_level_cols(ER_loc, ELm, f0),
                        self._two_level_cols(ER_loc, ELm, finf)])
                    cols2 = jax.lax.psum(cols2, DATA_AXIS)
                    t0s = ops.acc_reduce(cols2[0])
                    tinfs = ops.acc_reduce(cols2[1])
                    coeffs, r, claim, Pr, tstate = finish(
                        j, c5, t0s, tinfs, Pr, claim, tstate)
                    rb = jnp.broadcast_to(r[:, None, None], (NL, ELmax, R_loc))
                    A = jnp.concatenate(
                        [ops.add(A_l, ops.mont_mul(rb, A_d)), A[:, ELmax:]], 1)
                    B = jnp.concatenate(
                        [ops.add(B_l, ops.mont_mul(rb, B_d)), B[:, ELmax:]], 1)
                    C = jnp.concatenate(
                        [ops.add(C_l, ops.mont_mul(rb, C_d)), C[:, ELmax:]], 1)
                    cbuf = _dus(cbuf, coeffs[:, None, :], (0, j, 0))
                    rbuf = _dus(rbuf, r[:, None], (0, j))
                    return A, B, C, Pr, claim, tstate, cbuf, rbuf

                A2, B2, C2, P_run, claim2, tstate2, cbuf, rbuf = \
                    jax.lax.fori_loop(
                        0, fh - 1, body_a,
                        (A, B, C, P_run, claim, tstate, cbuf, rbuf))

                # gather the surviving 2-row head; phase B replicated
                def gather_head(X):
                    g = jax.lax.all_gather(
                        X[:, :2], DATA_AXIS, axis=2, tiled=True)
                    return g.reshape(NL, 2 * R)

                Af, Bf, Cf = gather_head(A2), gather_head(B2), gather_head(C2)

                def body_b(i, carry):
                    A, B, C, Pr, claim, tstate, cbuf, rbuf = carry
                    j = fh - 1 + i
                    half = R >> i
                    c5 = jax.lax.dynamic_slice(
                        consts, (0, j, 0), (NL, 1, 5))[:, 0, :]
                    A_l, B_l, C_l = A[:, :R], B[:, :R], C[:, :R]
                    sl = lambda X: jax.lax.dynamic_slice(
                        X, (0, half), (NL, R))
                    A_h, B_h, C_h = sl(A), sl(B), sl(C)
                    A_d, B_d, C_d = (ops.sub(A_h, A_l), ops.sub(B_h, B_l),
                                     ops.sub(C_h, C_l))
                    w = jnp.where(jnp.arange(R) < half, ER, 0)
                    f0 = ops.sub(ops.mont_mul(A_l, B_l), C_l)
                    finf = ops.mont_mul(A_d, B_d)
                    t0s = ops.sum_products(w, f0)
                    tinfs = ops.sum_products(w, finf)
                    coeffs, r, claim, Pr, tstate = finish(
                        j, c5, t0s, tinfs, Pr, claim, tstate)
                    rb = jnp.broadcast_to(r[:, None], (NL, R))
                    A = jnp.concatenate(
                        [ops.add(A_l, ops.mont_mul(rb, A_d)), A[:, R:]], 1)
                    B = jnp.concatenate(
                        [ops.add(B_l, ops.mont_mul(rb, B_d)), B[:, R:]], 1)
                    C = jnp.concatenate(
                        [ops.add(C_l, ops.mont_mul(rb, C_d)), C[:, R:]], 1)
                    cbuf = _dus(cbuf, coeffs[:, None, :], (0, j, 0))
                    rbuf = _dus(rbuf, r[:, None], (0, j))
                    return A, B, C, Pr, claim, tstate, cbuf, rbuf

                Af, Bf, Cf, P_run, claim3, tstate3, cbuf, rbuf = \
                    jax.lax.fori_loop(
                        0, m - fh + 1, body_b,
                        (Af, Bf, Cf, P_run, claim2, tstate2, cbuf, rbuf))
                return (cbuf, rbuf, Af[:, 0], Bf[:, 0], Cf[:, 0], claim3,
                        tstate3)

            # check_vma=False: after the phase-B all_gather every device
            # holds identical data, but the VMA tracker keeps the
            # gathered arrays tagged {V:data}, which poisons the
            # replicated fori carry (claim/tstate/coeff buffers) and the
            # P() out_specs.  The values are genuinely replicated — the
            # phase-B math is deterministic on gathered+psum'd inputs.
            return shard_map(
                body_shard, mesh=mesh,
                in_specs=(grid_spec,) * 3 + (P(),) * 6,
                out_specs=(P(),) * 7,
                check_vma=False,
            )(A, B, C, consts, el0, taus_hi, claim, tstate, t_round)

        dev = list(mesh.devices.flat)
        return cached_jit(kernel, devices=dev,
                          fastkey=("fused_sharded_cubiceq", ops.spec.name,
                                   m, len(dev)))

    def prove(self, td, A, Bp, C, claim, taus: list[int], spec,
              zero_check: bool = False):
        """Stacked-output twin of FusedSumcheckCubicEq.prove over the
        mesh.  A/Bp/C arrive (NL, 2^m) lane-sharded or unsharded; they
        are re-laid-out to the (NL, rows, R) grid sharded on R."""
        m = len(taus)
        assert A.shape[1] == 1 << m and fused_cubic_ok(spec, taus)
        assert self.shardable(m)
        fh = m // 2
        R = 1 << (m - fh)
        rows0 = 1 << fh
        consts, el0, taus_hi = fused_cubic_pack(spec, taus)
        grid_sh = NamedSharding(self.mesh, P(None, None, DATA_AXIS))
        rep = NamedSharding(self.mesh, P())
        gA, gB, gC = (jax.device_put(x.reshape(NL, rows0, R), grid_sh)
                      for x in (A, Bp, C))
        consts, el0, taus_hi, claim, tstate = (
            jax.device_put(x, rep)
            for x in (consts, el0, taus_hi, claim, td.state))
        cbuf, rbuf, a0, b0, c0, claim, tstate = self._kernel(m)(
            gA, gB, gC, consts, el0, taus_hi, claim, tstate,
            round_dev(int(td.round)))
        # outputs are mesh-replicated; the downstream pipeline (poly_ABC
        # bind, inner sum-check, pulls) runs single-device kernels — pin
        # everything to device 0 like the per-round sharded prover does
        dev0 = jax.devices()[0]
        cbuf, rbuf, a0, b0, c0, claim, tstate = (
            jax.device_put(x, dev0)
            for x in (cbuf, rbuf, a0, b0, c0, claim, tstate))
        td.state = tstate
        td.round += m
        return cbuf, rbuf, (a0, b0, c0), claim


@functools.lru_cache(maxsize=None)
def get_fused_sharded_cubic_eq(ops: FieldOps, mesh: Mesh):
    return FusedShardedCubicEq(ops, mesh)
