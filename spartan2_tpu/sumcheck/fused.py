"""Whole-sum-check fused kernels: every round in ONE device dispatch.

Motivation (round-3 profile): the per-round step kernels of
``sumcheck.prove`` are protocol-optimal in FLOPs but each dispatch over
the tunneled TPU link costs ~40-50 ms of launch latency; a 20-round
outer sum-check spends ~10 launches ≈ 480 ms on the wire while the
actual device math is ~10 ms.  The TPU-native answer is a single
kernel that runs ALL rounds inside ``lax.fori_loop`` with fixed-size
masked buffers (static shapes, dynamic-slice offsets) — one launch,
one executable per hypercube size, and a compile/cache footprint far
below the ~10 per-size step kernels it replaces.

Two provers, byte-identical on the wire to their per-round twins
(``SumcheckProverCubicEq`` / ``SumcheckProverQuad``, which remain the
reference implementations and the fallback for tiny sizes and the
adversarial tau==0 / tau==1 edge):

* ``FusedSumcheckCubicEq`` — Gruen/BDDT eq-split outer sum-check
  (reference src/sumcheck.rs:920-1428).  Phase A (large rounds) keeps
  A/B/C in a fixed (NL, rows, R) grid: Gruen's left/right eq split has
  constant inner width R = 2^(m-fh), so halving always happens on the
  row axis and every shape stays static.  The left tables shrink per
  round; instead of uploading one table per round, round j reuses the
  round-0 table's prefix: with MSB-first eq indexing,
  eq(taus[1:fh])[:2^(fh-1-j)] = prod_{i<=j}(1-taus[i]) * eq(taus[j+1:fh]),
  so one host-inverted scalar per round replaces the whole table
  (same values mod p => same transcript bytes).  Phase B (rounds at or
  below 2R elements) runs one-level with the right table's masked
  prefix and the analogous scaling.
* ``FusedSumcheckQuad`` — BDDT quad rounds over a fixed (NL, n) buffer
  with prefix masks.

The round-0 zero-check shortcut of the per-round prover (skip the t(0)
sum) is deliberately NOT special-cased here: for a satisfied R1CS the
computed t(0) is ≡ 0 (mod p) and the transcript canonicalizes before
absorbing, so the bytes are identical and the loop body stays uniform.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..field.jnp_ops import NL, FieldOps
from ..field.limbs import ints_to_limbs_np
from ..polys.eq import eq_evals_device
from ..transcript.device import DeviceTranscript
from ..utils.jitcache import cached_jit
from .prove import absorb_unipoly, from_evals3_dev, gruen_finish, round_dev, \
    unipoly_eval_dev

I32 = jnp.int32

# Below this many rounds the fused kernels yield no wins (the per-round
# path fuses small tails already) and every extra (m, spec) pair costs a
# fresh compile; callers fall back to the per-round provers.
FUSED_MIN_ROUNDS = 10


def _mxu_on() -> bool:
    """Route the evaluation sums through the MXU int8 contractions
    (field/jnp_ops.py sum_products_mxu): the VPU reduction chain was
    ~70% of the fused outer kernel (knockout-profiled round 4).
    SPARTAN2_MXU=0 reverts to the VPU path."""
    return os.environ.get("SPARTAN2_MXU", "1") != "0"


def _dus(buf, val, idx):
    return jax.lax.dynamic_update_slice(buf, val, idx)


def fused_cubic_pack(spec, taus: list[int]):
    """Host-side constants for the fused Gruen prover.

    Returns (consts, el0, taus_hi) as Montgomery limb arrays:
      consts[:, j] = [(1-tau_j), (2tau_j - 1), (2 - 3tau_j), 1/tau_j,
                      scale_j]   # (NL, m, 5)
      el0          = eq(taus[1:fh]) table                 # (NL, 2^(fh-1))
      taus_hi      = taus[fh:]                            # (NL, m - fh)
    where scale_j undoes the shared-prefix factor of the left/right
    table reuse (see module docstring).  Raises ZeroDivisionError when
    any tau_j or (1 - tau_j) is 0 mod p — callers fall back to the
    per-round prover (a ~2^-250 adversarial-only event).
    """
    from ..polys.eq import eq_evals_host

    p = spec.modulus
    m = len(taus)
    fh = m // 2
    consts = np.zeros((m, 5), object)
    run = 1
    for j in range(m):
        tau = taus[j] % p
        if j < fh - 1:
            scale = pow(run, -1, p)  # c_j = 1/prod_{1<=i<=j}(1-tau_i)
            run = run * (1 - taus[j + 1]) % p
        elif j == fh - 1:
            scale = 1
            run = (1 - taus[fh]) % p if fh < m else 1
        else:
            scale = pow(run, -1, p)  # d_j = 1/prod_{fh<=i<=j}(1-tau_i)
            if j + 1 < m:
                run = run * (1 - taus[j + 1]) % p
        consts[j] = [(1 - tau) % p, (2 * tau - 1) % p, (2 - 3 * tau) % p,
                     pow(tau, -1, p), scale]
    consts_dev = ints_to_limbs_np(
        [int(v) for row in consts for v in row], spec).reshape(NL, m, 5)
    el0 = ints_to_limbs_np(eq_evals_host(spec, taus[1:fh]), spec)
    taus_hi = ints_to_limbs_np([t % p for t in taus[fh:]], spec)
    return jnp.asarray(consts_dev), jnp.asarray(el0), jnp.asarray(taus_hi)


def fused_cubic_ok(spec, taus: list[int]) -> bool:
    """True when the fused prover's scaling trick is well-defined."""
    p = spec.modulus
    return (len(taus) >= FUSED_MIN_ROUNDS
            and all(t % p != 0 and (1 - t) % p != 0 for t in taus))


class FusedSumcheckCubicEq:
    """One-dispatch Gruen/BDDT cubic sum-check (see module docstring)."""

    def __init__(self, ops: FieldOps):
        self.ops = ops

    def _two_level(self, ER, EL_masked, f):
        """sum_{a,b} EL[a] * ER[b] * f[a, b]; f is (NL, L, R).

        MXU path: the inner contraction over R is an int8 matmul of the
        6-bit limb planes, the outer over L another; the VPU fallback
        (SPARTAN2_MXU=0) keeps the wide-column reduction chain."""
        ops = self.ops
        if _mxu_on() and f.shape[2] <= 4096:
            inner = ops.weighted_inner_mxu(ER, f)  # (NL, L)
            return ops.sum_products_mxu(EL_masked, inner)
        t = ops._mul_cols(ER[:, None, :], f)  # (43, L, R)
        t = ops._parallel_carry(t)
        n = f.shape[2]
        while n > 1:
            k = min(n, 4096)
            t = t.reshape(t.shape[:2] + (n // k, k)).sum(axis=-1)
            t = ops._parallel_carry(t)
            n //= k
        inner = ops.acc_reduce(t[..., 0])  # (NL, L)
        return ops.sum_products(EL_masked, inner)

    @functools.lru_cache(maxsize=None)
    def _kernel(self, m: int):
        ops = self.ops
        fh = m // 2
        R = 1 << (m - fh)
        rows0 = 1 << fh
        ELmax = rows0 // 2

        def kernel(A, B, C, consts, el0, taus_hi, claim, tstate, t_round):
            ER = eq_evals_device(ops, taus_hi)  # (NL, R)
            cbuf = jnp.zeros((NL, m, 4), I32)
            rbuf = jnp.zeros((NL, m), I32)
            P0 = ops.const(ops.spec.r_mod)

            def finish(j, c5, t0s, tinfs, P, claim, tstate):
                scale = c5[:, 4]
                t0_raw = ops.mont_mul(t0s, scale)
                tinf_raw = ops.mont_mul(tinfs, scale)
                return gruen_finish(ops, False, False, c5[:, :4], t0_raw,
                                    tinf_raw, None, P, claim, tstate,
                                    t_round + j)

            grid = A.reshape(NL, rows0, R), B.reshape(NL, rows0, R), \
                C.reshape(NL, rows0, R)

            def body_a(j, carry):
                A, B, C, P, claim, tstate, cbuf, rbuf = carry
                el_len = ELmax >> j
                c5 = jax.lax.dynamic_slice(
                    consts, (0, j, 0), (NL, 1, 5))[:, 0, :]
                A_l, B_l, C_l = A[:, :ELmax], B[:, :ELmax], C[:, :ELmax]
                sl = lambda X: jax.lax.dynamic_slice(
                    X, (0, el_len, 0), (NL, ELmax, R))
                A_h, B_h, C_h = sl(A), sl(B), sl(C)
                A_d, B_d, C_d = (ops.sub(A_h, A_l), ops.sub(B_h, B_l),
                                 ops.sub(C_h, C_l))
                ELm = jnp.where(jnp.arange(ELmax) < el_len, el0, 0)
                f0 = ops.sub(ops.mont_mul(A_l, B_l), C_l)
                finf = ops.mont_mul(A_d, B_d)
                t0s = self._two_level(ER, ELm, f0)
                tinfs = self._two_level(ER, ELm, finf)
                coeffs, r, claim, P, tstate = finish(
                    j, c5, t0s, tinfs, P, claim, tstate)
                rb = jnp.broadcast_to(r[:, None, None], (NL, ELmax, R))
                A = jnp.concatenate(
                    [ops.add(A_l, ops.mont_mul(rb, A_d)), A[:, ELmax:]], 1)
                B = jnp.concatenate(
                    [ops.add(B_l, ops.mont_mul(rb, B_d)), B[:, ELmax:]], 1)
                C = jnp.concatenate(
                    [ops.add(C_l, ops.mont_mul(rb, C_d)), C[:, ELmax:]], 1)
                cbuf = _dus(cbuf, coeffs[:, None, :], (0, j, 0))
                rbuf = _dus(rbuf, r[:, None], (0, j))
                return A, B, C, P, claim, tstate, cbuf, rbuf

            Ag, Bg, Cg, P, claim, tstate, cbuf, rbuf = jax.lax.fori_loop(
                0, fh - 1, body_a,
                grid + (P0, claim, tstate, cbuf, rbuf))

            # phase B: rounds fh-1 .. m-1 over the flattened (NL, 2R) head
            Af = Ag[:, :2].reshape(NL, 2 * R)
            Bf = Bg[:, :2].reshape(NL, 2 * R)
            Cf = Cg[:, :2].reshape(NL, 2 * R)

            def body_b(i, carry):
                A, B, C, P, claim, tstate, cbuf, rbuf = carry
                j = fh - 1 + i
                half = R >> i
                c5 = jax.lax.dynamic_slice(
                    consts, (0, j, 0), (NL, 1, 5))[:, 0, :]
                A_l, B_l, C_l = A[:, :R], B[:, :R], C[:, :R]
                sl = lambda X: jax.lax.dynamic_slice(X, (0, half), (NL, R))
                A_h, B_h, C_h = sl(A), sl(B), sl(C)
                A_d, B_d, C_d = (ops.sub(A_h, A_l), ops.sub(B_h, B_l),
                                 ops.sub(C_h, C_l))
                w = jnp.where(jnp.arange(R) < half, ER, 0)
                f0 = ops.sub(ops.mont_mul(A_l, B_l), C_l)
                finf = ops.mont_mul(A_d, B_d)
                sp = ops.sum_products_mxu if _mxu_on() else ops.sum_products
                t0s = sp(w, f0)
                tinfs = sp(w, finf)
                coeffs, r, claim, P, tstate = finish(
                    j, c5, t0s, tinfs, P, claim, tstate)
                rb = jnp.broadcast_to(r[:, None], (NL, R))
                A = jnp.concatenate(
                    [ops.add(A_l, ops.mont_mul(rb, A_d)), A[:, R:]], 1)
                B = jnp.concatenate(
                    [ops.add(B_l, ops.mont_mul(rb, B_d)), B[:, R:]], 1)
                C = jnp.concatenate(
                    [ops.add(C_l, ops.mont_mul(rb, C_d)), C[:, R:]], 1)
                cbuf = _dus(cbuf, coeffs[:, None, :], (0, j, 0))
                rbuf = _dus(rbuf, r[:, None], (0, j))
                return A, B, C, P, claim, tstate, cbuf, rbuf

            Af, Bf, Cf, P, claim, tstate, cbuf, rbuf = jax.lax.fori_loop(
                0, m - fh + 1, body_b,
                (Af, Bf, Cf, P, claim, tstate, cbuf, rbuf))
            return (cbuf, rbuf, Af[:, 0], Bf[:, 0], Cf[:, 0], claim, tstate)

        return cached_jit(kernel,
                          fastkey=("fused_cubiceq", ops.spec.name, m, _mxu_on()))

    def prove(self, td: DeviceTranscript, A, Bp, C, claim, taus: list[int],
              spec, zero_check: bool = False):
        """Interface-compatible with SumcheckProverCubicEq.prove, but the
        coefficient/challenge outputs are STACKED device arrays:
        returns (coeffs (NL, m, 4), rs (NL, m), finals, claim).
        ``zero_check`` is accepted for signature parity; the uniform loop
        computes the (provably zero) round-0 t(0) sum — same bytes."""
        m = len(taus)
        assert A.shape[1] == 1 << m and fused_cubic_ok(spec, taus)
        consts, el0, taus_hi = fused_cubic_pack(spec, taus)
        cbuf, rbuf, a0, b0, c0, claim, tstate = self._kernel(m)(
            A, Bp, C, consts, el0, taus_hi, claim, td.state,
            round_dev(int(td.round)))
        td.state = tstate
        td.round += m
        return cbuf, rbuf, (a0, b0, c0), claim


class FusedSumcheckQuad:
    """One-dispatch BDDT quad sum-check over a fixed masked buffer."""

    def __init__(self, ops: FieldOps):
        self.ops = ops

    @functools.lru_cache(maxsize=None)
    def _kernel(self, m: int):
        ops = self.ops
        n0 = 1 << m
        H = n0 // 2

        def kernel(A, B, claim, tstate, t_round):
            cbuf = jnp.zeros((NL, m, 3), I32)
            rbuf = jnp.zeros((NL, m), I32)

            def body(j, carry):
                A, B, claim, tstate, cbuf, rbuf = carry
                half = H >> j
                A_l, B_l = A[:, :H], B[:, :H]
                A_h = jax.lax.dynamic_slice(A, (0, half), (NL, H))
                B_h = jax.lax.dynamic_slice(B, (0, half), (NL, H))
                A_d, B_d = ops.sub(A_h, A_l), ops.sub(B_h, B_l)
                mask = jnp.arange(H) < half
                sp = ops.sum_products_mxu if _mxu_on() else ops.sum_products
                t0 = sp(jnp.where(mask, A_l, 0), B_l)
                t_inf = sp(jnp.where(mask, A_d, 0), B_d)
                e2 = ops.add(ops.sub(ops.double(claim),
                                     ops.add(ops.double(t0), t0)),
                             ops.double(t_inf))
                e1 = ops.sub(claim, t0)
                coeffs = from_evals3_dev(ops, t0, e1, e2)
                tdj = DeviceTranscript(
                    ops, state=tstate,
                    round=(t_round + j).astype(jnp.uint32))
                absorb_unipoly(tdj, coeffs)
                r = tdj.squeeze_mont(b"c")
                claim = unipoly_eval_dev(ops, coeffs, r)
                rb = jnp.broadcast_to(r[:, None], (NL, H))
                A = jnp.concatenate(
                    [ops.add(A_l, ops.mont_mul(rb, A_d)), A[:, H:]], 1)
                B = jnp.concatenate(
                    [ops.add(B_l, ops.mont_mul(rb, B_d)), B[:, H:]], 1)
                cbuf = _dus(cbuf, coeffs[:, None, :], (0, j, 0))
                rbuf = _dus(rbuf, r[:, None], (0, j))
                return A, B, claim, tdj.state, cbuf, rbuf

            A2, B2, claim, tstate, cbuf, rbuf = jax.lax.fori_loop(
                0, m, body, (A, B, claim, tstate, cbuf, rbuf))
            return cbuf, rbuf, A2[:, 0], B2[:, 0], claim, tstate

        return cached_jit(kernel, fastkey=("fused_quad", ops.spec.name, m, _mxu_on()))

    def prove(self, td: DeviceTranscript, A, Bp, claim, num_rounds: int):
        """Stacked-output twin of SumcheckProverQuad.prove:
        returns (coeffs (NL, m, 3), rs (NL, m), finals, claim)."""
        assert A.shape[1] == 1 << num_rounds
        cbuf, rbuf, a0, b0, claim, tstate = self._kernel(num_rounds)(
            A, Bp, claim, td.state, round_dev(int(td.round)))
        td.state = tstate
        td.round += num_rounds
        return cbuf, rbuf, (a0, b0), claim


@functools.lru_cache(maxsize=None)
def get_fused_cubic_eq(ops: FieldOps) -> FusedSumcheckCubicEq:
    return FusedSumcheckCubicEq(ops)


@functools.lru_cache(maxsize=None)
def get_fused_quad(ops: FieldOps) -> FusedSumcheckQuad:
    return FusedSumcheckQuad(ops)
