"""Whole-sum-check fused kernels: every round in ONE device dispatch.

Motivation (round-3/4 profiles): the per-round step kernels of
``sumcheck.prove`` are protocol-optimal in FLOPs but pay per-dispatch
overhead and deep per-size kernel-cache chains; the TPU-native answer is
a single kernel that runs ALL rounds inside ``lax.fori_loop`` with
fixed-size masked buffers (static shapes, dynamic-slice offsets) — one
launch, one executable per hypercube size.

Round-5 compute path (SPARTAN2_MXU=1, default): every hot multiply is
either on the MXU or avoided —

* evaluation sums keep a*b as carried product COLUMNS (no per-element
  Montgomery REDC; field/jnp_ops.py mul_cols_digits) and contract them
  against the eq weights with int8 matmuls (lazy_weighted_inner/_sum),
  reducing ONCE per sum;
* binds a' = lo + r*(hi-lo) run the scalar-broadcast Montgomery multiply
  as three int8 band matmuls (mont_mul_scalar_mxu: full-word REDC);
* the eq-weight contractions were already int8 matmuls (round 4).

SPARTAN2_MXU=0 keeps the pure-VPU schoolbook path as the bit-identity
oracle (same values mod p; transcripts canonicalize, so wire bytes are
identical either way).

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

  ``prove_peeled`` additionally exploits the ZERO-STRUCTURE of padded
  R1CS (reference lo_eff/hi_eff, src/polys/multilinear.rs:36-43, wired
  at src/r1cs/mod.rs:1250-1270): constraints pad to the next power of
  two, so Az/Bz/Cz are zero beyond ``eff`` — round 0 is peeled into a
  kernel that (a) computes t_inf on the zero tail as A_l*B_l instead of
  a full (A_h-A_l)(B_h-B_l) pass and skips the zero-check t(0) sum
  entirely, and (b) hands the remaining m-1 rounds to the standard
  fused kernel at HALF the grid — every later round's products and
  binds run at 2^(m-2) instead of the m-round kernel's fixed 2^(m-1).

* ``FusedSumcheckQuad`` — BDDT quad rounds over a fixed (NL, n) buffer
  with prefix masks.

The round-0 zero-check shortcut of the per-round prover (skip the t(0)
sum) is deliberately NOT special-cased in the uniform loop: for a
satisfied R1CS the computed t(0) is ≡ 0 (mod p) and the transcript
canonicalizes before absorbing, so the bytes are identical and the loop
body stays uniform.  (The peeled round-0 kernel DOES use it.)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..field.jnp_ops import NL, FieldOps
from ..field.limbs import ints_to_limbs_np
from ..polys.eq import eq_evals_device, eq_evals_host
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
    """Route products/binds/sums through the MXU int8 paths (module
    docstring).  SPARTAN2_MXU=0 reverts to the pure-VPU oracle."""
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
    table reuse (see module docstring).  Raises ValueError (from the
    modular inverse) when any tau_j or (1 - tau_j) is 0 mod p — callers
    must pre-check with ``fused_cubic_ok`` and fall back to the
    per-round prover (a ~2^-250 adversarial-only event).
    """
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

    # -- contraction / bind helpers ------------------------------------
    def _inner_lazy(self, ER, Xa, Xb):
        """(NL, L) per-left-row inner sums <ER, Xa*Xb>: product columns
        stay unreduced (mul_cols_digits), ONE wide REDC per output."""
        ops = self.ops
        U = ops.mul_cols_digits(Xa, Xb)
        return ops.lazy_weighted_inner(ER, U, extra_const=ops.r_inv)

    def _two_level_vpu(self, ER, EL_masked, f):
        """VPU-oracle two-level weighted sum of a materialized f grid."""
        ops = self.ops
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

    def _grid_sums(self, mxu, ER, ELm, A_l, B_l, C_l, A_d, B_d):
        """(t0s, tinfs) of one two-level round: t0 = <EL⊗ER, A*B - C>,
        tinf = <EL⊗ER, (A_h-A_l)(B_h-B_l)>."""
        ops = self.ops
        if mxu:
            inner_ab = self._inner_lazy(ER, A_l, B_l)
            inner_c = ops.weighted_inner_mxu(ER, C_l)
            t0s = ops.sum_products_mxu(ELm, ops.sub(inner_ab, inner_c))
            tinfs = ops.sum_products_mxu(ELm, self._inner_lazy(ER, A_d, B_d))
            return t0s, tinfs
        f0 = ops.sub(ops.mont_mul(A_l, B_l), C_l)
        finf = ops.mont_mul(A_d, B_d)
        return (self._two_level_vpu(ER, ELm, f0),
                self._two_level_vpu(ER, ELm, finf))

    def _flat_sums(self, mxu, w, A_l, B_l, C_l, A_d, B_d):
        """One-level (phase B) twin of _grid_sums with masked weights."""
        ops = self.ops
        if mxu:
            t0s = ops.sub(
                ops.lazy_weighted_sum(w, ops.mul_cols_digits(A_l, B_l),
                                      extra_const=ops.r_inv),
                ops.sum_products_mxu(w, C_l))
            tinfs = ops.lazy_weighted_sum(
                w, ops.mul_cols_digits(A_d, B_d), extra_const=ops.r_inv)
            return t0s, tinfs
        f0 = ops.sub(ops.mont_mul(A_l, B_l), C_l)
        finf = ops.mont_mul(A_d, B_d)
        return ops.sum_products(w, f0), ops.sum_products(w, finf)

    def _bind(self, mxu, r, lo, d):
        """lo + r * d (the bind_poly_var_top update)."""
        ops = self.ops
        if mxu:
            return ops.add(lo, ops.mont_mul_scalar_mxu(r, d))
        rb = jnp.broadcast_to(
            r.reshape((NL,) + (1,) * (lo.ndim - 1)), lo.shape)
        return ops.add(lo, ops.mont_mul(rb, d))

    @functools.lru_cache(maxsize=None)
    def _kernel(self, m: int, mxu: bool):
        ops = self.ops
        fh = m // 2
        R = 1 << (m - fh)
        rows0 = 1 << fh
        ELmax = rows0 // 2
        mxu_a = mxu and R <= 4096  # lazy_weighted_inner accumulation bound

        def kernel(A, B, C, consts, el0, taus_hi, claim, P0, tstate, t_round):
            ER = eq_evals_device(ops, taus_hi)  # (NL, R)
            cbuf = jnp.zeros((NL, m, 4), I32)
            rbuf = jnp.zeros((NL, m), I32)

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
                t0s, tinfs = self._grid_sums(
                    mxu_a, ER, ELm, A_l, B_l, C_l, A_d, B_d)
                coeffs, r, claim, P, tstate = finish(
                    j, c5, t0s, tinfs, P, claim, tstate)
                A = jnp.concatenate(
                    [self._bind(mxu, r, A_l, A_d), A[:, ELmax:]], 1)
                B = jnp.concatenate(
                    [self._bind(mxu, r, B_l, B_d), B[:, ELmax:]], 1)
                C = jnp.concatenate(
                    [self._bind(mxu, r, C_l, C_d), C[:, ELmax:]], 1)
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
                t0s, tinfs = self._flat_sums(
                    mxu, w, A_l, B_l, C_l, A_d, B_d)
                coeffs, r, claim, P, tstate = finish(
                    j, c5, t0s, tinfs, P, claim, tstate)
                A = jnp.concatenate(
                    [self._bind(mxu, r, A_l, A_d), A[:, R:]], 1)
                B = jnp.concatenate(
                    [self._bind(mxu, r, B_l, B_d), B[:, R:]], 1)
                C = jnp.concatenate(
                    [self._bind(mxu, r, C_l, C_d), C[:, R:]], 1)
                cbuf = _dus(cbuf, coeffs[:, None, :], (0, j, 0))
                rbuf = _dus(rbuf, r[:, None], (0, j))
                return A, B, C, P, claim, tstate, cbuf, rbuf

            Af, Bf, Cf, P, claim, tstate, cbuf, rbuf = jax.lax.fori_loop(
                0, m - fh + 1, body_b,
                (Af, Bf, Cf, P, claim, tstate, cbuf, rbuf))
            return (cbuf, rbuf, Af[:, 0], Bf[:, 0], Cf[:, 0], claim, tstate)

        return cached_jit(kernel,
                          fastkey=("fused_cubiceq", ops.spec.name, m, mxu))

    @functools.lru_cache(maxsize=None)
    def _peel_kernel(self, m: int, live: int, zero_check: bool, mxu: bool):
        """Round-0 kernel with static zero-structure: the upper half of
        the 2^m input is zero beyond grid row ``live`` (hi_eff tracking,
        multilinear.rs:36-43).  Emits the round-0 message and the bound
        (NL, 2^(m-1)) arrays for the (m-1)-round fused kernel."""
        ops = self.ops
        fh = m // 2
        R = 1 << (m - fh)
        L0 = 1 << (fh - 1)  # grid rows of each half
        mxu_a = mxu and R <= 4096

        def kernel(A, B, C, consts0, el0, taus_hi, claim, tstate, t_round):
            ER = eq_evals_device(ops, taus_hi)  # (NL, R)
            g = lambda X: X.reshape(NL, 2 * L0, R)
            Ag, Bg, Cg = g(A), g(B), g(C)
            A_l, B_l, C_l = Ag[:, :L0], Bg[:, :L0], Cg[:, :L0]
            A_dl = ops.sub(Ag[:, L0 : L0 + live], A_l[:, :live])
            B_dl = ops.sub(Bg[:, L0 : L0 + live], B_l[:, :live])
            C_dl = ops.sub(Cg[:, L0 : L0 + live], C_l[:, :live])

            if mxu_a:
                # dead rows (zero upper half): (0-A_l)(0-B_l) = A_l*B_l
                inner_dead = self._inner_lazy(
                    ER, A_l[:, live:], B_l[:, live:])
                inner_live = self._inner_lazy(ER, A_dl, B_dl)
                tinfs = ops.sum_products_mxu(
                    el0, jnp.concatenate([inner_live, inner_dead], axis=1))
                if zero_check:
                    t0s = jnp.zeros((NL,), I32)
                else:
                    inner_ab = jnp.concatenate([
                        self._inner_lazy(ER, A_l[:, :live], B_l[:, :live]),
                        inner_dead], axis=1)
                    inner_c = ops.weighted_inner_mxu(ER, C_l)
                    t0s = ops.sum_products_mxu(
                        el0, ops.sub(inner_ab, inner_c))
            else:
                finf = jnp.concatenate(
                    [ops.mont_mul(A_dl, B_dl),
                     ops.mont_mul(A_l[:, live:], B_l[:, live:])], axis=1)
                tinfs = self._two_level_vpu(ER, el0, finf)
                if zero_check:
                    t0s = jnp.zeros((NL,), I32)
                else:
                    f0 = ops.sub(ops.mont_mul(A_l, B_l), C_l)
                    t0s = self._two_level_vpu(ER, el0, f0)

            P0 = ops.const(ops.spec.r_mod)
            coeffs, r0, claim1, P1, tstate = gruen_finish(
                ops, zero_check, False, consts0, t0s, tinfs, None,
                P0, claim, tstate, t_round)

            one_minus = ops.sub(P0, r0)

            def bind_half(lo, d_live):
                head = self._bind(mxu, r0, lo[:, :live], d_live)
                tail = (ops.mont_mul_scalar_mxu(one_minus, lo[:, live:])
                        if mxu else
                        ops.mont_mul(jnp.broadcast_to(
                            one_minus[:, None, None],
                            (NL, L0 - live, R)), lo[:, live:]))
                return jnp.concatenate([head, tail], axis=1).reshape(
                    NL, L0 * R)

            A1 = bind_half(A_l, A_dl)
            B1 = bind_half(B_l, B_dl)
            C1 = bind_half(C_l, C_dl)
            return coeffs, r0, A1, B1, C1, claim1, P1, tstate

        return cached_jit(kernel, fastkey=(
            "fused_cubiceq_peel", ops.spec.name, m, live, zero_check, mxu))

    def prove(self, td: DeviceTranscript, A, Bp, C, claim, taus: list[int],
              spec, zero_check: bool = False):
        """Interface-compatible with SumcheckProverCubicEq.prove, but the
        coefficient/challenge outputs are STACKED device arrays:
        returns (coeffs (NL, m, 4), rs (NL, m), finals, claim).
        ``zero_check`` is accepted for signature parity; the uniform loop
        computes the (provably zero) round-0 t(0) sum — same bytes."""
        m = len(taus)
        assert A.shape[1] == 1 << m and fused_cubic_ok(spec, taus)
        ops = self.ops
        consts, el0, taus_hi = fused_cubic_pack(spec, taus)
        P0 = ops.const(ops.spec.r_mod)
        cbuf, rbuf, a0, b0, c0, claim, tstate = self._kernel(m, _mxu_on())(
            A, Bp, C, consts, el0, taus_hi, claim, P0, td.state,
            round_dev(int(td.round)))
        td.state = tstate
        td.round += m
        return cbuf, rbuf, (a0, b0, c0), claim

    # how many buckets the static ``live`` row count rounds into (bounds
    # the number of distinct peel-kernel compiles per (spec, m))
    PEEL_BUCKETS = 32

    def peel_ok(self, spec, taus: list[int], eff: int) -> bool:
        """prove_peeled preconditions: the scaling trick must hold for
        the (m-1)-round sub-prover too, and the zero tail must be real."""
        m = len(taus)
        return (len(taus) - 1 >= FUSED_MIN_ROUNDS
                and fused_cubic_ok(spec, taus)
                and (1 << (m - 1)) < eff < (1 << m))

    def prove_peeled(self, td: DeviceTranscript, A, Bp, C, claim,
                     taus: list[int], spec, eff: int,
                     zero_check: bool = False):
        """``prove`` with static zero-structure: the inputs are zero at
        indices >= eff (hi_eff).  Byte-identical to ``prove`` (the zero
        tail contributes nothing to any sum); tested against the
        per-round oracle in tests/test_fused.py."""
        m = len(taus)
        assert A.shape[1] == 1 << m and self.peel_ok(spec, taus, eff)
        ops = self.ops
        fh = m // 2
        R = 1 << (m - fh)
        L0 = 1 << (fh - 1)
        half = 1 << (m - 1)
        bucket = max(1, L0 // self.PEEL_BUCKETS)
        live = min(L0, -(-(eff - half) // R))
        live = min(L0, -(-live // bucket) * bucket)

        p = spec.modulus
        tau0 = taus[0] % p
        consts0 = jnp.asarray(ints_to_limbs_np(
            [(1 - tau0) % p, (2 * tau0 - 1) % p, (2 - 3 * tau0) % p,
             pow(tau0, -1, p)], spec))
        el0_full = jnp.asarray(ints_to_limbs_np(
            eq_evals_host(spec, taus[1:fh]), spec))
        taus_hi = jnp.asarray(ints_to_limbs_np(
            [t % p for t in taus[fh:]], spec))

        mxu = _mxu_on()
        coeffs0, r0, A1, B1, C1, claim, P1, tstate = self._peel_kernel(
            m, live, zero_check, mxu)(
            A, Bp, C, consts0, el0_full, taus_hi, claim, td.state,
            round_dev(int(td.round)))
        td.state = tstate
        td.round += 1

        consts, el0, taus_hi2 = fused_cubic_pack(spec, taus[1:])
        cbuf, rbuf, a0, b0, c0, claim, tstate = self._kernel(m - 1, mxu)(
            A1, B1, C1, consts, el0, taus_hi2, claim, P1, td.state,
            round_dev(int(td.round)))
        td.state = tstate
        td.round += m - 1
        cbuf = jnp.concatenate([coeffs0[:, None, :], cbuf], axis=1)
        rbuf = jnp.concatenate([r0[:, None], rbuf], axis=1)
        return cbuf, rbuf, (a0, b0, c0), claim


class FusedSumcheckQuad:
    """One-dispatch BDDT quad sum-check over a fixed masked buffer."""

    def __init__(self, ops: FieldOps):
        self.ops = ops

    @functools.lru_cache(maxsize=None)
    def _kernel(self, m: int, mxu: bool):
        ops = self.ops
        n0 = 1 << m
        H = n0 // 2

        def bind(r, lo, d):
            if mxu:
                return ops.add(lo, ops.mont_mul_scalar_mxu(r, d))
            rb = jnp.broadcast_to(r[:, None], (NL, H))
            return ops.add(lo, ops.mont_mul(rb, d))

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
                sp = ops.sum_products_mxu if mxu else ops.sum_products
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
                A = jnp.concatenate([bind(r, A_l, A_d), A[:, H:]], 1)
                B = jnp.concatenate([bind(r, B_l, B_d), B[:, H:]], 1)
                cbuf = _dus(cbuf, coeffs[:, None, :], (0, j, 0))
                rbuf = _dus(rbuf, r[:, None], (0, j))
                return A, B, claim, tdj.state, cbuf, rbuf

            A2, B2, claim, tstate, cbuf, rbuf = jax.lax.fori_loop(
                0, m, body, (A, B, claim, tstate, cbuf, rbuf))
            return cbuf, rbuf, A2[:, 0], B2[:, 0], claim, tstate

        return cached_jit(kernel, fastkey=("fused_quad", ops.spec.name, m, mxu))

    def prove(self, td: DeviceTranscript, A, Bp, claim, num_rounds: int):
        """Stacked-output twin of SumcheckProverQuad.prove:
        returns (coeffs (NL, m, 3), rs (NL, m), finals, claim)."""
        assert A.shape[1] == 1 << num_rounds
        cbuf, rbuf, a0, b0, claim, tstate = self._kernel(
            num_rounds, _mxu_on())(
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
