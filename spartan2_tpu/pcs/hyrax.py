"""Hyrax polynomial commitment scheme + linear inner-product argument.

Reference: src/provider/pcs/hyrax_pc.rs and src/provider/pcs/ipa.rs.
A vector of length n is viewed as a (num_rows x num_cols) matrix; the
commitment is one Pedersen commitment per row (hyrax_pc.rs:112-117).

TPU mapping:
  * ``commit``: all rows are committed by ONE batched MSM-ladder kernel
    (rows x cols lanes); the reference's per-row rayon MSM loop
    (hyrax_pc.rs:230-300) becomes a lane axis.
  * ``prove``: the L-fold (LZ = L * Z-as-matrix, hyrax_pc.rs:38-54) is a
    device delayed-reduction contraction; the linear IPA on the width-
    sized remainder is host-side (it is O(width) scalar work).
  * Verifier-side MSMs run on device when sizes warrant, host Pippenger
    otherwise.

Blinds are host-side Python ints (they are O(num_rows) scalars).
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import (
    DivisionByZeroError,
    InvalidCommitmentLengthError,
    InvalidInputLengthError,
    InvalidPCSError,
    ProofVerifyError,
    SpartanError,
)
from ..utils.jitcache import cached_jit
from ..ec.curve import Affine, CurveSpec
from ..ec.device import DeviceCurve, Point
from ..field.jnp_ops import NL, FieldOps
from ..field.limbs import ints_to_limbs_np, limbs_to_ints
from ..polys.eq import eq_evals_host
from ..transcript.transcript import Transcript


def _div_ceil(a: int, b: int) -> int:
    return -(-a // b)


@dataclass
class HyraxCommitment:
    comm: list[Affine]  # one point per row

    def to_transcript_bytes(self, curve: CurveSpec) -> bytes:
        return b"".join(curve.to_transcript_bytes(pt) for pt in self.comm)

    def __eq__(self, other):
        return isinstance(other, HyraxCommitment) and self.comm == other.comm


@dataclass
class HyraxBlind:
    blind: list[int]  # one scalar per row


@dataclass
class IpaProof:
    """Linear-size sigma protocol for c = <a, b> (ipa.rs:83-121)."""

    delta: Affine
    beta: Affine
    z_vec: list[int]
    z_delta: int
    z_beta: int


@dataclass
class HyraxEvaluationArgument:
    ipa: IpaProof


class HyraxCommitmentKey:
    """Generators for Hyrax commitments (hyrax_pc.rs:57-75).

    Holds host affine generators plus device-resident coordinate planes
    for the batched commit kernel.
    """

    def __init__(self, curve: CurveSpec, dc: DeviceCurve, label: bytes, width: int):
        self.curve = curve
        self.dc = dc
        self.num_cols = width
        gens = curve.from_label(label, width + 1)
        self.ck: list[Affine] = gens[:width]
        self.h: Affine = gens[width]
        base = curve.base
        self._Qx = jnp.asarray(ints_to_limbs_np([g[0] for g in self.ck], base, mont=True))
        self._Qy = jnp.asarray(ints_to_limbs_np([g[1] for g in self.ck], base, mont=True))
        self._hx = jnp.asarray(ints_to_limbs_np([self.h[0]], base, mont=True))
        self._hy = jnp.asarray(ints_to_limbs_np([self.h[1]], base, mont=True))
        self._combs: dict = {}

    def comb(self, nbits: int):
        """Fixed-base comb tables over the column generators (lazy, cached
        per scalar-width class; reference FixedBaseMul, msm.rs:637-774)."""
        from ..ec.comb import FixedBaseComb

        if nbits not in self._combs:
            self._combs[nbits] = FixedBaseComb(self.dc, self._Qx, self._Qy, nbits)
        return self._combs[nbits]

    def comb_h(self):
        """Comb tables for the blind generator h (full scalar width)."""
        key = ("h", NL * 12)
        if key not in self._combs:
            from ..ec.comb import FixedBaseComb

            self._combs[key] = FixedBaseComb(self.dc, self._hx, self._hy, NL * 12)
        return self._combs[key]


# The verifier key carries the same generators (hyrax_pc.rs:100-110).
HyraxVerifierKey = HyraxCommitmentKey


class HyraxPCS:
    """PCSEngineTrait equivalent (traits/pcs.rs:32-200) for one engine."""

    def __init__(self, curve: CurveSpec, dc: DeviceCurve, fs: FieldOps):
        self.curve = curve
        self.dc = dc
        self.fs = fs  # scalar-field ops (witness values live here)

    # ------------------------------------------------------------------
    # setup / blind
    # ------------------------------------------------------------------
    def setup(self, label: bytes, n: int, width: int) -> tuple[HyraxCommitmentKey, HyraxVerifierKey]:
        ck = HyraxCommitmentKey(self.curve, self.dc, label, width)
        return ck, ck

    def blind(self, ck: HyraxCommitmentKey, n: int, rng=None) -> HyraxBlind:
        num_rows = _div_ceil(n, ck.num_cols)
        rand = rng if rng is not None else secrets.randbelow
        p = self.curve.scalar.modulus
        return HyraxBlind([rand(p) for _ in range(num_rows)])

    # ------------------------------------------------------------------
    # commit
    # ------------------------------------------------------------------
    def commit_raw(self, ck: HyraxCommitmentKey, v_mont: jnp.ndarray,
                   is_small: bool = False):
        """Unblinded row MSMs as device Jacobian planes (the reference's
        commit_without_blind raw-MSM cache, hyrax_pc.rs:533-570): one
        fused comb-table kernel over all rows."""
        n = v_mont.shape[1]
        C = ck.num_cols
        R = _div_ceil(n, C)
        if n < R * C:
            v_mont = jnp.concatenate(
                [v_mont, jnp.zeros((NL, R * C - n), jnp.int32)], axis=1
            )
        v_canon = self.fs.from_mont(v_mont).reshape(NL, R, C)
        nbits = 64 if is_small else NL * 12
        return ck.comb(nbits).rows_msm(v_canon)

    def commit_raw_batch(self, ck: HyraxCommitmentKey, v_monts: list,
                         is_small: bool = False) -> list:
        """Batched commit_raw: the instances' row blocks are stacked on
        the kernel's ROW axis so N vectors cost ONE comb rows-MSM call
        instead of N (the reference parallelizes its per-instance commit
        loop with rayon, neutronnova_zk.rs:1662-1722; here the batch
        axis is device parallelism)."""
        C = ck.num_cols
        padded, rows = [], []
        for v in v_monts:
            n = v.shape[1]
            R = _div_ceil(n, C)
            if n < R * C:
                v = jnp.concatenate(
                    [v, jnp.zeros((NL, R * C - n), jnp.int32)], axis=1)
            padded.append(v)
            rows.append(R)
        v_canon = self.fs.from_mont(
            jnp.concatenate(padded, axis=1)).reshape(NL, sum(rows), C)
        nbits = 64 if is_small else NL * 12
        raw_all = ck.comb(nbits).rows_msm(v_canon)
        out, lo = [], 0
        for R in rows:
            out.append(tuple(c[:, lo : lo + R] for c in raw_all))
            lo += R
        return out

    def commit_from_raw_batch(self, ck: HyraxCommitmentKey, raws: list,
                              rs: list[HyraxBlind]) -> list[HyraxCommitment]:
        """Batched commit_from_raw: ONE blind rows-MSM + ONE jacobian add
        + ONE device->host affine pull for N instances."""
        rows = [raw[0].shape[1] for raw in raws]
        raw_all = tuple(
            jnp.concatenate([raw[i] for raw in raws], axis=1)
            for i in range(3))
        blinds = [b for r in rs for b in r.blind]
        blinds_canon = jnp.asarray(
            ints_to_limbs_np(blinds, self.curve.scalar, mont=False))
        bl = ck.comb_h().rows_msm(blinds_canon[:, :, None])
        total = self.dc.add(raw_all, bl)
        affs = self.dc.to_affine_host(total)
        out, lo = [], 0
        for R in rows:
            out.append(HyraxCommitment(affs[lo : lo + R]))
            lo += R
        return out

    def commit_from_raw(self, ck: HyraxCommitmentKey, raw,
                        r: HyraxBlind) -> HyraxCommitment:
        """Blind cached raw row MSMs: total_i = raw_i + r_i * h (the
        reference's commit_incremental fast path when only the blind is
        fresh, hyrax_pc.rs:572-607)."""
        blinds_canon = jnp.asarray(
            ints_to_limbs_np(r.blind, self.curve.scalar, mont=False)
        )
        bl = ck.comb_h().rows_msm(blinds_canon[:, :, None])
        total = self.dc.add(raw, bl)
        return HyraxCommitment(self.dc.to_affine_host(total))

    def commit(self, ck: HyraxCommitmentKey, v_mont: jnp.ndarray, r: HyraxBlind,
               is_small: bool = False) -> HyraxCommitment:
        """Commit to (NL, n) Montgomery-form device scalars.

        One fused kernel: canonicalize, reshape to rows, comb-MSM all
        rows, add blind*h per row (reference per-row loop at
        hyrax_pc.rs:230-300).
        """
        return self.commit_from_raw(ck, self.commit_raw(ck, v_mont, is_small), r)

    def commit_host(self, ck: HyraxCommitmentKey, v: list[int], r: HyraxBlind,
                    is_small: bool = False) -> HyraxCommitment:
        """Host-int convenience commit (tiny vectors: eval commitments)."""
        n = len(v)
        C = ck.num_cols
        R = _div_ceil(n, C)
        v = list(v) + [0] * (R * C - n)
        comm = []
        for i in range(R):
            row = v[i * C : (i + 1) * C]
            pt = self.curve.msm(row + [r.blind[i]], ck.ck + [ck.h])
            comm.append(pt)
        return HyraxCommitment(comm)

    def commit_zeros(self, ck: HyraxCommitmentKey, n: int, r: HyraxBlind) -> HyraxCommitment:
        """Blind-only commitment (hyrax_pc.rs:305-319): r_i * h per row."""
        num_rows = _div_ceil(n, ck.num_cols)
        if num_rows >= 8:
            blinds_canon = jnp.asarray(
                ints_to_limbs_np(r.blind, self.curve.scalar, mont=False))
            pts = ck.comb_h().rows_msm(blinds_canon[:, :, None])
            return HyraxCommitment(self.dc.to_affine_host(pts))
        return HyraxCommitment(
            [self.curve.scalar_mul(r.blind[i], ck.h) for i in range(num_rows)]
        )

    def check_commitment(self, comm: HyraxCommitment, n: int, width: int) -> None:
        if len(comm.comm) != _div_ceil(n, width):
            raise SpartanError(
                f"InvalidCommitmentLength: actual {len(comm.comm)}, "
                f"expected {_div_ceil(n, width)}"
            )

    def rerandomize_commitment(self, ck: HyraxCommitmentKey, comm: HyraxCommitment,
                               r_old: HyraxBlind, r_new: HyraxBlind) -> HyraxCommitment:
        if len(comm.comm) != len(r_old.blind) or len(comm.comm) != len(r_new.blind):
            raise InvalidCommitmentLengthError(
                "rerandomize_commitment: length mismatch")
        p = self.curve.scalar.modulus
        out = []
        for pt, ro, rn in zip(comm.comm, r_old.blind, r_new.blind):
            out.append(self.curve.add(pt, self.curve.scalar_mul((rn - ro) % p, ck.h)))
        return HyraxCommitment(out)

    @staticmethod
    def combine_commitments(comms: list[HyraxCommitment]) -> HyraxCommitment:
        if not comms:
            raise InvalidCommitmentLengthError("combine_commitments: empty")
        out = []
        for cm in comms:
            out.extend(cm.comm)
        return HyraxCommitment(out)

    @staticmethod
    def combine_blinds(blinds: list[HyraxBlind]) -> HyraxBlind:
        if not blinds:
            raise InvalidInputLengthError("combine_blinds: empty")
        out = []
        for b in blinds:
            out.extend(b.blind)
        return HyraxBlind(out)

    # ------------------------------------------------------------------
    # evaluation argument
    # ------------------------------------------------------------------
    def _bind_rows_device(self, poly_mont: jnp.ndarray, L: list[int],
                          r_len: int) -> jnp.ndarray:
        """LZ[j] = sum_r L[r] * poly[r, j] (hyrax bind_with_delayed,
        hyrax_pc.rs:38-54) with one wide reduction per column.  Returns
        the (NL, r_len) CANONICAL device plane (stays on device so the
        following MSM needs no host round trip)."""
        R = len(L)
        Z = poly_mont.reshape(NL, R, r_len)
        Lm = jnp.asarray(ints_to_limbs_np(L, self.curve.scalar, mont=True))
        fs = self.fs

        def kernel(Lm, Z):
            t = fs._mul_cols(Lm[:, :, None], Z)  # (43, R, r_len)
            t = fs._parallel_carry(t)
            n = R
            while n > 1:
                k = min(n, 64)
                t = t.reshape(t.shape[0], n // k, k, r_len).sum(axis=2)
                t = fs._parallel_carry(t)
                n //= k
            return fs.from_mont(fs.acc_reduce(t[:, 0, :]))

        if not hasattr(self, '_bind_kernel'):
            self._bind_kernel = {}
        bk = self._bind_kernel.setdefault(
            (R, r_len),
            cached_jit(kernel, fastkey=("hyrax_bind", fs.spec.name, R, r_len)))
        return bk(Lm, Z)

    def _msm_gens_blinded_dev(self, ck: HyraxCommitmentKey,
                              v_canon_dev: jnp.ndarray, blind: int) -> Affine:
        """Prover-side MSM over the column generators of a DEVICE canonical
        scalar plane (NL, C), plus ``blind * h`` — all on device, ONE
        affine pull.  Honest (prover-chosen) scalars, so the add tree may
        run incomplete adds (comb.py safety note)."""
        C = v_canon_dev.shape[1]
        pts = ck.comb(NL * 12).rows_msm(v_canon_dev[:, None, :])
        bl = ck.comb_h().rows_msm(jnp.asarray(
            ints_to_limbs_np([blind], self.curve.scalar, mont=False)
        )[:, :, None])
        # the blinded total: h is independent of the column generators, so
        # a collision with the honest MSM sum stays a dlog relation
        total = self.dc.add(pts, bl)
        return self.dc.to_affine_host(total)[0]

    def prove(self, ck: HyraxCommitmentKey, ck_eval: HyraxCommitmentKey,
              transcript: Transcript, comm: HyraxCommitment,
              poly_mont: jnp.ndarray, blind: HyraxBlind, point: list[int],
              comm_eval: HyraxCommitment, blind_eval: HyraxBlind,
              rng=None) -> HyraxEvaluationArgument:
        """Reference flow at hyrax_pc.rs:387-478."""
        scalar = self.curve.scalar
        p = scalar.modulus
        n = poly_mont.shape[1]
        if n != (1 << len(point)):
            raise InvalidInputLengthError("Hyrax prove: poly/point size mismatch")

        transcript.absorb_bytes(b"poly_com", comm.to_transcript_bytes(self.curve))

        num_cols = ck.num_cols
        num_rows = _div_ceil(n, num_cols)
        num_vars_rows = num_rows.bit_length() - 1

        pre_delta = None
        if num_vars_rows == 0:
            comm_LZ = comm.comm[0]
            Rv = eq_evals_host(scalar, point)
            LZ = limbs_to_ints(np.asarray(poly_mont), scalar, mont=True)
            r_LZ = blind.blind[0]
        else:
            from ..utils.tracing import span as _span

            L = eq_evals_host(scalar, point[:num_vars_rows])
            Rv = eq_evals_host(scalar, point[num_vars_rows:])
            with _span("hyrax_bind_LZ"):
                LZ_dev = self._bind_rows_device(poly_mont, L, len(Rv))
            r_LZ = sum(l * b for l, b in zip(L, blind.blind)) % p
            with _span("hyrax_msm_LZ"):
                if len(Rv) == ck.num_cols:
                    # ONE batched rows-MSM for [LZ, d_vec] (two rows of
                    # the same comb kernel); blinds ride the HOST native
                    # C scalar_mul (+ host point add) — the device
                    # comb_h dispatches over single-lane shapes were
                    # pure overhead.  d_vec rides only when its width
                    # matches the comb key width (otherwise _ipa_prove's
                    # guarded host fallback runs).
                    rand = rng if rng is not None else secrets.randbelow
                    d_vec = [rand(p) for _ in Rv]
                    r_delta = rand(p)
                    dv = jnp.asarray(
                        ints_to_limbs_np(d_vec, scalar, mont=False))
                    pts2 = ck.comb(NL * 12).rows_msm(
                        jnp.stack([LZ_dev, dv], axis=1))
                    LZ = limbs_to_ints(np.asarray(LZ_dev), scalar, mont=False)
                    affs = self.dc.to_affine_host(pts2)
                    comm_LZ = self.curve.add(
                        affs[0], self.curve.scalar_mul(r_LZ, ck.h))
                    delta = self.curve.add(
                        affs[1], self.curve.scalar_mul(r_delta, ck.h))
                    pre_delta = (delta, d_vec, r_delta)
                else:
                    pts = ck.comb(NL * 12).rows_msm(LZ_dev[:, None, :])
                    LZ = limbs_to_ints(np.asarray(LZ_dev), scalar, mont=False)
                    comm_LZ = self.curve.add(
                        self.dc.to_affine_host(pts)[0],
                        self.curve.scalar_mul(r_LZ, ck.h))

        ipa = self._ipa_prove(
            ck, ck_eval, comm_LZ, Rv, comm_eval.comm[0], LZ, r_LZ,
            blind_eval.blind[0], transcript, rng, pre_delta=pre_delta,
        )
        return HyraxEvaluationArgument(ipa)

    def verify(self, vk: HyraxVerifierKey, ck_eval: HyraxCommitmentKey,
               transcript: Transcript, comm: HyraxCommitment, point: list[int],
               comm_eval: HyraxCommitment, arg: HyraxEvaluationArgument) -> None:
        """Reference flow at hyrax_pc.rs:480-531."""
        scalar = self.curve.scalar
        transcript.absorb_bytes(b"poly_com", comm.to_transcript_bytes(self.curve))
        n = 1 << len(point)
        num_rows = _div_ceil(n, vk.num_cols)
        num_vars_rows = num_rows.bit_length() - 1

        if num_vars_rows == 0:
            Rv = eq_evals_host(scalar, point)
            comm_LZ = comm.comm[0]
        else:
            L = eq_evals_host(scalar, point[:num_vars_rows])
            Rv = eq_evals_host(scalar, point[num_vars_rows:])
            # comm.comm is proof-supplied: complete adds required
            comm_LZ = self._msm_auto(L, comm.comm, adversarial_points=True)

        self._ipa_verify(
            vk, ck_eval, comm_LZ, Rv, comm_eval.comm[0], arg.ipa, transcript
        )

    # ------------------------------------------------------------------
    # linear IPA (ipa.rs:125-221)
    # ------------------------------------------------------------------
    IPA_NAME = b"inner product argument (linear)"

    def _absorb_ipa_instance(self, transcript: Transcript, comm_a: Affine,
                             comm_c: Affine) -> None:
        transcript.dom_sep(self.IPA_NAME)
        transcript.absorb_bytes(
            b"U",
            self.curve.to_transcript_bytes(comm_a) + self.curve.to_transcript_bytes(comm_c),
        )

    def _ipa_prove(self, ck, ck_eval, comm_a: Affine, b_vec: list[int],
                   comm_c: Affine, a_vec: list[int], r_a: int, r_c: int,
                   transcript: Transcript, rng=None,
                   pre_delta=None) -> IpaProof:
        """``pre_delta``: optional (delta, d_vec, r_delta) computed by the
        caller with its MSM overlapped behind other device work."""
        scalar = self.curve.scalar
        p = scalar.modulus
        rand = rng if rng is not None else secrets.randbelow
        self._absorb_ipa_instance(transcript, comm_a, comm_c)

        from ..utils.tracing import span as _span

        if pre_delta is not None:
            delta, d_vec, r_delta = pre_delta
            r_beta = rand(p)
        else:
            d_vec = [rand(p) for _ in b_vec]
            r_delta = rand(p)
            r_beta = rand(p)
            with _span("ipa_msm_delta"):
                C = ck.num_cols
                if len(d_vec) == C:
                    dv = jnp.asarray(
                        ints_to_limbs_np(d_vec, scalar, mont=False))
                    delta = self._msm_gens_blinded_dev(ck, dv, r_delta)
                else:
                    delta = self.curve.add(
                        self._msm_gens(ck, d_vec),
                        self.curve.scalar_mul(r_delta, ck.h),
                    )
        ip_bd = sum(x * y for x, y in zip(b_vec, d_vec)) % p
        beta = self.curve.add(
            self.curve.scalar_mul(ip_bd, ck_eval.ck[0]),
            self.curve.scalar_mul(r_beta, ck_eval.h),
        )
        transcript.absorb_bytes(b"delta", self.curve.to_transcript_bytes(delta))
        transcript.absorb_bytes(b"beta", self.curve.to_transcript_bytes(beta))
        r = transcript.squeeze(b"r")

        z_vec = [(r * a + d) % p for a, d in zip(a_vec, d_vec)]
        z_delta = (r * r_a + r_delta) % p
        z_beta = (r * r_c + r_beta) % p
        return IpaProof(delta, beta, z_vec, z_delta, z_beta)

    def _ipa_verify(self, vk, ck_eval, comm_a: Affine, b_vec: list[int],
                    comm_c: Affine, proof: IpaProof, transcript: Transcript) -> None:
        curve = self.curve
        p = curve.scalar.modulus
        self._absorb_ipa_instance(transcript, comm_a, comm_c)
        transcript.absorb_bytes(b"delta", curve.to_transcript_bytes(proof.delta))
        transcript.absorb_bytes(b"beta", curve.to_transcript_bytes(proof.beta))
        r = transcript.squeeze(b"r")

        if len(proof.z_vec) != len(b_vec) or len(vk.ck) < len(proof.z_vec):
            raise InvalidPCSError("IPA verify: z_vec length mismatch")

        lhs1 = curve.add(curve.scalar_mul(r, comm_a), proof.delta)
        rhs1 = curve.add(
            self._msm_gens(vk, proof.z_vec),
            curve.scalar_mul(proof.z_delta, vk.h),
        )
        if lhs1 != rhs1:
            raise InvalidPCSError("IPA verify: first equation failed")

        ip_zb = sum(x * y for x, y in zip(proof.z_vec, b_vec)) % p
        lhs2 = curve.add(curve.scalar_mul(r, comm_c), proof.beta)
        rhs2 = curve.add(
            curve.scalar_mul(ip_zb, ck_eval.ck[0]),
            curve.scalar_mul(proof.z_beta, ck_eval.h),
        )
        if lhs2 != rhs2:
            raise InvalidPCSError("IPA verify: second equation failed")

    # ------------------------------------------------------------------
    # direct openings (hyrax_pc.rs:609-711): RLC of row commitments —
    # width+1 scalars per opening instead of an IPA
    # ------------------------------------------------------------------
    def prove_direct(self, ck: HyraxCommitmentKey, poly: list[int],
                     blind: HyraxBlind, point: list[int]) -> tuple[list[int], int]:
        """Returns (v, combined_blind): v = L * poly-as-matrix; the
        evaluation is <v, eq(point_right)>."""
        scalar = self.curve.scalar
        p = scalar.modulus
        num_cols = ck.num_cols
        n = 1 << len(point)
        num_rows = _div_ceil(n, num_cols)
        if num_rows == 1:
            v = list(poly) + [0] * (num_cols - len(poly))
            return v, blind.blind[0]
        num_vars_rows = num_rows.bit_length() - 1
        L = eq_evals_host(scalar, point[:num_vars_rows])
        padded = list(poly) + [0] * (n - len(poly))
        v = [0] * num_cols
        for r_i, l in enumerate(L):
            row = padded[r_i * num_cols : (r_i + 1) * num_cols]
            for j in range(num_cols):
                v[j] = (v[j] + l * row[j]) % p
        combined = sum(l * b for l, b in zip(L, blind.blind)) % p
        return v, combined

    def verify_direct(self, vk: HyraxVerifierKey, comm: HyraxCommitment,
                      v: list[int], combined_blind: int,
                      point: list[int]) -> int:
        """Checks the RLC against row commitments; returns the evaluation
        <v, eq(point_right)>."""
        scalar = self.curve.scalar
        p = scalar.modulus
        num_cols = vk.num_cols
        if len(v) != num_cols:
            raise InvalidPCSError("direct opening: v length mismatch")
        n = 1 << len(point)
        num_rows = _div_ceil(n, num_cols)
        num_vars_rows = num_rows.bit_length() - 1
        if num_vars_rows == 0:
            comm_LZ = comm.comm[0]
        else:
            L = eq_evals_host(scalar, point[:num_vars_rows])
            comm_LZ = self._msm_auto(L[: len(comm.comm)], comm.comm,
                                     adversarial_points=True)
        expected = self.curve.add(
            self._msm_gens(vk, v),
            self.curve.scalar_mul(combined_blind, vk.h),
        )
        if comm_LZ != expected:
            raise InvalidPCSError("direct opening: commitment mismatch")
        Rv = eq_evals_host(scalar, point[num_vars_rows:])
        return sum(x * y for x, y in zip(v, Rv)) % p

    # ------------------------------------------------------------------
    # folding support (FoldingEngineTrait, traits/pcs.rs:204-232)
    # ------------------------------------------------------------------
    def fold_commitments(self, comms: list[HyraxCommitment],
                         weights: list[int]) -> HyraxCommitment:
        if len(comms) != len(weights) or not comms:
            raise InvalidInputLengthError("fold_commitments: bad input")
        rows = len(comms[0].comm)
        no_inf = all(pt is not None for cm in comms for pt in cm.comm)
        if rows * len(comms) >= 64 and no_inf:
            # shared-weight device MSM: one ladder kernel covers every
            # row (reference msm_shared_weights, msm.rs:228-356);
            # complete tree — commitments may come from a proof
            base = self.curve.base
            sc1 = jnp.asarray(ints_to_limbs_np(
                list(weights), self.curve.scalar, mont=False))
            sc = jnp.broadcast_to(sc1[:, None, :], (NL, rows, len(comms)))
            Qx = jnp.asarray(ints_to_limbs_np(
                [cm.comm[i][0] for i in range(rows) for cm in comms],
                base, mont=True)).reshape(NL, rows, len(comms))
            Qy = jnp.asarray(ints_to_limbs_np(
                [cm.comm[i][1] for i in range(rows) for cm in comms],
                base, mont=True)).reshape(NL, rows, len(comms))
            pts = self.dc.msm_rows(sc, Qx, Qy, complete_tree=True)
            return HyraxCommitment(self.dc.to_affine_host(pts))
        out = []
        for i in range(rows):
            pts = [cm.comm[i] for cm in comms]
            # commitments may come from a proof (NN verify folds)
            out.append(self._msm_auto(list(weights), pts,
                                      adversarial_points=True))
        return HyraxCommitment(out)

    def fold_commitments_partial(self, comms: list[HyraxCommitment],
                                 weights: list[int], num_data_rows: int,
                                 folded_blind: HyraxBlind,
                                 ck: HyraxCommitmentKey) -> HyraxCommitment:
        """Fold only the data rows via MSM; rest rows are blind-only
        (each instance's rest row is a commit-to-zeros = blind_k * h),
        so folded[row] = folded_blind[row] * h — field-folded blinds
        replace an N-point MSM per rest row (hyrax_pc.rs:821-874)."""
        if not comms or len(comms) != len(weights):
            raise InvalidInputLengthError("fold_commitments_partial: bad input")
        total_rows = len(comms[0].comm)
        if num_data_rows > total_rows:
            raise InvalidInputLengthError(
                f"fold_commitments_partial: num_data_rows {num_data_rows} "
                f"exceeds total_rows {total_rows}")
        if num_data_rows >= total_rows:
            return self.fold_commitments(comms, weights)
        data = [HyraxCommitment(cm.comm[:num_data_rows]) for cm in comms]
        folded_data = self.fold_commitments(data, weights)
        rest_blinds = folded_blind.blind[num_data_rows:]
        if len(rest_blinds) >= 8:
            arr = jnp.asarray(
                ints_to_limbs_np(rest_blinds, self.curve.scalar, mont=False))
            rest = self.dc.to_affine_host(ck.comb_h().rows_msm(arr[:, :, None]))
        else:
            rest = [self.curve.scalar_mul(b, ck.h) for b in rest_blinds]
        return HyraxCommitment(folded_data.comm + rest)

    def fold_blinds(self, blinds: list[HyraxBlind], weights: list[int]) -> HyraxBlind:
        if len(blinds) != len(weights) or not blinds:
            raise InvalidInputLengthError("fold_blinds: bad input")
        p = self.curve.scalar.modulus
        rows = len(blinds[0].blind)
        return HyraxBlind(
            [sum(w * b.blind[i] for w, b in zip(weights, blinds)) % p for i in range(rows)]
        )

    # ------------------------------------------------------------------
    def _msm_gens(self, ck: HyraxCommitmentKey, scalars: list[int]) -> Affine:
        """MSM over the leading column generators via fixed-base comb
        tables (full scalar width).  Verifier-side scalars are
        proof-supplied, so the add tree runs COMPLETE adds (see the
        comb.py safety note on adversarial partial-sum collisions)."""
        C = ck.num_cols
        n = len(scalars)
        if n > C or n < 32:
            return self._msm_auto(scalars, ck.ck[:n])
        sc = list(scalars) + [0] * (C - n)
        arr = jnp.asarray(ints_to_limbs_np(sc, self.curve.scalar, mont=False))
        pts = ck.comb(NL * 12).rows_msm(arr[:, None, :], complete=True)
        return self.dc.to_affine_host(pts)[0]

    def _msm_auto(self, scalars: list[int], points: list[Affine],
                  adversarial_points: bool = False) -> Affine:
        """Host ints MSM: device kernel for large n, host Pippenger else.

        ``adversarial_points``: the points come from a proof (e.g. Hyrax
        row commitments in verify) — equal lane sums are then trivial to
        craft, so the cross-lane tree must use complete adds
        (ec/device.py msm docstring)."""
        n = len(scalars)
        if n == 0:
            return None
        if n < 64 or any(pt is None for pt in points):
            return self.curve.msm(scalars, points)
        # pad to pow2 with zero scalars (zero scalar lanes stay at infinity)
        m = 1 << (n - 1).bit_length()
        scalars = list(scalars) + [0] * (m - n)
        points = list(points) + [points[0]] * (m - n)
        sc = jnp.asarray(ints_to_limbs_np(scalars, self.curve.scalar, mont=False))
        base = self.curve.base
        Qx = jnp.asarray(ints_to_limbs_np([pt[0] for pt in points], base, mont=True))
        Qy = jnp.asarray(ints_to_limbs_np([pt[1] for pt in points], base, mont=True))
        return self.dc.to_affine_host(
            self.dc.msm(sc, Qx, Qy, complete_tree=adversarial_points))[0]
