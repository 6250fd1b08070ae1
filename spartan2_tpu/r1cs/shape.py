"""Split R1CS shapes, instances, witnesses (reference: src/r1cs/mod.rs).

``SplitR1CSShape`` carries the padded constraint matrices and the
shared / precommitted / rest witness segmentation with per-segment
padding to the commitment width, total variables padded to a power of
two, and constraints padded to a power of two
(reference SplitR1CSShape::new, r1cs/mod.rs:810-911).

Device path: matrices are preprocessed once into DeviceSpMV programs
(gather + segment-sum kernels) for Az/Bz/Cz, and their transposes for
the inner sum-check's poly_ABC = rx^T (A + r B + r^2 C) — the
reference's transpose-bind (r1cs/mod.rs:1235-1398) becomes three SpMVs
against the eq(r_x) table plus a Montgomery linear combination.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..errors import IncorrectWitnessError, SpartanError, UnSatError
from ..field.constants import FieldSpec
from ..field.jnp_ops import NL, FieldOps
from ..frontend.constraint_system import ConstraintSystem, SpartanCircuitAPI
from ..pcs.hyrax import HyraxCommitment
from ..polys.eq import eq_evals_host
from ..transcript.transcript import Transcript
from ..utils.jitcache import cached_jit
from .sparse import DeviceSpMV, SparseMatrix

DEFAULT_COMMITMENT_WIDTH = 2048  # reference lib.rs:63


def pad_to_width(width: int, n: int) -> int:
    """Round n up to the next multiple of width; 0 stays 0
    (r1cs/mod.rs:304-311)."""
    if n == 0:
        return 0
    return (n + width - 1) & ~(width - 1)


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 0).bit_length() if n > 0 else 1


class SplitR1CSShape:
    def __init__(self, field: FieldSpec, num_cons: int, num_shared: int,
                 num_precommitted: int, num_rest: int, num_public: int,
                 num_challenges: int, A: SparseMatrix, B: SparseMatrix,
                 C: SparseMatrix, width: int = DEFAULT_COMMITMENT_WIDTH):
        self.field = field
        self.width = width

        num_shared_p = pad_to_width(width, num_shared)
        num_precommitted_p = pad_to_width(width, num_precommitted)
        num_rest_p = pad_to_width(width, num_rest)

        num_vars_p = num_shared_p + num_precommitted_p + num_rest_p
        if num_vars_p < num_public + num_challenges + 1:
            num_rest_p = max(num_public + num_challenges + 1, num_vars_p) - (
                num_shared_p + num_precommitted_p
            )
        num_vars_p = num_shared_p + num_precommitted_p + num_rest_p
        if _next_pow2(num_vars_p) != num_vars_p:
            num_rest_p = _next_pow2(num_vars_p) - (num_shared_p + num_precommitted_p)

        num_vars = num_shared + num_precommitted + num_rest
        num_vars_p = num_shared_p + num_precommitted_p + num_rest_p
        num_cons_p = _next_pow2(num_cons)

        # re-index columns into the padded layout (r1cs/mod.rs:858-888)
        def remap(col: int) -> int:
            if col < num_shared:
                return col
            if col < num_shared + num_precommitted:
                return col + num_shared_p - num_shared
            if col < num_vars:
                return col + (num_shared_p + num_precommitted_p) - (
                    num_shared + num_precommitted
                )
            return col + num_vars_p - num_vars

        def apply_pad(M: SparseMatrix) -> SparseMatrix:
            indices = [remap(c) for c in M.indices]
            indptr = list(M.indptr) + [M.indptr[-1]] * (num_cons_p - num_cons)
            return SparseMatrix(field, list(M.data), indices, indptr,
                                M.cols + num_vars_p - num_vars)

        self.num_cons = num_cons_p
        self.num_cons_unpadded = num_cons
        self.num_shared_unpadded = num_shared
        self.num_precommitted_unpadded = num_precommitted
        self.num_rest_unpadded = num_rest
        self.num_shared = num_shared_p
        self.num_precommitted = num_precommitted_p
        self.num_rest = num_rest_p
        self.num_public = num_public
        self.num_challenges = num_challenges
        self.A = apply_pad(A)
        self.B = apply_pad(B)
        self.C = apply_pad(C)

        self._device: Optional[dict] = None
        self._ops: Optional[FieldOps] = None

    # ------------------------------------------------------------------
    @staticmethod
    def equalize(S_a: "SplitR1CSShape", S_b: "SplitR1CSShape") -> None:
        """Grow both shapes to common (num_cons, num_vars) by extending
        num_rest and shifting public/challenge columns
        (reference equalize, r1cs/mod.rs:913-974).  Call before
        attach_device."""
        num_cons_p = max(S_a.num_cons, S_b.num_cons)
        num_vars_p = max(S_a.num_vars, S_b.num_vars)

        for S in (S_a, S_b):
            orig_cons = S.num_cons
            num_vars = S.num_vars
            shift = num_vars_p - num_vars
            for M in (S.A, S.B, S.C):
                if shift:
                    M.indices = [c + shift if c >= num_vars else c
                                 for c in M.indices]
                M.cols += shift
                M.indptr.extend([M.indptr[-1]] * (num_cons_p - orig_cons))
            S.num_rest = num_vars_p - (S.num_shared + S.num_precommitted)
            S.num_cons = num_cons_p
            assert S._device is None, "equalize must run before attach_device"

    @property
    def num_vars(self) -> int:
        return self.num_shared + self.num_precommitted + self.num_rest

    @property
    def num_cols(self) -> int:
        """Matrix column count: vars + 1 + public + challenges."""
        return self.num_vars + 1 + self.num_public + self.num_challenges

    def sizes(self) -> list[int]:
        return [
            self.num_cons_unpadded, self.num_shared_unpadded,
            self.num_precommitted_unpadded, self.num_rest_unpadded,
            self.num_cons, self.num_shared, self.num_precommitted,
            self.num_rest, self.num_public, self.num_challenges,
        ]

    @classmethod
    def from_circuit(cls, circuit: SpartanCircuitAPI, field: FieldSpec,
                     width: int = DEFAULT_COMMITMENT_WIDTH) -> "SplitR1CSShape":
        """ShapeCS::r1cs_shape (bellpepper/r1cs.rs:134-231): run the 3
        synthesis phases on a shape-only CS and collect CSR matrices."""
        cs = ConstraintSystem(field, shape_mode=True)
        shared = circuit.shared(cs)
        num_shared = cs.num_aux
        precommitted = circuit.precommitted(cs, shared)
        num_precommitted = cs.num_aux - num_shared
        circuit.synthesize(cs, shared, precommitted, None)
        num_challenges = circuit.num_challenges()

        num_vars = cs.num_aux
        num_inputs = cs.num_inputs  # includes ONE
        assert num_inputs > num_challenges
        num_rest = num_vars - num_shared - num_precommitted

        def var_col(var) -> int:
            kind, idx = var
            if kind == "aux":
                return idx
            if kind == "one":
                return num_vars
            return num_vars + idx  # input idx >= 1 offsets past ONE

        p = field.modulus
        mats = []
        for pick in range(3):
            entries = []
            for row, cons in enumerate(cs.constraints):
                comb = cons[pick]
                for var, coeff in comb.items():
                    if coeff % p != 0:
                        entries.append((row, var_col(var), coeff % p))
            mats.append(
                SparseMatrix.from_coo(field, entries, len(cs.constraints),
                                      num_vars + num_inputs)
            )
        return cls(
            field, len(cs.constraints), num_shared, num_precommitted, num_rest,
            num_inputs - 1 - num_challenges, num_challenges,
            mats[0], mats[1], mats[2], width,
        )

    # ------------------------------------------------------------------
    # device programs
    # ------------------------------------------------------------------
    def attach_device(self, ops: FieldOps) -> None:
        if self._device is not None:
            return
        self._ops = ops
        t = {}
        t["A"] = DeviceSpMV.build(ops, self.A, self.num_cons)
        t["B"] = DeviceSpMV.build(ops, self.B, self.num_cons)
        t["C"] = DeviceSpMV.build(ops, self.C, self.num_cons)
        # Transposes over num_cols, NOT the full 2*num_vars inner-sum-check
        # domain: matrix columns end at num_cols = num_vars + num_extra, so
        # poly_ABC is zero beyond it, and the structured inner round 0
        # (SpartanInnerRound0 / ZkInnerRound0) only reads the [0, num_vars)
        # half plus the num_extra-entry upper prefix.  Building the upper
        # half's zero tail cost a full extra output pass + gather sweep
        # (measured: half of the 534 ms poly_ABC bind).
        ny = self.num_cols
        t["At"] = DeviceSpMV.build(ops, self._transpose(self.A, ny), ny)
        t["Bt"] = DeviceSpMV.build(ops, self._transpose(self.B, ny), ny)
        t["Ct"] = DeviceSpMV.build(ops, self._transpose(self.C, ny), ny)
        # filtered prefix/suffix programs for cached incremental SpMV
        # (reference multiply_vec_precommitted + _incremental_into,
        # r1cs/mod.rs:1112-1211; FilteredSpmv, sparse.rs:305-380)
        lo = self.num_shared + self.num_precommitted
        if 0 < lo < self.num_cols:
            for name, M in (("A", self.A), ("B", self.B), ("C", self.C)):
                t[name + "_pre"] = DeviceSpMV.build(
                    ops, M, self.num_cons, col_max=lo)
                t[name + "_sfx"] = DeviceSpMV.build(
                    ops, M, self.num_cons, col_min=lo, col_max=self.num_cols)
        self._device = t
        self._mv_jit = None
        self._mv_pre_jit = None
        self._mv_inc_jit = None
        self._abc_jit = None

    def _transpose(self, M: SparseMatrix, rows_out: int) -> SparseMatrix:
        entries = [(c, r, v) for r, c, v in M.iter_entries()]
        return SparseMatrix.from_coo(self.field, entries, rows_out, self.num_cons)

    def multiply_vec_device(self, z_mont: jnp.ndarray):
        """(NL, num_cols) -> (Az, Bz, Cz) each (NL, num_cons), one fused
        jitted call (reference multiply_vec, r1cs/mod.rs:1075-1107).

        SpMV program arrays travel as jit ARGUMENTS (see
        DeviceSpMV.prog): closed over, their multi-million-element index
        tables become HLO constants and XLA compile time explodes."""
        from .sparse import spmv_apply

        d = self._device
        ops = self._ops
        if self._mv_jit is None:
            def f(z, pa, pb, pc):
                return (spmv_apply(ops, pa, z), spmv_apply(ops, pb, z),
                        spmv_apply(ops, pc, z))
            self._mv_jit = cached_jit(f, fastkey=("shape_mv", ops.spec.name, tuple(self.sizes())))
        return self._mv_jit(z_mont, d["A"].prog, d["B"].prog, d["C"].prog)

    def multiply_vec_batched_device(self, z_batch: jnp.ndarray):
        """(NL, I, num_cols) -> per-instance (Az, Bz, Cz) each
        (NL, I, num_cons) (reference multiply_vec_batched,
        r1cs/mod.rs:1132-1166)."""
        from .sparse import spmv_apply_batched

        d = self._device
        ops = self._ops
        if getattr(self, "_mv_batched_jit", None) is None:
            def f(z, pa, pb, pc):
                return (spmv_apply_batched(ops, pa, z),
                        spmv_apply_batched(ops, pb, z),
                        spmv_apply_batched(ops, pc, z))
            self._mv_batched_jit = cached_jit(f, fastkey=("shape_mv_batched", ops.spec.name, tuple(self.sizes())))
        return self._mv_batched_jit(z_batch, d["A"].prog, d["B"].prog,
                                    d["C"].prog)

    def multiply_vec_precommitted_device(self, z_prefix: jnp.ndarray):
        """Cacheable prefix products over the shared+precommitted columns
        (reference multiply_vec_precommitted, r1cs/mod.rs:1112-1128).
        ``z_prefix``: (NL, num_shared+num_precommitted)."""
        from .sparse import spmv_apply

        d = self._device
        ops = self._ops
        if self._mv_pre_jit is None:
            def f(z, pa, pb, pc):
                return (spmv_apply(ops, pa, z), spmv_apply(ops, pb, z),
                        spmv_apply(ops, pc, z))
            self._mv_pre_jit = cached_jit(f, fastkey=("shape_mv_pre", ops.spec.name, tuple(self.sizes())))
        return self._mv_pre_jit(z_prefix, d["A_pre"].prog, d["B_pre"].prog,
                                d["C_pre"].prog)

    def multiply_vec_incremental_device(self, W_full: jnp.ndarray,
                                        tail: jnp.ndarray, cached):
        """cached prefix products + filtered SpMV over the suffix columns
        (rest witness, ONE, public IO, challenges) — the reference's
        multiply_vec_incremental_into (r1cs/mod.rs:1170-1211).

        ``W_full``: (NL, num_vars) witness planes; ``tail``: (NL,
        1 + num_public + num_challenges).  The suffix z slice is
        assembled INSIDE the kernel (slice + concat as eager ops each
        cost a tunnel dispatch and a full HBM materialization)."""
        from .sparse import spmv_apply

        d = self._device
        ops = self._ops
        lo = self.num_shared + self.num_precommitted
        if self._mv_inc_jit is None:
            def f(W, tail, ca, cb, cc, pa, pb, pc):
                z = jnp.concatenate([W[:, lo:], tail], axis=1)
                return (ops.add(ca, spmv_apply(ops, pa, z)),
                        ops.add(cb, spmv_apply(ops, pb, z)),
                        ops.add(cc, spmv_apply(ops, pc, z)))
            self._mv_inc_jit = cached_jit(f, fastkey=("shape_mv_inc", ops.spec.name, tuple(self.sizes())))
        return self._mv_inc_jit(W_full, tail, *cached, d["A_sfx"].prog,
                                d["B_sfx"].prog, d["C_sfx"].prog)

    def bind_and_prepare_poly_ABC_device(self, rx_stack: jnp.ndarray,
                                         r_mont: jnp.ndarray) -> jnp.ndarray:
        """poly_ABC[j] = sum_i eq(r_x, i) * (A+rB+r^2C)[i,j] over the
        num_cols domain — the nonzero prefix of the virtual 2*num_vars
        inner-sum-check polynomial (reference r1cs/mod.rs:1235-1398).

        ``rx_stack``: (NL, m) Montgomery r_x points.  The 2^m eq table is
        built INSIDE the kernel: built eagerly it cost ~3 tunnel
        dispatches per variable — the dominant phase of the round-2
        warm prove (PROFILE.md round 3)."""
        from .sparse import spmv_apply
        from ..polys.eq import eq_evals_device

        d = self._device
        ops = self._ops
        if self._abc_jit is None:
            def f(rx, r, pa, pb, pc):
                eq = eq_evals_device(ops, rx)
                a = spmv_apply(ops, pa, eq)
                b = spmv_apply(ops, pb, eq)
                c = spmv_apply(ops, pc, eq)
                nvars2 = a.shape[1]
                rb = jnp.broadcast_to(r[:, None], (NL, nvars2))
                return ops.add(a, ops.mont_mul(rb, ops.add(b, ops.mont_mul(rb, c))))
            self._abc_jit = cached_jit(f, fastkey=("shape_abc", ops.spec.name, tuple(self.sizes())))
        return self._abc_jit(rx_stack, r_mont, d["At"].prog, d["Bt"].prog,
                             d["Ct"].prog)

    # ------------------------------------------------------------------
    # host-side evaluation / satisfaction
    # ------------------------------------------------------------------
    def evaluate_at(self, r_x: list[int], r_y: list[int]):
        """(eval_A, eval_B, eval_C) MLE evaluations at (r_x, r_y): device
        eq-tables + SpMV + weighted sum when attached (one kernel, three
        scalars pulled), host big-int walk otherwise."""
        if self._device is None:
            T_x = eq_evals_host(self.field, r_x)
            T_y = eq_evals_host(self.field, r_y)
            return self.evaluate_with_tables_fast(T_x, T_y)
        from ..field.limbs import ints_to_limbs_np, limbs_to_ints
        from ..polys.eq import eq_evals_device

        d = self._device
        ops = self._ops
        rx = jnp.asarray(ints_to_limbs_np(r_x, self.field, mont=True))
        ry = jnp.asarray(ints_to_limbs_np(r_y, self.field, mont=True))
        if getattr(self, "_eval_jit", None) is None:
            from .sparse import spmv_apply

            def f(rx, ry, pa, pb, pc):
                Tx = eq_evals_device(ops, rx)
                Ty = eq_evals_device(ops, ry)[:, : self.num_cols]
                return tuple(
                    ops.sum_products(Tx, spmv_apply(ops, pm, Ty))
                    for pm in (pa, pb, pc)
                )
            self._eval_jit = cached_jit(f, fastkey=("shape_eval", ops.spec.name, tuple(self.sizes())))
        out = jnp.stack(
            self._eval_jit(rx, ry, d["A"].prog, d["B"].prog, d["C"].prog),
            axis=1)
        return tuple(limbs_to_ints(np.asarray(out), self.field))

    def is_sat_host(self, z: list[int]) -> None:
        p = self.field.modulus
        az = self.A.multiply_vec_host(z)
        bz = self.B.multiply_vec_host(z)
        cz = self.C.multiply_vec_host(z)
        for i, (a, b, c) in enumerate(zip(az, bz, cz)):
            if a * b % p != c % p:
                raise UnSatError(f"constraint {i} unsatisfied")

    def evaluate_with_tables_fast(self, T_x: list[int], T_y: list[int]):
        """Fused 3-matrix MLE evaluation at (T_x, T_y) tables
        (r1cs/mod.rs:36-146, 1216-1226). Host-side: the verifier's cost
        is O(nnz) big-int muls."""
        p = self.field.modulus
        out = []
        for M in (self.A, self.B, self.C):
            acc = 0
            for row in range(M.rows):
                s = 0
                for k in range(M.indptr[row], M.indptr[row + 1]):
                    s += M.data[k] * T_y[M.indices[k]]
                acc = (acc + T_x[row] * s) % p
            out.append(acc)
        return tuple(out)


@dataclass
class SplitR1CSInstance:
    """r1cs/mod.rs:797-806 SplitR1CSInstance."""

    comm_W_shared: Optional[HyraxCommitment]
    comm_W_precommitted: Optional[HyraxCommitment]
    comm_W_rest: HyraxCommitment
    public_values: list[int]
    challenges: list[int]

    def validate(self, S: SplitR1CSShape, pcs, transcript: Transcript) -> None:
        """Re-derive challenges from the transcript and check commitment
        shapes (r1cs/mod.rs:1490-1533)."""
        if S.num_shared > 0:
            if self.comm_W_shared is None:
                raise IncorrectWitnessError("comm_W_shared is missing")
            pcs.check_commitment(self.comm_W_shared, S.num_shared, S.width)
            transcript.absorb_bytes(
                b"comm_W_shared", self.comm_W_shared.to_transcript_bytes(pcs.curve)
            )
        if S.num_precommitted > 0:
            if self.comm_W_precommitted is None:
                raise IncorrectWitnessError("comm_W_precommitted is missing")
            pcs.check_commitment(self.comm_W_precommitted, S.num_precommitted, S.width)
            transcript.absorb_bytes(
                b"comm_W_precommitted",
                self.comm_W_precommitted.to_transcript_bytes(pcs.curve),
            )
        challenges = [transcript.squeeze(b"challenge") for _ in range(S.num_challenges)]
        if challenges != self.challenges:
            raise IncorrectWitnessError("challenges do not match")
        pcs.check_commitment(self.comm_W_rest, S.num_rest, S.width)
        transcript.absorb_bytes(
            b"comm_W_rest", self.comm_W_rest.to_transcript_bytes(pcs.curve)
        )

    def to_regular(self, pcs) -> tuple[HyraxCommitment, list[int]]:
        """Combine partial commitments; X = public ++ challenges
        (r1cs/mod.rs:1535-1553)."""
        parts = [
            cm for cm in (self.comm_W_shared, self.comm_W_precommitted,
                          self.comm_W_rest) if cm is not None
        ]
        return pcs.combine_commitments(parts), self.public_values + self.challenges


@dataclass
class R1CSWitness:
    """Witness: device Montgomery limbs + combined blind."""

    W: jnp.ndarray  # (NL, num_vars) Montgomery form
    r_W: object  # HyraxBlind
    is_small: bool = False
    W_host: Optional[list[int]] = dfield(default=None, repr=False)
