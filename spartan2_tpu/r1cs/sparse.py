"""Sparse R1CS matrices: host CSR + TPU-native SpMV.

Reference: src/r1cs/sparse.rs.  The reference classifies entries into
+/-1, small (|k|<=7), and general coefficient streams to avoid field
multiplies (PrecomputedSparseMatrix, sparse.rs:29-134).  The TPU version
keeps the same classification but expresses SpMV as

    gather(z, cols) -> scale (integer limb multiply for unit/small,
    Montgomery multiply for general) -> segment-sum by row -> one wide
    reduction per row,

which maps the row-parallel rayon loop (sparse.rs:221-233) onto the VPU:
negative coefficients become negative int32 limbs (the wide reducer's
arithmetic shifts propagate borrows), so -1 entries cost a single vector
multiply by -1 instead of a field negation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..field.constants import FieldSpec
from ..field.jnp_ops import NL, FieldOps
from ..field.limbs import ints_to_limbs_np


@dataclass
class SparseMatrix:
    """Host CSR matrix over python-int field elements (sparse.rs:385-539)."""

    field: FieldSpec
    data: list  # python ints (canonical)
    indices: list  # column per entry
    indptr: list  # row offsets, len = rows + 1
    cols: int = 0

    @classmethod
    def empty(cls, field: FieldSpec) -> "SparseMatrix":
        return cls(field, [], [], [0], 0)

    @classmethod
    def from_coo(cls, field: FieldSpec, entries, rows: int, cols: int) -> "SparseMatrix":
        """entries: iterable of (row, col, value)."""
        by_row = sorted(entries, key=lambda e: (e[0], e[1]))
        data, indices, indptr = [], [], [0]
        r = 0
        for row, col, val in by_row:
            while r < row:
                indptr.append(len(data))
                r += 1
            data.append(val % field.modulus)
            indices.append(col)
        while r < rows:
            indptr.append(len(data))
            r += 1
        return cls(field, data, indices, indptr, cols)

    @property
    def rows(self) -> int:
        return len(self.indptr) - 1

    @property
    def nnz(self) -> int:
        return len(self.data)

    def iter_entries(self):
        for row in range(self.rows):
            for k in range(self.indptr[row], self.indptr[row + 1]):
                yield row, self.indices[k], self.data[k]

    def multiply_vec_host(self, z: list[int]) -> list[int]:
        p = self.field.modulus
        out = []
        for row in range(self.rows):
            s = 0
            for k in range(self.indptr[row], self.indptr[row + 1]):
                s += self.data[k] * z[self.indices[k]]
            out.append(s % p)
        return out

    def digest_bytes(self) -> bytes:
        """Deterministic bytes for vk digests (sparse write_digest_bytes)."""
        out = bytearray()
        out += len(self.data).to_bytes(8, "little")
        for v in self.data:
            out += self.field.to_bytes(v)
        out += len(self.indices).to_bytes(8, "little")
        for i in self.indices:
            out += int(i).to_bytes(8, "little")
        out += len(self.indptr).to_bytes(8, "little")
        for i in self.indptr:
            out += int(i).to_bytes(8, "little")
        out += int(self.cols).to_bytes(8, "little")
        return bytes(out)


SMALL_MAX = 7


@dataclass
class DeviceSpMV:
    """Device-side SpMV program for one sparse matrix.

    Entries are split into an integer-coefficient stream (|k| <= 7,
    including +/-1) and a general field-coefficient stream; both are
    row-sorted so segment sums can assume sorted ids.
    """

    ops: FieldOps
    num_rows: int
    num_cols: int
    int_cols: jnp.ndarray  # (n_int,) int32 gather indices
    int_rows: jnp.ndarray  # (n_int,) int32 segment ids
    int_coeffs: jnp.ndarray  # (n_int,) int32 in [-7, 7]
    gen_cols: jnp.ndarray  # (n_gen,)
    gen_rows: jnp.ndarray  # (n_gen,)
    gen_vals: jnp.ndarray  # (NL, n_gen) Montgomery form

    @classmethod
    def build(cls, ops: FieldOps, m: SparseMatrix, num_rows: int,
              col_min: int = 0, col_max: int | None = None) -> "DeviceSpMV":
        """Build a device SpMV program.  With ``col_min``/``col_max`` the
        program covers only the column slice [col_min, col_max) with
        gather indices rebased to col_min — the TPU form of the
        reference's ``build_filtered`` / ``FilteredSpmv``
        (sparse.rs:305-380), used for cached-prefix incremental SpMV."""
        p = m.field.modulus
        int_entries, gen_entries = [], []
        for row, col, val in m.iter_entries():
            if col < col_min or (col_max is not None and col >= col_max):
                continue
            col -= col_min
            k = val if val <= SMALL_MAX else val - p if val >= p - SMALL_MAX else None
            if k is not None:
                int_entries.append((row, col, k))
            else:
                gen_entries.append((row, col, val))
        ic = np.array([e[1] for e in int_entries] or [0], np.int32)
        ir = np.array([e[0] for e in int_entries] or [num_rows], np.int32)
        ik = np.array([e[2] for e in int_entries] or [0], np.int32)
        gc = np.array([e[1] for e in gen_entries] or [0], np.int32)
        gr = np.array([e[0] for e in gen_entries] or [num_rows], np.int32)
        gv = ints_to_limbs_np([e[2] for e in gen_entries] or [0], m.field, mont=True)
        cls._check_row_density(int_entries, gen_entries, num_rows)
        hi = m.cols if col_max is None else col_max
        return cls(
            ops=ops,
            num_rows=num_rows,
            num_cols=hi - col_min,
            int_cols=jnp.asarray(ic),
            int_rows=jnp.asarray(ir),
            int_coeffs=jnp.asarray(ik),
            gen_cols=jnp.asarray(gc),
            gen_rows=jnp.asarray(gr),
            gen_vals=jnp.asarray(gv),
        )

    @staticmethod
    def _check_row_density(int_entries, gen_entries, num_rows: int) -> None:
        """Overflow guard for the lazy int32 accumulation
        (the role of the reference's debug_assert carry checks,
        big_num/limbs.rs:87): each segment-sum row must keep
        |limb| < 2^29 before _reduce_lazy's offset add.  Per entry the
        worst per-limb magnitude is |k| * (2^12 - 1) for the +/-small
        stream (|k| <= SMALL_MAX) and ~2^13 for the Montgomery-product
        stream (loose [0, 2p) operands).  A malicious or degenerate
        dense row would silently corrupt, so raise instead."""
        from ..errors import InvalidIndexError

        budget = np.zeros(num_rows + 1, np.int64)
        if int_entries:
            rows = np.fromiter((e[0] for e in int_entries), np.int64)
            mags = np.fromiter((abs(e[2]) for e in int_entries), np.int64)
            np.add.at(budget, rows, mags * ((1 << 12) - 1))
        if gen_entries:
            rows = np.fromiter((e[0] for e in gen_entries), np.int64)
            np.add.at(budget, rows, 1 << 13)
        worst = int(budget.max()) if num_rows else 0
        if worst >= 1 << 29:
            raise InvalidIndexError(
                f"row too dense for lazy int32 accumulation: "
                f"worst per-limb magnitude {worst} >= 2^29")

    def multiply_vec(self, z: jnp.ndarray) -> jnp.ndarray:
        """(NL, num_cols) -> (NL, num_rows), values in Montgomery form."""
        ops = self.ops
        # integer stream: gathered limbs scaled by small signed ints
        vi = jnp.take(z, self.int_cols, axis=1)  # (NL, n_int)
        scaled = vi * self.int_coeffs[None, :]
        acc_int = jax.ops.segment_sum(
            scaled.T, self.int_rows, num_segments=self.num_rows + 1,
            indices_are_sorted=True,
        ).T  # (NL, rows+1); sentinel row absorbs padding

        # general stream: Montgomery multiply then segment sum
        vg = jnp.take(z, self.gen_cols, axis=1)
        prod = ops.mont_mul(vg, self.gen_vals)
        acc_gen = jax.ops.segment_sum(
            prod.T, self.gen_rows, num_segments=self.num_rows + 1,
            indices_are_sorted=True,
        ).T

        total = acc_int[:, : self.num_rows] + acc_gen[:, : self.num_rows]
        return _reduce_lazy(ops, total)


    def multiply_vec_batched(self, z: jnp.ndarray) -> jnp.ndarray:
        """(NL, I, num_cols) -> (NL, I, num_rows): one gather+segment-sum
        over the whole instance batch (reference multiply_vec_batched,
        sparse.rs:237-302 — rayon sub-batches become a device axis)."""
        ops = self.ops
        I = z.shape[1]
        vi = jnp.take(z, self.int_cols, axis=2)  # (NL, I, n_int)
        scaled = vi * self.int_coeffs[None, None, :]
        acc_int = jax.ops.segment_sum(
            jnp.moveaxis(scaled, 2, 0), self.int_rows,
            num_segments=self.num_rows + 1, indices_are_sorted=True,
        )  # (rows+1, NL, I)
        vg = jnp.take(z, self.gen_cols, axis=2)
        prod = ops.mont_mul(vg, self.gen_vals[:, None, :])
        acc_gen = jax.ops.segment_sum(
            jnp.moveaxis(prod, 2, 0), self.gen_rows,
            num_segments=self.num_rows + 1, indices_are_sorted=True,
        )
        total = jnp.moveaxis((acc_int + acc_gen)[: self.num_rows], 0, 2)
        return _reduce_lazy(ops, total)


def _reduce_lazy(ops: FieldOps, t: jnp.ndarray) -> jnp.ndarray:
    """Reduce (NL, n) int32 'lazy' limbs (possibly negative, |limb| < 2^29)
    into loose Montgomery elements in [0, 2p).

    The value may be negative (signed coefficients ride the limbs), so we
    first add the constant 2^29 * p — larger than any in-bound negative
    magnitude — making the wide value positive without changing it mod p.
    acc_reduce then contributes a factor R^{-1}, restored by a constant
    multiply by R^2.  The |limb| < 2^29 bound allows ~2^13 summed entries
    per row; R1CS rows are far sparser.
    """
    offset = (1 << 29) * ops.p
    off = np.array(
        [(offset >> (12 * i)) & 0xFFF for i in range(2 * NL + 2)], np.int32
    ).reshape((2 * NL + 2,) + (1,) * (t.ndim - 1))
    acc = jnp.zeros((2 * NL + 2,) + t.shape[1:], jnp.int32)
    acc = acc.at[:NL].add(t)
    acc = acc + off
    v = ops.acc_reduce(acc)
    return ops.mul_const(v, ops.spec.r2_mod)
