"""Sparse R1CS matrices: host CSR + TPU-native SpMV.

Reference: src/r1cs/sparse.rs.  The reference classifies entries into
+/-1, small (|k|<=7), and general coefficient streams to avoid field
multiplies (PrecomputedSparseMatrix, sparse.rs:29-134).  The TPU version
keeps the same classification but expresses SpMV as

    gather(z, ELL cols) -> scale (integer limb multiply for unit/small,
    Montgomery multiply for general) -> dense per-row reduction -> one
    wide reduction per row,

with NO scatters (see DeviceSpMV: TPU scatter is serial), mapping the
row-parallel rayon loop (sparse.rs:221-233) onto the VPU: negative
coefficients become negative int32 limbs (the wide reducer's arithmetic
shifts propagate borrows), so -1 entries cost a single vector multiply
by -1 instead of a field negation.
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
    """Device-side SpMV program for one sparse matrix — scatter-free.

    TPU scatter (the lowering of segment_sum) costs ~1 us per element,
    which made the 450k-nnz SHA-256 SpMVs the hidden dominant phase of
    the whole prover (PROFILE.md round 2).  This layout uses only
    gathers and dense reductions:

    * int tier 1: a dense ELL block (num_rows, K0) holding the first K0
      integer-coefficient entries of every row (|k| <= 7 incl. +/-1;
      pad entries are col 0 with coefficient 0).
    * int tier 2: overflow entries of dense rows as a compact ELL over
      just those rows; their row sums re-enter the output through a
      STATIC inverse-map gather (no scatter).
    * gen stream: general field coefficients as a compact ELL over the
      rows that have any, Montgomery-multiplied then combined through
      the same inverse-map gather.

    The reference's stream classification (sparse.rs:29-134) is kept;
    the rayon row loop becomes the dense row axis.
    """

    ops: FieldOps
    num_rows: int
    num_cols: int
    t1_cols: jnp.ndarray  # (num_rows, K0) int32
    t1_coef: jnp.ndarray  # (num_rows, K0) int32
    t2: tuple | None      # int-overflow ([(cols, coefs), ...], inv)
    gen: tuple | None     # general-coeff ([(cols, vals), ...], inv)

    K0_CAP = 8

    @classmethod
    def build(cls, ops: FieldOps, m: SparseMatrix, num_rows: int,
              col_min: int = 0, col_max: int | None = None) -> "DeviceSpMV":
        """Build a device SpMV program.  With ``col_min``/``col_max`` the
        program covers only the column slice [col_min, col_max) with
        gather indices rebased to col_min — the TPU form of the
        reference's ``build_filtered`` / ``FilteredSpmv``
        (sparse.rs:305-380), used for cached-prefix incremental SpMV."""
        p = m.field.modulus
        int_by_row: dict[int, list] = {}
        gen_by_row: dict[int, list] = {}
        int_entries, gen_entries = [], []
        for row, col, val in m.iter_entries():
            if col < col_min or (col_max is not None and col >= col_max):
                continue
            col -= col_min
            k = val if val <= SMALL_MAX else val - p if val >= p - SMALL_MAX else None
            if k is not None:
                int_by_row.setdefault(row, []).append((col, k))
                int_entries.append((row, col, k))
            else:
                gen_by_row.setdefault(row, []).append((col, val))
                gen_entries.append((row, col, val))
        cls._check_row_density(int_entries, gen_entries, num_rows)

        # Adaptive dense-tier width: K0 = max row width wastes gathers
        # massively on near-empty rows (a transpose matrix averages ~1
        # entry/row but one dense row forced K0 = 8 -> 8x the gather
        # traffic; measured 534 ms for the SHA poly_ABC bind).  Pick the
        # smallest K0 leaving at most num_rows/32 overflow rows — the
        # compact tiers below handle the heavy tail at ~nnz cost.
        hist: dict[int, int] = {}
        for ents in int_by_row.values():
            hist[len(ents)] = hist.get(len(ents), 0) + 1
        K0 = 0
        allowed = max(num_rows // 32, 1)
        while (K0 < cls.K0_CAP
               and sum(c for w, c in hist.items() if w > K0) > allowed):
            K0 += 1
        t1c = np.zeros((num_rows, K0), np.int32)
        t1k = np.zeros((num_rows, K0), np.int32)
        over: dict[int, list] = {}
        for row, ents in int_by_row.items():
            head = ents[:K0]
            for j, (c, k) in enumerate(head):
                t1c[row, j] = c
                t1k[row, j] = k
            if len(ents) > K0:
                over[row] = ents[K0:]

        def compact(by_row: dict, with_vals: bool):
            """Width-bucketed compact ELL tiers + ONE shared inverse map.

            Rows are grouped by next-pow2 of their entry count, so pad
            waste is < 2x even with skewed widths.  All buckets' row
            sums are concatenated and re-enter the output through a
            SINGLE static gather (per-bucket inverse gathers each cost a
            full num_rows-sized pass — the dominant cost when a skewed
            width distribution makes many buckets).
            Returns ((cols, coefs_or_vals) blocks, combined inv) or None."""
            if not by_row:
                return None
            buckets: dict[int, list] = {}
            for r in sorted(by_row):
                w = len(by_row[r])
                K1 = 1 << max(w - 1, 0).bit_length()
                buckets.setdefault(K1, []).append(r)
            blocks = []
            inv = np.zeros(num_rows, np.int32)
            off = 0
            for K1, rows in buckets.items():
                n2 = len(rows)
                cols = np.zeros((n2, K1), np.int32)
                if with_vals:
                    flat = [0] * (n2 * K1)
                else:
                    coefs = np.zeros((n2, K1), np.int32)
                for i, r in enumerate(rows):
                    for j, (c, v) in enumerate(by_row[r]):
                        cols[i, j] = c
                        if with_vals:
                            flat[i * K1 + j] = v
                        else:
                            coefs[i, j] = v
                inv[np.asarray(rows, np.int64)] = off + np.arange(
                    n2, dtype=np.int32)
                off += n2
                if with_vals:
                    vals = jnp.asarray(
                        ints_to_limbs_np(flat, m.field, mont=True)
                    ).reshape(NL, n2, K1)
                    blocks.append((jnp.asarray(cols), vals))
                else:
                    blocks.append((jnp.asarray(cols), jnp.asarray(coefs)))
            # rows in no bucket point at the zero pad slot (index off)
            mask = np.ones(num_rows, bool)
            for rows_list in buckets.values():
                mask[np.asarray(rows_list, np.int64)] = False
            inv[mask] = off
            return (blocks, jnp.asarray(inv))

        t2 = compact(over, with_vals=False)
        gen = compact(gen_by_row, with_vals=True)

        hi = m.cols if col_max is None else col_max
        return cls(
            ops=ops, num_rows=num_rows, num_cols=hi - col_min,
            t1_cols=jnp.asarray(t1c), t1_coef=jnp.asarray(t1k),
            t2=t2, gen=gen,
        )

    @staticmethod
    def _check_row_density(int_entries, gen_entries, num_rows: int) -> None:
        """Overflow guard for the lazy int32 accumulation
        (the role of the reference's debug_assert carry checks,
        big_num/limbs.rs:87): each row sum must keep |limb| < 2^29
        before _reduce_lazy's offset add.  Per entry the worst per-limb
        magnitude is |k| * (2^12 - 1) for the +/-small stream
        (|k| <= SMALL_MAX) and ~2^13 for the Montgomery-product stream
        (loose [0, 2p) operands).  A malicious or degenerate dense row
        would silently corrupt, so raise instead."""
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

    # -- evaluation ------------------------------------------------------
    @property
    def prog(self):
        """Program arrays as a pytree.  ALWAYS pass this as a jit
        ARGUMENT, never close over it: embedded as HLO constants the
        multi-million-element index arrays explode XLA compile time."""
        return (self.t1_cols, self.t1_coef, self.t2, self.gen)

    def multiply_vec(self, z: jnp.ndarray) -> jnp.ndarray:
        """(NL, num_cols) -> (NL, num_rows), values in Montgomery form."""
        return spmv_apply(self.ops, self.prog, z)

    def multiply_vec_batched(self, z: jnp.ndarray) -> jnp.ndarray:
        """(NL, I, num_cols) -> (NL, I, num_rows): the whole instance
        batch in one gather+reduce sweep (reference multiply_vec_batched,
        sparse.rs:237-302 — rayon sub-batches become a device axis)."""
        return spmv_apply_batched(self.ops, self.prog, z)


def _spmv_accumulate(prog, take, mont_mul):
    """Shared scatter-free accumulation over a SpMV ``prog`` pytree;
    ``take(flat_idx) -> (..., n)`` gathers from z with arbitrary leading
    batch dims.  Each compact class re-enters the output through ONE
    static inverse gather over its concatenated bucket sums."""
    t1_cols, t1_coef, t2, gen = prog
    R, K0 = t1_cols.shape
    acc = None
    if K0 > 0:
        vi = take(t1_cols.reshape(-1))
        vi = vi.reshape(vi.shape[:-1] + (R, K0))
        acc = (vi * t1_coef).sum(axis=-1)

    def class_contrib(blocks, inv, combine):
        sums = []
        for cols, cv in blocks:
            nb, Kb = cols.shape
            v = take(cols.reshape(-1))
            v = v.reshape(v.shape[:-1] + (nb, Kb))
            sums.append(combine(v, cv))
        pad = jnp.zeros(sums[0].shape[:-1] + (1,), jnp.int32)
        return jnp.concatenate(sums + [pad], axis=-1)[..., inv]

    if t2 is not None:
        blocks, inv = t2
        c = class_contrib(blocks, inv, lambda v, k: (v * k).sum(axis=-1))
        acc = c if acc is None else acc + c
    if gen is not None:
        blocks, inv = gen
        c = class_contrib(blocks, inv,
                          lambda v, gv: mont_mul(v, gv).sum(axis=-1))
        acc = c if acc is None else acc + c
    if acc is None:  # entirely empty slice: all-zero rows
        acc = jnp.zeros(take(jnp.zeros((1,), jnp.int32)).shape[:-1] + (R,),
                        jnp.int32)
    return acc


def spmv_apply(ops: FieldOps, prog, z: jnp.ndarray) -> jnp.ndarray:
    """(NL, num_cols) -> (NL, num_rows) over a ``DeviceSpMV.prog``."""
    acc = _spmv_accumulate(
        prog,
        lambda idx: jnp.take(z, idx, axis=1),
        lambda vg, gv: ops.mont_mul(vg, gv),
    )
    return _reduce_lazy(ops, acc)


def spmv_apply_batched(ops: FieldOps, prog, z: jnp.ndarray) -> jnp.ndarray:
    """(NL, I, num_cols) -> (NL, I, num_rows)."""
    acc = _spmv_accumulate(
        prog,
        lambda idx: jnp.take(z, idx, axis=2),
        lambda vg, gv: ops.mont_mul(vg, gv[:, None]),
    )
    return _reduce_lazy(ops, acc)


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
