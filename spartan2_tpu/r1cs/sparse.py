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
        # -- entry classification, numpy-vectorized (the per-entry python
        # dict loops cost ~9 s per matrix at SHA-256 scale; 12 builds per
        # setup made this the dominant host phase of bench setup) -----
        all_cols = np.asarray(m.indices, dtype=np.int64)
        nrows_src = len(m.indptr) - 1
        all_rows = np.repeat(np.arange(nrows_src, dtype=np.int64),
                             np.diff(np.asarray(m.indptr, dtype=np.int64)))
        hi_col = m.cols if col_max is None else col_max
        if col_min or col_max is not None:
            keep = (all_cols >= col_min) & (all_cols < hi_col)
            all_cols = all_cols[keep] - col_min
            all_rows = all_rows[keep]
            import itertools

            data_f = list(itertools.compress(m.data, keep.tolist()))
        else:
            data_f = m.data
        # small-int extraction: one C-speed pass over python bigints
        lo_thresh = p - SMALL_MAX
        kvals = np.fromiter(
            ((v + SMALL_MAX + 1 if v <= SMALL_MAX
              else v - p if v >= lo_thresh else 0)
             for v in data_f), np.int64, count=len(data_f))
        is_small = kvals != 0
        kvals = np.where(kvals > 0, kvals - (SMALL_MAX + 1), kvals)

        rows_i, cols_i, k_i = (all_rows[is_small], all_cols[is_small],
                               kvals[is_small])
        g_mask = ~is_small
        rows_g, cols_g = all_rows[g_mask], all_cols[g_mask]
        if g_mask.any():
            import itertools

            vals_g = list(itertools.compress(data_f, g_mask.tolist()))
        else:
            vals_g = []
        cls._check_row_density_np(rows_i, np.abs(k_i), rows_g, num_rows)

        def row_ranks(rows_sorted):
            """Per-entry rank within its row (entries grouped by row)."""
            n = len(rows_sorted)
            if n == 0:
                return (np.zeros(0, np.int64),) * 4
            urows, starts, counts = np.unique(
                rows_sorted, return_index=True, return_counts=True)
            uidx = np.searchsorted(urows, rows_sorted)
            rank = np.arange(n, dtype=np.int64) - starts[uidx]
            return urows, counts, uidx, rank

        # Adaptive dense-tier width: K0 = max row width wastes gathers
        # massively on near-empty rows (a transpose matrix averages ~1
        # entry/row but one dense row forced K0 = 8 -> 8x the gather
        # traffic; measured 534 ms for the SHA poly_ABC bind).  Pick the
        # smallest K0 leaving at most num_rows/32 overflow rows — the
        # compact tiers below handle the heavy tail at ~nnz cost.
        urows_i, counts_i, uidx_i, rank_i = row_ranks(rows_i)
        allowed = max(num_rows // 32, 1)
        K0 = 0
        while K0 < cls.K0_CAP and int((counts_i > K0).sum()) > allowed:
            K0 += 1
        t1c = np.zeros((num_rows, K0), np.int32)
        t1k = np.zeros((num_rows, K0), np.int32)
        head = rank_i < K0
        if K0 > 0 and head.any():
            t1c[rows_i[head], rank_i[head]] = cols_i[head]
            t1k[rows_i[head], rank_i[head]] = k_i[head]

        def compact(rows_e, cols_e, rank_e, uidx_e, urows_e, counts_e,
                    int_vals=None, big_vals=None):
            """Width-bucketed compact ELL tiers + ONE shared inverse map.

            Rows are grouped by next-pow2 of their entry count (buckets
            ordered by first encounter along ascending row index, keeping
            shapes identical to the original per-row construction), so
            pad waste is < 2x even with skewed widths.  All buckets' row
            sums are concatenated and re-enter the output through a
            SINGLE static gather.
            Returns ((cols, coefs_or_vals) blocks, combined inv) or None."""
            if len(rows_e) == 0:
                return None
            K1s = np.int64(1) << np.ceil(
                np.log2(np.maximum(counts_e, 1))).astype(np.int64)
            K1s = np.where(K1s < counts_e, K1s * 2, K1s)  # float safety
            # first-encounter order over ascending urows
            _, first_idx = np.unique(K1s, return_index=True)
            k1_order = K1s[np.sort(first_idx)]
            blocks = []
            inv = np.full(num_rows, 0, np.int32)
            off = 0
            touched = np.zeros(num_rows, bool)
            for K1 in k1_order:
                sel_u = K1s == K1  # per-urow bucket membership
                n2 = int(sel_u.sum())
                bucket_pos = np.cumsum(sel_u) - 1  # index within bucket
                sel_e = sel_u[uidx_e]
                brow = bucket_pos[uidx_e[sel_e]]
                brank = rank_e[sel_e]
                cols_arr = np.zeros((n2, int(K1)), np.int32)
                cols_arr[brow, brank] = cols_e[sel_e]
                rows_b = urows_e[sel_u]
                inv[rows_b] = off + np.arange(n2, dtype=np.int32)
                touched[rows_b] = True
                off += n2
                if big_vals is not None:
                    flat = [0] * (n2 * int(K1))
                    flat_pos = (brow * int(K1) + brank).tolist()
                    import itertools

                    for fp, v in zip(flat_pos,
                                     itertools.compress(big_vals,
                                                        sel_e.tolist())):
                        flat[fp] = v
                    vals = jnp.asarray(
                        ints_to_limbs_np(flat, m.field, mont=True)
                    ).reshape(NL, n2, int(K1))
                    blocks.append((jnp.asarray(cols_arr), vals))
                else:
                    coefs = np.zeros((n2, int(K1)), np.int32)
                    coefs[brow, brank] = int_vals[sel_e]
                    blocks.append((jnp.asarray(cols_arr), jnp.asarray(coefs)))
            # rows in no bucket point at the zero pad slot (index off)
            inv[~touched] = off
            return (blocks, jnp.asarray(inv))

        over_mask = rank_i >= K0
        if over_mask.any():
            rows_o, cols_o, k_o = (rows_i[over_mask], cols_i[over_mask],
                                   k_i[over_mask])
            urows_o, counts_o, uidx_o, rank_o = row_ranks(rows_o)
            t2 = compact(rows_o, cols_o, rank_o, uidx_o, urows_o, counts_o,
                         int_vals=k_o)
        else:
            t2 = None
        if len(rows_g):
            urows_g, counts_g, uidx_g, rank_g = row_ranks(rows_g)
            gen = compact(rows_g, cols_g, rank_g, uidx_g, urows_g, counts_g,
                          big_vals=vals_g)
        else:
            gen = None

        hi = m.cols if col_max is None else col_max
        return cls(
            ops=ops, num_rows=num_rows, num_cols=hi - col_min,
            t1_cols=jnp.asarray(t1c), t1_coef=jnp.asarray(t1k),
            t2=t2, gen=gen,
        )

    @staticmethod
    def _check_row_density_np(rows_int: np.ndarray, mags_int: np.ndarray,
                              rows_gen: np.ndarray, num_rows: int) -> None:
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
        if len(rows_int):
            np.add.at(budget, rows_int, mags_int * ((1 << 12) - 1))
        if len(rows_gen):
            np.add.at(budget, rows_gen, 1 << 13)
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
    """(NL, num_cols) -> (NL, num_rows) over a ``DeviceSpMV.prog``.

    z is packed two limbs per int32 before the gathers (pack2): the
    gathers are the SpMV floor (~11 GB/s of index traffic, PROFILE.md
    round 4), so moving 11 planes instead of 22 halves it."""
    from ..field.jnp_ops import pack2, unpack2

    zp = pack2(z)
    acc = _spmv_accumulate(
        prog,
        lambda idx: unpack2(jnp.take(zp, idx, axis=1)),
        lambda vg, gv: ops.mont_mul(vg, gv),
    )
    return _reduce_lazy(ops, acc)


def spmv_apply_batched(ops: FieldOps, prog, z: jnp.ndarray) -> jnp.ndarray:
    """(NL, I, num_cols) -> (NL, I, num_rows)."""
    from ..field.jnp_ops import pack2, unpack2

    zp = pack2(z)
    acc = _spmv_accumulate(
        prog,
        lambda idx: unpack2(jnp.take(zp, idx, axis=2)),
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
    # The old trailing mul_const(v, R^2) pass contributed R^2 * R^-1 = R;
    # folded into acc_reduce's constant that is extra_const = R (acc_reduce
    # returns S * R^-1 * extra_const, so the result is plain S — the
    # Montgomery form, since the lazy limbs already hold Montgomery
    # values).  Saves a full-row mul pass (~40 ms at 2^20) per apply.
    return ops.acc_reduce(acc, extra_const=ops.spec.r_mod)
