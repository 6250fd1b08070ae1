"""Vectorized prime-field arithmetic over 12-bit limbs in JAX.

Data convention: a vector of field elements is an int32 array of shape
``(NUM_LIMBS, *batch)`` — limb axis FIRST so the batch rides the TPU lane
dimension.  Elements are stored in **Montgomery form** (factor R = 2^264)
and kept in the *loose* range [0, 2p) with every limb < 2^12.

This module is the TPU-native replacement for the reference's L1 field
kernels (src/big_num/limbs.rs, montgomery.rs, delayed_reduction.rs): the
BMI2/ADX 4x64 multiply-accumulate becomes a 22-step slice-accumulate of
int32 vector multiplies (one fused multiply-add over the whole batch per
limb), and the 576-bit delayed-reduction accumulator becomes a 46-column
int32 accumulator with a parallel carry step per product.

Graph-size note: product columns and REDC are expressed as `at[i:i+NL].add`
updates on a (columns, batch) array rather than fully unrolled scalar limb
arithmetic — ~10x fewer HLO ops, which keeps XLA compile times sane for
the fused per-round sum-check kernels.

Everything here is pure JAX and jit-safe; it runs identically on CPU
(tests) and TPU (production).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .constants import LIMB_BITS, LIMB_MASK, NUM_LIMBS, FieldSpec

B = LIMB_BITS
NL = NUM_LIMBS
MASK = LIMB_MASK
I32 = jnp.int32

# Max columns a wide accumulator may hold (value < 2^552 with 12-bit limbs).
ACC_COLS = 2 * NL + 2


def _const_limbs(v: int, n: int = NL) -> np.ndarray:
    return np.array([(v >> (B * i)) & MASK for i in range(n)], dtype=np.int32)


class FieldOps:
    """Per-field vectorized limb arithmetic.

    All methods are static w.r.t. tracing: constants are baked into the
    jaxpr, inputs/outputs are int32 arrays shaped (NL, *batch).
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        p = spec.modulus
        self.p = p
        self.mont_inv = spec.mont_inv
        self.p_limbs = _const_limbs(p)
        self.two_p_limbs = _const_limbs(2 * p)
        self.one_mont = _const_limbs(spec.r_mod)
        self.r2 = _const_limbs(spec.r2_mod)

        # jit the hot entry points (constants close over; cached per instance).
        # Inside larger jitted programs these trace through transparently.
        for name in (
            "add", "sub", "neg", "double", "mont_mul", "mont_sqr",
            "canonical", "to_mont", "from_mont", "is_zero", "eq",
            "inv", "batch_inv", "from_uniform_bytes", "sum_products",
        ):
            setattr(self, name, jax.jit(getattr(self, name)))
        self.pow_const = jax.jit(self.pow_const, static_argnums=1)
        self.mul_const = jax.jit(self.mul_const, static_argnums=1)

    # ------------------------------------------------------------------
    # shape helpers
    # ------------------------------------------------------------------
    def const(self, value_mont: int, batch_shape=()) -> jnp.ndarray:
        """Broadcast a host Montgomery-form integer constant to (NL, *batch)."""
        limbs = _const_limbs(value_mont)
        out = jnp.asarray(limbs, dtype=I32)
        return jnp.broadcast_to(
            out.reshape((NL,) + (1,) * len(batch_shape)), (NL,) + tuple(batch_shape)
        )

    # ------------------------------------------------------------------
    # carries
    # ------------------------------------------------------------------
    @staticmethod
    def _carry_list(t: list, n_out: int) -> list:
        """Full sequential carry propagation over a limb list.

        Supports negative intermediate limbs: ``>>`` is an arithmetic shift,
        so borrows propagate as negative carries.  Returns n_out limbs in
        [0, 2^B); the caller must guarantee the value fits.
        """
        out = []
        carry = None
        for i in range(n_out):
            v = t[i] if i < len(t) else 0
            if carry is not None:
                v = v + carry
            out.append(v & MASK)
            carry = v >> B
        return out

    def _cond_sub(self, limbs: list, m_limbs: np.ndarray) -> list:
        """Return limbs - m if limbs >= m else limbs (single conditional)."""
        diff = []
        borrow = 0
        for i in range(NL):
            v = limbs[i] - int(m_limbs[i]) + borrow
            diff.append(v & MASK)
            borrow = v >> B  # 0 or -1
        take_diff = borrow >= 0
        return [jnp.where(take_diff, d, o) for d, o in zip(diff, limbs)]

    # ------------------------------------------------------------------
    # basic ops (loose domain [0, 2p), normalized limbs)
    # ------------------------------------------------------------------
    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        t = [a[i] + b[i] for i in range(NL)]
        t = self._carry_list(t, NL)
        t = self._cond_sub(t, self.two_p_limbs)
        return jnp.stack(t)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """a - b + 2p, reduced back into [0, 2p)."""
        t = [a[i] - b[i] + int(self.two_p_limbs[i]) for i in range(NL)]
        t = self._carry_list(t, NL)
        t = self._cond_sub(t, self.two_p_limbs)
        return jnp.stack(t)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        t = [int(self.two_p_limbs[i]) - a[i] for i in range(NL)]
        t = self._carry_list(t, NL)
        t = self._cond_sub(t, self.two_p_limbs)
        return jnp.stack(t)

    def double(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.add(a, a)

    # ------------------------------------------------------------------
    # multiplication core (array-based wide columns)
    # ------------------------------------------------------------------
    def _mul_cols(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Schoolbook product columns: (NL,*s) x (NL,*s) -> (2NL-1,*s).

        Columns < 22 * 2^24 < 2^29.  One vector multiply-accumulate per limb
        of ``a`` — 22 fused ops instead of 484 scalar ones.
        """
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        t = jnp.zeros((2 * NL - 1,) + batch, I32)
        for i in range(NL):
            t = t.at[i : i + NL].add(a[i][None] * b)
        return t

    def _redc_cols(self, t: jnp.ndarray, k: int = NL) -> jnp.ndarray:
        """Generalized Montgomery reduction: eliminate the low ``k`` limbs.

        Input: (C,*batch) columns with |col| < 2^30 and non-negative value.
        Output: (NL,*batch) normalized limbs of value * 2^{-12k} (mod p),
        valid when value < 2^{12k} * 2p so the result fits NL limbs.
        """
        batch = t.shape[1:]
        need = k + NL + 1
        if t.shape[0] < need:
            t = jnp.concatenate(
                [t, jnp.zeros((need - t.shape[0],) + batch, I32)], axis=0
            )
        pl = jnp.asarray(self.p_limbs).reshape((NL,) + (1,) * len(batch))
        inv = self.mont_inv
        for i in range(k):
            m = (t[i] * inv) & MASK
            t = t.at[i : i + NL].add(m[None] * pl)
            t = t.at[i + 1].add(t[i] >> B)
        out = self._carry_list([t[k + j] for j in range(NL + 1)], NL)
        return jnp.stack(out)

    def mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product a*b*R^{-1}; loose in, loose out."""
        return self._redc_cols(self._mul_cols(a, b), NL)

    def mont_sqr(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, a)

    def mul_const(self, a: jnp.ndarray, c: int) -> jnp.ndarray:
        """a * c * R^{-1} for a host integer constant c (pass c = k*R mod p
        to multiply a Montgomery value by plain k)."""
        cl = _const_limbs(c % self.p)
        batch = a.shape[1:]
        t = jnp.zeros((2 * NL - 1,) + batch, I32)
        for j in range(NL):
            cj = int(cl[j])
            if cj:
                t = t.at[j : j + NL].add(a * cj)
        return self._redc_cols(t, NL)

    def mul_small(self, a: jnp.ndarray, k: int) -> jnp.ndarray:
        """Multiply by a small plain integer k (|k| small) without REDC."""
        return self.mul_const(a, k * self.spec.r_mod % self.p)

    # ------------------------------------------------------------------
    # canonicalization & conversion
    # ------------------------------------------------------------------
    def canonical(self, a: jnp.ndarray) -> jnp.ndarray:
        """Reduce loose [0,2p) to canonical [0,p) (still Montgomery form)."""
        t = [a[i] for i in range(NL)]
        t = self._cond_sub(t, self.p_limbs)
        return jnp.stack(t)

    def to_mont(self, a_canonical: jnp.ndarray) -> jnp.ndarray:
        """Canonical-integer limbs -> Montgomery form (mul by R^2)."""
        return self.mul_const(a_canonical, self.spec.r2_mod)

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        """Montgomery form -> canonical integer limbs in [0, p)."""
        batch = a.shape[1:]
        t = jnp.concatenate(
            [a, jnp.zeros((NL - 1,) + batch, I32)], axis=0
        )
        v = self._redc_cols(t, NL)
        return self.canonical(v)

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        """Boolean mask over batch: value == 0 mod p (input loose mont)."""
        c = self.from_mont(a)
        return jnp.all(c == 0, axis=0)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        ca = self.from_mont(a)
        cb = self.from_mont(b)
        return jnp.all(ca == cb, axis=0)

    # ------------------------------------------------------------------
    # exponentiation / inversion
    # ------------------------------------------------------------------
    def pow_const(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for host-known exponent (square and multiply, MSB first)."""
        bits = bin(e)[2:]
        result = self.const(self.spec.r_mod, a.shape[1:])  # ONE in mont form
        for bit in bits:
            result = self.mont_sqr(result)
            if bit == "1":
                result = self.mont_mul(result, a)
        return result

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Fermat inversion a^(p-2). Undefined for a == 0 (returns 0).

        fori_loop square-and-multiply: one sqr+mul body compiled once,
        iterated over the exponent bits at runtime.
        """
        e = self.p - 2
        nbits = e.bit_length()
        bits = jnp.asarray(
            np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], np.int32)
        )
        one = self.const(self.spec.r_mod, a.shape[1:])

        def body(i, result):
            result = self.mont_sqr(result)
            mul = self.mont_mul(result, a)
            return jnp.where(bits[i] == 1, mul, result)

        return jax.lax.fori_loop(0, nbits, body, one)

    def batch_inv(self, a: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
        """Montgomery-trick batch inversion along the last axis.

        Zero entries map to zero.  One Fermat inversion + 3n muls; intended
        for moderate n (sequential prefix products).
        """
        assert axis == -1
        n = a.shape[-1]
        is_z = self.is_zero(a)
        one_full = self.const(self.spec.r_mod, a.shape[1:])
        safe = jnp.where(is_z[None, ...], one_full, a)
        acc = None
        accs = []
        for i in range(n):
            ai = safe[..., i]
            acc = ai if acc is None else self.mont_mul(acc, ai)
            accs.append(acc)
        run = self.inv(accs[-1])
        outs = [None] * n
        for i in range(n - 1, 0, -1):
            outs[i] = self.mont_mul(run, accs[i - 1])
            run = self.mont_mul(run, safe[..., i])
        outs[0] = run
        out = jnp.stack(outs, axis=-1)
        return jnp.where(is_z[None, ...], jnp.zeros_like(out), out)

    # ------------------------------------------------------------------
    # wide/uniform reduction
    # ------------------------------------------------------------------
    def from_uniform_bytes(self, data: jnp.ndarray) -> jnp.ndarray:
        """(64, *batch) uint8 little-endian -> Montgomery-form field element.

        Matches host FieldSpec.from_uniform then to_mont: the 512-bit LE
        integer reduced mod p, in Montgomery representation.
        """
        limbs43 = bytes_to_limbs(data, 43)
        t = jnp.stack(limbs43)
        # eliminate 21 limbs -> factor 2^{-252}; result < 2^260 + 2p
        v = self._redc_cols(t, 21)
        # v = value * 2^{-252}; multiply by c = 2^252 * R^2 so that
        # result = v * c * R^{-1} = value * R  (Montgomery form of value).
        return self.mul_const(v, (1 << 252) * self.spec.r2_mod % self.p)

    # ------------------------------------------------------------------
    # delayed-reduction accumulation
    # ------------------------------------------------------------------
    def sum_products(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Sum_i a[:,i] * b[:,i] over the batch axis, one REDC total.

        The TPU delayed-reduction workhorse (cf. reference
        compute_eval_points_quad, src/sumcheck.rs:128-174): per-element
        product columns (no REDC), one parallel carry step, then a
        hierarchical integer sum across lanes with a carry step per stage
        so every column stays < 2^29, and a single wide reduction at the
        end.  Batch must be a power of two (callers pad).
        """
        t = self._mul_cols(a, b)  # (43, n), cols < 2^29
        cols = self._parallel_carry(t)  # (44, n), cols < 23*2^12
        n = a.shape[-1]
        while n > 1:
            k = min(n, 4096)
            cols = cols.reshape(cols.shape[:-1] + (n // k, k)).sum(axis=-1)
            cols = self._parallel_carry(cols)
            n //= k
        return self.acc_reduce(cols[..., 0])

    # ------------------------------------------------------------------
    # MXU (int8 matmul) contractions
    #
    # The sum-check's hot reductions are contractions over the hypercube
    # axis: sum_n a[:, n] * b[:, n].  In limb space that is
    # sum_{i+j=c} G[i, j] with G = a @ b^T — a MATMUL over the batch
    # axis, which belongs on the MXU (pallas_guide.md: the systolic
    # array takes int8 x int8 -> int32).  12-bit limbs split into two
    # 6-bit int8 planes; products are < 2^12 so a 2^17-element chunk
    # accumulates exactly in int32.  The VPU formulation
    # (_mul_cols + carries + tiled adds, ~1000 int32 MACs per element)
    # measured ~28 ms per fused outer round at 2^19; the MXU contraction
    # is ~2 G int8-MACs — noise against the systolic array's throughput.
    # ------------------------------------------------------------------
    @staticmethod
    def to6(a: jnp.ndarray) -> jnp.ndarray:
        """(NL, *batch) 12-bit limbs -> (2NL, *batch) int8 6-bit planes;
        plane k carries weight 2^(6k)."""
        lo = (a & 63).astype(jnp.int8)
        hi = (a >> 6).astype(jnp.int8)
        return jnp.stack([lo, hi], axis=1).reshape((2 * NL,) + a.shape[1:])

    def _cols_from_planes(self, planes: list) -> jnp.ndarray:
        """[(2NL+?, ...) int32 6-bit-weighted plane p shifted by 12*m]
        -> (ACC_COLS, ...) 12-bit wide columns.

        ``planes[m]`` holds anti-diagonal sums d with value
        sum_c d[c] * 2^(6c + 12m).  Every input must keep the combined
        column magnitudes < 2^30 (callers bound their chunk counts)."""
        n6 = planes[0].shape[0]
        batch = planes[0].shape[1:]
        cols = jnp.zeros((ACC_COLS,) + batch, I32)
        for mshift, d in enumerate(planes):
            even = d[0::2]  # c = 2k -> limb k + mshift
            odd = d[1::2]   # c = 2k+1 -> 64 * (limb k + mshift)
            ke = even.shape[0]
            cols = cols.at[mshift : mshift + ke].add(even)
            ko = odd.shape[0]
            cols = cols.at[mshift : mshift + ko].add(odd * 64)
        return cols

    @staticmethod
    def _diag_sums(G: jnp.ndarray) -> jnp.ndarray:
        """(K, K, *batch) -> (2K-1, *batch): d[c] = sum_{i+j=c} G[i,j]."""
        K = G.shape[0]
        batch = G.shape[2:]
        d = jnp.zeros((2 * K - 1,) + batch, I32)
        for i in range(K):
            d = d.at[i : i + K].add(G[i])
        return d

    MXU_CHUNK = 1 << 17  # int32-exact accumulation bound for 6-bit products

    def sum_products_mxu(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """MXU twin of sum_products: one int8 matmul per 2^17 chunk.

        a/b: (NL, n) loose Montgomery limbs; returns (NL,) loose
        Montgomery sum-of-products (bit-identical semantics to
        sum_products; equality-tested in tests/test_field.py)."""
        n = a.shape[-1]
        assert n <= 1 << 21, "column-magnitude budget (see _cols_from_planes)"
        a6 = self.to6(a)
        b6 = self.to6(b)
        nch = -(-n // self.MXU_CHUNK)
        if n < nch * self.MXU_CHUNK:
            pad = nch * self.MXU_CHUNK - n
            a6 = jnp.concatenate(
                [a6, jnp.zeros((2 * NL, pad), jnp.int8)], axis=1)
            b6 = jnp.concatenate(
                [b6, jnp.zeros((2 * NL, pad), jnp.int8)], axis=1)
        g0 = g1 = g2 = jnp.zeros((2 * NL, 2 * NL), I32)
        for c in range(nch):
            sl = slice(c * self.MXU_CHUNK, (c + 1) * self.MXU_CHUNK)
            G = jax.lax.dot_general(
                a6[:, sl], b6[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=I32)
            g0 = g0 + (G & 4095)
            g1 = g1 + ((G >> 12) & 4095)
            g2 = g2 + (G >> 24)
        cols = self._cols_from_planes(
            [self._diag_sums(g0), self._diag_sums(g1), self._diag_sums(g2)])
        return self.acc_reduce(cols)

    def weighted_inner_mxu(self, w: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
        """inner[l] = sum_r w[:, r] * f[:, l, r] on the MXU.

        w: (NL, R), f: (NL, L, R), R <= 4096 (int32-exact accumulation).
        Returns (NL, L) loose Montgomery — the inner stage of the Gruen
        two-level weighted sum (sumcheck/fused.py)."""
        R = f.shape[-1]
        assert R <= 4096
        f6 = self.to6(f)              # (44, L, R)
        w6 = self.to6(w)              # (44, R)
        P = jax.lax.dot_general(
            f6, w6, (((2,), (1,)), ((), ())),
            preferred_element_type=I32)  # (44, L, 44): sum_r f6[i,l,r]w6[j,r]
        P = jnp.moveaxis(P, 1, 2)        # (44, 44, L)
        p0 = P & 4095
        p1 = P >> 12                      # < 2^10 for R <= 4096
        cols = self._cols_from_planes(
            [self._diag_sums(p0), self._diag_sums(p1)])
        return self.acc_reduce(cols)

    @staticmethod
    def _parallel_carry(t: jnp.ndarray) -> jnp.ndarray:
        """One parallel carry step; appends a spill column."""
        low = t & MASK
        shifted = t >> B
        out = jnp.concatenate([low, jnp.zeros_like(t[:1])], axis=0)
        return out.at[1:].add(shifted)

    def acc_new(self, batch_shape) -> jnp.ndarray:
        """(ACC_COLS, *batch) accumulator for sums of Montgomery products."""
        return jnp.zeros((ACC_COLS,) + tuple(batch_shape), I32)

    def acc_mul_add(self, acc: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
        """acc += a*b (columns), followed by one parallel carry step.

        Keeps every column < ~2^29 regardless of how many products are
        accumulated — the TPU analogue of the reference's WideLimbs<9>
        accumulator (src/big_num/delayed_reduction.rs:52-64).
        """
        t = acc.at[: 2 * NL - 1].add(self._mul_cols(a, b))
        low = t & MASK
        return low.at[1:].add(t[:-1] >> B)

    def acc_reduce(self, acc: jnp.ndarray, extra_const: int = 1) -> jnp.ndarray:
        """Collapse a wide accumulator to a loose Montgomery element.

        Input: (C,*batch) columns, C <= ACC_COLS, non-negative value
        < 2^540.  Returns sum * R^{-1} * extra_const in [0, 2p) — i.e.
        the Montgomery form of the sum when the accumulated products
        were of Montgomery operands.  ``extra_const`` folds a follow-up
        constant multiply into the one the reduction already needs
        (callers like _reduce_lazy otherwise pay a second full
        mul_const pass over the whole row axis).
        """
        C = acc.shape[0]
        assert C <= ACC_COLS
        # full carry normalize to ACC_COLS limbs
        t = self._carry_list([acc[i] for i in range(C)], ACC_COLS)
        k = ACC_COLS - NL  # eliminate 24 limbs -> factor 2^{-288}
        v = self._redc_cols(jnp.stack(t), k)
        # v = S * 2^{-12k}; want S * R^{-1} * extra = v * (2^{12k} * extra).
        return self.mul_const(v, pow(2, B * k, self.p) * extra_const % self.p)


# ---------------------------------------------------------------------------
# byte packing (device side)
# ---------------------------------------------------------------------------


def bytes_to_limbs(data: jnp.ndarray, n_limbs: int) -> list:
    """(n_bytes, *batch) uint8 LE -> list of n_limbs int32 12-bit limbs."""
    d = data.astype(I32)
    n_bytes = data.shape[0]
    limbs = []
    for k in range(n_limbs):
        lo_bit = B * k
        b0 = lo_bit // 8
        off = lo_bit % 8  # 0 or 4 alternating
        v = d[b0] >> off
        if b0 + 1 < n_bytes:
            v = v | (d[b0 + 1] << (8 - off))
        if 8 - off + 8 < B and b0 + 2 < n_bytes:
            v = v | (d[b0 + 2] << (16 - off))
        limbs.append(v & MASK)
    return limbs


def limbs_to_bytes(limbs: jnp.ndarray, n_bytes: int = 32) -> jnp.ndarray:
    """(NL, *batch) canonical limbs -> (n_bytes, *batch) uint8 LE."""
    out = []
    for k in range(n_bytes):
        lo_bit = 8 * k
        i = lo_bit // B
        off = lo_bit % B
        v = limbs[i] >> off
        if off + 8 > B and i + 1 < limbs.shape[0]:
            v = v | (limbs[i + 1] << (B - off))
        out.append(v & 0xFF)
    return jnp.stack(out).astype(jnp.uint8)
