"""Vectorized prime-field arithmetic over 12-bit limbs in JAX.

Data convention: a vector of field elements is an int32 array of shape
``(NUM_LIMBS, *batch)`` — limb axis FIRST so the batch rides the TPU lane
dimension.  Elements are stored in **Montgomery form** (factor R = 2^264)
and kept in the *loose* range [0, 2p) with every limb < 2^12.

This module is the TPU-native replacement for the reference's L1 field
kernels (src/big_num/limbs.rs, montgomery.rs, delayed_reduction.rs): the
BMI2/ADX 4x64 multiply-accumulate becomes an unrolled 22x22 schoolbook of
int32 vector multiplies, and the 576-bit delayed-reduction accumulator
becomes a 45-column int32 accumulator with a parallel carry step per
product (see WideAcc).

Everything here is pure JAX and jit-safe; it runs identically on CPU
(tests) and TPU (production).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .constants import LIMB_BITS, LIMB_MASK, NUM_LIMBS, R_BITS, FieldSpec

B = LIMB_BITS
NL = NUM_LIMBS
MASK = LIMB_MASK
I32 = jnp.int32


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
        # indices of nonzero p limbs (skip zero-multiplies in REDC)
        self.p_nz = [(j, int(self.p_limbs[j])) for j in range(NL) if self.p_limbs[j]]
        self.one_mont = _const_limbs(spec.r_mod)
        self.r2 = _const_limbs(spec.r2_mod)
        # from_uniform folding constant: c = 2^252 * R^2 mod p, see from_uniform.
        self.c_uniform = _const_limbs((1 << 252) * spec.r2_mod % p)
        # fixup constant for wide-column reduce: mont(2^12) = 2^12 * R mod p
        self.c_shift12 = _const_limbs((1 << B) * spec.r_mod % p)
        self.zero = np.zeros((NL,), dtype=np.int32)

        # jit the hot entry points (constants close over; cached per instance).
        # Inside larger jitted programs these trace through transparently.
        for name in (
            "add", "sub", "neg", "double", "mont_mul", "mont_sqr",
            "canonical", "to_mont", "from_mont", "is_zero", "eq",
            "inv", "batch_inv", "from_uniform_bytes",
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
        return out.reshape((NL,) + (1,) * len(batch_shape)) * jnp.ones(
            (1,) + tuple(batch_shape), I32
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
        # subtract with borrow
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
    # multiplication
    # ------------------------------------------------------------------
    def _mul_columns(self, a, b) -> list:
        """Schoolbook product columns t[0..2NL-2]; columns < 22 * 2^24."""
        t = [0] * (2 * NL - 1)
        for i in range(NL):
            ai = a[i]
            for j in range(NL):
                prod = ai * b[j]
                t[i + j] = prod if isinstance(t[i + j], int) else t[i + j] + prod
        return t

    def _redc(self, t: list) -> list:
        """Interleaved Montgomery reduction of product columns.

        Consumes 2NL-1 columns (each < ~2^30), returns NL normalized limbs.
        Result < a*b/R + p; for inputs < 2p this is < 2p.
        """
        t = list(t) + [0, 0]
        inv = self.mont_inv
        for i in range(NL):
            m = (t[i] * inv) & MASK
            for j, pj in self.p_nz:
                t[i + j] = t[i + j] + m * pj
            t[i + 1] = t[i + 1] + (t[i] >> B)
        out = self._carry_list(t[NL : 2 * NL + 1], NL)
        return out

    def mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product a*b*R^{-1}; loose in, loose out."""
        al = [a[i] for i in range(NL)]
        bl = [b[i] for i in range(NL)]
        t = self._mul_columns(al, bl)
        return jnp.stack(self._redc(t))

    def mont_sqr(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, a)

    def mul_const(self, a: jnp.ndarray, c_mont: int) -> jnp.ndarray:
        """Multiply by a host constant given in Montgomery form."""
        cl = _const_limbs(c_mont)
        al = [a[i] for i in range(NL)]
        t = [0] * (2 * NL - 1)
        for j in range(NL):
            cj = int(cl[j])
            if cj == 0:
                continue
            for i in range(NL):
                v = al[i] * cj
                t[i + j] = v if isinstance(t[i + j], int) else t[i + j] + v
        return jnp.stack(self._redc(t))

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
        return self.mont_mul(a_canonical, jnp.asarray(self.r2, I32).reshape(
            (NL,) + (1,) * (a_canonical.ndim - 1)
        ))

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        """Montgomery form -> canonical integer limbs in [0, p)."""
        one = jnp.zeros_like(a).at[0].set(1)
        v = self.mont_mul(a, one)
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

        Uses a fori_loop square-and-multiply (compiles one sqr+mul body,
        iterates over the exponent bits at runtime) to keep graphs small.
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
        """Montgomery-trick batch inversion along a batch axis.

        Zero entries are mapped to zero (like the reference's usage where
        zeros are skipped).  Uses one Fermat inversion + 3n muls.
        """
        assert axis == -1
        n = a.shape[-1]
        is_z = self.is_zero(a)
        one_full = self.const(self.spec.r_mod, a.shape[1:])
        safe = jnp.where(is_z[None, ...], one_full, a)
        # prefix products (sequential over n — use only for moderate n)
        acc = None
        accs = []
        for i in range(n):
            ai = safe[..., i]
            acc = ai if acc is None else self.mont_mul(acc, ai)
            accs.append(acc)
        total_inv = self.inv(accs[-1])
        outs = [None] * n
        run = total_inv
        for i in range(n - 1, -1, -1):
            if i == 0:
                outs[0] = run
            else:
                outs[i] = self.mont_mul(run, accs[i - 1])
                run = self.mont_mul(run, safe[..., i])
        out = jnp.stack(outs, axis=-1)
        return jnp.where(is_z[None, ...], jnp.zeros_like(out), out)

    # ------------------------------------------------------------------
    # wide/uniform reduction
    # ------------------------------------------------------------------
    def reduce_wide_limbs(self, t: list, n_in: int, shift_fix: int) -> jnp.ndarray:
        """Reduce an n_in-limb value (normalized limbs) to NL loose limbs.

        Applies generalized REDC eliminating k = n_in - NL limbs, yielding
        value * 2^{-B*k} (mod p).  ``shift_fix`` must be the Montgomery-form
        constant 2^{B*k} * wanted_factor so the caller controls semantics.
        """
        k = n_in - NL
        t = list(t) + [0]
        inv = self.mont_inv
        for i in range(k):
            m = (t[i] * inv) & MASK
            for j, pj in self.p_nz:
                t[i + j] = t[i + j] + m * pj
            t[i + 1] = t[i + 1] + (t[i] >> B)
        out = self._carry_list(t[k : n_in + 1], NL)
        v = jnp.stack(out)
        return self.mul_const(v, shift_fix)

    def from_uniform_bytes(self, data: jnp.ndarray) -> jnp.ndarray:
        """(64, *batch) uint8 little-endian -> Montgomery-form field element.

        Matches host FieldSpec.from_uniform then to_mont: the 512-bit LE
        integer reduced mod p, in Montgomery representation.
        """
        limbs43 = bytes_to_limbs(data, 43)
        t = [limbs43[i] for i in range(43)]
        # eliminate 21 limbs -> factor 2^{-252}; value < 2^512/2^252 + p
        k = 21
        t = t + [0]
        inv = self.mont_inv
        for i in range(k):
            m = (t[i] * inv) & MASK
            for j, pj in self.p_nz:
                t[i + j] = t[i + j] + m * pj
            t[i + 1] = t[i + 1] + (t[i] >> B)
        out = self._carry_list(t[k : 43 + 1], NL)
        v = jnp.stack(out)
        # v = value * 2^{-252}; multiply by c = 2^252 * R^2 so that
        # result = v * c * R^{-1} = value * R  (Montgomery form of value).
        return self.mul_const(v, (1 << 252) * self.spec.r2_mod % self.p)

    # ------------------------------------------------------------------
    # delayed-reduction accumulator
    # ------------------------------------------------------------------
    def acc_new(self, batch_shape) -> list:
        """45-column accumulator for sums of Montgomery products."""
        return [jnp.zeros(batch_shape, I32) for _ in range(2 * NL + 1)]

    def acc_mul_add(self, acc: list, a: jnp.ndarray, b: jnp.ndarray) -> list:
        """acc += a*b (columns), followed by one parallel carry step.

        The parallel carry keeps every column < ~2^29 regardless of how many
        products are accumulated, the TPU analogue of the reference's
        WideLimbs<9> accumulator (src/big_num/delayed_reduction.rs:52-64).
        """
        al = [a[i] for i in range(NL)]
        bl = [b[i] for i in range(NL)]
        t = list(acc)
        for i in range(NL):
            ai = al[i]
            for j in range(NL):
                t[i + j] = t[i + j] + ai * bl[j]
        # parallel carry step: bound columns again
        new = [None] * len(t)
        new[0] = t[0] & MASK
        for i in range(1, len(t)):
            new[i] = (t[i] & MASK) + (t[i - 1] >> B)
        return new

    def acc_reduce(self, acc: list) -> jnp.ndarray:
        """Collapse accumulator to a loose Montgomery element: sum * R^{-1}."""
        # full carry normalize to 46 limbs (value < 2^533 fits with slack)
        t = self._carry_list(acc, 2 * NL + 2)
        n_in = 2 * NL + 2  # 46 limbs
        k = n_in - NL  # eliminate 24 limbs -> factor 2^{-288}
        t = list(t) + [0]
        inv = self.mont_inv
        for i in range(k):
            m = (t[i] * inv) & MASK
            for j, pj in self.p_nz:
                t[i + j] = t[i + j] + m * pj
            t[i + 1] = t[i + 1] + (t[i] >> B)
        out = self._carry_list(t[k : n_in + 1], NL)
        v = jnp.stack(out)
        # fix factor: multiply by 2^{B*k} * ... we want overall factor R^{-1}:
        # v = S * 2^{-B*k}; want S * R^{-1} = v * 2^{B*k} * R^{-1}
        # mul_const(v, c) = v * c * R^{-1}; choose c = 2^{B*k} mod p... then
        # result = S * 2^{-Bk} * 2^{Bk} * R^{-1} = S * R^{-1}.  Correct.
        c = pow(2, B * k, self.p)
        return self.mul_const(v, c)


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
