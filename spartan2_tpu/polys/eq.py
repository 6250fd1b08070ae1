"""Equality and power polynomials: host evaluators + device table builders.

Reference: src/polys/eq.rs (eq tables via doubling) and src/polys/power.rs
(pow split-evals outer product).  On device, the table build is a static
doubling loop of batched Montgomery multiplies — one mont_mul per produced
entry, perfectly lane-parallel.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from ..field.constants import FieldSpec
from ..field.jnp_ops import NL, FieldOps


# ---------------------------------------------------------------------------
# host (python ints)
# ---------------------------------------------------------------------------


def eq_evaluate(field: FieldSpec, r: list[int], rx: list[int]) -> int:
    p = field.modulus
    acc = 1
    for a, b in zip(r, rx):
        acc = acc * (a * b + (1 - a) * (1 - b)) % p
    return acc


def eq_evals_host(field: FieldSpec, r: list[int]) -> list[int]:
    """All 2^len(r) evaluations, index bit order: r[0] is the TOP bit."""
    p = field.modulus
    evals = [1]
    for ri in reversed(r):
        hi = [v * ri % p for v in evals]
        lo = [(v - h) % p for v, h in zip(evals, hi)]
        evals = lo + hi
    return evals


def pow_split_evals_host(field: FieldSpec, t: int, ell: int,
                         len_left: int, len_right: int) -> tuple[list[int], list[int]]:
    """PowPolynomial::split_evals (power.rs:65-86): left = t^i, right = t^{i*len_left}."""
    p = field.modulus
    assert len_left * len_right == 1 << ell
    left = [1] * len_left
    for i in range(1, len_left):
        left[i] = left[i - 1] * t % p
    step = left[-1] * t % p
    right = [1] * len_right
    for i in range(1, len_right):
        right[i] = right[i - 1] * step % p
    return left, right


def pow_evaluate(field: FieldSpec, t: int, r: list[int]) -> int:
    """Evaluate the MLE of the table [t^k for k in 0..2^ell) at point r
    (PowPolynomial::evaluate, power.rs:34-50).

    With our bind convention (r[0] binds the TOP index bit), coordinate i
    carries weight 2^(ell-1-i): result = prod_i (1 + (t^(2^(ell-1-i)) - 1) * r[i]).
    """
    p = field.modulus
    ell = len(r)
    acc = 1
    for i, ri in enumerate(r):
        tpow = pow(t, 1 << (ell - 1 - i), p)
        acc = acc * (1 + (tpow - 1) * ri) % p
    return acc


# ---------------------------------------------------------------------------
# device
# ---------------------------------------------------------------------------


def eq_evals_device(ops: FieldOps, r: jnp.ndarray) -> jnp.ndarray:
    """Build the (NL, 2^m) eq table on device from (NL, m) points.

    Index convention matches the reference (eq.rs:59-92): entry index i has
    r[0] as its most-significant bit.
    """
    m = r.shape[1]
    evals = ops.const(ops.spec.r_mod, (1,))  # [ONE]
    for j in range(m - 1, -1, -1):
        rj = r[:, j : j + 1]
        size = evals.shape[1]
        rj_b = jnp.broadcast_to(rj, (NL, size))
        hi = ops.mont_mul(evals, rj_b)
        lo = ops.sub(evals, hi)
        evals = jnp.concatenate([lo, hi], axis=1)
    return evals


def pow_evals_device(ops: FieldOps, g: jnp.ndarray) -> jnp.ndarray:
    """Build the (NL, 2^ell) power table [t^k] on device from the
    (NL, ell) stack of Montgomery generator powers g[:, j] = t^(2^(ell-1-j))
    (PowPolynomial, power.rs:18-31: same doubling structure as the eq
    table but with lo factor 1).  Entry k's bit ell-1-j selects whether
    g[:, j] multiplies in, so table[k] = t^k with k's MSB driven by
    g[:, 0] — matching pow_evaluate's bind convention."""
    ell = g.shape[1]
    evals = ops.const(ops.spec.r_mod, (1,))  # [ONE]
    for j in range(ell - 1, -1, -1):
        gj = jnp.broadcast_to(g[:, j : j + 1], evals.shape)
        evals = jnp.concatenate([evals, ops.mont_mul(evals, gj)], axis=1)
    return evals


@functools.lru_cache(maxsize=None)
def _eq_table_jit(ops: FieldOps):
    from ..utils.jitcache import cached_jit

    return cached_jit(lambda r: eq_evals_device(ops, r),
                      fastkey=("eq_table", ops.spec.name))


@functools.lru_cache(maxsize=None)
def _pow_table_jit(ops: FieldOps):
    from ..utils.jitcache import cached_jit

    return cached_jit(lambda g: pow_evals_device(ops, g),
                      fastkey=("pow_table", ops.spec.name))


def pow_evals_device_oneshot(ops: FieldOps, g: jnp.ndarray) -> jnp.ndarray:
    """Power table build as ONE jitted dispatch (ell Montgomery scalars
    uploaded instead of the 2^ell host-side table the NeutronNova NIFS
    previously converted and shipped per prove)."""
    return _pow_table_jit(ops)(g)


def eq_evals_device_oneshot(ops: FieldOps, r: jnp.ndarray) -> jnp.ndarray:
    """eq table build as ONE jitted dispatch.  The eager loop above costs
    ~3 tunnel dispatches per variable (~60 for a 2^20 table) plus an
    unfused device op per step; standalone callers should use this."""
    return _eq_table_jit(ops)(r)
