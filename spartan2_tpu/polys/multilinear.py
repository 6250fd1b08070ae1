"""Multilinear polynomials: host evaluation + device bind helpers.

Reference: src/polys/multilinear.rs.  The dense MLE over the boolean
hypercube is stored index-major with variable 0 as the TOP bit (bind order
= top variable first, multilinear.rs:95-164).  On device the evaluation
table is a (NUM_LIMBS, 2^m) Montgomery limb array; binds halve the second
axis.

The reference's lo_eff/hi_eff zero-run tracking (multilinear.rs:36-43)
shrinks per-bind work on sparse tails; on TPU dynamic extents would
break the static shapes XLA needs, so the equivalents here are static:
the inner sum-check's round 0 exploits the known (1, X, 0...) top-half
structure via the num_extra BDDT correction (sumcheck/prove.py
SpartanInnerRound0), and padded constraint rows cost only their nnz in
the SpMV programs.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field.constants import FieldSpec
from ..field.jnp_ops import NL, FieldOps


# ---------------------------------------------------------------------------
# host (canonical python ints)
# ---------------------------------------------------------------------------


def mle_evaluate_host(field: FieldSpec, evals: list[int], r: list[int]) -> int:
    """Evaluate the MLE with evaluation table ``evals`` at point ``r``.

    len(evals) == 2^len(r); r[0] binds the top (most significant) index bit.
    """
    p = field.modulus
    cur = [v % p for v in evals]
    for ri in r:
        half = len(cur) // 2
        cur = [(cur[j] + ri * (cur[half + j] - cur[j])) % p for j in range(half)]
    return cur[0]


def sparse_poly_evaluate_host(
    field: FieldSpec, num_vars: int, entries: list[int], r: list[int]
) -> int:
    """SparsePolynomial::evaluate (multilinear.rs:179-208): the MLE whose
    first ``len(entries)`` hypercube evaluations are ``entries`` and the
    rest are zero, evaluated at ``r`` (len(r) == num_vars).

    Used for the public-IO polynomial (1, X) padded with zeros.
    """
    assert len(r) == num_vars
    p = field.modulus
    acc = 0
    for i, v in enumerate(entries):
        if v % p == 0:
            continue
        # chi_i(r) = prod_j (r_j if bit_j(i) else 1 - r_j); bit 0 = top.
        chi = 1
        for j in range(num_vars):
            bit = (i >> (num_vars - 1 - j)) & 1
            chi = chi * (r[j] if bit else (1 - r[j]) % p) % p
        acc = (acc + v * chi) % p
    return acc


# ---------------------------------------------------------------------------
# device
# ---------------------------------------------------------------------------


def bind_top_device(ops: FieldOps, arr: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """bind_poly_var_top: (NL, n) -> (NL, n/2), a' = lo + r*(hi - lo)."""
    half = arr.shape[1] // 2
    lo, hi = arr[:, :half], arr[:, half:]
    rb = jnp.broadcast_to(r[:, None], (NL, half))
    return ops.add(lo, ops.mont_mul(rb, ops.sub(hi, lo)))


def mle_evaluate_device(ops: FieldOps, table: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Evaluate a (NL, 2^m) device table at the (NL, m) point ``r``."""
    m = r.shape[1]
    assert table.shape[1] == 1 << m
    cur = table
    for j in range(m):
        cur = bind_top_device(ops, cur, r[:, j])
    return cur[:, 0]
