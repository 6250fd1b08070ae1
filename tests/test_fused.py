"""Fused whole-sum-check kernels vs the per-round reference provers.

The fused provers (sumcheck/fused.py) must be byte-identical on the
wire: same round coefficients, same squeezed challenges, same final
transcript state (which transitively checks every absorbed byte).

Boundary coverage (round-4 verdict weak #6): sizes at/above the
FUSED_MIN_ROUNDS threshold and both phase-A/phase-B parities (even m:
fh = m/2; odd m: fh = (m-1)/2 — the flattened phase-B head shape
differs), the peeled zero-structure path, and the tau in {0, 1}
fallback predicate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spartan2_tpu.field.constants import get_field
from spartan2_tpu.field.jnp_ops import NL, FieldOps
from spartan2_tpu.field.limbs import ints_to_limbs_np, limbs_to_ints
from spartan2_tpu.transcript.device import DeviceTranscript
from spartan2_tpu.sumcheck.prove import SumcheckProverCubicEq, SumcheckProverQuad
from spartan2_tpu.sumcheck.fused import (FUSED_MIN_ROUNDS,
                                         FusedSumcheckCubicEq,
                                         FusedSumcheckQuad, fused_cubic_ok)

M = 10  # == FUSED_MIN_ROUNDS: smallest size the fused path serves
assert M == FUSED_MIN_ROUNDS


@pytest.fixture(scope="module")
def ctx():
    spec = get_field("pallas_scalar")
    ops = FieldOps(spec)
    rng = np.random.default_rng(11)

    def rand_f(k):
        return jnp.asarray(ints_to_limbs_np(
            [int(rng.integers(0, 2**63)) % spec.modulus for _ in range(k)],
            spec))

    def taus_for(m):
        r2 = np.random.default_rng(1000 + m)
        return [int(r2.integers(1, 2**63)) for _ in range(m)]

    return spec, ops, rand_f, taus_for


def _coeffs_eq(spec, per_round_list, stacked):
    st = np.asarray(stacked)
    for j, cj in enumerate(per_round_list):
        v1 = limbs_to_ints(np.asarray(cj), spec, mont=True)
        v2 = limbs_to_ints(st[:, j, :], spec, mont=True)
        assert v1 == v2, f"round {j}: {v1} != {v2}"


# m = threshold and threshold+1 cover both phase-A/phase-B parities
# (fh = m//2 changes which phase the transition round lands in)
@pytest.mark.parametrize("m", [M, M + 1])
def test_fused_cubic_eq_matches_per_round(ctx, m):
    spec, ops, rand_f, taus_for = ctx
    taus = taus_for(m)
    assert fused_cubic_ok(spec, taus)
    n = 1 << m
    A, B, C = rand_f(n), rand_f(n), rand_f(n)
    claim = rand_f(1)[:, 0]

    td1 = DeviceTranscript(ops, label=b"t")
    co1, _, fin1, _ = SumcheckProverCubicEq(ops).prove(
        td1, A, B, C, claim, taus, spec, zero_check=False)
    td2 = DeviceTranscript(ops, label=b"t")
    co2, _, fin2, _ = FusedSumcheckCubicEq(ops).prove(
        td2, A, B, C, claim, taus, spec, zero_check=False)

    assert (np.asarray(td1.state) == np.asarray(td2.state)).all()
    assert td1.round == td2.round
    _coeffs_eq(spec, co1, co2)
    for x1, x2 in zip(fin1, fin2):
        assert limbs_to_ints(np.asarray(x1)[:, None], spec) == \
            limbs_to_ints(np.asarray(x2)[:, None], spec)


def test_fused_cubic_eq_zero_check(ctx):
    """Satisfied-R1CS shape: the fused kernel computes the round-0 t(0)
    sum the per-round prover skips; bytes must still match."""
    spec, ops, rand_f, taus_for = ctx
    taus = taus_for(M)
    n = 1 << M
    A, B = rand_f(n), rand_f(n)
    C = ops.mont_mul(A, B)
    z = jnp.zeros((NL,), jnp.int32)

    td1 = DeviceTranscript(ops, label=b"z")
    co1, _, _, _ = SumcheckProverCubicEq(ops).prove(
        td1, A, B, C, z, taus, spec, zero_check=True)
    td2 = DeviceTranscript(ops, label=b"z")
    co2, _, _, _ = FusedSumcheckCubicEq(ops).prove(
        td2, A, B, C, z, taus, spec, zero_check=True)
    assert (np.asarray(td1.state) == np.asarray(td2.state)).all()
    _coeffs_eq(spec, co1, co2)


@pytest.mark.parametrize("zero_check", [False, True])
def test_fused_cubic_eq_peeled(ctx, zero_check):
    """prove_peeled (static zero-structure round 0 + half-grid rest,
    reference hi_eff tracking) vs the per-round oracle: inputs zero at
    indices >= eff, eff strictly between 2^(m-1) and 2^m."""
    spec, ops, rand_f, taus_for = ctx
    m = M + 1
    taus = taus_for(m)
    n = 1 << m
    eff = (1 << (m - 1)) + (1 << (m - 1)) // 3  # ~0.67 * n, off-bucket
    mask = (jnp.arange(n) < eff).astype(jnp.int32)
    A, B = rand_f(n) * mask, rand_f(n) * mask
    if zero_check:
        C = ops.mont_mul(A, B)
        claim = jnp.zeros((NL,), jnp.int32)
    else:
        C = rand_f(n) * mask
        claim = rand_f(1)[:, 0]

    fp = FusedSumcheckCubicEq(ops)
    assert fp.peel_ok(spec, taus, eff)
    td1 = DeviceTranscript(ops, label=b"p")
    co1, _, fin1, _ = SumcheckProverCubicEq(ops).prove(
        td1, A, B, C, claim, taus, spec, zero_check=zero_check)
    td2 = DeviceTranscript(ops, label=b"p")
    co2, _, fin2, _ = fp.prove_peeled(
        td2, A, B, C, claim, taus, spec, eff, zero_check=zero_check)
    assert (np.asarray(td1.state) == np.asarray(td2.state)).all()
    assert td1.round == td2.round
    _coeffs_eq(spec, co1, co2)
    for x1, x2 in zip(fin1, fin2):
        assert limbs_to_ints(np.asarray(x1)[:, None], spec) == \
            limbs_to_ints(np.asarray(x2)[:, None], spec)


def test_fused_fallback_predicates(ctx):
    """tau == 0 / tau == 1 make the scaling trick ill-defined; the
    predicate must reject them so callers take the per-round fallback
    (which has its own tested tau==0 third-sum path)."""
    spec, ops, rand_f, taus_for = ctx
    good = taus_for(M)
    assert fused_cubic_ok(spec, good)
    assert not fused_cubic_ok(spec, [0] + good[1:])
    assert not fused_cubic_ok(spec, [1] + good[1:])
    assert not fused_cubic_ok(spec, good[:M - 1])  # below threshold
    fp = FusedSumcheckCubicEq(ops)
    n = 1 << M
    assert not fp.peel_ok(spec, good, n)          # no zero tail
    assert not fp.peel_ok(spec, good, n // 2)     # eff <= half


@pytest.mark.parametrize("m", [M, M + 1])
def test_fused_quad_matches_per_round(ctx, m):
    spec, ops, rand_f, taus_for = ctx
    n = 1 << m
    A, B = rand_f(n), rand_f(n)
    claim = ops.sum_products(A, B)

    td1 = DeviceTranscript(ops, label=b"q")
    co1, _, fin1, _ = SumcheckProverQuad(ops).prove(td1, A, B, claim, m)
    td2 = DeviceTranscript(ops, label=b"q")
    co2, _, fin2, _ = FusedSumcheckQuad(ops).prove(td2, A, B, claim, m)
    assert (np.asarray(td1.state) == np.asarray(td2.state)).all()
    assert td1.round == td2.round
    _coeffs_eq(spec, co1, co2)
    for x1, x2 in zip(fin1, fin2):
        assert limbs_to_ints(np.asarray(x1)[:, None], spec) == \
            limbs_to_ints(np.asarray(x2)[:, None], spec)
