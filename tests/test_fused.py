"""Fused whole-sum-check kernels vs the per-round reference provers.

The fused provers (sumcheck/fused.py) must be byte-identical on the
wire: same round coefficients, same squeezed challenges, same final
transcript state (which transitively checks every absorbed byte).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spartan2_tpu.field.constants import get_field
from spartan2_tpu.field.jnp_ops import NL, FieldOps
from spartan2_tpu.field.limbs import ints_to_limbs_np, limbs_to_ints
from spartan2_tpu.transcript.device import DeviceTranscript
from spartan2_tpu.sumcheck.prove import SumcheckProverCubicEq, SumcheckProverQuad
from spartan2_tpu.sumcheck.fused import (FusedSumcheckCubicEq,
                                         FusedSumcheckQuad, fused_cubic_ok)

M = 10  # == FUSED_MIN_ROUNDS: smallest size the fused path serves


@pytest.fixture(scope="module")
def ctx():
    spec = get_field("pallas_scalar")
    ops = FieldOps(spec)
    rng = np.random.default_rng(11)
    n = 1 << M

    def rand_f(k):
        return jnp.asarray(ints_to_limbs_np(
            [int(rng.integers(0, 2**63)) % spec.modulus for _ in range(k)],
            spec))

    taus = [int(rng.integers(1, 2**63)) for _ in range(M)]
    return spec, ops, rand_f, taus, n


def _coeffs_eq(spec, per_round_list, stacked):
    st = np.asarray(stacked)
    for j, cj in enumerate(per_round_list):
        v1 = limbs_to_ints(np.asarray(cj), spec, mont=True)
        v2 = limbs_to_ints(st[:, j, :], spec, mont=True)
        assert v1 == v2, f"round {j}: {v1} != {v2}"


def test_fused_cubic_eq_matches_per_round(ctx):
    spec, ops, rand_f, taus, n = ctx
    assert fused_cubic_ok(spec, taus)
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
    spec, ops, rand_f, taus, n = ctx
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


def test_fused_quad_matches_per_round(ctx):
    spec, ops, rand_f, taus, n = ctx
    A, B = rand_f(n), rand_f(n)
    claim = ops.sum_products(A, B)

    td1 = DeviceTranscript(ops, label=b"q")
    co1, _, fin1, _ = SumcheckProverQuad(ops).prove(td1, A, B, claim, M)
    td2 = DeviceTranscript(ops, label=b"q")
    co2, _, fin2, _ = FusedSumcheckQuad(ops).prove(td2, A, B, claim, M)
    assert (np.asarray(td1.state) == np.asarray(td2.state)).all()
    assert td1.round == td2.round
    _coeffs_eq(spec, co1, co2)
    for x1, x2 in zip(fin1, fin2):
        assert limbs_to_ints(np.asarray(x1)[:, None], spec) == \
            limbs_to_ints(np.asarray(x2)[:, None], spec)
