"""Sum-check: device prover vs host verifier (seeded randomness).

Mirrors the reference's sumcheck tests (src/sumcheck.rs:1431-1573): build
random multilinear inputs, prove on device, verify with a fresh host
transcript, and check the final claim against the bound evaluations.
"""

import numpy as np
import jax.numpy as jnp

from spartan2_tpu.field.constants import get_field
from spartan2_tpu.field.jnp_ops import FieldOps
from spartan2_tpu.field.limbs import ints_to_limbs_np, limbs_to_ints
from spartan2_tpu.polys.eq import eq_evals_device, eq_evaluate, eq_evals_host
from spartan2_tpu.polys.univariate import CompressedUniPoly
from spartan2_tpu.sumcheck.prove import SumcheckProverCubic, SumcheckProverQuad
from spartan2_tpu.sumcheck.verify import SumcheckProof
from spartan2_tpu.transcript.device import DeviceTranscript
from spartan2_tpu.transcript.transcript import Transcript

F = get_field("pallas_scalar")
OPS = FieldOps(F)


def _rand(n, seed):
    rng = np.random.default_rng(seed)
    return [int.from_bytes(rng.bytes(40), "little") % F.modulus for _ in range(n)]


def _fetch_scalar(dev):
    return limbs_to_ints(dev, F)[0]


def _proof_from_coeffs(coeff_list):
    polys = []
    for c in coeff_list:
        vals = limbs_to_ints(c, F)  # low-to-high coefficients
        polys.append(CompressedUniPoly(F, [vals[0]] + vals[2:]))
    return SumcheckProof(F, polys)


def test_cubic_sumcheck_end_to_end():
    m = 6
    n = 1 << m
    p = F.modulus

    # synchronized host/device transcripts
    th = Transcript(F, b"sc")
    td = DeviceTranscript(OPS, b"sc")
    taus_host = [th.squeeze(b"t") for _ in range(m)]
    taus_dev = [td.squeeze_mont(b"t") for _ in range(m)]
    assert [_fetch_scalar(t) for t in taus_dev] == taus_host

    a = _rand(n, 1)
    b = _rand(n, 2)
    c = [x * y % p for x, y in zip(a, b)]  # zero-check: claim = 0

    eq = eq_evals_device(OPS, jnp.stack(taus_dev, axis=1))
    # cross-check the device eq table against the host builder
    assert limbs_to_ints(eq, F) == eq_evals_host(F, taus_host)

    A = jnp.asarray(ints_to_limbs_np(a, F))
    B = jnp.asarray(ints_to_limbs_np(b, F))
    C = jnp.asarray(ints_to_limbs_np(c, F))
    claim0 = jnp.asarray(ints_to_limbs_np([0], F))[:, 0]

    prover = SumcheckProverCubic(OPS)
    coeffs, rs_dev, finals, claim = prover.prove(td, eq, A, B, C, claim0)

    proof = _proof_from_coeffs(coeffs)
    final_claim, rs_host = proof.verify(0, m, 3, th)
    assert rs_host == [_fetch_scalar(r) for r in rs_dev]
    assert final_claim == _fetch_scalar(claim)

    ea, eb, ec = (_fetch_scalar(v) for v in finals)
    eq_rx = eq_evaluate(F, taus_host, rs_host)
    assert final_claim == eq_rx * (ea * eb - ec) % p

    # host and device transcripts stay in sync after the protocol
    assert bytes(np.asarray(td.state)) == th.state


def test_cubic_sumcheck_nonzero_claim():
    """Unsatisfied inputs: claim = sum eq*(A*B - C) computed directly."""
    m = 4
    n = 1 << m
    p = F.modulus
    th = Transcript(F, b"sc2")
    td = DeviceTranscript(OPS, b"sc2")
    taus_host = [th.squeeze(b"t") for _ in range(m)]
    for _ in range(m):
        td.squeeze_mont(b"t")

    a, b, c = _rand(n, 3), _rand(n, 4), _rand(n, 5)
    eq_host = eq_evals_host(F, taus_host)
    claim_int = sum(e * (x * y - z) for e, x, y, z in zip(eq_host, a, b, c)) % p

    eq = eq_evals_device(OPS, jnp.asarray(ints_to_limbs_np(taus_host, F)))
    A = jnp.asarray(ints_to_limbs_np(a, F))
    B = jnp.asarray(ints_to_limbs_np(b, F))
    C = jnp.asarray(ints_to_limbs_np(c, F))
    claim0 = jnp.asarray(ints_to_limbs_np([claim_int], F))[:, 0]

    prover = SumcheckProverCubic(OPS)
    coeffs, rs_dev, finals, claim = prover.prove(td, eq, A, B, C, claim0)
    final_claim, rs_host = _proof_from_coeffs(coeffs).verify(claim_int, m, 3, th)
    ea, eb, ec = (_fetch_scalar(v) for v in finals)
    eq_rx = eq_evaluate(F, taus_host, rs_host)
    assert final_claim == eq_rx * (ea * eb - ec) % p


def test_quad_sumcheck_end_to_end():
    m = 5
    n = 1 << m
    p = F.modulus
    th = Transcript(F, b"qsc")
    td = DeviceTranscript(OPS, b"qsc")

    a, b = _rand(n, 6), _rand(n, 7)
    claim_int = sum(x * y for x, y in zip(a, b)) % p

    A = jnp.asarray(ints_to_limbs_np(a, F))
    B = jnp.asarray(ints_to_limbs_np(b, F))
    claim0 = jnp.asarray(ints_to_limbs_np([claim_int], F))[:, 0]

    prover = SumcheckProverQuad(OPS)
    coeffs, rs_dev, finals, claim = prover.prove(td, A, B, claim0, m)

    final_claim, rs_host = _proof_from_coeffs(coeffs).verify(claim_int, m, 2, th)
    assert rs_host == [_fetch_scalar(r) for r in rs_dev]
    ea, eb = (_fetch_scalar(v) for v in finals)
    assert final_claim == ea * eb % p
    assert final_claim == _fetch_scalar(claim)


def test_gruen_eq_split_matches_explicit_eq_zero_check():
    """SumcheckProverCubicEq must be byte-identical to SumcheckProverCubic
    on a satisfied (zero-check) instance: same round coefficients, same
    challenges, same transcript state (sumcheck.rs:920-1428 computes the
    same messages faster)."""
    from spartan2_tpu.sumcheck.prove import SumcheckProverCubicEq

    m = 6
    n = 1 << m
    p = F.modulus
    th = Transcript(F, b"gr")
    td1 = DeviceTranscript(OPS, b"gr")
    td2 = DeviceTranscript(OPS, b"gr")
    taus_host = [th.squeeze(b"t") for _ in range(m)]
    for td in (td1, td2):
        for _ in range(m):
            td.squeeze_mont(b"t")

    a = _rand(n, 11)
    b = _rand(n, 12)
    c = [x * y % p for x, y in zip(a, b)]

    A = jnp.asarray(ints_to_limbs_np(a, F))
    B = jnp.asarray(ints_to_limbs_np(b, F))
    C = jnp.asarray(ints_to_limbs_np(c, F))
    claim0 = jnp.asarray(ints_to_limbs_np([0], F))[:, 0]

    eq = eq_evals_device(OPS, jnp.asarray(ints_to_limbs_np(taus_host, F)))
    c1, r1, f1, cl1 = SumcheckProverCubic(OPS).prove(td1, eq, A, B, C, claim0)
    c2, r2, f2, cl2 = SumcheckProverCubicEq(OPS).prove(
        td2, A, B, C, claim0, taus_host, F, zero_check=True)

    for x, y in zip(c1, c2):
        assert limbs_to_ints(x, F) == limbs_to_ints(y, F)
    assert [_fetch_scalar(x) for x in r1] == [_fetch_scalar(x) for x in r2]
    assert [_fetch_scalar(x) for x in f1] == [_fetch_scalar(x) for x in f2]
    assert _fetch_scalar(cl1) == _fetch_scalar(cl2)
    assert bytes(np.asarray(td1.state)) == bytes(np.asarray(td2.state))


def test_gruen_eq_split_nonzero_claim_and_odd_m():
    """Non-zero-check path with odd m (uneven left/right split)."""
    from spartan2_tpu.sumcheck.prove import SumcheckProverCubicEq

    m = 5
    n = 1 << m
    p = F.modulus
    th = Transcript(F, b"gr2")
    td = DeviceTranscript(OPS, b"gr2")
    taus_host = [th.squeeze(b"t") for _ in range(m)]
    for _ in range(m):
        td.squeeze_mont(b"t")

    a, b, c = _rand(n, 13), _rand(n, 14), _rand(n, 15)
    eq_host = eq_evals_host(F, taus_host)
    claim_int = sum(e * (x * y - z) for e, x, y, z in zip(eq_host, a, b, c)) % p

    A = jnp.asarray(ints_to_limbs_np(a, F))
    B = jnp.asarray(ints_to_limbs_np(b, F))
    C = jnp.asarray(ints_to_limbs_np(c, F))
    claim0 = jnp.asarray(ints_to_limbs_np([claim_int], F))[:, 0]

    coeffs, rs_dev, finals, claim = SumcheckProverCubicEq(OPS).prove(
        td, A, B, C, claim0, taus_host, F)
    final_claim, rs_host = _proof_from_coeffs(coeffs).verify(claim_int, m, 3, th)
    assert rs_host == [_fetch_scalar(r) for r in rs_dev]
    ea, eb, ec = (_fetch_scalar(v) for v in finals)
    eq_rx = eq_evaluate(F, taus_host, rs_host)
    assert final_claim == eq_rx * (ea * eb - ec) % p
    assert bytes(np.asarray(td.state)) == th.state


def test_gruen_eq_split_zero_tau_fallback():
    """Forced tau == 0 rounds execute the Gruen fallback (third-sum
    t(-1), sumcheck.rs:1326-1396 / prove.py _round_body fallback) and
    stay byte-identical to the explicit-eq prover.  Zero taus never
    arise from an honest transcript but the verifier cannot rule them
    out, so the path must be exercised."""
    from spartan2_tpu.sumcheck.prove import SumcheckProverCubicEq

    m = 5
    n = 1 << m
    p = F.modulus
    taus_host = [0, 987654321, 0, 13, 0]  # zeros in two-level AND tail rounds

    td1 = DeviceTranscript(OPS, b"grz")
    td2 = DeviceTranscript(OPS, b"grz")

    a, b, c = _rand(n, 21), _rand(n, 22), _rand(n, 23)
    eq_host = eq_evals_host(F, taus_host)
    claim_int = sum(e * (x * y - z)
                    for e, x, y, z in zip(eq_host, a, b, c)) % p

    A = jnp.asarray(ints_to_limbs_np(a, F))
    B = jnp.asarray(ints_to_limbs_np(b, F))
    C = jnp.asarray(ints_to_limbs_np(c, F))
    claim0 = jnp.asarray(ints_to_limbs_np([claim_int], F))[:, 0]

    eq = eq_evals_device(OPS, jnp.asarray(ints_to_limbs_np(taus_host, F)))
    c1, r1, f1, cl1 = SumcheckProverCubic(OPS).prove(
        td1, eq, A, B, C, claim0)
    c2, r2, f2, cl2 = SumcheckProverCubicEq(OPS).prove(
        td2, A, B, C, claim0, taus_host, F)

    for x, y in zip(c1, c2):
        assert limbs_to_ints(x, F) == limbs_to_ints(y, F)
    assert [_fetch_scalar(x) for x in r1] == [_fetch_scalar(x) for x in r2]
    assert [_fetch_scalar(x) for x in f1] == [_fetch_scalar(x) for x in f2]
    assert _fetch_scalar(cl1) == _fetch_scalar(cl2)
    assert bytes(np.asarray(td1.state)) == bytes(np.asarray(td2.state))
