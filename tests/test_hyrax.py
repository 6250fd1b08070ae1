"""Hyrax PCS tests: commit consistency + full prove/verify round trip.

Mirrors the reference's implicit coverage through the end-to-end SNARK
tests (hyrax has no dedicated unit tests in-reference; the protocol is
exercised via spartan.rs:653-689).
"""

import random

import jax.numpy as jnp
import pytest

from spartan2_tpu.ec.curve import get_curve
from spartan2_tpu.ec.device import DeviceCurve
from spartan2_tpu.errors import SpartanError
from spartan2_tpu.field.constants import get_field
from spartan2_tpu.field.jnp_ops import FieldOps
from spartan2_tpu.field.limbs import ints_to_limbs_np
from spartan2_tpu.pcs.hyrax import HyraxPCS
from spartan2_tpu.polys.multilinear import mle_evaluate_host
from spartan2_tpu.transcript.transcript import Transcript

WIDTH = 4
N = 16  # 4 rows x 4 cols


@pytest.fixture(scope="module")
def pcs():
    curve = get_curve("pallas")
    dc = DeviceCurve(curve)
    fs = FieldOps(get_field("pallas_scalar"))
    return HyraxPCS(curve, dc, fs)


@pytest.fixture(scope="module")
def keys(pcs):
    ck, vk = pcs.setup(b"test-ck", N, WIDTH)
    ck_s, _ = pcs.setup(b"ck_s", 1, 1)
    return ck, vk, ck_s


def det_rng(seed):
    r = random.Random(seed)
    return lambda p: r.randrange(p)


def test_commit_device_matches_host(pcs, keys):
    ck, _, _ = keys
    p = pcs.curve.scalar.modulus
    rng = random.Random(5)
    v = [rng.randrange(p) for _ in range(N)]
    blind = pcs.blind(ck, N, rng=det_rng(1))
    vm = jnp.asarray(ints_to_limbs_np(v, pcs.curve.scalar, mont=True))
    c_dev = pcs.commit(ck, vm, blind)
    c_host = pcs.commit_host(ck, v, blind)
    assert c_dev == c_host

    # small-scalar path
    v_small = [rng.randrange(1 << 60) for _ in range(N)]
    vm = jnp.asarray(ints_to_limbs_np(v_small, pcs.curve.scalar, mont=True))
    c_dev = pcs.commit(ck, vm, blind, is_small=True)
    assert c_dev == pcs.commit_host(ck, v_small, blind)


def test_fold_commitments_partial_matches_full(pcs, keys):
    """Partial fold (data rows via MSM, rest rows from folded blinds)
    equals the full fold when the rest segments are zero
    (hyrax_pc.rs:821-874)."""
    ck, _, _ = keys
    p = pcs.curve.scalar.modulus
    rng = random.Random(9)
    num_data_rows = 2  # rows 2..3 hold zero data -> blind-only
    comms, blinds = [], []
    for k in range(4):
        v = [rng.randrange(p) for _ in range(num_data_rows * WIDTH)]
        v += [0] * (N - len(v))
        blind = pcs.blind(ck, N, rng=det_rng(20 + k))
        vm = jnp.asarray(ints_to_limbs_np(v, pcs.curve.scalar, mont=True))
        comms.append(pcs.commit(ck, vm, blind))
        blinds.append(blind)
    weights = [rng.randrange(p) for _ in range(4)]
    folded_blind = pcs.fold_blinds(blinds, weights)
    full = pcs.fold_commitments(comms, weights)
    partial = pcs.fold_commitments_partial(comms, weights, num_data_rows,
                                           folded_blind, ck)
    assert partial == full
    # num_data_rows == total rows degenerates to the full fold
    assert pcs.fold_commitments_partial(comms, weights, 4, folded_blind,
                                        ck) == full


def test_hyrax_prove_verify(pcs, keys):
    ck, vk, ck_s = keys
    p = pcs.curve.scalar.modulus
    rng = random.Random(7)
    v = [rng.randrange(p) for _ in range(N)]
    blind = pcs.blind(ck, N, rng=det_rng(2))
    vm = jnp.asarray(ints_to_limbs_np(v, pcs.curve.scalar, mont=True))
    comm = pcs.commit(ck, vm, blind)

    point = [rng.randrange(p) for _ in range(4)]  # 16 = 2^4
    eval_v = mle_evaluate_host(pcs.curve.scalar, v, point)
    blind_eval = pcs.blind(ck_s, 1, rng=det_rng(3))
    comm_eval = pcs.commit_host(ck_s, [eval_v], blind_eval)

    tp = Transcript(pcs.curve.scalar, b"test")
    arg = pcs.prove(ck, ck_s, tp, comm, vm, blind, point, comm_eval, blind_eval,
                    rng=det_rng(4))

    tv = Transcript(pcs.curve.scalar, b"test")
    pcs.verify(vk, ck_s, tv, comm, point, comm_eval, arg)

    # wrong evaluation must fail
    bad_eval = (eval_v + 1) % p
    comm_bad = pcs.commit_host(ck_s, [bad_eval], blind_eval)
    tv2 = Transcript(pcs.curve.scalar, b"test")
    with pytest.raises(SpartanError):
        pcs.verify(vk, ck_s, tv2, comm, point, comm_bad, arg)
