"""End-to-end SpartanZkSNARK test on the cubic circuit
(reference spartan_zk.rs:915-951)."""

import random

import pytest

from spartan2_tpu.errors import SpartanError
from spartan2_tpu.provider.engines import get_engine
from spartan2_tpu.snark.spartan_zk import SpartanZkSNARK

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from test_spartan import CubicCircuit, det_rng  # noqa: E402


@pytest.fixture(scope="module")
def engine():
    return get_engine("PallasHyraxEngine")


def test_spartan_zk_end_to_end(engine):
    circuit = CubicCircuit()
    pk, vk = SpartanZkSNARK.setup(engine, circuit, width=4)
    prep = SpartanZkSNARK.prep_prove(pk, circuit, rng=det_rng(1))
    proof, prep = SpartanZkSNARK.prove(pk, circuit, prep, rng=det_rng(2))
    assert SpartanZkSNARK.verify(proof, vk) == [15]

    from spartan2_tpu.utils.serde import (
        spartan_zk_proof_from_bytes,
        spartan_zk_proof_to_bytes,
    )

    blob = spartan_zk_proof_to_bytes(proof, engine)
    proof_rt = spartan_zk_proof_from_bytes(blob, engine)
    assert SpartanZkSNARK.verify(proof_rt, vk) == [15]

    # prep reuse with rerandomization
    proof2, _ = SpartanZkSNARK.prove(pk, circuit, prep, rng=det_rng(3))
    assert SpartanZkSNARK.verify(proof2, vk) == [15]

    # tampering with the verifier instance must fail
    bad = proof.U_verifier.challenges_per_round[0][0]
    proof.U_verifier.challenges_per_round[0][0] = (bad + 1) % engine.scalar.modulus
    with pytest.raises(SpartanError):
        SpartanZkSNARK.verify(proof, vk)


def test_zk_keys_serialization_roundtrip(engine):
    """keys -> serialize -> reload (digest-checked) -> prove/verify."""
    from spartan2_tpu.utils.serde import (
        spartan_zk_keys_from_bytes,
        spartan_zk_keys_to_bytes,
    )

    circuit = CubicCircuit()
    pk, vk = SpartanZkSNARK.setup(engine, circuit, width=4)
    pk2, vk2 = spartan_zk_keys_from_bytes(spartan_zk_keys_to_bytes(pk), engine)
    assert pk2.vk_digest == pk.vk_digest
    prep = SpartanZkSNARK.prep_prove(pk2, circuit, rng=det_rng(7))
    proof, _ = SpartanZkSNARK.prove(pk2, circuit, prep, rng=det_rng(8))
    assert SpartanZkSNARK.verify(proof, vk2) == [15]
