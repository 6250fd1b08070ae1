"""End-to-end SpartanSNARK test on the cubic circuit.

Mirrors the reference's test_snark (spartan.rs:590-689): the circuit
proves knowledge of x with x^3 + x + 5 = y, exposing y = 15 as public IO.
"""

import random

import pytest

from spartan2_tpu.errors import SpartanError
from spartan2_tpu.frontend.constraint_system import ONE, Num, lc
from spartan2_tpu.provider.engines import get_engine
from spartan2_tpu.r1cs.shape import SplitR1CSShape
from spartan2_tpu.snark.spartan import SpartanSNARK


class CubicCircuit:
    """x^3 + x + 5 = y with y public (reference spartan.rs:590-652)."""

    def public_values(self):
        return [15]

    def shared(self, cs):
        return []

    def precommitted(self, cs, shared):
        return []

    def num_challenges(self):
        return 0

    def synthesize(self, cs, shared, precommitted, challenges):
        x = Num.alloc(cs, 2)
        x_sq = x.square(cs)
        x_cu = x_sq.mul(cs, x)
        y = Num.alloc(
            cs,
            None if cs.shape_mode else (x_cu.value + x.value + 5) % cs.field.modulus,
        )
        cs.enforce(
            lc((1, x_cu.var), (1, x.var), (5, ONE)),
            lc((1, ONE)),
            lc((1, y.var)),
        )
        y.inputize(cs)


def det_rng(seed):
    r = random.Random(seed)
    return lambda p: r.randrange(p)


@pytest.fixture(scope="module")
def engine():
    return get_engine("PallasHyraxEngine")


def test_shape_and_sat(engine):
    S = SplitR1CSShape.from_circuit(CubicCircuit(), engine.scalar, width=4)
    assert S.num_vars == 4 and S.num_cons == 4
    assert S.num_public == 1 and S.num_challenges == 0
    # z = (W, 1, X): witness (2, 4, 8, 15), public 15
    S.is_sat_host([2, 4, 8, 15, 1, 15])


def test_spartan_snark_end_to_end(engine):
    circuit = CubicCircuit()
    pk, vk = SpartanSNARK.setup(engine, circuit, width=4)
    prep = SpartanSNARK.prep_prove(pk, circuit, rng=det_rng(1))
    proof, prep = SpartanSNARK.prove(pk, circuit, prep, rng=det_rng(2))
    assert SpartanSNARK.verify(proof, vk) == [15]

    # serialization round trip (reference: bincode wire format)
    from spartan2_tpu.utils.serde import (
        spartan_proof_from_bytes,
        spartan_proof_to_bytes,
    )

    blob = spartan_proof_to_bytes(proof, engine)
    proof_rt = spartan_proof_from_bytes(blob, engine)
    assert SpartanSNARK.verify(proof_rt, vk) == [15]

    # reuse the prep state for a second proof (prep_prove caching pattern)
    proof2, _ = SpartanSNARK.prove(pk, circuit, prep, rng=det_rng(3))
    assert SpartanSNARK.verify(proof2, vk) == [15]

    # tampered public value must fail
    proof.U.public_values = [16]
    with pytest.raises(SpartanError):
        SpartanSNARK.verify(proof, vk)


def test_key_and_prep_serialization_roundtrip(engine):
    """setup -> serialize -> reload -> prove with the reloaded keys/prep
    must verify (reference: keys + PrepSNARK derive Serialize,
    spartan.rs:42-124)."""
    from spartan2_tpu.utils.serde import (
        spartan_keys_from_bytes,
        spartan_keys_to_bytes,
        spartan_prep_from_bytes,
        spartan_prep_to_bytes,
    )

    circuit = CubicCircuit()
    pk, vk = SpartanSNARK.setup(engine, circuit, width=4)
    prep = SpartanSNARK.prep_prove(pk, circuit, rng=det_rng(3))

    pk2, vk2 = spartan_keys_from_bytes(spartan_keys_to_bytes(pk), engine)
    assert pk2.vk_digest == pk.vk_digest
    assert pk2.S.sizes() == pk.S.sizes()
    prep2 = spartan_prep_from_bytes(
        spartan_prep_to_bytes(prep, engine), engine, pk2, circuit)
    assert prep2.ps.W == prep.ps.W

    proof, _ = SpartanSNARK.prove(pk2, circuit, prep2, rng=det_rng(4))
    assert SpartanSNARK.verify(proof, vk2) == [15]
