"""NeutronNova end-to-end: fold N step circuits + core, prove, verify.

Mirrors the reference's e2e sweep (neutronnova_zk.rs:2479-2501) at toy
scale; num_steps=3 exercises non-power-of-two padding.
"""

import random

import pytest

from spartan2_tpu.errors import SpartanError
from spartan2_tpu.frontend.constraint_system import ONE, Num, lc
from spartan2_tpu.provider.engines import get_engine
from spartan2_tpu.snark.neutronnova import NeutronNovaZkSNARK


class SquareStepCircuit:
    """Proves y = x^2 + 3 with y public; x differs per instance."""

    def __init__(self, x: int):
        self.x = x

    def public_values(self):
        return [self.x * self.x + 3]

    def shared(self, cs):
        return []

    def precommitted(self, cs, shared):
        return []

    def num_challenges(self):
        return 0

    def synthesize(self, cs, shared, precommitted, challenges):
        x = Num.alloc(cs, self.x)
        x_sq = x.square(cs)
        y = Num.alloc(cs, None if cs.shape_mode else (x_sq.value + 3) % cs.field.modulus)
        cs.enforce(lc((1, x_sq.var), (3, ONE)), lc((1, ONE)), lc((1, y.var)))
        y.inputize(cs)


class CoreCircuit:
    """y = a * b with y public."""

    def public_values(self):
        return [42]

    def shared(self, cs):
        return []

    def precommitted(self, cs, shared):
        return []

    def num_challenges(self):
        return 0

    def synthesize(self, cs, shared, precommitted, challenges):
        a = Num.alloc(cs, 6)
        b = Num.alloc(cs, 7)
        y = a.mul(cs, b)
        y.inputize(cs)


def det_rng(seed):
    r = random.Random(seed)
    return lambda p: r.randrange(p)


def test_neutronnova_end_to_end():
    engine = get_engine("PallasHyraxEngine")
    num_steps = 3  # pads to 4: exercises instance padding
    step_circuits = [SquareStepCircuit(x) for x in (2, 5, 11)]
    core = CoreCircuit()

    pk, vk = NeutronNovaZkSNARK.setup(engine, step_circuits[0], core,
                                      num_steps, width=4)
    prep = NeutronNovaZkSNARK.prep_prove(pk, step_circuits, core,
                                         rng=det_rng(1))
    proof, prep = NeutronNovaZkSNARK.prove(pk, step_circuits, core, prep,
                                           rng=det_rng(2))
    pv_steps, pv_core = NeutronNovaZkSNARK.verify(proof, vk, num_steps)
    assert pv_steps == [[7], [28], [124]]
    assert pv_core == [42]

    from spartan2_tpu.utils.serde import (
        neutronnova_proof_from_bytes,
        neutronnova_proof_to_bytes,
    )

    blob = neutronnova_proof_to_bytes(proof, engine)
    proof_rt = neutronnova_proof_from_bytes(blob, engine)
    pv_steps2, pv_core2 = NeutronNovaZkSNARK.verify(proof_rt, vk, num_steps)
    assert pv_steps2 == pv_steps and pv_core2 == pv_core

    # tampering with a step public value must fail
    proof.step_instances[1].public_values = [29]
    with pytest.raises(SpartanError):
        NeutronNovaZkSNARK.verify(proof, vk, num_steps)


def test_nn_keys_and_prep_serialization_roundtrip():
    """setup/prep -> serialize -> reload -> prove/verify (reference: all
    keys + PrepSNARK derive Serialize)."""
    from spartan2_tpu.utils.serde import (
        neutronnova_keys_from_bytes,
        neutronnova_keys_to_bytes,
        neutronnova_prep_from_bytes,
        neutronnova_prep_to_bytes,
    )

    engine = get_engine("PallasHyraxEngine")
    steps = [SquareStepCircuit(2), SquareStepCircuit(5)]
    core = CoreCircuit()
    pk, vk = NeutronNovaZkSNARK.setup(engine, steps[0], core, 2, width=4)
    prep = NeutronNovaZkSNARK.prep_prove(pk, steps, core, rng=det_rng(11))

    pk2, vk2 = neutronnova_keys_from_bytes(
        neutronnova_keys_to_bytes(pk, 2), engine)
    assert pk2.vk_digest == pk.vk_digest
    prep2 = neutronnova_prep_from_bytes(
        neutronnova_prep_to_bytes(prep, engine), engine, pk2, steps, core)
    assert prep2.ps_core.W == prep.ps_core.W
    assert [p.W for p in prep2.ps_step] == [p.W for p in prep.ps_step]

    proof, _ = NeutronNovaZkSNARK.prove(pk2, steps, core, prep2,
                                        rng=det_rng(12))
    step_io, core_io = NeutronNovaZkSNARK.verify(proof, vk2, 2)
    assert step_io == [[7], [28]] and core_io == [42]
