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


class PrecommittedStepCircuit:
    """y = x^2 + 3 with all per-instance witness in the PRECOMMITTED
    phase (no shared segment — step and core must declare identical
    shared structure since the core's shared witness is reused by every
    step): the rest segment holds only pow2 padding, so the prover takes
    the truncated-rest fold + fold_commitments_partial path
    (neutronnova_zk.rs:1217-1262)."""

    def __init__(self, x: int):
        self.x = x

    def public_values(self):
        return [self.x * self.x + 3]

    def shared(self, cs):
        return []

    def precommitted(self, cs, shared):
        x = Num.alloc(cs, self.x)
        x_sq = x.square(cs)
        y = Num.alloc(cs, None if cs.shape_mode
                      else (x_sq.value + 3) % cs.field.modulus)
        cs.enforce(lc((1, x_sq.var), (3, ONE)), lc((1, ONE)),
                   lc((1, y.var)))
        y.inputize(cs)
        # 6 extra pinned aux: 9 precommitted vars pad to 12 (width 4),
        # off-pow2, so the shape grows a nonempty all-padding rest
        # segment — the truncated fold's target
        for i in range(6):
            t = Num.alloc(cs, i)
            cs.enforce(lc((1, t.var)), lc((1, ONE)), lc((i, ONE)))
        return []

    def num_challenges(self):
        return 0

    def synthesize(self, cs, shared, precommitted, challenges):
        return None


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


def test_neutronnova_seven_steps_truncated_fold():
    """7 steps (pads to 8 — the reference e2e sweeps num_circuits in
    {2,7,32,64}, neutronnova_zk.rs:2479-2501) with an all-precommitted
    step circuit: exercises non-pow2 instance padding AND the
    truncated-rest witness/commitment fold.  Verify recomputes the fold
    the full way, so a wrong partial fold fails the IPA."""
    engine = get_engine("PallasHyraxEngine")
    xs = [2, 3, 5, 7, 11, 13, 17]
    step_circuits = [PrecommittedStepCircuit(x) for x in xs]
    core = CoreCircuit()

    pk, vk = NeutronNovaZkSNARK.setup(engine, step_circuits[0], core,
                                      len(xs), width=4)
    # the shape must actually have an all-padding rest segment, else the
    # truncated path is not on trial
    assert pk.S_step.num_rest_unpadded == 0 and pk.S_step.num_rest > 0
    prep = NeutronNovaZkSNARK.prep_prove(pk, step_circuits, core,
                                         rng=det_rng(3))
    proof, prep = NeutronNovaZkSNARK.prove(pk, step_circuits, core, prep,
                                           rng=det_rng(4))
    pv_steps, pv_core = NeutronNovaZkSNARK.verify(proof, vk, len(xs))
    assert pv_steps == [[x * x + 3] for x in xs]
    assert pv_core == [42]


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


def test_nifs_zero_rho_raises():
    """A zero rho challenge makes the finish_round algebra divide by
    zero; the shared helper must raise the typed error instead
    (neutronnova.py nifs_finish_round; the reference surfaces this as
    SpartanError::DivisionByZero)."""
    from spartan2_tpu.field.constants import get_field
    from spartan2_tpu.snark.neutronnova import (
        nifs_finish_round,
        nifs_update_state,
    )

    field = get_field("pallas_scalar")
    state = {"T_cur": 0, "acc_eq": 1}
    with pytest.raises(SpartanError):
        nifs_finish_round(field, state, 0, 5, 7)
    # and the modulus itself is a zero challenge
    with pytest.raises(SpartanError):
        nifs_finish_round(field, state, field.modulus, 5, 7)
    # sanity: a nonzero rho produces a degree-3 polynomial whose
    # evaluation sum P(0)+P(1) equals the running claim T_cur
    state = {"T_cur": 11, "acc_eq": 3}
    rho = 999331
    coeffs = nifs_finish_round(field, state, rho, 5, 7)
    p = field.modulus
    P0 = coeffs[0]
    P1 = sum(coeffs) % p
    assert (P0 + P1) % p == 11
    nifs_update_state(field, state, coeffs, rho, 17)
    assert state["T_cur"] == (sum(
        c * pow(17, i, p) for i, c in enumerate(coeffs)) % p)
