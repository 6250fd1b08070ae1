"""Quickstart: prove knowledge of x with x^3 + x + 5 = 15 in all three
proof systems (reference examples run the same circuit family).

    PYTHONPATH=. python examples/cubic.py
"""

import time

from spartan2_tpu.frontend.constraint_system import ONE, Num, lc
from spartan2_tpu.provider.engines import get_engine
from spartan2_tpu.snark.neutronnova import NeutronNovaZkSNARK
from spartan2_tpu.snark.spartan import SpartanSNARK
from spartan2_tpu.snark.spartan_zk import SpartanZkSNARK


class CubicCircuit:
    """x^3 + x + 5 = y with y public."""

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
        y = Num.alloc(cs, None if cs.shape_mode else
                      (x_cu.value + x.value + 5) % cs.field.modulus)
        cs.enforce(lc((1, x_cu.var), (1, x.var), (5, ONE)),
                   lc((1, ONE)), lc((1, y.var)))
        y.inputize(cs)


def main():
    engine = get_engine("PallasHyraxEngine")
    circuit = CubicCircuit()

    for name, snark in (("SpartanSNARK", SpartanSNARK),
                        ("SpartanZkSNARK", SpartanZkSNARK)):
        pk, vk = snark.setup(engine, circuit, width=4)
        prep = snark.prep_prove(pk, circuit)
        t0 = time.time()
        proof, prep = snark.prove(pk, circuit, prep)
        io = snark.verify(proof, vk)
        print(f"{name}: public IO {io}, prove+verify {time.time()-t0:.2f}s")

    steps = [CubicCircuit() for _ in range(2)]
    pk, vk = NeutronNovaZkSNARK.setup(engine, steps[0], CubicCircuit(), 2,
                                      width=4)
    prep = NeutronNovaZkSNARK.prep_prove(pk, steps, CubicCircuit())
    t0 = time.time()
    proof, prep = NeutronNovaZkSNARK.prove(pk, steps, CubicCircuit(), prep)
    ios, io_core = NeutronNovaZkSNARK.verify(proof, vk, 2)
    print(f"NeutronNovaZkSNARK: step IO {ios}, core IO {io_core}, "
          f"prove+verify {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
