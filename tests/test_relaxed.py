"""Relaxed R1CS + NIFS + relaxed Spartan tests.

Mirrors reference tests: random relaxed instance satisfiability
(r1cs/mod.rs:288-299) and relaxed Spartan prove/verify
(spartan_relaxed.rs:317-359); adds a NIFS fold consistency check.
"""

import random

import pytest

from spartan2_tpu.field.limbs import ints_to_limbs_np
from spartan2_tpu.pcs.hyrax import HyraxBlind
from spartan2_tpu.provider.engines import get_engine
from spartan2_tpu.r1cs.relaxed import (
    NovaNIFS,
    R1CSInstance,
    R1CSShape,
    R1CSWitnessHost,
)
from spartan2_tpu.r1cs.sparse import SparseMatrix
from spartan2_tpu.snark.spartan_relaxed import RelaxedR1CSSpartanProof


def det_rng(seed):
    r = random.Random(seed)
    return lambda p: r.randrange(p)


@pytest.fixture(scope="module")
def setup():
    engine = get_engine("PallasHyraxEngine")
    field = engine.scalar
    n = 4
    diag = SparseMatrix(field, [1] * n, list(range(n)), list(range(n + 1)), n + 1)
    shape = R1CSShape(field, n, n, 0, diag, diag, diag)
    ck, vk_ee = engine.pcs.setup(b"test", max(shape.num_vars, shape.num_cons), 4)
    return engine, shape, ck, vk_ee


def test_random_relaxed_instance_sat(setup):
    engine, shape, ck, _ = setup
    U, W = shape.sample_random_instance_witness(engine.pcs, ck, rng=det_rng(1))
    shape.is_sat_relaxed(U, W)


def test_relaxed_spartan_prove_verify(setup):
    engine, shape, ck, vk_ee = setup
    U, W = shape.sample_random_instance_witness(engine.pcs, ck, rng=det_rng(2))
    tp = engine.transcript(b"test_relaxed_spartan")
    proof = RelaxedR1CSSpartanProof.prove(engine.pcs, shape, ck, U.u, U.X, W, tp)
    tv = engine.transcript(b"test_relaxed_spartan")
    proof.verify(engine.pcs, shape, vk_ee, U, tv)


def test_nifs_fold(setup):
    import jax.numpy as jnp

    engine, shape, ck, _ = setup
    pcs = engine.pcs
    U1, W1 = shape.sample_random_instance_witness(engine.pcs, ck, rng=det_rng(3))

    # regular satisfied instance for z_i^2 = z_i: boolean witness
    Wv = [1, 0, 1, 1]
    r_W2 = pcs.blind(ck, shape.num_vars, rng=det_rng(4))
    vm = jnp.asarray(ints_to_limbs_np(Wv, engine.scalar, mont=True))
    comm_W2 = pcs.commit(ck, vm, r_W2, is_small=True)
    U2 = R1CSInstance(comm_W=comm_W2, X=[])
    W2 = R1CSWitnessHost(W=Wv, r_W=r_W2)

    tp = engine.transcript(b"nifs")
    nifs, W_folded, u_folded, X_folded = NovaNIFS.prove(
        pcs, ck, shape, U1, W1, U2, W2, tp, rng=det_rng(5)
    )
    tv = engine.transcript(b"nifs")
    U_folded = nifs.verify(pcs, engine.scalar, tv, U1, U2)
    assert U_folded.u == u_folded and U_folded.X == X_folded
    shape.is_sat_relaxed(U_folded, W_folded)

    # folded witness must open the folded commitments
    from spartan2_tpu.field.limbs import ints_to_limbs_np as conv

    vmW = jnp.asarray(conv(W_folded.W, engine.scalar, mont=True))
    assert pcs.commit(ck, vmW, W_folded.r_W) == U_folded.comm_W
    vmE = jnp.asarray(conv(W_folded.E, engine.scalar, mont=True))
    assert pcs.commit(ck, vmE, W_folded.r_E) == U_folded.comm_E
