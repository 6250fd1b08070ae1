"""SpartanZkSNARK: zero-knowledge via Nova folding against a random
relaxed instance.

Reference: src/spartan_zk.rs.  The prover runs the non-ZK Spartan
protocol, but every sum-check round's polynomial becomes witness of the
SpartanVerifierCircuit, committed round-by-round via process_round
(Fiat-Shamir through the VC commitments); the verifier-circuit instance
is then hidden by folding with a random relaxed instance (NIFS) and
proved with a small relaxed-Spartan proof; a final PCS argument opens
the ORIGINAL witness against the eval_W commit round.

The sum-check evaluation sums run on device (sumcheck/zk_device.py):
the per-round VC commit forces a host round trip anyway, so each round
is one fused device step plus a small scalar pull; the original
host-side path is kept under SPARTAN2_ZK_HOST=1 for cross-testing.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import jax.numpy as jnp

from ..errors import DivisionByZeroError, ProofVerifyError, SpartanError
from ..field.jnp_ops import NL
from ..field.limbs import ints_to_limbs_np
from ..polys.eq import eq_evals_device, eq_evals_host, eq_evaluate
from ..polys.multilinear import sparse_poly_evaluate_host
from ..polys.univariate import UniPoly
from ..provider.engines import Engine
from ..r1cs.multiround import MultiRoundState, SplitMultiRoundR1CSInstance, SplitMultiRoundR1CSShape
from ..r1cs.relaxed import NovaNIFS, RelaxedR1CSInstance
from ..r1cs.shape import SplitR1CSInstance, SplitR1CSShape
from ..sumcheck.host import prove_cubic_with_three_inputs, prove_quad
from ..sumcheck.zk_device import (
    get_zk_cubic,
    get_zk_inner_round0,
    get_zk_quad,
)
from ..snark.spartan import (
    PrecommittedState,
    SpartanPrepSNARK,
    r1cs_instance_and_witness,
    shared_witness,
    precommitted_witness,
)
from ..snark.spartan_relaxed import RelaxedR1CSSpartanProof, _bind_matrix_row_vars
from ..snark.zk_circuits import SpartanVerifierCircuit
from ..utils.digest import vk_digest


def _log2(n: int) -> int:
    assert n & (n - 1) == 0 and n > 0
    return n.bit_length() - 1


@dataclass
class SpartanZkProverKey:
    engine: Engine
    S: SplitR1CSShape
    ck: object
    vc_shape: SplitMultiRoundR1CSShape
    vc_shape_regular: object
    vc_ck: object
    vk_digest: bytes


@dataclass
class SpartanZkVerifierKey:
    engine: Engine
    S: SplitR1CSShape
    vk_ee: object
    vc_shape: SplitMultiRoundR1CSShape
    vc_shape_regular: object
    vc_ck: object
    vc_vk: object
    digest: bytes


@dataclass
class SpartanZkSNARKProof:
    U: SplitR1CSInstance
    U_verifier: SplitMultiRoundR1CSInstance
    random_U: RelaxedR1CSInstance
    nifs: NovaNIFS
    relaxed_snark: RelaxedR1CSSpartanProof
    eval_arg: object


def rerandomize_in_place(engine: Engine, ps: PrecommittedState,
                         S: SplitR1CSShape, ck, rng=None) -> None:
    """Fresh blinds on the shared/precommitted commitments without
    re-synthesis (bellpepper/r1cs.rs:540-603)."""
    pcs = engine.pcs
    if ps.comm_W_shared is not None:
        new_blind = pcs.blind(ck, S.num_shared, rng=rng)
        ps.comm_W_shared = pcs.rerandomize_commitment(
            ck, ps.comm_W_shared, ps.r_W_shared, new_blind)
        ps.r_W_shared = new_blind
    if ps.comm_W_precommitted is not None:
        new_blind = pcs.blind(ck, S.num_precommitted, rng=rng)
        ps.comm_W_precommitted = pcs.rerandomize_commitment(
            ck, ps.comm_W_precommitted, ps.r_W_precommitted, new_blind)
        ps.r_W_precommitted = new_blind


class SpartanZkSNARK:
    VC_COMMITMENT_WIDTH = 16  # reference spartan_zk.rs:196

    @staticmethod
    def setup(engine: Engine, circuit, width: int = 2048):
        S = SplitR1CSShape.from_circuit(circuit, engine.scalar, width)
        return SpartanZkSNARK.setup_from_shape(engine, S)

    @staticmethod
    def setup_from_shape(engine: Engine, S: SplitR1CSShape):
        """Key construction from a (possibly deserialized) shape — every
        other key component derives deterministically from it
        (spartan_zk.rs:163-232)."""
        width = S.width
        S.attach_device(engine.fs)
        ck, vk_ee = engine.pcs.setup(b"ck", S.num_vars, width)

        num_rounds_x = _log2(S.num_cons)
        num_rounds_y = _log2(S.num_vars) + 1
        vc = SpartanVerifierCircuit(engine.scalar, num_rounds_x, num_rounds_y,
                                    SpartanZkSNARK.VC_COMMITMENT_WIDTH)
        vc_shape = SplitMultiRoundR1CSShape.from_circuit(vc, engine.scalar)
        vc_ck, vc_vk = engine.pcs.setup(b"ck", vc_shape.total_vars,
                                        vc_shape.commitment_width)
        vc_shape_regular = vc_shape.to_regular_shape()

        h = hashlib.sha256()
        h.update(vk_digest(S, ck, ck))
        h.update(vc_shape.A.digest_bytes())
        h.update(vc_shape.B.digest_bytes())
        h.update(vc_shape.C.digest_bytes())
        for pt in vc_ck.ck:
            h.update(engine.curve.point_bytes(pt))
        digest = h.digest()

        pk = SpartanZkProverKey(engine, S, ck, vc_shape, vc_shape_regular,
                                vc_ck, digest)
        vk = SpartanZkVerifierKey(engine, S, vk_ee, vc_shape,
                                  vc_shape_regular, vc_ck, vc_vk, digest)
        return pk, vk

    @staticmethod
    def prep_prove(pk: SpartanZkProverKey, circuit, is_small: bool = False,
                   rng=None) -> SpartanPrepSNARK:
        ps = shared_witness(pk.engine, pk.S, pk.ck, circuit, is_small, rng)
        precommitted_witness(pk.engine, ps, pk.S, pk.ck, circuit, is_small, rng)
        return SpartanPrepSNARK(ps=ps)

    @staticmethod
    def prove(pk: SpartanZkProverKey, circuit, prep: SpartanPrepSNARK,
              is_small: bool = False, rng=None):
        engine = pk.engine
        S = pk.S
        field = engine.scalar
        p = field.modulus
        pcs = engine.pcs

        rerandomize_in_place(engine, prep.ps, S, pk.ck, rng)

        transcript = engine.transcript(b"SpartanZkSNARK")
        transcript.absorb_bytes(b"vk", pk.vk_digest)
        public_values = circuit.public_values()
        transcript.absorb_scalars(b"public_values", public_values)

        U, W = r1cs_instance_and_witness(
            engine, prep.ps, S, pk.ck, circuit, is_small, transcript, rng
        )

        num_vars = S.num_vars
        num_rounds_x = _log2(S.num_cons)
        num_rounds_y = _log2(num_vars) + 1

        taus = [transcript.squeeze(b"t") for _ in range(num_rounds_x)]

        vc = SpartanVerifierCircuit(field, num_rounds_x, num_rounds_y,
                                    pk.vc_shape.commitment_width)
        state = MultiRoundState.initialize(pk.vc_shape)

        use_host = os.environ.get("SPARTAN2_ZK_HOST") == "1" or S._device is None
        if use_host:
            z = W.W_host + [1] + U.public_values + U.challenges
            z += [0] * (2 * num_vars - len(z))
            Az = S.A.multiply_vec_host(z[: S.num_cols])
            Bz = S.B.multiply_vec_host(z[: S.num_cols])
            Cz = S.C.multiply_vec_host(z[: S.num_cols])

            # ---- outer sum-check (FS through VC commitments) ----
            def outer_challenge(i: int, poly: UniPoly) -> int:
                vc.outer_polys[i] = list(poly.coeffs)
                return state.process_round(pcs, pk.vc_ck, vc, i, transcript,
                                           rng)[0]

            _, r_x, claims_outer = prove_cubic_with_three_inputs(
                field, 0, taus, Az, Bz, Cz, challenge_fn=outer_challenge
            )
            vc.claim_Az, vc.claim_Bz, vc.claim_Cz = claims_outer
            vc.tau_at_rx = eq_evaluate(field, taus, r_x)
        else:
            # ---- device outer sum-check (sumcheck.rs:575-644 shape) ----
            ops = engine.fs
            cubic = get_zk_cubic(ops)
            tail_vals = [1] + U.public_values + U.challenges
            tail = jnp.asarray(ints_to_limbs_np(tail_vals, field, mont=True))
            # z at its nonzero width num_cols = num_vars + num_extra: the
            # structured inner round 0 never reads the zero tail
            z_dev = jnp.concatenate([W.W, tail], axis=1)
            Az, Bz, Cz = S.multiply_vec_device(z_dev)
            from ..polys.eq import eq_evals_device_oneshot
            E = eq_evals_device_oneshot(
                ops, jnp.asarray(ints_to_limbs_np(taus, field, mont=True)))

            def outer_challenge_dev(i: int, unis) -> int:
                vc.outer_polys[i] = list(unis[0].coeffs)
                return state.process_round(pcs, pk.vc_ck, vc, i, transcript,
                                           rng)[0]

            r_x, finals_outer, tau_rx = cubic.prove(
                field, [0], E, tuple(v[:, None, :] for v in (Az, Bz, Cz)),
                outer_challenge_dev)
            claims_outer = finals_outer[0]
            vc.claim_Az, vc.claim_Bz, vc.claim_Cz = claims_outer
            vc.tau_at_rx = tau_rx

        chals = state.process_round(pcs, pk.vc_ck, vc, num_rounds_x,
                                    transcript, rng)
        r = chals[0]
        r_sq = r * r % p

        # ---- inner sum-check ----
        claim_inner = (claims_outer[0] + r * claims_outer[1]
                       + r_sq * claims_outer[2]) % p
        num_extra = 1 + S.num_public + S.num_challenges

        if use_host:
            evals_rx = eq_evals_host(field, r_x)
            num_cols = S.num_cols
            eA = _bind_matrix_row_vars(field, S.A, evals_rx, num_cols)
            eB = _bind_matrix_row_vars(field, S.B, evals_rx, num_cols)
            eC = _bind_matrix_row_vars(field, S.C, evals_rx, num_cols)
            poly_ABC = [(a + r * b + r_sq * c) % p
                        for a, b, c in zip(eA, eB, eC)]
            poly_ABC += [0] * (2 * num_vars - len(poly_ABC))

            eval0 = sum(poly_ABC[j] * z[j] for j in range(num_vars)) % p
            corr_low = sum(poly_ABC[j] * z[j] for j in range(num_extra)) % p
            corr_cross = sum(
                (poly_ABC[num_vars + j] - poly_ABC[j]) * (z[num_vars + j] - z[j])
                for j in range(num_extra)
            ) % p
            t_inf = (eval0 - corr_low + corr_cross) % p
            e2 = (2 * claim_inner - 3 * eval0 + 2 * t_inf) % p
            inner_r0 = UniPoly.from_evals_deg2(
                field, [eval0, (claim_inner - eval0) % p, e2])
            vc.inner_polys[0] = list(inner_r0.coeffs)
            r0 = state.process_round(pcs, pk.vc_ck, vc, num_rounds_x + 1,
                                     transcript, rng)[0]
            claim_after_r0 = inner_r0.evaluate(r0)

            one_minus = (1 - r0) % p
            for j in range(num_extra):
                poly_ABC[j] = (poly_ABC[j]
                               + r0 * (poly_ABC[num_vars + j] - poly_ABC[j])) % p
                z[j] = (z[j] + r0 * (z[num_vars + j] - z[j])) % p
            for j in range(num_extra, num_vars):
                poly_ABC[j] = poly_ABC[j] * one_minus % p
                z[j] = z[j] * one_minus % p
            poly_ABC = poly_ABC[:num_vars]
            z = z[:num_vars]

            def inner_challenge(j: int, poly: UniPoly) -> int:
                vc.inner_polys[1 + j] = list(poly.coeffs)
                return state.process_round(pcs, pk.vc_ck, vc,
                                           num_rounds_x + 2 + j, transcript,
                                           rng)[0]

            _, r_y_rest, finals_inner = prove_quad(
                field, claim_after_r0, num_rounds_y - 1, poly_ABC, z,
                challenge_fn=inner_challenge,
            )
            r_y = [r0] + r_y_rest
            eval_Z = finals_inner[1]
        else:
            rx_stack = jnp.asarray(ints_to_limbs_np(r_x, field, mont=True))
            r_mont = jnp.asarray(ints_to_limbs_np([r], field, mont=True))[:, 0]
            abc_dev = S.bind_and_prepare_poly_ABC_device(rx_stack, r_mont)

            round0 = get_zk_inner_round0(ops)
            abc_k = abc_dev[:, None, :]
            z_k = z_dev[:, None, :]
            (eval0, t_inf), = round0.evals(field, abc_k, z_k, num_vars,
                                           num_extra)
            e2 = (2 * claim_inner - 3 * eval0 + 2 * t_inf) % p
            inner_r0 = UniPoly.from_evals_deg2(
                field, [eval0, (claim_inner - eval0) % p, e2])
            vc.inner_polys[0] = list(inner_r0.coeffs)
            r0 = state.process_round(pcs, pk.vc_ck, vc, num_rounds_x + 1,
                                     transcript, rng)[0]
            claim_after_r0 = inner_r0.evaluate(r0)
            abc_k, z_k = round0.bind(field, abc_k, z_k, r0, num_vars,
                                     num_extra)

            def inner_challenge_dev(j: int, unis) -> int:
                vc.inner_polys[1 + j] = list(unis[0].coeffs)
                return state.process_round(pcs, pk.vc_ck, vc,
                                           num_rounds_x + 2 + j, transcript,
                                           rng)[0]

            r_y_rest, finals_inner = get_zk_quad(ops).prove(
                field, [claim_after_r0], (abc_k, z_k), num_rounds_y - 1,
                inner_challenge_dev)
            r_y = [r0] + r_y_rest
            eval_Z = finals_inner[0][1]

        X = U.public_values + U.challenges
        eval_X = sparse_poly_evaluate_host(field, num_rounds_y - 1, [1] + X,
                                           r_y[1:])
        denom = (1 - r_y[0]) % p
        if denom == 0:
            raise DivisionByZeroError("division by zero in eval_W")
        eval_W = (eval_Z - r_y[0] * eval_X) * pow(denom, -1, p) % p

        vc.eval_W = eval_W
        vc.eval_X = eval_X
        state.process_round(pcs, pk.vc_ck, vc, num_rounds_x + 1 + num_rounds_y,
                            transcript, rng)
        eval_w_round = num_rounds_x + 1 + num_rounds_y + 1
        state.process_round(pcs, pk.vc_ck, vc, eval_w_round, transcript, rng)

        U_verifier, W_verifier = state.finalize(pcs)
        U_verifier_regular = U_verifier.to_regular_instance(pcs)
        S_verifier = pk.vc_shape_regular

        random_U, random_W = S_verifier.sample_random_instance_witness(
            pcs, pk.vc_ck, rng=rng)
        nifs, folded_W, folded_u, folded_X = NovaNIFS.prove(
            pcs, pk.vc_ck, S_verifier, random_U, random_W,
            U_verifier_regular, W_verifier, transcript, rng=rng,
        )
        relaxed_snark = RelaxedR1CSSpartanProof.prove(
            pcs, S_verifier, pk.vc_ck, folded_u, folded_X, folded_W, transcript
        )

        comm_W, _ = U.to_regular(pcs)
        eval_arg = pcs.prove(
            pk.ck, pk.vc_ck, transcript, comm_W, W.W, W.r_W, r_y[1:],
            U_verifier.comm_w_per_round[eval_w_round],
            state.r_w_per_round[eval_w_round], rng=rng,
        )

        proof = SpartanZkSNARKProof(
            U=U, U_verifier=U_verifier, random_U=random_U, nifs=nifs,
            relaxed_snark=relaxed_snark, eval_arg=eval_arg,
        )
        return proof, prep

    @staticmethod
    def verify(proof: SpartanZkSNARKProof, vk: SpartanZkVerifierKey) -> list[int]:
        """(spartan_zk.rs:723-838)."""
        engine = vk.engine
        S = vk.S
        field = engine.scalar
        p = field.modulus
        pcs = engine.pcs

        transcript = engine.transcript(b"SpartanZkSNARK")
        transcript.absorb_bytes(b"vk", vk.digest)
        transcript.absorb_scalars(b"public_values", proof.U.public_values)

        proof.U.validate(S, pcs, transcript)

        num_rounds_x = _log2(S.num_cons)
        taus = [transcript.squeeze(b"t") for _ in range(num_rounds_x)]

        proof.U_verifier.validate(vk.vc_shape, pcs, transcript)

        num_vars = S.num_vars
        num_rounds_y = _log2(num_vars) + 1
        U_verifier_regular = proof.U_verifier.to_regular_instance(pcs)

        num_challenges = num_rounds_x + 1 + num_rounds_y
        if len(U_verifier_regular.X) != num_challenges + 3:
            raise ProofVerifyError("verifier instance has wrong public IO size")
        challenges = U_verifier_regular.X[:num_challenges]
        public_values = U_verifier_regular.X[num_challenges:num_challenges + 3]

        r_x = challenges[:num_rounds_x]
        r = challenges[num_rounds_x]
        r_y = challenges[num_rounds_x + 1:]

        eval_A, eval_B, eval_C = S.evaluate_at(r_x, r_y)
        quotient = (eval_A + r * eval_B + r * r * eval_C) % p

        _, X_orig = proof.U.to_regular(pcs)
        eval_X = sparse_poly_evaluate_host(field, _log2(num_vars),
                                           [1] + X_orig, r_y[1:])
        tau_at_rx = eq_evaluate(field, taus, r_x)

        if (public_values[0] != tau_at_rx or public_values[1] != eval_X
                or public_values[2] != quotient):
            raise SpartanError(
                "verifier instance public values do not match recomputed "
                "(tau_at_rx, eval_X, quotient)")

        folded_U = proof.nifs.verify(pcs, field, transcript, proof.random_U,
                                     U_verifier_regular)
        proof.relaxed_snark.verify(pcs, vk.vc_shape_regular, vk.vc_vk,
                                   folded_U, transcript)

        comm_W, _ = proof.U.to_regular(pcs)
        eval_w_round = num_rounds_x + 1 + num_rounds_y + 1
        pcs.verify(vk.vk_ee, vk.vc_ck, transcript, comm_W, r_y[1:],
                   proof.U_verifier.comm_w_per_round[eval_w_round],
                   proof.eval_arg)
        return list(proof.U.public_values)
