"""NeutronNovaZkSNARK: non-recursive multi-folding of N step circuits.

Reference: src/neutronnova_zk.rs.  N instances of one step circuit plus
one core circuit are folded into a single instance via a batch
zero-check sum-check (NeutronNovaNIFS), and the folded instance is
proved with Spartan: batched step/core outer and inner ZK sum-checks
running through the NeutronNovaVerifierCircuit, Nova fold against a
random relaxed instance, relaxed-Spartan proof, and a single PCS opening
of the c_eval-folded witness.

The NIFS hot phase and both batched sum-checks run on device
(sumcheck/zk_device.py): the (instance, constraint) grid lives on the
TPU as (NL, I, num_cons) limb planes, each round is one fused kernel,
and only the finish_round/VC algebra stays host-side.  The original
host path is kept under SPARTAN2_NN_HOST=1 for cross-testing.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field as dfield

import jax.numpy as jnp

from ..errors import (
    DivisionByZeroError,
    InvalidInputLengthError,
    ProofVerifyError,
    SpartanError,
)
from ..field.jnp_ops import NL
from ..field.limbs import ints_to_limbs_np
from ..sumcheck.zk_device import get_zk_cubic, get_zk_quad
from ..polys.eq import (
    eq_evals_device,
    eq_evals_host,
    eq_evaluate,
    pow_evaluate,
    pow_evals_device_oneshot,
    pow_split_evals_host,
)
from ..polys.multilinear import sparse_poly_evaluate_host
from ..polys.univariate import UniPoly
from ..provider.engines import Engine
from ..r1cs.multiround import MultiRoundState, SplitMultiRoundR1CSInstance, SplitMultiRoundR1CSShape
from ..r1cs.relaxed import NovaNIFS, R1CSInstance, R1CSWitnessHost, RelaxedR1CSInstance
from ..r1cs.shape import SplitR1CSInstance, SplitR1CSShape
from ..snark.spartan import (
    commit_pending_batch,
    instance_witness_begin,
    instance_witness_finish,
    precommitted_witness,
    precommitted_witness_batch,
    r1cs_instance_and_witness,
    shared_witness,
)
from ..snark.spartan_relaxed import RelaxedR1CSSpartanProof, _bind_matrix_row_vars
from ..snark.spartan_zk import rerandomize_in_place
from ..snark.zk_circuits import NeutronNovaVerifierCircuit
from ..utils.digest import vk_digest
from ..utils.tracing import span


def _log2(n: int) -> int:
    assert n & (n - 1) == 0 and n > 0
    return n.bit_length() - 1


def weights_from_r(field, r_bs: list[int], n: int) -> list[int]:
    """eq tensor weights, LSB-first bit order (r1cs/mod.rs:153-166)."""
    p = field.modulus
    out = []
    for i in range(n):
        w, k = 1, i
        for r_t in r_bs:
            w = w * (r_t if k & 1 else (1 - r_t) % p) % p
            k >>= 1
        out.append(w)
    return out


def suffix_weight(field, t: int, ell_b: int, pair_idx: int,
                  rhos: list[int]) -> int:
    """prod_{s>t} eq(rho_s, bit_s) with LSB-first pair bits
    (neutronnova_zk.rs:77-87)."""
    p = field.modulus
    w, k = 1, pair_idx
    for s in range(t + 1, ell_b):
        w = w * (rhos[s] if k & 1 else (1 - rhos[s]) % p) % p
        k >>= 1
    return w


def nifs_finish_round(field, state: dict, rho_t: int, e0: int,
                      quad: int) -> list[int]:
    """finish_round rho algebra (neutronnova_zk.rs:703-735): derive the
    round's cubic coefficients from the (e0, quad) sums and the running
    claim ``state['T_cur']``/``state['acc_eq']``.  Raises on a zero rho
    challenge (division by rho)."""
    p = field.modulus
    one_minus_rho = (1 - rho_t) % p
    two_rho_minus_one = (rho_t - one_minus_rho) % p
    c = e0 * state["acc_eq"] % p
    a = quad * state["acc_eq"] % p
    if rho_t % p == 0:
        raise SpartanError("zero rho challenge")
    a_b_c = (state["T_cur"] - c * one_minus_rho) * pow(rho_t, -1, p) % p
    b = (a_b_c - a - c) % p
    return [
        c * one_minus_rho % p,
        (c * two_rho_minus_one + b * one_minus_rho) % p,
        (b * two_rho_minus_one + a * one_minus_rho) % p,
        a * two_rho_minus_one % p,
    ]


def nifs_update_state(field, state: dict, coeffs: list[int], rho_t: int,
                      r_b: int) -> None:
    """Advance the running claim past challenge r_b."""
    p = field.modulus
    one_minus_rho = (1 - rho_t) % p
    state["acc_eq"] = (state["acc_eq"]
                       * ((1 - r_b) * one_minus_rho + r_b * rho_t) % p)
    state["T_cur"] = UniPoly(field, coeffs).evaluate(r_b)


# ---------------------------------------------------------------------------
# keys / prep / proof
# ---------------------------------------------------------------------------


@dataclass
class NeutronNovaProverKey:
    engine: Engine
    S_step: SplitR1CSShape
    S_core: SplitR1CSShape
    ck: object
    vc_shape: SplitMultiRoundR1CSShape
    vc_shape_regular: object
    vc_ck: object
    vk_digest: bytes


@dataclass
class NeutronNovaVerifierKey:
    engine: Engine
    S_step: SplitR1CSShape
    S_core: SplitR1CSShape
    vk_ee: object
    vc_shape: SplitMultiRoundR1CSShape
    vc_shape_regular: object
    vc_ck: object
    vc_vk: object
    digest: bytes


@dataclass
class NeutronNovaPrep:
    ps_step: list
    ps_core: object
    # transient device caches (reference prep-time matvec/i64 caching,
    # neutronnova_zk.rs:1524-1603): filled by the first prove when the
    # step circuit takes no challenges (witnesses then identical across
    # proves); never serialized
    cache: dict = dfield(default_factory=dict)


@dataclass
class NeutronNovaProof:
    comm_W_shared: object
    step_instances: list[SplitR1CSInstance]
    core_instance: SplitR1CSInstance
    U_verifier: SplitMultiRoundR1CSInstance
    random_U: RelaxedR1CSInstance
    nifs: NovaNIFS
    relaxed_snark: RelaxedR1CSSpartanProof
    eval_arg: object


# ---------------------------------------------------------------------------
# NeutronNova NIFS (multi-fold zero-check)
# ---------------------------------------------------------------------------


class NeutronNovaNIFS:
    """The batch zero-check folding rounds (neutronnova_zk.rs:511-1262).

    Round t's cubic polynomial P_t(X) = eq(rho_t, X) * Q_t(X) where
    Q_t(X) = c + bX + aX^2 with c = e0*acc_eq, a = quad*acc_eq and b
    derived from the running claim T_cur = P_t(0) + P_t(1)
    (the finish_round algebra, neutronnova_zk.rs:703-735).
    """

    @staticmethod
    def prove(engine: Engine, S: SplitR1CSShape, Us: list[R1CSInstance],
              Ws: list[R1CSWitnessHost], vc: NeutronNovaVerifierCircuit,
              vc_state: MultiRoundState, vc_ck, transcript, rng=None):
        field = engine.scalar
        p = field.modulus
        pcs = engine.pcs

        n = len(Us)
        n_padded = 1 << max(n - 1, 0).bit_length()
        ell_b = _log2(n_padded)
        Us = list(Us) + [Us[0]] * (n_padded - n)
        Ws = list(Ws) + [Ws[0]] * (n_padded - n)
        for U in Us:
            transcript.absorb_bytes(b"U", U.to_transcript_bytes(engine.curve, field))
        transcript.absorb_scalar(b"T", 0)

        ell_cons = _log2(S.num_cons)
        ell1 = -(-ell_cons // 2)
        left, right = 1 << ell1, 1 << (ell_cons // 2)
        tau = transcript.squeeze(b"tau")
        e_left, e_right = pow_split_evals_host(field, tau, ell_cons, left, right)
        E_eq = [e_left[k % left] * e_right[k // left] % p
                for k in range(left * right)]

        rhos = [transcript.squeeze(b"rho") for _ in range(ell_b)]

        # Az/Bz/Cz layers per instance
        A_layers, B_layers, C_layers = [], [], []
        for U, W in zip(Us, Ws):
            z = W.W + [1] + U.X
            A_layers.append(S.A.multiply_vec_host(z))
            B_layers.append(S.B.multiply_vec_host(z))
            C_layers.append(S.C.multiply_vec_host(z))

        state = {"T_cur": 0, "acc_eq": 1}
        r_bs: list[int] = []
        m = n_padded
        for t in range(ell_b):
            pairs = m // 2
            e0 = quad = 0
            for pair in range(pairs):
                Ae, Ao = A_layers[2 * pair], A_layers[2 * pair + 1]
                Be, Bo = B_layers[2 * pair], B_layers[2 * pair + 1]
                Ce = C_layers[2 * pair]
                se0 = sum(E_eq[k] * (Ae[k] * Be[k] - Ce[k])
                          for k in range(len(E_eq))) % p
                squad = sum(E_eq[k] * (Ao[k] - Ae[k]) * (Bo[k] - Be[k])
                            for k in range(len(E_eq))) % p
                w = suffix_weight(field, t, ell_b, pair, rhos)
                e0 = (e0 + w * se0) % p
                quad = (quad + w * squad) % p

            coeffs = nifs_finish_round(field, state, rhos[t], e0, quad)
            vc.nifs_polys[t] = list(coeffs)
            r_b = vc_state.process_round(pcs, vc_ck, vc, t, transcript, rng)[0]
            r_bs.append(r_b)
            nifs_update_state(field, state, coeffs, rhos[t], r_b)

            # fold layers
            for layers in (A_layers, B_layers, C_layers):
                for i in range(pairs):
                    even, odd = layers[2 * i], layers[2 * i + 1]
                    layers[i] = [(e + r_b * (o - e)) % p
                                 for e, o in zip(even, odd)]
                del layers[pairs:]
            m = pairs

        t_out = state["T_cur"] * pow(state["acc_eq"], -1, p) % p
        eq_rho_at_rb = state["acc_eq"]  # == eq(rhos, r_bs)
        vc.t_out_step = t_out
        vc.eq_rho_at_rb = eq_rho_at_rb

        # NIFS-final VC round (enforces eq_rho_at_rb * t_out == claim)
        vc_state.process_round(pcs, vc_ck, vc, ell_b, transcript, rng)

        # fold witnesses and instances with the eq tensor weights
        weights = weights_from_r(field, r_bs, n_padded)
        dim = len(Ws[0].W)
        W_folded = [0] * dim
        for w_i, Wz in zip(weights, Ws):
            for j in range(dim):
                W_folded[j] = (W_folded[j] + w_i * Wz.W[j]) % p
        r_W_folded = pcs.fold_blinds([Wz.r_W for Wz in Ws], weights)
        comm_folded = pcs.fold_commitments([U.comm_W for U in Us], weights)
        X_folded = [
            sum(w_i * U.X[j] for w_i, U in zip(weights, Us)) % p
            for j in range(len(Us[0].X))
        ]
        folded_W = R1CSWitnessHost(W=W_folded, r_W=r_W_folded)
        folded_U = R1CSInstance(comm_W=comm_folded, X=X_folded)
        return (E_eq, A_layers[0], B_layers[0], C_layers[0], folded_W,
                folded_U, t_out, r_bs)

    @staticmethod
    def prove_device(engine: Engine, S: SplitR1CSShape, Us: list[R1CSInstance],
                     Ws: list[R1CSWitnessHost], Ws_dev: list,
                     vc: NeutronNovaVerifierCircuit,
                     vc_state: MultiRoundState, vc_ck, transcript, rng=None,
                     ck=None, cache: dict | None = None):
        """Device NIFS: the (instance, constraint) grid lives on the TPU
        as (NL, I, num_cons) limb planes; per round one fused kernel
        computes the weighted (e0, quad) sums and folds the instance
        axis, the host runs only the finish_round algebra + VC round
        (neutronnova_zk.rs:511-1168 restructured for the mesh axis).

        ``Ws_dev``: per-instance (NL, num_vars) Montgomery device planes
        (the witness planes already uploaded by instance synthesis).
        Returns (E_dev, Az, Bz, Cz device planes, W_fold_dev device
        plane, r_W_folded, folded_U, t_out, r_bs).
        """
        import jax.numpy as jnp

        from ..field.limbs import ints_to_limbs_np
        from ..sumcheck.zk_device import get_nifs_rounds

        field = engine.scalar
        p = field.modulus
        pcs = engine.pcs
        ops = engine.fs

        n = len(Us)
        n_padded = 1 << max(n - 1, 0).bit_length()
        ell_b = _log2(n_padded)
        Us = list(Us) + [Us[0]] * (n_padded - n)
        Ws = list(Ws) + [Ws[0]] * (n_padded - n)
        Ws_dev = list(Ws_dev) + [Ws_dev[0]] * (n_padded - n)
        for U in Us:
            transcript.absorb_bytes(b"U", U.to_transcript_bytes(engine.curve, field))
        transcript.absorb_scalar(b"T", 0)

        ell_cons = _log2(S.num_cons)
        tau = transcript.squeeze(b"tau")
        rhos = [transcript.squeeze(b"rho") for _ in range(ell_b)]

        # E = [tau^k] built ON DEVICE from ell_cons uploaded generator
        # powers (the split_evals outer product E[k] = left[k%L]*right[k//L]
        # collapses to tau^k, power.rs:65-86); the host previously
        # converted and shipped the whole 2^ell table per prove
        gs = [pow(tau, 1 << (ell_cons - 1 - j), p) for j in range(ell_cons)]
        E_dev = pow_evals_device_oneshot(
            ops, jnp.asarray(ints_to_limbs_np(gs, field, mont=True)))

        if cache is not None and "ABC" in cache:
            Az, Bz, Cz = cache["ABC"]
        else:
            # (NL, I, num_cols) z planes: device witness + uploaded tails
            z_stack = jnp.stack([
                jnp.concatenate([
                    Wd,
                    jnp.asarray(ints_to_limbs_np([1] + U.X, field, mont=True))
                ], axis=1)
                for U, Wd in zip(Us, Ws_dev)
            ], axis=1)
            Az, Bz, Cz = S.multiply_vec_batched_device(z_stack)
            if cache is not None:
                cache["ABC"] = (Az, Bz, Cz)

        state = {"T_cur": 0, "acc_eq": 1}

        def round_cb(t: int, e0: int, quad: int) -> int:
            coeffs = nifs_finish_round(field, state, rhos[t], e0, quad)
            vc.nifs_polys[t] = list(coeffs)
            r_b = vc_state.process_round(pcs, vc_ck, vc, t, transcript, rng)[0]
            nifs_update_state(field, state, coeffs, rhos[t], r_b)
            return r_b

        nifs_dev = get_nifs_rounds(ops)
        # small-value integer fast path for round 0 (the reference's i64
        # NIFS staging, neutronnova_zk.rs:1550-1560): one whole-grid
        # gate instead of per-entry zero-and-correct (field/small_value.py)
        small = None
        if len(rhos) > 0 and os.environ.get("SPARTAN2_NN_SMALL", "1") != "0":
            if cache is not None and "small" in cache:
                planes, ok = cache["small"]
            else:
                planes, ok = nifs_dev.to_small(field, Az, Bz, Cz)
                if cache is not None:
                    cache["small"] = (planes, ok)
            if ok:
                small = planes
        r_bs, (AzF, BzF, CzF) = nifs_dev.run(field, Az, Bz, Cz, E_dev, rhos,
                                             round_cb, small=small)

        t_out = state["T_cur"] * pow(state["acc_eq"], -1, p) % p
        vc.t_out_step = t_out
        vc.eq_rho_at_rb = state["acc_eq"]  # == eq(rhos, r_bs)
        vc_state.process_round(pcs, vc_ck, vc, ell_b, transcript, rng)

        # fold witnesses (device) and instances (host scalars + comm MSM).
        # Truncated-rest fast path (neutronnova_zk.rs:1217-1262): when the
        # step circuit allocates nothing in the rest phase, the rest
        # segment of every W is zero, so the fold only touches the
        # shared+precommitted prefix and the rest rows of the folded
        # commitment are blind-only (fold_commitments_partial).
        weights = weights_from_r(field, r_bs, n_padded)
        eff = S.num_shared + S.num_precommitted
        truncate = (ck is not None and 0 < eff < S.num_vars
                    and S.num_rest_unpadded == 0)
        if truncate:
            W_fold_eff = nifs_dev.fold_witnesses(
                field, jnp.stack([w[:, :eff] for w in Ws_dev], axis=1),
                weights)
            W_fold_dev = jnp.concatenate(
                [W_fold_eff,
                 jnp.zeros((NL, S.num_vars - eff), jnp.int32)], axis=1)
        else:
            W_fold_dev = nifs_dev.fold_witnesses(
                field, jnp.stack(Ws_dev, axis=1), weights)
        r_W_folded = pcs.fold_blinds([Wz.r_W for Wz in Ws], weights)
        if truncate:
            num_data_rows = -(-eff // S.width)
            comm_folded = pcs.fold_commitments_partial(
                [U.comm_W for U in Us], weights, num_data_rows, r_W_folded,
                ck)
        else:
            comm_folded = pcs.fold_commitments([U.comm_W for U in Us], weights)
        X_folded = [
            sum(w_i * U.X[j] for w_i, U in zip(weights, Us)) % p
            for j in range(len(Us[0].X))
        ]
        folded_U = R1CSInstance(comm_W=comm_folded, X=X_folded)
        return (E_dev, AzF, BzF, CzF, W_fold_dev, r_W_folded, folded_U,
                t_out, r_bs)


# ---------------------------------------------------------------------------
# batched host sum-checks (step & core in lockstep through VC rounds)
# ---------------------------------------------------------------------------


def _bind(field, arr, r):
    p = field.modulus
    half = len(arr) // 2
    return [(arr[j] + r * (arr[half + j] - arr[j])) % p for j in range(half)]


def prove_cubic_batched_zk(field, claims: tuple[int, int], E: list[int],
                           step: tuple, core: tuple, challenge_fn):
    """Two cubic sum-checks sum E*(A*B - C) in lockstep
    (sumcheck.rs:786-917): one VC round carries both round polynomials,
    one shared challenge binds both."""
    p = field.modulus
    A_s, B_s, C_s = (list(v) for v in step)
    A_c, B_c, C_c = (list(v) for v in core)
    E = list(E)
    e_s, e_c = claims[0] % p, claims[1] % p
    rs = []
    rnd = 0
    while len(A_s) > 1:
        half = len(A_s) // 2

        def round_poly(A, B, C, e):
            def eval_at(shift):
                acc = 0
                for j in range(half):
                    eqv = E[j] + shift * (E[half + j] - E[j])
                    a = A[j] + shift * (A[half + j] - A[j])
                    b = B[j] + shift * (B[half + j] - B[j])
                    c = C[j] + shift * (C[half + j] - C[j])
                    acc += eqv * (a * b - c)
                return acc % p

            t0 = eval_at(0)
            return UniPoly.from_evals_deg3(field, [t0, (e - t0) % p,
                                                   eval_at(2), eval_at(3)])

        poly_s = round_poly(A_s, B_s, C_s, e_s)
        poly_c = round_poly(A_c, B_c, C_c, e_c)
        r = challenge_fn(rnd, poly_s, poly_c)
        rnd += 1
        rs.append(r)
        e_s = poly_s.evaluate(r)
        e_c = poly_c.evaluate(r)
        E, A_s, B_s, C_s = (_bind(field, v, r) for v in (E, A_s, B_s, C_s))
        A_c, B_c, C_c = (_bind(field, v, r) for v in (A_c, B_c, C_c))
    return rs, (A_s[0], B_s[0], C_s[0]), (A_c[0], B_c[0], C_c[0]), E[0]


def prove_quad_batched_zk(field, claims: tuple[int, int], num_rounds: int,
                          ab_s: tuple, ab_c: tuple, challenge_fn):
    """Two quadratic sum-checks in lockstep (sumcheck.rs:702-782)."""
    p = field.modulus
    A_s, Z_s = (list(v) for v in ab_s)
    A_c, Z_c = (list(v) for v in ab_c)
    e_s, e_c = claims[0] % p, claims[1] % p
    rs = []
    for rnd in range(num_rounds):
        half = len(A_s) // 2

        def round_poly(A, Z, e):
            t0 = sum(A[j] * Z[j] for j in range(half)) % p
            t_inf = sum((A[half + j] - A[j]) * (Z[half + j] - Z[j])
                        for j in range(half)) % p
            e2 = (2 * e - 3 * t0 + 2 * t_inf) % p
            return UniPoly.from_evals_deg2(field, [t0, (e - t0) % p, e2])

        poly_s = round_poly(A_s, Z_s, e_s)
        poly_c = round_poly(A_c, Z_c, e_c)
        r = challenge_fn(rnd, poly_s, poly_c)
        rs.append(r)
        e_s = poly_s.evaluate(r)
        e_c = poly_c.evaluate(r)
        A_s, Z_s, A_c, Z_c = (_bind(field, v, r)
                              for v in (A_s, Z_s, A_c, Z_c))
    return rs, (A_s[0], A_c[0], Z_s[0], Z_c[0])


# ---------------------------------------------------------------------------
# the SNARK
# ---------------------------------------------------------------------------


class NeutronNovaZkSNARK:
    VC_COMMITMENT_WIDTH = 32  # reference neutronnova_zk.rs:1437

    @staticmethod
    def setup(engine: Engine, step_circuit, core_circuit, num_steps: int,
              width: int = 2048):
        S_step = SplitR1CSShape.from_circuit(step_circuit, engine.scalar, width)
        S_core = SplitR1CSShape.from_circuit(core_circuit, engine.scalar, width)
        SplitR1CSShape.equalize(S_step, S_core)
        return NeutronNovaZkSNARK.setup_from_shapes(engine, S_step, S_core,
                                                    num_steps)

    @staticmethod
    def setup_from_shapes(engine: Engine, S_step: SplitR1CSShape,
                          S_core: SplitR1CSShape, num_steps: int):
        """Key construction from (possibly deserialized) equalized
        shapes (neutronnova_zk.rs:1352-1460)."""
        width = S_step.width
        S_step.attach_device(engine.fs)
        S_core.attach_device(engine.fs)
        ck, vk_ee = engine.pcs.setup(
            b"ck", max(S_step.num_vars, S_core.num_vars), width)

        num_rounds_b = _log2(1 << max(num_steps - 1, 0).bit_length())
        num_rounds_x = _log2(S_step.num_cons)
        num_rounds_y = _log2(S_step.num_vars) + 1
        vc = NeutronNovaVerifierCircuit(
            engine.scalar, num_rounds_b, num_rounds_x, num_rounds_y,
            NeutronNovaZkSNARK.VC_COMMITMENT_WIDTH)
        vc_shape = SplitMultiRoundR1CSShape.from_circuit(vc, engine.scalar)
        vc_ck, vc_vk = engine.pcs.setup(b"ck", vc_shape.total_vars,
                                        vc_shape.commitment_width)
        vc_shape_regular = vc_shape.to_regular_shape()

        h = hashlib.sha256()
        h.update(vk_digest(S_step, ck, ck))
        h.update(vk_digest(S_core, ck, ck))
        h.update(vc_shape.A.digest_bytes())
        for pt in vc_ck.ck:
            h.update(engine.curve.point_bytes(pt))
        digest = h.digest()

        pk = NeutronNovaProverKey(engine, S_step, S_core, ck, vc_shape,
                                  vc_shape_regular, vc_ck, digest)
        vk = NeutronNovaVerifierKey(engine, S_step, S_core, vk_ee, vc_shape,
                                    vc_shape_regular, vc_ck, vc_vk, digest)
        return pk, vk

    @staticmethod
    def prep_prove(pk: NeutronNovaProverKey, step_circuits, core_circuit,
                   is_small: bool = False, rng=None) -> NeutronNovaPrep:
        """Shared witness synthesized once, cloned per step; core reuses it
        (neutronnova_zk.rs:1477-1603)."""
        engine = pk.engine
        ps = shared_witness(engine, pk.S_step, pk.ck, step_circuits[0],
                            is_small, rng)
        ps_step = [ps.clone_after_shared() for _ in step_circuits]
        # synthesis per step (host), but ONE batched rows-MSM for all N
        # precommitted commits (reference: rayon par_iter,
        # neutronnova_zk.rs:1477-1603)
        precommitted_witness_batch(engine, ps_step, pk.S_step, pk.ck,
                                   step_circuits, is_small, rng)
        precommitted_witness(engine, ps, pk.S_core, pk.ck, core_circuit,
                             is_small, rng)
        return NeutronNovaPrep(ps_step=ps_step, ps_core=ps)

    @staticmethod
    def prove(pk: NeutronNovaProverKey, step_circuits, core_circuit,
              prep: NeutronNovaPrep, is_small: bool = False, rng=None,
              mesh=None):
        """With ``mesh`` (a jax.sharding.Mesh) the batched outer/inner ZK
        sum-checks run lane-sharded across the mesh (parallel/
        sumcheck_shard.ShardedZkSumcheck*), byte-identical messages."""
        engine = pk.engine
        field = engine.scalar
        p = field.modulus
        pcs = engine.pcs
        n_steps = len(step_circuits)

        _sp_rerand = span("nn_rerandomize"); _sp_rerand.__enter__()
        rerandomize_in_place(engine, prep.ps_core, pk.S_core, pk.ck, rng)
        comm_W_shared = prep.ps_core.comm_W_shared
        r_W_shared = prep.ps_core.r_W_shared
        for ps_i in prep.ps_step:
            # steps share the core's (rerandomized) shared commitment
            ps_i.comm_W_shared = comm_W_shared
            ps_i.r_W_shared = r_W_shared
            if ps_i.comm_W_precommitted is not None:
                new_blind = pcs.blind(pk.ck, pk.S_step.num_precommitted, rng=rng)
                ps_i.comm_W_precommitted = pcs.rerandomize_commitment(
                    pk.ck, ps_i.comm_W_precommitted, ps_i.r_W_precommitted,
                    new_blind)
                ps_i.r_W_precommitted = new_blind

        _sp_rerand.__exit__(None, None, None)
        # per-instance transcripts (neutronnova_zk.rs:1662-1722); the
        # N per-step rest commits run as ONE batched rows-MSM + ONE
        # blind MSM + ONE affine pull (commit_pending_batch) instead of
        # N serial kernel invocations
        _sp_inst = span("nn_instances", n=n_steps); _sp_inst.__enter__()
        step_instances, step_witnesses, step_W_dev = [], [], []
        pendings, step_trs = [], []
        for i, (ps_i, circ) in enumerate(zip(prep.ps_step, step_circuits)):
            tr = engine.transcript(b"neutronnova_prove")
            tr.absorb_bytes(b"vk", pk.vk_digest)
            tr.absorb_scalar(b"num_circuits", n_steps)
            tr.absorb_scalar(b"circuit_index", i)
            tr.absorb_scalars(b"public_values", circ.public_values())
            pendings.append(instance_witness_begin(
                engine, ps_i, pk.S_step, pk.ck, circ, is_small, tr, rng))
            step_trs.append(tr)
        comms_rest = commit_pending_batch(engine, pk.ck, pk.S_step, pendings)
        for pend, tr, cm in zip(pendings, step_trs, comms_rest):
            U_i, W_i = instance_witness_finish(engine, pend, pk.S_step, cm, tr)
            step_instances.append(U_i)
            step_witnesses.append(R1CSWitnessHost(W=W_i.W_host, r_W=W_i.r_W))
            step_W_dev.append(W_i.W)

        tr = engine.transcript(b"neutronnova_prove")
        tr.absorb_bytes(b"vk", pk.vk_digest)
        tr.absorb_scalars(b"public_values", core_circuit.public_values())
        core_instance, core_W = r1cs_instance_and_witness(
            engine, prep.ps_core, pk.S_core, pk.ck, core_circuit, is_small,
            tr, rng)
        core_witness = R1CSWitnessHost(W=core_W.W_host, r_W=core_W.r_W)

        _sp_inst.__exit__(None, None, None)
        step_regular = [U.to_regular(pcs) for U in step_instances]
        step_regular = [R1CSInstance(comm_W=c, X=x) for c, x in step_regular]
        cc, cx = core_instance.to_regular(pcs)
        core_regular = R1CSInstance(comm_W=cc, X=cx)

        transcript = engine.transcript(b"neutronnova_prove")
        transcript.absorb_bytes(b"vk", pk.vk_digest)
        transcript.absorb_bytes(
            b"core_instance", core_regular.to_transcript_bytes(engine.curve, field))

        n_padded = 1 << max(n_steps - 1, 0).bit_length()
        num_rounds_b = _log2(n_padded)
        num_rounds_x = _log2(pk.S_step.num_cons)
        num_vars = pk.S_step.num_vars
        num_rounds_y = _log2(num_vars) + 1

        vc = NeutronNovaVerifierCircuit(
            field, num_rounds_b, num_rounds_x, num_rounds_y,
            pk.vc_shape.commitment_width)
        vc_state = MultiRoundState.initialize(pk.vc_shape)

        use_host = (os.environ.get("SPARTAN2_NN_HOST") == "1"
                    or pk.S_step._device is None)

        outer_start = num_rounds_b + 1
        inner_start = outer_start + num_rounds_x + 1

        if use_host:
            (E_eq, Az_s, Bz_s, Cz_s, folded_W, folded_U, t_out, r_bs) = (
                NeutronNovaNIFS.prove(engine, pk.S_step, step_regular,
                                      step_witnesses, vc, vc_state, pk.vc_ck,
                                      transcript, rng))

            # core layers
            z_core = (core_witness.W + [1] + core_instance.public_values
                      + core_instance.challenges)
            Az_c = pk.S_core.A.multiply_vec_host(z_core)
            Bz_c = pk.S_core.B.multiply_vec_host(z_core)
            Cz_c = pk.S_core.C.multiply_vec_host(z_core)

            def outer_challenge(i, poly_s, poly_c):
                vc.outer_polys_step[i] = list(poly_s.coeffs)
                vc.outer_polys_core[i] = list(poly_c.coeffs)
                return vc_state.process_round(pcs, pk.vc_ck, vc,
                                              outer_start + i, transcript,
                                              rng)[0]

            r_x, claims_s, claims_c, tau_rx = prove_cubic_batched_zk(
                field, (t_out, 0), E_eq, (Az_s, Bz_s, Cz_s),
                (Az_c, Bz_c, Cz_c), outer_challenge)
        else:
            # ---- device NIFS + batched outer sum-check ----
            ops = engine.fs
            with span("nn_nifs_device"):
             (E_dev, AzF, BzF, CzF, W_fold_dev, r_W_folded, folded_U, t_out,
              r_bs) = NeutronNovaNIFS.prove_device(
                engine, pk.S_step, step_regular, step_witnesses, step_W_dev,
                 vc, vc_state, pk.vc_ck, transcript, rng, ck=pk.ck,
                 cache=(prep.cache if pk.S_step.num_challenges == 0
                        else None))
            folded_W = R1CSWitnessHost(W=None, r_W=r_W_folded)

            z_core_dev = jnp.concatenate([
                core_W.W,
                jnp.asarray(ints_to_limbs_np(
                    [1] + core_instance.public_values
                    + core_instance.challenges, field, mont=True)),
            ], axis=1)
            with span("nn_core_matvec") as _s:
                Az_c, Bz_c, Cz_c = pk.S_core.multiply_vec_device(z_core_dev)
                _s.sync(Az_c)

            def outer_challenge_dev(i, unis):
                vc.outer_polys_step[i] = list(unis[0].coeffs)
                vc.outer_polys_core[i] = list(unis[1].coeffs)
                return vc_state.process_round(pcs, pk.vc_ck, vc,
                                              outer_start + i, transcript,
                                              rng)[0]

            stack3 = tuple(
                jnp.stack([s, c], axis=1)
                for s, c in ((AzF, Az_c), (BzF, Bz_c), (CzF, Cz_c)))
            if mesh is not None and stack3[0].shape[2] > mesh.devices.size:
                from ..parallel.sumcheck_shard import get_sharded_zk_cubic
                cubic = get_sharded_zk_cubic(ops, mesh)
            else:
                cubic = get_zk_cubic(ops)
            with span("nn_outer_zk_sumcheck"):
                r_x, finals_outer, tau_rx = cubic.prove(
                    field, [t_out, 0], E_dev, stack3, outer_challenge_dev)
            claims_s, claims_c = finals_outer

        vc.claim_Az_step, vc.claim_Bz_step, vc.claim_Cz_step = claims_s
        vc.claim_Az_core, vc.claim_Bz_core, vc.claim_Cz_core = claims_c
        vc.tau_at_rx = tau_rx

        r = vc_state.process_round(pcs, pk.vc_ck, vc,
                                   outer_start + num_rounds_x, transcript,
                                   rng)[0]
        r_sq = r * r % p

        claim_inner_s = (claims_s[0] + r * claims_s[1] + r_sq * claims_s[2]) % p
        claim_inner_c = (claims_c[0] + r * claims_c[1] + r_sq * claims_c[2]) % p

        def inner_challenge(j, poly_s, poly_c):
            vc.inner_polys_step[j] = list(poly_s.coeffs)
            vc.inner_polys_core[j] = list(poly_c.coeffs)
            return vc_state.process_round(pcs, pk.vc_ck, vc, inner_start + j,
                                          transcript, rng)[0]

        if use_host:
            evals_rx = eq_evals_host(field, r_x)

            def poly_abc(S):
                eA = _bind_matrix_row_vars(field, S.A, evals_rx, S.num_cols)
                eB = _bind_matrix_row_vars(field, S.B, evals_rx, S.num_cols)
                eC = _bind_matrix_row_vars(field, S.C, evals_rx, S.num_cols)
                v = [(a + r * b + r_sq * c) % p for a, b, c in zip(eA, eB, eC)]
                return v + [0] * (2 * num_vars - len(v))

            ABC_s = poly_abc(pk.S_step)
            ABC_c = poly_abc(pk.S_core)

            def zvec(W, X):
                v = W + [1] + X
                return v + [0] * (2 * num_vars - len(v))

            z_folded = zvec(folded_W.W, folded_U.X)
            z_core_v = zvec(core_witness.W, core_regular.X)

            r_y, finals = prove_quad_batched_zk(
                field, (claim_inner_s, claim_inner_c), num_rounds_y,
                (ABC_s, z_folded), (ABC_c, z_core_v), inner_challenge)
            eval_Z_step, eval_Z_core = finals[2], finals[3]
        else:
            from ..sumcheck.zk_device import get_zk_inner_round0

            rx_stack = jnp.asarray(ints_to_limbs_np(r_x, field, mont=True))
            r_mont = jnp.asarray(
                ints_to_limbs_np([r], field, mont=True))[:, 0]
            # ABC/z at their nonzero width num_vars + ne; step and core
            # can have different num_extra — pad both to the max (the
            # extra correction terms read zeros and vanish)
            ne = max(pk.S_step.num_cols, pk.S_core.num_cols) - num_vars

            def pad_cols(x):
                w = num_vars + ne - x.shape[1]
                if w == 0:
                    return x
                return jnp.concatenate(
                    [x, jnp.zeros((NL, w), jnp.int32)], axis=1)

            with span("nn_prepare_poly_ABC") as _s:
                ABC_s = pad_cols(
                    pk.S_step.bind_and_prepare_poly_ABC_device(rx_stack, r_mont))
                ABC_c = pad_cols(
                    pk.S_core.bind_and_prepare_poly_ABC_device(rx_stack, r_mont))
                _s.sync(ABC_s, ABC_c)

            def zdev(W_plane, X):
                tail = jnp.asarray(
                    ints_to_limbs_np([1] + X, field, mont=True))
                pad = jnp.zeros(
                    (NL, num_vars + ne - W_plane.shape[1] - tail.shape[1]),
                    jnp.int32)
                return jnp.concatenate([W_plane, tail, pad], axis=1)

            z_folded_dev = zdev(W_fold_dev, folded_U.X)
            z_core_v_dev = zdev(core_W.W, core_regular.X)

            abc_k = jnp.stack([ABC_s, ABC_c], axis=1)
            z_k = jnp.stack([z_folded_dev, z_core_v_dev], axis=1)

            # structured round 0 (the virtual 2*num_vars polys are zero
            # beyond num_vars + ne; reference zero-skip at
            # neutronnova_zk.rs:1889-1920), then the generic engine on
            # the bound num_vars-wide halves
            _sp_inner = span("nn_inner_zk_sumcheck"); _sp_inner.__enter__()
            round0 = get_zk_inner_round0(ops)
            r0_evals = round0.evals(field, abc_k, z_k, num_vars, ne)
            unis0 = []
            for (ev0, t_inf), e in zip(r0_evals,
                                       (claim_inner_s, claim_inner_c)):
                e2 = (2 * e - 3 * ev0 + 2 * t_inf) % p
                unis0.append(UniPoly.from_evals_deg2(
                    field, [ev0, (e - ev0) % p, e2]))
            vc.inner_polys_step[0] = list(unis0[0].coeffs)
            vc.inner_polys_core[0] = list(unis0[1].coeffs)
            r0 = vc_state.process_round(pcs, pk.vc_ck, vc, inner_start,
                                        transcript, rng)[0]
            abc_k, z_k = round0.bind(field, abc_k, z_k, r0, num_vars, ne)
            claims_after0 = [u.evaluate(r0) for u in unis0]

            def inner_challenge_dev(j, unis):
                vc.inner_polys_step[1 + j] = list(unis[0].coeffs)
                vc.inner_polys_core[1 + j] = list(unis[1].coeffs)
                return vc_state.process_round(pcs, pk.vc_ck, vc,
                                              inner_start + 1 + j, transcript,
                                              rng)[0]

            if mesh is not None and (1 << (num_rounds_y - 1)) > mesh.devices.size:
                from ..parallel.sumcheck_shard import get_sharded_zk_quad
                quad = get_sharded_zk_quad(ops, mesh)
            else:
                quad = get_zk_quad(ops)
            r_y_rest, finals_inner = quad.prove(
                field, claims_after0, (abc_k, z_k), num_rounds_y - 1,
                inner_challenge_dev)
            _sp_inner.__exit__(None, None, None)
            r_y = [r0] + list(r_y_rest)
            eval_Z_step = finals_inner[0][1]
            eval_Z_core = finals_inner[1][1]

        def eval_x(X):
            return sparse_poly_evaluate_host(field, _log2(num_vars), [1] + X,
                                             r_y[1:])

        eval_X_step = eval_x(folded_U.X)
        eval_X_core = eval_x(core_regular.X)
        denom = (1 - r_y[0]) % p
        if denom == 0:
            raise DivisionByZeroError("division by zero in eval_W")
        inv = pow(denom, -1, p)
        vc.eval_W_step = (eval_Z_step - r_y[0] * eval_X_step) * inv % p
        vc.eval_W_core = (eval_Z_core - r_y[0] * eval_X_core) * inv % p
        vc.eval_X_step = eval_X_step
        vc.eval_X_core = eval_X_core

        vc_state.process_round(pcs, pk.vc_ck, vc,
                               inner_start + num_rounds_y, transcript, rng)
        eval_w_step_round = inner_start + num_rounds_y + 1
        vc_state.process_round(pcs, pk.vc_ck, vc, eval_w_step_round,
                               transcript, rng)
        vc_state.process_round(pcs, pk.vc_ck, vc, eval_w_step_round + 1,
                               transcript, rng)

        U_verifier, W_verifier = vc_state.finalize(pcs)
        U_verifier_regular = U_verifier.to_regular_instance(pcs)

        _sp_vc = span("nn_vc_fold_relaxed"); _sp_vc.__enter__()
        random_U, random_W = pk.vc_shape_regular.sample_random_instance_witness(
            pcs, pk.vc_ck, rng=rng)
        nifs, folded_W_vc, folded_u, folded_X = NovaNIFS.prove(
            pcs, pk.vc_ck, pk.vc_shape_regular, random_U, random_W,
            U_verifier_regular, W_verifier, transcript, rng=rng)
        relaxed_snark = RelaxedR1CSSpartanProof.prove(
            pcs, pk.vc_shape_regular, pk.vc_ck, folded_u, folded_X,
            folded_W_vc, transcript)

        _sp_vc.__exit__(None, None, None)
        comm_eval_W_step = U_verifier.comm_w_per_round[eval_w_step_round]
        blind_eval_W_step = vc_state.r_w_per_round[eval_w_step_round]
        comm_eval_W_core = U_verifier.comm_w_per_round[eval_w_step_round + 1]
        blind_eval_W_core = vc_state.r_w_per_round[eval_w_step_round + 1]

        c_eval = transcript.squeeze(b"c_eval")

        comm = pcs.fold_commitments([folded_U.comm_W, core_regular.comm_W],
                                    [1, c_eval])
        blind = pcs.fold_blinds([folded_W.r_W, core_witness.r_W], [1, c_eval])
        comm_eval = pcs.fold_commitments([comm_eval_W_step, comm_eval_W_core],
                                         [1, c_eval])
        blind_eval = pcs.fold_blinds([blind_eval_W_step, blind_eval_W_core],
                                     [1, c_eval])

        if use_host:
            W_comb = [(w1 + c_eval * w2) % p
                      for w1, w2 in zip(folded_W.W, core_witness.W)]
            W_mont = jnp.asarray(ints_to_limbs_np(W_comb, field, mont=True))
        else:
            c_dev = jnp.asarray(
                ints_to_limbs_np([c_eval], field, mont=True))[:, 0]
            cb = jnp.broadcast_to(c_dev[:, None], W_fold_dev.shape)
            W_mont = engine.fs.add(W_fold_dev,
                                   engine.fs.mont_mul(cb, core_W.W))
        with span("nn_pcs_prove"):
            eval_arg = pcs.prove(pk.ck, pk.vc_ck, transcript, comm, W_mont,
                                 blind, r_y[1:], comm_eval, blind_eval,
                                 rng=rng)

        # strip the shared commitment (same across all instances)
        import copy as _copy

        shared_comm = step_instances[0].comm_W_shared
        stripped_steps = []
        for u in step_instances:
            u2 = _copy.copy(u)
            u2.comm_W_shared = None
            stripped_steps.append(u2)
        core_stripped = _copy.copy(core_instance)
        core_stripped.comm_W_shared = None

        proof = NeutronNovaProof(
            comm_W_shared=shared_comm, step_instances=stripped_steps,
            core_instance=core_stripped, U_verifier=U_verifier,
            random_U=random_U, nifs=nifs, relaxed_snark=relaxed_snark,
            eval_arg=eval_arg)
        return proof, prep

    @staticmethod
    def verify(proof: NeutronNovaProof, vk: NeutronNovaVerifierKey,
               num_instances: int):
        """(neutronnova_zk.rs:2096-2342)."""
        import copy as _copy

        engine = vk.engine
        field = engine.scalar
        p = field.modulus
        pcs = engine.pcs

        if num_instances == 0 or num_instances != len(proof.step_instances):
            raise InvalidInputLengthError("wrong number of instances")

        step_instances = []
        for u in proof.step_instances:
            u2 = _copy.copy(u)
            u2.comm_W_shared = proof.comm_W_shared
            step_instances.append(u2)
        core_instance = _copy.copy(proof.core_instance)
        core_instance.comm_W_shared = proof.comm_W_shared

        for i, u in enumerate(step_instances):
            tr = engine.transcript(b"neutronnova_prove")
            tr.absorb_bytes(b"vk", vk.digest)
            tr.absorb_scalar(b"num_circuits", len(step_instances))
            tr.absorb_scalar(b"circuit_index", i)
            tr.absorb_scalars(b"public_values", u.public_values)
            u.validate(vk.S_step, pcs, tr)

        tr = engine.transcript(b"neutronnova_prove")
        tr.absorb_bytes(b"vk", vk.digest)
        tr.absorb_scalars(b"public_values", core_instance.public_values)
        core_instance.validate(vk.S_core, pcs, tr)

        n_padded = 1 << max(len(step_instances) - 1, 0).bit_length()
        padded = step_instances + [step_instances[0]] * (n_padded - len(step_instances))
        step_regular = []
        for u in padded:
            c, x = u.to_regular(pcs)
            step_regular.append(R1CSInstance(comm_W=c, X=x))
        cc, cx = core_instance.to_regular(pcs)
        core_regular = R1CSInstance(comm_W=cc, X=cx)

        transcript = engine.transcript(b"neutronnova_prove")
        transcript.absorb_bytes(b"vk", vk.digest)
        transcript.absorb_bytes(
            b"core_instance", core_regular.to_transcript_bytes(engine.curve, field))
        for U in step_regular:
            transcript.absorb_bytes(b"U", U.to_transcript_bytes(engine.curve, field))
        transcript.absorb_scalar(b"T", 0)

        num_rounds_b = _log2(n_padded)
        num_vars = vk.S_step.num_vars
        num_rounds_x = _log2(vk.S_step.num_cons)
        num_rounds_y = _log2(num_vars) + 1

        tau = transcript.squeeze(b"tau")
        rhos = [transcript.squeeze(b"rho") for _ in range(num_rounds_b)]

        proof.U_verifier.validate(vk.vc_shape, pcs, transcript)
        U_verifier_regular = proof.U_verifier.to_regular_instance(pcs)

        num_challenges = num_rounds_b + num_rounds_x + 1 + num_rounds_y
        if len(U_verifier_regular.X) != num_challenges + 6:
            raise ProofVerifyError("verifier instance has wrong public IO size")
        challenges = U_verifier_regular.X[:num_challenges]
        public_values = U_verifier_regular.X[num_challenges:num_challenges + 6]

        r_b = challenges[:num_rounds_b]
        r_x = challenges[num_rounds_b:num_rounds_b + num_rounds_x]
        r = challenges[num_rounds_b + num_rounds_x]
        r_y = challenges[num_rounds_b + num_rounds_x + 1:]

        weights = weights_from_r(field, r_b, n_padded)
        folded_comm = pcs.fold_commitments([u.comm_W for u in step_regular],
                                           weights)
        folded_X = [
            sum(w_i * u.X[j] for w_i, u in zip(weights, step_regular)) % p
            for j in range(len(step_regular[0].X))
        ]
        folded_U = R1CSInstance(comm_W=folded_comm, X=folded_X)

        folded_U_verifier = proof.nifs.verify(pcs, field, transcript,
                                              proof.random_U,
                                              U_verifier_regular)
        proof.relaxed_snark.verify(pcs, vk.vc_shape_regular, vk.vc_vk,
                                   folded_U_verifier, transcript)

        eA_s, eB_s, eC_s = vk.S_step.evaluate_at(r_x, r_y)
        eA_c, eB_c, eC_c = vk.S_core.evaluate_at(r_x, r_y)

        def eval_x(X):
            return sparse_poly_evaluate_host(field, _log2(num_vars), [1] + X,
                                             r_y[1:])

        eval_X_step = eval_x(folded_U.X)
        eval_X_core = eval_x(core_regular.X)
        quotient_step = (eA_s + r * eB_s + r * r * eC_s) % p
        quotient_core = (eA_c + r * eB_c + r * r * eC_c) % p
        tau_at_rx = pow_evaluate(field, tau, r_x)
        eq_rho_at_rb = eq_evaluate(field, r_b, rhos)

        if (public_values[0] != tau_at_rx or public_values[1] != eval_X_step
                or public_values[2] != eval_X_core
                or public_values[3] != eq_rho_at_rb
                or public_values[4] != quotient_step
                or public_values[5] != quotient_core):
            raise SpartanError(
                "verifier instance public values do not match recomputation")

        c_eval = transcript.squeeze(b"c_eval")
        eval_w_step_round = num_rounds_b + 1 + num_rounds_x + 1 + num_rounds_y + 1
        comm_eval_W_step = proof.U_verifier.comm_w_per_round[eval_w_step_round]
        comm_eval_W_core = proof.U_verifier.comm_w_per_round[eval_w_step_round + 1]

        comm = pcs.fold_commitments([folded_U.comm_W, core_regular.comm_W],
                                    [1, c_eval])
        comm_eval = pcs.fold_commitments([comm_eval_W_step, comm_eval_W_core],
                                         [1, c_eval])
        pcs.verify(vk.vk_ee, vk.vc_ck, transcript, comm, r_y[1:], comm_eval,
                   proof.eval_arg)

        return ([u.public_values for u in step_instances[:num_instances]],
                core_instance.public_values)
