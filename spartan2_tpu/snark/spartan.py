"""SpartanSNARK (non-ZK): setup / prep_prove / prove / verify.

Reference: src/spartan.rs.  The prover keeps bulk data device-resident:
witness commits run through the batched MSM ladder, Az/Bz/Cz through the
SpMV kernels, both sum-checks through device step functions that carry
the Keccak transcript state on device (host and device transcripts are
byte-identical, so the host verifier interoperates).

Host <-> device sync points per proof: upload witness/z, pull 3 outer
claims, pull per-round coefficient lists at the end of each sum-check,
pull eval_Z — all O(rounds) scalars, matching the reference's
"transcript consumes only O(rounds) data per phase" structure
(SURVEY.md section 5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..errors import (
    DivisionByZeroError,
    IncorrectWitnessError,
    ProofVerifyError,
    SpartanError,
)
from ..field.jnp_ops import NL
from ..field.limbs import ints_to_limbs_np, limbs_to_ints
from ..frontend.constraint_system import ConstraintSystem
from ..pcs.hyrax import HyraxBlind, HyraxCommitment, HyraxEvaluationArgument
from ..polys.eq import eq_evals_device, eq_evals_host, eq_evaluate
from ..polys.multilinear import sparse_poly_evaluate_host
from ..polys.univariate import UniPoly
from ..provider.engines import Engine
from ..r1cs.shape import R1CSWitness, SplitR1CSInstance, SplitR1CSShape
from ..sumcheck.prove import (
    get_cubic_eq_prover,
    get_cubic_prover,
    get_inner_round0,
    get_quad_prover,
)
from ..sumcheck.verify import SumcheckProof
from ..transcript.device import DeviceTranscript
from ..transcript.transcript import Transcript
from ..utils.digest import vk_digest
from ..utils.tracing import span


def _log2(n: int) -> int:
    assert n & (n - 1) == 0 and n > 0
    return n.bit_length() - 1


# ---------------------------------------------------------------------------
# keys / prep state / proof
# ---------------------------------------------------------------------------


@dataclass
class SpartanProverKey:
    engine: Engine
    S: SplitR1CSShape
    ck: object
    ck_s: object
    vk_digest: bytes


@dataclass
class SpartanVerifierKey:
    engine: Engine
    S: SplitR1CSShape
    vk_ee: object  # Hyrax verifier key (same generators as ck)
    ck_s: object
    digest: bytes


@dataclass
class PrecommittedState:
    """bellpepper/r1cs.rs:290-301: witness prefix + partial commitments."""

    cs: ConstraintSystem
    shared: list
    precommitted: list
    W: list  # host ints, length num_vars (padded layout)
    comm_W_shared: Optional[HyraxCommitment] = None
    r_W_shared: Optional[HyraxBlind] = None
    comm_W_precommitted: Optional[HyraxCommitment] = None
    r_W_precommitted: Optional[HyraxBlind] = None
    # device cache of the (static) shared+precommitted limb planes
    W_prefix_mont: Optional[object] = None
    # cached prefix Az/Bz/Cz device products (spartan.rs:176-216 prep)
    matvec_cache: Optional[tuple] = None
    # cached rest-witness raw (unblinded) row MSM + limb planes
    # (reference cached_rest_witness/cached_rest_msm, spartan.rs:109-124):
    # a re-prove with an unchanged rest witness only adds fresh blinds
    rest_raw: Optional[object] = None
    rest_key: Optional[int] = None
    rest_mont: Optional[object] = None

    def clone_after_shared(self) -> "PrecommittedState":
        """Cheap per-step clone of the shared-phase state (NeutronNova
        preps one shared witness and clones it per step circuit,
        neutronnova_zk.rs:1495-1509).  Shares the immutable pieces
        (shared Nums, commitments, device prefix planes) and shallow-
        copies only the lists the per-step synthesis mutates — a
        deepcopy here walked ~num_vars ints per step."""
        cs2 = ConstraintSystem(self.cs.field, shape_mode=False)
        cs2.num_aux = self.cs.num_aux
        cs2.aux_assignment = list(self.cs.aux_assignment)
        cs2.input_assignment = list(self.cs.input_assignment)
        return PrecommittedState(
            cs=cs2, shared=self.shared, precommitted=list(self.precommitted),
            W=list(self.W), comm_W_shared=self.comm_W_shared,
            r_W_shared=self.r_W_shared,
            comm_W_precommitted=self.comm_W_precommitted,
            r_W_precommitted=self.r_W_precommitted,
            W_prefix_mont=self.W_prefix_mont,
            matvec_cache=self.matvec_cache)


@dataclass
class SpartanPrepSNARK:
    ps: PrecommittedState


@dataclass
class SpartanSNARKProof:
    U: SplitR1CSInstance
    sc_proof_outer: SumcheckProof
    claims_outer: tuple  # (Az, Bz, Cz) at r_x
    sc_proof_inner: SumcheckProof
    eval_W: int
    blind_eval_W: HyraxBlind  # non-ZK: blind is sent (spartan.rs:136)
    eval_arg: HyraxEvaluationArgument


# ---------------------------------------------------------------------------
# witness machinery (bellpepper/r1cs.rs SpartanWitness equivalents)
# ---------------------------------------------------------------------------


def _upload_mont(engine: Engine, vals: list[int]) -> jnp.ndarray:
    return jnp.asarray(ints_to_limbs_np(vals, engine.scalar, mont=True))


def shared_witness(engine: Engine, S: SplitR1CSShape, ck, circuit,
                   is_small: bool, rng=None) -> PrecommittedState:
    """bellpepper/r1cs.rs:306-357."""
    cs = ConstraintSystem(engine.scalar, shape_mode=False)
    W = [0] * S.num_vars
    shared = circuit.shared(cs)
    if len(cs.aux_assignment) < S.num_shared_unpadded:
        raise IncorrectWitnessError("shared variables not allocated correctly")
    W[: S.num_shared_unpadded] = cs.aux_assignment[: S.num_shared_unpadded]

    comm = blind = None
    if S.num_shared_unpadded > 0:
        blind = engine.pcs.blind(ck, S.num_shared, rng=rng)
        comm = engine.pcs.commit(
            ck, _upload_mont(engine, W[: S.num_shared]), blind, is_small
        )
    return PrecommittedState(cs=cs, shared=shared, precommitted=[], W=W,
                             comm_W_shared=comm, r_W_shared=blind)


def precommitted_witness(engine: Engine, ps: PrecommittedState,
                         S: SplitR1CSShape, ck, circuit, is_small: bool,
                         rng=None) -> None:
    """bellpepper/r1cs.rs:359-409."""
    precommitted = circuit.precommitted(ps.cs, ps.shared)
    aux = ps.cs.aux_assignment
    lo = S.num_shared_unpadded
    if len(aux) - lo < S.num_precommitted_unpadded:
        raise IncorrectWitnessError(
            "precommitted variables not allocated correctly")
    ps.W[S.num_shared : S.num_shared + S.num_precommitted_unpadded] = aux[
        lo : lo + S.num_precommitted_unpadded
    ]
    if S.num_precommitted_unpadded > 0:
        blind = engine.pcs.blind(ck, S.num_precommitted, rng=rng)
        seg = ps.W[S.num_shared : S.num_shared + S.num_precommitted]
        ps.comm_W_precommitted = engine.pcs.commit(
            ck, _upload_mont(engine, seg), blind, is_small
        )
        ps.r_W_precommitted = blind
    ps.precommitted = precommitted


def precommitted_witness_batch(engine: Engine, ps_list: list,
                               S: SplitR1CSShape, ck, circuits,
                               is_small: bool, rng=None) -> None:
    """Batched precommitted_witness over many states: synthesis stays
    per-circuit (host python), but the N segment commits run as ONE
    batched raw rows-MSM + ONE blind MSM + ONE affine pull
    (the reference preps per-step states under rayon,
    neutronnova_zk.rs:1477-1603)."""
    if S.num_precommitted_unpadded == 0:
        for ps, circ in zip(ps_list, circuits):
            ps.precommitted = circ.precommitted(ps.cs, ps.shared)
        return
    segs = []
    for ps, circ in zip(ps_list, circuits):
        precommitted = circ.precommitted(ps.cs, ps.shared)
        aux = ps.cs.aux_assignment
        lo = S.num_shared_unpadded
        if len(aux) - lo < S.num_precommitted_unpadded:
            raise IncorrectWitnessError(
                "precommitted variables not allocated correctly")
        ps.W[S.num_shared : S.num_shared + S.num_precommitted_unpadded] = aux[
            lo : lo + S.num_precommitted_unpadded
        ]
        ps.precommitted = precommitted
        segs.append(_upload_mont(
            engine, ps.W[S.num_shared : S.num_shared + S.num_precommitted]))
    pcs = engine.pcs
    blinds = [pcs.blind(ck, S.num_precommitted, rng=rng) for _ in ps_list]
    raws = pcs.commit_raw_batch(ck, segs, is_small)
    comms = pcs.commit_from_raw_batch(ck, raws, blinds)
    for ps, blind, comm in zip(ps_list, blinds, comms):
        ps.comm_W_precommitted = comm
        ps.r_W_precommitted = blind


@dataclass
class PendingInstance:
    """Instance synthesis split at the rest-commit boundary so batch
    callers (NeutronNova) can fuse the per-step rest MSMs into one
    batched rows-MSM kernel (neutronnova_zk.rs:1662-1722 runs these
    under rayon; here the batch axis IS the kernel's row axis)."""

    ps: PrecommittedState
    challenges: list
    r_W_rest: HyraxBlind
    rest_mont: object       # (NL, num_rest) device planes (zeros path: zeros)
    actual_small: bool
    need_raw: bool          # rest raw-MSM cache miss — must commit
    zeros: bool             # num_rest_unpadded == 0: blind-only commit
    public_values: list


def instance_witness_begin(engine: Engine, ps: PrecommittedState,
                           S: SplitR1CSShape, ck, circuit, is_small: bool,
                           transcript: Transcript, rng=None) -> PendingInstance:
    """Phase 1 of bellpepper/r1cs.rs:411-537: absorb partial commitments,
    squeeze challenges, synthesize + upload the rest segment.  No device
    commit happens here — see instance_witness_finish."""
    pcs = engine.pcs
    if ps.comm_W_shared is not None:
        transcript.absorb_bytes(
            b"comm_W_shared", ps.comm_W_shared.to_transcript_bytes(engine.curve)
        )
    if ps.comm_W_precommitted is not None:
        transcript.absorb_bytes(
            b"comm_W_precommitted",
            ps.comm_W_precommitted.to_transcript_bytes(engine.curve),
        )
    challenges = [transcript.squeeze(b"challenge") for _ in range(S.num_challenges)]

    skip_synthesize = S.num_rest_unpadded == 0 and not challenges
    if not skip_synthesize:
        prep_aux = S.num_shared_unpadded + S.num_precommitted_unpadded
        del ps.cs.aux_assignment[prep_aux:]
        del ps.cs.input_assignment[1:]
        circuit.synthesize(ps.cs, ps.shared, ps.precommitted,
                           challenges if challenges else None)
        lo = S.num_shared + S.num_precommitted
        src = S.num_shared_unpadded + S.num_precommitted_unpadded
        ps.W[lo : lo + S.num_rest_unpadded] = ps.cs.aux_assignment[
            src : src + S.num_rest_unpadded
        ]

    r_W_rest = pcs.blind(ck, S.num_rest, rng=rng)
    lo = S.num_shared + S.num_precommitted
    if ps.W_prefix_mont is None:
        ps.W_prefix_mont = _upload_mont(engine, ps.W[:lo])

    if skip_synthesize:
        public_values = circuit.public_values()
    else:
        public_values = ps.cs.input_assignment[1 : 1 + S.num_public]

    if S.num_rest_unpadded == 0:
        return PendingInstance(
            ps=ps, challenges=challenges, r_W_rest=r_W_rest,
            rest_mont=jnp.zeros((NL, S.num_rest), jnp.int32),
            actual_small=True, need_raw=False, zeros=True,
            public_values=public_values)

    rest = ps.W[lo : lo + S.num_rest]
    actual_small = is_small or all(
        v < (1 << 64) for v in ps.W[lo : lo + S.num_rest_unpadded]
    )
    # raw-MSM cache: a re-prove with the same rest witness (the
    # common prep-reuse pattern) skips the full row MSM and only
    # adds the fresh blinds (spartan.rs cached_rest_msm)
    rest_key = hash(tuple(rest))
    need_raw = ps.rest_raw is None or ps.rest_key != rest_key
    if need_raw:
        ps.rest_mont = _upload_mont(engine, rest)
        ps.rest_key = rest_key
        ps.rest_raw = None
    return PendingInstance(
        ps=ps, challenges=challenges, r_W_rest=r_W_rest,
        rest_mont=ps.rest_mont, actual_small=actual_small,
        need_raw=need_raw, zeros=False, public_values=public_values)


def instance_witness_finish(engine: Engine, pend: PendingInstance,
                            S: SplitR1CSShape, comm_W_rest,
                            transcript: Transcript):
    """Phase 2: absorb the rest commitment, assemble (U, W)."""
    pcs = engine.pcs
    ps = pend.ps
    transcript.absorb_bytes(
        b"comm_W_rest", comm_W_rest.to_transcript_bytes(engine.curve)
    )
    U = SplitR1CSInstance(
        comm_W_shared=ps.comm_W_shared,
        comm_W_precommitted=ps.comm_W_precommitted,
        comm_W_rest=comm_W_rest,
        public_values=pend.public_values,
        challenges=pend.challenges,
    )
    blinds = [b for b in (ps.r_W_shared, ps.r_W_precommitted) if b is not None]
    blinds.append(pend.r_W_rest)
    r_W = pcs.combine_blinds(blinds)
    lo = S.num_shared + S.num_precommitted
    W_dev = (jnp.concatenate([ps.W_prefix_mont, pend.rest_mont], axis=1)
             if lo else pend.rest_mont)
    W = R1CSWitness(W=W_dev, r_W=r_W, is_small=pend.actual_small,
                    W_host=list(ps.W))
    return U, W


def commit_pending_batch(engine: Engine, ck, S: SplitR1CSShape,
                         pendings: list[PendingInstance]) -> list:
    """Commit many pending instances' rest segments with batched device
    kernels: one raw rows-MSM over all cache-miss instances, one blind
    rows-MSM + one affine pull over all instances."""
    from ..utils.tracing import span as _span

    pcs = engine.pcs
    out: list = [None] * len(pendings)
    live = []
    for i, p in enumerate(pendings):
        if p.zeros:
            out[i] = pcs.commit_zeros(ck, S.num_rest, p.r_W_rest)
        else:
            live.append(i)
    need = [i for i in live if pendings[i].need_raw]
    if need:
        # full-width tables are always sound; the 64-bit fast tables
        # need EVERY batched instance small
        small = all(pendings[i].actual_small for i in need)
        with _span("commit_rest_raw_msm_batch", n=len(need)):
            raws = pcs.commit_raw_batch(
                ck, [pendings[i].ps.rest_mont for i in need], small)
        for i, raw in zip(need, raws):
            pendings[i].ps.rest_raw = raw
    if live:
        with _span("commit_rest_blind_batch", n=len(live)):
            comms = pcs.commit_from_raw_batch(
                ck, [pendings[i].ps.rest_raw for i in live],
                [pendings[i].r_W_rest for i in live])
        for i, cm in zip(live, comms):
            out[i] = cm
    return out


def r1cs_instance_and_witness(engine: Engine, ps: PrecommittedState,
                              S: SplitR1CSShape, ck, circuit, is_small: bool,
                              transcript: Transcript, rng=None):
    """bellpepper/r1cs.rs:411-537: absorb partial commitments, squeeze
    challenges, synthesize the rest, commit it."""
    from ..utils.tracing import span as _span

    pcs = engine.pcs
    pend = instance_witness_begin(engine, ps, S, ck, circuit, is_small,
                                  transcript, rng)
    if pend.zeros:
        comm_W_rest = pcs.commit_zeros(ck, S.num_rest, pend.r_W_rest)
    else:
        if pend.need_raw:
            with _span("commit_rest_raw_msm"):
                ps.rest_raw = pcs.commit_raw(ck, ps.rest_mont,
                                             pend.actual_small)
        with _span("commit_rest_blind") as sp:
            comm_W_rest = pcs.commit_from_raw(ck, ps.rest_raw, pend.r_W_rest)
            sp.sync()
    return instance_witness_finish(engine, pend, S, comm_W_rest, transcript)


# ---------------------------------------------------------------------------
# SNARK
# ---------------------------------------------------------------------------


class SpartanSNARK:
    """R1CSSNARKTrait equivalent (traits/snark.rs:15-51)."""

    @staticmethod
    def setup(engine: Engine, circuit, width: int = 2048):
        S = SplitR1CSShape.from_circuit(circuit, engine.scalar, width)
        S.attach_device(engine.fs)
        ck, vk_ee = engine.pcs.setup(b"ck", S.num_vars, width)
        ck_s, _ = engine.pcs.setup(b"ck_s", 1, 1)
        digest = vk_digest(S, ck, ck_s)
        pk = SpartanProverKey(engine, S, ck, ck_s, digest)
        vk = SpartanVerifierKey(engine, S, vk_ee, ck_s, digest)
        return pk, vk

    @staticmethod
    def prep_prove(pk: SpartanProverKey, circuit, is_small: bool = False,
                   rng=None) -> SpartanPrepSNARK:
        ps = shared_witness(pk.engine, pk.S, pk.ck, circuit, is_small, rng)
        precommitted_witness(pk.engine, ps, pk.S, pk.ck, circuit, is_small, rng)
        # cache prefix limb planes + prefix Az/Bz/Cz so every prove only
        # runs the filtered suffix SpMV (reference prep caching,
        # spartan.rs:176-216 + r1cs/mod.rs:1112-1211)
        S = pk.S
        lo = S.num_shared + S.num_precommitted
        if 0 < lo < S.num_cols and S._device is not None:
            ps.W_prefix_mont = _upload_mont(pk.engine, ps.W[:lo])
            ps.matvec_cache = S.multiply_vec_precommitted_device(
                ps.W_prefix_mont)
        return SpartanPrepSNARK(ps=ps)

    @staticmethod
    def prove(pk: SpartanProverKey, circuit, prep: SpartanPrepSNARK,
              is_small: bool = False, rng=None, mesh=None):
        """Produce a proof.  With ``mesh`` (a jax.sharding.Mesh), the outer
        sum-check's large rounds run lane-sharded across the mesh with
        psum'd evaluation columns (parallel/sumcheck_shard.py); remaining
        rounds and the rest of the pipeline run single-device."""
        engine = pk.engine
        S = pk.S
        ops = engine.fs
        p = engine.scalar.modulus

        transcript = engine.transcript(b"SpartanSNARK")
        transcript.absorb_bytes(b"vk", pk.vk_digest)
        public_values = circuit.public_values()
        transcript.absorb_scalars(b"public_values", public_values)

        with span("witness_and_instance") as sp:
            U, W = r1cs_instance_and_witness(
                engine, prep.ps, S, pk.ck, circuit, is_small, transcript, rng
            )
            sp.sync(W.W)

        # z = (W, 1, public, challenges): only the tiny IO tail is
        # uploaded per proof; consumers (suffix SpMV, inner round 0)
        # assemble their z views INSIDE their kernels — eager slices/
        # concats of 2^21-wide planes each cost a tunnel dispatch and a
        # full HBM pass
        num_vars = S.num_vars
        tail_vals = [1] + U.public_values + U.challenges
        tail = _upload_mont(engine, tail_vals)

        num_rounds_x = _log2(S.num_cons)
        num_rounds_y = _log2(num_vars) + 1

        taus = [transcript.squeeze(b"t") for _ in range(num_rounds_x)]

        with span("matrix_vector_multiply") as sp:
            if prep.ps.matvec_cache is not None:
                Az, Bz, Cz = S.multiply_vec_incremental_device(
                    W.W, tail, prep.ps.matvec_cache)
            else:
                pad_c = jnp.zeros(
                    (NL, S.num_cols - num_vars - len(tail_vals)), jnp.int32)
                Az, Bz, Cz = S.multiply_vec_device(
                    jnp.concatenate([W.W, tail, pad_c], axis=1))
            sp.sync(Az, Bz, Cz)

        # ---- outer sum-check (device rounds, device transcript) ----
        td = DeviceTranscript(ops, state=jnp.asarray(
            np.frombuffer(transcript.state, np.uint8)), round=transcript.round)
        zero = ops.const(0)
        from ..sumcheck.fused import fused_cubic_ok, get_fused_cubic_eq, \
            get_fused_quad, FUSED_MIN_ROUNDS
        import os as _os

        fused_on = _os.environ.get("SPARTAN2_FUSED", "1") != "0"
        with span("outer_sumcheck", rounds=num_rounds_x) as sp_outer:
            if mesh is not None and (1 << num_rounds_x) > mesh.devices.size:
                from ..parallel.fused_shard import get_fused_sharded_cubic_eq

                fsh = get_fused_sharded_cubic_eq(ops, mesh)
                if (fused_on and fused_cubic_ok(engine.scalar, taus)
                        and fsh.shardable(num_rounds_x)):
                    # ONE shard_map dispatch for all rounds (psum'd
                    # column sums per round, replicated tail)
                    cbuf, rx_stack, finals_outer, _ = fsh.prove(
                        td, Az, Bz, Cz, zero, taus, engine.scalar,
                        zero_check=True)
                    outer_coeff_cat = cbuf.reshape(NL, 4 * num_rounds_x)
                else:
                    # per-round sharded Gruen/BDDT rounds + single-device
                    # tail — byte-identical to the non-mesh path below
                    from ..parallel.sumcheck_shard import get_sharded_cubic_eq

                    coeffs_outer, r_x_dev, finals_outer, _ = (
                        get_sharded_cubic_eq(ops, mesh).prove(
                            td, Az, Bz, Cz, zero, taus, engine.scalar,
                            zero_check=True))
                    rx_stack = jnp.stack(r_x_dev, axis=1)
                    outer_coeff_cat = jnp.concatenate(coeffs_outer, axis=1)
            elif fused_on and fused_cubic_ok(engine.scalar, taus):
                # whole-sum-check dispatch (sumcheck/fused.py).  When the
                # constraint count sits between powers of two, peel the
                # zero-structured round 0 so the remaining rounds run at
                # HALF the fused grid (reference hi_eff zero tracking,
                # multilinear.rs:36-43 / r1cs/mod.rs:1250-1270).
                fp = get_fused_cubic_eq(ops)
                if fp.peel_ok(engine.scalar, taus, S.num_cons_unpadded):
                    cbuf, rx_stack, finals_outer, _ = fp.prove_peeled(
                        td, Az, Bz, Cz, zero, taus, engine.scalar,
                        S.num_cons_unpadded, zero_check=True)
                else:
                    cbuf, rx_stack, finals_outer, _ = fp.prove(
                        td, Az, Bz, Cz, zero, taus, engine.scalar,
                        zero_check=True)
                outer_coeff_cat = cbuf.reshape(NL, 4 * num_rounds_x)
            else:
                # Gruen/BDDT eq-split: no 2^m eq table, 2 sums per round
                coeffs_outer, r_x_dev, finals_outer, _ = (
                    get_cubic_eq_prover(ops).prove(
                        td, Az, Bz, Cz, zero, taus, engine.scalar,
                        zero_check=True))
                rx_stack = jnp.stack(r_x_dev, axis=1)
                outer_coeff_cat = jnp.concatenate(coeffs_outer, axis=1)
            sp_outer.sync(td.state, *finals_outer)
        # ONE host sync for the transcript state + all three final claims
        import jax

        with span("outer_sync_pull"):
            state_np, finals_arr = jax.device_get(
                (td.state, jnp.stack(finals_outer, axis=1)))
        transcript.state = state_np.tobytes()
        transcript.round = td.round
        claim_Az, claim_Bz, claim_Cz = limbs_to_ints(
            finals_arr, engine.scalar, mont=True)
        transcript.absorb_scalars(b"claims_outer", [claim_Az, claim_Bz, claim_Cz])

        # ---- inner sum-check ----
        r = transcript.squeeze(b"r")
        claim_inner = (claim_Az + r * claim_Bz + r * r * claim_Cz) % p

        r_mont = _upload_mont(engine, [r])[:, 0]
        with span("prepare_poly_ABC") as sp:
            # the eq(r_x) table is built inside the kernel from the
            # device-resident challenges — no host round trip, ONE dispatch
            poly_ABC = S.bind_and_prepare_poly_ABC_device(rx_stack, r_mont)
            sp.sync(poly_ABC)

        num_extra = 1 + S.num_public + S.num_challenges
        td = DeviceTranscript(ops, state=jnp.asarray(
            np.frombuffer(transcript.state, np.uint8)), round=transcript.round)
        inner0 = get_inner_round0(ops)
        claim_dev = _upload_mont(engine, [claim_inner])[:, 0]
        # nonzero prefix of W and of poly_ABC's variable columns: segment
        # padding zeroes everything past the rest segment's unpadded end
        w_eff = S.num_shared + S.num_precommitted + S.num_rest_unpadded
        with span("inner_round0") as sp:
            abc_b, z_b, claim_dev, r0_dev, coeffs_r0 = inner0.run(
                td, poly_ABC, W.W, tail, claim_dev, num_vars, num_extra,
                w_eff
            )
            sp.sync(abc_b, z_b)
        prover_quad = get_quad_prover(ops)
        inner_coeff_cat = None
        with span("inner_sumcheck", rounds=num_rounds_y) as sp_inner:
            if mesh is not None and num_vars > mesh.devices.size:
                from ..parallel.mesh import lane_sharding
                from ..parallel.sumcheck_shard import ShardedSumcheckQuad

                import jax

                from ..parallel.mesh import replicated

                sh = lane_sharding(mesh)
                abc_b = jax.device_put(abc_b, sh)
                z_b = jax.device_put(z_b, sh)
                rep = replicated(mesh)
                claim_dev = jax.device_put(claim_dev, rep)
                td.state = jax.device_put(td.state, rep)
                sharded_q = ShardedSumcheckQuad(ops, mesh)
                (abc_b, z_b), coeffs_shq, r_shq, claim_dev = (
                    sharded_q.prove(td, abc_b, z_b, claim_dev))
                dev0 = jax.devices()[0]
                abc_b, z_b, claim_dev = (
                    jax.device_put(x, dev0) for x in (abc_b, z_b, claim_dev))
                td.state = jax.device_put(td.state, dev0)
                # the sharded rounds' coefficient/challenge outputs are
                # mesh-replicated; the batched tail pull concatenates
                # them with single-device arrays
                coeffs_shq = [jax.device_put(c, dev0) for c in coeffs_shq]
                r_shq = [jax.device_put(r, dev0) for r in r_shq]
                coeffs_inner, r_y_dev, finals_inner, _ = prover_quad.prove(
                    td, abc_b, z_b, claim_dev,
                    num_rounds_y - 1 - len(r_shq))
                coeffs_inner = coeffs_shq + coeffs_inner
                r_y_dev = r_shq + list(r_y_dev)
            elif fused_on and num_rounds_y - 1 >= FUSED_MIN_ROUNDS:
                cq, rq, finals_inner, _ = get_fused_quad(ops).prove(
                    td, abc_b, z_b, claim_dev, num_rounds_y - 1)
                n_inner = num_rounds_y - 1
                inner_coeff_cat = jnp.concatenate(
                    [coeffs_r0, cq.reshape(NL, 3 * n_inner)], axis=1)
                ry_cat = jnp.concatenate(
                    [r0_dev[:, None], rq, finals_inner[1][:, None]], axis=1)
            else:
                coeffs_inner, r_y_dev, finals_inner, _ = prover_quad.prove(
                    td, abc_b, z_b, claim_dev, num_rounds_y - 1
                )
            sp_inner.sync(td.state, *finals_inner)
        if inner_coeff_cat is None:
            n_inner = len(coeffs_inner)
            inner_coeff_cat = jnp.concatenate([coeffs_r0] + coeffs_inner,
                                              axis=1)
            ry_cat = jnp.stack(
                [r0_dev] + list(r_y_dev) + [finals_inner[1]], axis=1)
        # Batched host pulls: one transfer per group instead of per round.
        with span("tail_sync_pull"):
         state_np, outer_arr, inner_arr, tail_arr = jax.device_get((
            td.state, outer_coeff_cat, inner_coeff_cat, ry_cat,
        ))
        transcript.state = state_np.tobytes()
        transcript.round = td.round
        outer_vals = limbs_to_ints(outer_arr, engine.scalar, mont=True)
        sc_proof_outer = SumcheckProof(engine.scalar, [
            UniPoly(engine.scalar, outer_vals[4 * i : 4 * i + 4]).compress()
            for i in range(num_rounds_x)
        ])

        inner_vals = limbs_to_ints(inner_arr, engine.scalar, mont=True)
        sc_proof_inner = SumcheckProof(engine.scalar, [
            UniPoly(engine.scalar, inner_vals[3 * i : 3 * i + 3]).compress()
            for i in range(1 + n_inner)
        ])

        tail_vals = limbs_to_ints(tail_arr, engine.scalar, mont=True)
        r_y = tail_vals[: 1 + n_inner]
        eval_Z = tail_vals[-1]

        # eval_W = (eval_Z - r_y[0] * eval_X) / (1 - r_y[0])  (Z = (W, 1, X))
        X = U.public_values + U.challenges
        eval_X = sparse_poly_evaluate_host(
            engine.scalar, num_rounds_y - 1, [1] + X, r_y[1:]
        )
        denom = (1 - r_y[0]) % p
        if denom == 0:
            raise DivisionByZeroError("division by zero in eval_W")
        eval_W = (eval_Z - r_y[0] * eval_X) * pow(denom, -1, p) % p

        # ---- PCS evaluation proof ----
        blind_eval_W = engine.pcs.blind(pk.ck_s, 1, rng=rng)
        comm_eval_W = engine.pcs.commit_host(pk.ck_s, [eval_W], blind_eval_W)
        comm_W, _ = U.to_regular(engine.pcs)
        with span("pcs_prove"):
            eval_arg = engine.pcs.prove(
                pk.ck, pk.ck_s, transcript, comm_W, W.W, W.r_W, r_y[1:],
                comm_eval_W, blind_eval_W, rng=rng,
            )

        proof = SpartanSNARKProof(
            U=U,
            sc_proof_outer=sc_proof_outer,
            claims_outer=(claim_Az, claim_Bz, claim_Cz),
            sc_proof_inner=sc_proof_inner,
            eval_W=eval_W,
            blind_eval_W=blind_eval_W,
            eval_arg=eval_arg,
        )
        return proof, prep

    @staticmethod
    def verify(proof: SpartanSNARKProof, vk: SpartanVerifierKey) -> list[int]:
        """Reference verify (spartan.rs:469-578). Fully host-side."""
        engine = vk.engine
        S = vk.S
        p = engine.scalar.modulus
        transcript = engine.transcript(b"SpartanSNARK")
        transcript.absorb_bytes(b"vk", vk.digest)
        transcript.absorb_scalars(b"public_values", proof.U.public_values)

        proof.U.validate(S, engine.pcs, transcript)
        comm_W, X = proof.U.to_regular(engine.pcs)

        num_vars = S.num_vars
        num_rounds_x = _log2(S.num_cons)
        num_rounds_y = _log2(num_vars) + 1

        taus = [transcript.squeeze(b"t") for _ in range(num_rounds_x)]

        claim_outer_final, r_x = proof.sc_proof_outer.verify(
            0, num_rounds_x, 3, transcript
        )
        claim_Az, claim_Bz, claim_Cz = proof.claims_outer
        taus_bound_rx = eq_evaluate(engine.scalar, taus, r_x)
        expected = taus_bound_rx * (claim_Az * claim_Bz - claim_Cz) % p
        if claim_outer_final % p != expected:
            raise ProofVerifyError("invalid outer sum-check claim")

        transcript.absorb_scalars(b"claims_outer",
                                  [claim_Az, claim_Bz, claim_Cz])

        r = transcript.squeeze(b"r")
        claim_inner = (claim_Az + r * claim_Bz + r * r * claim_Cz) % p
        claim_inner_final, r_y = proof.sc_proof_inner.verify(
            claim_inner, num_rounds_y, 2, transcript
        )

        eval_X = sparse_poly_evaluate_host(
            engine.scalar, num_rounds_y - 1, [1] + X, r_y[1:]
        )
        eval_Z = ((1 - r_y[0]) * proof.eval_W + r_y[0] * eval_X) % p

        eval_A, eval_B, eval_C = S.evaluate_at(r_x, r_y)
        expected_inner = (eval_A + r * eval_B + r * r * eval_C) * eval_Z % p
        if claim_inner_final % p != expected_inner:
            raise ProofVerifyError("invalid inner sum-check claim")

        comm_eval_W = engine.pcs.commit_host(vk.ck_s, [proof.eval_W],
                                             proof.blind_eval_W)
        engine.pcs.verify(vk.vk_ee, vk.ck_s, transcript, comm_W, r_y[1:],
                          comm_eval_W, proof.eval_arg)
        return list(proof.U.public_values)
