"""Deterministic binary serialization for proofs and keys.

Reference: everything long-lived derives Serialize/Deserialize with
bincode as the wire format (SURVEY.md section 5 checkpoint/resume; proof
sizes measured via bincode, benches/sha256_spartan.rs:176).  This codec
is bincode-like: little-endian u64 length prefixes, scalars as 32-byte
LE, points as 65-byte (x, y, infinity-flag) — deterministic and
versioned, but not byte-identical to the Rust stream (we do not target
bit-identical proofs; see ec/curve.py on generator derivation).
"""

from __future__ import annotations

import struct

from ..errors import SpartanError
from ..field.constants import FieldSpec
from ..pcs.hyrax import HyraxBlind, HyraxCommitment, HyraxEvaluationArgument, IpaProof
from ..polys.univariate import CompressedUniPoly
from ..sumcheck.verify import SumcheckProof

MAGIC = b"SP2TPU01"


class Writer:
    def __init__(self, field: FieldSpec, curve):
        self.field = field
        self.curve = curve
        self.buf = bytearray(MAGIC)

    def u64(self, v: int):
        self.buf += struct.pack("<Q", v)

    def scalar(self, v: int):
        self.buf += self.field.to_bytes(v)

    def scalars(self, vs):
        self.u64(len(vs))
        for v in vs:
            self.scalar(v)

    def point(self, pt):
        self.buf += self.curve.point_bytes(pt)

    def commitment(self, c: HyraxCommitment):
        self.u64(len(c.comm))
        for pt in c.comm:
            self.point(pt)

    def opt_commitment(self, c):
        self.buf += b"\x01" if c is not None else b"\x00"
        if c is not None:
            self.commitment(c)

    def blind(self, b: HyraxBlind):
        self.scalars(b.blind)

    def sumcheck(self, proof: SumcheckProof):
        self.u64(len(proof.compressed_polys))
        for cp in proof.compressed_polys:
            self.scalars(cp.coeffs_except_linear)

    def ipa(self, ipa: IpaProof):
        self.point(ipa.delta)
        self.point(ipa.beta)
        self.scalars(ipa.z_vec)
        self.scalar(ipa.z_delta)
        self.scalar(ipa.z_beta)

    def bytes_out(self) -> bytes:
        return bytes(self.buf)


class Reader:
    def __init__(self, field: FieldSpec, curve, data: bytes):
        if data[:8] != MAGIC:
            raise SpartanError("bad magic in serialized object")
        self.field = field
        self.curve = curve
        self.data = data
        self.pos = 8

    def take(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise SpartanError("truncated serialized object")
        self.pos += n
        return out

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def scalar(self) -> int:
        return self.field.from_bytes(self.take(32))

    def scalars(self) -> list[int]:
        return [self.scalar() for _ in range(self.u64())]

    def point(self):
        return self.curve.point_from_bytes(self.take(65))

    def commitment(self) -> HyraxCommitment:
        return HyraxCommitment([self.point() for _ in range(self.u64())])

    def opt_commitment(self):
        return self.commitment() if self.take(1) == b"\x01" else None

    def blind(self) -> HyraxBlind:
        return HyraxBlind(self.scalars())

    def sumcheck(self) -> SumcheckProof:
        n = self.u64()
        return SumcheckProof(
            self.field,
            [CompressedUniPoly(self.field, self.scalars()) for _ in range(n)],
        )

    def ipa(self) -> IpaProof:
        return IpaProof(self.point(), self.point(), self.scalars(),
                        self.scalar(), self.scalar())

    def done(self):
        if self.pos != len(self.data):
            raise SpartanError("trailing bytes in serialized object")


# ---------------------------------------------------------------------------
# proofs
# ---------------------------------------------------------------------------


def _write_split_instance(w: Writer, U):
    w.opt_commitment(U.comm_W_shared)
    w.opt_commitment(U.comm_W_precommitted)
    w.commitment(U.comm_W_rest)
    w.scalars(U.public_values)
    w.scalars(U.challenges)


def _read_split_instance(r: Reader):
    from ..r1cs.shape import SplitR1CSInstance

    return SplitR1CSInstance(
        comm_W_shared=r.opt_commitment(),
        comm_W_precommitted=r.opt_commitment(),
        comm_W_rest=r.commitment(),
        public_values=r.scalars(),
        challenges=r.scalars(),
    )


def spartan_proof_to_bytes(proof, engine) -> bytes:
    w = Writer(engine.scalar, engine.curve)
    _write_split_instance(w, proof.U)
    w.sumcheck(proof.sc_proof_outer)
    w.scalars(list(proof.claims_outer))
    w.sumcheck(proof.sc_proof_inner)
    w.scalar(proof.eval_W)
    w.blind(proof.blind_eval_W)
    w.ipa(proof.eval_arg.ipa)
    return w.bytes_out()


def spartan_proof_from_bytes(data: bytes, engine):
    from ..snark.spartan import SpartanSNARKProof

    r = Reader(engine.scalar, engine.curve, data)
    U = _read_split_instance(r)
    outer = r.sumcheck()
    claims = tuple(r.scalars())
    inner = r.sumcheck()
    eval_W = r.scalar()
    blind = r.blind()
    ipa = r.ipa()
    r.done()
    return SpartanSNARKProof(U=U, sc_proof_outer=outer, claims_outer=claims,
                             sc_proof_inner=inner, eval_W=eval_W,
                             blind_eval_W=blind,
                             eval_arg=HyraxEvaluationArgument(ipa))


def _write_relaxed_instance(w: Writer, U):
    w.commitment(U.comm_W)
    w.commitment(U.comm_E)
    w.scalar(U.u)
    w.scalars(U.X)


def _read_relaxed_instance(r: Reader):
    from ..r1cs.relaxed import RelaxedR1CSInstance

    return RelaxedR1CSInstance(comm_W=r.commitment(), comm_E=r.commitment(),
                               u=r.scalar(), X=r.scalars())


def _write_relaxed_snark(w: Writer, rp):
    w.sumcheck(rp.sc_proof_outer)
    w.scalars(list(rp.claims_outer))
    w.sumcheck(rp.sc_proof_inner)
    w.scalars(rp.v_W)
    w.scalar(rp.blind_W)
    w.scalars(rp.v_E)
    w.scalar(rp.blind_E)


def _read_relaxed_snark(r: Reader):
    from ..snark.spartan_relaxed import RelaxedR1CSSpartanProof

    return RelaxedR1CSSpartanProof(
        sc_proof_outer=r.sumcheck(), claims_outer=tuple(r.scalars()),
        sc_proof_inner=r.sumcheck(), v_W=r.scalars(), blind_W=r.scalar(),
        v_E=r.scalars(), blind_E=r.scalar(),
    )


def _write_multiround_instance(w: Writer, U):
    w.u64(len(U.comm_w_per_round))
    for c in U.comm_w_per_round:
        w.commitment(c)
    w.scalars(U.public_values)
    w.u64(len(U.challenges_per_round))
    for ch in U.challenges_per_round:
        w.scalars(ch)


def _read_multiround_instance(r: Reader):
    from ..r1cs.multiround import SplitMultiRoundR1CSInstance

    comms = [r.commitment() for _ in range(r.u64())]
    public_values = r.scalars()
    chals = [r.scalars() for _ in range(r.u64())]
    return SplitMultiRoundR1CSInstance(comm_w_per_round=comms,
                                       public_values=public_values,
                                       challenges_per_round=chals)


def spartan_zk_proof_to_bytes(proof, engine) -> bytes:
    w = Writer(engine.scalar, engine.curve)
    _write_split_instance(w, proof.U)
    _write_multiround_instance(w, proof.U_verifier)
    _write_relaxed_instance(w, proof.random_U)
    w.commitment(proof.nifs.comm_T)
    _write_relaxed_snark(w, proof.relaxed_snark)
    w.ipa(proof.eval_arg.ipa)
    return w.bytes_out()


def spartan_zk_proof_from_bytes(data: bytes, engine):
    from ..r1cs.relaxed import NovaNIFS
    from ..snark.spartan_zk import SpartanZkSNARKProof

    r = Reader(engine.scalar, engine.curve, data)
    U = _read_split_instance(r)
    U_verifier = _read_multiround_instance(r)
    random_U = _read_relaxed_instance(r)
    nifs = NovaNIFS(comm_T=r.commitment())
    relaxed = _read_relaxed_snark(r)
    ipa = r.ipa()
    r.done()
    return SpartanZkSNARKProof(U=U, U_verifier=U_verifier, random_U=random_U,
                               nifs=nifs, relaxed_snark=relaxed,
                               eval_arg=HyraxEvaluationArgument(ipa))


def neutronnova_proof_to_bytes(proof, engine) -> bytes:
    w = Writer(engine.scalar, engine.curve)
    w.opt_commitment(proof.comm_W_shared)
    w.u64(len(proof.step_instances))
    for u in proof.step_instances:
        _write_split_instance(w, u)
    _write_split_instance(w, proof.core_instance)
    _write_multiround_instance(w, proof.U_verifier)
    _write_relaxed_instance(w, proof.random_U)
    w.commitment(proof.nifs.comm_T)
    _write_relaxed_snark(w, proof.relaxed_snark)
    w.ipa(proof.eval_arg.ipa)
    return w.bytes_out()


def neutronnova_proof_from_bytes(data: bytes, engine):
    from ..r1cs.relaxed import NovaNIFS
    from ..snark.neutronnova import NeutronNovaProof

    r = Reader(engine.scalar, engine.curve, data)
    comm_shared = r.opt_commitment()
    steps = [_read_split_instance(r) for _ in range(r.u64())]
    core = _read_split_instance(r)
    U_verifier = _read_multiround_instance(r)
    random_U = _read_relaxed_instance(r)
    nifs = NovaNIFS(comm_T=r.commitment())
    relaxed = _read_relaxed_snark(r)
    ipa = r.ipa()
    r.done()
    return NeutronNovaProof(comm_W_shared=comm_shared, step_instances=steps,
                            core_instance=core, U_verifier=U_verifier,
                            random_U=random_U, nifs=nifs,
                            relaxed_snark=relaxed,
                            eval_arg=HyraxEvaluationArgument(ipa))
