"""Multi-chip sum-check: lane-sharded round evaluation with psum.

This is the TPU-native form of the reference's two-level blocked
reduction (sumcheck.rs:389-491; SURVEY.md section 5 "eq-split"):
the hypercube axis is sharded across the mesh's data axis; each chip
computes its local wide-accumulator COLUMN SUMS (delayed reduction —
no Montgomery reduce inside the loop), the (ACC_COLS,) integer column
vectors are psum'd over ICI (tiny: ~46 int32 values per evaluation
point), and the single REDC runs replicated.

The per-round transcript (Keccak squeeze) is replicated compute on all
chips — O(100) bytes, negligible — keeping the whole round a single
jitted SPMD program with no host round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..field.jnp_ops import NL, FieldOps
from ..utils.jitcache import cached_jit
from ..sumcheck.prove import (
    absorb_unipoly,
    from_evals3_dev,
    from_evals4_dev,
    gruen_finish,
    gruen_pack,
    round_dev,
    unipoly_eval_dev,
)
from ..transcript.device import DeviceTranscript
from .mesh import DATA_AXIS


class ShardedSumcheckCubic:
    """prove_cubic_with_three_inputs with the batch axis sharded.

    Semantically identical to sumcheck.prove.SumcheckProverCubic (same
    transcript bytes, same messages); the evaluation sums and binds run
    sharded, with one psum of integer columns per evaluation point.
    """

    def __init__(self, ops: FieldOps, mesh: Mesh):
        self.ops = ops
        self.mesh = mesh

    def _partial_cols(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Local delayed-reduction column sums of <a, b>: (ACC_COLS,)."""
        ops = self.ops
        t = ops._mul_cols(a, b)
        cols = ops._parallel_carry(t)
        n = a.shape[-1]
        while n > 1:
            k = min(n, 4096)
            cols = cols.reshape(cols.shape[:-1] + (n // k, k)).sum(axis=-1)
            cols = ops._parallel_carry(cols)
            n //= k
        return cols[..., 0]

    @functools.lru_cache(maxsize=None)
    def _step(self, n: int):
        ops = self.ops
        mesh = self.mesh
        spec = P(None, DATA_AXIS)

        def local_evals(eq, A, Bp, C):
            """Per-shard evaluation-point column sums; psum over chips."""
            half = eq.shape[1] // 2
            eq_l, eq_h = eq[:, :half], eq[:, half:]
            A_l, A_h = A[:, :half], A[:, half:]
            B_l, B_h = Bp[:, :half], Bp[:, half:]
            C_l, C_h = C[:, :half], C[:, half:]

            def eval_at(eqv, Av, Bv, Cv):
                u = ops.sub(ops.mont_mul(Av, Bv), Cv)
                return self._partial_cols(eqv, u)

            eq_d, A_d = ops.sub(eq_h, eq_l), ops.sub(A_h, A_l)
            B_d, C_d = ops.sub(B_h, B_l), ops.sub(C_h, C_l)
            t0 = eval_at(eq_l, A_l, B_l, C_l)
            eq2, A2 = ops.add(eq_h, eq_d), ops.add(A_h, A_d)
            B2, C2 = ops.add(B_h, B_d), ops.add(C_h, C_d)
            t2 = eval_at(eq2, A2, B2, C2)
            eq3, A3 = ops.add(eq2, eq_d), ops.add(A2, A_d)
            B3, C3 = ops.add(B2, B_d), ops.add(C2, C_d)
            t3 = eval_at(eq3, A3, B3, C3)
            cols = jnp.stack([t0, t2, t3])  # (3, ACC_COLS)
            return jax.lax.psum(cols, DATA_AXIS)

        # NOTE: each shard's [lo | hi] halves must correspond to the global
        # halves — we shard the HALF arrays, not the full array, so the
        # shard boundary never crosses the lo/hi split.
        def step(eq_l, eq_h, A_l, A_h, B_l, B_h, C_l, C_h, claim, tstate, t_round):
            def shard_body(eq_l, eq_h, A_l, A_h, B_l, B_h, C_l, C_h):
                eq = jnp.concatenate([eq_l, eq_h], axis=1)
                A = jnp.concatenate([A_l, A_h], axis=1)
                Bp = jnp.concatenate([B_l, B_h], axis=1)
                C = jnp.concatenate([C_l, C_h], axis=1)
                return local_evals(eq, A, Bp, C)

            cols3 = shard_map(
                shard_body, mesh=mesh,
                in_specs=(spec,) * 8,
                out_specs=P(),
            )(eq_l, eq_h, A_l, A_h, B_l, B_h, C_l, C_h)

            t0 = ops.acc_reduce(cols3[0])
            t2 = ops.acc_reduce(cols3[1])
            t3 = ops.acc_reduce(cols3[2])
            e1 = ops.sub(claim, t0)
            coeffs = from_evals4_dev(ops, t0, e1, t2, t3)

            td = DeviceTranscript(ops, state=tstate,
                                  round=jnp.asarray(t_round, jnp.uint32))
            absorb_unipoly(td, coeffs)
            r = td.squeeze_mont(b"c")
            new_claim = unipoly_eval_dev(ops, coeffs, r)

            def bind_shard(lo, hi, r):
                rb = jnp.broadcast_to(r[:, None], lo.shape)
                return ops.add(lo, ops.mont_mul(rb, ops.sub(hi, lo)))

            bind = shard_map(
                bind_shard, mesh=mesh,
                in_specs=(spec, spec, P()),
                out_specs=spec,
            )
            eq_n = bind(eq_l, eq_h, r)
            A_n = bind(A_l, A_h, r)
            B_n = bind(B_l, B_h, r)
            C_n = bind(C_l, C_h, r)
            return eq_n, A_n, B_n, C_n, new_claim, r, coeffs, td.state

        return cached_jit(step, devices=list(self.mesh.devices.flat),
                          fastkey=("shard_cubic_step", self.ops.spec.name,
                                   self.mesh.devices.size, n))

    def prove(self, td: DeviceTranscript, eq, A, Bp, C, claim):
        """Run all rounds; arrays are (NL, n) device-sharded on axis 1."""
        n = eq.shape[1]
        coeffs_out, r_out = [], []
        n_dev = self.mesh.devices.size
        while n > max(1, n_dev):  # sharded rounds while each chip has work
            half = n // 2
            step = self._step(n)
            parts = []
            for arr in (eq, A, Bp, C):
                parts.extend([arr[:, :half], arr[:, half:]])
            eq, A, Bp, C, claim, r, coeffs, tstate = step(*parts, claim,
                                                          td.state, int(td.round))
            td.state = tstate
            td.round += 1
            coeffs_out.append(coeffs)
            r_out.append(r)
            n = half
        return (eq, A, Bp, C), coeffs_out, r_out, claim


class ShardedSumcheckCubicEq:
    """Gruen/BDDT eq-split outer sum-check with the hypercube axis
    sharded (A8) — byte-identical messages to the single-device
    SumcheckProverCubicEq (sumcheck/prove.py) and the same cost shape:
    2 N-scaling sums + 3 binds per round, NO 2^m eq table (the round-2
    sharded prover ran the explicit-eq engine: 3 sums + 4 binds + a
    full eq table on the mesh, ~2x the FLOPs; reference shape
    sumcheck.rs:920-1428).

    Mesh mapping: the flat half-hypercube is sharded in contiguous
    blocks.  For two-level rounds each chip owns el_len/n_dev rows of
    the (EL, ER) grid (the shard boundary never splits a row because
    el_len % n_dev == 0 is required for sharding); each chip contracts
    its rows against the replicated ER table, reduces against its EL
    slice (a static dynamic-slice by axis index into the one-shot flat
    constants upload), and psums ACC_COLS integer columns — the only
    collective, ~46 int32 per sum.  The Gruen finish algebra and the
    Keccak squeeze run replicated (gruen_finish — the shared helper
    guarantees the bytes match the single-device engine)."""

    def __init__(self, ops: FieldOps, mesh: Mesh):
        self.ops = ops
        self.mesh = mesh

    _partial_cols = ShardedSumcheckCubic._partial_cols

    @staticmethod
    def _shardable(spec_r: tuple, n_dev: int) -> bool:
        n, el_len, _zc, _fb, _c, _el, _er = spec_r
        half = n // 2
        if el_len:
            return el_len >= n_dev and el_len % n_dev == 0
        return half >= n_dev and half % n_dev == 0

    @functools.lru_cache(maxsize=None)
    def _step(self, spec_r: tuple):
        ops = self.ops
        mesh = self.mesh
        n_dev = mesh.devices.size
        n, el_len, zero_check, fallback, sl_c, sl_el, sl_er = spec_r
        half = n // 2
        sh = P(None, DATA_AXIS)

        def local_sums(A_l, A_h, B_l, B_h, C_l, C_h, flat):
            idx = jax.lax.axis_index(DATA_AXIS)
            A_d = ops.sub(A_h, A_l)
            B_d = ops.sub(B_h, B_l)

            def partial(f):
                if el_len:
                    L_loc = el_len // n_dev
                    R = half // el_len
                    EL = jax.lax.dynamic_slice_in_dim(
                        flat[:, sl_el[0] : sl_el[1]], idx * L_loc, L_loc,
                        axis=1)
                    ER = flat[:, sl_er[0] : sl_er[1]]
                    g = f.reshape(NL, L_loc, R)
                    t = ops._mul_cols(ER[:, None, :], g)
                    t = ops._parallel_carry(t)
                    m_ = R
                    while m_ > 1:
                        k = min(m_, 4096)
                        t = t.reshape(t.shape[:2] + (m_ // k, k)).sum(axis=-1)
                        t = ops._parallel_carry(t)
                        m_ //= k
                    inner = ops.acc_reduce(t[..., 0])  # (NL, L_loc)
                    return self._partial_cols(EL, inner)
                loc = half // n_dev
                W = jax.lax.dynamic_slice_in_dim(
                    flat[:, sl_er[0] : sl_er[1]], idx * loc, loc, axis=1)
                return self._partial_cols(W, f)

            outs = []
            if not zero_check:
                outs.append(partial(ops.sub(ops.mont_mul(A_l, B_l), C_l)))
            outs.append(partial(ops.mont_mul(A_d, B_d)))
            if fallback:
                outs.append(partial(ops.sub(
                    ops.mont_mul(ops.sub(ops.double(A_l), A_h),
                                 ops.sub(ops.double(B_l), B_h)),
                    ops.sub(ops.double(C_l), C_h))))
            return jax.lax.psum(jnp.stack(outs), DATA_AXIS)

        def step(A_l, A_h, B_l, B_h, C_l, C_h, flat, P_run, claim, tstate,
                 t_round):
            cols = shard_map(
                local_sums, mesh=mesh,
                in_specs=(sh,) * 6 + (P(),), out_specs=P(),
            )(A_l, A_h, B_l, B_h, C_l, C_h, flat)
            i = 0
            t0_raw = None
            if not zero_check:
                t0_raw = ops.acc_reduce(cols[i])
                i += 1
            tinf_raw = ops.acc_reduce(cols[i])
            i += 1
            tm1_raw = ops.acc_reduce(cols[i]) if fallback else None
            consts = flat[:, sl_c[0] : sl_c[1]]
            coeffs, r, new_claim, P_n, tstate = gruen_finish(
                ops, zero_check, fallback, consts, t0_raw, tinf_raw,
                tm1_raw, P_run, claim, tstate, t_round)

            def bind_shard(lo, hi, r):
                rb = jnp.broadcast_to(r[:, None], lo.shape)
                return ops.add(lo, ops.mont_mul(rb, ops.sub(hi, lo)))

            bind = shard_map(bind_shard, mesh=mesh,
                             in_specs=(sh, sh, P()), out_specs=sh)
            A_n = bind(A_l, A_h, r)
            B_n = bind(B_l, B_h, r)
            C_n = bind(C_l, C_h, r)
            return A_n, B_n, C_n, P_n, new_claim, r, coeffs, tstate

        return cached_jit(step, devices=list(self.mesh.devices.flat),
                          fastkey=("shard_cubiceq_step", self.ops.spec.name,
                                   self.mesh.devices.size, spec_r))

    def prove(self, td: DeviceTranscript, A, Bp, C, claim, taus: list[int],
              spec, zero_check: bool = False):
        """Drop-in for SumcheckProverCubicEq.prove: sharded rounds while
        every chip owns whole grid rows, then a single-device tail with
        the SAME flat upload and specs (run_from) — identical bytes."""
        import numpy as np

        from ..field.limbs import ints_to_limbs_np
        from ..sumcheck.prove import get_cubic_eq_prover

        ops = self.ops
        m = len(taus)
        assert A.shape[1] == 1 << m
        flat, specs = gruen_pack(spec, taus, zero_check)
        flat_dev = jnp.asarray(ints_to_limbs_np(flat, spec, mont=True))
        n_dev = self.mesh.devices.size
        P_run = ops.const(ops.spec.r_mod)
        coeffs_out, r_out = [], []
        j = 0
        while j < m and self._shardable(specs[j], n_dev):
            half = specs[j][0] // 2
            A_p, Bp_p, C_p = (
                (x[:, :half], x[:, half:]) for x in (A, Bp, C))
            A, Bp, C, P_run, claim, r, coeffs, tstate = self._step(specs[j])(
                *A_p, *Bp_p, *C_p, flat_dev, P_run, claim, td.state,
                round_dev(int(td.round)))
            td.state = tstate
            td.round += 1
            coeffs_out.append(coeffs)
            r_out.append(r)
            j += 1
        # gather the remainder onto one device; the single-device engine
        # continues from round j with the same constants and specs
        A, Bp, C, P_run, claim, flat_dev = (
            jnp.asarray(np.asarray(x))
            for x in (A, Bp, C, P_run, claim, flat_dev))
        td.state = jnp.asarray(np.asarray(td.state))
        cs2, rs2, finals, claim = get_cubic_eq_prover(ops).run_from(
            td, A, Bp, C, P_run, claim, flat_dev, specs, j)
        return coeffs_out + cs2, r_out + rs2, finals, claim


@functools.lru_cache(maxsize=None)
def get_sharded_cubic_eq(ops: FieldOps, mesh: Mesh) -> ShardedSumcheckCubicEq:
    return ShardedSumcheckCubicEq(ops, mesh)


class ShardedSumcheckQuad:
    """prove_quad (inner sum-check) with the hypercube axis sharded.

    Same transcript bytes as sumcheck.prove.SumcheckProverQuad: the two
    BDDT sums (t0, t_inf) are computed as local delayed-reduction column
    sums psum'd over the mesh, the round squeeze and claim update run
    replicated, and the bind stays shard-local (the [lo | hi] halves are
    passed as separate sharded arrays so the split never crosses a
    shard boundary)."""

    def __init__(self, ops: FieldOps, mesh: Mesh):
        self.ops = ops
        self.mesh = mesh

    _partial_cols = ShardedSumcheckCubic._partial_cols

    @functools.lru_cache(maxsize=None)
    def _step(self, n: int):
        ops = self.ops
        mesh = self.mesh
        spec = P(None, DATA_AXIS)

        def local_evals(A_l, A_h, B_l, B_h):
            t0 = self._partial_cols(A_l, B_l)
            t_inf = self._partial_cols(ops.sub(A_h, A_l), ops.sub(B_h, B_l))
            return jax.lax.psum(jnp.stack([t0, t_inf]), DATA_AXIS)

        def step(A_l, A_h, B_l, B_h, claim, tstate, t_round):
            cols2 = shard_map(
                local_evals, mesh=mesh,
                in_specs=(spec,) * 4, out_specs=P(),
            )(A_l, A_h, B_l, B_h)
            t0 = ops.acc_reduce(cols2[0])
            t_inf = ops.acc_reduce(cols2[1])
            e2 = ops.add(ops.sub(ops.double(claim),
                                 ops.add(ops.double(t0), t0)),
                         ops.double(t_inf))
            e1 = ops.sub(claim, t0)
            coeffs = from_evals3_dev(ops, t0, e1, e2)

            td = DeviceTranscript(ops, state=tstate,
                                  round=jnp.asarray(t_round, jnp.uint32))
            absorb_unipoly(td, coeffs)
            r = td.squeeze_mont(b"c")
            new_claim = unipoly_eval_dev(ops, coeffs, r)

            def bind_shard(lo, hi, r):
                rb = jnp.broadcast_to(r[:, None], lo.shape)
                return ops.add(lo, ops.mont_mul(rb, ops.sub(hi, lo)))

            bind = shard_map(
                bind_shard, mesh=mesh,
                in_specs=(spec, spec, P()), out_specs=spec,
            )
            A_n = bind(A_l, A_h, r)
            B_n = bind(B_l, B_h, r)
            return A_n, B_n, new_claim, r, coeffs, td.state

        return cached_jit(step, devices=list(self.mesh.devices.flat),
                          fastkey=("shard_quad_step", self.ops.spec.name,
                                   self.mesh.devices.size, n))

    def prove(self, td: DeviceTranscript, A, Bp, claim):
        """Sharded rounds while every chip has lanes; returns the
        remainder arrays for a single-device tail prover."""
        n = A.shape[1]
        coeffs_out, r_out = [], []
        n_dev = self.mesh.devices.size
        while n > max(1, n_dev):
            half = n // 2
            step = self._step(n)
            A, Bp, claim, r, coeffs, tstate = step(
                A[:, :half], A[:, half:], Bp[:, :half], Bp[:, half:],
                claim, td.state, int(td.round))
            td.state = tstate
            td.round += 1
            coeffs_out.append(coeffs)
            r_out.append(r)
            n = half
        return (A, Bp), coeffs_out, r_out, claim


class ShardedZkSumcheckCubic:
    """DeviceZkSumcheckCubic with the hypercube axis sharded (A8).

    Same message flow as the unsharded engine (sumcheck/zk_device.py):
    the per-round Fiat-Shamir challenge routes through the host
    verifier-circuit commit, so each round is two sharded device calls —
    one psum'd evaluation kernel, one shard-local bind — with the same
    tiny (3 evals x K instances) pull in between.  Tail rounds below the
    device count fall back to the unsharded engine with gathered arrays
    (byte-identical messages either way; asserted by tests/test_mesh.py).
    """

    def __init__(self, ops: FieldOps, mesh: Mesh):
        self.ops = ops
        self.mesh = mesh

    _partial_cols = ShardedSumcheckCubic._partial_cols

    @functools.lru_cache(maxsize=None)
    def _evals(self, n: int, K: int):
        ops = self.ops
        mesh = self.mesh
        spec = P(None, None, DATA_AXIS)
        spec_e = P(None, DATA_AXIS)

        def local(E_l, E_h, A_l, A_h, B_l, B_h, C_l, C_h):
            def eval_at(Ev, Av, Bv, Cv):
                u = ops.sub(ops.mont_mul(Av, Bv), Cv)  # (NL, K, loc)
                Eb = jnp.broadcast_to(Ev[:, None, :], u.shape)
                return self._partial_cols(Eb, u)  # (C, K)

            t0 = eval_at(E_l, A_l, B_l, C_l)
            E_d, A_d = ops.sub(E_h, E_l), ops.sub(A_h, A_l)
            B_d, C_d = ops.sub(B_h, B_l), ops.sub(C_h, C_l)
            E2, A2 = ops.add(E_h, E_d), ops.add(A_h, A_d)
            B2, C2 = ops.add(B_h, B_d), ops.add(C_h, C_d)
            t2 = eval_at(E2, A2, B2, C2)
            E3, A3 = ops.add(E2, E_d), ops.add(A2, A_d)
            B3, C3 = ops.add(B2, B_d), ops.add(C2, C_d)
            t3 = eval_at(E3, A3, B3, C3)
            return jax.lax.psum(jnp.stack([t0, t2, t3]), DATA_AXIS)

        def ev(E_l, E_h, A_l, A_h, B_l, B_h, C_l, C_h):
            cols = shard_map(
                local, mesh=mesh,
                in_specs=(spec_e, spec_e) + (spec,) * 6, out_specs=P(),
            )(E_l, E_h, A_l, A_h, B_l, B_h, C_l, C_h)
            return jnp.stack([ops.acc_reduce(cols[i]) for i in range(3)],
                             axis=2)  # (NL, K, 3)

        return cached_jit(ev, devices=list(self.mesh.devices.flat),
                          fastkey=("shard_zkc_evals", self.ops.spec.name,
                                   self.mesh.devices.size, n, K))

    @functools.lru_cache(maxsize=None)
    def _bind(self, n: int, K: int):
        ops = self.ops
        mesh = self.mesh
        spec = P(None, None, DATA_AXIS)
        spec_e = P(None, DATA_AXIS)

        def bind_shard(lo, hi, r):
            rb = jnp.broadcast_to(
                r.reshape((NL,) + (1,) * (lo.ndim - 1)), lo.shape)
            return ops.add(lo, ops.mont_mul(rb, ops.sub(hi, lo)))

        def b(E_l, E_h, A_l, A_h, B_l, B_h, C_l, C_h, r):
            bind_e = shard_map(bind_shard, mesh=mesh,
                               in_specs=(spec_e, spec_e, P()),
                               out_specs=spec_e)
            bind_k = shard_map(bind_shard, mesh=mesh,
                               in_specs=(spec, spec, P()), out_specs=spec)
            return (bind_e(E_l, E_h, r), bind_k(A_l, A_h, r),
                    bind_k(B_l, B_h, r), bind_k(C_l, C_h, r))

        return cached_jit(b, devices=list(self.mesh.devices.flat),
                          fastkey=("shard_zkc_bind", self.ops.spec.name,
                                   self.mesh.devices.size, n, K))

    def prove(self, spec, claims: list[int], E, polys, challenge_fn):
        """Drop-in for DeviceZkSumcheckCubic.prove (same signature minus
        self.ops): arrays (NL, n) / (NL, K, n) sharded on the last axis."""
        import numpy as np

        from ..field.limbs import ints_to_limbs_np, limbs_to_ints
        from ..polys.univariate import UniPoly
        from ..sumcheck.zk_device import DeviceZkSumcheckCubic, get_zk_cubic

        ops = self.ops
        p = spec.modulus
        A, B, C = polys
        K, n = A.shape[1], A.shape[2]
        es = [c % p for c in claims]
        rs: list[int] = []
        rnd = 0
        n_dev = self.mesh.devices.size
        while n > max(2, n_dev):
            half = n // 2
            parts = [E[:, :half], E[:, half:]]
            for arr in (A, B, C):
                parts.extend([arr[..., :half], arr[..., half:]])
            evals = self._evals(n, K)(*parts)
            ev = limbs_to_ints(np.asarray(evals).reshape(NL, -1), spec)
            unis = []
            for k in range(K):
                t0, t2, t3 = ev[3 * k : 3 * k + 3]
                unis.append(UniPoly.from_evals_deg3(
                    spec, [t0, (es[k] - t0) % p, t2, t3]))
            r = challenge_fn(rnd, unis)
            rs.append(r)
            es = [u.evaluate(r) for u in unis]
            r_dev = jnp.asarray(ints_to_limbs_np([r], spec, mont=True))[:, 0]
            E, A, B, C = self._bind(n, K)(*parts, r_dev)
            rnd += 1
            n = half
        # gather the tail to a single device; continue with the unsharded
        # engine (its round 0 does not bind — exactly the state we're in)
        E, A, B, C = (jnp.asarray(np.asarray(x)) for x in (E, A, B, C))
        done = rnd
        rs_tail, finals, E_out = get_zk_cubic(ops).prove(
            spec, es, E, (A, B, C),
            lambda i, unis: challenge_fn(done + i, unis))
        return rs + rs_tail, finals, E_out


class ShardedZkSumcheckQuad:
    """DeviceZkSumcheckQuad with the hypercube axis sharded: two
    delayed-reduction sums (t0, t_inf) per instance psum'd per round,
    host VC challenge in between, shard-local binds, unsharded tail."""

    def __init__(self, ops: FieldOps, mesh: Mesh):
        self.ops = ops
        self.mesh = mesh

    _partial_cols = ShardedSumcheckCubic._partial_cols

    @functools.lru_cache(maxsize=None)
    def _evals(self, n: int, K: int):
        ops = self.ops
        mesh = self.mesh
        spec = P(None, None, DATA_AXIS)

        def local(A_l, A_h, Z_l, Z_h):
            t0 = self._partial_cols(A_l, Z_l)
            t_inf = self._partial_cols(ops.sub(A_h, A_l), ops.sub(Z_h, Z_l))
            return jax.lax.psum(jnp.stack([t0, t_inf]), DATA_AXIS)

        def ev(A_l, A_h, Z_l, Z_h):
            cols = shard_map(local, mesh=mesh, in_specs=(spec,) * 4,
                             out_specs=P())(A_l, A_h, Z_l, Z_h)
            return jnp.stack([ops.acc_reduce(cols[0]),
                              ops.acc_reduce(cols[1])], axis=2)  # (NL, K, 2)

        return cached_jit(ev, devices=list(self.mesh.devices.flat),
                          fastkey=("shard_zkq_evals", self.ops.spec.name,
                                   self.mesh.devices.size, n, K))

    @functools.lru_cache(maxsize=None)
    def _bind(self, n: int, K: int):
        ops = self.ops
        mesh = self.mesh
        spec = P(None, None, DATA_AXIS)

        def bind_shard(lo, hi, r):
            rb = jnp.broadcast_to(r[:, None, None], lo.shape)
            return ops.add(lo, ops.mont_mul(rb, ops.sub(hi, lo)))

        def b(A_l, A_h, Z_l, Z_h, r):
            bind = shard_map(bind_shard, mesh=mesh,
                             in_specs=(spec, spec, P()), out_specs=spec)
            return bind(A_l, A_h, r), bind(Z_l, Z_h, r)

        return cached_jit(b, devices=list(self.mesh.devices.flat),
                          fastkey=("shard_zkq_bind", self.ops.spec.name,
                                   self.mesh.devices.size, n, K))

    def prove(self, spec, claims: list[int], polys, num_rounds: int,
              challenge_fn):
        import numpy as np

        from ..field.limbs import ints_to_limbs_np, limbs_to_ints
        from ..polys.univariate import UniPoly
        from ..sumcheck.zk_device import get_zk_quad

        ops = self.ops
        p = spec.modulus
        A, Z = polys
        K, n = A.shape[1], A.shape[2]
        es = [c % p for c in claims]
        rs: list[int] = []
        rnd = 0
        n_dev = self.mesh.devices.size
        while n > max(2, n_dev) and rnd < num_rounds:
            half = n // 2
            parts = [A[..., :half], A[..., half:], Z[..., :half],
                     Z[..., half:]]
            evals = self._evals(n, K)(*parts)
            ev = limbs_to_ints(np.asarray(evals).reshape(NL, -1), spec)
            unis = []
            for k in range(K):
                t0, t_inf = ev[2 * k : 2 * k + 2]
                e2 = (2 * es[k] - 3 * t0 + 2 * t_inf) % p
                unis.append(UniPoly.from_evals_deg2(
                    spec, [t0, (es[k] - t0) % p, e2]))
            r = challenge_fn(rnd, unis)
            rs.append(r)
            es = [u.evaluate(r) for u in unis]
            r_dev = jnp.asarray(ints_to_limbs_np([r], spec, mont=True))[:, 0]
            A, Z = self._bind(n, K)(*parts, r_dev)
            rnd += 1
            n = half
        A, Z = (jnp.asarray(np.asarray(x)) for x in (A, Z))
        done = rnd
        rs_tail, finals = get_zk_quad(ops).prove(
            spec, es, (A, Z), num_rounds - done,
            lambda i, unis: challenge_fn(done + i, unis))
        return rs + rs_tail, finals


def commit_rows_sharded(mesh: Mesh, comb, scal_canon: jnp.ndarray):
    """Hyrax row-commit MSM with the ROW axis sharded across the mesh.

    The reference's per-row rayon commit loop (hyrax_pc.rs:230-300)
    mapped onto chips (SURVEY.md section 5: rows sharded, per-row results
    gathered once): each chip runs the fixed-base comb kernel
    (ec/comb.py) over its row block against the replicated tables; rows
    are independent so there is NO cross-chip point arithmetic — the
    only collective is the output all-gather (R Jacobian points).

    ``scal_canon``: (NL, R, C) canonical scalars.  Returns (NL, R)
    Jacobian planes (replicated).
    """
    n_dev = mesh.devices.size
    R = scal_canon.shape[1]
    R_pad = -(-R // n_dev) * n_dev
    if R_pad != R:  # zero scalars hit the identity table entries
        pad = jnp.zeros((scal_canon.shape[0], R_pad - R, scal_canon.shape[2]),
                        jnp.int32)
        scal_canon = jnp.concatenate([scal_canon, pad], axis=1)
    kernel = comb._rows_kernel(R_pad // n_dev, False)

    out = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P(), P(), P()),
        out_specs=(P(None, DATA_AXIS),) * 3,
    )(scal_canon, *comb._tab)
    return tuple(c[:, :R] for c in out)


# process-wide engine caches, mirroring sumcheck.zk_device.get_zk_*: the
# per-instance lru_cache'd kernels hold ~10s-to-deserialize executables,
# so constructing a fresh engine per prove() re-pays every load and pins
# each dead instance via its own method caches.
@functools.lru_cache(maxsize=None)
def get_sharded_zk_cubic(ops: FieldOps, mesh: Mesh) -> ShardedZkSumcheckCubic:
    return ShardedZkSumcheckCubic(ops, mesh)


@functools.lru_cache(maxsize=None)
def get_sharded_zk_quad(ops: FieldOps, mesh: Mesh) -> ShardedZkSumcheckQuad:
    return ShardedZkSumcheckQuad(ops, mesh)
