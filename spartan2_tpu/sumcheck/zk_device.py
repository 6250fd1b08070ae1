"""Device kernels for the ZK sum-checks and the NeutronNova NIFS rounds.

The ZK paths route every round polynomial through the verifier-circuit
commit protocol (process_round) instead of a plain transcript, so the
Fiat-Shamir challenge is inherently host-side each round
(sumcheck.rs:575-917).  The TPU shape of that constraint: ONE fused
device step per round that (a) binds the previous challenge and
(b) computes the evaluation sums for all batched instances, with a
single ~small device->host pull of the evaluation scalars; the host does
the O(1) interpolation and the width-16/32 VC commit.

Instances are stacked on a leading batch axis K (K=1 for SpartanZk,
K=2 for NeutronNova's step/core lockstep), matching the reference's
prove_*_batched_zk structure (sumcheck.rs:702-917).

NifsRoundsDevice implements the NeutronNova zero-check rounds
(neutronnova_zk.rs:511-1168) with the instance axis device-resident:
per round one fused kernel folds the previous challenge into the
A/B/C layers and produces the (e0, quad) pair; the rho algebra
(finish_round) stays host-side where the challenges live.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..field.jnp_ops import NL, FieldOps
from ..field.limbs import ints_to_limbs_np, limbs_to_ints
from ..utils.jitcache import cached_jit


def _up(spec, vals, mont=True):
    return jnp.asarray(ints_to_limbs_np(vals, spec, mont=mont))


def _bind_axis1(ops, arr, r):
    """(NL, K, n) -> (NL, K, n/2) binding the top hypercube variable."""
    half = arr.shape[-1] // 2
    lo, hi = arr[..., :half], arr[..., half:]
    rb = r.reshape((NL,) + (1,) * (arr.ndim - 1))
    return ops.add(lo, ops.mont_mul(jnp.broadcast_to(rb, lo.shape),
                                    ops.sub(hi, lo)))


class DeviceZkSumcheckCubic:
    """Batched cubic-with-additive-term sum-check: per instance k,
    claim_k = sum_j E[j] * (A_k[j]*B_k[j] - C_k[j]).

    Matches the host prove_cubic_batched_zk message flow exactly: per
    round the device computes evals (t0, t2, t3) per instance, the host
    interpolates the degree-3 polynomial and drives the VC round.
    """

    def __init__(self, ops: FieldOps):
        self.ops = ops

    @functools.lru_cache(maxsize=None)
    def _step(self, n: int, K: int, bind_first: bool):
        ops = self.ops

        def step(E, A, B, C, r):
            if bind_first:
                E = _bind_axis1(ops, E, r)
                A = _bind_axis1(ops, A, r)
                B = _bind_axis1(ops, B, r)
                C = _bind_axis1(ops, C, r)
            half = A.shape[-1] // 2
            E_l, E_h = E[:, :half], E[:, half:]
            A_l, A_h = A[..., :half], A[..., half:]
            B_l, B_h = B[..., :half], B[..., half:]
            C_l, C_h = C[..., :half], C[..., half:]

            def eval_at(Ev, Av, Bv, Cv):
                u = ops.sub(ops.mont_mul(Av, Bv), Cv)  # (NL, K, half)
                Eb = jnp.broadcast_to(Ev[:, None, :], u.shape)
                # flatten (K, half) for the delayed-reduction sum, keep K
                t = ops._mul_cols(Eb, u)
                t = ops._parallel_carry(t)
                m = half
                while m > 1:
                    k = min(m, 4096)
                    t = t.reshape(t.shape[:2] + (m // k, k)).sum(axis=-1)
                    t = ops._parallel_carry(t)
                    m //= k
                return ops.acc_reduce(t[..., 0])  # (NL, K)

            t0 = eval_at(E_l, A_l, B_l, C_l)
            E_d, A_d = ops.sub(E_h, E_l), ops.sub(A_h, A_l)
            B_d, C_d = ops.sub(B_h, B_l), ops.sub(C_h, C_l)
            E2, A2 = ops.add(E_h, E_d), ops.add(A_h, A_d)
            B2, C2 = ops.add(B_h, B_d), ops.add(C_h, C_d)
            t2 = eval_at(E2, A2, B2, C2)
            E3, A3 = ops.add(E2, E_d), ops.add(A2, A_d)
            B3, C3 = ops.add(B2, B_d), ops.add(C2, C_d)
            t3 = eval_at(E3, A3, B3, C3)
            evals = jnp.stack([t0, t2, t3], axis=2)  # (NL, K, 3)
            return E, A, B, C, evals

        return cached_jit(step, fastkey=("zk_cubic_step", ops.spec.name, n, K, bind_first))

    @functools.lru_cache(maxsize=None)
    def _final(self, n: int, K: int):
        ops = self.ops

        def fin(E, A, B, C, r):
            E = _bind_axis1(ops, E, r)
            A = _bind_axis1(ops, A, r)
            B = _bind_axis1(ops, B, r)
            C = _bind_axis1(ops, C, r)
            # (NL, K, 1) finals + E scalar
            return jnp.stack([A[..., 0], B[..., 0], C[..., 0]], axis=2), E[:, 0]

        return cached_jit(fin, fastkey=("zk_cubic_final", ops.spec.name, n, K))

    def prove(self, spec, claims: list[int], E, polys, challenge_fn):
        """``E``: (NL, n) device; ``polys``: (A, B, C) each (NL, K, n);
        ``challenge_fn(round, unipolys) -> r`` drives the VC rounds.
        Returns (rs, finals[k] = (A,B,C) ints, E_final int)."""
        from ..polys.univariate import UniPoly

        ops = self.ops
        p = spec.modulus
        A, B, C = polys
        K = A.shape[1]
        n = A.shape[2]
        es = [c % p for c in claims]
        rs: list[int] = []
        r_dev = ops.const(0)
        rnd = 0
        while n > 1:
            step = self._step(n, K, rnd > 0)
            E, A, B, C, evals = step(E, A, B, C, r_dev)
            ev = limbs_to_ints(np.asarray(evals).reshape(NL, -1), spec)
            unis = []
            for k in range(K):
                t0, t2, t3 = ev[3 * k : 3 * k + 3]
                unis.append(UniPoly.from_evals_deg3(
                    spec, [t0, (es[k] - t0) % p, t2, t3]))
            r = challenge_fn(rnd, unis)
            rs.append(r)
            es = [u.evaluate(r) for u in unis]
            r_dev = _up(spec, [r])[:, 0]
            rnd += 1
            n //= 2
        finals_dev, E_fin = self._final(2 * n, K)(E, A, B, C, r_dev)
        vals = limbs_to_ints(np.asarray(finals_dev).reshape(NL, -1), spec)
        finals = [tuple(vals[3 * k : 3 * k + 3]) for k in range(K)]
        E_out = limbs_to_ints(np.asarray(E_fin), spec)[0]
        return rs, finals, E_out


class DeviceZkSumcheckQuad:
    """Batched quadratic sum-check claim_k = sum_j A_k[j] * Z_k[j]
    (sumcheck.rs:646-782) with per-round VC challenges."""

    def __init__(self, ops: FieldOps):
        self.ops = ops

    @functools.lru_cache(maxsize=None)
    def _step(self, n: int, K: int, bind_first: bool):
        ops = self.ops

        def step(A, Z, r):
            if bind_first:
                A = _bind_axis1(ops, A, r)
                Z = _bind_axis1(ops, Z, r)
            half = A.shape[-1] // 2
            A_l, A_h = A[..., :half], A[..., half:]
            Z_l, Z_h = Z[..., :half], Z[..., half:]

            def pair_sum(x, y):
                t = ops._mul_cols(x, y)
                t = ops._parallel_carry(t)
                m = half
                while m > 1:
                    k = min(m, 4096)
                    t = t.reshape(t.shape[:2] + (m // k, k)).sum(axis=-1)
                    t = ops._parallel_carry(t)
                    m //= k
                return ops.acc_reduce(t[..., 0])

            t0 = pair_sum(A_l, Z_l)
            t_inf = pair_sum(ops.sub(A_h, A_l), ops.sub(Z_h, Z_l))
            evals = jnp.stack([t0, t_inf], axis=2)  # (NL, K, 2)
            return A, Z, evals

        return cached_jit(step, fastkey=("zk_quad_step", ops.spec.name, n, K, bind_first))

    @functools.lru_cache(maxsize=None)
    def _final(self, n: int, K: int):
        ops = self.ops

        def fin(A, Z, r):
            A = _bind_axis1(ops, A, r)
            Z = _bind_axis1(ops, Z, r)
            return jnp.stack([A[..., 0], Z[..., 0]], axis=2)

        return cached_jit(fin, fastkey=("zk_quad_final", ops.spec.name, n, K))

    def prove(self, spec, claims: list[int], polys, num_rounds: int,
              challenge_fn):
        """``polys``: (A, Z) each (NL, K, n).  Returns (rs, finals[k] =
        (A_final, Z_final))."""
        from ..polys.univariate import UniPoly

        ops = self.ops
        p = spec.modulus
        A, Z = polys
        K = A.shape[1]
        n = A.shape[2]
        assert n == 1 << num_rounds
        es = [c % p for c in claims]
        rs: list[int] = []
        r_dev = ops.const(0)
        for rnd in range(num_rounds):
            step = self._step(n, K, rnd > 0)
            A, Z, evals = step(A, Z, r_dev)
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
            r_dev = _up(spec, [r])[:, 0]
            n //= 2
        finals_dev = self._final(2 * n, K)(A, Z, r_dev)
        vals = limbs_to_ints(np.asarray(finals_dev).reshape(NL, -1), spec)
        finals = [tuple(vals[2 * k : 2 * k + 2]) for k in range(K)]
        return rs, finals


class ZkInnerRound0:
    """BDDT round 0 of the inner sum-check with a VC-driven challenge
    (spartan_zk.rs round 0 = spartan.rs:326-394 but the challenge comes
    from the verifier-circuit commit round, so the kernel is split:
    ``evals`` pulls the three correction sums, the host interpolates and
    runs the VC round, ``bind`` applies the structured fold).

    Polys carry a leading K instance axis like the other ZK engines.
    ``abc``/``z`` arrive at width num_cols = num_vars + num_extra — the
    nonzero prefix of the virtual 2*num_vars polynomials (the zero tail
    is never materialized; the reference's lo_eff/hi_eff zero-skip,
    neutronnova_zk.rs:1889-1920, is this structure made static).
    """

    def __init__(self, ops: FieldOps):
        self.ops = ops

    @functools.lru_cache(maxsize=None)
    def _evals(self, num_vars: int, num_extra: int, K: int):
        ops = self.ops

        def ev(abc, z):
            # abc/z: (NL, K, num_vars + num_extra)
            abc_lo = abc[..., :num_vars]
            z_lo = z[..., :num_vars]

            def psum(x, y):
                t = ops._mul_cols(x, y)
                t = ops._parallel_carry(t)
                m = x.shape[-1]
                while m > 1:
                    k = min(m, 4096)
                    t = t.reshape(t.shape[:2] + (m // k, k)).sum(axis=-1)
                    t = ops._parallel_carry(t)
                    m //= k
                return ops.acc_reduce(t[..., 0])  # (NL, K)

            eval0 = psum(abc_lo, z_lo)
            a_l, a_h = abc[..., :num_extra], abc[..., num_vars:]
            z_l, z_h = z[..., :num_extra], z[..., num_vars:]
            corr_low = psum(a_l, z_l)
            corr_cross = psum(ops.sub(a_h, a_l), ops.sub(z_h, z_l))
            t_inf = ops.add(ops.sub(eval0, corr_low), corr_cross)
            return jnp.stack([eval0, t_inf], axis=2)  # (NL, K, 2)

        return cached_jit(ev, fastkey=("zk_inner0_evals", ops.spec.name, num_vars, num_extra, K))

    @functools.lru_cache(maxsize=None)
    def _bind(self, num_vars: int, num_extra: int, K: int):
        ops = self.ops

        def bind(abc, z, r0):
            abc_lo = abc[..., :num_vars]
            z_lo = z[..., :num_vars]
            a_l, a_h = abc[..., :num_extra], abc[..., num_vars:]
            z_l, z_h = z[..., :num_extra], z[..., num_vars:]
            one = ops.const(ops.spec.r_mod, ())
            one_minus = ops.sub(one, r0)
            rb = jnp.broadcast_to(r0[:, None, None], a_l.shape)
            omb = jnp.broadcast_to(one_minus[:, None, None],
                                   abc_lo[..., num_extra:].shape)
            abc_new = jnp.concatenate([
                ops.add(a_l, ops.mont_mul(rb, ops.sub(a_h, a_l))),
                ops.mont_mul(omb, abc_lo[..., num_extra:])], axis=2)
            z_new = jnp.concatenate([
                ops.add(z_l, ops.mont_mul(rb, ops.sub(z_h, z_l))),
                ops.mont_mul(omb, z_lo[..., num_extra:])], axis=2)
            return abc_new, z_new

        return cached_jit(bind, fastkey=("zk_inner0_bind", ops.spec.name, num_vars, num_extra, K))

    def evals(self, spec, abc, z, num_vars: int, num_extra: int):
        """-> per-instance (eval0, t_inf) host ints."""
        K = abc.shape[1]
        ev = self._evals(num_vars, num_extra, K)(abc, z)
        vals = limbs_to_ints(np.asarray(ev).reshape(NL, -1), spec)
        return [tuple(vals[2 * k : 2 * k + 2]) for k in range(K)]

    def bind(self, spec, abc, z, r0: int, num_vars: int, num_extra: int):
        K = abc.shape[1]
        r_dev = _up(spec, [r0])[:, 0]
        return self._bind(num_vars, num_extra, K)(abc, z, r_dev)


class NifsRoundsDevice:
    """NeutronNova NIFS round engine: A/B/C layers device-resident on an
    (instance, constraint) grid; per round one fused kernel folds the
    previous challenge and emits the (e0, quad) sums
    (neutronnova_zk.rs:703-735, 854-1168).
    """

    def __init__(self, ops: FieldOps):
        self.ops = ops

    @functools.lru_cache(maxsize=None)
    def _step(self, I: int, n: int, bind_first: bool):
        ops = self.ops

        def step(A, B, C, E, w, r):
            # A/B/C: (NL, I, n); E: (NL, n); w: (NL, I/2) suffix weights
            if bind_first:
                A = self._fold(A, r)
                B = self._fold(B, r)
                C = self._fold(C, r)
            Ae, Ao = A[:, 0::2], A[:, 1::2]
            Be, Bo = B[:, 0::2], B[:, 1::2]
            Ce = C[:, 0::2]

            def weighted(u):
                # inner sum over constraints with E, outer over pairs with w
                Eb = jnp.broadcast_to(E[:, None, :], u.shape)
                t = ops._mul_cols(Eb, u)
                t = ops._parallel_carry(t)
                m = u.shape[-1]
                while m > 1:
                    k = min(m, 4096)
                    t = t.reshape(t.shape[:2] + (m // k, k)).sum(axis=-1)
                    t = ops._parallel_carry(t)
                    m //= k
                inner = ops.acc_reduce(t[..., 0])  # (NL, pairs)
                return ops.sum_products(w, inner)

            e0 = weighted(ops.sub(ops.mont_mul(Ae, Be), Ce))
            quad = weighted(ops.mont_mul(ops.sub(Ao, Ae), ops.sub(Bo, Be)))
            return A, B, C, jnp.stack([e0, quad], axis=1)

        return cached_jit(step, fastkey=("nifs_step", ops.spec.name, I, n, bind_first))

    @functools.lru_cache(maxsize=None)
    def _to_small(self, I: int, n: int):
        """(NL,I,n) Montgomery A/B/C -> ((KS,I,n) signed planes x3, ok).

        The conversion pays one from_mont per grid element; it buys a
        round-0 kernel whose products are 6x6 integer convolutions
        instead of full 22-limb Montgomery multiplies (the reference's
        to_small_vec_or_zero staging, neutronnova_zk.rs:1550-1560)."""
        ops = self.ops
        from ..field.small_value import to_small_planes

        def conv(A, B, C):
            outs, ok = [], None
            for M in (A, B, C):
                s, o = to_small_planes(ops, M)
                outs.append(s)
                a = jnp.all(o)
                ok = a if ok is None else jnp.logical_and(ok, a)
            return outs[0], outs[1], outs[2], ok

        return cached_jit(conv, fastkey=("nifs_to_small", ops.spec.name, I, n))

    @functools.lru_cache(maxsize=None)
    def _small_step(self, I: int, n: int):
        """Round-0 (e0, quad) from small planes (prove_helper_small,
        neutronnova_zk.rs:246-314, generalized to also emit e0 so the
        small and Montgomery paths agree on ANY input, satisfied or not).

        Inputs: As/Bs/Cs (KS, I, n) signed small planes; E (NL, n) and
        w (NL, I/2) Montgomery.  Output is stack([e0, quad]) as PLAIN
        field values (the two Montgomery weightings cancel both R
        factors) — callers pull with mont=False."""
        ops = self.ops
        from ..field.small_value import offset_limbs_np, conv_cols

        pc = ops._parallel_carry

        def weighted(t, E, w):
            # t: (C0, pairs, n) signed integer columns, |col| < 2^29
            t = pc(pc(t))  # back to ~12-bit signed columns
            u = conv_cols(E[:, None, :], t)
            u = pc(pc(u))
            m = u.shape[-1]
            while m > 1:
                k = min(m, 4096)
                u = u.reshape(u.shape[:2] + (m // k, k)).sum(axis=-1)
                u = pc(pc(u))
                m //= k
            u = u[..., 0]  # (C, pairs)
            # Make the signed total non-negative before acc_reduce
            # (which, like SmallAccumulator::reduce, small_value.rs:
            # 171-176, assumes a non-negative integer).  Worst case:
            # |sum| <= n * max|E| * max|t|, with E loose Montgomery
            # (< 2p) and t a product of two values in the 2^72 small
            # window (|t| < 2^146; the e0 path's Ae*Be - Ce is smaller).
            # The offset is the least multiple of p above that bound —
            # derived, not hardcoded: the old fixed 2^408 underflowed
            # for n >= 32 at the full 2^72 gate window.
            bits = (n * (2 * ops.p) * (1 << 146)).bit_length()
            need_cols = -(-(bits + 13) // 12)
            if u.shape[0] < need_cols:
                pad = jnp.zeros((need_cols - u.shape[0],) + u.shape[1:], u.dtype)
                u = jnp.concatenate([u, pad], axis=0)
            offs = jnp.asarray(
                offset_limbs_np(u.shape[0], bits, ops.p)[:, None])
            inner = ops.acc_reduce(u + offs)  # (NL, pairs) plain value
            return ops.sum_products(w, inner)  # plain value

        def step(As, Bs, Cs, E, w):
            Ae, Ao = As[:, 0::2], As[:, 1::2]
            Be, Bo = Bs[:, 0::2], Bs[:, 1::2]
            Ce = Cs[:, 0::2]
            KS = As.shape[0]
            t_e0 = conv_cols(Ae, Be).at[:KS].add(-Ce)
            e0 = weighted(t_e0, E, w)
            quad = weighted(conv_cols(Ao - Ae, Bo - Be), E, w)
            return jnp.stack([e0, quad], axis=1)

        return cached_jit(step, fastkey=("nifs_small_step", ops.spec.name, I, n))

    def _fold(self, arr, r):
        """(NL, I, n) -> (NL, I/2, n): even + r * (odd - even)."""
        ops = self.ops
        even, odd = arr[:, 0::2], arr[:, 1::2]
        rb = jnp.broadcast_to(r[:, None, None], even.shape)
        return ops.add(even, ops.mont_mul(rb, ops.sub(odd, even)))

    @functools.lru_cache(maxsize=None)
    def _final_fold(self, I: int, n: int):
        def fin(A, B, C, r):
            return (self._fold(A, r)[:, 0], self._fold(B, r)[:, 0],
                    self._fold(C, r)[:, 0])
        return cached_jit(fin, fastkey=("nifs_final_fold", self.ops.spec.name, I, n))

    @functools.lru_cache(maxsize=None)
    def _weighted_fold(self, I: int, n: int):
        ops = self.ops

        def fold(W, weights):
            # W: (NL, I, n), weights: (NL, I) -> (NL, n)
            t = ops._mul_cols(weights[:, :, None], W)
            t = ops._parallel_carry(t)
            m = I
            while m > 1:
                k = min(m, 64)
                t = t.reshape((t.shape[0], m // k, k) + t.shape[2:]).sum(axis=2)
                t = ops._parallel_carry(t)
                m //= k
            return ops.acc_reduce(t[:, 0])

        return cached_jit(fold, fastkey=("nifs_weighted_fold", ops.spec.name, I, n))

    def to_small(self, spec, A, B, C):
        """Try the small-plane conversion of the NIFS grid.  Returns
        ((As, Bs, Cs), ok) — ok False means some entry exceeded the
        2^72 window and the caller must use the Montgomery path."""
        As, Bs, Cs, ok = self._to_small(A.shape[1], A.shape[2])(A, B, C)
        return (As, Bs, Cs), bool(ok)

    def run(self, spec, A, B, C, E, rhos: list[int], round_cb, small=None):
        """Run ell_b rounds.  ``round_cb(t, e0, quad) -> r_b`` performs
        the host finish_round algebra + VC round and returns the
        challenge.  ``small``: optional (As, Bs, Cs) small planes from
        ``to_small`` — round 0 then runs the integer fast path
        (neutronnova_zk.rs:779-800).  Returns (r_bs, folded (Az,Bz,Cz))."""
        ops = self.ops
        I = A.shape[1]
        n = A.shape[2]
        ell_b = I.bit_length() - 1
        if ell_b == 0:
            return [], (A[:, 0], B[:, 0], C[:, 0])
        r_bs: list[int] = []
        r_dev = ops.const(0)
        for t in range(ell_b):
            pairs = A.shape[1] // 2 if t == 0 else A.shape[1] // 4
            w_host = [_suffix_weight(spec, t, ell_b, pair, rhos)
                      for pair in range(max(pairs, 1))]
            w = _up(spec, w_host)
            if t == 0 and small is not None:
                # integer fast path: A/B/C stay unfolded (round 0 never
                # folds); the small kernel emits PLAIN field values
                eq = self._small_step(I, n)(*small, E, w)
                e0, quad = limbs_to_ints(np.asarray(eq), spec, mont=False)
            else:
                step = self._step(A.shape[1], n, t > 0)
                A, B, C, eq = step(A, B, C, E, w, r_dev)
                e0, quad = limbs_to_ints(np.asarray(eq), spec)
            r_b = round_cb(t, e0, quad)
            r_bs.append(r_b)
            r_dev = _up(spec, [r_b])[:, 0]
        Az, Bz, Cz = self._final_fold(A.shape[1], n)(A, B, C, r_dev)
        return r_bs, (Az, Bz, Cz)

    def fold_witnesses(self, spec, W_stack, weights: list[int]):
        """(NL, I, nv) witness planes x host eq-tensor weights -> (NL, nv)."""
        w = _up(spec, weights)
        return self._weighted_fold(W_stack.shape[1], W_stack.shape[2])(
            W_stack, w)


# process-wide engine caches: compiled round kernels (and their ~10s
# executable deserialization) are reused across prove() calls
@functools.lru_cache(maxsize=None)
def get_zk_cubic(ops: FieldOps) -> DeviceZkSumcheckCubic:
    return DeviceZkSumcheckCubic(ops)


@functools.lru_cache(maxsize=None)
def get_zk_quad(ops: FieldOps) -> DeviceZkSumcheckQuad:
    return DeviceZkSumcheckQuad(ops)


@functools.lru_cache(maxsize=None)
def get_zk_inner_round0(ops: FieldOps) -> ZkInnerRound0:
    return ZkInnerRound0(ops)


@functools.lru_cache(maxsize=None)
def get_nifs_rounds(ops: FieldOps) -> NifsRoundsDevice:
    return NifsRoundsDevice(ops)


def _suffix_weight(spec, t: int, ell_b: int, pair_idx: int,
                   rhos: list[int]) -> int:
    """prod_{s>t} eq(rho_s, bit_s) (neutronnova_zk.rs:77-87)."""
    p = spec.modulus
    w, k = 1, pair_idx
    for s in range(t + 1, ell_b):
        w = w * (rhos[s] if k & 1 else (1 - rhos[s]) % p) % p
        k >>= 1
    return w
