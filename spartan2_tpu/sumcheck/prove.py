"""Device-resident sum-check provers.

The reference's hottest loop (src/sumcheck.rs) re-imagined for TPU:

* Each protocol round is ONE jitted step function: evaluation sums,
  the Keccak transcript squeeze, univariate interpolation, the claim
  update, and the binds are fused so the host only enqueues kernels —
  no host<->device round trips (the link costs ~25-90ms each way).
* Evaluation sums use FieldOps.sum_products (delayed reduction: one wide
  REDC per sum instead of one per product).
* Step functions are cached per (batch-size, transcript-round) and reused
  across proofs; warmed up during prep_prove.

Protocol messages are identical to the reference's
prove_cubic_with_three_inputs / prove_quad (same evaluation points, same
compressed-coefficient transcript encoding), so verification is
interoperable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..field.jnp_ops import NL, FieldOps
from ..utils.jitcache import cached_jit
from ..utils import tracing
from ..transcript.device import DeviceTranscript


# ---------------------------------------------------------------------------
# device univariate helpers
# ---------------------------------------------------------------------------


def from_evals3_dev(ops: FieldOps, e0, e1, e2):
    """(NL,) evals at 0,1,2 -> (NL, 3) coefficients (c, b, a)."""
    p = ops.p
    c = e0
    a = ops.mul_const(ops.add(ops.sub(e0, ops.double(e1)), e2),
                      ops.spec.two_inv * ops.spec.r_mod % p)
    b = ops.sub(ops.sub(e1, c), a)
    return jnp.stack([c, b, a], axis=1)


def from_evals4_dev(ops: FieldOps, e0, e1, e2, e3):
    """(NL,) evals at 0..3 -> (NL, 4) coefficients (d, c, b, a)."""
    p = ops.p
    d = e0
    e1_3 = ops.add(ops.double(e1), e1)
    e2_3 = ops.add(ops.double(e2), e2)
    delta3 = ops.sub(ops.add(ops.sub(e3, e2_3), e1_3), e0)
    a = ops.mul_const(delta3, pow(6, -1, p) * ops.spec.r_mod % p)
    delta2 = ops.add(ops.sub(e2, ops.double(e1)), e0)
    b = ops.sub(ops.mul_const(delta2, ops.spec.two_inv * ops.spec.r_mod % p),
                ops.add(ops.double(a), a))
    c = ops.sub(ops.sub(ops.sub(e1, d), b), a)
    return jnp.stack([d, c, b, a], axis=1)


def unipoly_eval_dev(ops: FieldOps, coeffs: jnp.ndarray, r: jnp.ndarray):
    """Horner evaluation of (NL, k) coefficients at (NL,) point."""
    k = coeffs.shape[1]
    acc = coeffs[:, k - 1]
    for i in range(k - 2, -1, -1):
        acc = ops.add(ops.mont_mul(acc, r), coeffs[:, i])
    return acc


@functools.lru_cache(maxsize=None)
def get_cubic_prover(ops: FieldOps) -> "SumcheckProverCubic":
    """Process-wide prover cache: step executables (and their expensive
    deserialized forms) must be reused across proofs."""
    return SumcheckProverCubic(ops)


@functools.lru_cache(maxsize=None)
def get_quad_prover(ops: FieldOps) -> "SumcheckProverQuad":
    return SumcheckProverQuad(ops)


@functools.lru_cache(maxsize=None)
def get_inner_round0(ops: FieldOps) -> "SpartanInnerRound0":
    return SpartanInnerRound0(ops)


@functools.lru_cache(maxsize=4096)
def round_dev(i: int) -> jnp.ndarray:
    """Device-resident round counter (cached: avoids a host->device
    transfer per sum-check round on the tunneled TPU).  Built WITHOUT a
    dtype so it stays weak-int32 — the same aval a plain Python int
    traces to, keeping the compiled-executable cache keys unchanged."""
    return jnp.asarray(i)


def absorb_unipoly(td: DeviceTranscript, coeffs: jnp.ndarray) -> None:
    """Absorb under label b"p" as compressed coefficients [c0, c2, c3...],
    each 32-byte little-endian canonical (univariate.rs:182-190)."""
    k = coeffs.shape[1]
    comp = jnp.stack([coeffs[:, 0]] + [coeffs[:, i] for i in range(2, k)], axis=1)
    from ..field.jnp_ops import limbs_to_bytes

    canon = td.ops.from_mont(comp)
    le = limbs_to_bytes(canon, 32)  # (32, k-1)
    td.absorb_bytes(b"p", le.T.reshape(-1))


# rounds at or below this size fuse into one multi-round kernel: each
# kernel dispatch over the tunneled link costs ~25 ms, while the tail
# rounds' device work is microseconds
TAIL_FUSE_N = 4096

# ... but at most this many rounds per fused kernel: every fused round
# embeds a Keccak absorb+squeeze, so an unbounded tail (12 rounds for a
# 2^20 prove) lowered to ~6 MB of HLO whose executable was 277 MB and
# took 30-60 s just to DESERIALIZE from the jit cache (round-2 verdict).
# Two 6-round kernels cost one extra ~25 ms dispatch and cut both
# compile and load time superlinearly.
TAIL_FUSE_MAX_ROUNDS = 6


def _bind_top(ops: FieldOps, arr: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """bind_poly_var_top: (NL, n) -> (NL, n/2) with a' = lo + r*(hi - lo)."""
    half = arr.shape[1] // 2
    lo, hi = arr[:, :half], arr[:, half:]
    rb = jnp.broadcast_to(r[:, None], (NL, half))
    return ops.add(lo, ops.mont_mul(rb, ops.sub(hi, lo)))


# ---------------------------------------------------------------------------
# Gruen/BDDT shared machinery (used by the single-device prover below and
# the sharded prover in parallel/sumcheck_shard.py — the two must stay
# byte-identical on the wire)
# ---------------------------------------------------------------------------


def gruen_pack(spec, taus: list[int], zero_check: bool):
    """Flat-pack every per-round Gruen constant into one host list and
    derive the per-round static spec tuples.

    Returns (flat, specs): ``flat`` is the host-int list to upload ONCE
    (the tunneled link costs ~tens of ms per transfer); ``specs[j]`` is
    the static tuple (n, el_len, zero_check, fallback, sl_c, sl_el,
    sl_er) of round j, where sl_* are [lo, hi) slices into the upload.
    """
    from ..polys.eq import eq_evals_host

    p = spec.modulus
    m = len(taus)
    fh = m // 2
    flat: list[int] = []
    slices: dict = {}

    def pack(key, vals):
        slices[key] = (len(flat), len(flat) + len(vals))
        flat.extend(vals)

    for j in range(m):
        tau = taus[j] % p
        pack(("c", j), [(1 - tau) % p, (2 * tau - 1) % p,
                        (2 - 3 * tau) % p,
                        pow(tau, -1, p) if tau else 0])
    pack("ER", eq_evals_host(spec, taus[fh:]))
    for j in range(fh - 1):
        pack(("EL", j), eq_evals_host(spec, taus[j + 1 : fh]))
    for j in range(max(fh - 1, 0), m):
        pack(("T", j), eq_evals_host(spec, taus[j + 1 :]))

    def spec_for(j):
        tau = taus[j] % p
        two_level = j < fh - 1
        if two_level:
            sl_el = slices[("EL", j)]
            sl_er = slices["ER"]
            el_len = sl_el[1] - sl_el[0]
        else:
            sl_el = (0, 0)
            sl_er = slices[("T", j)]
            el_len = 0
        return (1 << (m - j), el_len, zero_check and j == 0, tau == 0,
                slices[("c", j)], sl_el, sl_er)

    return flat, tuple(spec_for(j) for j in range(m))


def gruen_finish(ops: FieldOps, zero_check: bool, fallback: bool, consts,
                 t0_raw, tinf_raw, tm1_raw, P, claim, tstate, t_round):
    """The replicated per-round Gruen algebra: raw sums -> round
    coefficients -> transcript squeeze -> claim/prefix update.  Shared
    by the single-device and sharded provers (identical bytes)."""
    half_const = ops.spec.two_inv * ops.spec.r_mod % ops.p
    eq_0, eq_slope, eq_m1, inv_tau = (consts[:, i] for i in range(4))

    Tinf = ops.mont_mul(tinf_raw, P)
    c3 = ops.mont_mul(eq_slope, Tinf)  # s_leading
    if zero_check:
        zero = jnp.zeros((NL,), jnp.int32)
        T0, c0, e1 = zero, zero, zero
    else:
        T0 = ops.mont_mul(t0_raw, P)
        c0 = ops.mont_mul(eq_0, T0)  # s(0)
        e1 = ops.sub(claim, c0)  # s(1)
    if fallback:
        # tau == 0: t(-1) was computed directly with a third sum
        Tm1 = ops.mont_mul(tm1_raw, P)
    else:
        T1 = ops.mont_mul(e1, inv_tau)  # s(1)/(tau*P) * P
        Tm1 = ops.sub(ops.add(ops.double(Tinf), ops.double(T0)), T1)
    s_m1 = ops.mont_mul(eq_m1, Tm1)
    c1 = ops.sub(ops.mul_const(ops.sub(e1, s_m1), half_const), c3)
    c2 = ops.sub(ops.mul_const(ops.add(e1, s_m1), half_const), c0)
    coeffs = jnp.stack([c0, c1, c2, c3], axis=1)

    td = DeviceTranscript(ops, state=tstate,
                          round=jnp.asarray(t_round, jnp.uint32))
    absorb_unipoly(td, coeffs)
    r = td.squeeze_mont(b"c")
    new_claim = unipoly_eval_dev(ops, coeffs, r)
    eq_tau_r = ops.add(eq_0, ops.mont_mul(eq_slope, r))
    P_n = ops.mont_mul(P, eq_tau_r)
    return coeffs, r, new_claim, P_n, td.state


# ---------------------------------------------------------------------------
# provers
# ---------------------------------------------------------------------------


class SumcheckProverCubic:
    """prove_cubic_with_three_inputs: claim_j = sum eq * (A*B - C).

    v1 computes the eq table explicitly and treats it as a fourth bound
    polynomial (protocol-equivalent to the reference's Gruen/BDDT-optimized
    EqSumCheckInstance — same messages, more device FLOPs; the optimized
    path is a planned upgrade).
    """

    def __init__(self, ops: FieldOps):
        self.ops = ops

    @functools.lru_cache(maxsize=None)
    def _step(self, n: int):
        ops = self.ops

        def step(eq, A, Bp, C, claim, tstate, t_round):
            half = n // 2
            eq_l, eq_h = eq[:, :half], eq[:, half:]
            A_l, A_h = A[:, :half], A[:, half:]
            B_l, B_h = Bp[:, :half], Bp[:, half:]
            C_l, C_h = C[:, :half], C[:, half:]

            def eval_at(eqv, Av, Bv, Cv):
                u = ops.sub(ops.mont_mul(Av, Bv), Cv)
                return ops.sum_products(eqv, u)

            t0 = eval_at(eq_l, A_l, B_l, C_l)
            # bound at 2: 2*hi - lo ; at 3: previous + (hi - lo)
            eq_d, A_d = ops.sub(eq_h, eq_l), ops.sub(A_h, A_l)
            B_d, C_d = ops.sub(B_h, B_l), ops.sub(C_h, C_l)
            eq2, A2 = ops.add(eq_h, eq_d), ops.add(A_h, A_d)
            B2, C2 = ops.add(B_h, B_d), ops.add(C_h, C_d)
            t2 = eval_at(eq2, A2, B2, C2)
            eq3, A3 = ops.add(eq2, eq_d), ops.add(A2, A_d)
            B3, C3 = ops.add(B2, B_d), ops.add(C2, C_d)
            t3 = eval_at(eq3, A3, B3, C3)

            e1 = ops.sub(claim, t0)
            coeffs = from_evals4_dev(ops, t0, e1, t2, t3)

            td = DeviceTranscript(ops, state=tstate,
                                  round=jnp.asarray(t_round, jnp.uint32))
            absorb_unipoly(td, coeffs)
            r = td.squeeze_mont(b"c")
            new_claim = unipoly_eval_dev(ops, coeffs, r)

            rb = jnp.broadcast_to(r[:, None], (NL, half))
            eq_n = ops.add(eq_l, ops.mont_mul(rb, eq_d))
            A_n = ops.add(A_l, ops.mont_mul(rb, A_d))
            B_n = ops.add(B_l, ops.mont_mul(rb, B_d))
            C_n = ops.add(C_l, ops.mont_mul(rb, C_d))
            return eq_n, A_n, B_n, C_n, new_claim, r, coeffs, td.state

        return cached_jit(step, fastkey=("sc_cubic_step", ops.spec.name, n))

    def prove(self, td: DeviceTranscript, eq, A, Bp, C, claim):
        """Run all rounds; returns (coeff list, r list, final evals, claim)."""
        n = eq.shape[1]
        coeffs_out, r_out = [], []
        while n > 1:
            step = self._step(n)
            eq, A, Bp, C, claim, r, coeffs, tstate = step(
                eq, A, Bp, C, claim, td.state, round_dev(int(td.round)))
            td.state = tstate
            td.round += 1
            coeffs_out.append(coeffs)
            r_out.append(r)
            n //= 2
        finals = (A[:, 0], Bp[:, 0], C[:, 0])
        return coeffs_out, r_out, finals, claim


class SumcheckProverQuad:
    """prove_quad with the BDDT 2-sum optimization (sumcheck.rs:190-247)."""

    def __init__(self, ops: FieldOps):
        self.ops = ops

    def _round_body(self, n: int, A, Bp, claim, tstate, t_round):
        ops = self.ops
        half = n // 2
        A_l, A_h = A[:, :half], A[:, half:]
        B_l, B_h = Bp[:, :half], Bp[:, half:]
        t0 = ops.sum_products(A_l, B_l)
        A_d, B_d = ops.sub(A_h, A_l), ops.sub(B_h, B_l)
        t_inf = ops.sum_products(A_d, B_d)
        # e2 = 2*claim - 3*e0 + 2*t_inf
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

        rb = jnp.broadcast_to(r[:, None], (NL, half))
        A_n = ops.add(A_l, ops.mont_mul(rb, A_d))
        B_n = ops.add(B_l, ops.mont_mul(rb, B_d))
        return A_n, B_n, new_claim, r, coeffs, td.state

    @functools.lru_cache(maxsize=None)
    def _step(self, n: int):
        def step(A, Bp, claim, tstate, t_round):
            return self._round_body(n, A, Bp, claim, tstate, t_round)

        return cached_jit(step, fastkey=("sc_quad_step", self.ops.spec.name, n))

    @functools.lru_cache(maxsize=None)
    def _tail_fused(self, n0: int, k: int):
        """Rounds of size n0, n0/2, ... in ONE kernel (see TAIL_FUSE_N)."""

        def fused(A, Bp, claim, tstate, t_round):
            rs, cs = [], []
            n = n0
            for i in range(k):
                A, Bp, claim, r, coeffs, tstate = self._round_body(
                    n, A, Bp, claim, tstate, t_round + i)
                rs.append(r)
                cs.append(coeffs)
                n //= 2
            return A, Bp, claim, tuple(rs), tuple(cs), tstate

        return cached_jit(fused, fastkey=("sc_quad_tail", self.ops.spec.name, n0, k))

    def prove(self, td: DeviceTranscript, A, Bp, claim, num_rounds: int):
        n = A.shape[1]
        assert n == 1 << num_rounds
        coeffs_out, r_out = [], []
        done = 0
        lap = tracing.level() >= 3
        if lap:
            import time

            t_lap = time.perf_counter()
        while done < num_rounds:
            remaining = num_rounds - done
            if n <= TAIL_FUSE_N and remaining > 1:
                k = min(remaining, TAIL_FUSE_MAX_ROUNDS)
                A, Bp, claim, rs, cs, tstate = self._tail_fused(
                    n, k)(A, Bp, claim, td.state,
                          round_dev(int(td.round)))
                td.state = tstate
                td.round += k
                coeffs_out.extend(cs)
                r_out.extend(rs)
                if lap:
                    jax.block_until_ready(A)
                    t_lap = tracing.lap(
                        f"quad fused tail x{k} (n={n})", t_lap)
                n >>= k
                done += k
                continue
            A, Bp, claim, r, coeffs, tstate = self._step(n)(
                A, Bp, claim, td.state, round_dev(int(td.round)))
            td.state = tstate
            td.round += 1
            coeffs_out.append(coeffs)
            r_out.append(r)
            if lap:
                jax.block_until_ready(A)
                t_lap = tracing.lap(f"quad round {done} (n={n})", t_lap)
            n //= 2
            done += 1
        finals = (A[:, 0], Bp[:, 0])
        return coeffs_out, r_out, finals, claim


class SumcheckProverCubicEq:
    """Gruen/BDDT eq-split cubic sum-check (sumcheck.rs:920-1428).

    Protocol-identical to SumcheckProverCubic (same round polynomials,
    same transcript bytes) but never materializes the 2^m eq table:

    * eq(tau, x) factors into bound-prefix (a running scalar P), the
      current variable (the linear factor l(X) = eq(tau_j, X)), and
      remaining-variable tables — a left/right split so the per-round
      tables total 2^(m/2) entries (Gruen, eprint 2024/108 S3).
    * Only t(0) and t(inf) need N-scaling sums; t(1) derives from the
      running claim via the host-precomputed 1/tau_j (BDDT, eprint
      2025/1117 S6.2).  tau_j == 0 falls back to a third sum.
    * Round 0 of a zero-check (satisfied R1CS) skips the t(0) sum
      entirely (sumcheck.rs:1163-1270).

    Per-round device cost: 2 N-scaling sums + 3 binds (~7 muls per
    pair), vs the explicit-eq path's 3 sums + 4 binds (~10) plus the
    2^m-element eq table build and its memory traffic.
    """

    def __init__(self, ops: FieldOps):
        self.ops = ops

    # round kernels ------------------------------------------------------
    def _weighted_pair(self, EL, ER, f0, finf):
        """t_raw sums of f0/finf against the (EL outer) x (ER inner)
        weight grid; f* are (NL, L, R) when EL is not None else (NL, n)."""
        ops = self.ops
        if EL is None:
            t0 = ops.sum_products(ER, f0) if f0 is not None else None
            tinf = ops.sum_products(ER, finf)
            return t0, tinf

        def two_level(f):
            t = ops._mul_cols(ER[:, None, :], f)  # (43, L, R)
            t = ops._parallel_carry(t)
            n = f.shape[2]
            while n > 1:
                k = min(n, 4096)
                t = t.reshape(t.shape[:2] + (n // k, k)).sum(axis=-1)
                t = ops._parallel_carry(t)
                n //= k
            inner = ops.acc_reduce(t[..., 0])  # (NL, L)
            return ops.sum_products(EL, inner)

        t0 = two_level(f0) if f0 is not None else None
        return t0, two_level(finf)

    def _round_body(self, spec_r: tuple, A, Bp, C, flat, P, claim, tstate,
                    t_round):
        """One traced Gruen round.  ``spec_r`` is the static per-round
        tuple (n, el_len, zero_check, fallback, sl_c, sl_el, sl_er)
        where sl_* are [lo, hi) slices into the one-shot flat constants
        upload (gruen_pack) — static slicing keeps per-round host work
        at zero transfers.  Shared by the per-round jit and the fused
        tail."""
        n, el_len, zero_check, fallback, sl_c, sl_el, sl_er = spec_r
        ops = self.ops
        consts = flat[:, sl_c[0] : sl_c[1]]
        EL = flat[:, sl_el[0] : sl_el[1]] if el_len else None
        ER = flat[:, sl_er[0] : sl_er[1]]
        half = n // 2
        A_l, A_h = A[:, :half], A[:, half:]
        B_l, B_h = Bp[:, :half], Bp[:, half:]
        C_l, C_h = C[:, :half], C[:, half:]
        A_d, B_d, C_d = (ops.sub(A_h, A_l), ops.sub(B_h, B_l),
                         ops.sub(C_h, C_l))

        def grid(x):
            return x.reshape(NL, el_len, half // el_len) if el_len else x

        f0 = None
        if not zero_check:
            f0 = grid(ops.sub(ops.mont_mul(A_l, B_l), C_l))
        finf = grid(ops.mont_mul(A_d, B_d))
        t0_raw, tinf_raw = self._weighted_pair(EL, ER, f0, finf)

        tm1_raw = None
        if fallback:
            # tau == 0: compute t(-1) directly with a third sum
            fm1 = grid(ops.sub(
                ops.mont_mul(ops.sub(ops.double(A_l), A_h),
                             ops.sub(ops.double(B_l), B_h)),
                ops.sub(ops.double(C_l), C_h)))
            _, tm1_raw = self._weighted_pair(EL, ER, None, fm1)

        coeffs, r, new_claim, P_n, tstate = gruen_finish(
            ops, zero_check, fallback, consts, t0_raw, tinf_raw, tm1_raw,
            P, claim, tstate, t_round)

        rb = jnp.broadcast_to(r[:, None], (NL, half))
        A_n = ops.add(A_l, ops.mont_mul(rb, A_d))
        B_n = ops.add(B_l, ops.mont_mul(rb, B_d))
        C_n = ops.add(C_l, ops.mont_mul(rb, C_d))
        return A_n, B_n, C_n, P_n, new_claim, r, coeffs, tstate

    @functools.lru_cache(maxsize=None)
    def _step(self, spec_r: tuple):
        def step(A, Bp, C, flat, P, claim, tstate, t_round):
            return self._round_body(spec_r, A, Bp, C, flat, P, claim,
                                    tstate, t_round)

        return cached_jit(step, fastkey=("sc_cubiceq_step", self.ops.spec.name, spec_r))

    @functools.lru_cache(maxsize=None)
    def _tail_fused(self, specs: tuple):
        """All remaining small rounds in ONE kernel — per-round dispatch
        over the tunneled link costs ~25 ms, so the 12 tail rounds of a
        2^20 sum-check would otherwise spend ~300 ms on dispatch alone."""

        def fused(A, Bp, C, flat, P, claim, tstate, t_round):
            rs, coeffs_list = [], []
            for i, spec_r in enumerate(specs):
                A, Bp, C, P, claim, r, coeffs, tstate = self._round_body(
                    spec_r, A, Bp, C, flat, P, claim, tstate, t_round + i)
                rs.append(r)
                coeffs_list.append(coeffs)
            return A, Bp, C, P, claim, tuple(rs), tuple(coeffs_list), tstate

        return cached_jit(fused, fastkey=("sc_cubiceq_tail", self.ops.spec.name, specs))

    # driver -------------------------------------------------------------
    def prove(self, td: DeviceTranscript, A, Bp, C, claim, taus: list[int],
              spec, zero_check: bool = False):
        """Run all m rounds.  ``taus``: host canonical ints (the host
        squeezes them before the sum-check starts); ``spec``: FieldSpec
        of the scalar field.  Returns (coeffs list, r list,
        (A,B,C) finals, final claim) like SumcheckProverCubic.prove."""
        from ..field.limbs import ints_to_limbs_np

        ops = self.ops
        m = len(taus)
        assert A.shape[1] == 1 << m

        # ONE host->device upload for every per-round constant: the
        # tunneled link costs ~tens of ms per transfer, so per-round
        # uploads would dominate the whole sum-check (gruen_pack).
        flat, specs = gruen_pack(spec, taus, zero_check)
        flat_dev = jnp.asarray(ints_to_limbs_np(flat, spec, mont=True))
        P = ops.const(ops.spec.r_mod)  # running eq prefix, starts at ONE
        return self.run_from(td, A, Bp, C, P, claim, flat_dev, specs, 0)

    def run_from(self, td: DeviceTranscript, A, Bp, C, P, claim, flat_dev,
                 specs: tuple, j0: int):
        """Run rounds j0..m-1 given the flat constants upload and the
        static round specs (gruen_pack).  Entry point for the sharded
        prover's single-device tail (parallel/sumcheck_shard.py)."""
        coeffs_out, r_out = [], []
        m = len(specs)
        j = j0
        n = specs[j][0] if j < m else 2
        lap = tracing.level() >= 3  # per-round attribution (serializes!)
        if lap:
            import time

            jax.block_until_ready(flat_dev)
            t_lap = tracing.lap("cubic_eq upload flat", time.perf_counter())
        while j < m:
            # fuse small rounds into multi-round kernels (at most
            # TAIL_FUSE_MAX_ROUNDS each); the tau==0 fallback stays
            # per-round
            j_hi = min(j + TAIL_FUSE_MAX_ROUNDS, m)
            if (n <= TAIL_FUSE_N and m - j > 1
                    and not any(specs[k][3] for k in range(j, j_hi))):
                tail = tuple(specs[j:j_hi])
                A, Bp, C, P, claim, rs, cs, tstate = self._tail_fused(tail)(
                    A, Bp, C, flat_dev, P, claim, td.state,
                    round_dev(int(td.round)))
                td.state = tstate
                td.round += len(tail)
                coeffs_out.extend(cs)
                r_out.extend(rs)
                if lap:
                    jax.block_until_ready(A)
                    t_lap = tracing.lap(
                        f"cubic_eq fused tail x{len(tail)} (n={n})", t_lap)
                n >>= len(tail)
                j = j_hi
                continue
            A, Bp, C, P, claim, r, coeffs, tstate = self._step(specs[j])(
                A, Bp, C, flat_dev, P, claim, td.state,
                round_dev(int(td.round)))
            td.state = tstate
            td.round += 1
            coeffs_out.append(coeffs)
            r_out.append(r)
            if lap:
                jax.block_until_ready(A)
                t_lap = tracing.lap(f"cubic_eq round {j} (n={n})", t_lap)
            n //= 2
            j += 1
        finals = (A[:, 0], Bp[:, 0], C[:, 0])
        return coeffs_out, r_out, finals, claim


@functools.lru_cache(maxsize=None)
def get_cubic_eq_prover(ops: FieldOps) -> "SumcheckProverCubicEq":
    return SumcheckProverCubicEq(ops)


class SpartanInnerRound0:
    """The manual BDDT first round of Spartan's inner sum-check
    (reference spartan.rs:326-394).

    The virtual 2*num_vars-sized polynomials are (poly_ABC, z) where
    only the first num_extra = 1 + num_public + num_challenges entries
    of the top half are non-zero; round 0 exploits that structure:
    evaluation needs one num_vars-sized product sum plus num_extra
    correction terms, and the bind collapses to (1 - r0)-scaling for
    j >= num_extra.  ``abc`` arrives at width num_cols = num_vars +
    num_extra (its nonzero prefix — bind_and_prepare_poly_ABC_device
    never materializes the zero tail); z's halves are the raw (W, tail)
    inputs: z_lo = W, z_hi[:num_extra] = tail.
    """

    def __init__(self, ops: FieldOps):
        self.ops = ops

    # static w_eff (nonzero prefix of W/abc) rounds into this many
    # buckets so distinct circuits share kernels
    EFF_BUCKETS = 32

    @functools.lru_cache(maxsize=None)
    def _step(self, num_vars: int, num_extra: int, w_eff: int, mxu: bool):
        ops = self.ops

        def step(abc, W, tail, claim, tstate, t_round):
            sp = (ops.sum_products_mxu if mxu and w_eff <= 1 << 21
                  else ops.sum_products)
            abc_lo = abc[:, :num_vars]
            a_l, a_h = abc[:, :num_extra], abc[:, num_vars:]
            z_l, z_h = W[:, :num_extra], tail
            # W (and abc's variable columns) are zero at indices
            # >= w_eff (segment padding): slice the sum statically
            # (reference lo_eff/hi_eff, multilinear.rs:36-43)
            eval0 = sp(abc_lo[:, :w_eff], W[:, :w_eff])
            corr_low = ops.sum_products(a_l, z_l)
            corr_cross = ops.sum_products(ops.sub(a_h, a_l), ops.sub(z_h, z_l))
            t_inf = ops.add(ops.sub(eval0, corr_low), corr_cross)
            e2 = ops.add(ops.sub(ops.double(claim),
                                 ops.add(ops.double(eval0), eval0)),
                         ops.double(t_inf))
            e1 = ops.sub(claim, eval0)
            coeffs = from_evals3_dev(ops, eval0, e1, e2)

            td = DeviceTranscript(ops, state=tstate,
                                  round=jnp.asarray(t_round, jnp.uint32))
            absorb_unipoly(td, coeffs)
            r0 = td.squeeze_mont(b"c")
            new_claim = unipoly_eval_dev(ops, coeffs, r0)

            one = ops.const(ops.spec.r_mod, ())
            one_minus = ops.sub(one, r0)
            rb = jnp.broadcast_to(r0[:, None], (NL, num_extra))
            abc_head = ops.add(a_l, ops.mont_mul(rb, ops.sub(a_h, a_l)))
            z_head = ops.add(z_l, ops.mont_mul(rb, ops.sub(z_h, z_l)))
            if mxu:
                # scalar-broadcast Montgomery multiply on the MXU
                abc_tail = ops.mont_mul_scalar_mxu(
                    one_minus, abc_lo[:, num_extra:w_eff])
                z_tail = ops.mont_mul_scalar_mxu(
                    one_minus, W[:, num_extra:w_eff])
            else:
                omb = jnp.broadcast_to(one_minus[:, None],
                                       (NL, w_eff - num_extra))
                abc_tail = ops.mont_mul(omb, abc_lo[:, num_extra:w_eff])
                z_tail = ops.mont_mul(omb, W[:, num_extra:w_eff])
            ztail = jnp.zeros((NL, num_vars - w_eff), jnp.int32)
            abc_new = jnp.concatenate([abc_head, abc_tail, ztail], axis=1)
            z_new = jnp.concatenate([z_head, z_tail, ztail], axis=1)
            return abc_new, z_new, new_claim, r0, coeffs, td.state

        return cached_jit(step, fastkey=(
            "sc_inner0", ops.spec.name, num_vars, num_extra, w_eff, mxu))

    def run(self, td: DeviceTranscript, abc, W, tail, claim,
            num_vars: int, num_extra: int, w_eff: int | None = None):
        """``w_eff``: static bound on the nonzero prefix of W and of
        abc's variable columns (both are zero at [w_eff, num_vars) by
        split-shape padding); defaults to num_vars (no structure)."""
        import os as _os

        if w_eff is None or not (num_extra <= w_eff <= num_vars):
            w_eff = num_vars
        bucket = max(256, num_vars // self.EFF_BUCKETS)
        w_eff = min(num_vars, -(-w_eff // bucket) * bucket)
        mxu = _os.environ.get("SPARTAN2_MXU", "1") != "0"
        step = self._step(num_vars, num_extra, w_eff, mxu)
        abc, z, claim, r0, coeffs, tstate = step(abc, W, tail, claim,
                                                 td.state,
                                                 round_dev(int(td.round)))
        td.state = tstate
        td.round += 1
        return abc, z, claim, r0, coeffs
