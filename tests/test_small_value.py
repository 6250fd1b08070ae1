"""Small-value integer fast path vs Montgomery ground truth.

Mirrors the reference's small_value test suite (test_small_vec_or_zero /
test_small_accumulator, src/big_num/small_value.rs:255-360) plus an
equality check of the NIFS round-0 small kernel against the full
Montgomery round kernel on arbitrary (non-satisfying) inputs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spartan2_tpu.field.constants import get_field
from spartan2_tpu.field.jnp_ops import FieldOps
from spartan2_tpu.field.limbs import ints_to_limbs_np, limbs_to_ints
from spartan2_tpu.field.small_value import SMALL_LIMBS, to_small_planes
from spartan2_tpu.sumcheck.zk_device import NifsRoundsDevice, _suffix_weight


@pytest.fixture(scope="module")
def fctx():
    spec = get_field("p256_scalar")
    return spec, FieldOps(spec)


def test_to_small_planes_roundtrip(fctx):
    spec, ops = fctx
    p = spec.modulus
    W = 1 << (12 * SMALL_LIMBS)
    vals = [0, 1, 2, 100, W - 1, p - 1, p - 100, p - (W - 1),
            (1 << 62) - 1, p - ((1 << 62) - 1)]
    signed = [v if v < W else v - p for v in vals]
    a = jnp.asarray(ints_to_limbs_np(vals, spec, mont=True))
    planes, ok = to_small_planes(ops, a)
    assert bool(jnp.all(ok))
    got = []
    pn = np.asarray(planes)
    for k in range(len(vals)):
        got.append(sum(int(pn[i, k]) << (12 * i) for i in range(SMALL_LIMBS)))
    assert got == signed


def test_to_small_planes_rejects_large(fctx):
    spec, ops = fctx
    p = spec.modulus
    W = 1 << (12 * SMALL_LIMBS)
    vals = [1, W, p - W, p // 2, 5]
    a = jnp.asarray(ints_to_limbs_np(vals, spec, mont=True))
    _, ok = to_small_planes(ops, a)
    assert list(np.asarray(ok)) == [True, False, False, False, True]


@pytest.mark.parametrize("n,lo_bits", [(8, 0), (32, 62)])
def test_nifs_small_round0_matches_montgomery(fctx, n, lo_bits):
    """(n=32, lo_bits=62) is the overflow-boundary case: every operand in
    (2^62, 2^72) — beyond the reference's SMALL_VALUE_MAX but inside this
    implementation's 2^72 gate window — on a grid wide enough that the
    old fixed 2^408 accumulator offset underflowed (advisor round-2
    high finding)."""
    spec, ops = fctx
    p = spec.modulus
    rng = np.random.default_rng(7)
    I = 4
    # arbitrary small signed values, deliberately NOT satisfying A*B=C:
    # the small kernel must agree with the Montgomery kernel on any input
    def grid():
        if not lo_bits:
            return [[int(v) % p
                     for v in rng.integers(-(1 << 62), 1 << 62, size=n)]
                    for _ in range(I)]
        rows = []
        for _ in range(I):
            row = []
            for _ in range(n):
                # |v| in [2^62, 2^72): nonzero top 10 bits over a 62-bit tail
                v = (int(rng.integers(1, 1 << 10)) << 62) | int(
                    rng.integers(0, 1 << 62))
                if rng.integers(0, 2):
                    v = -v
                row.append(v % p)
            rows.append(row)
        return rows

    As, Bs, Cs = grid(), grid(), grid()
    E = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(n)]
    rhos = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(2)]

    def up_grid(G):
        flat = [v for row in G for v in row]
        return jnp.asarray(ints_to_limbs_np(flat, spec, mont=True)).reshape(
            -1, I, n)

    A, B, C = up_grid(As), up_grid(Bs), up_grid(Cs)
    E_dev = jnp.asarray(ints_to_limbs_np(E, spec, mont=True))
    w_host = [_suffix_weight(spec, 0, 2, pair, rhos) for pair in range(I // 2)]
    w = jnp.asarray(ints_to_limbs_np(w_host, spec, mont=True))

    nifs = NifsRoundsDevice(ops)
    r0 = jnp.asarray(ints_to_limbs_np([0], spec, mont=True))[:, 0]
    _, _, _, eq_m = nifs._step(I, n, False)(A, B, C, E_dev, w, r0)
    e0_m, quad_m = limbs_to_ints(np.asarray(eq_m), spec)

    small, ok = nifs.to_small(spec, A, B, C)
    assert ok
    eq_s = nifs._small_step(I, n)(*small, E_dev, w)
    e0_s, quad_s = limbs_to_ints(np.asarray(eq_s), spec, mont=False)

    assert (e0_s, quad_s) == (e0_m, quad_m)
