"""EC tests: host curve ops vs known identities; device kernels vs host.

Mirrors the reference's MSM cross-checks (src/provider/msm.rs:869-935:
msm vs naive double-and-add, small-scalar widths) and generator
derivation tests (pasta.rs:71-103).
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from spartan2_tpu.ec.curve import get_curve, tonelli_shanks
from spartan2_tpu.ec.device import DeviceCurve
from spartan2_tpu.field.limbs import ints_to_limbs_np

CURVES = ["pallas", "bn254", "p256"]


@pytest.mark.parametrize("name", CURVES)
def test_host_group_law(name):
    c = get_curve(name)
    g = c.generator
    assert c.is_on_curve(g)
    rng = random.Random(7)
    k1 = rng.randrange(1, c.scalar.modulus)
    k2 = rng.randrange(1, c.scalar.modulus)
    P1 = c.scalar_mul(k1, g)
    P2 = c.scalar_mul(k2, g)
    assert c.is_on_curve(P1) and c.is_on_curve(P2)
    # additivity
    assert c.add(P1, P2) == c.scalar_mul((k1 + k2) % c.scalar.modulus, g)
    # order
    assert c.scalar_mul(c.scalar.modulus, g) is None
    # negation
    assert c.add(P1, c.neg(P1)) is None


@pytest.mark.parametrize("name", ["pallas"])
def test_host_msm_vs_naive(name):
    c = get_curve(name)
    rng = random.Random(42)
    gens = c.from_label(b"test", 8)
    for g in gens:
        assert c.is_on_curve(g)
    scalars = [rng.randrange(c.scalar.modulus) for _ in gens]
    expected = None
    for s, pt in zip(scalars, gens):
        expected = c.add(expected, c.scalar_mul(s, pt))
    assert c.msm(scalars, gens) == expected


def test_tonelli_shanks_general():
    p = get_curve("pallas").base.modulus  # p = 1 mod 2^32: general path
    rng = random.Random(3)
    for _ in range(5):
        a = rng.randrange(1, p)
        sq = a * a % p
        r = tonelli_shanks(sq, p)
        assert r is not None and r * r % p == sq


@pytest.mark.parametrize("name", ["pallas", "p256"])
def test_device_group_law_vs_host(name):
    c = get_curve(name)
    dc = DeviceCurve(c)
    rng = random.Random(11)
    pts = [c.scalar_mul(rng.randrange(1, c.scalar.modulus), c.generator) for _ in range(4)]
    P = dc.affine_to_device(pts)

    # doubling
    D = dc.dbl(P)
    assert dc.to_affine_host(D) == [c.add(pt, pt) for pt in pts]

    # add shifted
    pts2 = pts[1:] + pts[:1]
    Q = dc.affine_to_device(pts2)
    S = dc.add(P, Q)
    assert dc.to_affine_host(S) == [c.add(a, b) for a, b in zip(pts, pts2)]

    # add edge cases: P + P (doubling branch), P + (-P) (infinity branch),
    # P + inf, inf + P
    S2 = dc.add(P, P)
    assert dc.to_affine_host(S2) == [c.add(pt, pt) for pt in pts]
    N = dc.neg(P)
    S3 = dc.add(P, N)
    assert dc.to_affine_host(S3) == [None] * 4
    inf = dc.infinity((4,))
    assert dc.to_affine_host(dc.add(P, inf)) == pts
    assert dc.to_affine_host(dc.add(inf, P)) == pts


def test_device_msm_vs_host():
    c = get_curve("pallas")
    dc = DeviceCurve(c)
    rng = random.Random(13)
    n = 8
    gens = c.from_label(b"msm", n)
    Qx = jnp.asarray(ints_to_limbs_np([g[0] for g in gens], c.base, mont=True))
    Qy = jnp.asarray(ints_to_limbs_np([g[1] for g in gens], c.base, mont=True))

    # full-width scalars
    scalars = [rng.randrange(c.scalar.modulus) for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs_np(scalars, c.scalar, mont=False))
    got = dc.to_affine_host(dc.msm(sc, Qx, Qy))[0]
    assert got == c.msm(scalars, gens)

    # small scalars (64-bit path)
    small = [rng.randrange(1 << 63) for _ in range(n)]
    sc_small = jnp.asarray(ints_to_limbs_np(small, c.scalar, mont=False))
    got = dc.to_affine_host(dc.msm(sc_small, Qx, Qy, nbits=64))[0]
    assert got == c.msm(small, gens)

    # binary
    bits = [rng.randrange(2) for _ in range(n)]
    got = dc.to_affine_host(dc.msm_binary(jnp.asarray(np.array(bits, np.int32)), Qx, Qy))[0]
    assert got == c.msm(bits, gens)

    # complete tree (verifier-side variant) must agree
    got = dc.to_affine_host(dc.msm(sc, Qx, Qy, complete_tree=True))[0]
    assert got == c.msm(scalars, gens)

    # edge scalars: zeros and window-boundary values exercise the
    # infinity selects in the windowed table/Horner path
    edge = [0, 1, 15, 16, (1 << 12) - 1, 1 << 12, c.scalar.modulus - 1, 0]
    sc_e = jnp.asarray(ints_to_limbs_np(edge, c.scalar, mont=False))
    got = dc.to_affine_host(dc.msm(sc_e, Qx, Qy))[0]
    assert got == c.msm(edge, gens)


def test_device_msm_rows_vs_host():
    """msm_rows: R independent MSMs in one windowed kernel (the shape of
    the reference's msm_shared_weights, msm.rs:228-356)."""
    c = get_curve("pallas")
    dc = DeviceCurve(c)
    rng = random.Random(17)
    R, I = 3, 4
    gens = c.from_label(b"rows", R * I)
    scalars = [rng.randrange(c.scalar.modulus) for _ in range(R * I)]
    Qx = jnp.asarray(ints_to_limbs_np([g[0] for g in gens], c.base,
                                      mont=True)).reshape(-1, R, I)
    Qy = jnp.asarray(ints_to_limbs_np([g[1] for g in gens], c.base,
                                      mont=True)).reshape(-1, R, I)
    sc = jnp.asarray(ints_to_limbs_np(scalars, c.scalar,
                                      mont=False)).reshape(-1, R, I)
    got = dc.to_affine_host(dc.msm_rows(sc, Qx, Qy, complete_tree=True))
    for r in range(R):
        want = c.msm(scalars[r * I:(r + 1) * I], gens[r * I:(r + 1) * I])
        assert got[r] == want


def test_native_msm_matches_python():
    """The C Pippenger/scalar-mul (native/ec_host.c) must agree with the
    pure-python host curve ops, incl. infinity points, duplicate points,
    zero and order-1 scalars, on a = 0 and a != 0 curves."""
    import numpy as np

    import spartan2_tpu.ec.curve as ec

    if ec._native_ec() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(9)
    for name in ("pallas", "p256", "bn254"):
        cv = ec.get_curve(name)
        q = cv.scalar.modulus
        pts = list(cv.from_label(b"t", 32))
        pts[2] = None
        pts[3] = pts[4]
        scal = [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62)) % q
                for _ in range(32)]
        scal[0], scal[1] = 0, q - 1
        try:
            ec._NATIVE_EC = False
            ref_msm = cv.msm(scal, pts)
            ref_mul = cv.scalar_mul(scal[5], pts[7])
        finally:
            ec._NATIVE_EC = None
        assert cv.msm(scal, pts) == ref_msm, name
        assert cv.scalar_mul(scal[5], pts[7]) == ref_mul, name
