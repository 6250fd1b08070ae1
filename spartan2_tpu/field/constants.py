"""Prime-field constants for the TPU limb representation.

A field element is represented on device as ``NUM_LIMBS`` limbs of
``LIMB_BITS`` bits each, stored as int32 in a structure-of-arrays layout with
the limb axis FIRST: an array of shape ``(NUM_LIMBS, ...)``.  The batch axis
rides the TPU's 128-lane vector dimension; the limb axis unrolls into
registers.  (Measured on v5e: limb-last layouts are ~50x slower because the
22-limb axis lands on the lane dimension.)

Why 12-bit limbs: the VPU multiplies int32 natively.  A product of two
12-bit limbs is < 2^24, so a schoolbook column (22 terms) plus the Montgomery
fold (<= 22 more terms) stays < 44 * 2^24 < 2^30, comfortably inside int32.
This replaces the reference's 4x64-bit limbs with BMI2/ADX assembly
(reference: src/big_num/limbs.rs:178-331) with a vectorizable carry-free
inner loop.

Montgomery domain: R = 2^(12*22) = 2^264.  Values are stored in Montgomery
form on device; canonical integers on the host.  The reference uses R = 2^256
(src/big_num/montgomery.rs); the domains differ but only canonical bytes are
ever serialized or absorbed into transcripts, so proofs are unaffected.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

LIMB_BITS = 12
NUM_LIMBS = 22
LIMB_MASK = (1 << LIMB_BITS) - 1
R_BITS = LIMB_BITS * NUM_LIMBS  # 264
R = 1 << R_BITS

# Number of 12-bit limbs needed for a 512-bit uniform value (from_uniform).
UNIFORM_LIMBS = 43  # ceil(512 / 12)


def _to_limbs(v: int, n: int = NUM_LIMBS) -> tuple[int, ...]:
    return tuple((v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n))


@dataclass(frozen=True)
class FieldSpec:
    """All host-side constants for one prime field.

    Mirrors the role of the reference's `FieldReductionConstants` +
    `MontgomeryLimbs` traits (src/big_num/field_reduction_constants.rs:10-38,
    src/big_num/macros.rs:29-73), re-derived for the 22x12-bit limb scheme.
    """

    name: str
    modulus: int

    # Derived constants (computed in __post_init__)
    mont_inv: int = field(init=False)  # -p^{-1} mod 2^LIMB_BITS
    r_mod: int = field(init=False)  # R mod p        (Montgomery ONE)
    r2_mod: int = field(init=False)  # R^2 mod p      (to-Montgomery factor)
    r3_mod: int = field(init=False)  # R^3 mod p
    p_limbs: tuple = field(init=False)
    r_mod_limbs: tuple = field(init=False)
    r2_mod_limbs: tuple = field(init=False)
    # 2^264 mod p in canonical integer form equals r_mod; also expose 2^512
    # split factors for wide (from_uniform) reduction.
    shift264_mont: int = field(init=False)  # (2^264 * R) mod p, mont form of 2^264

    def __post_init__(self):
        p = self.modulus
        assert p % 2 == 1 and p > 1
        assert p.bit_length() <= 257, "field must fit (with slack) in 264 bits"
        object.__setattr__(self, "mont_inv", pow(-p, -1, 1 << LIMB_BITS))
        object.__setattr__(self, "r_mod", R % p)
        object.__setattr__(self, "r2_mod", (R * R) % p)
        object.__setattr__(self, "r3_mod", (R * R * R) % p)
        object.__setattr__(self, "p_limbs", _to_limbs(p))
        object.__setattr__(self, "r_mod_limbs", _to_limbs(R % p))
        object.__setattr__(self, "r2_mod_limbs", _to_limbs((R * R) % p))
        object.__setattr__(self, "shift264_mont", (R * R) % p)  # mont(2^264)=2^264*R mod p = R2

    # ---- host scalar helpers (canonical integer domain) ----

    def add(self, a: int, b: int) -> int:
        s = a + b
        p = self.modulus
        return s - p if s >= p else s

    def sub(self, a: int, b: int) -> int:
        d = a - b
        return d + self.modulus if d < 0 else d

    def mul(self, a: int, b: int) -> int:
        return (a * b) % self.modulus

    def neg(self, a: int) -> int:
        return (self.modulus - a) % self.modulus

    def inv(self, a: int) -> int:
        if a % self.modulus == 0:
            raise ZeroDivisionError("field inverse of zero")
        return pow(a, -1, self.modulus)

    def pow(self, a: int, e: int) -> int:
        return pow(a, e, self.modulus)

    @property
    def two_inv(self) -> int:
        return self.inv(2)

    def from_uniform(self, data: bytes) -> int:
        """64 little-endian bytes -> field element.

        Matches halo2curves' ``from_uniform_bytes`` semantics used by the
        reference transcript (src/provider/traits.rs:275-280): interpret the
        bytes as a little-endian 512-bit integer and reduce mod p.
        """
        assert len(data) == 64
        return int.from_bytes(data, "little") % self.modulus

    def to_bytes(self, a: int) -> bytes:
        """Canonical 32-byte little-endian repr (ff::PrimeField::to_repr)."""
        return int(a % self.modulus).to_bytes(32, "little")

    def from_bytes(self, data: bytes) -> int:
        v = int.from_bytes(data, "little")
        if v >= self.modulus:
            raise ValueError("non-canonical field encoding")
        return v

    def to_transcript_bytes(self, a: int) -> bytes:
        """Big-endian 32 bytes: the reference reverses to_repr before
        absorbing (src/provider/traits.rs:282-286)."""
        return int(a % self.modulus).to_bytes(32, "big")

    def to_mont(self, a: int) -> int:
        return (a * R) % self.modulus

    def from_mont(self, a_mont: int) -> int:
        return (a_mont * pow(R, -1, self.modulus)) % self.modulus


# ---------------------------------------------------------------------------
# Concrete fields.
#
# Moduli are taken from the curve definitions the reference binds via
# halo2curves (cited per field).  Scalar field of curve X = the field R1CS
# instances live in; base field = coordinate field used by MSM kernels.
# ---------------------------------------------------------------------------

# Pasta curves (reference: src/provider/pasta.rs:40-54).
# Pallas group order q (= pallas::Scalar = vesta base field):
PALLAS_Q = 0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001
# Pallas base field p (= vesta::Scalar):
PALLAS_P = 0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001

# NIST P-256 (reference: src/provider/pt256.rs:43-49).
P256_N = 0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551
P256_P = 0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF

# T256 (reference: src/provider/pt256.rs:51-57): a curve whose scalar field
# is P-256's base field; its own base field is:
T256_P = 0xFFFFFFFF0000000100000000000000017E72B42B30E7317793135661B1C4B117

# BN254 / bn256 G1 (reference: src/provider/bn254.rs).
BN254_R = 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001
BN254_P = 0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD47


@functools.lru_cache(maxsize=None)
def get_field(name: str) -> FieldSpec:
    table = {
        "pallas_scalar": PALLAS_Q,
        "pallas_base": PALLAS_P,
        "vesta_scalar": PALLAS_P,
        "vesta_base": PALLAS_Q,
        "p256_scalar": P256_N,
        "p256_base": P256_P,
        "t256_scalar": P256_P,  # T256's scalar field == P-256's base field
        "t256_base": T256_P,
        "bn254_scalar": BN254_R,
        "bn254_base": BN254_P,
    }
    return FieldSpec(name=name, modulus=table[name])
