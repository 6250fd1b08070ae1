"""Host <-> device conversions between Python ints and limb arrays.

The device representation is int32, shape (NUM_LIMBS, n), limb axis first,
Montgomery form (see jnp_ops).  Host values are canonical Python ints.
"""

from __future__ import annotations

import numpy as np

from .constants import LIMB_BITS, LIMB_MASK, NUM_LIMBS, FieldSpec

B = LIMB_BITS
NL = NUM_LIMBS


def ints_to_limbs_np(vals, spec: FieldSpec, mont: bool = True) -> np.ndarray:
    """Canonical python ints -> (NL, n) int32 limb array (host side).

    If ``mont``, values are converted to Montgomery form first.  The
    byte-packing is vectorized: per-value work is one big-int mod-mul and
    one ``to_bytes`` (both C-speed); limb extraction runs in numpy.
    """
    p = spec.modulus
    n = len(vals)
    if n == 0:
        return np.zeros((NL, 0), dtype=np.int32)
    nbytes = (B * NL + 7) // 8  # 33
    if mont:
        R = 1 << (B * NL)
        buf = b"".join((int(v) % p * R % p).to_bytes(nbytes, "little")
                       for v in vals)
    else:
        buf = b"".join((int(v) % p).to_bytes(nbytes, "little") for v in vals)
    # ONE dtype conversion; per-limb extraction stays in int32 (a per-limb
    # int64 astype of the full matrix cost 0.25s x 23 x NL at 2^21 values)
    raw = np.frombuffer(buf, np.uint8).reshape(n, nbytes).astype(np.int32)
    out = np.empty((NL, n), dtype=np.int32)
    for i in range(NL):
        lo_bit = B * i
        b0, off = lo_bit // 8, lo_bit % 8
        v = raw[:, b0] >> off
        v = v | (raw[:, b0 + 1] << (8 - off))
        if 16 - off < B and b0 + 2 < nbytes:
            v = v | (raw[:, b0 + 2] << (16 - off))
        out[i] = v & LIMB_MASK
    return out


def small_ints_to_limbs_np(vals: np.ndarray) -> np.ndarray:
    """uint64-safe numpy ints -> (NL, n) canonical limb array, vectorized.

    Fast path for witness vectors that are mostly bits/small (the reference's
    `is_small` hint, src/r1cs/mod.rs:186-189).  Caller converts to Montgomery
    form on device.
    """
    v = np.asarray(vals, dtype=np.uint64)
    n = v.shape[0]
    out = np.zeros((NL, n), dtype=np.int32)
    for i in range(6):  # 6 limbs cover 64 bits (6*12 = 72)
        out[i] = ((v >> np.uint64(B * i)) & np.uint64(LIMB_MASK)).astype(np.int32)
    return out


def limbs_to_ints(arr, spec: FieldSpec | None = None, mont: bool = True) -> list[int]:
    """(NL, n) limb array (numpy or jax) -> canonical python ints."""
    a = np.asarray(arr)
    if a.ndim == 1:
        a = a[:, None]
    n = a.shape[1]
    vals = []
    for k in range(n):
        v = 0
        for i in range(NL - 1, -1, -1):
            v = (v << B) | int(a[i, k])
        vals.append(v)
    if mont:
        assert spec is not None
        p = spec.modulus
        Rinv = pow(1 << (B * NL), -1, p)
        vals = [v * Rinv % p for v in vals]
    elif spec is not None:
        vals = [v % spec.modulus for v in vals]
    return vals
