"""Native (C) runtime components, built on demand with the system
compiler and loaded via ctypes.

The reference keeps its hot host-side primitives in Rust; here the TPU
owns the bulk math and the only host-side hot primitive is the
Fiat-Shamir Keccak — worth a C implementation because transcripts
absorb multi-KB commitment streams per proof.

Build artifacts land in ~/.cache/spartan2_tpu/native/ (keyed by source
hash), so rebuilds only happen when the C source changes.  Everything
has a pure-Python fallback; import failures degrade silently.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(src_name: str, tag: str):
    src = os.path.join(_DIR, src_name)
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "spartan2_tpu", "native")
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"{tag}-{digest}.so")
    if not os.path.exists(lib_path):
        with tempfile.TemporaryDirectory() as td:
            tmp = os.path.join(td, "out.so")
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True)
            os.replace(tmp, lib_path)
    return ctypes.CDLL(lib_path)


def load_keccak():
    """-> callable(data: bytes) -> bytes(32), or None if unavailable."""
    try:
        lib = _build("keccak.c", "keccak")
    except Exception:
        return None
    fn = lib.sp2_keccak256
    fn.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                   ctypes.POINTER(ctypes.c_uint8)]
    fn.restype = None

    def keccak256(data: bytes) -> bytes:
        out = (ctypes.c_uint8 * 32)()
        fn(data, len(data), out)
        return bytes(out)

    return keccak256


def load_ec():
    """-> (msm, scalar_mul) over raw byte buffers, or None.

    msm(params: bytes(13*8), scalars: bytes(32n), points: bytes(64n),
        n: int) -> bytes(96) canonical Jacobian (Z == 0 => infinity).
    scalar_mul(params, k: bytes(32), pt: bytes(64)) -> bytes(96).
    """
    try:
        lib = _build("ec_host.c", "ec_host")
    except Exception:
        return None
    fmsm = lib.sp2_ec_msm
    fmsm.argtypes = [ctypes.POINTER(ctypes.c_uint64), ctypes.c_char_p,
                     ctypes.c_char_p, ctypes.c_uint64,
                     ctypes.POINTER(ctypes.c_uint8)]
    fmsm.restype = None
    fmul = lib.sp2_ec_scalar_mul
    fmul.argtypes = [ctypes.POINTER(ctypes.c_uint64), ctypes.c_char_p,
                     ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8)]
    fmul.restype = None

    def msm(params: bytes, scalars: bytes, points: bytes, n: int) -> bytes:
        out = (ctypes.c_uint8 * 96)()
        pbuf = (ctypes.c_uint64 * 13).from_buffer_copy(params)
        fmsm(pbuf, scalars, points, n, out)
        return bytes(out)

    def scalar_mul(params: bytes, k: bytes, pt: bytes) -> bytes:
        out = (ctypes.c_uint8 * 96)()
        pbuf = (ctypes.c_uint64 * 13).from_buffer_copy(params)
        fmul(pbuf, k, pt, out)
        return bytes(out)

    return msm, scalar_mul
