"""Transcript bit-exactness: host vs Rust KAT, device vs host."""

import numpy as np
import jax.numpy as jnp

from spartan2_tpu.field.constants import get_field
from spartan2_tpu.field.jnp_ops import FieldOps
from spartan2_tpu.field.limbs import ints_to_limbs_np, limbs_to_ints
from spartan2_tpu.transcript.keccak import keccak256
from spartan2_tpu.transcript.transcript import Transcript
from spartan2_tpu.transcript.device import DeviceTranscript, keccak256_dev


def test_keccak_kat():
    # reference src/provider/keccak.rs:155-163
    out = keccak256((0xFFFFFFFF).to_bytes(4, "little"))
    assert out.hex() == "29045a592007d0c246ef02c2223570da9522d0cf0f73282c79a1bc8f0bb2c238"
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_transcript_kat_pallas():
    """Reference src/provider/keccak.rs:146-152 known-answer vectors."""
    F = get_field("pallas_scalar")
    t = Transcript(F, b"test")
    t.absorb_scalar(b"s1", 2)
    t.absorb_scalar(b"s2", 5)
    c1 = t.squeeze(b"c1")
    assert (
        F.to_bytes(c1).hex()
        == "b67339da79ce5f6dc72ad23c8c3b4179f49655cadf92d47e79c3e7788f00f125"
    )
    t.absorb_scalar(b"s3", 128)
    c2 = t.squeeze(b"c2")
    assert (
        F.to_bytes(c2).hex()
        == "b7f033d47b3519dd6efe320b995eaad1dc11712cb9b655d2e7006ed5f86bd321"
    )


def test_device_keccak_matches_host():
    rng = np.random.default_rng(0)
    for L in [0, 1, 4, 64, 135, 136, 137, 272, 300]:
        data = rng.integers(0, 256, size=(L,), dtype=np.uint8)
        got = bytes(np.asarray(keccak256_dev(jnp.asarray(data))))
        assert got == keccak256(bytes(data)), f"len {L}"


def test_device_transcript_matches_host():
    F = get_field("pallas_scalar")
    ops = FieldOps(F)

    th = Transcript(F, b"test")
    td = DeviceTranscript(ops, b"test")

    vals = [2, 5, F.modulus - 1, 12345678901234567890]
    dv = jnp.asarray(ints_to_limbs_np(vals, F))

    th.absorb_scalar(b"s1", vals[0])
    td.absorb_scalar_mont(b"s1", dv[:, 0])
    th.absorb_scalars(b"rest", vals[1:])
    td.absorb_scalars_mont(b"rest", dv[:, 1:])

    c_host = th.squeeze(b"c1")
    c_dev = td.squeeze_mont(b"c1")
    assert limbs_to_ints(c_dev, F)[0] == c_host

    # second round: state carry-over
    th.absorb_scalar(b"s3", 128)
    td.absorb_scalar_mont(b"s3", jnp.asarray(ints_to_limbs_np([128], F))[:, 0])
    th.dom_sep(b"phase2")
    td.dom_sep(b"phase2")
    c2h = th.squeeze(b"c2")
    c2d = td.squeeze_mont(b"c2")
    assert limbs_to_ints(c2d, F)[0] == c2h


def test_native_keccak_matches_python():
    """The C keccak (native/keccak.c) must agree with the pure-Python
    ground truth on padding edge cases and multi-block streams."""
    from spartan2_tpu.transcript.keccak import _keccak256_py, keccak256

    for n in (0, 1, 135, 136, 137, 271, 272, 273, 4096, 17001):
        data = bytes(i & 0xFF for i in range(n))
        assert keccak256(data) == _keccak256_py(data), n
