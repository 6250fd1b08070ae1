"""Device-resident Keccak-256 and Fiat-Shamir transcript (pure JAX).

Why this exists: on the target deployment the host<->TPU link has ~25-90ms
round-trip latency, so the reference's host-side transcript loop
(absorb -> squeeze -> bind each sum-check round) would dominate the prover.
Instead the transcript state lives on device as a (64,) uint8 array and
Keccak-f[1600] runs on the VPU with 64-bit lanes emulated as uint32 pairs
(TPU has no int64).  The protocol structure (labels, message lengths, round
counts) is static at trace time, so every squeeze lowers to a fixed graph.

Bit-exactness: tests/test_transcript.py checks this against the host
transcript, which itself matches the Rust reference's known-answer vectors
(src/provider/keccak.rs:148-152).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..field.jnp_ops import FieldOps, limbs_to_bytes
from .keccak import _RC, _ROT
from .transcript import DOM_SEP_TAG, PERSONA_TAG, _compute_updated_state

U32 = jnp.uint32

# Precomputed permutation tables -------------------------------------------

# pi: b[y + 5*((2x+3y)%5)] = rotl(a[x+5y], ROT[x][y]).  Build source index and
# rotation per destination lane.
_PI_SRC = np.zeros(25, np.int32)
_PI_ROT = np.zeros(25, np.int32)
for _x in range(5):
    for _y in range(5):
        _dst = _y + 5 * ((2 * _x + 3 * _y) % 5)
        _PI_SRC[_dst] = _x + 5 * _y
        _PI_ROT[_dst] = _ROT[_x][_y]

# chi source indices: a'[i] = b[i] ^ (~b[c1[i]] & b[c2[i]])
_CHI1 = np.array([(i % 5 + 1) % 5 + 5 * (i // 5) for i in range(25)], np.int32)
_CHI2 = np.array([(i % 5 + 2) % 5 + 5 * (i // 5) for i in range(25)], np.int32)

# round constants as (24, 2) uint32 (lo, hi)
_RC32 = np.array([[rc & 0xFFFFFFFF, rc >> 32] for rc in _RC], np.uint32)

_RATE = 136


def _rotl_pair(lo, hi, n):
    """Rotate-left a 64-bit lane given as two uint32 planes, static n."""
    n = int(n) % 64
    if n == 0:
        return lo, hi
    if n < 32:
        new_lo = (lo << n) | (hi >> (32 - n))
        new_hi = (hi << n) | (lo >> (32 - n))
        return new_lo, new_hi
    if n == 32:
        return hi, lo
    m = n - 32
    new_lo = (hi << m) | (lo >> (32 - m))
    new_hi = (lo << m) | (hi >> (32 - m))
    return new_lo, new_hi


def keccak_f1600_dev(lo: jnp.ndarray, hi: jnp.ndarray):
    """Apply Keccak-f[1600]; lo/hi are (25, *batch) uint32 planes."""

    pi_src = jnp.asarray(_PI_SRC)
    chi1 = jnp.asarray(_CHI1)
    chi2 = jnp.asarray(_CHI2)
    rc = jnp.asarray(_RC32)

    def round_fn(rnd, state):
        lo, hi = state
        # theta
        a5l = lo.reshape((5, 5) + lo.shape[1:])
        a5h = hi.reshape((5, 5) + hi.shape[1:])
        cl = a5l[0] ^ a5l[1] ^ a5l[2] ^ a5l[3] ^ a5l[4]  # c[x] over x: note layout
        ch = a5h[0] ^ a5h[1] ^ a5h[2] ^ a5h[3] ^ a5h[4]
        # NOTE: lanes are indexed x + 5y, so reshape (5,5) gives [y][x]; we
        # need column sums over y which is axis 0 after reshape.  cl/ch above
        # already sum over y (axis 0 of [y][x]).
        rl1 = (cl << 1) | (ch >> 31)
        rh1 = (ch << 1) | (cl >> 31)
        dxl = jnp.roll(cl, 1, axis=0) ^ jnp.roll(rl1, -1, axis=0)
        dxh = jnp.roll(ch, 1, axis=0) ^ jnp.roll(rh1, -1, axis=0)
        lo = lo ^ jnp.tile(dxl, (5,) + (1,) * (dxl.ndim - 1))
        hi = hi ^ jnp.tile(dxh, (5,) + (1,) * (dxh.ndim - 1))
        # rho + pi (unrolled: static rotations)
        src_lo = lo[pi_src]
        src_hi = hi[pi_src]
        bl_parts = []
        bh_parts = []
        for d in range(25):
            l, h = _rotl_pair(src_lo[d], src_hi[d], int(_PI_ROT[d]))
            bl_parts.append(l)
            bh_parts.append(h)
        bl = jnp.stack(bl_parts)
        bh = jnp.stack(bh_parts)
        # chi
        lo = bl ^ (~bl[chi1] & bl[chi2])
        hi = bh ^ (~bh[chi1] & bh[chi2])
        # iota
        lo = lo.at[0].set(lo[0] ^ rc[rnd, 0])
        hi = hi.at[0].set(hi[0] ^ rc[rnd, 1])
        return (lo, hi)

    lo, hi = jax.lax.fori_loop(0, 24, round_fn, (lo, hi))
    return lo, hi


def _bytes_to_lanes(block: jnp.ndarray):
    """(136, *batch) uint8 -> (17, *batch) uint32 lo/hi planes."""
    b = block.astype(U32)
    w = b.reshape((17, 8) + block.shape[1:])
    lo = w[:, 0] | (w[:, 1] << 8) | (w[:, 2] << 16) | (w[:, 3] << 24)
    hi = w[:, 4] | (w[:, 5] << 8) | (w[:, 6] << 16) | (w[:, 7] << 24)
    return lo, hi


def _lanes_to_bytes(lo: jnp.ndarray, hi: jnp.ndarray, n_lanes: int):
    """(n, *batch) uint32 planes -> (8n, *batch) uint8."""
    parts = []
    for i in range(n_lanes):
        for plane in (lo[i], hi[i]):
            for s in range(4):
                parts.append(((plane >> (8 * s)) & 0xFF).astype(jnp.uint8))
    return jnp.stack(parts)


def keccak256_dev(data: jnp.ndarray) -> jnp.ndarray:
    """Keccak-256 of a (L, *batch) uint8 array with static length L.

    Returns (32, *batch) uint8.  Padding is applied at trace time.
    """
    L = data.shape[0]
    batch = data.shape[1:]
    pad_len = _RATE - (L % _RATE)
    if pad_len == 1:
        pad = np.full((1,) + (1,) * len(batch), 0x81, np.uint8)
        padded = jnp.concatenate([data, jnp.broadcast_to(jnp.asarray(pad), (1,) + batch)], axis=0)
    else:
        padnp = np.zeros((pad_len,), np.uint8)
        padnp[0] = 0x01
        padnp[-1] = 0x80
        pad = jnp.broadcast_to(
            jnp.asarray(padnp).reshape((pad_len,) + (1,) * len(batch)),
            (pad_len,) + batch,
        )
        padded = jnp.concatenate([data, pad], axis=0)

    lo = jnp.zeros((25,) + batch, U32)
    hi = jnp.zeros((25,) + batch, U32)
    n_blocks = padded.shape[0] // _RATE
    for blk in range(n_blocks):
        blo, bhi = _bytes_to_lanes(padded[blk * _RATE : (blk + 1) * _RATE])
        lo = lo.at[:17].set(lo[:17] ^ blo)
        hi = hi.at[:17].set(hi[:17] ^ bhi)
        lo, hi = keccak_f1600_dev(lo, hi)
    return _lanes_to_bytes(lo, hi, 4)


def _const_bytes(data: bytes, batch=()):
    arr = np.frombuffer(data, np.uint8)
    return jnp.broadcast_to(
        jnp.asarray(arr).reshape((len(data),) + (1,) * len(batch)),
        (len(data),) + batch,
    )


def compute_updated_state_dev(data: jnp.ndarray) -> jnp.ndarray:
    """CUS(data) = keccak(data||0x00) || keccak(data||0x01), via a batch of 2."""
    batch = data.shape[1:]
    assert batch == (), "transcript state is unbatched"
    two = jnp.stack([data, data], axis=-1)  # (L, 2)
    suffix = jnp.asarray(np.array([[0, 1]], np.uint8))  # (1, 2)
    inp = jnp.concatenate([two, suffix], axis=0)
    out = keccak256_dev(inp)  # (32, 2)
    return jnp.concatenate([out[:, 0], out[:, 1]], axis=0)  # (64,)


class DeviceTranscript:
    """Traced twin of transcript.Transcript: same byte semantics, on device.

    Use inside jitted step functions.  The state is a (64,) uint8 traced
    array; the round counter and all labels are static (the protocol
    structure is known at trace time).  ``state`` can be passed across jit
    boundaries as a plain array.
    """

    def __init__(self, ops: FieldOps, label: bytes | None = None, *,
                 state: jnp.ndarray | None = None, round: int = 0):
        self.ops = ops
        self.round = round
        self.buf: list[jnp.ndarray] = []
        if state is not None:
            self.state = state
        else:
            # initial state depends only on the static label: host-computed.
            init = _compute_updated_state(PERSONA_TAG + label)
            self.state = jnp.asarray(np.frombuffer(init, np.uint8))

    # -- absorb ----------------------------------------------------------
    def absorb_bytes(self, label: bytes, data) -> None:
        self.buf.append(_const_bytes(label))
        if isinstance(data, (bytes, bytearray)):
            if len(data):
                self.buf.append(_const_bytes(bytes(data)))
        else:
            self.buf.append(data)

    def absorb_scalar_mont(self, label: bytes, a_mont: jnp.ndarray) -> None:
        """Absorb a Montgomery-form (NL,) element as 32 big-endian bytes."""
        canon = self.ops.from_mont(a_mont)
        le = limbs_to_bytes(canon, 32)
        self.buf.append(_const_bytes(label))
        self.buf.append(le[::-1])

    def absorb_scalars_mont(self, label: bytes, a_mont: jnp.ndarray) -> None:
        """Absorb (NL, n) elements under one label (concatenated BE bytes)."""
        self.buf.append(_const_bytes(label))
        n = a_mont.shape[1]
        canon = self.ops.from_mont(a_mont)
        le = limbs_to_bytes(canon, 32)  # (32, n)
        be = le[::-1]  # big-endian per element
        self.buf.append(be.T.reshape(-1))  # element-major concatenation

    def dom_sep(self, data: bytes) -> None:
        self.buf.append(_const_bytes(DOM_SEP_TAG + data))

    # -- squeeze ---------------------------------------------------------
    def squeeze_bytes(self, label: bytes) -> jnp.ndarray:
        parts = list(self.buf)
        if isinstance(self.round, int):
            parts.append(_const_bytes(DOM_SEP_TAG + self.round.to_bytes(2, "little")))
        else:
            # traced round counter: one compiled step serves every round
            # of a given size (the counter is 2 LE bytes in the stream)
            parts.append(_const_bytes(DOM_SEP_TAG))
            rnd = self.round.astype(jnp.uint32)
            parts.append(jnp.stack([(rnd & 0xFF).astype(jnp.uint8),
                                    ((rnd >> 8) & 0xFF).astype(jnp.uint8)]))
        parts.append(self.state)
        parts.append(_const_bytes(label))
        inp = jnp.concatenate(parts, axis=0)
        out = compute_updated_state_dev(inp)
        self.round = self.round + 1
        self.state = out
        self.buf = []
        return out

    def squeeze_mont(self, label: bytes) -> jnp.ndarray:
        """Squeeze a challenge as a Montgomery-form (NL,) element."""
        out = self.squeeze_bytes(label)
        return self.ops.from_uniform_bytes(out)
