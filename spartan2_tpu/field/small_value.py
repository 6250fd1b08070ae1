"""Small-value integer fast path for NeutronNova NIFS round 0.

TPU analogue of the reference's i64/i128 small-value arithmetic
(src/big_num/small_value.rs:33-222, used at src/neutronnova_zk.rs:246-314
and :1550-1560): when Az/Bz/Cz entries fit machine words, products run as
native integers and only one Montgomery reduction happens per weighted
sum, instead of a full-width Montgomery multiply per element.

Device representation: a "small plane" array of shape ``(SMALL_LIMBS,
*batch)`` holds signed 12-bit limbs, value = sum_i limb_i * 2^(12 i) with
every limb carrying the sign (all limbs of one element share it).  With
SMALL_LIMBS = 6 the magnitude window is 2^72 — a superset of the
reference's 2^62 SMALL_VALUE_MAX bound (small_value.rs:21-31); column
bounds below are checked against the full 2^72 window.

The reference also carries a round-1 cross-product variant
(prove_helper_ab_cross, neutronnova_zk.rs:316-432) that decomposes the
folded products into three weight classes over the ORIGINAL i64 layers.
Deliberately not ported: its payoff on a CPU is avoiding per-element
Montgomery folds, but on the VPU the fold is one fused axpy kernel and
the three weight-class pipelines would cost roughly what the narrow
limbs save — rounds >= 1 use the Montgomery path.

Deviation from the reference: ``to_small_vec_or_zero`` zeroes individual
large entries and callers patch them with field arithmetic
(neutronnova_zk.rs:298-311).  Here the gate is whole-grid — one device
``ok`` flag; if ANY entry is large the caller falls back to the
Montgomery-plane path.  Same results, coarser gating, no data-dependent
shapes (XLA needs static shapes; a sparse correction list would force a
host round-trip per round).

Overflow budget (int32 columns):
  - conv of two small planes: <= 6 * 4095^2        < 2^26.6
  - conv of two DIFFERENCE planes (|limb|<=8190):
      6 * 8190^2                                   < 2^28.6
  - eq-weight conv (22 x ~13 carried cols):
      13 * 4095 * ~4100                            < 2^27.7
  - 4096-way tree sums after two parallel carries
      (|col| <= ~2^12.1): 4096 * 2^12.1            < 2^24.2
All < 2^31; one `_parallel_carry` pair restores ~12-bit columns between
stages (arithmetic >> keeps signed decomposition exact).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .constants import LIMB_BITS, LIMB_MASK
from .jnp_ops import I32, NL, FieldOps

SMALL_LIMBS = 6  # 72-bit magnitude window


def conv_cols(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook product columns for arbitrary limb counts:
    (Ka, *s) x (Kb, *s) -> (Ka+Kb-1, *s).  Caller owns column bounds."""
    Ka, Kb = a.shape[0], b.shape[0]
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    t = jnp.zeros((Ka + Kb - 1,) + batch, I32)
    for i in range(Ka):
        t = t.at[i : i + Kb].add(a[i][None] * b)
    return t


def to_small_planes(ops: FieldOps, a: jnp.ndarray):
    """Montgomery limb planes -> (small_planes, ok) [device, traced].

    ``small_planes``: (SMALL_LIMBS, *batch) signed planes of the canonical
    representative mapped to (-p/2, p/2) (v > p/2 is taken as v - p, the
    reference's negative branch, small_value.rs:62-80).  ``ok``: (*batch)
    bool, True where |value| < 2^(12*SMALL_LIMBS).  Entries with ok=False
    hold garbage — callers must check ``ok.all()`` and fall back.
    """
    v = ops.from_mont(a)  # canonical [0, p), normalized limbs
    # p - v (normalized; equals p when v == 0, which stays non-small and
    # is covered by the small_pos branch)
    t = [int(ops.p_limbs[i]) - v[i] for i in range(NL)]
    neg = ops._carry_list(t, NL)
    small_pos = jnp.ones(v.shape[1:], dtype=bool)
    small_neg = jnp.ones(v.shape[1:], dtype=bool)
    for i in range(SMALL_LIMBS, NL):
        small_pos = small_pos & (v[i] == 0)
        small_neg = small_neg & (neg[i] == 0)
    planes = jnp.where(small_pos[None], v[:SMALL_LIMBS],
                       -jnp.stack(neg[:SMALL_LIMBS]))
    return planes, small_pos | small_neg


def offset_limbs_np(ncols: int, bits: int, modulus: int) -> np.ndarray:
    """Limbs of the smallest multiple of p above 2^bits, as an (ncols,)
    int32 constant.  Added to a signed wide accumulator whose value is
    > -2^bits to make it non-negative before ``acc_reduce`` (which, like
    the reference's SmallAccumulator::reduce, small_value.rs:171-176,
    assumes a non-negative integer)."""
    assert 12 * ncols >= bits + 13
    off = ((1 << bits) // modulus + 1) * modulus
    out = np.zeros(ncols, dtype=np.int32)
    for i in range(ncols):
        out[i] = (off >> (LIMB_BITS * i)) & LIMB_MASK
    return out
