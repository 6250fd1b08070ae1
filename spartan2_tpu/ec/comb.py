"""Fixed-base comb MSM tables for static generator sets.

TPU-native equivalent of the reference's ``FixedBaseMul`` windowed
fixed-base tables (src/provider/msm.rs:637-774) and the small-width
fixed-base path in the Hyrax row commit (src/provider/pcs/hyrax_pc.rs:
230-303).  The Hyrax commitment generators are static per key, so each
row MSM ``sum_j v[row, j] * G_j`` becomes:

    1. split every scalar into 6-bit digits (6 == LIMB_BITS/2, so a digit
       is a shift+mask of one limb plane — no cross-limb carries),
    2. gather precomputed points T[w][d][j] = (d << 6w) * G_j, one
       window at a time inside a fori_loop (bounded HLO + working set),
    3. reduce the column axis with DeviceCurve.lane_sum (sequential
       accumulate + small tail tree).

Per row this costs ``n_win * C`` point additions instead of the ladder's
``nbits * C`` doubles+adds — ~12x fewer point ops for 64-bit scalars.

Table layout: Jacobian coordinate planes of shape (NL, n_win * 64 * C);
entry d == 0 stores the identity (Z == 0), so zero digits need no mask.

Incomplete-add safety: for HONEST scalars a collision between two
tree partial sums would yield a nontrivial discrete-log relation among
independently hashed generators (or an exact >=124-bit congruence on a
randomly sampled scalar), which a computationally bounded honest
process produces with negligible probability — same argument as the
reference's batched additions (provider/traits.rs add_affine_vartime).
For ADVERSARIAL scalars (verifier-side MSMs over proof-supplied
values) that argument fails: an attacker can lattice-solve
s_hi * 2^(6w) = s_lo (mod q) to force two partial sums of the SAME
generator to collide.  Pass ``complete=True`` there — the tree then
uses complete adds (the per-entry gather is unaffected).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..field.constants import LIMB_BITS, NUM_LIMBS
from ..field.jnp_ops import NL
from ..utils.jitcache import cached_jit

WINDOW_BITS = 6
DIGITS = 1 << WINDOW_BITS  # 64
assert LIMB_BITS == 2 * WINDOW_BITS


def _n_windows(nbits: int) -> int:
    return -(-nbits // WINDOW_BITS)


class FixedBaseComb:
    """Comb tables over one static generator vector (device-resident).

    ``dc``: DeviceCurve; ``Qx/Qy``: (NL, C) affine Montgomery coordinate
    planes of the generators; ``nbits``: static scalar width bound
    (64+2 for small scalars, NUM_LIMBS*LIMB_BITS for full width).
    """

    def __init__(self, dc, Qx: jnp.ndarray, Qy: jnp.ndarray, nbits: int):
        self.dc = dc
        self.C = Qx.shape[1]
        self.nbits = nbits
        self.n_win = _n_windows(nbits)
        self._tab = self._build()(Qx, Qy)
        self._commit_cache: dict = {}

    def _build(self):
        dc = self.dc
        n_win, C = self.n_win, self.C

        def build(Qx, Qy):
            one = dc.fb.const(dc.fb.spec.r_mod, (C,))
            # base points B_w = 2^(6w) * G_j via a window-doubling scan
            base0 = (Qx, Qy, one)

            def dbl6(base, _):
                for _ in range(WINDOW_BITS):
                    base = dc.dbl(base)
                return base, base

            _, rest = jax.lax.scan(dbl6, base0, None, length=n_win - 1)
            B = tuple(
                jnp.moveaxis(jnp.concatenate([b0[None], r], axis=0), 0, 1)
                for b0, r in zip(base0, rest)
            )  # (NL, n_win, C)

            # digit chain T[d] = T[d-1] + B (complete adds: T[2] doubles)
            def chain(acc, _):
                acc = dc.add(acc, B)
                return acc, acc

            inf = dc.infinity((n_win, C))
            _, tab = jax.lax.scan(chain, inf, None, length=DIGITS - 1)
            # tab: tuple of (DIGITS-1, NL, n_win, C); prepend the identity.
            # Tables are stored PACKED two limbs per int32 (pack2): the
            # per-window gathers are traffic-bound and the full-width
            # tables are ~1.5 GB of HBM unpacked at C=2048.
            from ..field.jnp_ops import pack2

            return tuple(
                pack2(jnp.concatenate([i[None], t], axis=0)
                      .transpose(1, 2, 0, 3)            # (NL, n_win, DIGITS, C)
                      .reshape(NL, -1))
                for i, t in zip(inf, tab)
            )

        return cached_jit(build, fastkey=("comb_build", dc.curve.name, self.nbits))

    # ------------------------------------------------------------------
    def _digits(self, scal: jnp.ndarray) -> jnp.ndarray:
        """(NL, *batch) canonical limbs -> (n_win, *batch) 6-bit digits."""
        outs = []
        for w in range(self.n_win):
            limb = scal[w // 2]
            sh = WINDOW_BITS * (w & 1)
            outs.append((limb >> sh) & (DIGITS - 1))
        return jnp.stack(outs)

    def _rows_kernel(self, R: int, complete: bool):
        dc = self.dc
        n_win, C = self.n_win, self.C
        addf = dc.add if complete else dc.add_incomplete

        def kernel(scal, Tx, Ty, Tz):
            # scal: (NL, R, C) canonical
            d = self._digits(scal)  # (n_win, R, C)
            col = jnp.arange(C, dtype=jnp.int32)[None, :]

            # Accumulate windows sequentially (fori_loop keeps ONE add
            # body + ONE table gather in HLO, and only an (R, C) point
            # slab live at a time).  Incomplete-add safety within a
            # lane: acc holds sum_{w<k} d_w 2^(6w) G_j, the addend is
            # d_k 2^(6k) G_j; integer magnitudes force acc < 2^(6k) <=
            # addend, so acc == +-addend needs a mod-q wrap — impossible
            # for small-width scalars, negligible for honest full-width
            # ones (complete=True covers adversarial inputs).
            from ..field.jnp_ops import unpack2

            def win_body(w, acc):
                idx = (w * DIGITS + d[w]) * C + col  # (R, C)
                P = tuple(unpack2(jnp.take(T, idx, axis=1))
                          for T in (Tx, Ty, Tz))
                return addf(acc, P)

            acc = jax.lax.fori_loop(0, n_win, win_body, dc.infinity((R, C)))
            acc = dc.lane_sum(acc, complete)
            return tuple(c[:, :, 0] for c in acc)

        return kernel

    @functools.lru_cache(maxsize=None)
    def _rows_jit(self, R: int, complete: bool = False):
        return cached_jit(self._rows_kernel(R, complete),
                          fastkey=("comb_rows", self.dc.curve.name,
                                   self.nbits, R, complete))

    def rows_msm(self, scal_canon: jnp.ndarray, complete: bool = False):
        """(NL, R, C) canonical scalars -> (NL, R) Jacobian row sums.

        The row axis is chunked so the gathered-point working set stays
        ~0.5 GB; the trailing chunk is zero-padded (zero digits hit the
        identity table entries) so a single kernel shape serves all
        chunks of one (R, C, nbits) family.
        """
        R = scal_canon.shape[1]
        # chunk the row axis to bound the gathered-points working set
        # (one (R, C) point slab per window iteration)
        max_rows = max(1, (1 << 21) // self.C)
        if R <= max_rows:
            return self._rows_jit(R, complete)(scal_canon, *self._tab)
        n_chunks = -(-R // max_rows)
        if R < n_chunks * max_rows:
            pad = jnp.zeros((NL, n_chunks * max_rows - R, self.C), jnp.int32)
            scal_canon = jnp.concatenate([scal_canon, pad], axis=1)
        step = self._rows_jit(max_rows, complete)
        parts = [step(scal_canon[:, lo : lo + max_rows], *self._tab)
                 for lo in range(0, n_chunks * max_rows, max_rows)]
        out = tuple(jnp.concatenate([p[i] for p in parts], axis=1)
                    for i in range(3))
        return tuple(c[:, :R] for c in out)
