"""Concrete engines: curve + scalar field + transcript + PCS bundles.

Reference: src/provider/mod.rs:33-90 defines PallasHyraxEngine,
VestaHyraxEngine, P256HyraxEngine, T256HyraxEngine, Bn254Engine — all
Keccak256Transcript + HyraxPCS.  This library ships the four curves with
public parameters; the T256 curve's constants live only inside
halo2curves (not recoverable from the reference repo), so
P256HyraxEngine is the 256-bit NIST-class benchmark engine
(see ec/curve.py module docstring).
"""

from __future__ import annotations

import functools

from ..ec.curve import CurveSpec, get_curve
from ..ec.device import DeviceCurve
from ..field.constants import FieldSpec
from ..field.jnp_ops import FieldOps
from ..pcs.hyrax import HyraxPCS
from ..transcript.transcript import Transcript


class Engine:
    """Ties base field, scalar field, group, transcript, and PCS together
    (reference traits/mod.rs:37-61)."""

    def __init__(self, curve_name: str):
        self.name = curve_name
        self.curve: CurveSpec = get_curve(curve_name)
        self.scalar: FieldSpec = self.curve.scalar
        self.base: FieldSpec = self.curve.base
        self.dc = DeviceCurve(self.curve)
        self.fs = FieldOps(self.scalar)  # scalar-field device ops
        self.pcs = HyraxPCS(self.curve, self.dc, self.fs)

    def transcript(self, label: bytes) -> Transcript:
        return Transcript(self.scalar, label)


@functools.lru_cache(maxsize=None)
def get_engine(name: str) -> Engine:
    table = {
        "PallasHyraxEngine": "pallas",
        "VestaHyraxEngine": "vesta",
        "P256HyraxEngine": "p256",
        "Bn254Engine": "bn254",
    }
    return Engine(table.get(name, name))
