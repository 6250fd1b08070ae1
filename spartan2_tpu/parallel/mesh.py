"""Device mesh helpers for multi-chip execution.

The reference's only parallel backend is rayon work-stealing on one host
(SURVEY.md section 2); every hot loop is an associative map-reduce.  The
TPU-native equivalent: one mesh axis ("data") over chips, arrays sharded
on their lane axis, per-round reductions as psum over ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def lane_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (NL, n) limb arrays: limbs replicated, lanes split."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
