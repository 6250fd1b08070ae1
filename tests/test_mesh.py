"""Multi-chip prove: SpartanSNARK with the outer sum-check lane-sharded
over an 8-device mesh.  Gated by SPARTAN2_RUN_MESH=1: runs in a CPU
subprocess (the axon platform exposes one chip; XLA:CPU compiles of the
sharded kernels take minutes on this host and land in the executable
cache)."""

import os
import subprocess
import sys

import pytest

SCRIPT = r"""
import random
from spartan2_tpu.frontend.constraint_system import Num, lc, ONE
from spartan2_tpu.parallel.mesh import make_mesh
from spartan2_tpu.provider.engines import get_engine
from spartan2_tpu.snark.spartan import SpartanSNARK


class ChainCircuit:
    '''x_{i+1} = x_i^2 chain with the final value public.'''

    N = 126

    def public_values(self):
        p = (1 << 255) * 0 + get_engine("PallasHyraxEngine").scalar.modulus
        x = 3
        for _ in range(self.N):
            x = x * x % p
        return [x]

    def shared(self, cs):
        return []

    def precommitted(self, cs, shared):
        return []

    def num_challenges(self):
        return 0

    def synthesize(self, cs, shared, precommitted, challenges):
        x = Num.alloc(cs, 3)
        for _ in range(self.N):
            x = x.square(cs)
        x.inputize(cs)


det = lambda seed: (lambda q, r=random.Random(seed).randrange: r(q))
engine = get_engine("PallasHyraxEngine")
circuit = ChainCircuit()
pk, vk = SpartanSNARK.setup(engine, circuit, width=4)
prep = SpartanSNARK.prep_prove(pk, circuit, rng=det(1))
mesh = make_mesh(8)
proof, _ = SpartanSNARK.prove(pk, circuit, prep, rng=det(2), mesh=mesh)
assert SpartanSNARK.verify(proof, vk) == circuit.public_values()
print("MESH_PROVE_OK")

# row-sharded Hyrax commit == single-device comb MSM
import numpy as np
import jax.numpy as jnp
from spartan2_tpu.parallel.sumcheck_shard import commit_rows_sharded

ck = pk.ck
comb = ck.comb(64)
rng = np.random.default_rng(3)
scal = jnp.asarray(rng.integers(0, 50, (22, 16, ck.num_cols), dtype=np.int32))
scal = jnp.where(jnp.arange(22)[:, None, None] == 0, scal, 0)  # small scalars
ref = engine.pcs.dc.to_affine_host(comb.rows_msm(scal))
got = engine.pcs.dc.to_affine_host(commit_rows_sharded(mesh, comb, scal))
assert ref == got, "sharded commit mismatch"
print("MESH_COMMIT_OK")
"""


@pytest.mark.skipif(not os.environ.get("SPARTAN2_RUN_MESH"),
                    reason="slow: CPU-mesh prove (set SPARTAN2_RUN_MESH=1)")
def test_mesh_sharded_prove():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                         capture_output=True, text=True, timeout=3600)
    assert "MESH_PROVE_OK" in res.stdout, res.stderr[-3000:]
    assert "MESH_COMMIT_OK" in res.stdout, res.stderr[-3000:]
