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
from spartan2_tpu.utils.serde import spartan_proof_to_bytes


class ChainCircuit:
    '''x_{i+1} = x_i^2 chain with the final value public.  N = 1000
    makes num_cons ~2^10 so the sharded Gruen outer prover runs real
    sharded rounds on an 8-chip mesh (el_len = 2^(m/2-1) >= 8).'''

    N = 1000

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
# the sharded Gruen rounds must be byte-identical to the single-device
# Gruen engine (same flat constants, same finish algebra)
prep1 = SpartanSNARK.prep_prove(pk, circuit, rng=det(1))
proof1, _ = SpartanSNARK.prove(pk, circuit, prep1, rng=det(2))
assert (spartan_proof_to_bytes(proof, engine)
        == spartan_proof_to_bytes(proof1, engine)), \
    "mesh proof differs from single-device proof"
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


NN_SCRIPT = r"""
import random
from spartan2_tpu.frontend.constraint_system import Num, lc, ONE
from spartan2_tpu.parallel.mesh import make_mesh
from spartan2_tpu.provider.engines import get_engine
from spartan2_tpu.snark.neutronnova import NeutronNovaZkSNARK
from spartan2_tpu.utils.serde import neutronnova_proof_to_bytes


class ChainStep:
    '''x_{i+1} = x_i^2 chain, final value public; seed differs per step.'''

    N = 62

    def __init__(self, x0):
        self.x0 = x0

    def public_values(self):
        p = get_engine("PallasHyraxEngine").scalar.modulus
        x = self.x0
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
        x = Num.alloc(cs, self.x0)
        for _ in range(self.N):
            x = x.square(cs)
        x.inputize(cs)


class Core:
    def public_values(self):
        return [42]

    def shared(self, cs):
        return []

    def precommitted(self, cs, shared):
        return []

    def num_challenges(self):
        return 0

    def synthesize(self, cs, shared, precommitted, challenges):
        a = Num.alloc(cs, 6)
        b = Num.alloc(cs, 7)
        y = a.mul(cs, b)
        y.inputize(cs)


det = lambda seed: (lambda q, r=random.Random(seed).randrange: r(q))
engine = get_engine("PallasHyraxEngine")
steps = [ChainStep(3), ChainStep(5)]
core = Core()
pk, vk = NeutronNovaZkSNARK.setup(engine, steps[0], core, 2, width=4)

prep = NeutronNovaZkSNARK.prep_prove(pk, steps, core, rng=det(1))
proof_1dev, _ = NeutronNovaZkSNARK.prove(pk, steps, core, prep, rng=det(2))
pv_steps, pv_core = NeutronNovaZkSNARK.verify(proof_1dev, vk, 2)
assert pv_steps == [s.public_values() for s in steps]

prep = NeutronNovaZkSNARK.prep_prove(pk, steps, core, rng=det(1))
proof_mesh, _ = NeutronNovaZkSNARK.prove(pk, steps, core, prep, rng=det(2),
                                         mesh=make_mesh(8))
assert (neutronnova_proof_to_bytes(proof_mesh, engine)
        == neutronnova_proof_to_bytes(proof_1dev, engine)), \
    "sharded ZK sum-check proof differs from single-device"
print("NN_MESH_OK")
"""


def _mesh_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return env


@pytest.mark.skipif(not os.environ.get("SPARTAN2_RUN_MESH"),
                    reason="slow: CPU-mesh prove (set SPARTAN2_RUN_MESH=1)")
def test_mesh_sharded_prove():
    res = subprocess.run([sys.executable, "-c", SCRIPT], env=_mesh_env(),
                         capture_output=True, text=True, timeout=3600)
    assert "MESH_PROVE_OK" in res.stdout, res.stderr[-3000:]
    assert "MESH_COMMIT_OK" in res.stdout, res.stderr[-3000:]


@pytest.mark.skipif(not os.environ.get("SPARTAN2_RUN_MESH"),
                    reason="slow: CPU-mesh prove (set SPARTAN2_RUN_MESH=1)")
def test_mesh_sharded_nn_zk_sumchecks():
    """NeutronNova with the batched ZK outer/inner sum-checks sharded
    must produce a byte-identical proof to the single-device prover."""
    res = subprocess.run([sys.executable, "-c", NN_SCRIPT], env=_mesh_env(),
                         capture_output=True, text=True, timeout=3600)
    assert "NN_MESH_OK" in res.stdout, res.stderr[-3000:]


FUSED_SHARD_SCRIPT = r"""
import numpy as np
import jax.numpy as jnp

from spartan2_tpu.field.constants import get_field
from spartan2_tpu.field.jnp_ops import NL, FieldOps
from spartan2_tpu.field.limbs import ints_to_limbs_np, limbs_to_ints
from spartan2_tpu.transcript.device import DeviceTranscript
from spartan2_tpu.sumcheck.fused import FusedSumcheckCubicEq
from spartan2_tpu.parallel.fused_shard import FusedShardedCubicEq
from spartan2_tpu.parallel.mesh import make_mesh

spec = get_field("pallas_scalar")
ops = FieldOps(spec)
rng = np.random.default_rng(3)
m = 10
n = 1 << m
rand_f = lambda k: jnp.asarray(ints_to_limbs_np(
    [int(rng.integers(0, 2**63)) % spec.modulus for _ in range(k)], spec))
A, B, C = rand_f(n), rand_f(n), rand_f(n)
taus = [int(rng.integers(1, 2**63)) for _ in range(m)]
claim = rand_f(1)[:, 0]

td1 = DeviceTranscript(ops, label=b"s")
co1, rs1, fin1, _ = FusedSumcheckCubicEq(ops).prove(
    td1, A, B, C, claim, taus, spec)
sh = FusedShardedCubicEq(ops, make_mesh(8))
assert sh.shardable(m)
td2 = DeviceTranscript(ops, label=b"s")
co2, rs2, fin2, _ = sh.prove(td2, A, B, C, claim, taus, spec)

assert (np.asarray(td1.state) == np.asarray(td2.state)).all()
c1, c2 = np.asarray(co1), np.asarray(co2)
for j in range(m):
    assert (limbs_to_ints(c1[:, j, :], spec, mont=True)
            == limbs_to_ints(c2[:, j, :], spec, mont=True)), j
print("FUSED_SHARD_OK")
"""


@pytest.mark.skipif(not os.environ.get("SPARTAN2_RUN_MESH"),
                    reason="slow: CPU-mesh prove (set SPARTAN2_RUN_MESH=1)")
def test_mesh_fused_sharded_cubic_eq():
    """The one-dispatch sharded Gruen prover (parallel/fused_shard.py)
    must be byte-identical to the single-device fused prover (itself
    byte-identical to the per-round Gruen engine, tests/test_fused.py)."""
    res = subprocess.run([sys.executable, "-c", FUSED_SHARD_SCRIPT],
                         env=_mesh_env(), capture_output=True, text=True,
                         timeout=3600)
    assert "FUSED_SHARD_OK" in res.stdout, res.stderr[-3000:]
