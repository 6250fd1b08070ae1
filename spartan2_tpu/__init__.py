"""spartan2_tpu: a TPU-native Spartan/NeutronNova zkSNARK library.

Package layout mirrors the reference's layer map (SURVEY.md section 1):
field/ (L1 limb kernels), transcript/ (Keccak Fiat-Shamir), polys/ +
sumcheck/ (L3), r1cs/ (L4), ec/ + pcs/ (L2 curve/MSM/Hyrax), frontend/
(L5 circuit synthesis), snark/ (L6 proof systems).

Persistent compilation caching is handled exclusively by
``spartan2_tpu.utils.jitcache`` (SHA-256 of lowered HLO + backend, a
process-stable key).  JAX's built-in persistent cache is deliberately
NOT enabled: its keys are not stable across processes on this backend
(identical HLO, different keys), and its in-compile cache write
re-serializes every large executable a second time — observed wedging
a prep commit for ~30 minutes inside ``executable.serialize()`` while
writing an entry no later process could ever hit.
"""
