"""gnark_icicle_tpu — a TPU-native zk-SNARK framework.

Capability parity target: ingonyama-zk/gnark-icicle (gnark v0.11.0 + ICICLE
CUDA offload) — see SURVEY.md at the repo root for the layer map this package
follows. The compute path (field arithmetic, NTT, MSM, polynomial ops) is
jax/jnp + Pallas sharded over `jax.sharding.Mesh`; host orchestration,
witness solving and the verifier oracle are Python big-int.

Layout:
  curves/     host parameters + pure-Python field/EC/pairing oracle
  ops/        device kernels (limb field, EC, NTT, MSM, poly)
  frontend/   circuit DSL -> constraint systems (r1cs / scs builders)
  constraint/ constraint IR + levelled witness solver + hint registry
  backend/    Groth16 / PLONK setup-prove-verify, witness, serialization
  parallel/   mesh plumbing, multi-chip MSM / 4-step NTT / super-op pipeline
  std/        gadget stdlib (mimc, bits, rangecheck, merkle, ...)
  profile/    constraint-attribution profiler
"""

__version__ = "0.1.0"
