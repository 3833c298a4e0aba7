"""Device compute kernels: limb field arithmetic, EC, NTT, MSM, poly ops.

This package is the TPU-native replacement for the role ICICLE's CUDA kernels
play in the reference (SURVEY.md §2.3): everything here is jax/jnp + Pallas,
batched over leading axes, jit/shard_map friendly (static shapes, no
data-dependent Python control flow).
"""

from .field import LimbField, int_to_limbs, ints_to_limbs, limbs_to_int, limbs_to_ints  # noqa: F401
