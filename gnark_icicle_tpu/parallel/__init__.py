"""Multi-chip parallelism: mesh-sharded MSM and 4-step NTT over ICI/DCN
collectives (SURVEY.md §2.4 — the first-class TPU counterpart to the
reference's single-process goroutine/GPU parallelism)."""

from .msm import sharded_msm
from .ntt import ShardedNTT
from .pipeline import dispatch_msm, pipelined_groth16_msms, split_submeshes

__all__ = [
    "sharded_msm", "ShardedNTT",
    "split_submeshes", "dispatch_msm", "pipelined_groth16_msms",
]
