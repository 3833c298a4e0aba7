"""CPU validation of the batch-affine MSM wave path (GNARK_TPU_AFFINE_MSM).

Run: python -u bench/_affine_check.py   (forces CPU itself — safe next to
a live TPU job).
"""
import jax

jax.config.update("jax_platforms", "cpu")
import os

os.environ["GNARK_TPU_T_MSM"] = "force"
os.environ["GNARK_TPU_AFFINE_MSM"] = "1"
import random

import numpy as np
import jax.numpy as jnp

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.ops.field import field_for
from gnark_icicle_tpu.ops.ec import DevField, DevCurve
from gnark_icicle_tpu.ops.ec_t import TCurve
from gnark_icicle_tpu.ops.msm import msm_host

FP = field_for(bn254.P)
tc = TCurve(FP, 9)

# 1. batch_inv at odd width
rng = random.Random(3)
n = 37
vals = [rng.randrange(1, bn254.P) for _ in range(n)]
R = 1 << (16 * FP.K)
mont = [v * R % bn254.P for v in vals]
x = jnp.asarray(
    [[(m >> (16 * i)) & 0xFFFF for m in mont] for i in range(FP.K)],
    jnp.int32,
)
inv = tc.batch_inv(x, use_pallas=False)
got = np.asarray(inv)
for j, v in enumerate(vals):
    val = sum(int(got[i, j]) << (16 * i) for i in range(FP.K))
    want = pow(v, -1, bn254.P) * R % bn254.P
    assert val == want, (j, val, want)
print("batch_inv ok", flush=True)

# 2. full MSM vs host oracle (identity/doubling/sign lanes all exercised)
G1 = DevCurve(DevField(FP), 9)
pts = [bn254.G1.random_point(rng) for _ in range(33)]
pts[2] = None
pts[7] = pts[4]          # duplicate point -> same-bucket collisions
scalars = [rng.randrange(bn254.R) for _ in range(33)]
scalars[5] = 0
scalars[7] = scalars[4]  # identical (point, scalar) pair -> forced doubling
got = msm_host(G1, bn254.FR, pts, scalars)
want = bn254.G1.msm(scalars, pts)
assert got == tuple(want), (got, want)
print("affine msm ok", flush=True)
