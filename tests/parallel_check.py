"""Standalone multi-chip check, run on an 8-device virtual CPU mesh.

Invoked as a subprocess by test_parallel.py (and mirrors what the driver's
dryrun_multichip validates): sharded 4-step NTT and sharded MSM must agree
bit-exactly with their single-device counterparts (SURVEY.md §4 tier 5:
"multi-chip tests run the same kernels on 1 chip / N and compare bit-exactly").
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

# jax may be pre-imported by site configuration with the TPU platform pinned;
# force the virtual-device CPU mesh before the backend initializes.
import jax as _jax_cfg

_jax_cfg.config.update("jax_platforms", "cpu")

import random

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.device import DeviceCtx
from gnark_icicle_tpu.ops.ntt import domain_for
from gnark_icicle_tpu.parallel import sharded_msm, ShardedNTT


def main():
    assert len(jax.devices()) == 8, jax.devices()
    mesh = Mesh(np.array(jax.devices()), ("shard",))
    ctx = DeviceCtx(bn254.BN254)
    rng = random.Random(5)

    # --- sharded NTT vs single-device Domain (N = 256, d = 8) -------------
    log_n = 8
    n = 1 << log_n
    vals = [rng.randrange(bn254.R) for _ in range(n)]
    x = ctx.fr_mont(vals)
    x_host = np.asarray(x)  # Domain/Sharded transforms DONATE their inputs
    dom = ctx.domain(log_n)
    want = np.asarray(dom.ntt(jnp.array(x)))
    sntt = ShardedNTT(ctx.fr_dev, bn254.FR, log_n, mesh, "shard")
    got = np.asarray(sntt.ntt(jnp.array(x)))
    assert (got == want).all(), "sharded NTT mismatch"

    roundtrip = np.asarray(sntt.intt(sntt.ntt(jnp.array(x))))
    assert (roundtrip == x_host).all(), "sharded NTT roundtrip failed"
    print("sharded NTT: OK")

    # --- sharded MSM vs host oracle (N = 64, d = 8) ------------------------
    n_pts = 64
    pts = [bn254.G1.random_point(rng) for _ in range(n_pts)]
    pts[3] = None  # infinity in-kernel
    scalars = [rng.randrange(bn254.R) for _ in range(n_pts)]
    scalars[5] = 0
    (px, py), inf = ctx.g1_points(pts)
    scal = ctx.fr_scalars(scalars)
    res = sharded_msm(ctx.msm_g1, mesh, "shard", (px, py), inf, scal)
    got_pt = ctx.g1_to_host(res)
    want_pt = bn254.G1.msm(scalars, pts)
    assert got_pt == want_pt, f"sharded MSM mismatch: {got_pt} != {want_pt}"
    print("sharded MSM: OK")

    # --- super-op pipelining over sub-meshes (SURVEY §2.4(c)) --------------
    # 4 disjoint 2-device sub-meshes; 3 G1 MSM jobs + 1 G2 job dispatched
    # before any result is awaited. Each result must match the host oracle
    # (a sub-mesh placement bug can't cancel out across jobs).
    import time

    from gnark_icicle_tpu.parallel.pipeline import (
        dispatch_msm, split_submeshes,
    )

    meshes = split_submeshes(jax.devices(), {"a": 2, "b1": 2, "b2": 2,
                                             "hk": 2})
    n_job = 47  # odd: exercises the infinity/zero-scalar padding path
    jobs = []
    for name in ("a", "b1", "hk"):
        jpts = [bn254.G1.random_point(rng) for _ in range(n_job)]
        jpts[0] = None
        jsc = [rng.randrange(bn254.R) for _ in range(n_job)]
        dummy = jpts[1]
        (jx, jy), _ = ctx.g1_points(
            [p if p is not None else dummy for p in jpts])
        jinf = jnp.asarray(np.array([p is None for p in jpts]))
        jobs.append((name, ctx.msm_g1, (jx, jy), jinf,
                     ctx.fr_scalars(jsc), bn254.G1.msm(jsc, jpts),
                     ctx.g1_to_host))
    g2pts = [bn254.G2.random_point(rng) for _ in range(n_job)]
    g2sc = [rng.randrange(bn254.R) for _ in range(n_job)]
    g2p, g2inf = ctx.g2_points(g2pts)
    jobs.append(("b2", ctx.msm_g2, g2p, g2inf, ctx.fr_scalars(g2sc),
                 bn254.G2.msm(g2sc, g2pts), ctx.g2_to_host))

    # serial: await each dispatch before issuing the next
    t0 = time.perf_counter()
    for name, kern, pts_d, inf_d, sc_d, _, _ in jobs:
        jax.block_until_ready(dispatch_msm(kern, meshes[name], pts_d,
                                           inf_d, sc_d))
    t_serial = time.perf_counter() - t0

    # pipelined: issue all four, then await
    t0 = time.perf_counter()
    results = [
        dispatch_msm(kern, meshes[name], pts_d, inf_d, sc_d)
        for name, kern, pts_d, inf_d, sc_d, _, _ in jobs
    ]
    jax.block_until_ready(results)
    t_pipe = time.perf_counter() - t0

    for (name, _, _, _, _, want, to_host), res_d in zip(jobs, results):
        got = to_host(res_d)
        assert got == want, f"pipelined MSM[{name}] mismatch"
    print(f"pipelined sub-mesh MSMs: OK "
          f"(serial {t_serial*1e3:.0f} ms vs pipelined {t_pipe*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
    print("PARALLEL_CHECK_PASSED")
