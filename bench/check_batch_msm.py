"""On-device check + A/B for msm_batch (M problems, one wave loop).

Asserts per-problem results are BIT-IDENTICAL to separate msm() calls,
then times M sequential msm() dispatch sets vs one msm_batch at the same
(N, c) — the batch path amortizes the per-wave fixed overhead that
dominates small-N MSMs (PERF_NOTES round-5 2-chain teardown: 33.1 s of
msms at 35k rows). Role parity: ICICLE MSM cfg.BatchSize.

Run alone on the chip:  python bench/check_batch_msm.py
Env: BATCH_CHECK_LOG_N (default 16), BATCH_CHECK_M (default 3),
     BATCH_CHECK_ITERS (default 3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import _random_points_on_device
    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.device import DeviceCtx
    from gnark_icicle_tpu.ops.msm import pick_window

    log_n = int(os.environ.get("BATCH_CHECK_LOG_N", "16"))
    M = int(os.environ.get("BATCH_CHECK_M", "3"))
    iters = int(os.environ.get("BATCH_CHECK_ITERS", "3"))
    n = 1 << log_n

    ctx = DeviceCtx(bn254.BN254)
    nprng = np.random.default_rng(17)
    px_d, py_d, _ks = _random_points_on_device(ctx, n, nprng)
    inf_d = jnp.zeros(n, dtype=bool)
    kern = ctx.msm_g1
    c = pick_window(n)

    scal = nprng.integers(0, 1 << 16, size=(M, n, ctx.fr_dev.K),
                          dtype=np.int32)
    scal[:, :, -1] &= 0x3FFF
    scal_d = jax.block_until_ready(jnp.asarray(scal))

    # same points for each problem (the prover's A/B1 share scalars, not
    # points — either way the kernel sees an (M, N, K) operand)
    pts_b = (jnp.broadcast_to(px_d, (M,) + px_d.shape),
             jnp.broadcast_to(py_d, (M,) + py_d.shape))
    inf_b = jnp.broadcast_to(inf_d, (M, n))

    # ---- warm + bit-exactness --------------------------------------
    seps = [jax.block_until_ready(
        kern.msm((px_d, py_d), inf_d, scal_d[m], c)) for m in range(M)]
    batched = jax.block_until_ready(
        kern.msm_batch(pts_b, inf_b, scal_d, c))
    exact = True
    for m in range(M):
        for a, b in zip(jax.tree.leaves(
                jax.tree.map(lambda x, m=m: x[m], batched)),
                jax.tree.leaves(seps[m])):
            exact &= bool(jnp.array_equal(a, b))
    print(json.dumps({"check": "batch_msm_bit_exact", "log_n": log_n,
                      "M": M, "exact": exact}), flush=True)

    # shared point table (the KZG commit_batch layout: leading dim 1)
    shared = jax.block_until_ready(kern.msm_batch(
        (px_d[None], py_d[None]), inf_b, scal_d, c))
    sh_exact = True
    for m in range(M):
        for a, b in zip(jax.tree.leaves(
                jax.tree.map(lambda x, m=m: x[m], shared)),
                jax.tree.leaves(seps[m])):
            sh_exact &= bool(jnp.array_equal(a, b))
    exact = exact and sh_exact
    print(json.dumps({"check": "batch_msm_shared_bit_exact",
                      "log_n": log_n, "M": M, "exact": sh_exact}),
          flush=True)

    # ---- A/B: M sequential dispatch sets vs one batch ---------------
    sep_best, bat_best = float("inf"), float("inf")
    for i in range(iters):
        scal[:, 0, 0] = (scal[:, 0, 0] + 1) & 0xFFFF
        scal_d = jax.block_until_ready(jnp.asarray(scal))
        t0 = time.perf_counter()
        outs = [kern.msm((px_d, py_d), inf_d, scal_d[m], c)
                for m in range(M)]
        jax.block_until_ready(outs)
        sep_best = min(sep_best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = kern.msm_batch(pts_b, inf_b, scal_d, c)
        jax.block_until_ready(out)
        bat_best = min(bat_best, time.perf_counter() - t0)
    print(json.dumps({
        "metric": f"batch_msm_ab_2^{log_n}_M{M}",
        "separate_s": round(sep_best, 4), "batch_s": round(bat_best, 4),
        "speedup": round(sep_best / bat_best, 3),
        "batch_pts_per_s": round(M * n / bat_best, 1),
        "exact": exact,
    }), flush=True)


if __name__ == "__main__":
    main()
