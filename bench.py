"""Headline benchmark: BN254 G1 MSM throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. The
reference publishes no numbers (BASELINE.md — `"published": {}`), so
vs_baseline is null; the north-star comparison (ICICLE-on-A100 at 2^24) is
tracked in BASELINE.md.

Design notes: all lanes share one base point — Pippenger's bucket phase is
scalar-driven (digit histogram), so identical points are perf-equivalent to
random points while letting the result be verified in O(1) host work
(Σsᵢ·P). Scalars are uniform over fr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import random

    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.device import DeviceCtx
    from gnark_icicle_tpu.ops.msm import pick_window

    log_n = int(os.environ.get("BENCH_LOG_N", "20"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    n = 1 << log_n

    if os.environ.get("BENCH_METRIC", "msm") == "ntt":
        return bench_ntt(log_n, iters)

    ctx = DeviceCtx(bn254.BN254)
    rng = random.Random(7)
    pt = bn254.G1.random_point(rng)
    (px, py), inf = ctx.g1_points([pt])
    px = np.broadcast_to(np.asarray(px), (n, ctx.fp_dev.K)).copy()
    py = np.broadcast_to(np.asarray(py), (n, ctx.fp_dev.K)).copy()
    inf = np.zeros(n, dtype=bool)

    nprng = np.random.default_rng(7)
    scal = nprng.integers(0, 1 << 16, size=(n, ctx.fr_dev.K), dtype=np.int32)
    scal[:, -1] &= 0x3FFF  # keep scalars < 2^254 (< r·(1+eps); exactness
    # of the sum check handles the mod)

    import jax.numpy as jnp

    px_d, py_d = jnp.asarray(px), jnp.asarray(py)
    inf_d, scal_d = jnp.asarray(inf), jnp.asarray(scal)

    c = pick_window(n)
    kern = ctx.msm_g1

    # compile + warmup
    res = kern.msm((px_d, py_d), inf_d, scal_d, c)
    jax.block_until_ready(res)

    # fresh scalar buffer per iteration (dedupe-proof timing); keep the last
    # for the verification below
    times = []
    for i in range(iters):
        scal[0, 0] = (scal[0, 0] + 1) & 0xFFFF
        scal_d = jnp.asarray(scal)
        t0 = time.perf_counter()
        res = kern.msm((px_d, py_d), inf_d, scal_d, c)
        jax.block_until_ready(res)
        times.append(time.perf_counter() - t0)
    best = min(times)

    # O(1) correctness check: result must equal (Σ sᵢ)·P
    got = ctx.g1_to_host(res)
    total = 0
    pw = 1
    for limb_col in range(scal.shape[1]):
        total += int(scal[:, limb_col].astype(object).sum()) * pw
        pw <<= 16
    want = bn254.G1.scalar_mul(pt, total % bn254.R)
    assert got == want, "bench MSM result failed verification"

    print(json.dumps({
        "metric": f"msm_g1_bn254_2^{log_n}",
        "value": round(n / best, 1),
        "unit": "points/s",
        "vs_baseline": None,
    }))


def bench_ntt(log_n: int, iters: int):
    """Secondary metric: BN254-fr forward NTT throughput (BENCH_METRIC=ntt).

    Verified against a host evaluation at one random point (the NTT output
    at index j is p(ω^j))."""
    import json as _json
    import random
    import time as _time

    import jax
    import numpy as np

    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.device import DeviceCtx

    n = 1 << log_n
    ctx = DeviceCtx(bn254.BN254)
    dom = ctx.domain(log_n)
    nprng = np.random.default_rng(11)
    limbs = nprng.integers(0, 1 << 16, size=(n, ctx.fr_dev.K),
                           dtype=np.int32)
    limbs[:, -1] &= 0x3FFF
    # fresh input per iteration: the serving stack can dedupe repeated
    # identical dispatches, which fakes the timing
    variants = []
    for i in range(iters + 1):
        v = limbs.copy()
        v[0, 0] = (v[0, 0] + i) & 0x3FFF
        variants.append(ctx.fr_mont(v))
    res = dom.ntt(variants[-1])
    jax.block_until_ready(res)
    times = []
    for i in range(iters):
        t0 = _time.perf_counter()
        res = dom.ntt(variants[i])
        jax.block_until_ready(res)
        times.append(_time.perf_counter() - t0)
    best = min(times)

    # spot-check one output coefficient against host Horner
    q = bn254.R
    j = random.Random(5).randrange(n)
    coeffs = [0] * n
    got_j = ctx.fr_dev.decode(np.asarray(res[j : j + 1]))[0]
    limbs_used = limbs.copy()
    limbs_used[0, 0] = (limbs_used[0, 0] + (iters - 1)) & 0x3FFF
    vals = [
        int.from_bytes(
            np.ascontiguousarray(limbs_used[i]).astype(np.uint16).tobytes(),
            "little",
        ) % q
        for i in range(n)
    ]
    wj = pow(bn254.FR.root_of_unity(log_n), j, q)
    want = 0
    for c in reversed(vals):
        want = (want * wj + c) % q
    assert got_j == want, "NTT output failed host verification"

    print(_json.dumps({
        "metric": f"ntt_fr_bn254_2^{log_n}",
        "value": round(n / best, 1),
        "unit": "elems/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
