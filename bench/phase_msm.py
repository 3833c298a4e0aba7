"""Per-phase MSM timing on the real chip (round-3 MFU accounting).

Splits MSMKernel.msm at its phase boundaries and times each as its own
jitted dispatch with fresh inputs (dedupe-proof):

  A. preprocess: signed digits -> bucket ids -> argsort -> searchsorted
  B. wave accumulation (packed gathers + fused transposed mixed-adds)
  C. bucket reduction (work-efficient chunked weighted sum)
  D. window Horner

Values are random limb garbage (phases are data-independent vector code;
correctness is covered by tests/bench) — this is a TIMING probe.

Run alone on the chip:  PROBE_LOG_N=22 python bench/phase_msm.py
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

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.device import DeviceCtx
    from gnark_icicle_tpu.ops.msm import pick_window
    from gnark_icicle_tpu.ops.ec_t import TCurve

    log_n = int(os.environ.get("PROBE_LOG_N", "20"))
    n = 1 << log_n
    ctx = DeviceCtx(bn254.BN254)
    kern = ctx.msm_g1
    curve = kern.curve
    c = pick_window(n)
    B = 1 << (c - 1)
    rng = np.random.default_rng(5)

    def rnd_limbs(shape):
        a = rng.integers(0, 1 << 16, size=shape, dtype=np.int32)
        a[..., -1] &= 0x3FFF
        return a

    tc = TCurve(curve.f.F, curve.b3_host)
    K = curve.f.F.K

    # ---- phase A ----------------------------------------------------------
    @jax.jit
    def phase_a(scal, inf_mask):
        digits = kern._signed_digits(scal, c)
        sign = digits < 0
        mag = jnp.abs(digits)
        bucket_id = jnp.where((mag == 0) | inf_mask[None, :], B, mag - 1)
        order = jnp.argsort(bucket_id, axis=1)
        sorted_bid = jnp.take_along_axis(bucket_id, order, axis=1)
        sorted_sign = jnp.take_along_axis(sign, order, axis=1)
        bvals = jnp.arange(B, dtype=sorted_bid.dtype)
        starts = jax.vmap(
            lambda s: jnp.searchsorted(s, bvals, side="left"))(
            sorted_bid).astype(jnp.int32)
        ends = jax.vmap(
            lambda s: jnp.searchsorted(s, bvals, side="right"))(
            sorted_bid).astype(jnp.int32)
        counts = ends - starts
        W = digits.shape[0]
        L = W * B
        counts_f = counts.reshape(L)
        lane_order = jnp.argsort(-counts_f)
        return (order.reshape(-1), sorted_sign.reshape(-1),
                starts.reshape(L)[lane_order], counts_f[lane_order],
                lane_order, jnp.argsort(lane_order))

    def timed(fn, variants, iters=2):
        def sync(o):
            return np.asarray(
                jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32)),
                             jax.tree.leaves(o)[0]))
        sync(fn(*variants[-1]))
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            sync(fn(*variants[i]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    scal_vars = []
    for i in range(3):
        s = rnd_limbs((n, ctx.fr_dev.K))
        scal_vars.append((jnp.asarray(s), jnp.zeros(n, dtype=bool)))
    t_a = timed(phase_a, scal_vars)
    print(json.dumps({"phase": "A_preprocess", "log_n": log_n, "s": round(t_a, 3)}))

    # materialize one phase-A output for downstream phases
    order_flat, sign_flat, starts_p, counts_p, lane_order, inv_order = (
        jax.block_until_ready(phase_a(*scal_vars[0])))
    digits = kern._signed_digits(scal_vars[0][0], c)
    W = int(digits.shape[0])
    L = W * B
    win_of_lane = (jnp.arange(L, dtype=jnp.int32) // B)[lane_order]

    stage_sizes = []
    s = L
    while s >= 1024 and len(stage_sizes) < 4:
        stage_sizes.append(s)
        s //= 4
    if not stage_sizes:
        stage_sizes = [L]

    # ---- phase B ----------------------------------------------------------
    # all large index arrays ride as ARGUMENTS (closure constants embed
    # into the HLO module -> remote-compile 413 at 2^22)
    @jax.jit
    def phase_b(px, py, of, sf, sp, cp, wl, io):
        return kern._wave_accumulate_t(
            tc, (px, py), of, sf, sp, cp, wl, tuple(stage_sizes), n, L, io)

    pt_vars = [(jnp.asarray(rnd_limbs((n, K))), jnp.asarray(rnd_limbs((n, K))),
                order_flat, sign_flat, starts_p, counts_p, win_of_lane,
                inv_order)
               for _ in range(3)]
    t_b = timed(phase_b, pt_vars)
    print(json.dumps({"phase": "B_waves", "log_n": log_n, "s": round(t_b, 3),
                      "stages": stage_sizes,
                      "max_run": int(counts_p[0])}))

    # ---- phase C ----------------------------------------------------------
    @jax.jit
    def phase_c(b0, b1, b2):
        return kern._bucket_reduce_t(tc, (b0, b1, b2), W, B)

    bk_vars = [tuple(jnp.asarray(rnd_limbs((K, L)).astype(np.int32))
                     for _ in range(3)) for _ in range(3)]
    t_c = timed(phase_c, bk_vars)
    print(json.dumps({"phase": "C_reduce", "log_n": log_n, "s": round(t_c, 3),
                      "buckets": W * B}))

    # ---- phase D ----------------------------------------------------------
    per_w = [tuple(jnp.asarray(rnd_limbs((W, K)).astype(np.int32))
                   for _ in range(3)) for _ in range(3)]

    @jax.jit
    def phase_d(p0, p1, p2):
        per_window = (p0, p1, p2)
        acc = jax.tree.map(lambda a: a[W - 1], per_window)
        tail = jax.tree.map(lambda a: a[W - 2::-1], per_window)

        def horner(x, s_w):
            x = kern._double_k_scan(x, c)
            return curve.add(x, s_w), None

        acc, _ = jax.lax.scan(horner, acc, tail)
        return acc

    t_d = timed(phase_d, per_w)
    print(json.dumps({"phase": "D_horner", "log_n": log_n, "s": round(t_d, 3)}))

    total = t_a + t_b + t_c + t_d
    print(json.dumps({
        "phase": "TOTAL", "log_n": log_n, "s": round(total, 3),
        "points_per_s": round(n / total, 1),
        "note": "sum of phase minima; full-kernel bench may differ",
    }))


if __name__ == "__main__":
    main()
