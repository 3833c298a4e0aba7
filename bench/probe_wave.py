"""Wave-phase (MSM phase B) cost decomposition on the real chip.

VERDICT r4 item 1 gate: before building the Pallas DMA-gather wave loop,
measure WHERE the phase-B time actually goes at production sizes. Four
variants of a T-step wave loop (full lane width L = W·B, no staging), each
ONE jit with the loop inside (chained, dedupe-proof):

  full       gather + unpack/transpose + fused EC mixed-add  (the real body)
  nogather   contiguous slice instead of the row gather      (Δ = gather)
  gatheronly gather + xor-accumulate, no EC math             (gather+raw glue)
  muls       11 chained Pallas mont_muls, resident operands  (the mul floor)

Derived: gather premium = full − nogather; glue = nogather − muls − add/sub
floor. Values are random limb garbage — a TIMING probe (phase code is data-
independent vector work; correctness is covered by tests and bench.py).

Run alone on the chip:  PROBE_LOG_N=22 python bench/probe_wave.py
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

    log_n = int(os.environ.get("PROBE_LOG_N", "22"))
    T = int(os.environ.get("PROBE_STEPS", "32"))
    n = 1 << log_n
    ctx = DeviceCtx(bn254.BN254)
    kern = ctx.msm_g1
    curve = kern.curve
    c = pick_window(n)
    B = 1 << (c - 1)
    tc = TCurve(curve.f.F, curve.b3_host)
    K = curve.f.F.K
    K2 = K // 2
    rng = np.random.default_rng(5)

    def rnd_limbs(shape):
        a = rng.integers(0, 1 << 16, size=shape, dtype=np.int32)
        a[..., -1] &= 0x3FFF
        return a

    # ---- phase-A outputs (one real pass of the kernel's own code) ---------
    scal = jnp.asarray(rnd_limbs((n, ctx.fr_dev.K)))
    inf_mask = jnp.zeros(n, dtype=bool)

    @jax.jit
    def phase_a(scal, inf_mask):
        digits = kern._signed_digits(scal, c)
        sign = digits < 0
        mag = jnp.abs(digits)
        bucket_id = jnp.where((mag == 0) | inf_mask[None, :], B, mag - 1)
        key = (bucket_id.astype(jnp.int32) << 1) | sign.astype(jnp.int32)
        iota = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None, :], key.shape)
        sorted_key, order = jax.lax.sort((key, iota), dimension=1, num_keys=1)
        sorted_bid = sorted_key >> 1
        sorted_sign = (sorted_key & 1).astype(jnp.bool_)
        bvals = jnp.arange(B, dtype=sorted_bid.dtype)
        starts = jax.vmap(lambda s: jnp.searchsorted(s, bvals, side="left"))(
            sorted_bid).astype(jnp.int32)
        ends = jax.vmap(lambda s: jnp.searchsorted(s, bvals, side="right"))(
            sorted_bid).astype(jnp.int32)
        counts = ends - starts
        W = digits.shape[0]
        L = W * B
        counts_f = counts.reshape(L)
        lane_order = jnp.argsort(-counts_f)
        win_of_lane = (jnp.arange(L, dtype=jnp.int32) // B)[lane_order]
        return (order.reshape(-1), sorted_sign.reshape(-1),
                starts.reshape(L)[lane_order], counts_f[lane_order],
                win_of_lane)

    order_flat, sign_flat, starts_p, counts_p, win_of_lane = (
        jax.block_until_ready(phase_a(scal, inf_mask)))
    W = kern._signed_digits(scal[:1], c).shape[0]
    L = W * B
    S = L

    px = jnp.asarray(rnd_limbs((n, K)))
    py = jnp.asarray(rnd_limbs((n, K)))

    def pack(a):
        a = a.astype(jnp.uint32)
        return (a[:, 0::2] | (a[:, 1::2] << 16)).astype(jnp.int32)

    packed = jnp.concatenate([pack(px), pack(py)], axis=1)  # (n, K)

    def unpack(rows, S):
        lo = rows & jnp.uint32(0xFFFF)
        hi = rows >> 16
        return jnp.stack([lo, hi], axis=1).reshape(K, S)

    # every large array rides as a runtime ARGUMENT — closed-over device
    # arrays embed as inline HLO constants and blow the remote-compile
    # request limit (HTTP 413; same fix as ops/ntt.py round 3)
    def make_loop(gather: str, addmode: str):
        @jax.jit
        def run(acc0, packed, starts_p, counts_p, win_of_lane,
                order_flat, sign_flat):
            def body(t, acc):
                if gather == "real":
                    idx_sorted = jnp.clip(starts_p + t, 0, n - 1)
                    flat_idx = win_of_lane * n + idx_sorted
                    pt_idx = order_flat[flat_idx]
                    g = packed[pt_idx]
                else:  # contiguous slice, same bytes
                    g = jax.lax.dynamic_slice(
                        packed, (jnp.clip(t, 0, n - S - 1), 0), (S, K))
                if addmode == "xor_raw":  # no transpose/unpack either
                    return (acc[0],
                            jnp.bitwise_xor(acc[1],
                                            jnp.transpose(g, (1, 0))[:K]),
                            acc[2])
                gt = jnp.transpose(g, (1, 0)).astype(jnp.uint32)
                qx = unpack(gt[:K2], S).astype(jnp.int32)
                qy = unpack(gt[K2:], S).astype(jnp.int32)
                valid = t < counts_p
                sg = sign_flat[jnp.clip(win_of_lane * n + starts_p + t,
                                        0, W * n - 1)].astype(jnp.int32)
                if addmode == "ec":
                    return tc.add_mixed_masked(acc, (qx, qy), valid, sg)
                # xor: keeps the gather+unpack data path, no EC math
                return (jnp.bitwise_xor(acc[0], qx),
                        jnp.bitwise_xor(acc[1], qy), acc[2])

            return jax.lax.fori_loop(0, T, body, acc0)

        return run

    big_args = (packed, starts_p, counts_p, win_of_lane,
                order_flat, sign_flat)

    def timed(fn, mk_args, iters=2):
        out = fn(mk_args(0), *big_args)
        np.asarray(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts = []
        for i in range(iters):
            a = jax.block_until_ready(mk_args(i + 1))
            t0 = time.perf_counter()
            out = fn(a, *big_args)
            np.asarray(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def acc_init(i):
        a = tc.identity(S)
        # perturb to defeat dispatch dedupe
        return (a[0].at[0, 0].set(i), a[1], a[2])

    results = {}
    for name, (g, m) in {
        "full": ("real", "ec"),
        "nogather": ("slice", "ec"),
        "gatheronly": ("real", "xor_raw"),
        "gather_unpack": ("real", "xor"),
    }.items():
        fn = make_loop(g, m)
        t = timed(fn, acc_init)
        results[name] = t
        print(json.dumps({
            "probe": name, "log_n": log_n, "steps": T, "lanes": S,
            "s": round(t, 4), "ms_per_step": round(1e3 * t / T, 3),
            "lane_adds_per_s": round(T * S / t, 1),
        }), flush=True)

    # ---- pure mont_mul floor: 11·T chained muls on resident (K, S) --------
    x0 = jnp.asarray(rnd_limbs((K, S)).astype(np.int32))
    y0 = jnp.asarray(rnd_limbs((K, S)).astype(np.int32))

    @jax.jit
    def mul_run(x, y):
        def mul_body(t, x):
            for _ in range(11):
                x = tc._mul(x, y, True)
            return x

        return jax.lax.fori_loop(0, T, mul_body, x)

    def timed_mul(iters=2):
        out = mul_run(x0, y0)
        np.asarray(jnp.sum(out.astype(jnp.float32)))
        ts = []
        for i in range(iters):
            a = jax.block_until_ready(x0.at[0, 0].set(i + 1))
            t0 = time.perf_counter()
            out = mul_run(a, y0)
            np.asarray(jnp.sum(out.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_mul = timed_mul()
    results["muls11"] = t_mul
    print(json.dumps({
        "probe": "muls11", "log_n": log_n, "steps": T, "lanes": S,
        "s": round(t_mul, 4), "ms_per_step": round(1e3 * t_mul / T, 3),
        "montmul_per_s": round(11 * T * S / t_mul, 1),
    }), flush=True)

    print(json.dumps({
        "probe": "summary", "log_n": log_n,
        "gather_premium_s": round(results["full"] - results["nogather"], 4),
        "mul_floor_s": round(results["muls11"], 4),
        "glue_s": round(results["nogather"] - results["muls11"], 4),
        "note": "per T steps at full lane width; full-kernel steps ≈ "
                "staged area / L",
    }), flush=True)


if __name__ == "__main__":
    main()
