"""Headline benchmark: BN254 G1 MSM throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. The
reference publishes no numbers (BASELINE.md — `"published": {}`), so
vs_baseline is null; the north-star comparison (ICICLE-on-A100 at 2^24) is
tracked in BASELINE.md.

Inputs: RANDOM points P_i = k_i·G with secret uniform 32-bit k_i,
generated ON DEVICE by a fixed-base ladder (distinct coordinates per lane —
no gather/cache flattery), verified in O(N) host work against
(Σ s_i·k_i)·G. Scalars are uniform over fr, refreshed every timed
iteration (the serving stack dedupes repeated identical dispatches).

Modes (BENCH_METRIC): "msm" (default) · "ntt" · "groth16" (end-to-end
prove latency on a rollup-scale synthetic circuit, BENCH_LOG_N constraints).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _emit(metric, value, unit):
    print(json.dumps({
        "metric": metric, "value": round(value, 1), "unit": unit,
        "vs_baseline": None,
    }))


def _scal_dot_ks(scal, ks, q: int) -> int:
    """Σᵢ scalarᵢ·kᵢ mod q via exact int64 numpy partial sums (the object-
    array version was minutes of Python at 2^24): 16-bit limb × 16-bit
    k-halves products ≤ 2^32, summed over ≤ 2^25 rows < 2^63."""
    klo = (ks & 0xFFFF).astype(np.int64)
    khi = ((ks >> 16) & 0xFFFF).astype(np.int64)
    total = 0
    for j in range(scal.shape[1]):
        col = scal[:, j].astype(np.int64)
        s = int((col * klo).sum()) + (int((col * khi).sum()) << 16)
        total += s << (16 * j)
    return total % q


def _random_points_on_device(ctx, n, rng):
    """P_i = k_i·G, k_i uniform 32-bit (device ladder, chunked so 2^24
    fits HBM). Returns device (px, py), inf mask and the host k array."""
    import jax
    import jax.numpy as jnp

    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.ops.fixed_base import FixedBaseMul, batch_normalize

    ks = rng.integers(1, 1 << 32, size=n, dtype=np.int64)
    fb = FixedBaseMul(ctx.msm_g1.curve, bn254.G1, bn254.G1.generator, 32)
    chunk = min(n, 1 << 20)
    xs, ys = [], []
    for lo in range(0, n, chunk):
        kl = np.zeros((min(chunk, n - lo), 2), dtype=np.int32)
        kk = ks[lo : lo + chunk]
        kl[:, 0] = kk & 0xFFFF
        kl[:, 1] = (kk >> 16) & 0xFFFF
        (px, py), inf = batch_normalize(ctx.msm_g1.curve,
                                        fb.mul(jnp.asarray(kl)))
        assert not bool(jnp.any(inf))  # k_i ≥ 1 and G has prime order
        xs.append(px)
        ys.append(py)
    px = jnp.concatenate(xs) if len(xs) > 1 else xs[0]
    py = jnp.concatenate(ys) if len(ys) > 1 else ys[0]
    jax.block_until_ready((px, py))
    return px, py, ks


def _probe_device(timeout_s: int = 180) -> bool:
    """The axon tunnel hangs (not errors) when down — probe it in a
    subprocess so a dead tunnel yields a diagnostic JSON line instead of
    a silent driver timeout."""
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); "
             "import jax.numpy as jnp; jnp.ones((2,)).sum()"],
            check=True, timeout=timeout_s, capture_output=True,
        )
        return True
    except Exception:
        return False


def main():
    import jax

    if not _probe_device():
        print(json.dumps({
            "metric": os.environ.get("BENCH_METRIC", "msm"),
            "value": None, "unit": "unavailable",
            "vs_baseline": None,
            "error": "device tunnel down (probe timed out)",
        }))
        return

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    log_n = int(os.environ.get("BENCH_LOG_N", "20"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    metric = os.environ.get("BENCH_METRIC", "suite")
    if metric == "ntt":
        return bench_ntt(log_n, iters)
    if metric == "groth16":
        return bench_groth16(log_n, iters)
    if metric == "msm_g2":
        return bench_msm_g2(log_n, iters)
    if metric == "plonk":
        return bench_plonk(log_n, iters)
    if metric == "msm":
        return bench_msm(log_n, iters)
    # default: the three BASELINE.md north stars, one line each, the
    # headline (staged 2^24 MSM — the best-characterized large-N number)
    # LAST so the driver's tail-parse records it. Steps are fault-isolated:
    # a worker crash mid-suite still leaves the earlier lines.
    fns = {"groth16": bench_groth16, "ntt": bench_ntt, "msm": bench_msm,
           "msm_g2": bench_msm_g2, "plonk": bench_plonk}
    spec = os.environ.get("BENCH_SUITE", "groth16:17,ntt:22,msm:24")
    for part in spec.split(","):
        name, _, ln = part.strip().partition(":")
        try:
            fns[name](int(ln) if ln else log_n, iters)
        except Exception as e:  # keep going — later metrics still matter
            print(json.dumps({
                "metric": f"{name}_2^{ln or log_n}", "value": None,
                "unit": "error", "vs_baseline": None, "error": str(e)[:200],
            }))
    return


def bench_msm(log_n: int, iters: int):
    """Headline: staged-scalar BN254 G1 MSM throughput (BENCH_METRIC=msm)."""
    import jax
    import jax.numpy as jnp

    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.device import DeviceCtx
    from gnark_icicle_tpu.ops.msm import pick_window

    n = 1 << log_n

    ctx = DeviceCtx(bn254.BN254)
    nprng = np.random.default_rng(7)
    px_d, py_d, ks = _random_points_on_device(ctx, n, nprng)
    inf_d = jnp.zeros(n, dtype=bool)

    scal = nprng.integers(0, 1 << 16, size=(n, ctx.fr_dev.K), dtype=np.int32)
    scal[:, -1] &= 0x3FFF  # keep scalars < 2^254 (< r·(1+eps); exactness
    # of the sum check handles the mod)

    c = pick_window(n)
    kern = ctx.msm_g1

    # compile + warmup
    res = kern.msm((px_d, py_d), inf_d, jnp.asarray(scal), c)
    jax.block_until_ready(res)

    # optional kernel-level trace (TensorBoard/Perfetto) of one dispatch
    # (SURVEY §5 tracing: the jax-profiler hook around the bench path)
    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    if trace_dir:
        from gnark_icicle_tpu import profile as _prof

        with _prof.device_trace(trace_dir):
            jax.block_until_ready(
                kern.msm((px_d, py_d), inf_d, jnp.asarray(scal), c))

    # fresh scalar buffer per iteration (dedupe-proof timing); keep the last
    # for the verification below
    times = []
    for i in range(iters):
        scal[0, 0] = (scal[0, 0] + 1) & 0xFFFF
        # stage the scalars FULLY on device before starting the clock: in
        # the prover they are already resident (solver output), and the
        # ~0.25 GB host->device copy at 2^22 was inflating the kernel
        # number by ~35% (phase probe vs e2e discrepancy, PERF_NOTES r3)
        scal_d = jax.block_until_ready(jnp.asarray(scal))
        t0 = time.perf_counter()
        res = kern.msm((px_d, py_d), inf_d, scal_d, c)
        got_host = ctx.g1_to_host(res)  # host transfer = real barrier
        times.append(time.perf_counter() - t0)
    best = min(times)

    # O(N) host verification: result must equal (Σ s_i·k_i mod r)·G
    q = bn254.R
    total = _scal_dot_ks(scal, ks, q)
    want = bn254.G1.scalar_mul(bn254.G1.generator, total)
    assert got_host == want, "bench MSM result failed verification"

    _emit(f"msm_g1_bn254_2^{log_n}", n / best, "points/s")


def bench_msm_g2(log_n: int, iters: int):
    """G2 MSM throughput (BENCH_METRIC=msm_g2) — the Bs2 proof element's
    kernel (≙ MsmG2OnDevice, reference icicle.go:377-393). Random distinct
    points P_i = k_i·G2 via the device fixed-base ladder; the result is
    verified against (Σ s_i·k_i)·G2 on the host."""
    import jax
    import jax.numpy as jnp

    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.device import DeviceCtx
    from gnark_icicle_tpu.ops.fixed_base import FixedBaseMul, batch_normalize
    from gnark_icicle_tpu.ops.msm import pick_window

    n = 1 << log_n
    ctx = DeviceCtx(bn254.BN254)
    nprng = np.random.default_rng(13)
    ks = nprng.integers(1, 1 << 32, size=n, dtype=np.int64)
    fb = FixedBaseMul(ctx.msm_g2.curve, bn254.G2, bn254.G2.generator, 32)
    chunk = min(n, 1 << 18)
    # stage generated chunks through HOST memory: keeping all device
    # chunks alive + the concatenate doubled HBM and OOMed at 2^24
    # (G2 affine = 4 coordinate planes; r5a ResourceExhausted)
    parts = []
    for lo in range(0, n, chunk):
        kl = np.zeros((min(chunk, n - lo), 2), dtype=np.int32)
        kk = ks[lo : lo + chunk]
        kl[:, 0] = kk & 0xFFFF
        kl[:, 1] = (kk >> 16) & 0xFFFF
        pts, inf = batch_normalize(ctx.msm_g2.curve, fb.mul(jnp.asarray(kl)))
        assert not bool(jnp.any(inf))
        parts.append(jax.tree.map(np.asarray, pts))
        del pts
    if len(parts) > 1:
        pts = jax.tree.map(
            lambda *xs: jnp.asarray(np.concatenate(xs)), *parts)
    else:
        pts = jax.tree.map(jnp.asarray, parts[0])
    del parts
    jax.block_until_ready(pts)
    inf_d = jnp.zeros(n, dtype=bool)

    scal = nprng.integers(0, 1 << 16, size=(n, ctx.fr_dev.K), dtype=np.int32)
    scal[:, -1] &= 0x3FFF
    c = pick_window(n)
    kern = ctx.msm_g2
    res = kern.msm(pts, inf_d, jnp.asarray(scal), c)
    jax.block_until_ready(res)
    times = []
    for i in range(iters):
        scal[0, 0] = (scal[0, 0] + 1) & 0xFFFF
        scal_d = jax.block_until_ready(jnp.asarray(scal))  # staged (as G1)
        t0 = time.perf_counter()
        res = kern.msm(pts, inf_d, scal_d, c)
        got_host = ctx.g2_to_host(res)
        times.append(time.perf_counter() - t0)
    best = min(times)

    q = bn254.R
    total = _scal_dot_ks(scal, ks, q)
    want = bn254.G2.scalar_mul(bn254.G2.generator, total)
    assert got_host == want, "bench G2 MSM result failed verification"
    _emit(f"msm_g2_bn254_2^{log_n}", n / best, "points/s")


def bench_ntt(log_n: int, iters: int):
    """Secondary metric: BN254-fr forward NTT throughput (BENCH_METRIC=ntt).

    Verified against a host evaluation at one random point (the NTT output
    at index j is p(ω^j))."""
    import random

    import jax

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
    # identical dispatches, which fakes the timing. Variants are derived on
    # device from ONE resident buffer (a (N,K) buffer is 1 GB at 2^24 —
    # holding iters+1 of them OOMed HBM in the round-2 sweep).
    import jax.numpy as jnp

    base = ctx.fr_mont(limbs)
    deltas = [
        ctx.fr_mont(np.array([[i] + [0] * (ctx.fr_dev.K - 1)], np.int32))[0]
        for i in range(iters + 1)
    ]
    # Timed transform: the PERMUTATION-FREE forward NTT (natural ->
    # bit-reversed). This is the op production pipelines dispatch — the
    # prover pairs rev-in/rev-out transforms so no bit-reversal gather is
    # ever materialized (ops/ntt.py module docstring; ≙ the reference
    # avoiding ReverseScalars) — and at 2^24 the eager bit-reverse's
    # extra 2 GB of buffers would not fit HBM alongside the working set.
    perturb = jax.jit(lambda b, d: b.at[0].set(ctx.fr_dev.add(b[0], d)))
    if log_n >= 23:
        # the monolithic stage graph exceeds HBM past 2^23 — production
        # uses the chunked 4-step engine there (ops/ntt.py FourStepNTT)
        from gnark_icicle_tpu.ops.ntt import FourStepNTT

        fs = FourStepNTT(ctx.fr_dev, log_n, bn254.FR.root_of_unity(log_n))
        transform = fs.ntt
        rev_out = False
    else:
        transform = dom.ntt_nat_to_rev
        rev_out = True
    res = transform(perturb(base, deltas[-1]))
    jax.block_until_ready(res)
    times = []
    for i in range(iters):
        v = perturb(base, deltas[i])
        jax.block_until_ready(v)
        t0 = time.perf_counter()
        res = transform(v)
        jax.block_until_ready(res)
        times.append(time.perf_counter() - t0)
    best = min(times)

    # spot-check one output coefficient against host Horner:
    # nat_to_rev output at index j = p(omega^bitrev(j)); 4-step is natural
    from gnark_icicle_tpu.ops.ntt import bitrev_indices

    q = bn254.R
    j = random.Random(5).randrange(n)
    jr = int(bitrev_indices(n)[j]) if rev_out else j
    got_j = ctx.fr_dev.decode(np.asarray(res[j : j + 1]))[0]
    vals = [
        int.from_bytes(
            np.ascontiguousarray(limbs[i]).astype(np.uint16).tobytes(),
            "little",
        ) % q
        for i in range(n)
    ]
    vals[0] = (vals[0] + iters - 1) % q  # the device-side perturbation
    wj = pow(bn254.FR.root_of_unity(log_n), jr, q)
    want = 0
    for c in reversed(vals):
        want = (want * wj + c) % q
    assert got_j == want, "NTT output failed host verification"

    _emit(f"ntt_fr_bn254_2^{log_n}", n / best, "elems/s")


def bench_plonk(log_n: int, iters: int):
    """End-to-end PLONK prove latency on the same synthetic chain circuit
    as bench_groth16 (SCS builder; quotient over the 4n coset, KZG batch
    openings — the full device pipeline). Setup/compile excluded."""
    import random

    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.frontend import (
        Circuit, Public, Secret, compile_circuit,
    )
    from gnark_icicle_tpu.backend import plonk
    from gnark_icicle_tpu.logger import logger

    q = bn254.R
    # each chain step lowers to ~3 SCS gates (mul + two adds) — size the
    # step count so the compiled gate count lands just under 2^log_n
    steps = ((1 << log_n) - 16) // 3

    class Chain(Circuit):
        x = Secret()
        out = Public()

        def define(self, api):
            v = self.x
            for i in range(steps):
                v = api.add(api.mul(v, v), v, i)
            api.assert_is_equal(v, self.out)

    t0 = time.perf_counter()
    cs = compile_circuit(q, Chain, builder="scs")
    logger().info("bench_plonk: compiled %d gates in %.1fs",
                  cs.nb_gates, time.perf_counter() - t0)

    x0 = 3
    v = x0
    for i in range(steps):
        v = (v * v + v + i) % q
    pub, sec = [v], [x0]

    t0 = time.perf_counter()
    pk, vk = plonk.setup(cs, bn254.BN254, rng=random.Random(1))
    logger().info("bench_plonk: setup in %.1fs", time.perf_counter() - t0)

    rng = random.Random(2)
    proof = plonk.prove(cs, pk, pub, sec, bn254.BN254, rng=rng)  # warmup
    plonk.verify(proof, vk, pub, bn254.BN254)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        proof = plonk.prove(cs, pk, pub, sec, bn254.BN254, rng=rng)
        times.append(time.perf_counter() - t0)
    plonk.verify(proof, vk, pub, bn254.BN254)
    _emit(f"plonk_prove_bn254_2^{pk.log_n}d", min(times), "s/proof")


def bench_groth16(log_n: int, iters: int):
    """End-to-end Groth16 prove latency on a synthetic rollup-scale chain
    x_{i+1} = x_i² + x_i + i (one mul gate per step, ≈2^BENCH_LOG_N
    constraints — BASELINE.md's 'prove latency at rollup-scale (~2^20)'
    anchor). Setup/compile excluded; prove timed end-to-end incl. solve."""
    import random

    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.frontend import (
        Circuit, Public, Secret, compile_circuit,
    )
    from gnark_icicle_tpu.backend import groth16
    from gnark_icicle_tpu.logger import logger

    q = bn254.R
    steps = (1 << log_n) - 2  # + the final equality ≈ 2^log_n constraints

    class Chain(Circuit):
        x = Secret()
        out = Public()

        def define(self, api):
            v = self.x
            for i in range(steps):
                v = api.add(api.mul(v, v), v, i)
            api.assert_is_equal(v, self.out)

    t0 = time.perf_counter()
    cs = compile_circuit(q, Chain)
    logger().info("bench_groth16: compiled %d constraints in %.1fs",
                cs.nb_constraints, time.perf_counter() - t0)

    x0 = 3
    v = x0
    for i in range(steps):
        v = (v * v + v + i) % q
    pub, sec = [v], [x0]

    t0 = time.perf_counter()
    pk, vk = groth16.setup(cs, bn254.BN254, rng=random.Random(1))
    logger().info("bench_groth16: setup in %.1fs", time.perf_counter() - t0)

    rng = random.Random(2)
    proof = groth16.prove(cs, pk, pub, sec, bn254.BN254, rng=rng)  # warmup
    groth16.verify(proof, vk, pub, bn254.BN254)
    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    if trace_dir:
        from gnark_icicle_tpu import profile as _prof

        with _prof.device_trace(trace_dir):
            groth16.prove(cs, pk, pub, sec, bn254.BN254, rng=rng)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        proof = groth16.prove(cs, pk, pub, sec, bn254.BN254, rng=rng)
        times.append(time.perf_counter() - t0)
    groth16.verify(proof, vk, pub, bn254.BN254)
    _emit(f"groth16_prove_bn254_2^{log_n}c", min(times), "s/proof")


if __name__ == "__main__":
    main()
