"""Multi-scalar multiplication (Pippenger) on device (jnp over limb arrays).

Role parity: gnark-crypto's ``curve.MultiExp`` + ICICLE's ``MsmOnDevice`` /
``MsmG2OnDevice`` (reference call sites: backend/groth16/bn254/prove.go:202-304
four prover MSMs; icicle.go:299-393 device MSMs; setup batch scalar-muls
setup.go:251,320). Unlike the reference's ICICLE path, infinity inputs are
handled *in-kernel* via masking — no host-side filtering pass is needed
(reference workaround: icicle.go:98-109,343-347 for icicle#169).

TPU-first formulation of the three Pippenger phases, scatter-free and with a
compile-time graph that is O(1) in N and bucket count (every repetitive
structure is a lax.scan / lax.while_loop):

1. **Signed digit decomposition** — c-bit windows recoded to digits in
   [-2^(c-1), +2^(c-1)] (halves the bucket count); vector shift/mask ops plus
   a W-step carry sweep. Digit-0 entries and infinity points map to a trash
   bucket whose wave count is forced to zero.

2. **Bucket accumulation** — the classically scatter-bound phase. We *sort*
   indices per window by bucket id (XLA sort is dense and fast), so each
   bucket's points form a contiguous run, then run "waves": wave t adds
   sorted point ``start[b] + t`` to bucket ``b`` for every (window, bucket)
   lane simultaneously — one gather + one batched complete EC mixed-add over
   W·B lanes per wave. ``lax.while_loop`` runs exactly max-run-length waves
   (≈ N/B + deviation; data-dependent trip count, static shapes).

3. **Weighted bucket reduction** — Σ_b (b+1)·B_b. The CPU idiom (running
   suffix sum, 2B *sequential* adds — gnark-crypto's msm.go) is hostile to
   SIMD; we use log-depth Hillis–Steele suffix scans (roll + masked add under
   lax.scan) and the split Σ_{hi,lo}(hi·L+lo+1)·B = L·Σhi·rows + Σ(lo+1)·cols
   to keep the work near 2B adds, then a Horner double-and-add over windows.

Points are affine pytrees (leaf layout as in ops.ec: G1 ``(x, y)`` with
``(N, K)`` leaves, G2 the same with Fp2 ``(c0, c1)`` pairs); scalars are
plain (non-Montgomery) 16-bit-limb arrays. The result is one projective point.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .field import LimbField, I32
from .ec import DevCurve


def pick_window(n: int) -> int:
    """Window size c (bits): minimizes W·(N + bucket/reduction overhead)."""
    if n >= (1 << 17):
        return 16
    log = max(int(n).bit_length() - 1, 1)
    return max(2, min(16, log // 2 + 4))


class MSMKernel:
    """Pippenger MSM over a DevCurve, parameterized by scalar bit-width."""

    _cache: dict = {}

    def __new__(cls, curve: DevCurve, scalar_bits: int):
        key = (id(curve), scalar_bits)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        return self

    def __init__(self, curve: DevCurve, scalar_bits: int):
        if getattr(self, "_initialized", False):
            return
        self._initialized = True
        self.curve = curve
        self.scalar_bits = scalar_bits

    # ------------------------------------------------------------------
    # phase 1: signed digits
    # ------------------------------------------------------------------
    def _signed_digits(self, scalar_limbs, c: int):
        """(N, Kr) plain 16-bit limbs -> (W, N) int32 digits in [-2^(c-1), 2^(c-1)].

        W = ceil(bits/c) + 1; the extra window absorbs the final recoding carry.
        """
        n_windows = -(-self.scalar_bits // c) + 1
        limbs = scalar_limbs.astype(jnp.int32)
        n_limbs = limbs.shape[-1]

        def raw_digit(w):
            """Bits [c·w, c·w + c) of the scalar (c ≤ 16 spans ≤ 2 limbs)."""
            lo_bit = c * w
            li, off = divmod(lo_bit, 16)
            d = jnp.zeros(limbs.shape[:-1], dtype=jnp.int32)
            if li < n_limbs:
                d = (limbs[..., li] >> off) & ((1 << c) - 1)
            if off + c > 16 and li + 1 < n_limbs:
                take = off + c - 16
                d = d | ((limbs[..., li + 1] & ((1 << take) - 1)) << (16 - off))
            return d

        half = 1 << (c - 1)
        digits = []
        carry = jnp.zeros(limbs.shape[:-1], dtype=jnp.int32)
        for w in range(n_windows):
            d = raw_digit(w) + carry
            wrap = d > half  # digit +half stays positive: buckets 1..2^(c-1)
            carry = jnp.where(wrap, 1, 0)
            d = jnp.where(wrap, d - (1 << c), d)
            digits.append(d)
        return jnp.stack(digits)

    # ------------------------------------------------------------------
    # phase 3 primitives: log-depth scans along the LAST BATCH axis
    # (leaves are (..., m, K) limb arrays; the scanned axis is -2)
    # ------------------------------------------------------------------
    def _suffix_scan(self, P, m: int):
        """Inclusive suffix sums: out_i = Σ_{j≥i} P_j along axis -2."""
        if m == 1:
            return P
        steps = int(np.ceil(np.log2(m)))
        shifts = jnp.asarray([1 << k for k in range(steps)], dtype=jnp.int32)
        lane = jnp.arange(m)

        def body(x, shift):
            rolled = jax.tree.map(lambda a: jnp.roll(a, -shift, axis=-2), x)
            added = self.curve.add(x, rolled)
            mask = (lane + shift) < m
            return self.curve.select(mask, added, x), None

        P, _ = jax.lax.scan(body, P, shifts)
        return P

    def _take_lane0(self, P):
        return jax.tree.map(lambda a: a[..., 0, :], P)

    def _weighted_sum_last(self, P, m: int):
        """Σ_{i=0}^{m-1} (i+1)·P_i along axis -2 (drops that axis).

        Double suffix scan: Σ_i suffix_i = Σ_i (i+1)·P_i read at lane 0.
        """
        return self._take_lane0(self._suffix_scan(self._suffix_scan(P, m), m))

    def _double_k_scan(self, P, k: int):
        """2^k · P via a scanned doubling (graph is one double op)."""
        if k == 0:
            return P

        def body(x, _):
            return self.curve.double(x), None

        P, _ = jax.lax.scan(body, P, None, length=k)
        return P

    def _bucket_reduce(self, buckets, B: int):
        """Σ_{b=0}^{B-1} (b+1)·buckets[..., b, :] along axis -2.

        Splits b = hi·L + lo:  Σ = L·Σ_hi hi·R_hi + Σ_lo (lo+1)·C_lo
        with R = row sums over lo, C = column sums over hi — two big
        *unweighted* reductions (≈2B adds) plus two tiny weighted sums.
        """
        if B <= 128:
            return self._weighted_sum_last(buckets, B)
        log_b = (B - 1).bit_length()
        log_l = log_b // 2
        L = 1 << log_l
        H = B // L
        assert H * L == B, "bucket count must be a power of two"
        grid = jax.tree.map(
            lambda a: a.reshape(a.shape[:-2] + (H, L) + a.shape[-1:]), buckets
        )
        rows = self._take_lane0(self._suffix_scan(grid, L))  # (..., H, K)
        grid_t = jax.tree.map(lambda a: jnp.swapaxes(a, -2, -3), grid)
        cols = self._take_lane0(self._suffix_scan(grid_t, H))  # (..., L, K)

        s1 = self._suffix_scan(rows, H)
        tot_rows = self._take_lane0(s1)  # Σ R_hi
        w_rows = self._take_lane0(self._suffix_scan(s1, H))  # Σ (hi+1)·R_hi
        hi_part = self.curve.add(w_rows, self.curve.neg(tot_rows))  # Σ hi·R_hi
        w_cols = self._weighted_sum_last(cols, L)
        return self.curve.add(self._double_k_scan(hi_part, log_l), w_cols)

    # ------------------------------------------------------------------
    # transposed wave accumulation (the hot 95%; PERF_NOTES.md)
    # ------------------------------------------------------------------
    def _wave_accumulate_t(self, tc, points, order_flat, sign_flat,
                           starts_p, counts_p, win_of_lane, stage_sizes,
                           n, L, inv_order):
        """Staged-wave bucket accumulation with (K, L) transposed
        accumulators and fused Pallas adds. Returns transposed buckets,
        per coord (K, W·B), in (window, bucket) order.

        Points are gathered PACKED — two 16-bit limbs per int32, 64 B per
        (x‖y) row instead of 128 B: the on-chip gather is per-row-overhead
        bound (probe: 26 M rows/s at 128 B vs 44.6 M at 64 B), so packing
        is a ~1.7x win on the wave phase's dominant non-compute cost.

        `points` is the affine pytree; its leaves (G1: x, y — G2: the
        x/y c0/c1 planes) are flattened into one packed row per point and
        the kernel's plane tuple is rebuilt after the gather."""
        K = tc.K
        K2 = K // 2
        planes = jax.tree.leaves(points)
        n_planes = len(planes)

        def pack(a):  # (N, K) 16-bit limbs -> (N, K/2) packed u32
            a = a.astype(jnp.uint32)
            return (a[:, 0::2] | (a[:, 1::2] << 16)).astype(jnp.int32)

        packed = jnp.concatenate([pack(p) for p in planes], axis=1)
        acc = tc.identity(L)

        def make_wave(S, meta):
            starts_s, counts_s, win_s = meta

            def unpack(rows):  # (K2, S) u32 -> (K, S) interleaved limbs
                lo = (rows & jnp.uint32(0xFFFF))
                hi = (rows >> 16)
                return jnp.stack([lo, hi], axis=1).reshape(K, S)

            def wave(state):
                t, acc_s = state
                idx_sorted = jnp.clip(starts_s + t, 0, n - 1)
                valid = t < counts_s
                flat_idx = win_s * n + idx_sorted
                pt_idx = order_flat[flat_idx]
                g = packed[pt_idx]                # (S, planes·K/2) row gather
                gt = jnp.transpose(g, (1, 0)).astype(jnp.uint32)
                q = tuple(
                    unpack(gt[i * K2:(i + 1) * K2]).astype(jnp.int32)
                    for i in range(n_planes)
                )
                sg = sign_flat[flat_idx].astype(jnp.int32)
                flag = ("GNARK_TPU_FUSED_ADD2" if n_planes > 2
                        else "GNARK_TPU_FUSED_ADD")
                if os.environ.get(flag) == "1" and \
                        hasattr(tc, "add_mixed_masked_fused"):
                    return t + 1, tc.add_mixed_masked_fused(
                        acc_s, q, valid, sg)
                return t + 1, tc.add_mixed_masked(acc_s, q, valid, sg)

            return wave

        t = jnp.int32(0)
        for si, S in enumerate(stage_sizes):
            meta = (starts_p[:S], counts_p[:S], win_of_lane[:S])
            wave = make_wave(S, meta)
            if si + 1 < len(stage_sizes):
                t_stop = counts_p[stage_sizes[si + 1]]
            else:
                t_stop = counts_p[0]
            acc_s = tuple(a[:, :S] for a in acc)
            t, acc_s = jax.lax.while_loop(
                lambda st: st[0] < t_stop, wave, (t, acc_s)
            )
            acc = tuple(
                jax.lax.dynamic_update_slice(full, part, (0, 0))
                for full, part in zip(acc, acc_s)
            )

        return tuple(a[:, inv_order] for a in acc)

    # ------------------------------------------------------------------
    # batch-affine wave accumulation (G1): affine accumulators + one
    # batched inversion per wave — ~7 montmuls/add vs the projective
    # mixed add's 11, and 2 accumulator planes instead of 3.
    # ------------------------------------------------------------------
    def _wave_accumulate_affine_t(self, tc, points, order_flat, sign_flat,
                                  starts_p, counts_p, win_of_lane,
                                  stage_sizes, n, L, inv_order):
        """Same staged-wave structure as _wave_accumulate_t, but the
        (window, bucket) accumulators stay AFFINE — (x, y) planes plus an
        (L,) identity flag — and each wave is tc.affine_add_masked (slope
        via a per-wave batched inversion). Returns projective transposed
        buckets, per coord (K, W·B), in (window, bucket) order.

        Role: gnark-crypto's batch-affine Pippenger accumulation
        (ecc/bn254/multiexp_affine.go processBatchG1Affine) — there a
        serial queue with one Montgomery-trick inversion per batch; here
        every lane IS the batch and the inversion is a product tree."""
        K = tc.K
        K2 = K // 2
        planes = jax.tree.leaves(points)
        n_planes = len(planes)  # 2 for G1 (x, y); 4 for G2 plane tuples

        def pack(a):  # (N, K) 16-bit limbs -> (N, K/2) packed u32
            a = a.astype(jnp.uint32)
            return (a[:, 0::2] | (a[:, 1::2] << 16)).astype(jnp.int32)

        packed = jnp.concatenate([pack(p) for p in planes], axis=1)
        acc = tuple(
            jnp.zeros((K, L), jnp.int32) for _ in range(n_planes)
        )
        acc_inf = jnp.ones((L,), jnp.bool_)

        def make_wave(S, meta):
            starts_s, counts_s, win_s = meta

            def unpack(rows):  # (K2, S) u32 -> (K, S) interleaved limbs
                lo = (rows & jnp.uint32(0xFFFF))
                hi = (rows >> 16)
                return jnp.stack([lo, hi], axis=1).reshape(K, S)

            def wave(state):
                t, acc_s, inf_s = state
                idx_sorted = jnp.clip(starts_s + t, 0, n - 1)
                valid = t < counts_s
                flat_idx = win_s * n + idx_sorted
                pt_idx = order_flat[flat_idx]
                g = packed[pt_idx]                # (S, 2·K/2) row gather
                gt = jnp.transpose(g, (1, 0)).astype(jnp.uint32)
                q = tuple(
                    unpack(gt[i * K2:(i + 1) * K2]).astype(jnp.int32)
                    for i in range(n_planes)
                )
                sg = sign_flat[flat_idx].astype(jnp.int32)
                acc_s, inf_s = tc.affine_add_masked(
                    acc_s, inf_s, q, valid, sg
                )
                return t + 1, acc_s, inf_s

            return wave

        t = jnp.int32(0)
        for si, S in enumerate(stage_sizes):
            meta = (starts_p[:S], counts_p[:S], win_of_lane[:S])
            wave = make_wave(S, meta)
            if si + 1 < len(stage_sizes):
                t_stop = counts_p[stage_sizes[si + 1]]
            else:
                t_stop = counts_p[0]
            acc_s = tuple(a[:, :S] for a in acc)
            inf_s = acc_inf[:S]
            t, acc_s, inf_s = jax.lax.while_loop(
                lambda st: st[0] < t_stop, wave, (t, acc_s, inf_s)
            )
            acc = tuple(
                jax.lax.dynamic_update_slice(full, part, (0, 0))
                for full, part in zip(acc, acc_s)
            )
            acc_inf = jax.lax.dynamic_update_slice(acc_inf, inf_s, (0,))

        return tc.affine_to_proj(
            tuple(a[:, inv_order] for a in acc), acc_inf[inv_order]
        )

    # ------------------------------------------------------------------
    # transposed bucket reduction (mirrors _bucket_reduce, TCurve ops)
    # ------------------------------------------------------------------
    def _suffix_scan_t(self, tc, P, m: int):
        """Inclusive suffix sums along the LAST axis of (K, ..., m)-shaped
        transposed coords, with TCurve full adds on flattened lanes.

        lax.scan over the log₂(m) shift levels: ONE traced TCurve add
        regardless of m. (The unrolled version emitted ~13 Pallas kernel
        instances per level; at MSM bucket counts the resulting multi-MB
        MLIR module OOM-killed the TPU compile helper.)"""
        if m == 1:
            return P
        K = P[0].shape[0]
        shape = P[0].shape
        steps = int(np.ceil(np.log2(m)))
        shifts = jnp.asarray([1 << k for k in range(steps)], dtype=jnp.int32)
        lane = jnp.arange(m)
        flat = lambda t_: tuple(a.reshape(K, -1) for a in t_)

        def body(x, shift):
            rolled = tuple(jnp.roll(a, -shift, axis=-1) for a in x)
            added = tc.add(flat(x), flat(rolled))
            mask = (lane + shift) < m
            x = tuple(jnp.where(mask, a_n.reshape(shape), a_o)
                      for a_n, a_o in zip(added, x))
            return x, None

        P, _ = jax.lax.scan(body, P, shifts)
        return P

    def _weighted_sum_t(self, tc, P, m: int):
        """Σ (i+1)·P_i along the last axis (drops it)."""
        s = self._suffix_scan_t(tc, self._suffix_scan_t(tc, P, m), m)
        return tuple(a[..., 0] for a in s)

    def _tree_sum_t(self, tc, P, m: int):
        """Unweighted Σ_i P_i along the last axis via pairwise halving —
        m−1 adds total (work-efficient, log m dispatch depth)."""
        K = P[0].shape[0]
        while m > 1:
            half = m // 2
            g = tuple(a.reshape(a.shape[:-1] + (half, 2)) for a in P)
            flat = lambda t_: tuple(a.reshape(K, -1) for a in t_)
            a0 = tuple(a[..., 0] for a in g)
            a1 = tuple(a[..., 1] for a in g)
            added = tc.add(flat(a0), flat(a1))
            P = tuple(a.reshape(a0[0].shape) for a in added)
            m = half
        return tuple(a[..., 0] for a in P)

    def _weighted_chunked_t(self, tc, P, m: int, chunk: int = 2048):
        """Σ_{i=0}^{m-1} (i+1)·P_i along the last axis, WORK-EFFICIENT
        and COMPILE-LEAN.

        The log-depth double-suffix-scan costs 2·m·log₂(m) adds; at MSM
        bucket counts (B = 2^15) that dwarfs the wave phase itself. This
        version splits i = v·M + j (V = ``chunk`` lanes, M serial steps)
        and runs the classic running/acc recurrence over j as ONE
        lax.scan (2 traced adds, 2·m lane-adds of work), then combines
        chunk totals in one closed form:

            Σ (vM+j+1)·P = Σ_v acc_v + M·(Σ_v (v+1)·T_v − Σ_v T_v)

        where the V-sized Σ_v reductions ride the (scan-based) suffix
        scans — V·log₂V extra lane-adds, ≤7% of the main phase at
        V = 2048. Everything is lax control flow: the traced graph holds
        a constant ~6 TCurve ops however large m is (the previous
        unrolled/recursive version emitted ~100 — whose serialized
        Pallas kernels OOM-killed the TPU compile helper).

        (≙ the role of gnark-crypto msm.go's running-sum loop, done with
        lanes = chunks instead of serially.)"""
        if m <= chunk:
            return self._weighted_sum_t(tc, P, m)
        K = P[0].shape[0]
        lead = P[0].shape[1:-1]
        V = chunk
        M = m // V
        assert V * M == m and M & (M - 1) == 0, "m, chunk must be powers of 2"
        g = tuple(a.reshape(a.shape[:-1] + (V, M)) for a in P)
        # stack the serial axis in front: xs[j] = all chunks' j-th element
        xs = tuple(
            jnp.moveaxis(a, -1, 0).reshape((M, K, -1)) for a in g
        )
        ident = tc.identity(xs[0].shape[-1])
        flat = lambda t_: tuple(a.reshape(K, -1) for a in t_)

        def body(carry, pj):
            running, acc = carry
            running = tc.add(running, pj)
            acc = tc.add(acc, running)
            return (running, acc), None

        # j runs M-1 → 0: running_v = T_v, acc_v = Σ_j (j+1)·P_{v,j}
        (running, acc), _ = jax.lax.scan(
            body, (ident, ident), xs, reverse=True
        )
        shp = (K,) + lead + (V,)
        T = tuple(a.reshape(shp) for a in running)
        A = tuple(a.reshape(shp) for a in acc)
        lane0 = lambda t_: tuple(a[..., 0] for a in t_)
        sum_a = lane0(self._suffix_scan_t(tc, A, V))      # Σ_v acc_v
        s1 = self._suffix_scan_t(tc, T, V)
        sum_t = lane0(s1)                                 # Σ_v T_v
        w_t = lane0(self._suffix_scan_t(tc, s1, V))       # Σ_v (v+1)·T_v
        hi = tc.add(flat(w_t), flat(tc.neg_point(sum_t)))

        def dbl(x, _):
            return tc.double(x), None

        hi, _ = jax.lax.scan(dbl, hi, None, length=M.bit_length() - 1)
        out = tc.add(hi, flat(sum_a))
        return tuple(a.reshape((K,) + lead) for a in out)

    def _bucket_reduce_t(self, tc, buckets_t, W: int, B: int):
        """Σ_b (b+1)·bucket[w, b] per window, fully transposed; returns
        (W, K) per-coord arrays for the (tiny) Horner phase."""
        K = buckets_t[0].shape[0]
        grid = tuple(a.reshape(K, W, B) for a in buckets_t)
        res = self._weighted_chunked_t(tc, grid, B)  # (K, W)
        return tuple(jnp.transpose(a, (1, 0)) for a in res)

    # ------------------------------------------------------------------
    # small-N path: compile time over throughput
    # ------------------------------------------------------------------
    def _msm_small(self, points, inf_mask, scalar_limbs):
        """Lane-wise double-and-add inside ONE lax.scan + a log-depth tree
        reduction. Bit-identical result to the Pippenger kernel (it is the
        same group sum) but the traced graph is ~15 EC ops instead of
        thousands: XLA compiles it in seconds where the wave kernel takes
        minutes per new tiny shape (the multichip-dryrun/test-circuit
        pathology — MULTICHIP_r03 measured 529-559 s of jit per prove of a
        35-constraint circuit). Runtime is O(bits·N) lane ops — only worth
        it below ~2^7 points, where dispatch floors dominate anyway."""
        curve = self.curve
        n = scalar_limbs.shape[0]
        P = curve.from_affine(points[0], points[1], inf_mask)
        # (N, bits) bit matrix, LSB first — one vectorized extraction
        limbs = scalar_limbs.astype(jnp.int32)
        bits = ((limbs[:, :, None] >> jnp.arange(16, dtype=jnp.int32)) & 1)
        bits = bits.reshape(n, -1)[:, : self.scalar_bits]

        def body(acc, bit_col):
            acc = curve.double(acc)
            return curve.select(bit_col == 1, curve.add(acc, P), acc), None

        x_proto = jax.tree.map(lambda a: a, points[0])
        acc = curve.identity_like(x_proto)
        acc, _ = jax.lax.scan(body, acc, jnp.transpose(bits)[::-1])

        # log-depth lane reduction, also as ONE scanned add (an unrolled
        # halving tree traced log2(n) separate adds — most of the graph)
        if n > 1:
            steps = int(np.ceil(np.log2(n)))
            shifts = jnp.asarray([1 << k for k in range(steps)],
                                 dtype=jnp.int32)
            lane = jnp.arange(n)

            def fold(x, shift):
                rolled = jax.tree.map(
                    lambda a: jnp.roll(a, -shift, axis=0), x)
                added = curve.add(x, rolled)
                mask = (lane + shift) < n
                return curve.select(mask, added, x), None

            acc, _ = jax.lax.scan(fold, acc, shifts)
        return jax.tree.map(lambda a: a[0], acc)

    # ------------------------------------------------------------------
    # the kernel
    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 4))
    def msm(self, points, inf_mask, scalar_limbs, c: int):
        """MSM  Σ_i s_i · P_i  →  one projective point.

        points: affine pytree, leaves (N, K)
        inf_mask: (N,) bool, True where P_i is the point at infinity
        scalar_limbs: (N, Kr) int32 plain-form 16-bit limbs
        c: window bits (static; see pick_window)
        """
        curve = self.curve
        n = scalar_limbs.shape[0]
        small_max = int(os.environ.get("GNARK_TPU_SMALL_MSM", "128"))
        if n <= small_max:  # resolved at trace time (n is a static shape)
            return self._msm_small(points, inf_mask, scalar_limbs)
        B = 1 << (c - 1)
        digits = self._signed_digits(scalar_limbs, c)  # (W, N)
        W = digits.shape[0]

        sign = digits < 0
        mag = jnp.abs(digits)
        bucket_id = jnp.where(
            (mag == 0) | inf_mask[None, :], B, mag - 1
        )  # (W, N); trash bucket index B

        # ONE payload-carrying sort replaces argsort + three (W·N)-element
        # gathers (phase A was 24% of the 2^22 MSM — PERF_NOTES round-3
        # budget): the sign rides in the key's low bit (order within a
        # bucket is irrelevant to the wave accumulation), the point index
        # is the sort payload, so sorted_bid/sorted_sign/order all fall out
        # of the single sort.
        key = (bucket_id.astype(jnp.int32) << 1) | sign.astype(jnp.int32)
        iota = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None, :], key.shape
        )
        sorted_key, order = jax.lax.sort(
            (key, iota), dimension=1, num_keys=1
        )
        sorted_bid = sorted_key >> 1
        sorted_sign = (sorted_key & 1).astype(jnp.bool_)

        # contiguous run [start, end) per (window, bucket) via binary search
        bvals = jnp.arange(B, dtype=sorted_bid.dtype)
        starts = jax.vmap(lambda s: jnp.searchsorted(s, bvals, side="left"))(
            sorted_bid
        ).astype(jnp.int32)
        ends = jax.vmap(lambda s: jnp.searchsorted(s, bvals, side="right"))(
            sorted_bid
        ).astype(jnp.int32)
        counts = ends - starts  # (W, B); trash bucket excluded by construction

        # ---- staged waves over count-sorted lanes -------------------------
        # Bucket run lengths are Poisson-skewed (max ≈ 2× mean); running
        # every lane until the global max wastes ~45% of the adds on idle
        # lanes. Sort the (window, bucket) lanes by run length descending and
        # shrink the active width geometrically: each stage processes a
        # prefix until every lane OUTSIDE the next prefix is done, so total
        # work tracks the area under the sorted-count curve (≈ N adds).
        L = W * B
        counts_f = counts.reshape(L)
        starts_f = starts.reshape(L)
        lane_order = jnp.argsort(-counts_f)
        inv_order = jnp.argsort(lane_order)
        counts_p = counts_f[lane_order]
        starts_p = starts_f[lane_order]
        win_of_lane = (jnp.arange(L, dtype=jnp.int32) // B)[lane_order]
        order_flat = order.reshape(-1)  # (W·N,)
        sign_flat = sorted_sign.reshape(-1)

        stage_sizes = []
        s = L
        while s >= 1024 and len(stage_sizes) < 4:
            stage_sizes.append(s)
            s //= 4
        if not stage_sizes:
            stage_sizes = [L]

        # ---- transposed fused-kernel wave (PERF_NOTES.md) -----------------
        # G1 on TPU: accumulators live as (K, L) transposed limb arrays and
        # each wave step is ONE fused Pallas add_mixed kernel (sign + mask
        # folded in) — ~7x the (N, K) jnp field-op rate.
        from .ec import DevField, DevField2

        is_fp2 = isinstance(curve.f, DevField2)
        t_flag = os.environ.get("GNARK_TPU_T_MSM", "1")
        use_t = (
            (isinstance(curve.f, DevField) or is_fp2)
            and t_flag != "0"
            # "force": exercise the transposed path on CPU too (its Pallas
            # kernels fall back to the identical traced row code there) —
            # the bit-exactness tests use this
            and (jax.default_backend() == "tpu" or t_flag == "force")
        )
        if use_t:
            from .ec_t import TCurve, TCurve2

            if is_fp2:
                tc = TCurve2(self.curve.f.F, self.curve.f.beta,
                             tuple(self.curve.b3_host))
            else:
                tc = TCurve(self.curve.f.F, self.curve.b3_host)
            # CLOSED lever (r4 A/B: 104k vs 341k pts/s @ 2^20 — the
            # per-step batch-inversion latency chain loses 3x to the fused
            # projective wave; PERF_NOTES.md round-4). Kept opt-in as a
            # documented negative result + bit-exactness target.
            affine = os.environ.get("GNARK_TPU_AFFINE_MSM", "0") == "1"
            accumulate = (self._wave_accumulate_affine_t if affine
                          else self._wave_accumulate_t)
            buckets_t = accumulate(
                tc, points, order_flat, sign_flat, starts_p, counts_p,
                win_of_lane, stage_sizes, n, L, inv_order,
            )
            per_window = self._bucket_reduce_t(tc, buckets_t, W, B)
            per_window = tc.to_curve_tree(per_window)  # DevCurve pytree shape
            acc = jax.tree.map(lambda a: a[W - 1], per_window)
            if W > 1:
                tail = jax.tree.map(lambda a: a[W - 2 :: -1], per_window)

                def horner(x, s_w):
                    x = self._double_k_scan(x, c)
                    return curve.add(x, s_w), None

                acc, _ = jax.lax.scan(horner, acc, tail)
            return acc

        x_proto = jax.tree.map(
            lambda a: jnp.zeros((L,) + a.shape[1:], a.dtype), points[0]
        )
        acc = curve.identity_like(x_proto)

        def make_wave(S, acc_slice_meta):
            starts_s, counts_s, win_s = acc_slice_meta

            def wave(state):
                t, acc_s = state
                idx_sorted = jnp.clip(starts_s + t, 0, n - 1)  # (S,)
                valid = t < counts_s
                flat_idx = win_s * n + idx_sorted
                pt_idx = order_flat[flat_idx]
                gp = jax.tree.map(lambda a: a[pt_idx], points)  # (S, K)
                sg = sign_flat[flat_idx]
                gy = curve.f.select(sg, curve.f.neg(gp[1]), gp[1])
                new = curve.add_mixed(acc_s, (gp[0], gy))
                return t + 1, curve.select(valid, new, acc_s)

            return wave

        t = jnp.int32(0)
        for si, S in enumerate(stage_sizes):
            meta = (starts_p[:S], counts_p[:S], win_of_lane[:S])
            wave = make_wave(S, meta)
            # run until every lane outside the NEXT stage prefix is done
            # (final stage: until the global max)
            if si + 1 < len(stage_sizes):
                t_stop = counts_p[stage_sizes[si + 1]]
            else:
                t_stop = counts_p[0]
            acc_s = jax.tree.map(lambda a: a[:S], acc)
            t, acc_s = jax.lax.while_loop(
                lambda st: st[0] < t_stop, wave, (t, acc_s)
            )
            acc = jax.tree.map(
                lambda full, part: jax.lax.dynamic_update_slice(
                    full, part, (0,) * full.ndim
                ),
                acc, acc_s,
            )

        buckets = jax.tree.map(
            lambda a: a[inv_order].reshape((W, B) + a.shape[1:]), acc
        )  # leaves (W, B, K)

        per_window = self._bucket_reduce(buckets, B)  # leaves (W, K)

        # Horner over windows, top-down: acc = (acc · 2^c) + S_w
        acc = jax.tree.map(lambda a: a[W - 1], per_window)
        if W > 1:
            tail = jax.tree.map(lambda a: a[W - 2 :: -1], per_window)

            def horner(x, s_w):
                x = self._double_k_scan(x, c)
                return curve.add(x, s_w), None

            acc, _ = jax.lax.scan(horner, acc, tail)
        return acc


    # ------------------------------------------------------------------
    # batched multi-MSM: M problems, ONE wave loop
    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 4))
    def msm_batch(self, points, inf_mask, scalar_limbs, c: int):
        """M equal-size MSMs as ONE Pippenger dispatch set.

        points: affine pytree, leaves (M, N, K) — or (1, N, K) for a
        SHARED point table (e.g. KZG commits of M polynomials over one
        SRS; no M-fold point copy); inf_mask: (M, N) bool; scalar_limbs:
        (M, N, Kr); c: shared window bits. Returns the projective pytree
        with a leading M axis (result m = Σ_i s[m,i]·P[m,i]).

        Role parity: ICICLE's MSM ``batch_size`` config (one launch computes
        many MSMs — msm.go BatchSize / icicle.go:312-324 MsmOnDevice called
        per operand). TPU-first rationale: each problem's W windows stack
        into one GLOBAL window axis of M·W rows, so the (window, bucket)
        lane grid grows M-fold while the *wave count* stays ≈ max bucket
        run ≈ N/B — the M problems ride the SAME lax.while_loop, paying one
        per-wave dispatch instead of M. Below ~2^17 rows the per-dispatch
        floor dominates the groth16 prover's A/B1/K MSMs (PERF_NOTES
        round-5: the 2-chain marginal prove is 33.1 s of msms at 35k rows),
        so batching is ~M× on dispatch-bound shapes and harmless on
        throughput-bound ones. Per-problem results are bit-identical to
        separate ``msm`` calls: each lane's bucket accumulation order and
        the per-window reduction are unchanged — only the lane-grid
        packing differs.
        """
        curve = self.curve
        M, n = inf_mask.shape
        m_pts = jax.tree.leaves(points)[0].shape[0]  # M, or 1 = shared
        small_max = int(os.environ.get("GNARK_TPU_SMALL_MSM", "128"))
        if n <= small_max:  # static: compile-lean path per problem
            outs = [
                self._msm_small(
                    jax.tree.map(
                        lambda a, m=m: a[m if m_pts > 1 else 0], points),
                    inf_mask[m], scalar_limbs[m],
                )
                for m in range(M)
            ]
            return jax.tree.map(lambda *ls: jnp.stack(ls), *outs)
        B = 1 << (c - 1)
        # (W, M, N) digit stack -> (M, W, N): problem-major global windows
        digits = jnp.transpose(
            self._signed_digits(scalar_limbs, c), (1, 0, 2)
        )
        W = digits.shape[1]
        MW = M * W

        sign = digits < 0
        mag = jnp.abs(digits)
        bucket_id = jnp.where(
            (mag == 0) | inf_mask[:, None, :], B, mag - 1
        ).reshape(MW, n)
        sign = sign.reshape(MW, n)

        key = (bucket_id.astype(jnp.int32) << 1) | sign.astype(jnp.int32)
        iota = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None, :], key.shape
        )
        sorted_key, order = jax.lax.sort(
            (key, iota), dimension=1, num_keys=1
        )
        sorted_bid = sorted_key >> 1
        sorted_sign = (sorted_key & 1).astype(jnp.bool_)

        bvals = jnp.arange(B, dtype=sorted_bid.dtype)
        starts = jax.vmap(lambda s: jnp.searchsorted(s, bvals, side="left"))(
            sorted_bid
        ).astype(jnp.int32)
        ends = jax.vmap(lambda s: jnp.searchsorted(s, bvals, side="right"))(
            sorted_bid
        ).astype(jnp.int32)
        counts = ends - starts

        L = MW * B
        counts_f = counts.reshape(L)
        starts_f = starts.reshape(L)
        lane_order = jnp.argsort(-counts_f)
        inv_order = jnp.argsort(lane_order)
        counts_p = counts_f[lane_order]
        starts_p = starts_f[lane_order]
        win_of_lane = (jnp.arange(L, dtype=jnp.int32) // B)[lane_order]
        # order holds LOCAL point indices; lift to GLOBAL rows of the
        # concatenated point table so the shared gather resolves problem m
        # (shared table: every problem reads the same N rows — no lift)
        if m_pts > 1:
            prob_of_win = jnp.arange(MW, dtype=jnp.int32) // W
            order_flat = (order + (prob_of_win * n)[:, None]).reshape(-1)
        else:
            order_flat = order.reshape(-1)
        sign_flat = sorted_sign.reshape(-1)

        stage_sizes = []
        s = L
        while s >= 1024 and len(stage_sizes) < 4:
            stage_sizes.append(s)
            s //= 4
        if not stage_sizes:
            stage_sizes = [L]

        cat_points = jax.tree.map(
            lambda a: a.reshape((m_pts * n,) + a.shape[2:]), points
        )

        from .ec import DevField, DevField2

        is_fp2 = isinstance(curve.f, DevField2)
        t_flag = os.environ.get("GNARK_TPU_T_MSM", "1")
        use_t = (
            (isinstance(curve.f, DevField) or is_fp2)
            and t_flag != "0"
            and (jax.default_backend() == "tpu" or t_flag == "force")
        )
        if use_t:
            from .ec_t import TCurve, TCurve2

            if is_fp2:
                tc = TCurve2(self.curve.f.F, self.curve.f.beta,
                             tuple(self.curve.b3_host))
            else:
                tc = TCurve(self.curve.f.F, self.curve.b3_host)
            buckets_t = self._wave_accumulate_t(
                tc, cat_points, order_flat, sign_flat, starts_p, counts_p,
                win_of_lane, stage_sizes, n, L, inv_order,
            )
            per_window = self._bucket_reduce_t(tc, buckets_t, MW, B)
            per_window = tc.to_curve_tree(per_window)  # leaves (MW, K)
            grouped = jax.tree.map(
                lambda a: a.reshape((M, W) + a.shape[1:]), per_window
            )
            acc = jax.tree.map(lambda a: a[:, W - 1], grouped)
            if W > 1:
                # scan axis first: (W-1, M, K) window tail, batched Horner
                tail = jax.tree.map(
                    lambda a: jnp.swapaxes(a[:, W - 2::-1], 0, 1), grouped
                )

                def horner(x, s_w):
                    x = self._double_k_scan(x, c)
                    return curve.add(x, s_w), None

                acc, _ = jax.lax.scan(horner, acc, tail)
            return acc

        x_proto = jax.tree.map(
            lambda a: jnp.zeros((L,) + a.shape[2:], a.dtype), points[0]
        )
        acc = curve.identity_like(x_proto)

        def make_wave(S, acc_slice_meta):
            starts_s, counts_s, win_s = acc_slice_meta

            def wave(state):
                t, acc_s = state
                idx_sorted = jnp.clip(starts_s + t, 0, n - 1)
                valid = t < counts_s
                flat_idx = win_s * n + idx_sorted
                pt_idx = order_flat[flat_idx]
                gp = jax.tree.map(lambda a: a[pt_idx], cat_points)
                sg = sign_flat[flat_idx]
                gy = curve.f.select(sg, curve.f.neg(gp[1]), gp[1])
                new = curve.add_mixed(acc_s, (gp[0], gy))
                return t + 1, curve.select(valid, new, acc_s)

            return wave

        t = jnp.int32(0)
        for si, S in enumerate(stage_sizes):
            meta = (starts_p[:S], counts_p[:S], win_of_lane[:S])
            wave = make_wave(S, meta)
            if si + 1 < len(stage_sizes):
                t_stop = counts_p[stage_sizes[si + 1]]
            else:
                t_stop = counts_p[0]
            acc_s = jax.tree.map(lambda a: a[:S], acc)
            t, acc_s = jax.lax.while_loop(
                lambda st: st[0] < t_stop, wave, (t, acc_s)
            )
            acc = jax.tree.map(
                lambda full, part: jax.lax.dynamic_update_slice(
                    full, part, (0,) * full.ndim
                ),
                acc, acc_s,
            )

        buckets = jax.tree.map(
            lambda a: a[inv_order].reshape((MW, B) + a.shape[1:]), acc
        )
        per_window = self._bucket_reduce(buckets, B)  # leaves (MW, K)
        grouped = jax.tree.map(
            lambda a: a.reshape((M, W) + a.shape[1:]), per_window
        )
        acc = jax.tree.map(lambda a: a[:, W - 1], grouped)
        if W > 1:
            tail = jax.tree.map(
                lambda a: jnp.swapaxes(a[:, W - 2::-1], 0, 1), grouped
            )

            def horner(x, s_w):
                x = self._double_k_scan(x, c)
                return curve.add(x, s_w), None

            acc, _ = jax.lax.scan(horner, acc, tail)
        return acc


def scalars_to_limbs(xs, n_limbs: int) -> np.ndarray:
    """Host ints -> (N, n_limbs) plain-form 16-bit limb array (int32)."""
    out = np.zeros((len(xs), n_limbs), dtype=np.int64)
    for j, x in enumerate(xs):
        x = int(x)
        for i in range(n_limbs):
            out[j, i] = (x >> (16 * i)) & 0xFFFF
    return out.astype(np.int32)


def msm_host(curve: DevCurve, scalar_field, points_host, scalars_host,
             c: int | None = None):
    """Host convenience wrapper: python points/ints -> host affine result.

    points_host: affine tuples (or None = infinity) in host coordinates
    (ints for G1, curves.tower.Fp2 for G2); scalars_host: list of ints.
    Tests and the setup path use this; provers call MSMKernel.msm on
    resident device arrays directly.
    """
    n = len(points_host)
    assert n == len(scalars_host) and n > 0
    inf = np.array([p is None for p in points_host], dtype=bool)
    dummy = next((p for p in points_host if p is not None), None)
    if dummy is None:
        return None  # all inputs at infinity
    filled = [p if p is not None else dummy for p in points_host]
    f = curve.f
    x = jax.tree.map(jnp.asarray, f.encode([p[0] for p in filled]))
    y = jax.tree.map(jnp.asarray, f.encode([p[1] for p in filled]))
    n_limbs = -(-scalar_field.modulus.bit_length() // 16)
    scal = jnp.asarray(
        scalars_to_limbs([s % scalar_field.modulus for s in scalars_host], n_limbs)
    )
    kern = MSMKernel(curve, scalar_bits=scalar_field.modulus.bit_length())
    res = kern.msm((x, y), jnp.asarray(inf), scal, c or pick_window(n))
    batched = jax.tree.map(lambda a: a[None], res)
    return curve.to_affine_host(batched, f.F.modulus)[0]
