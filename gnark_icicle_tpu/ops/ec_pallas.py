"""Fused elliptic-curve group-law Pallas TPU kernels.

Why this exists: the jnp path in ops/ec.py expresses one EC add as ~12
separate Montgomery muls; XLA fuses some elementwise work but materializes
(N, K, K) half-product intermediates and round-trips HBM between muls. Here
the complete RCB16 addition law runs as ONE kernel per batch block: all 12
muls, their carry chains, and the final conditional subtractions live in
VMEM, so HBM traffic per point-add drops to reading 5 and writing 3
coordinates. This is the speed-of-light-chasing path the task demands
(SURVEY.md §2.3 "Pallas kernels"); the jnp path remains the bit-exact
reference and the CPU/testing fallback.

Layout: kernels work on (K, B) tiles — limbs on sublanes, batch on lanes
(B = 512 lanes; K = 16 sublanes for BN254). Inputs arrive (N, K) and are
transposed per block inside the kernel (cheap VPU shuffles vs. the muls).

All tile math mirrors ops/field.py exactly (same separated-REDC Montgomery,
same canonicalization), so outputs are bit-identical to the jnp path — the
test suite asserts this (tests/test_ec_pallas.py).
"""

from __future__ import annotations

import functools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field import LimbField, I32, U32, MASK16, int_to_limbs

BLOCK = 512  # batch lanes per kernel invocation


# ---------------------------------------------------------------------------
# tile-level field helpers (traced INSIDE kernels; x is (K, B) int32)
# ---------------------------------------------------------------------------

class _TileField:
    """Montgomery arithmetic on (K, B) VMEM tiles for a fixed prime."""

    def __init__(self, F: LimbField):
        self.K = F.K
        self.p_cols = np.asarray(F.p_np, dtype=np.int32)  # (K,) host
        self.np_cols = np.array(
            int_to_limbs(F.nprime, F.K), dtype=np.int32
        )

    def _carry(self, cols, out_rows: int, drop_low: int = 0):
        """Sequential carry over the leading axis; returns (out_rows, B)."""
        carry = jnp.zeros_like(cols[0])
        if drop_low:
            for r in range(drop_low):
                carry = (cols[r] + carry) >> 16
        rows = []
        for r in range(drop_low, cols.shape[0]):
            v = cols[r] + carry
            rows.append(v & MASK16)
            carry = v >> 16
        while len(rows) < out_rows:
            rows.append(carry & MASK16)
            carry = carry >> 16
        return jnp.stack(rows[:out_rows])

    def _cond_sub_p(self, t):
        """(K, B) canonical-limb value < 2p -> mod p."""
        borrow = jnp.zeros_like(t[0])
        rows = []
        for r in range(self.K):
            v = t[r] - self.p_cols[r] + borrow
            rows.append(v & MASK16)
            borrow = v >> 16  # 0 or -1
        d = jnp.stack(rows)
        return jnp.where(borrow == 0, d, t)

    def _wide_cols(self, a, b, b_consts=None):
        """Column form of a·b: (2K+1, B) int32 (uncarried).

        b_consts: optional (K,) host ints replacing b (for N' and p)."""
        K = self.K
        au = a.astype(U32)
        cols = [None] * (2 * K + 1)
        for i in range(K):
            if b_consts is not None:
                prod = au * np.uint32(int(b_consts[i]))  # (K, B)
            else:
                prod = au * b[i].astype(U32)[None, :]
            lo = (prod & MASK16).astype(I32)
            hi = (prod >> 16).astype(I32)
            for j in range(K):
                c = i + j
                cols[c] = lo[j] if cols[c] is None else cols[c] + lo[j]
                cols[c + 1] = hi[j] if cols[c + 1] is None else cols[c + 1] + hi[j]
        zero = jnp.zeros_like(a[0])
        return jnp.stack([zero if c is None else c for c in cols])

    def mul(self, a, b):
        """Montgomery product on tiles — same REDC schedule as field.py."""
        K = self.K
        t = self._carry(self._wide_cols(a, b), 2 * K + 1)
        m = self._carry(self._wide_cols(t[:K], None, self.np_cols), K)
        u = self._wide_cols(m, None, self.p_cols)
        res = self._carry(t + u, K, drop_low=K)
        return self._cond_sub_p(res)

    def sqr(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        return self._cond_sub_p(self._carry(a + b, self.K))

    def _p_rows(self, like):
        # modulus as python-int scalar constants (pallas kernels cannot
        # capture array constants)
        return jnp.stack([
            jnp.full_like(like[0], int(self.p_cols[r])) for r in range(self.K)
        ])

    def sub(self, a, b):
        return self._cond_sub_p(self._carry(a - b + self._p_rows(a), self.K))

    def neg(self, a):
        return self._cond_sub_p(self._carry(self._p_rows(a) - a, self.K))


class _TileFieldMXU(_TileField):
    """_TileField with the REDC products on the MXU (ROADMAP #1b).

    t = x·y stays the VPU schoolbook, but m = t·N' mod R and u = m·p are by
    CONSTANTS — expressed as (C, K8)ᵀ Toeplitz matmuls over 8-bit limb rows,
    so 2/3 of the kernel's integer multiplies ride the systolic array while
    everything stays in VMEM. Bit-identical to _TileField.mul (the standard
    bound audit: relaxed limbs ≤ 256 keep the bf16-fed dots exact, the REDC
    sum's low half ∈ {0, R}).

    The Toeplitz matrices cannot be captured as array constants by Mosaic
    kernels — PallasEC passes them as broadcast kernel inputs and stashes
    the refs on this object before tracing the tile function.
    """

    def __init__(self, F: LimbField):
        super().__init__(F)
        from .mxu_field import _toeplitz_u8

        K8 = 2 * F.K
        self.K8 = K8
        # transposed so column-form products need no in-kernel transposes:
        # out_cols (C, B) = Wᵀ (C, K8) @ x_cols (K8, B)
        self.npT_host = np.ascontiguousarray(
            _toeplitz_u8(F.nprime, K8)[:, :K8].T
        ).astype(np.float32)  # (K8, K8)
        self.pT_host = np.ascontiguousarray(
            _toeplitz_u8(F.modulus, K8).T
        ).astype(np.float32)  # (2K8, K8)
        self._np_mat = None  # set per kernel trace from the input refs
        self._p_mat = None

    def _relax_rows(self, v, rounds: int, bits: int):
        mask = (1 << bits) - 1
        for _ in range(rounds):
            lo = v & mask
            c = v >> bits
            v = lo + jnp.concatenate(
                [jnp.zeros_like(c[:1]), c[:-1]], axis=0
            )
        return v

    def mul(self, a, b):
        K, K8 = self.K, self.K8
        t = self._wide_cols(a, b)          # (2K+1, B) int32 ≤ 2^21
        t = self._relax_rows(t, 2, 16)     # rows ≤ 2^16
        lo = t & 0xFF
        hi = t >> 8                        # ≤ 256 (bf16-exact)
        t8 = jnp.stack([lo, hi], axis=1).reshape(
            2 * t.shape[0], t.shape[1]
        )[: 2 * K8 + 1]                    # (2K8+1, B)
        f32 = jnp.float32
        m_cols = jnp.dot(
            self._np_mat, t8[:K8].astype(f32),
            preferred_element_type=f32,
        ).astype(jnp.int32)                # (K8, B)
        m8 = self._relax_rows(m_cols, 3, 8)  # ≤ 256 → m_val < 1.004·R
        u_cols = jnp.dot(
            self._p_mat, m8.astype(f32), preferred_element_type=f32,
        ).astype(jnp.int32)                # (2K8, B)
        s = t8 + jnp.concatenate(
            [u_cols, jnp.zeros_like(u_cols[:1])], axis=0
        )
        s = self._relax_rows(s, 3, 8)      # ≤ 257
        # low half of the R-divisible sum is 0 or exactly R
        carry = jnp.any(s[:K8] != 0, axis=0).astype(jnp.int32)  # (B,)
        hi_rows = s[K8 : K8 + K8]          # (K8, B); top slack row is 0
        pairs = hi_rows.reshape(K, 2, hi_rows.shape[1])
        cols16 = pairs[:, 0] + (pairs[:, 1] << 8)  # (K, B) ≤ 2^17
        cols16 = jnp.concatenate(
            [cols16[:1] + carry[None, :], cols16[1:]], axis=0
        )
        res = self._carry(cols16, K)
        return self._cond_sub_p(res)


class _TileField2:
    """Fp2 on pairs of tiles (u² = β, small negative β), mirroring
    ops/ec.DevField2."""

    def __init__(self, base: _TileField, beta: int = -1):
        assert beta < 0
        self.f = base
        self.beta = beta

    def _beta_term(self, m1):
        f = self.f
        if self.beta == -1:
            return m1
        acc = None
        run = m1
        for bit in bin(-self.beta)[:1:-1]:
            if bit == "1":
                acc = run if acc is None else f.add(acc, run)
            run = f.add(run, run)
        return acc

    def mul(self, a, b):
        f = self.f
        a0, a1 = a
        b0, b1 = b
        m0 = f.mul(a0, b0)
        m1 = f.mul(a1, b1)
        c1 = f.sub(f.mul(f.add(a0, a1), f.add(b0, b1)), f.add(m0, m1))
        return (f.sub(m0, self._beta_term(m1)), c1)

    def sqr(self, a):
        f = self.f
        a0, a1 = a
        if self.beta != -1:
            m0 = f.mul(a0, a0)
            m1 = f.mul(a1, a1)
            t = f.mul(a0, a1)
            return (f.sub(m0, self._beta_term(m1)), f.add(t, t))
        c0 = f.mul(f.add(a0, a1), f.sub(a0, a1))
        t = f.mul(a0, a1)
        return (c0, f.add(t, t))

    def add(self, a, b):
        return (self.f.add(a[0], b[0]), self.f.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.f.sub(a[0], b[0]), self.f.sub(a[1], b[1]))

    def neg(self, a):
        return (self.f.neg(a[0]), self.f.neg(a[1]))


# ---------------------------------------------------------------------------
# group-law tile routines (shared by the kernel bodies)
# ---------------------------------------------------------------------------

def _tile_add_mixed(f, b3, P, Q):
    """RCB16 mixed addition on tiles — same schedule as ops/ec.add_mixed."""
    X1, Y1, Z1 = P
    X2, Y2 = Q
    t0 = f.mul(X1, X2)
    t1 = f.mul(Y1, Y2)
    t3 = f.mul(f.add(X1, Y1), f.add(X2, Y2))
    t3 = f.sub(t3, f.add(t0, t1))
    t4 = f.add(f.mul(Y2, Z1), Y1)
    Y3 = f.add(f.mul(X2, Z1), X1)
    t0 = f.add(f.add(t0, t0), t0)
    t2 = f.mul(b3, Z1)
    Z3 = f.add(t1, t2)
    t1 = f.sub(t1, t2)
    Y3 = f.mul(b3, Y3)
    X3 = f.sub(f.mul(t3, t1), f.mul(t4, Y3))
    Y3 = f.add(f.mul(Y3, t0), f.mul(t1, Z3))
    Z3 = f.add(f.mul(Z3, t4), f.mul(t0, t3))
    return (X3, Y3, Z3)


def _tile_add(f, b3, P, Q):
    """RCB16 complete projective addition — same schedule as ops/ec.add."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0 = f.mul(X1, X2)
    t1 = f.mul(Y1, Y2)
    t2 = f.mul(Z1, Z2)
    t3 = f.mul(f.add(X1, Y1), f.add(X2, Y2))
    t3 = f.sub(t3, f.add(t0, t1))
    t4 = f.mul(f.add(Y1, Z1), f.add(Y2, Z2))
    t4 = f.sub(t4, f.add(t1, t2))
    Y3 = f.mul(f.add(X1, Z1), f.add(X2, Z2))
    Y3 = f.sub(Y3, f.add(t0, t2))
    t0 = f.add(f.add(t0, t0), t0)
    t2 = f.mul(b3, t2)
    Z3 = f.add(t1, t2)
    t1 = f.sub(t1, t2)
    Y3 = f.mul(b3, Y3)
    X3 = f.sub(f.mul(t3, t1), f.mul(t4, Y3))
    Y3 = f.add(f.mul(Y3, t0), f.mul(t1, Z3))
    Z3 = f.add(f.mul(Z3, t4), f.mul(t0, t3))
    return (X3, Y3, Z3)


def _tile_double(f, b3, P):
    X, Y, Z = P
    t0 = f.sqr(Y)
    Z3 = f.add(t0, t0)
    Z3 = f.add(Z3, Z3)
    Z3 = f.add(Z3, Z3)
    t1 = f.mul(Y, Z)
    t2 = f.mul(b3, f.sqr(Z))
    X3 = f.mul(t2, Z3)
    Y3 = f.add(t0, t2)
    Z3 = f.mul(t1, Z3)
    t1 = f.add(t2, t2)
    t2 = f.add(t1, t2)
    t0 = f.sub(t0, t2)
    Y3 = f.add(f.mul(t0, Y3), X3)
    t1 = f.mul(X, Y)
    X3 = f.mul(t0, t1)
    X3 = f.add(X3, X3)
    return (X3, Y3, Z3)


# ---------------------------------------------------------------------------
# kernel builders
# ---------------------------------------------------------------------------

def _t(ref_block):
    """(B, K) VMEM block -> (K, B) tile."""
    return jnp.transpose(ref_block, (1, 0))


def _tt(tile):
    return jnp.transpose(tile, (1, 0)).astype(I32)


class PallasEC:
    """Fused kernels for one (field, b3) curve instance.

    fp2: False for G1 (coords are single tiles), True for G2 (tile pairs —
    each coordinate is two (N, K) arrays and the kernels take both).
    """

    _cache: dict = {}

    def __new__(cls, F: LimbField, b3_host, fp2: bool = False,
                interpret: bool = False, beta: int = -1):
        import os

        # default ON for G1 after on-chip validation: bit-exact and
        # +3.5-4.5% whole-MSM (194k vs 186k pts/s @ 2^20, 229k vs 221k
        # @ 2^22, host-verified); GNARK_TPU_PALLAS_MXU=0 opts out
        mxu = (not fp2) and os.environ.get(
            "GNARK_TPU_PALLAS_MXU", "1"
        ) == "1"
        key = (F.modulus, F.K, repr(b3_host), fp2, interpret, mxu, beta)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        self._mxu = mxu
        cls._cache[key] = self
        return self

    def __init__(self, F: LimbField, b3_host, fp2: bool = False,
                 interpret: bool = False, beta: int = -1):
        if getattr(self, "_initialized", False):
            return
        self._initialized = True
        self.F = F
        self.K = F.K
        self.fp2 = fp2
        self.interpret = interpret
        self.mxu = getattr(self, "_mxu", False)
        base = _TileFieldMXU(F) if self.mxu else _TileField(F)
        self.tf = _TileField2(base, beta) if fp2 else base
        if fp2:
            c0 = np.asarray(int_to_limbs(
                b3_host[0] * pow(F.R, 1, F.modulus) % F.modulus, F.K), np.int32)
            c1 = np.asarray(int_to_limbs(
                b3_host[1] * pow(F.R, 1, F.modulus) % F.modulus, F.K), np.int32)
            self.b3_tiles = (c0, c1)
        else:
            self.b3_tiles = np.asarray(
                int_to_limbs(b3_host % F.modulus * F.R % F.modulus, F.K),
                np.int32,
            )

    # coordinate <-> flat-leaf plumbing. G2 (Fp2) coordinates are PACKED
    # into single (N, 2K) leaves [c0 ‖ c1] so the kernel's input/output
    # count matches the G1 shape — large pallas_call arities trip a Mosaic
    # CHECK on v5e (see device.py / ROADMAP.md).
    def _leaves_per_coord(self):
        return 1

    def _b3_leaves(self):
        """b3 replicated to a full (BLOCK, K|2K) kernel input — constants
        cannot be captured by kernel bodies, and sub-tile (1, ·) blocks have
        tripped Mosaic CHECKs on v5e."""
        if self.fp2:
            row = jnp.concatenate([
                jnp.asarray(self.b3_tiles[0]), jnp.asarray(self.b3_tiles[1])
            ])
        else:
            row = jnp.asarray(self.b3_tiles)
        return [jnp.broadcast_to(row, (BLOCK, row.shape[0])).astype(I32)]

    def _mxu_leaves(self):
        """Toeplitz REDC matrices as lane-padded f32 inputs (MXU mode)."""
        if not self.mxu:
            return []
        base = self.tf if not self.fp2 else self.tf.base
        npT = np.zeros((base.K8, 128), np.float32)
        npT[:, : base.K8] = base.npT_host
        pT = np.zeros((2 * base.K8, 128), np.float32)
        pT[:, : base.K8] = base.pT_host
        return [jnp.asarray(npT), jnp.asarray(pT)]

    def _coords_from_blocks(self, blocks, n_coords):
        """kernel refs -> list of coords (tiles or packed tile pairs)."""
        K = self.K
        out = []
        for c in range(n_coords):
            tile = _t(blocks[c][:])  # (K or 2K, B)
            if self.fp2:
                out.append((tile[:K], tile[K:]))
            else:
                out.append(tile)
        return out

    def _write_coords(self, out_refs, coords):
        for c, coord in enumerate(coords):
            if self.fp2:
                out_refs[c][:] = _tt(jnp.concatenate([coord[0], coord[1]]))
            else:
                out_refs[c][:] = _tt(coord)

    def _build(self, n_in_coords, n_out_coords, tile_fn):
        lpc = self._leaves_per_coord()
        n_in = n_in_coords * lpc
        n_out = n_out_coords * lpc
        K = self.K

        lpc_b3 = 1  # b3 rides as one trailing (1, K|2K) input

        n_mxu = 2 if self.mxu else 0

        def kernel(*refs):
            ins = refs[:n_in]
            b3_ref = refs[n_in]
            if self.mxu:  # Toeplitz REDC matrices ride as inputs
                base_tf = self.tf
                base_tf._np_mat = refs[n_in + 1][:][:, : base_tf.K8]
                base_tf._p_mat = refs[n_in + 2][:][:, : base_tf.K8]
            outs = refs[n_in + lpc_b3 + n_mxu :]
            coords = self._coords_from_blocks(ins, n_in_coords)
            b3_t = _t(b3_ref[:])  # (K|2K, BLOCK), columns identical
            if self.fp2:
                b3 = (b3_t[:K], b3_t[K:])
            else:
                b3 = b3_t
            res = tile_fn(self.tf, b3, coords)
            self._write_coords(outs, res)

        @partial(jax.jit, static_argnums=())
        def run(*leaves):
            n = leaves[0].shape[0]
            pad = (-n) % BLOCK
            if pad:
                leaves = tuple(
                    jnp.concatenate(
                        [x, jnp.zeros((pad, x.shape[1]), x.dtype)]
                    )
                    for x in leaves
                )
            np_ = (n + pad) // BLOCK
            KW = 2 * K if self.fp2 else K  # packed leaf width
            out = pl.pallas_call(
                kernel,
                grid=(np_,),
                in_specs=[
                    pl.BlockSpec((BLOCK, KW), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
                ] * n_in + [
                    pl.BlockSpec((BLOCK, KW), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
                ] * lpc_b3 + ([
                    pl.BlockSpec((2 * K, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((4 * K, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ] if self.mxu else []),
                out_specs=[
                    pl.BlockSpec((BLOCK, KW), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
                ] * n_out,
                out_shape=[
                    jax.ShapeDtypeStruct((n + pad, KW), jnp.int32)
                ] * n_out,
                interpret=self.interpret,
            )(*leaves, *self._b3_leaves(), *self._mxu_leaves())
            if pad:
                out = [o[:n] for o in out]
            return out

        return run

    # -- public entry points (pytree coords like ops/ec.DevCurve) ----------
    def _flatten_point(self, P, n_coords):
        leaves = []
        for c in range(n_coords):
            coord = P[c]
            if self.fp2:
                leaves.append(jnp.concatenate(
                    [coord[0].reshape(-1, self.K),
                     coord[1].reshape(-1, self.K)], axis=-1
                ))
            else:
                leaves.append(coord)
        return leaves

    def _unflatten(self, leaves, n_coords, batch_shape):
        out = []
        for c in range(n_coords):
            if self.fp2:
                packed = leaves[c]
                out.append((
                    packed[:, : self.K].reshape(batch_shape + (self.K,)),
                    packed[:, self.K :].reshape(batch_shape + (self.K,)),
                ))
            else:
                out.append(leaves[c].reshape(batch_shape + (self.K,)))
        return tuple(out)

    def _flat2d(self, leaves):
        return [x.reshape(-1, x.shape[-1]) for x in leaves]

    @functools.cached_property
    def _add_mixed_fn(self):
        return self._build(5, 3, lambda f, b3, cs: _tile_add_mixed(
            f, b3, (cs[0], cs[1], cs[2]), (cs[3], cs[4])))

    @functools.cached_property
    def _add_fn(self):
        return self._build(6, 3, lambda f, b3, cs: _tile_add(
            f, b3, (cs[0], cs[1], cs[2]), (cs[3], cs[4], cs[5])))

    @functools.cached_property
    def _double_fn(self):
        return self._build(3, 3, lambda f, b3, cs: _tile_double(
            f, b3, (cs[0], cs[1], cs[2])))

    def add_mixed(self, P, Q):
        batch = jax.tree.leaves(P)[0].shape[:-1]
        leaves = self._flat2d(
            self._flatten_point(P, 3) + self._flatten_point(Q, 2)
        )
        out = self._add_mixed_fn(*leaves)
        return self._unflatten(out, 3, batch)

    def add(self, P, Q):
        batch = jax.tree.leaves(P)[0].shape[:-1]
        leaves = self._flat2d(
            self._flatten_point(P, 3) + self._flatten_point(Q, 3)
        )
        out = self._add_fn(*leaves)
        return self._unflatten(out, 3, batch)

    def double(self, P):
        batch = jax.tree.leaves(P)[0].shape[:-1]
        leaves = self._flat2d(self._flatten_point(P, 3))
        out = self._double_fn(*leaves)
        return self._unflatten(out, 3, batch)
