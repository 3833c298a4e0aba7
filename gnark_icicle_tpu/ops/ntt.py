"""Number-theoretic transform over the scalar field (device, jnp).

Role parity: gnark-crypto's ``fft.Domain`` + ICICLE's NTT/INTT kernels
(reference call sites: backend/groth16/bn254/prove.go:356-399 computeH's 7
full-domain FFTs; icicle.go:453-513 on-device; twiddle upload icicle.go:68-84).

TPU-first design decisions:

* Radix-2 butterflies are expressed as *reshapes + slices*, never gathers:
  stage ``m`` views the (N, K) limb array as (N/2m, 2, m, K) and does one
  batched field add/sub/mul across the whole array. XLA turns each stage
  into a handful of fused VPU loops.
* Transforms come in DIF (natural -> bit-reversed) and DIT (bit-reversed ->
  natural) flavors. Pipelines pair them so **no bit-reversal permutation is
  ever materialized** (INTT_dif then NTT_dit); where the reference needed an
  explicit device pass (``ReverseScalars``, icicle.go:502-510), we instead
  bit-reverse the *setup* tables once on the host (as gnark does for the Z
  points, setup.go:265).
* All twiddle stages are strided views of one (N/2, K) table, generated on
  device in log N steps.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .field import LimbField, I32


def bitrev_indices(n: int) -> np.ndarray:
    """Bit-reversal permutation indices for size n = 2^k."""
    k = n.bit_length() - 1
    idx = np.arange(n)
    out = np.zeros(n, dtype=np.int64)
    for _ in range(k):
        out = (out << 1) | (idx & 1)
        idx >>= 1
    return out


def _pow_table(F: LimbField, base_mont, n: int):
    """[base^0, base^1, ..., base^(n-1)] in Montgomery form, log-depth."""
    table = F.ones_mont((1,)).astype(I32)
    cur = base_mont[None, :]  # base^(2^j) ladder head
    while table.shape[0] < n:
        m = table.shape[0]
        step = cur  # base^m
        nxt = F.mont_mul(table, jnp.broadcast_to(step, table.shape))
        table = jnp.concatenate([table, nxt], axis=0)
        cur = F.mont_mul(step, step)
    return table[:n]


class Domain:
    """Evaluation domain of size 2^log_n over a LimbField scalar field.

    Holds forward/inverse twiddle tables and coset scaling tables
    (coset generator = the field's multiplicative generator, matching the
    reference's use of the fr generator for the Groth16 H-coset).
    """

    _cache: dict = {}

    def __new__(cls, F: LimbField, log_n: int, two_adic_root: int, coset_gen: int = None):
        key = (F.modulus, F.K, log_n, coset_gen)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        return self

    def __init__(self, F: LimbField, log_n: int, two_adic_root: int, coset_gen: int = None):
        """two_adic_root: primitive 2^log_n-th root of unity (host int)."""
        if getattr(self, "_initialized", False):
            return
        self._initialized = True
        self.F = F
        self.log_n = log_n
        self.n = 1 << log_n
        q = F.modulus
        self.omega = two_adic_root
        assert pow(two_adic_root, self.n, q) == 1
        if self.n > 1:
            assert pow(two_adic_root, self.n // 2, q) == q - 1

        # twiddle tables build lazily on first use: each is 0.5 GB at 2^24,
        # and a forward-only workload must not pay for the inverse table
        self._tw = {}
        self.n_inv = jnp.asarray(F.encode([pow(self.n, -1, q)])[0], dtype=I32)

        # MXU twiddle-matmul path (ops/mxu_field.py): stages whose twiddle
        # count m is small enough ride the systolic array. Default ON after
        # scale validation (1.5x at 2^20 and the only path that fits HBM at
        # 2^22 — the VPU path's stage temps OOM there); GNARK_TPU_MXU_NTT=0
        # opts out.
        import os

        self._mxu = None
        self._mxu_tables = {}
        if os.environ.get("GNARK_TPU_MXU_NTT", "1") == "1":
            from .mxu_field import MXUConstMul

            self._mxu = MXUConstMul(F)
            self._mxu_max_m = int(os.environ.get("GNARK_TPU_MXU_MAX_M", "4096"))
        # transposed (K, lanes) butterfly engine: limbs on sublanes, lanes =
        # elements — unpadded elementwise passes + the fused Pallas mont_mul
        # at the measured ~135 M muls/s (vs 12-18 M in (N, K) layout); also
        # the only layout whose stage temps fit HBM at 2^24 (PERF_NOTES.md)
        self._use_t = os.environ.get("GNARK_TPU_T_NTT", "1") == "1"

        # int32 index table (n < 2^31 always holds here); passed to jitted
        # transforms as a runtime ARGUMENT — closing over it would embed a
        # 134 MB constant at 2^24 into every HLO module, which blows the
        # remote-compile request limit (round-3 ntt-2^24 failure) and
        # bloats the persistent cache
        self._rev = jnp.asarray(bitrev_indices(self.n).astype(np.int32))
        self.coset_gen = coset_gen
        if coset_gen is not None:
            g = jnp.asarray(F.encode([coset_gen])[0], dtype=I32)
            gi = jnp.asarray(F.encode([pow(coset_gen, -1, q)])[0], dtype=I32)
            self.coset_pows = _pow_table(F, g, self.n)  # g^i, natural order
            self.coset_inv_pows = _pow_table(F, gi, self.n)
            # pre-permuted (bit-reversed index order) variants, device-built
            self._coset_pows_rev = jnp.take(self.coset_pows, self._rev,
                                            axis=0)
            self._coset_inv_pows_rev = jnp.take(self.coset_inv_pows,
                                                self._rev, axis=0)

    @property
    def tw_fwd(self):
        if "f" not in self._tw:
            w = jnp.asarray(self.F.encode([self.omega])[0], dtype=I32)
            self._tw["f"] = _pow_table(self.F, w, max(self.n // 2, 1))
        return self._tw["f"]

    @property
    def tw_inv(self):
        if "i" not in self._tw:
            q = self.F.modulus
            wi = jnp.asarray(
                self.F.encode([pow(self.omega, -1, q)])[0], dtype=I32)
            self._tw["i"] = _pow_table(self.F, wi, max(self.n // 2, 1))
        return self._tw["i"]

    # -- core butterflies ---------------------------------------------------
    # Transforms act along axis -2 of (..., n, K) arrays: leading axes are
    # batch (the 4-step distributed NTT runs row/column sub-transforms as
    # batches, parallel/ntt.py).
    def _mxu_stage_tables(self, tw_key, stride: int, m: int):
        """(m, K8, 2K8) Toeplitz stack for one stage's twiddles (cached)."""
        key = (tw_key, stride, m)
        if key not in self._mxu_tables:
            from .mxu_field import _toeplitz_u8

            q = self.F.modulus
            base = self.omega if tw_key == "f" else pow(self.omega, -1, q)
            w = pow(base, stride, q)
            rows = []
            cur = self.F.R % q  # Montgomery form of omega^0
            for _ in range(m):
                rows.append(_toeplitz_u8(cur, self._mxu.K8))
                cur = cur * w % q
            # cache the NUMPY stack: this is reached inside jit traces, and
            # a jnp array materialized there is a tracer that must not
            # escape to the next trace (UnexpectedTracerError)
            self._mxu_tables[key] = np.stack(rows)
        return self._mxu_tables[key]

    def _twiddle_mul(self, d, w, tw_key, stride: int, m: int):
        """d (..., m, K) × stage twiddles — MXU path when armed and m small."""
        F = self.F
        if self._mxu is None or m > self._mxu_max_m or m < 8:
            return F.mont_mul(d, jnp.broadcast_to(w, d.shape))
        tables = self._mxu_stage_tables(tw_key, stride, m)
        batch = d.shape[:-2]
        # group per twiddle: (..., m, K) -> (m, B, K)
        flat = d.reshape(-1, m, F.K)
        grouped = jnp.swapaxes(flat, 0, 1)
        out = self._mxu.mul_const_batched(grouped, tables)
        return jnp.swapaxes(out, 0, 1).reshape(batch + (m, F.K))

    # -- transposed stage engine --------------------------------------------
    def _t_active(self) -> bool:
        return self._use_t and jax.default_backend() == "tpu"

    def _tmul(self, x2d, y2d):
        """(K, L) fused-Pallas mont_mul, padding L to the block size."""
        from .field_t import TField

        tf = TField(self.F)
        bn = tf.block_n
        L = x2d.shape[1]
        rem = (-L) % bn
        if rem:
            x2d = jnp.pad(x2d, ((0, 0), (0, rem)))
            y2d = jnp.pad(y2d, ((0, 0), (0, rem)))
        out = tf.mont_mul(x2d, y2d)
        return out[:, :L] if rem else out

    def _butterflies_t(self, x, tw, dif: bool):
        """All log_n stages in transposed (K, lanes) layout.

        x: (..., n, K) int32 — transposed once on entry and once on exit;
        every stage is one unpadded add/sub pass plus one fused mont_mul
        over the d-half lanes.
        """
        from .field_t import TFieldOps, U32

        F, n = self.F, self.n
        K = F.K
        t = TFieldOps(F)
        batch = x.shape[:-2]
        xt = jnp.moveaxis(x, -1, 0).astype(U32)          # (K, ..., n)
        tw_t = jnp.moveaxis(tw, -1, 0).astype(U32)       # (K, n/2)
        stages = ([1 << s for s in range(self.log_n - 1, -1, -1)]
                  if dif else [1 << s for s in range(self.log_n)])
        for m in stages:
            stride = n // (2 * m)
            w = tw_t[:, ::stride][:, :m]                 # (K, m)
            v = xt.reshape((K,) + batch + (-1, 2, m))
            a = v[..., 0, :]
            b = v[..., 1, :]
            g = a.shape[-2]                              # n/(2m) groups
            wf = jnp.broadcast_to(
                w.reshape((K,) + (1,) * (a.ndim - 2) + (m,)), a.shape
            ).reshape(K, -1)
            ar = [a[i] for i in range(K)]
            br = [b[i] for i in range(K)]
            if dif:
                s_rows = t.add_rows(ar, br)
                d2 = jnp.stack(t.sub_rows(ar, br)).reshape(K, -1)
                dw = self._tmul(d2, wf).astype(U32).reshape(a.shape)
                s_arr = jnp.stack(s_rows)
                xt = jnp.stack([s_arr, dw], axis=-2)
            else:
                b2 = jnp.stack(br).reshape(K, -1)
                bw = self._tmul(b2, wf).astype(U32).reshape(a.shape)
                bwr = [bw[i] for i in range(K)]
                s_arr = jnp.stack(t.add_rows(ar, bwr))
                d_arr = jnp.stack(t.sub_rows(ar, bwr))
                xt = jnp.stack([s_arr, d_arr], axis=-2)
            xt = xt.reshape((K,) + batch + (-1,))
        return jnp.moveaxis(xt, 0, -1).astype(I32)

    def _dif(self, x, tw, tw_key):
        """Natural-order input -> bit-reversed output (decimation in freq)."""
        F, n = self.F, self.n
        if self._t_active():
            return self._butterflies_t(x, tw, dif=True)
        batch = x.shape[:-2]
        for m in [1 << s for s in range(self.log_n - 1, -1, -1)]:
            stride = n // (2 * m)
            w = tw[::stride][:m]  # (m, K): omega^(j*stride)
            v = x.reshape(batch + (-1, 2, m, F.K))
            a, b = v[..., 0, :, :], v[..., 1, :, :]
            s = F.add(a, b)
            d = self._twiddle_mul(F.sub(a, b), w, tw_key, stride, m)
            x = jnp.stack([s, d], axis=-3).reshape(batch + (-1, F.K))
        return x

    def _dit(self, x, tw, tw_key):
        """Bit-reversed input -> natural-order output (decimation in time)."""
        F, n = self.F, self.n
        if self._t_active():
            return self._butterflies_t(x, tw, dif=False)
        batch = x.shape[:-2]
        for m in [1 << s for s in range(self.log_n)]:
            stride = n // (2 * m)
            w = tw[::stride][:m]
            v = x.reshape(batch + (-1, 2, m, F.K))
            a = v[..., 0, :, :]
            b = self._twiddle_mul(v[..., 1, :, :], w, tw_key, stride, m)
            x = jnp.stack([F.add(a, b), F.sub(a, b)], axis=-3).reshape(
                batch + (-1, F.K)
            )
        return x

    # -- public transforms ---------------------------------------------------
    # Every jitted implementation takes the twiddle / permutation / coset
    # tables as runtime ARGUMENTS: a table closed over inside a trace is
    # embedded into the HLO module as an inline constant — ~0.5 GB of
    # twiddles at 2^24, far past the remote-compile request limit.
    # The data operand (x) is DONATED: transforms consume their input
    # buffer — at 2^24 a preserved 1 GB input pushes the stage working set
    # past HBM. Callers must not reuse the argument array afterwards
    # (donation is ignored on CPU).
    @partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
    def _dif_jit(self, x, tw, tw_key):
        return self._dif(x, tw, tw_key)

    @partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
    def _dit_jit(self, x, tw, tw_key):
        return self._dit(x, tw, tw_key)

    @partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
    def _intt_dif_jit(self, x, tw, tw_key):
        x = self._dif(x, tw, tw_key)
        return self.F.mont_mul(x, jnp.broadcast_to(self.n_inv, x.shape))

    @partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
    def _intt_dit_jit(self, x, tw, tw_key):
        x = self._dit(x, tw, tw_key)
        return self.F.mont_mul(x, jnp.broadcast_to(self.n_inv, x.shape))

    def ntt_nat_to_rev(self, coeffs):
        """coefficients (natural) -> evaluations (bit-reversed)."""
        return self._dif_jit(coeffs, self.tw_fwd, "f")

    def ntt_rev_to_nat(self, coeffs_rev):
        """coefficients (bit-reversed) -> evaluations (natural)."""
        return self._dit_jit(coeffs_rev, self.tw_fwd, "f")

    def intt_nat_to_rev(self, evals):
        """evaluations (natural) -> coefficients (bit-reversed), incl. 1/N."""
        return self._intt_dif_jit(evals, self.tw_inv, "i")

    def intt_rev_to_nat(self, evals_rev):
        """evaluations (bit-reversed) -> coefficients (natural), incl. 1/N."""
        return self._intt_dit_jit(evals_rev, self.tw_inv, "i")

    # -- natural-order conveniences (one device gather) ----------------------
    def bit_reverse(self, x):
        return jnp.take(x, self._rev, axis=-2)

    def ntt(self, coeffs):
        """natural -> natural forward transform."""
        return self.bit_reverse(self.ntt_nat_to_rev(coeffs))

    def intt(self, evals):
        """natural -> natural inverse transform."""
        return self.bit_reverse(self.intt_nat_to_rev(evals))

    # -- coset variants -------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 4), donate_argnums=(1,))
    def _scaled_dit_jit(self, x, scale, tw, tw_key):
        return self._dit(self.F.mont_mul(x, scale), tw, tw_key)

    @partial(jax.jit, static_argnums=(0, 4), donate_argnums=(1,))
    def _scaled_dif_jit(self, x, scale, tw, tw_key):
        return self._dif(self.F.mont_mul(x, scale), tw, tw_key)

    @partial(jax.jit, static_argnums=0, donate_argnums=(1,))
    def _unscale_jit(self, x, scale):
        x = self.F.mont_mul(x, scale)
        return self.F.mont_mul(x, jnp.broadcast_to(self.n_inv, x.shape))

    def coset_ntt_rev_in(self, coeffs_rev):
        """bit-reversed coefficients -> natural evals on the coset g·<omega>.

        Scales coefficient i by g^i (tables pre-permuted to bit-reversed
        index order) then runs DIT.
        """
        return self._scaled_dit_jit(coeffs_rev, self._coset_pows_rev,
                                    self.tw_fwd, "f")

    def coset_ntt_nat(self, coeffs):
        """natural coefficients -> natural evals on the coset g·<omega>."""
        return self.bit_reverse(
            self._scaled_dif_jit(coeffs, self.coset_pows, self.tw_fwd, "f")
        )

    def coset_intt_nat(self, evals):
        """natural coset evals -> natural coefficients (incl. 1/N, g^-i)."""
        x = self.bit_reverse(self._dif_jit(evals, self.tw_inv, "i"))
        return self._unscale_jit(x, self.coset_inv_pows)

    def coset_intt_nat_to_rev(self, evals):
        """natural coset evals -> bit-reversed coefficients (incl. 1/N, g^-i)."""
        x = self._dif_jit(evals, self.tw_inv, "i")
        return self._unscale_jit(x, self._coset_inv_pows_rev)


def domain_for(F: LimbField, prime_field, log_n: int, coset: bool = False) -> Domain:
    """Build a Domain from a curves.PrimeField parameter object."""
    root = prime_field.root_of_unity(log_n)
    gen = prime_field.multiplicative_generator if coset else None
    return Domain(F, log_n, root, gen)


class FourStepNTT:
    """Single-device CHUNKED 4-step NTT: N = N1·N2 as column transforms
    (chunked over rows) + twiddle grid + row transforms — for sizes whose
    monolithic 2·log₂N-stage graph exceeds HBM (2^24: the stage temps of
    the one-jit butterfly engine ResourceExhaust a 16 GB chip; here peak
    memory is ~3 full-size buffers + the resident twiddle grid).

    Same mathematics as the multi-chip ShardedNTT (parallel/ntt.py) with
    python-loop chunks in place of mesh shards; natural order in and out.
    Role parity: ICICLE's large-N mixed-radix NTT (icicle ntt.cu) — the
    reference's device NTT also decomposes past the single-kernel size.
    """

    _cache: dict = {}

    def __new__(cls, F: LimbField, log_n: int, two_adic_root: int,
                n_chunks: int = 8):
        key = ("4step", F.modulus, log_n, n_chunks)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        return self

    def __init__(self, F: LimbField, log_n: int, two_adic_root: int,
                 n_chunks: int = 8):
        if getattr(self, "_initialized", False):
            return
        self._initialized = True
        self.F = F
        self.log_n = log_n
        self.n = 1 << log_n
        q = F.modulus
        self.q = q
        self.omega = two_adic_root
        log_n1 = log_n // 2
        self.n1 = 1 << log_n1
        self.n2 = self.n // self.n1
        self.n_chunks = n_chunks
        assert self.n2 % n_chunks == 0 and self.n1 % n_chunks == 0
        self.dom1 = Domain(F, log_n1, pow(two_adic_root, self.n2, q))
        self.dom2 = Domain(F, log_n - log_n1,
                           pow(two_adic_root, self.n1, q))
        self.n_inv = jnp.asarray(F.encode([pow(self.n, -1, q)])[0],
                                 dtype=I32)
        self._grid = {}  # inverse -> (n2, n1, K) resident twiddle grid

    def grid(self, inverse: bool):
        """T[j2, k1] = ω^(±j2·k1), built on device chunk by chunk."""
        if inverse in self._grid:
            return self._grid[inverse]
        F = self.F
        w = self.omega if not inverse else pow(self.omega, -1, self.q)
        bases = _pow_table(
            F, jnp.asarray(F.encode([w])[0], dtype=I32), self.n2
        )  # (n2, K): ω^j2

        @partial(jax.jit, static_argnums=1)
        def build(b_local, n1):
            table = F.ones_mont((b_local.shape[0], 1)).astype(I32)
            cur = b_local[:, None, :]
            while table.shape[1] < n1:
                nxt = F.mont_mul(table, jnp.broadcast_to(cur, table.shape))
                table = jnp.concatenate([table, nxt], axis=1)
                cur = F.mont_mul(cur, cur)
            return table[:, :n1]

        rows = self.n2 // self.n_chunks
        parts = [
            build(bases[lo : lo + rows], self.n1)
            for lo in range(0, self.n2, rows)
        ]
        g = jnp.concatenate(parts, axis=0)
        self._grid[inverse] = g
        return g

    @partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
    def _col_chunk(self, rows, g_rows, inverse: bool):
        """(chunk, n1, K) rows: column NTT along axis -2 + twiddle mul."""
        d = self.dom1
        tw = d.tw_inv if inverse else d.tw_fwd
        y = d.bit_reverse(d._dif(rows, tw, "i" if inverse else "f"))
        return self.F.mont_mul(y, g_rows)

    @partial(jax.jit, static_argnums=(0, 2), donate_argnums=(1,))
    def _row_chunk(self, rows, inverse: bool):
        """(chunk, n2, K) rows: row NTT along axis -2 (+ 1/N on inverse)."""
        d = self.dom2
        tw = d.tw_inv if inverse else d.tw_fwd
        z = d.bit_reverse(d._dif(rows, tw, "i" if inverse else "f"))
        if inverse:
            z = self.F.mont_mul(z, jnp.broadcast_to(self.n_inv, z.shape))
        return z

    def _transform(self, x, inverse: bool):
        F, n1, n2 = self.F, self.n1, self.n2
        g = self.grid(inverse)
        # materialize the sub-domain twiddle tables OUTSIDE the chunk jits:
        # the lazy property would otherwise cache a tracer (leak)
        _ = (self.dom1.tw_inv if inverse else self.dom1.tw_fwd,
             self.dom2.tw_inv if inverse else self.dom2.tw_fwd)
        # x natural: index j = j1·n2 + j2 -> (n1, n2) row-major
        m = jnp.transpose(x.reshape(n1, n2, F.K), (1, 0, 2))  # (j2, j1)
        rows = n2 // self.n_chunks
        parts = [
            self._col_chunk(m[lo : lo + rows], g[lo : lo + rows], inverse)
            for lo in range(0, n2, rows)
        ]
        y = jnp.concatenate(parts, axis=0)        # (j2, k1, K)
        y = jnp.transpose(y, (1, 0, 2))           # (k1, j2, K)
        rows = n1 // self.n_chunks
        parts = [
            self._row_chunk(y[lo : lo + rows], inverse)
            for lo in range(0, n1, rows)
        ]
        z = jnp.concatenate(parts, axis=0)        # (k1, k2, K)
        # natural output index k = k1 + n1·k2 -> (k2, k1) row-major
        return jnp.transpose(z, (1, 0, 2)).reshape(self.n, F.K)

    def ntt(self, x):
        """natural -> natural forward transform, chunked."""
        return self._transform(x, inverse=False)

    def intt(self, x):
        """natural -> natural inverse transform (incl. 1/N), chunked."""
        return self._transform(x, inverse=True)
