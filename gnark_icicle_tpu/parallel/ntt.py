"""Multi-chip NTT: Bailey/4-step decomposition with ICI all-to-all transposes.

Role parity: none in the reference — its largest transform is a single-GPU
full-domain NTT (icicle.go:488-498) and PLONK's ρ-shard trick bounds memory,
not communication (SURVEY.md §5 "long-context analog"). The TPU counterpart
(§2.4(b)): view the size-N domain as an N1×N2 matrix; butterfly stages are
local sub-NTTs until the element stride crosses the shard boundary, at which
point the exchange is a dense all_to_all transpose — the sequence-parallel
axis decomposition applied to butterflies.

Decomposition (x natural, j = j1·N2 + j2; output natural, k = k1 + N1·k2):
    X[k1 + N1·k2] = Σ_{j2} ω_{N2}^{j2·k2} · ( ω_N^{j2·k1} · Σ_{j1}
                    ω_{N1}^{j1·k1} · x[j1·N2 + j2] )
Three all_to_all transposes give natural-order output sharded like the input.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.field import LimbField, I32
from ..ops.ntt import Domain, _pow_table


class ShardedNTT:
    """Forward/inverse NTT of size 2^log_n sharded along one mesh axis.

    The twiddle grid T[j2, k1] = ω^(j2·k1) is built once, sharded, and cached;
    sub-domains are the ops.ntt Domain (their tables are replicated — they are
    √N-sized).
    """

    def __init__(self, F: LimbField, prime_field, log_n: int,
                 mesh: Mesh, axis: str):
        self.F = F
        self.log_n = log_n
        self.n = 1 << log_n
        self.mesh = mesh
        self.axis = axis
        d = mesh.shape[axis]
        self.d = d
        # split N = N1·N2 with both divisible by d
        log_n1 = log_n // 2
        self.n1 = 1 << log_n1
        self.n2 = self.n // self.n1
        if self.n1 % d or self.n2 % d:
            raise ValueError(
                f"N1={self.n1}, N2={self.n2} must be divisible by axis size {d}"
            )
        q = prime_field.modulus
        omega = prime_field.root_of_unity(log_n)
        self.dom1 = Domain(F, log_n1, pow(omega, self.n2, q))
        self.dom2 = Domain(F, log_n - log_n1, pow(omega, self.n1, q))
        self.omega = omega
        self.q = q
        self.n_inv = jnp.asarray(F.encode([pow(self.n, -1, q)])[0], dtype=I32)
        self._tw_grid = {}  # inverse flag -> sharded (N2, N1, K) array

    # -- twiddle grid --------------------------------------------------------
    def _grid(self, inverse: bool):
        """Sharded twiddle grid T[j2, k1] = ω^(±j2·k1), built on device."""
        if inverse in self._tw_grid:
            return self._tw_grid[inverse]
        F = self.F
        w = self.omega if not inverse else pow(self.omega, -1, self.q)
        # row j2 of T is the power table of base ω^j2, length N1.
        bases = _pow_table(
            F, jnp.asarray(F.encode([w])[0], dtype=I32), self.n2
        )  # (N2, K): ω^j2

        def build(b_local):
            # batched power table along a new axis: (N2/d, N1, K)
            table = F.ones_mont((b_local.shape[0], 1)).astype(I32)
            cur = b_local[:, None, :]
            while table.shape[1] < self.n1:
                nxt = F.mont_mul(table, jnp.broadcast_to(cur, table.shape))
                table = jnp.concatenate([table, nxt], axis=1)
                cur = F.mont_mul(cur, cur)
            return table[:, : self.n1]

        grid = shard_map(
            build, mesh=self.mesh, in_specs=(P(self.axis),),
            out_specs=P(self.axis), check_rep=False,
        )(bases)
        self._tw_grid[inverse] = grid
        return grid

    # -- transforms ----------------------------------------------------------
    def _transform(self, x, inverse: bool):
        """x: (N, K) natural order, sharded on axis -2 leading dim."""
        F = self.F
        n1, n2, d = self.n1, self.n2, self.d
        dom1 = self.dom1
        dom2 = self.dom2
        grid = self._grid(inverse)
        tw1 = dom1.tw_inv if inverse else dom1.tw_fwd
        tw2 = dom2.tw_inv if inverse else dom2.tw_fwd
        ax = self.axis

        def local(xl, gl):
            # xl: (N/d, K) natural block = [j1 local, j2 full] as a matrix
            m = xl.reshape(n1 // d, n2, F.K)
            # transpose 1: (N1/d, N2, K) → (N1, N2/d, K) [j1 full, j2 local]
            m = jax.lax.all_to_all(m, ax, split_axis=1, concat_axis=0, tiled=True)
            m = jnp.swapaxes(m, 0, 1)  # (N2/d, N1, K) [j2 local, j1]
            # column NTT over j1 (axis -2), batched over local j2
            y = dom1.bit_reverse(dom1._dif(m, tw1, 'i' if inverse else 'f'))  # natural k1
            # twiddle ω^(j2·k1): gl is (N2/d, N1, K)
            y = F.mont_mul(y, gl)
            # transpose 2: (N2/d, N1, K) → (N2, N1/d, K) [j2 full, k1 local]
            y = jax.lax.all_to_all(y, ax, split_axis=1, concat_axis=0, tiled=True)
            y = jnp.swapaxes(y, 0, 1)  # (N1/d, N2, K) [k1 local, j2]
            # row NTT over j2 (axis -2), batched over local k1
            z = dom2.bit_reverse(dom2._dif(y, tw2, 'i' if inverse else 'f'))  # natural k2
            # transpose 3: want natural output k = k1 + N1·k2 sharded by k2
            z = jnp.swapaxes(z, 0, 1)  # (N2, N1/d, K) [k2 full, k1 local]
            z = jax.lax.all_to_all(z, ax, split_axis=0, concat_axis=1, tiled=True)
            # (N2/d, N1, K) [k2 local, k1] → rows-major flatten is natural
            out = z.reshape(self.n // d, F.K)
            if inverse:
                out = F.mont_mul(
                    out, jnp.broadcast_to(self.n_inv, out.shape)
                )
            return out

        return shard_map(
            local, mesh=self.mesh,
            in_specs=(P(ax), P(ax)), out_specs=P(ax), check_rep=False,
        )(x, grid)

    def ntt(self, x):
        """natural → natural forward transform, sharded in/out."""
        return self._transform(x, inverse=False)

    def intt(self, x):
        """natural → natural inverse transform (incl. 1/N), sharded in/out."""
        return self._transform(x, inverse=True)
