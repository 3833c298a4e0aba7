"""Multi-chip MSM: points/scalars sharded over a mesh axis, per-chip
Pippenger, ICI reduction.

Role parity: this is the component the reference does NOT have — its MSM
parallelism is a CPU core split inside one process
(`ecc.MultiExpConfig{NbTasks}`, prove.go:204) and at most one GPU
(SURVEY.md §2.4). The TPU counterpart (§2.4(a)): shard the N points/scalars
across chips along a mesh axis, run the full local MSM per chip (buckets,
reduction, Horner all local — zero communication), then all_gather the d
per-chip projective partial sums (3·K·d ints, tiny) and tree-add. MSM is
embarrassingly data-parallel: expected scaling efficiency ≈ 1 up to the point
where N/d approaches the bucket count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.msm import MSMKernel, pick_window


def sharded_msm(kernel: MSMKernel, mesh: Mesh, axis: str,
                points, inf_mask, scalar_limbs, c: int | None = None):
    """MSM with inputs sharded along `axis` of `mesh`.

    points/inf_mask/scalar_limbs: global arrays (leading dim N divisible by
    the axis size). Returns one (replicated) projective point.
    """
    n = scalar_limbs.shape[0]
    d = mesh.shape[axis]
    assert n % d == 0, f"N={n} not divisible by mesh axis {axis}={d}"
    cc = c if c is not None else pick_window(n // d)
    curve = kernel.curve

    def local(pts, inf, scal):
        part = kernel.msm(pts, inf, scal, cc)  # local projective point
        gathered = jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis), part
        )  # leaves (d, K) — replicated on every chip
        acc = jax.tree.map(lambda a: a[0], gathered)
        for i in range(1, d):
            acc = curve.add(acc, jax.tree.map(lambda a: a[i], gathered))
        return acc

    spec_in = jax.tree.map(lambda _: P(axis), points)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_in, P(axis), P(axis)),
        out_specs=P(),  # replicated; prefix spec covers G1 and G2 trees
        check_rep=False,
    )
    return fn(points, inf_mask, scalar_limbs)


def sharded_msm_jit(kernel: MSMKernel, mesh: Mesh, axis: str, c: int):
    """jit-compiled closure over static (kernel, mesh, axis, window)."""

    @partial(jax.jit, static_argnums=())
    def run(points, inf_mask, scalar_limbs):
        return sharded_msm(kernel, mesh, axis, points, inf_mask,
                           scalar_limbs, c)

    return run
