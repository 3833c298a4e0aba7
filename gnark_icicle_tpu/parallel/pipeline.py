"""Prover super-op pipelining over sub-meshes (SURVEY §2.4(c)).

Role parity: reference backend/groth16/bn254/prove.go:310-313 launches the
four proof MSMs as concurrent goroutines on the host CPU, while the
accelerated path serializes them on the single GPU stream
(icicle.go:399-410). The TPU counterpart is neither: partition the chip
mesh into DISJOINT sub-meshes, dispatch each super-op (computeH's NTT
chain, the A/B1/B2 MSMs, then K/Z) as an independent sharded computation
on its own sub-mesh, and let the host's async dispatch run them
concurrently — XLA executes each computation on its own device set, so the
super-ops genuinely overlap in wall-clock, not just in queue order.

Dependency structure honored (SURVEY §3.3): A/B1/B2 MSMs and computeH
depend only on the solved witness and run concurrently; the K and h·Z MSMs
start when their inputs exist (K immediately, h·Z after computeH).

Scheduling knobs: `split_submeshes` carves a flat device list into named
single-axis meshes; `pipelined_groth16_msms` pads each operand to the
sub-mesh width (infinity points / zero scalars — both are exact no-ops for
MSM) and issues every dispatch before the first result is awaited.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from .msm import sharded_msm
from ..ops.msm import pick_window


def split_submeshes(devices, shares: dict) -> dict:
    """Carve `devices` into named single-axis sub-meshes.

    shares: {name: n_devices}; Σ n_devices ≤ len(devices). Each returned
    mesh owns a disjoint device slice, so computations dispatched on
    different sub-meshes execute concurrently.
    """
    total = sum(shares.values())
    if total > len(devices):
        raise ValueError(
            f"need {total} devices for {shares}, have {len(devices)}"
        )
    meshes = {}
    off = 0
    for name, n in shares.items():
        meshes[name] = Mesh(np.array(devices[off : off + n]), ("shard",))
        off += n
    return meshes


def _pad_msm_inputs(points, inf, scal, d: int):
    """Pad the MSM operand row count to a multiple of the sub-mesh width.
    Infinity points with zero scalars contribute the identity — exact.
    `points` is a pytree of (N, K) coordinate arrays (G1 or G2 shape).

    Small operands (< 4096 rows) pad to multiples of max(d, 64): tiny MSMs
    are dominated by per-shape jit compiles (minutes each on XLA-CPU), so
    collapsing n=35/37/38/64 onto ONE shape turns the prover's four MSMs
    into one compile — the MULTICHIP_r03 budget fix. Larger operands pad
    to 1024-multiples: ≤0.1% extra work, and the prover's A/B1/K MSMs
    (n, n, n−2 wires) share one kernel instead of compiling three — the
    2-chain BW6 prove spent ~40 min compiling near-identical shapes."""
    import math

    n = scal.shape[0]
    base = 64 if n < 4096 else 1024
    d = d * base // math.gcd(d, base)  # lcm: mesh width must still divide
    pad = (-n) % d
    if pad == 0:
        return points, inf, scal
    points = jax.tree.map(
        lambda a: jnp.pad(a, ((0, pad), (0, 0))), points
    )
    inf = jnp.pad(inf, (0, pad), constant_values=True)
    scal = jnp.pad(scal, ((0, pad), (0, 0)))
    return points, inf, scal


def dispatch_msm(kernel, mesh: Mesh, points, inf, scal, c: int | None = None):
    """Issue one sharded MSM on `mesh` WITHOUT blocking. Returns the device
    result (a projective point of per-leaf jax arrays) — a future under
    jax's async dispatch; materialize with jax.block_until_ready or a host
    transfer.

    Inputs are explicitly resharded onto `mesh` first: operands may arrive
    placed on a DIFFERENT device set (e.g. h_scalars sharded over the full
    mesh while this MSM runs on a 2-device sub-mesh) and jit rejects
    mixed-device arguments."""
    from jax.sharding import NamedSharding, PartitionSpec

    d = mesh.shape["shard"]
    points, inf, scal = _pad_msm_inputs(points, inf, scal, d)
    if c is None:
        c = pick_window(scal.shape[0] // d)
    row = NamedSharding(mesh, PartitionSpec("shard"))
    points = jax.tree.map(lambda a: jax.device_put(a, row), points)
    inf = jax.device_put(inf, row)
    scal = jax.device_put(scal, row)
    return sharded_msm(kernel, mesh, "shard", points, inf, scal, c)


def pipelined_groth16_msms(ctx, meshes: dict, dev: dict, wires, priv_wires,
                           h_scalars):
    """The Groth16 proof MSMs as overlapping sub-mesh dispatches.

    ctx: DeviceCtx; meshes: {"a","b1","b2","hk"} from split_submeshes;
    dev: pk.device_arrays(ctx) point staging; wires/priv_wires/h_scalars:
    solver outputs as device scalar limbs (≙ prove.py's device phase).

    Returns {"ar","bs1","bs2","krs_k","krs_z"} of UNMATERIALIZED device
    points: every dispatch is issued before any result is awaited, so the
    four sub-meshes run concurrently (the reference's goroutine fan-out,
    prove.go:310-313, recast as mesh-level parallelism).
    """
    out = {}
    out["ar"] = dispatch_msm(
        ctx.msm_g1, meshes["a"], dev["a"][0], dev["a"][1], wires)
    out["bs1"] = dispatch_msm(
        ctx.msm_g1, meshes["b1"], dev["b1"][0], dev["b1"][1], wires)
    out["bs2"] = dispatch_msm(
        ctx.msm_g2, meshes["b2"], dev["b2"][0], dev["b2"][1], wires)
    if priv_wires.shape[0] > 0:
        out["krs_k"] = dispatch_msm(
            ctx.msm_g1, meshes["hk"], dev["k"][0], dev["k"][1], priv_wires)
    out["krs_z"] = dispatch_msm(
        ctx.msm_g1, meshes["hk"], dev["z"][0], dev["z"][1], h_scalars)
    return out


__all__ = [
    "split_submeshes", "dispatch_msm", "pipelined_groth16_msms",
]
