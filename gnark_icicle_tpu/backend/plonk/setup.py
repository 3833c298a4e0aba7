"""PLONK Setup: trace construction + permutation + commitments.

Role parity: reference backend/plonk/bn254/setup.go:88 Setup —
Trace{Ql,Qr,Qm,Qo,Qk,S1,S2,S3} (:60-79), buildPermutation (:271). The
permutation places the three wire slots of gate j at positions j, n+j, 2n+j
and closes one cycle per wire; S_col encodes σ through the three cosets
H, k1·H, k2·H.
"""

from __future__ import annotations

import numpy as np

from ...constraint.scs import SparseR1CS
from ...device import DeviceCtx
from ..kzg import KZG, SRS, unsafe_srs
from .keys import ProvingKey, VerifyingKey


def _next_pow2_log(n: int) -> int:
    return max((n - 1).bit_length(), 1)


def build_permutation(cs: SparseR1CS, n: int):
    """σ over 3n slot positions (≙ buildPermutation, setup.go:271).

    Positions j / n+j / 2n+j hold gate j's a/b/c wires; padding gates
    (j ≥ nb_gates) reference a dummy wire each so σ fixes them.
    """
    m = cs.nb_gates
    nw = cs.nb_wires
    # wire id per position; padding positions get unique pseudo-wires
    pos_wire = np.full(3 * n, -1, dtype=np.int64)
    pos_wire[:m] = cs.xa
    pos_wire[n : n + m] = cs.xb
    pos_wire[2 * n : 2 * n + m] = cs.xc
    nxt = nw
    for i in range(3 * n):
        if pos_wire[i] < 0:
            pos_wire[i] = nxt
            nxt += 1

    # cycle per wire: σ(p) = next position with the same wire
    first = {}
    last = {}
    sigma = np.arange(3 * n, dtype=np.int64)
    for p in range(3 * n):
        w = int(pos_wire[p])
        if w in last:
            sigma[last[w]] = p
        else:
            first[w] = p
        last[w] = p
    for w, f in first.items():
        sigma[last[w]] = f  # close the cycle
    return sigma


def setup(cs: SparseR1CS, curve, srs: SRS | None = None, rng=None,
          k1: int | None = None, k2: int | None = None,
          engine: str = "device"):
    """(ProvingKey, VerifyingKey). srs defaults to an unsafe test SRS
    (≙ plonk.Setup(ccs, srs, srsLagrange) with test/unsafekzg)."""
    q = curve.fr.modulus
    assert cs.q == q
    log_n = max(_next_pow2_log(max(cs.nb_gates, 2)), 3)  # quotient shards need n >= 8
    n = 1 << log_n
    if srs is None:
        srs = unsafe_srs(curve, n + 5, rng=rng, engine=engine)
    # coset shifts: gnark uses 5 (the fr generator) per vanilla-PLONK; any
    # pair with H, k1H, k2H pairwise disjoint works
    g = curve.fr.multiplicative_generator
    k1 = k1 if k1 is not None else g
    k2 = k2 if k2 is not None else g * g % q

    omega = curve.fr.root_of_unity(log_n)
    sigma = build_permutation(cs, n)

    # selector columns, padded to n (public gates keep their committed
    # coefficients; runtime Qk adds public inputs on top — prove.py)
    def pad(col):
        return [c % q for c in col] + [0] * (n - len(col))

    cols = {
        "ql": pad(cs.ql), "qr": pad(cs.qr), "qm": pad(cs.qm),
        "qo": pad(cs.qo), "qk": pad(cs.qc),
    }
    # BSB22 Qcp columns: 1 at each COMMITTED row (≙ setup.go:193-201)
    for i, cinfo in enumerate(cs.commitments):
        col = [0] * n
        for gi in cinfo.committed:
            col[gi] = 1
        cols[f"qcp{i}"] = col

    # σ columns as field elements: position p -> coset tag · ω^(p mod n)
    omega_pows = [1] * n
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * omega % q
    tags = (1, k1, k2)

    def pos_value(p: int) -> int:
        return tags[p // n] * omega_pows[p % n] % q

    for col_idx, name in enumerate(("s1", "s2", "s3")):
        cols[name] = [
            pos_value(int(sigma[col_idx * n + j])) for j in range(n)
        ]

    # Lagrange -> coefficients (INTT), then KZG commitments
    trace_coeffs = {}
    commitments = {}
    if engine == "host":
        from .host_engine import HostKZG, intt_host

        kzg = HostKZG(curve, srs)
        for name, evals in cols.items():
            coeffs = intt_host(evals, log_n, curve.fr)
            trace_coeffs[name] = coeffs
            commitments[name] = kzg.commit(coeffs)
    else:
        ctx = DeviceCtx(curve)
        dom = ctx.domain(log_n)
        kzg = KZG(curve, srs)
        for name, evals in cols.items():
            enc = ctx.fr_mont(evals)
            coeffs = ctx.fr_dev.decode(np.asarray(dom.intt(enc)))
            trace_coeffs[name] = coeffs
            commitments[name] = kzg.commit(coeffs)

    pk = ProvingKey(
        trace_coeffs=trace_coeffs, log_n=log_n, k1=k1, k2=k2, srs=srs,
        sigma=sigma,
    )
    vk = VerifyingKey(  # noqa: the prover's transcript binds the vk (pk.vk)
        commitments=commitments, log_n=log_n, k1=k1, k2=k2,
        nb_public=cs.nb_public, g2_gen=srs.g2_gen, g2_tau=srs.g2_tau,
        omega=omega,
        commitment_constraint_indexes=[
            c.commitment_index for c in cs.commitments
        ],  # ≙ vk.CommitmentConstraintIndexes (setup.go:93)
    )
    pk.vk = vk  # ≙ pk.Vk — prove's bindPublicData needs the commitments
    return pk, vk
