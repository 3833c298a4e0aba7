"""PLONK Prove: trace solve → commitments → permutation Z → quotient →
batched KZG openings.

Role parity: reference backend/plonk/bn254/prove.go:111 (9-stage pipeline,
SURVEY.md §3.5). Device work: the Lagrange↔coefficient NTTs, the 4n-coset
evaluation NTTs, and every KZG commitment MSM. Host work: witness solve,
permutation product, Fiat-Shamir, blinding, and the 4n pointwise quotient
assembly (batched onto device in a later perf pass — the MSMs/NTTs dominate).

Proof shape difference (documented in keys.py): instead of gnark's
linearization trick we open all trace polynomials at ζ and fold everything
into one batched KZG proof (+ one for Z(ωζ)) — same soundness argument, two
pairing checks, a few extra field elements of proof. The quotient identity:

    Ql·A + Qr·B + Qm·AB + Qo·C + Qk + PI(X)
  + α·[ (A+βX+γ)(B+βk1X+γ)(C+βk2X+γ)·Z − (A+βS1+γ)(B+βS2+γ)(C+βS3+γ)·Z(ωX) ]
  + α²·L1(X)·(Z(X)−1)  =  T(X)·(Xⁿ−1)
"""

from __future__ import annotations

import secrets

import numpy as np

from ...constraint.scs import SparseR1CS, solve_scs
from ...device import DeviceCtx
from ..kzg import KZG
from ..transcript import Transcript
from .keys import ProvingKey, Proof

EVAL_ORDER = (
    "a", "b", "c", "z", "s1", "s2", "s3", "ql", "qr", "qm", "qo", "qk",
    "t1", "t2", "t3",
)


def _mul_zh(coeffs: list, n: int, q: int) -> list:
    """coeffs(X)·(Xⁿ−1) (blinding factors ride the vanishing polynomial)."""
    out = [0] * (len(coeffs) + n)
    for i, c in enumerate(coeffs):
        out[i + n] = (out[i + n] + c) % q
        out[i] = (out[i] - c) % q
    return out


def _add_poly(a: list, b: list, q: int) -> list:
    out = list(a) + [0] * max(0, len(b) - len(a))
    for i, c in enumerate(b):
        out[i] = (out[i] + c) % q
    return out


def _eval_poly(coeffs: list, z: int, q: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % q
    return acc


def prove(cs: SparseR1CS, pk: ProvingKey, public_values, secret_values,
          curve, rng=None) -> Proof:
    q = curve.fr.modulus
    rand = rng.randrange if rng is not None else (
        lambda m: secrets.randbelow(m - 1) + 1
    )
    ctx = DeviceCtx(curve)
    log_n = pk.log_n
    n = 1 << log_n
    dom = ctx.domain(log_n)
    dom4 = ctx.domain(log_n + 2, coset=True)
    kzg = KZG(curve, pk.srs)
    F = ctx.fr_dev
    omega = curve.fr.root_of_unity(log_n)
    k1, k2 = pk.k1, pk.k2

    def evals_to_coeffs(evals):
        return F.decode(np.asarray(dom.intt(ctx.fr_mont(evals))))

    def coset4_evals(coeffs):
        padded = list(coeffs) + [0] * (4 * n - len(coeffs))
        assert len(padded) == 4 * n, "degree exceeds 4n"
        return F.decode(np.asarray(dom4.coset_ntt_nat(ctx.fr_mont(padded))))

    # ---- stage 1: solve + wire polynomials --------------------------------
    wires, av, bv, cv = solve_scs(cs, public_values, secret_values)
    av += [0] * (n - len(av))
    bv += [0] * (n - len(bv))
    cv += [0] * (n - len(cv))

    ts = Transcript(q)
    for v in public_values:
        ts.absorb_fr(v)

    def blind(coeffs, degree):
        bs = [rand(q) for _ in range(degree + 1)]
        return _add_poly(coeffs, _mul_zh(bs, n, q), q)

    a_coeffs = blind(evals_to_coeffs(av), 1)
    b_coeffs = blind(evals_to_coeffs(bv), 1)
    c_coeffs = blind(evals_to_coeffs(cv), 1)
    a_com = kzg.commit(a_coeffs)
    b_com = kzg.commit(b_coeffs)
    c_com = kzg.commit(c_coeffs)
    for cm in (a_com, b_com, c_com):
        ts.absorb_point(curve, cm)
    beta = ts.challenge(b"beta")
    gamma = ts.challenge(b"gamma")

    # ---- stage 2: permutation product Z ------------------------------------
    omega_pows = [1] * n
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * omega % q
    tags = (1, k1, k2)
    sigma = pk.sigma

    def sigma_val(col, j):
        p = int(sigma[col * n + j])
        return tags[p // n] * omega_pows[p % n] % q

    zv = [1] * n
    for j in range(n - 1):
        num = (av[j] + beta * omega_pows[j] + gamma) % q
        num = num * ((bv[j] + beta * k1 * omega_pows[j] + gamma) % q) % q
        num = num * ((cv[j] + beta * k2 * omega_pows[j] + gamma) % q) % q
        den = (av[j] + beta * sigma_val(0, j) + gamma) % q
        den = den * ((bv[j] + beta * sigma_val(1, j) + gamma) % q) % q
        den = den * ((cv[j] + beta * sigma_val(2, j) + gamma) % q) % q
        zv[j + 1] = zv[j] * num % q * pow(den, -1, q) % q

    z_coeffs = blind(evals_to_coeffs(zv), 2)
    z_com = kzg.commit(z_coeffs)
    ts.absorb_point(curve, z_com)
    alpha = ts.challenge(b"alpha")

    # ---- stage 3: quotient on the 4n coset ---------------------------------
    # full Qk (committed coefficients + public inputs in the first slots)
    qk_full = list(cs.qc) + [0] * (n - cs.nb_gates)
    for j, pv in enumerate(public_values):
        qk_full[j] = (qk_full[j] + pv) % q
    qk_full_coeffs = evals_to_coeffs(qk_full)

    zw_coeffs = [c * pow(omega, i, q) % q for i, c in enumerate(z_coeffs)]

    ev = {
        "a": coset4_evals(a_coeffs),
        "b": coset4_evals(b_coeffs),
        "c": coset4_evals(c_coeffs),
        "z": coset4_evals(z_coeffs),
        "zw": coset4_evals(zw_coeffs),
        "qk": coset4_evals(qk_full_coeffs),
    }
    for name in ("ql", "qr", "qm", "qo", "s1", "s2", "s3"):
        ev[name] = coset4_evals(pk.trace_coeffs[name])

    # coset point x_i = g·η^i; Z_H(x) = gⁿ·η^(n·i) − 1 cycles with period 4
    g = curve.fr.multiplicative_generator
    eta = curve.fr.root_of_unity(log_n + 2)
    gn = pow(g, n, q)
    etan = pow(eta, n, q)
    zh_cycle = [(gn * pow(etan, t, q) - 1) % q for t in range(4)]
    zh_inv_cycle = [pow(v, -1, q) for v in zh_cycle]
    # L1(x) = (xⁿ−1)·/(n(x−1)) on the coset
    xs = [g * pow(eta, i, q) % q for i in range(4 * n)]
    denoms = [(n * (x - 1)) % q for x in xs]
    den_inv = curve.fr.batch_inv(denoms)
    l1 = [zh_cycle[i % 4] * den_inv[i] % q for i in range(4 * n)]

    x_pows = xs  # x values double as the id-permutation values
    t_evals = [0] * (4 * n)
    for i in range(4 * n):
        A, B, C = ev["a"][i], ev["b"][i], ev["c"][i]
        gate = (
            ev["ql"][i] * A + ev["qr"][i] * B + ev["qm"][i] * A * B
            + ev["qo"][i] * C + ev["qk"][i]
        ) % q
        x = x_pows[i]
        lhs = (A + beta * x + gamma) % q
        lhs = lhs * ((B + beta * k1 % q * x + gamma) % q) % q
        lhs = lhs * ((C + beta * k2 % q * x + gamma) % q) % q
        lhs = lhs * ev["z"][i] % q
        rhs = (A + beta * ev["s1"][i] + gamma) % q
        rhs = rhs * ((B + beta * ev["s2"][i] + gamma) % q) % q
        rhs = rhs * ((C + beta * ev["s3"][i] + gamma) % q) % q
        rhs = rhs * ev["zw"][i] % q
        perm = (lhs - rhs) % q
        start = l1[i] * (ev["z"][i] - 1) % q
        t_evals[i] = (
            (gate + alpha * perm + alpha * alpha % q * start)
            * zh_inv_cycle[i % 4]
        ) % q

    t_coeffs = F.decode(np.asarray(dom4.coset_intt_nat(ctx.fr_mont(t_evals))))
    # T has degree ≤ 3n+5; strip the zero tail and split into 3 shards of n+2
    shard = n + 2
    t1 = t_coeffs[:shard]
    t2 = t_coeffs[shard : 2 * shard]
    t3 = t_coeffs[2 * shard : 3 * shard]
    for c in t_coeffs[3 * shard :]:
        assert c == 0, "quotient degree overflow — identity violated"
    t_coms = (kzg.commit(t1), kzg.commit(t2), kzg.commit(t3))
    for cm in t_coms:
        ts.absorb_point(curve, cm)
    zeta = ts.challenge(b"zeta")

    # ---- stage 4: openings ---------------------------------------------------
    polys = {
        "a": a_coeffs, "b": b_coeffs, "c": c_coeffs, "z": z_coeffs,
        "s1": pk.trace_coeffs["s1"], "s2": pk.trace_coeffs["s2"],
        "s3": pk.trace_coeffs["s3"],
        "ql": pk.trace_coeffs["ql"], "qr": pk.trace_coeffs["qr"],
        "qm": pk.trace_coeffs["qm"], "qo": pk.trace_coeffs["qo"],
        "qk": pk.trace_coeffs["qk"],  # committed Qk (no PI)
        "t1": t1, "t2": t2, "t3": t3,
    }
    evals = {name: _eval_poly(polys[name], zeta, q) for name in EVAL_ORDER}
    z_omega_eval = _eval_poly(z_coeffs, zeta * omega % q, q)

    for name in EVAL_ORDER:
        ts.absorb_fr(evals[name])
    ts.absorb_fr(z_omega_eval)
    v = ts.challenge(b"v")

    # fold Σ vⁱ·P_i and open once at ζ
    folded = []
    vi = 1
    for name in EVAL_ORDER:
        folded = _add_poly(folded, [c * vi % q for c in polys[name]], q)
        vi = vi * v % q
    _, batch_proof = kzg.open(folded, zeta)
    _, z_omega_proof = kzg.open(z_coeffs, zeta * omega % q)

    return Proof(
        a_com=a_com, b_com=b_com, c_com=c_com, z_com=z_com, t_coms=t_coms,
        evals=evals, z_omega_eval=z_omega_eval,
        batch_proof=batch_proof, z_omega_proof=z_omega_proof,
    )
