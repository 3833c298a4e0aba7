"""Groth16 Setup: toxic waste sampling + QAP evaluation + key generation.

Role parity: reference backend/groth16/bn254/setup.go:85-362 (Setup) —
sampleToxicWaste (:456), setupABC Lagrange accumulation (:364-446), K-scalar
partitioning (:143-196), batch scalar multiplications (:251,320), Z-point
bit-reversal (:265). Host big-int math: setup is a one-time trusted ceremony,
not the proving hot path (the reference keeps it on CPU too — device upload
is deferred to first Prove, icicle.go:145-150).
"""

from __future__ import annotations

import secrets

from ...constraint.system import R1CS
from ...ops.ntt import bitrev_indices
from .keys import ProvingKey, VerifyingKey


def _next_pow2_log(n: int) -> int:
    log = max((n - 1).bit_length(), 1)
    return log


def qap_evaluations(cs: R1CS, tau: int, n: int, omega: int):
    """Per-wire QAP polynomial evaluations A_k(τ), B_k(τ), C_k(τ).

    Lagrange kernel: L_j(τ) = (τⁿ−1)·ω^j / (n·(τ−ω^j)); then one sweep over
    the constraint terms accumulating coeff·L_j into the term's wire slot
    (≙ setupABC's per-constraint accumulation, setup.go:423-442).
    """
    q = cs.q
    z_tau = (pow(tau, n, q) - 1) % q
    # denominators n·(τ−ω^j), batch-inverted
    omega_pows = [1] * n
    for j in range(1, n):
        omega_pows[j] = omega_pows[j - 1] * omega % q
    dens = [n * (tau - w) % q for w in omega_pows]
    if any(d == 0 for d in dens):
        raise ValueError("tau collides with the domain; resample")
    inv_dens = _batch_inv(dens, q)
    lag = [z_tau * omega_pows[j] % q * inv_dens[j] % q for j in range(n)]

    nw = cs.nb_wires
    A = [0] * nw
    B = [0] * nw
    C = [0] * nw
    coeffs = cs.coeffs
    tc, tw = cs.term_coeff, cs.term_wire
    for j in range(cs.nb_constraints):
        lj = lag[j]
        (ls, le), (rs, re), (os_, oe) = cs.constraint_slots(j)
        for t in range(ls, le):
            A[tw[t]] = (A[tw[t]] + coeffs[tc[t]] * lj) % q
        for t in range(rs, re):
            B[tw[t]] = (B[tw[t]] + coeffs[tc[t]] * lj) % q
        for t in range(os_, oe):
            C[tw[t]] = (C[tw[t]] + coeffs[tc[t]] * lj) % q
    return A, B, C, z_tau


def _batch_inv(xs, q):
    n = len(xs)
    prefix = [1] * (n + 1)
    for i, x in enumerate(xs):
        prefix[i + 1] = prefix[i] * x % q
    inv = pow(prefix[n], -1, q)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = inv * prefix[i] % q
        inv = inv * xs[i] % q
    return out


def setup(cs: R1CS, curve, rng=None, engine: str = "auto"):
    """(ProvingKey, VerifyingKey) for a compiled R1CS (≙ groth16.Setup)."""
    q = curve.fr.modulus
    assert q == cs.q, "constraint system field != curve scalar field"
    rand = rng.randrange if rng is not None else (
        lambda n: secrets.randbelow(n - 1) + 1
    )

    log_n = _next_pow2_log(max(cs.nb_constraints, 2))
    n = 1 << log_n
    omega = curve.fr.root_of_unity(log_n)

    tau = rand(q)
    alpha = rand(q)
    beta = rand(q)
    gamma = rand(q)
    delta = rand(q)

    A, B, C, z_tau = qap_evaluations(cs, tau, n, omega)

    inv_gamma = pow(gamma, -1, q)
    inv_delta = pow(delta, -1, q)

    # K-scalar partitioning (≙ setup.go:143-196): public wires AND
    # commitment wires go to vk.K (γ-scaled — the verifier injects their
    # values), committed private wires become the per-commitment Pedersen
    # bases (also γ-scaled), everything else is pk.K (δ-scaled).
    nb_pub = cs.nb_public
    commitment_wires = [c.commitment_index for c in cs.commitments]
    private_committed = [list(c.private_committed) for c in cs.commitments]
    committed_set = set(commitment_wires)
    for pc in private_committed:
        committed_set.update(pc)

    def k_scalar(k, inv):
        return (beta * A[k] + alpha * B[k] + C[k]) * inv % q

    vk_k_scalars = [k_scalar(k, inv_gamma) for k in range(nb_pub)]
    vk_k_scalars += [k_scalar(w, inv_gamma) for w in commitment_wires]
    ck_k_scalars = [
        [k_scalar(w, inv_gamma) for w in pc] for pc in private_committed
    ]
    pk_k_scalars = [
        k_scalar(k, inv_delta)
        for k in range(nb_pub, cs.nb_wires)
        if k not in committed_set
    ]
    # Z points: τ^i·Z(τ)/δ for i < n-1 — stored bit-reversed (setup.go:265)
    zd = z_tau * inv_delta % q
    z_scalars = [0] * (n - 1)
    acc = zd
    for i in range(n - 1):
        z_scalars[i] = acc
        acc = acc * tau % q

    g1 = curve.g1
    g2 = curve.g2
    G1, G2 = g1.generator, g2.generator

    def mul_g1(s):
        return g1.scalar_mul(G1, s)

    def mul_g2(s):
        return g2.scalar_mul(G2, s)

    # batch scalar-muls ride the device fixed-base kernel above a size
    # threshold (≙ BatchScalarMultiplicationG1/G2, setup.go:251,320)
    from ...ops.fixed_base import batch_scalar_mul_host

    bits = q.bit_length()
    _ctx = []  # device context built lazily: small setups stay device-free

    def ctx():
        if not _ctx:
            from ...device import DeviceCtx

            _ctx.append(DeviceCtx(curve))
        return _ctx[0]

    # engine="host" forces the pure big-int path for ANY size (the
    # reference's non-accelerated BatchScalarMultiplication role);
    # "auto"/"device" ride the device fixed-base kernel above a threshold
    def batch_g1(scalars):
        if engine == "host" or len(scalars) < 256:
            return [mul_g1(s) for s in scalars]
        c = ctx()
        return batch_scalar_mul_host(
            c.g1_dev, g1, c.fr_scalars, G1, scalars, bits
        )

    def batch_g2(scalars):
        if engine == "host" or len(scalars) < 256:
            return [mul_g2(s) for s in scalars]
        c = ctx()
        return batch_scalar_mul_host(
            c.g2_dev, g2, c.fr_scalars, G2, scalars, bits
        )

    # Pedersen commitment keys (≙ setup.go:294-305: per-commitment
    # pedersen.Setup over the committed wires' K points, one shared G2).
    from ..pedersen import PedersenProvingKey, PedersenVerifyingKey

    ck_pks, ck_vks = [], []
    if cs.commitments:
        c_g2 = mul_g2(rand(q))  # ≙ curve.RandomOnG2 (setup.go:293)
        for scalars in ck_k_scalars:
            sigma = rand(q)
            ck_pks.append(PedersenProvingKey(
                basis=batch_g1(scalars),
                basis_exp_sigma=batch_g1(
                    [s * sigma % q for s in scalars]
                ),
            ))
            ck_vks.append(PedersenVerifyingKey(
                g=c_g2,
                g_sigma_neg=g2.scalar_mul(c_g2, (q - sigma) % q),
            ))

    # verifier-side committed-wire indices into the extended public witness
    # (≙ GetPublicAndCommitmentCommitted, constraint/commitment.go:53-74):
    # public wire ids stay as-is; committed commitment wires translate to
    # nb_pub + their position in the commitment list.
    cw_pos = {w: i for i, w in enumerate(commitment_wires)}
    pub_and_com_committed = [
        [w if w < nb_pub else nb_pub + cw_pos[w]
         for w in c.public_and_commitment_committed]
        for c in cs.commitments
    ]

    pk = ProvingKey(
        g1_alpha=mul_g1(alpha),
        g1_beta=mul_g1(beta),
        g1_delta=mul_g1(delta),
        g2_beta=mul_g2(beta),
        g2_delta=mul_g2(delta),
        g1_a=batch_g1(A),
        g1_b=batch_g1(B),
        g2_b=batch_g2(B),
        g1_k=batch_g1(pk_k_scalars),
        g1_z=_bit_reverse_list(batch_g1(z_scalars), n),
        domain_log_n=log_n,
        commitment_keys=ck_pks,
    )
    vk = VerifyingKey(
        g1_alpha=pk.g1_alpha,
        g2_beta=pk.g2_beta,
        g2_gamma=mul_g2(gamma),
        g2_delta=pk.g2_delta,
        g1_k=batch_g1(vk_k_scalars),
        nb_public=nb_pub,
        commitment_keys=ck_vks,
        public_and_commitment_committed=pub_and_com_committed,
    )
    return pk, vk


def dummy_setup(cs: R1CS, curve) -> ProvingKey:
    """Fake PK for prove-latency benchmarking without a ceremony
    (≙ groth16.DummySetup, setup.go:494: every point is a fixed small
    multiple of the generator; proofs are NOT verifiable)."""
    from ..pedersen import PedersenProvingKey

    log_n = _next_pow2_log(max(cs.nb_constraints, 2))
    n = 1 << log_n
    g1, g2 = curve.g1, curve.g2
    p1 = g1.scalar_mul(g1.generator, 42)
    p2 = g2.scalar_mul(g2.generator, 42)
    nw = cs.nb_wires
    nb_committed = sum(
        1 + len(c.private_committed) for c in cs.commitments
    )
    return ProvingKey(
        g1_alpha=p1, g1_beta=p1, g1_delta=p1, g2_beta=p2, g2_delta=p2,
        g1_a=[p1] * nw, g1_b=[p1] * nw, g2_b=[p2] * nw,
        g1_k=[p1] * (nw - cs.nb_public - nb_committed),
        g1_z=[p1] * (n - 1) + [None],
        domain_log_n=log_n,
        commitment_keys=[
            PedersenProvingKey(
                basis=[p1] * len(c.private_committed),
                basis_exp_sigma=[p1] * len(c.private_committed),
            )
            for c in cs.commitments
        ],
    )


def _bit_reverse_list(points, n: int):
    """Permute a length n-1 list as the prefix of the size-n bit-reversal.

    h comes out of the coset INTT in bit-reversed order over the full domain;
    index i of the natural-order Z array lands at position rev(i). We place
    point i at rev-order position: out[j] = points[rev(j)] when rev(j) < n-1.
    """
    rev = bitrev_indices(n)
    out = []
    for j in range(n):
        src = int(rev[j])
        if src < len(points):
            out.append(points[src])
        else:
            out.append(None)  # the missing top coefficient slot
    return out
