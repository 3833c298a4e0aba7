"""PLONK Prove: trace solve → commitments → permutation Z → quotient →
linearized polynomial → batched KZG opening (gnark proof shape).

Role parity: reference backend/plonk/bn254/prove.go:111 (9-stage pipeline,
SURVEY.md §3.5). Device work: the Lagrange↔coefficient NTTs, the 4n-coset
evaluation NTTs, and every KZG commitment MSM. Host work: witness solve,
permutation product, Fiat-Shamir, blinding, linearized-poly assembly.

Proof shape (≙ prove.go:656 innerComputeLinearizedPoly + :739-764
batchOpening): instead of opening every trace polynomial, the prover
commits the linearized polynomial

    r(X) = l·Ql + r·Qr + lr·Qm + o·Qo + Qk + Σ qcpᵢ(ζ)·PI2ᵢ
         + α(l+βs1+γ)(r+βs2+γ)βZ(ωζ)·S3
         + [α²L₁(ζ) − α(l+βζ+γ)(r+βk₁ζ+γ)(o+βk₂ζ+γ)]·Z
         − Z_H(ζ)(H₁ + ζⁿ⁺²H₂ + ζ²⁽ⁿ⁺²⁾H₃)

and batch-opens [r, L, R, O, S1, S2, Qcp...] at ζ plus Z at ωζ. The
quotient identity (note the permutation term's gnark sign):

    Ql·A + Qr·B + Qm·AB + Qo·C + Qk + PI(X)
  + α·[ (A+βS1+γ)(B+βS2+γ)(C+βS3+γ)·Z(ωX) − (A+βX+γ)(B+βk1X+γ)(C+βk2X+γ)·Z ]
  + α²·L1(X)·(Z(X)−1)  =  T(X)·(Xⁿ−1)

Fiat-Shamir follows gnark's byte format exactly for fs_hash="sha256"
(gamma binds vk trace commitments + publics + LRO, then beta, alpha, zeta
— verify.go:93-126, transcript.GnarkTranscript).
"""

from __future__ import annotations

import secrets
import time

import numpy as np

from ...constraint.scs import SparseR1CS, solve_scs
from ...device import DeviceCtx
from ..kzg import KZG
from ..transcript import make_transcript, kzg_fold_challenge
from .keys import ProvingKey, Proof

CHALLENGES = (b"gamma", b"beta", b"alpha", b"zeta")


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


def bind_public_data(ts, curve, vk, public_values):
    """≙ bindPublicData (verify.go:316-347): the first challenge absorbs
    the permutation + selector commitments and the public inputs, so the
    transcript binds the circuit/verifying key."""
    for name in ("s1", "s2", "s3", "ql", "qr", "qm", "qo", "qk"):
        ts.bind_point(b"gamma", curve, vk.commitments[name])
    for i in range(len(vk.commitment_constraint_indexes)):
        ts.bind_point(b"gamma", curve, vk.commitments[f"qcp{i}"])
    for v in public_values:
        ts.bind_fr(b"gamma", v)


_DOMAIN_TABLES: dict = {}


def _quotient_tables(ctx, dom4, n: int, g: int, eta: int, q: int):
    """Device tables for the 4n coset: x-values, L1(x), 1/Z_H(x) (cached per
    domain — they are proof-independent)."""
    key = (q, n)
    if key in _DOMAIN_TABLES:
        return _DOMAIN_TABLES[key]
    import jax.numpy as jnp

    from ...ops.ntt import _pow_table
    from ...ops.field import I32

    F = ctx.fr_dev
    eta_m = jnp.asarray(F.encode([eta])[0], dtype=I32)
    g_m = jnp.asarray(F.encode([g])[0], dtype=I32)
    xs = F.mont_mul(
        _pow_table(F, eta_m, 4 * n), jnp.broadcast_to(g_m, (4 * n, F.K))
    )
    gn = pow(g, n, q)
    etan = pow(eta, n, q)
    zh_cycle = [(gn * pow(etan, t, q) - 1) % q for t in range(4)]
    zh_inv = jnp.asarray(F.encode(
        [pow(v, -1, q) for v in zh_cycle] * n
    ))  # (4n, K), cycling with period 4
    zh_vals = jnp.asarray(F.encode(zh_cycle * n))
    # L1(x) = Z_H(x) / (n (x − 1))
    n_m = jnp.asarray(F.encode([n])[0], dtype=I32)
    one_m = F.ones_mont((4 * n,)).astype(I32)
    dens = F.mont_mul(
        jnp.broadcast_to(n_m, (4 * n, F.K)), F.sub(xs, one_m)
    )
    l1 = F.mont_mul(zh_vals, F.mont_inv(dens))
    # held as uint16 (limbs are 16-bit): at a 2^20 domain the 4n tables
    # are 3×256 MB as int32 — half of that mattered in the r5e HBM OOM
    _DOMAIN_TABLES[key] = (xs.astype(jnp.uint16), l1.astype(jnp.uint16),
                           zh_inv.astype(jnp.uint16))
    return _DOMAIN_TABLES[key]


def _quotient_device(ctx, dom4, ev, n, beta, gamma, alpha, k1, k2, g, eta, q):
    """Pointwise quotient on the 4n coset, fully on device
    (≙ computeNumerator's hot loop, prove.go:771-1034 — there CPU-parallel,
    here a fused elementwise pass over Montgomery limb arrays). The pass is
    CHUNKED over rows: one jit over all 4n rows at a 2^20 domain held ~13
    input evals plus the (N, 2K+1)-u32 schoolbook temps of ~20 chained
    mont_muls and exhausted HBM (r5a plonk-2^20 ResourceExhausted); the
    computation is pointwise, so row chunks are exact."""
    import jax.numpy as jnp

    F = ctx.fr_dev
    xs, l1, zh_inv = _quotient_tables(ctx, dom4, n, g, eta, q)
    n_qcp = 0
    while f"qcp{n_qcp}" in ev:
        n_qcp += 1

    chunk_fn = _quotient_chunk_fn(F, n_qcp)
    # challenge constants as RUNTIME (1, K) rows — closure constants would
    # embed β/γ/α in the jit and recompile every proof
    consts = jnp.asarray(F.encode([
        beta % q, gamma % q, alpha % q,
        beta * k1 % q, beta * k2 % q, alpha * alpha % q,
    ])).astype(jnp.int32)

    total = 4 * n
    chunk = min(total, 1 << 19)
    parts = []
    names = ("a", "b", "c", "z", "zw", "qk", "ql", "qr", "qm", "qo",
             "s1", "s2", "s3")
    for lo in range(0, total, chunk):
        hi = lo + chunk
        args = [ev[k][lo:hi] for k in names]
        args += [xs[lo:hi], l1[lo:hi], zh_inv[lo:hi]]
        for i in range(n_qcp):
            args += [ev[f"qcp{i}"][lo:hi], ev[f"pi2_{i}"][lo:hi]]
        parts.append(chunk_fn(consts, *args))
    t_evals = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    return dom4.coset_intt_nat(t_evals)


_QCHUNK_CACHE: dict = {}


def _quotient_chunk_fn(F, n_qcp: int):
    """One jitted quotient chunk per (field, #commitments) — cached so
    repeated proofs reuse the compiled executable."""
    key = (id(F), n_qcp)
    if key in _QCHUNK_CACHE:
        return _QCHUNK_CACHE[key]
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chunk_fn(consts, A, B, C, z, zw, qk, ql, qr, qm, qo,
                 s1, s2, s3, xs_c, l1_c, zh_c, *qcps):
        # inputs arrive as uint16 (the 4n eval arrays stay packed in HBM
        # — 13 of them at int32 exhausted the chip at a 2^20 domain,
        # r5e); widen to the kernel's int32 limb form per chunk
        (A, B, C, z, zw, qk, ql, qr, qm, qo, s1, s2, s3, xs_c, l1_c,
         zh_c) = (a.astype(jnp.int32) for a in (
            A, B, C, z, zw, qk, ql, qr, qm, qo, s1, s2, s3, xs_c, l1_c,
            zh_c))
        qcps = tuple(a.astype(jnp.int32) for a in qcps)

        def bc(i):
            return jnp.broadcast_to(consts[i], A.shape).astype(jnp.int32)

        beta_m, gamma_m, alpha_m = bc(0), bc(1), bc(2)
        bk1, bk2, alpha2_m = bc(3), bc(4), bc(5)
        gate = F.mont_mul(ql, A)
        gate = F.add(gate, F.mont_mul(qr, B))
        gate = F.add(gate, F.mont_mul(F.mont_mul(qm, A), B))
        gate = F.add(gate, F.mont_mul(qo, C))
        gate = F.add(gate, qk)
        # BSB22 terms: Σ qcp_i · PI2_i (≙ computeNumerator's qcp loop)
        for i in range(n_qcp):
            gate = F.add(gate, F.mont_mul(qcps[2 * i], qcps[2 * i + 1]))
        lhs = F.add(F.add(A, F.mont_mul(beta_m, xs_c)), gamma_m)
        lhs = F.mont_mul(lhs, F.add(F.add(B, F.mont_mul(bk1, xs_c)),
                                    gamma_m))
        lhs = F.mont_mul(lhs, F.add(F.add(C, F.mont_mul(bk2, xs_c)),
                                    gamma_m))
        lhs = F.mont_mul(lhs, z)
        rhs = F.add(F.add(A, F.mont_mul(beta_m, s1)), gamma_m)
        rhs = F.mont_mul(rhs, F.add(F.add(B, F.mont_mul(beta_m, s2)),
                                    gamma_m))
        rhs = F.mont_mul(rhs, F.add(F.add(C, F.mont_mul(beta_m, s3)),
                                    gamma_m))
        rhs = F.mont_mul(rhs, zw)
        # gnark's sign: s-side·Z(ωX) − id-side·Z (verify.go constLin)
        perm = F.sub(rhs, lhs)
        one = F.ones_mont((A.shape[0],)).astype(jnp.int32)
        start = F.mont_mul(l1_c, F.sub(z, one))
        num = F.add(gate, F.add(F.mont_mul(alpha_m, perm),
                                F.mont_mul(alpha2_m, start)))
        return F.mont_mul(num, zh_c)

    _QCHUNK_CACHE[key] = chunk_fn
    return chunk_fn


def _linear_combo_dev(ctx, F, terms, length: int, q: int):
    """Σ sᵢ·Pᵢ on DEVICE in Montgomery form (≙ the linearized-poly /
    batch-fold host loops, prove.go:1233-1319 — there CPU-parallel; the
    all-host bigint version was ~26M mulmods ≈ tens of seconds at 2^20).

    terms: (poly, scalar) with poly either a host coefficient list or an
    already-device (length, K) Montgomery array. Returns the device
    Montgomery accumulator; decode with F.decode_plain(F.from_mont(...))."""
    import jax.numpy as jnp

    acc = None
    for coeffs, s in terms:
        if isinstance(coeffs, list):
            plain = F.encode_plain(coeffs)
            if plain.shape[0] < length:
                plain = np.pad(
                    plain, [(0, length - plain.shape[0]), (0, 0)])
            pm = ctx.fr_mont(plain)
        else:  # device Montgomery array
            pm = coeffs
            if pm.shape[0] < length:
                pm = jnp.pad(pm, [(0, length - pm.shape[0]), (0, 0)])
        s = s % q
        if s != 1:
            s_m = jnp.asarray(F.encode([s])[0])
            pm = F.mont_mul(pm, jnp.broadcast_to(s_m, pm.shape))
        acc = pm if acc is None else F.add(acc, pm)
    return acc


def prove(cs: SparseR1CS, pk: ProvingKey, public_values, secret_values,
          curve, rng=None, checkpoint_dir: str | None = None,
          fs_hash: str = "sha256", engine: str = "device",
          commitment_hash: str | tuple = "sha256") -> Proof:
    """PLONK prove; checkpoint_dir persists the expensive stages (witness
    solve, round-1 wire commitments incl. their blinding, permutation Z,
    quotient) so a preempted run resumes — same scheme as groth16.prove.
    engine: "device" (TPU kernels) or "host" (pure big-int NTT/quotient/
    KZG — ≙ the reference's non-accelerated prover; zero warmup, right
    for small systems).
    commitment_hash: BSB22 commitment hash-to-field mode — "sha256" (the
    gnark-parity RFC 9380 path, DST "BSB22-Plonk") or ("mimc",
    outer_modulus) for recursion-friendly proofs whose commitment wire an
    outer circuit replays natively (≙ recursion.NewShort installed via
    backend.WithProverHashToFieldFunction; same convention as
    groth16.prove's commitment_hash)."""
    q = curve.fr.modulus
    rand = rng.randrange if rng is not None else (
        lambda m: secrets.randbelow(m - 1) + 1
    )
    vk = pk.vk
    assert vk is not None, "ProvingKey.vk required (rebuild keys via setup)"
    ck = None
    if checkpoint_dir is not None:
        import hashlib

        from ..groth16.prove import _Checkpoint

        binding = hashlib.sha256(
            b"plonkck" + cs.nb_gates.to_bytes(8, "big")
            + pk.log_n.to_bytes(2, "big")
            # beta/gamma (and so the checkpointed Z / quotient stages)
            # depend on the transcript hash — bind the mode; the round-1
            # commitment wire depends on the commitment-hash mode
            + fs_hash.encode() + repr(commitment_hash).encode()
            + b"".join(int(v).to_bytes(32, "big") for v in public_values)
            # bind the secret witness too: resuming with different secrets
            # must invalidate the saved solved witness
            + b"|sec|"
            + b"".join(int(v % q).to_bytes(32, "big") for v in secret_values)
        ).digest()
        ck = _Checkpoint(checkpoint_dir, binding)
    assert engine in ("device", "host")
    log_n = pk.log_n
    n = 1 << log_n
    omega = curve.fr.root_of_unity(log_n)
    k1, k2 = pk.k1, pk.k2
    if engine == "host":
        from .host_engine import HostKZG, coset_ntt_host, intt_host

        ctx = dom = dom4 = F = None
        kzg = HostKZG(curve, pk.srs)

        def evals_to_coeffs(evals):
            return intt_host(evals, log_n, curve.fr)

        def coset4_evals_dev(coeffs):
            return coset_ntt_host(
                coeffs, log_n + 2, curve.fr,
                curve.fr.multiplicative_generator,
            )
    else:
        ctx = DeviceCtx(curve)
        dom = ctx.domain(log_n)
        dom4 = ctx.domain(log_n + 2, coset=True)
        kzg = KZG(curve, pk.srs)
        F = ctx.fr_dev

        def evals_to_coeffs(evals):
            """Lagrange evals (host ints) -> coefficient host ints: both
            Montgomery conversions happen ON DEVICE (encode_plain is one
            C-level to_bytes per value; F.decode's host from-Mont was two
            bigint mulmods per element — seconds per 2^20 polynomial)."""
            plain_in = F.encode_plain(evals)
            coeffs_m = dom.intt(ctx.fr_mont(plain_in))
            return F.decode_plain(np.asarray(F.from_mont(coeffs_m)))

        def coset4_evals_dev(coeffs):
            """host coeffs -> DEVICE Montgomery evals on the 4n coset.

            encode_plain (one C-level to_bytes per value) + the DEVICE
            to-Montgomery mul: F.encode's two host mulmods per element
            were ~2-4 s per 4n-length polynomial at a 2^20 domain."""
            assert len(coeffs) <= 4 * n, "degree exceeds 4n"
            plain = F.encode_plain(coeffs)
            if len(coeffs) < 4 * n:
                plain = np.pad(
                    plain, [(0, 4 * n - len(coeffs)), (0, 0)])
            # packed uint16 (limbs are 16-bit): 13 of these 4n arrays
            # resident as int32 = 3.5 GB at a 2^20 domain — the r5e HBM
            # OOM; the quotient chunk fn widens per chunk
            import jax.numpy as jnp

            return dom4.coset_ntt_nat(ctx.fr_mont(plain)).astype(
                jnp.uint16)

    # ---- stage 1: solve + wire polynomials --------------------------------
    # BSB22 override: the placeholder hint becomes a KZG commitment to the
    # PI2 column polynomial (≙ the instance's bsb22Hint, prove.go:291-320)
    commitment_info = cs.commitments
    bsb22_coms = [None] * len(commitment_info)
    pi2_coeffs = [None] * len(commitment_info)
    commitment_vals = [None] * len(commitment_info)
    overrides = None
    if commitment_info:
        from ..hash_to_field import hash_to_fr
        from ...io.serialize import g1_to_bytes

        def bsb22_override(qmod, inputs):
            i = int(inputs[0])
            cinfo = commitment_info[i]
            vals = inputs[1:]
            pi2 = [0] * n
            for gi, vv in zip(cinfo.committed, vals):
                pi2[gi] = vv % qmod
            committed_set = set(cinfo.committed)
            # blind at rows whose qcp is 0 (the commitment row + last row,
            # ≙ prove.go:305-309)
            pi2[cinfo.commitment_index] = rand(qmod)
            if n - 1 not in committed_set and n - 1 != cinfo.commitment_index:
                pi2[n - 1] = rand(qmod)
            coeffs = evals_to_coeffs(pi2)
            com = kzg.commit(coeffs)
            bsb22_coms[i] = com
            pi2_coeffs[i] = coeffs
            if (isinstance(commitment_hash, tuple)
                    and commitment_hash[0] == "mimc"):
                # recursion-friendly: the outer circuit replays this MiMC
                # natively (std/recursion/{plonk,native_plonk}.py); PLONK
                # absorbs only the commitment point (no committed values,
                # matching the sha path's g1_to_bytes-only input)
                from ..hash_to_field import mimc_commitment_hash

                val = mimc_commitment_hash(
                    commitment_hash[1], qmod, curve.fp.modulus, com, [])
            else:
                val = hash_to_fr(
                    g1_to_bytes(curve, com, compressed=False),
                    b"BSB22-Plonk", qmod,
                )[0]
            commitment_vals[i] = val
            return [val]

        from ...constraint import hints as hintlib

        overrides = {hintlib.BSB22_PLACEHOLDER: bsb22_override}

    from ...logger import logger

    _t = {"last": time.perf_counter()}

    def _mark(stage):
        now = time.perf_counter()
        logger().info("plonk prove: %s took=%.3fs", stage,
                      now - _t["last"])
        _t["last"] = now

    solved = ck.load("solve") if ck is not None else None
    if solved is not None:
        (wires, av, bv, cv, bsb22_coms, pi2_coeffs,
         commitment_vals) = solved
    else:
        wires, av, bv, cv = solve_scs(cs, public_values, secret_values,
                                      hint_overrides=overrides)
        if ck is not None:
            ck.save("solve", (wires, av, bv, cv, bsb22_coms, pi2_coeffs,
                              commitment_vals))
    _mark("solve")
    av += [0] * (n - len(av))
    bv += [0] * (n - len(bv))
    cv += [0] * (n - len(cv))

    ts = make_transcript(q, list(CHALLENGES), fs_hash)
    bind_public_data(ts, curve, vk, public_values)

    def blind(coeffs, degree):
        bs = [rand(q) for _ in range(degree + 1)]
        return _add_poly(coeffs, _mul_zh(bs, n, q), q)

    round1 = ck.load("round1") if ck is not None else None
    if round1 is not None:
        a_coeffs, b_coeffs, c_coeffs, a_com, b_com, c_com = round1
    else:
        a_coeffs = blind(evals_to_coeffs(av), 1)
        b_coeffs = blind(evals_to_coeffs(bv), 1)
        c_coeffs = blind(evals_to_coeffs(cv), 1)
        import os as _os

        if _os.environ.get("GNARK_TPU_BATCH_MSM", "0") == "1":
            # one wave loop for the three wire commits (shared SRS table)
            a_com, b_com, c_com = kzg.commit_batch(
                [a_coeffs, b_coeffs, c_coeffs])
        else:
            a_com = kzg.commit(a_coeffs)
            b_com = kzg.commit(b_coeffs)
            c_com = kzg.commit(c_coeffs)
        if ck is not None:
            ck.save("round1",
                    (a_coeffs, b_coeffs, c_coeffs, a_com, b_com, c_com))
    _mark("round1 wire commits")
    for cm in (a_com, b_com, c_com):
        ts.bind_point(b"gamma", curve, cm)
    gamma = ts.challenge(b"gamma")
    beta = ts.challenge(b"beta")

    # ---- stage 2: permutation product Z ------------------------------------
    omega_pows = [1] * n
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * omega % q
    tags = (1, k1, k2)
    sigma = pk.sigma

    def sigma_val(col, j):
        p = int(sigma[col * n + j])
        return tags[p // n] * omega_pows[p % n] % q

    # Z via prefix products + ONE batched inversion (Montgomery's trick):
    # the naive recurrence pays a ~µs-scale pow(den, -1, q) PER ROW — n
    # modular inversions dominated stage 2 at large domains. Here:
    # zv[j+1] = Pnum[j] · inv(Pden[j]) with all prefix-product inverses
    # unwound from one inversion of the full product (~5n mulmods total).
    zv = [1] * n
    dens = [0] * (n - 1)
    pnum = [0] * (n - 1)
    run = 1
    for j in range(n - 1):
        num = (av[j] + beta * omega_pows[j] + gamma) % q
        num = num * ((bv[j] + beta * k1 * omega_pows[j] + gamma) % q) % q
        num = num * ((cv[j] + beta * k2 * omega_pows[j] + gamma) % q) % q
        den = (av[j] + beta * sigma_val(0, j) + gamma) % q
        den = den * ((bv[j] + beta * sigma_val(1, j) + gamma) % q) % q
        den = den * ((cv[j] + beta * sigma_val(2, j) + gamma) % q) % q
        dens[j] = den
        run = run * num % q
        pnum[j] = run
    if n > 1:
        run = 1
        for j in range(n - 1):
            run = run * dens[j] % q
        inv = pow(run, -1, q)  # ∏ den_j ≠ 0 for a valid witness
        for j in range(n - 2, -1, -1):
            zv[j + 1] = pnum[j] * inv % q
            inv = inv * dens[j] % q

    round2 = ck.load("round2") if ck is not None else None
    if round2 is not None:
        z_coeffs, z_com = round2
    else:
        z_coeffs = blind(evals_to_coeffs(zv), 2)
        z_com = kzg.commit(z_coeffs)
        if ck is not None:
            ck.save("round2", (z_coeffs, z_com))
    _mark("round2 Z")
    for cm in bsb22_coms:  # α binds the BSB22 commitments (≙ prove.go:471)
        ts.bind_point(b"alpha", curve, cm)
    ts.bind_point(b"alpha", curve, z_com)
    alpha = ts.challenge(b"alpha")

    # ---- stage 3: quotient on the 4n coset ---------------------------------
    # full Qk (committed coefficients + public inputs in the first slots)
    qk_full = list(cs.qc) + [0] * (n - cs.nb_gates)
    for j, pv in enumerate(public_values):
        qk_full[j] = (qk_full[j] + pv) % q
    for i, cinfo in enumerate(commitment_info):
        # the commitment hash enters Qk like a public input (≙ completeQk
        # placing commitmentVal at the commitment row, prove.go:381-383)
        ci = cinfo.commitment_index
        qk_full[ci] = (qk_full[ci] + commitment_vals[i]) % q
    qk_full_coeffs = evals_to_coeffs(qk_full)

    # z(ωX) coefficient scaling with a RUNNING power (the pow(omega, i, q)
    # per coefficient was n modexps ≈ n·log n mulmods)
    zw_coeffs = []
    wp = 1
    for c in z_coeffs:
        zw_coeffs.append(c * wp % q)
        wp = wp * omega % q

    # all columns as DEVICE Montgomery evals on the 4n coset
    shard = n + 2
    quo = ck.load("quotient") if ck is not None else None
    if quo is not None:
        t1, t2, t3, h_coms = quo
    else:
        ev = {
            "a": coset4_evals_dev(a_coeffs),
            "b": coset4_evals_dev(b_coeffs),
            "c": coset4_evals_dev(c_coeffs),
            "z": coset4_evals_dev(z_coeffs),
            "zw": coset4_evals_dev(zw_coeffs),
            "qk": coset4_evals_dev(qk_full_coeffs),
        }
        for name in ("ql", "qr", "qm", "qo", "s1", "s2", "s3"):
            ev[name] = coset4_evals_dev(pk.trace_coeffs[name])
        for i in range(len(commitment_info)):
            ev[f"qcp{i}"] = coset4_evals_dev(pk.trace_coeffs[f"qcp{i}"])
            ev[f"pi2_{i}"] = coset4_evals_dev(pi2_coeffs[i])
        if engine == "host":
            from .host_engine import quotient_host

            t_coeffs = quotient_host(
                ev, n, beta, gamma, alpha, k1, k2, curve.fr
            )
            t1 = t_coeffs[:shard]
            t2 = t_coeffs[shard : 2 * shard]
            t3 = t_coeffs[2 * shard : 3 * shard]
            for c in t_coeffs[3 * shard :]:
                assert c == 0, "quotient degree overflow"
            h_coms = (kzg.commit(t1), kzg.commit(t2), kzg.commit(t3))
        else:
            t_mont = _quotient_device(
                ctx, dom4, ev, n, beta, gamma, alpha, k1, k2,
                curve.fr.multiplicative_generator,
                curve.fr.root_of_unity(log_n + 2), q,
            )
            ev.clear()  # free the 4n coset evals (~1.8 GB at 2^20)
            t_coeffs = F.decode_plain(np.asarray(F.from_mont(t_mont)))
            # T has degree ≤ 3n+5; split into 3 shards of n+2
            t1 = t_coeffs[:shard]
            t2 = t_coeffs[shard : 2 * shard]
            t3 = t_coeffs[2 * shard : 3 * shard]
            for c in t_coeffs[3 * shard :]:
                assert c == 0, "quotient degree overflow — identity violated"
            import os as _os

            if _os.environ.get("GNARK_TPU_BATCH_MSM", "0") == "1":
                h_coms = tuple(kzg.commit_mont_batch([
                    t_mont[:shard], t_mont[shard : 2 * shard],
                    t_mont[2 * shard : 3 * shard]]))
            else:
                h_coms = (
                    kzg.commit_mont(t_mont[:shard]),
                    kzg.commit_mont(t_mont[shard : 2 * shard]),
                    kzg.commit_mont(t_mont[2 * shard : 3 * shard]),
                )
        if ck is not None:
            ck.save("quotient", (t1, t2, t3, h_coms))
    _mark("round3 quotient")
    for cm in h_coms:
        ts.bind_point(b"zeta", curve, cm)
    zeta = ts.challenge(b"zeta")

    # ---- stage 4: linearized polynomial + openings -------------------------
    # (≙ innerComputeLinearizedPoly, prove.go:1233-1319, and batchOpening,
    # prove.go:739-764)
    l_z = _eval_poly(a_coeffs, zeta, q)
    r_z = _eval_poly(b_coeffs, zeta, q)
    o_z = _eval_poly(c_coeffs, zeta, q)
    s1_z = _eval_poly(pk.trace_coeffs["s1"], zeta, q)
    s2_z = _eval_poly(pk.trace_coeffs["s2"], zeta, q)
    qcp_z = [
        _eval_poly(pk.trace_coeffs[f"qcp{i}"], zeta, q)
        for i in range(len(commitment_info))
    ]
    zeta_w = zeta * omega % q
    zu = _eval_poly(z_coeffs, zeta_w, q)
    _, z_shifted_h = kzg.open(z_coeffs, zeta_w)

    rl = l_z * r_z % q
    cprod = (l_z + beta * s1_z + gamma) % q * (
        (r_z + beta * s2_z + gamma) % q) % q
    s1_coef = cprod * beta % q * zu % q * alpha % q
    idp = (l_z + beta * zeta + gamma) % q
    idp = idp * ((r_z + beta * k1 % q * zeta + gamma) % q) % q
    idp = idp * ((o_z + beta * k2 % q * zeta + gamma) % q) % q
    zh_z = (pow(zeta, n, q) - 1) % q
    l1_z = zh_z * pow(n * (zeta - 1) % q, -1, q) % q
    z_coef = (alpha * alpha % q * l1_z - alpha * idp) % q
    zeta_n2 = pow(zeta, n + 2, q)

    def scaled(coeffs, s):
        return [c * s % q for c in coeffs]

    lin_terms = [
        (pk.trace_coeffs["ql"], l_z),
        (pk.trace_coeffs["qr"], r_z),
        (pk.trace_coeffs["qm"], rl),
        (pk.trace_coeffs["qo"], o_z),
        (pk.trace_coeffs["qk"], 1),
    ]
    for i in range(len(commitment_info)):
        lin_terms.append((pi2_coeffs[i], qcp_z[i]))
    lin_terms += [
        (pk.trace_coeffs["s3"], s1_coef),
        (z_coeffs, z_coef),
        (t1, (-zh_z) % q),
        (t2, (-zh_z) * zeta_n2 % q),
        (t3, (-zh_z) * zeta_n2 % q * zeta_n2 % q),
    ]
    if engine == "device":
        L = n + 4  # covers blinded z (n+3) and the n+2 shards
        lin_m = _linear_combo_dev(ctx, F, lin_terms, L, q)
        lin = F.decode_plain(np.asarray(F.from_mont(lin_m)))
        lin_com = kzg.commit_mont(lin_m)
    else:
        lin = []
        for p, s in lin_terms:
            lin = _add_poly(lin, scaled(p, s) if s != 1 else list(p), q)
        lin_com = kzg.commit(lin)
    lin_z = _eval_poly(lin, zeta, q)

    polys = [lin, a_coeffs, b_coeffs, c_coeffs,
             pk.trace_coeffs["s1"], pk.trace_coeffs["s2"]]
    digests = [lin_com, a_com, b_com, c_com,
               vk.commitments["s1"], vk.commitments["s2"]]
    claimed = [lin_z, l_z, r_z, o_z, s1_z, s2_z]
    for i in range(len(commitment_info)):
        polys.append(pk.trace_coeffs[f"qcp{i}"])
        digests.append(vk.commitments[f"qcp{i}"])
        claimed.append(qcp_z[i])

    gamma_kzg = kzg_fold_challenge(fs_hash, curve, q, zeta, digests,
                                   claimed, zu)
    if engine == "device":
        gi = 1
        fold_terms = []
        for idx, p in enumerate(polys):
            fold_terms.append((lin_m if idx == 0 else p, gi))
            gi = gi * gamma_kzg % q
        folded_m = _linear_combo_dev(ctx, F, fold_terms, L, q)
        folded = F.decode_plain(np.asarray(F.from_mont(folded_m)))
    else:
        folded = []
        gi = 1
        for p in polys:
            folded = _add_poly(folded, scaled(p, gi), q)
            gi = gi * gamma_kzg % q
    _, batch_h = kzg.open(folded, zeta)

    _mark("round4 linearization+openings")
    return Proof(
        lro=(a_com, b_com, c_com), z_com=z_com, h_coms=h_coms,
        batch_h=batch_h, batch_claimed=claimed,
        z_shifted_h=z_shifted_h, z_shifted_claimed=zu,
        bsb22_commitments=bsb22_coms,
    )
