"""In-circuit PLONK verifier over emulated BN254 (same-curve recursion).

Role parity: reference std/recursion/plonk (verifier.go — AssertProof:
in-circuit transcript replay, linearization-constant check, folded KZG
batch opening). The inner proof must be produced with fs_hash="mimc"
(≙ recursion.NewShort: the inner prover swaps to a hash the outer circuit
can afford), so all Fiat-Shamir challenges replay NATIVELY here — only the
curve points and the final pairing are emulated. The verifying key is
circuit-constant (the reference's "fixed" vk placement).

Mirrors the gnark proof shape (backend/plonk/verify.py): checks the
claimed linearized-poly opening against −constLin, rebuilds the
linearized-polynomial digest as an emulated MSM, folds the batch opening
with the KZG γ challenge, then folds BOTH openings (batch at ζ, Z at ωζ)
with a transcript-derived u into ONE two-pair pairing check —
e(F₁ + u·F₂, G₂) · e(−(W₁ + u·W₂), τG₂) == 1 with
Fᵢ = Cᵢ − vᵢ·G + zᵢ·Wᵢ (≙ kzg.FoldProof/BatchVerifyMultiPoints).

Engine-level today like the other pairing-based gadgets (ROADMAP:
range-table emulated mul for compilation).
"""

from __future__ import annotations

from dataclasses import dataclass

from ...backend.transcript import point_limbs
from ...curves import bn254
from ..fiat_shamir import NamedTranscript
from ..sw_emulated import AffinePoint, BN254G1, EmulatedCurve
from ..pairing_bn254 import BN254Pairing

_CHALLENGES = ["gamma", "beta", "alpha", "zeta"]


@dataclass
class PlonkVerifierProof:
    """Gadget-side PLONK proof (≙ recursion/plonk.Proof). Points are
    emulated G1 witnesses; evaluations are NATIVE Fr variables."""

    lro: list                    # 3 AffinePoints
    z_com: AffinePoint
    h_coms: list                 # 3 AffinePoints
    batch_claimed: list          # native vars [lin, l, r, o, s1, s2]
    batch_h: AffinePoint         # W₁: batched opening at ζ
    z_shifted_claimed: object    # native var Z(ωζ)
    z_shifted_h: AffinePoint     # W₂: Z opening at ωζ


class PlonkVerifier:
    """≙ recursion/plonk.Verifier with a circuit-constant vk; the inner
    proof must come from plonk.prove(..., fs_hash="mimc")."""

    def __init__(self, api, native_modulus: int, vk):
        if vk.commitment_constraint_indexes:
            raise NotImplementedError(
                "recursion over BSB22-commitment PLONK proofs: later round"
            )
        self.api = api
        self.q = native_modulus
        self.vk = vk
        self.curve = EmulatedCurve(api, BN254G1, native_modulus)
        self.pairing = BN254Pairing(api, native_modulus)
        e2 = self.pairing.e2
        self._g2_gen = (e2.constant(vk.g2_gen[0].c0, vk.g2_gen[0].c1),
                        e2.constant(vk.g2_gen[1].c0, vk.g2_gen[1].c1))
        self._g2_tau = (e2.constant(vk.g2_tau[0].c0, vk.g2_tau[0].c1),
                        e2.constant(vk.g2_tau[1].c0, vk.g2_tau[1].c1))

    # -- witness constructors ------------------------------------------------
    def proof_witness(self, proof) -> PlonkVerifierProof:
        """Bind a host Proof's values as gadget witnesses (engine path)."""
        fp = self.curve.fp

        def g1(pt):
            return AffinePoint(fp.constant(pt[0]), fp.constant(pt[1]))

        return PlonkVerifierProof(
            lro=[g1(c) for c in proof.lro],
            z_com=g1(proof.z_com),
            h_coms=[g1(c) for c in proof.h_coms],
            batch_claimed=[int(v) for v in proof.batch_claimed],
            batch_h=g1(proof.batch_h),
            z_shifted_claimed=int(proof.z_shifted_claimed),
            z_shifted_h=g1(proof.z_shifted_h),
        )

    # -- helpers -------------------------------------------------------------
    def _absorb_point(self, ts, name: str, p: AffinePoint):
        """Absorb the CANONICAL coordinate limbs — exactly what the host
        MiMCTranscript absorbs (backend/transcript.point_limbs). The
        canonical-form assertion pins the unique encoding so a witness
        cannot grind the challenge through a +p alias."""
        fp = self.curve.fp
        x = fp.reduce(p.x)
        y = fp.reduce(p.y)
        fp.assert_canonical(x)
        fp.assert_canonical(y)
        ts.bind(name, x.limbs)
        ts.bind(name, y.limbs)

    def _bind_const_point(self, ts, name: str, host_pt):
        """vk commitments are circuit constants; bind their host limbs."""
        ts.bind(name, point_limbs(None, host_pt))

    def _pow(self, base, e: int):
        api = self.api
        acc = None
        for b in bin(e)[2:]:
            acc = api.mul(acc, acc) if acc is not None else None
            if acc is None:
                acc = base
                continue
            if b == "1":
                acc = api.mul(acc, base)
        return acc

    # -- the verifier --------------------------------------------------------
    def assert_proof(self, proof: PlonkVerifierProof, public_inputs) -> None:
        """Constrain the proof valid for the native public inputs
        (≙ backend/plonk/verify.py replayed in-circuit)."""
        api = self.api
        q = self.q
        vk = self.vk
        c = self.curve
        n = 1 << vk.log_n
        omega, k1, k2 = vk.omega, vk.k1, vk.k2
        n_bits = bn254.R.bit_length()

        for pt in (*proof.lro, proof.z_com, *proof.h_coms,
                   proof.batch_h, proof.z_shifted_h):
            c.assert_on_curve(pt)  # BN254 G1 cofactor 1

        # ---- transcript replay (native MiMC, ≙ MiMCTranscript) ------------
        ts = NamedTranscript(api, q, _CHALLENGES)
        for nm in ("s1", "s2", "s3", "ql", "qr", "qm", "qo", "qk"):
            self._bind_const_point(ts, "gamma", vk.commitments[nm])
        ts.bind("gamma", list(public_inputs))
        for cm in proof.lro:
            self._absorb_point(ts, "gamma", cm)
        gamma = ts.compute_challenge("gamma")
        beta = ts.compute_challenge("beta")
        self._absorb_point(ts, "alpha", proof.z_com)
        alpha = ts.compute_challenge("alpha")
        for cm in proof.h_coms:
            self._absorb_point(ts, "zeta", cm)
        zeta = ts.compute_challenge("zeta")

        lin_z, l_z, r_z, o_z, s1_z, s2_z = proof.batch_claimed
        zu = proof.z_shifted_claimed

        # ---- linearization constant at ζ (all native) ---------------------
        zeta_n = self._pow(zeta, n)
        zh_zeta = api.sub(zeta_n, 1)

        def lagrange_at(j: int):
            wj = pow(omega, j, q)
            den = api.mul(api.sub(zeta, wj), n)
            return api.mul(api.mul(wj, zh_zeta), api.inverse(den))

        pi = 0
        for j, pv in enumerate(public_inputs):
            pi = api.add(pi, api.mul(pv, lagrange_at(j)))
        l1_zeta = api.mul(zh_zeta, api.inverse(api.mul(api.sub(zeta, 1), n)))
        alpha2_l1 = api.mul(api.mul(alpha, alpha), l1_zeta)

        cprod = api.mul(
            api.add(l_z, api.mul(beta, s1_z), gamma),
            api.add(r_z, api.mul(beta, s2_z), gamma),
        )
        const_lin = api.mul(api.mul(cprod, api.add(o_z, gamma)),
                            api.mul(alpha, zu))
        const_lin = api.add(api.sub(const_lin, alpha2_l1), pi)
        api.assert_is_equal(api.add(lin_z, const_lin), 0)

        # ---- linearized polynomial digest (emulated MSM) ------------------
        s1_coef = api.mul(api.mul(cprod, beta), api.mul(alpha, zu))
        bz = api.mul(beta, zeta)
        idp = api.add(l_z, bz, gamma)
        idp = api.mul(idp, api.add(r_z, api.mul(bz, k1), gamma))
        idp = api.mul(idp, api.add(o_z, api.mul(bz, k2), gamma))
        z_coef = api.sub(alpha2_l1, api.mul(alpha, idp))
        rl = api.mul(l_z, r_z)
        zeta_n2 = self._pow(zeta, n + 2)
        neg_zh = api.sub(0, zh_zeta)
        h1_coef = neg_zh
        h2_coef = api.mul(neg_zh, zeta_n2)
        h3_coef = api.mul(h2_coef, zeta_n2)

        def smul(pt, scalar_native):
            return c.scalar_mul(pt, c.fr.from_native(scalar_native), n_bits)

        lin_digest = c.constant_point(vk.commitments["qk"])  # scalar 1
        for nm, s in (("ql", l_z), ("qr", r_z), ("qm", rl), ("qo", o_z)):
            host_pt = vk.commitments[nm]
            if host_pt is None:
                continue  # zero selector column: s·O = O
            lin_digest = c.add_unified(
                lin_digest, smul(c.constant_point(host_pt), s))
        lin_digest = c.add_unified(
            lin_digest, smul(c.constant_point(vk.commitments["s3"]), s1_coef))
        lin_digest = c.add_unified(lin_digest, smul(proof.z_com, z_coef))
        for h_pt, s in zip(proof.h_coms, (h1_coef, h2_coef, h3_coef)):
            lin_digest = c.add_unified(lin_digest, smul(h_pt, s))

        # ---- fold the batch opening with the KZG γ challenge --------------
        # (≙ kzg.FoldProof's deriveGamma: point, digests, claimed values,
        # then the shifted opening's claimed value)
        fts = NamedTranscript(api, q, ["gamma"])
        fts.bind("gamma", [zeta])
        self._absorb_point(fts, "gamma", lin_digest)
        for cm in proof.lro:
            self._absorb_point(fts, "gamma", cm)
        for nm in ("s1", "s2"):
            self._bind_const_point(fts, "gamma", vk.commitments[nm])
        fts.bind("gamma", list(proof.batch_claimed))
        fts.bind("gamma", [zu])
        gamma_kzg = fts.compute_challenge("gamma")

        digests = [lin_digest, *proof.lro,
                   c.constant_point(vk.commitments["s1"]),
                   c.constant_point(vk.commitments["s2"])]
        fold_c = None
        fold_v = 0
        gi = 1  # native accumulator of γ^i
        for d, v in zip(digests, proof.batch_claimed):
            term = d if gi == 1 else smul(d, gi)
            fold_c = term if fold_c is None else c.add_unified(fold_c, term)
            fold_v = api.add(fold_v, api.mul(gi, v))
            gi = api.mul(gi, gamma_kzg)

        # ---- fold both openings with u into one pairing check -------------
        uts = NamedTranscript(api, q, ["u"])
        uts.bind("u", [gamma_kzg])
        self._absorb_point(uts, "u", proof.batch_h)
        self._absorb_point(uts, "u", proof.z_shifted_h)
        u = uts.compute_challenge("u")

        def opening_f(com, z_native, val_native, w_pt):
            """F = C − val·G + z·W for one KZG claim."""
            vg = c.scalar_mul_base(c.fr.from_native(val_native), n_bits)
            zw = c.scalar_mul(w_pt, c.fr.from_native(z_native), n_bits)
            return c.add_unified(c.add_unified(com, c.neg(vg)), zw)

        f1 = opening_f(fold_c, zeta, fold_v, proof.batch_h)
        zw_native = api.mul(zeta, omega)
        f2 = opening_f(proof.z_com, zw_native, proof.z_shifted_claimed,
                       proof.z_shifted_h)
        u_em = c.fr.from_native(u)
        f_all = c.add_unified(f1, c.scalar_mul(f2, u_em, n_bits))
        w_all = c.add_unified(
            proof.batch_h,
            c.scalar_mul(proof.z_shifted_h, u_em, n_bits),
        )
        self.pairing.assert_pairing_check([
            ((f_all.x, f_all.y), self._g2_gen),
            ((c.neg(w_all).x, c.neg(w_all).y), self._g2_tau),
        ])
