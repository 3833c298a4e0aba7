"""In-circuit PLONK verifier over emulated BN254 (same-curve recursion).

Role parity: reference std/recursion/plonk (verifier.go — AssertProof:
in-circuit transcript replay, quotient identity at ζ, folded KZG batch
opening). The inner proof must be produced with fs_hash="mimc"
(≙ recursion.NewShort: the inner prover swaps to a hash the outer circuit
can afford), so all Fiat-Shamir challenges replay NATIVELY here — only the
curve points and the final pairing are emulated. The verifying key is
circuit-constant (the reference's "fixed" vk placement).

The two KZG openings (batch at ζ, Z at ωζ) are folded with a
transcript-derived challenge u into ONE two-pair pairing check —
e(F₁ + u·F₂, G₂) · e(−(W₁ + u·W₂), τG₂) == 1 with
Fᵢ = Cᵢ − vᵢ·G + zᵢ·Wᵢ — instead of the host verifier's two independent
checks (≙ kzg.FoldProof/BatchVerifyMultiPoints, the reference's
recursion verifier does the same fold).

Engine-level today like the other pairing-based gadgets (ROADMAP:
range-table emulated mul for compilation).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ...backend.plonk.prove import eval_order_for
from ...curves import bn254
from ..fiat_shamir import CircuitTranscript
from ..sw_emulated import AffinePoint, BN254G1, EmulatedCurve
from ..pairing_bn254 import BN254Pairing

_CHALLENGES = ["beta", "gamma", "alpha", "zeta", "v", "u"]


@dataclass
class PlonkVerifierProof:
    """Gadget-side PLONK proof (≙ recursion/plonk.Proof). Points are
    emulated G1 witnesses; evaluations are NATIVE Fr variables."""

    a_com: AffinePoint
    b_com: AffinePoint
    c_com: AffinePoint
    z_com: AffinePoint
    t_coms: list                 # 3 AffinePoints
    evals: dict                  # name -> native var
    z_omega_eval: object         # native var
    batch_proof: AffinePoint     # W₁: batched opening at ζ
    z_omega_proof: AffinePoint   # W₂: Z opening at ωζ


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
        self.order = eval_order_for(0)

    # -- witness constructors ------------------------------------------------
    def proof_witness(self, proof) -> PlonkVerifierProof:
        """Bind a host Proof's values as gadget witnesses (engine path)."""
        fp = self.curve.fp

        def g1(pt):
            return AffinePoint(fp.constant(pt[0]), fp.constant(pt[1]))

        return PlonkVerifierProof(
            a_com=g1(proof.a_com), b_com=g1(proof.b_com),
            c_com=g1(proof.c_com), z_com=g1(proof.z_com),
            t_coms=[g1(c) for c in proof.t_coms],
            evals={k: int(v) for k, v in proof.evals.items()},
            z_omega_eval=int(proof.z_omega_eval),
            batch_proof=g1(proof.batch_proof),
            z_omega_proof=g1(proof.z_omega_proof),
        )

    # -- helpers -------------------------------------------------------------
    def _absorb_point(self, ts: CircuitTranscript, name: str, p: AffinePoint):
        """Absorb the REDUCED coordinate limbs — exactly what the host
        MiMCTranscript absorbs (backend/transcript.point_limbs)."""
        fp = self.curve.fp
        ts.bind(name, fp.reduce(p.x).limbs)
        ts.bind(name, fp.reduce(p.y).limbs)

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
        (≙ backend/plonk/verify.py:22 replayed in-circuit)."""
        api = self.api
        q = self.q
        vk = self.vk
        c = self.curve
        n = 1 << vk.log_n
        omega, k1, k2 = vk.omega, vk.k1, vk.k2

        for pt in (proof.a_com, proof.b_com, proof.c_com, proof.z_com,
                   *proof.t_coms, proof.batch_proof, proof.z_omega_proof):
            c.assert_on_curve(pt)  # BN254 G1 cofactor 1

        # ---- transcript replay (native MiMC, ≙ MiMCTranscript) ------------
        ts = CircuitTranscript(api, q, _CHALLENGES)
        ts.bind("beta", list(public_inputs))
        for cm in (proof.a_com, proof.b_com, proof.c_com):
            self._absorb_point(ts, "beta", cm)
        beta = ts.compute_challenge("beta")
        gamma = ts.compute_challenge("gamma")
        self._absorb_point(ts, "alpha", proof.z_com)
        alpha = ts.compute_challenge("alpha")
        for cm in proof.t_coms:
            self._absorb_point(ts, "zeta", cm)
        zeta = ts.compute_challenge("zeta")
        for name in self.order:
            ts.bind("v", [proof.evals[name]])
        ts.bind("v", [proof.z_omega_eval])
        v_ch = ts.compute_challenge("v")

        # ---- quotient identity at ζ (all native) --------------------------
        e = proof.evals
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

        gate = api.add(
            api.mul(e["ql"], e["a"]), api.mul(e["qr"], e["b"]),
            api.mul(api.mul(e["qm"], e["a"]), e["b"]),
            api.mul(e["qo"], e["c"]), e["qk"], pi,
        )
        bz = api.mul(beta, zeta)
        lhs = api.add(e["a"], bz, gamma)
        lhs = api.mul(lhs, api.add(e["b"], api.mul(bz, k1), gamma))
        lhs = api.mul(lhs, api.add(e["c"], api.mul(bz, k2), gamma))
        lhs = api.mul(lhs, e["z"])
        rhs = api.add(e["a"], api.mul(beta, e["s1"]), gamma)
        rhs = api.mul(rhs, api.add(e["b"], api.mul(beta, e["s2"]), gamma))
        rhs = api.mul(rhs, api.add(e["c"], api.mul(beta, e["s3"]), gamma))
        rhs = api.mul(rhs, proof.z_omega_eval)
        perm = api.sub(lhs, rhs)
        start = api.mul(l1_zeta, api.sub(e["z"], 1))

        shard_pow = self._pow(zeta, n + 2)
        t_zeta = api.add(
            e["t1"], api.mul(shard_pow, e["t2"]),
            api.mul(api.mul(shard_pow, shard_pow), e["t3"]),
        )
        identity = api.add(gate, api.mul(alpha, perm),
                           api.mul(api.mul(alpha, alpha), start))
        api.assert_is_equal(identity, api.mul(t_zeta, zh_zeta))

        # ---- fold the batched opening at ζ --------------------------------
        com_w = {
            "a": proof.a_com, "b": proof.b_com, "c": proof.c_com,
            "z": proof.z_com, "t1": proof.t_coms[0], "t2": proof.t_coms[1],
            "t3": proof.t_coms[2],
        }
        fold_c = None
        fold_v = 0
        vi = 1  # native accumulator of v^i
        n_bits = bn254.R.bit_length()
        for name in self.order:
            if name in com_w:
                base = com_w[name]
            else:
                host_pt = vk.commitments[name]
                if host_pt is None:  # zero selector column: vi·O = O
                    fold_v = api.add(fold_v, api.mul(vi, e[name]))
                    vi = api.mul(vi, v_ch)
                    continue
                base = c.constant_point(host_pt)
            term = c.scalar_mul(base, c.fr.from_native(vi), n_bits)
            fold_c = term if fold_c is None else c.add_unified(fold_c, term)
            fold_v = api.add(fold_v, api.mul(vi, e[name]))
            vi = api.mul(vi, v_ch)

        # ---- fold both openings with u into one pairing check -------------
        self._absorb_point(ts, "u", proof.batch_proof)
        self._absorb_point(ts, "u", proof.z_omega_proof)
        u = ts.compute_challenge("u")

        def opening_f(com, z_native, val_native, w_pt):
            """F = C − val·G + z·W for one KZG claim."""
            vg = c.scalar_mul_base(c.fr.from_native(val_native), n_bits)
            zw = c.scalar_mul(w_pt, c.fr.from_native(z_native), n_bits)
            return c.add_unified(c.add_unified(com, c.neg(vg)), zw)

        f1 = opening_f(fold_c, zeta, fold_v, proof.batch_proof)
        zw_native = api.mul(zeta, omega)
        f2 = opening_f(proof.z_com, zw_native, proof.z_omega_eval,
                       proof.z_omega_proof)
        u_em = c.fr.from_native(u)
        f_all = c.add_unified(f1, c.scalar_mul(f2, u_em, n_bits))
        w_all = c.add_unified(
            proof.batch_proof,
            c.scalar_mul(proof.z_omega_proof, u_em, n_bits),
        )
        self.pairing.assert_pairing_check([
            ((f_all.x, f_all.y), self._g2_gen),
            ((c.neg(w_all).x, c.neg(w_all).y), self._g2_tau),
        ])
