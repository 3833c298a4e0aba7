"""Groth16 Prove: witness solve (host) + H polynomial and 4 MSMs (device).

Role parity: reference backend/groth16/bn254/icicle/icicle.go:133-422 (the
accelerated prover this framework's kernels replace) and prove.go:62-331 (CPU
semantics). Flow (≙ SURVEY.md §3.3):

  solve (host)  →  computeH (device: 3 INTT → 3 coset NTT → (a∘b−c)·den →
  coset INTT, h stays on device as MSM scalars)  →  MSM A/B1/B2/K+Z (device)
  →  r,s blinding (host point ops).

Differences from the reference, by design: no infinity filtering before MSM
(in-kernel masks, vs icicle.go:98-109 workaround); h is consumed bit-reversed
against bit-reversed Z points instead of a device ReverseScalars pass
(icicle.go:502-510); the four MSMs are independent jitted dispatches XLA can
queue back-to-back (the single-GPU reference serializes them, icicle.go:399).
"""

from __future__ import annotations

import secrets

import jax.numpy as jnp

from ...constraint.system import R1CS
from ...constraint.solver import solve
from ...device import DeviceCtx
from ...ops.msm import pick_window
from .keys import ProvingKey, Proof


def _compute_h(ctx: DeviceCtx, a, b, c, log_n: int):
    """(a·b−c)/Z as plain-form scalar limbs, bit-reversed coefficient order.

    ≙ computeH (prove.go:356-399; on-device icicle.go:453-513). On the coset
    g·<ω>, Z(g·ωⁱ) = gⁿ−1 is constant — one Montgomery mul by a scalar
    replaces the reference's `den` vector (icicle.go:500)."""
    q = ctx.curve.fr.modulus
    n = 1 << log_n
    F = ctx.fr_dev

    import numpy as np

    dom = ctx.domain(log_n, coset=True)

    def pad_mont(v):
        if isinstance(v, np.ndarray):
            v = np.pad(v, [(0, n - v.shape[0]), (0, 0)])
        else:
            v = v + [0] * (n - len(v))
        return ctx.fr_mont(v)

    import os
    import time as _time

    timing = os.environ.get("GNARK_TPU_H_TIMING") == "1"

    def _mark(label, val, t0):
        if timing:
            import jax

            jax.block_until_ready(val)
            from ...logger import logger

            logger().info("computeH[%s] %.3fs", label,
                          _time.perf_counter() - t0)
        return _time.perf_counter()

    t0 = _time.perf_counter()
    ea, eb, ec = pad_mont(a), pad_mont(b), pad_mont(c)
    t0 = _mark("pad_mont(a,b,c)", (ea, eb, ec), t0)

    g = ctx.curve.fr.multiplicative_generator
    den = pow((pow(g, n, q) - 1) % q, -1, q)
    den_m = jnp.asarray(F.encode([den])[0])

    def to_coset(e):
        return dom.coset_ntt_rev_in(dom.intt_nat_to_rev(e))

    ca = to_coset(ea)
    t0 = _mark("to_coset(a)", ca, t0)
    cb, cc = to_coset(eb), to_coset(ec)
    t0 = _mark("to_coset(b,c)", (cb, cc), t0)
    h_evals = F.mont_mul(
        F.sub(F.mont_mul(ca, cb), cc), jnp.broadcast_to(den_m, ca.shape)
    )
    t0 = _mark("pointwise", h_evals, t0)
    h_rev = dom.coset_intt_nat_to_rev(h_evals)  # Montgomery, bit-reversed
    out = F.from_mont(h_rev)  # plain limbs = MSM scalar format
    _mark("coset_intt+from_mont", out, t0)
    return out


def _compute_h_sharded(ctx: DeviceCtx, a, b, c, log_n: int, mesh,
                       axis: str = "shard"):
    """(a·b−c)/Z sharded over a device mesh: 4-step ShardedNTT transforms
    with elementwise coset scaling (coset_ntt(e) = NTT(e ∘ gⁱ)). Returns
    the same bit-reversed plain-form limbs as _compute_h — bit-exact, the
    work distributed over the mesh (≙ SURVEY §2.4(c): computeH's 7
    full-domain transforms as sharded super-ops)."""
    import numpy as np

    from ...parallel.ntt import ShardedNTT

    q = ctx.curve.fr.modulus
    n = 1 << log_n
    F = ctx.fr_dev
    dom = ctx.domain(log_n, coset=True)  # coset tables + bit-rev indices
    sntt = ShardedNTT(F, ctx.curve.fr, log_n, mesh, axis)

    def pad_mont(v):
        if isinstance(v, np.ndarray):
            v = np.pad(v, [(0, n - v.shape[0]), (0, 0)])
        else:
            v = v + [0] * (n - len(v))
        return ctx.fr_mont(v)

    ea, eb, ec = pad_mont(a), pad_mont(b), pad_mont(c)
    g = ctx.curve.fr.multiplicative_generator
    den = pow((pow(g, n, q) - 1) % q, -1, q)
    den_m = jnp.asarray(F.encode([den])[0])

    def to_coset(e):
        return sntt.ntt(F.mont_mul(sntt.intt(e), dom.coset_pows))

    ca, cb, cc = to_coset(ea), to_coset(eb), to_coset(ec)
    h_evals = F.mont_mul(
        F.sub(F.mont_mul(ca, cb), cc), jnp.broadcast_to(den_m, ca.shape)
    )
    h_nat = F.mont_mul(sntt.intt(h_evals), dom.coset_inv_pows)
    h_rev = jnp.take(h_nat, dom._rev, axis=0)  # bit-reversed coeff order
    return F.from_mont(h_rev)


class _Checkpoint:
    """Stage checkpointing for preemptible accelerators (SURVEY §5: the
    reference has no mid-proof checkpointing — this is the TPU-slice
    extension). Stages: solve → h → msms; blinding is always fresh so a
    resumed proof is still randomized. Artifacts are bound to the
    (constraint count, domain, public inputs) tuple and ignored on
    mismatch."""

    def __init__(self, directory, binding: bytes):
        import os

        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self.binding = binding
        tag_path = self._p("binding")
        if os.path.exists(tag_path):
            with open(tag_path, "rb") as f:
                if f.read() != binding:  # different proving task: start over
                    for name in os.listdir(directory):
                        os.unlink(os.path.join(directory, name))
        with open(tag_path, "wb") as f:
            f.write(binding)

    def _p(self, name):
        import os

        return os.path.join(self.dir, name)

    def load(self, name):
        import os
        import pickle

        path = self._p(name + ".pkl")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return pickle.load(f)

    def save(self, name, obj):
        import os
        import pickle

        tmp = self._p(name + ".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, self._p(name + ".pkl"))  # atomic vs preemption

    def has(self, name) -> bool:
        import os

        return os.path.exists(self._p(name + ".pkl"))


def prove(cs: R1CS, pk: ProvingKey, public_values, secret_values, curve,
          rng=None, checkpoint_dir: str | None = None,
          engine: str = "device", mesh=None,
          commitment_hash="sha256") -> Proof:
    """Generate a Groth16 proof (≙ groth16.Prove, icicle path).

    checkpoint_dir: if set, persist each prover stage (solve, H, MSMs) so a
    preempted run resumes from the last completed stage.
    engine: "device" (TPU kernels — production sizes) or "host" (pure
    big-int computeH + MSM, ≙ the reference's non-accelerated prover:
    zero compile/dispatch overhead, right for small systems and
    accelerator-less environments).
    mesh: optional jax.sharding.Mesh with one axis named "shard" — the
    device phase then runs SHARDED: computeH through the 4-step ShardedNTT
    and the proof MSMs as concurrent sub-mesh dispatches (≥4 devices) or
    data-parallel over the whole mesh. Bit-exact vs the single-device
    path (same h, same MSM results; blinding from the same rng).
    """
    import time

    from ...logger import logger

    t_start = time.perf_counter()
    q = curve.fr.modulus
    assert engine in ("device", "host")
    ctx = DeviceCtx(curve) if engine == "device" else None
    rand = rng.randrange if rng is not None else (
        lambda m: secrets.randbelow(m - 1) + 1
    )

    # BSB22: replace the placeholder hint with the real Pedersen commitment
    # (≙ solver.OverrideHint in prove.go:82-108 / icicle.go:158-187)
    overrides = None
    commitment_pts = [None] * len(cs.commitments)
    committed_values = [None] * len(cs.commitments)
    if cs.commitments:
        from .. import pedersen
        from ..hash_to_field import (
            COMMITMENT_DST, hash_to_fr, mimc_commitment_hash,
            serialize_commitment,
        )
        from ...constraint import hints as hintlib
        from ...io.serialize import g1_to_bytes

        fr_bytes = (q.bit_length() + 7) // 8

        def bsb22_override(qmod, inputs):
            i = int(inputs[0])
            cinfo = cs.commitments[i]
            rest = inputs[1:]
            hashed = rest[:len(cinfo.public_and_commitment_committed)]
            committed_values[i] = [v % qmod for v in rest[len(hashed):]]
            cm = pedersen.commit(
                curve, pk.commitment_keys[i], committed_values[i]
            )
            commitment_pts[i] = cm
            if (isinstance(commitment_hash, tuple)
                    and commitment_hash[0] == "mimc"):
                # recursion-friendly proof: the outer circuit replays this
                # hash natively (≙ recursion.NewShort via
                # WithProverHashToFieldFunction)
                return [mimc_commitment_hash(
                    commitment_hash[1], qmod, curve.fp.modulus, cm, hashed)]
            if (isinstance(commitment_hash, tuple)
                    and commitment_hash[0] == "evm"):
                # Solidity-verifier-friendly proof: plain digest % r, the
                # hash the exported contract computes in-contract
                from ..hash_to_field import evm_commitment_hash

                return [evm_commitment_hash(
                    commitment_hash[1], qmod, cm, hashed)]
            msg = serialize_commitment(
                g1_to_bytes(curve, cm, compressed=False), hashed, fr_bytes
            )
            return [hash_to_fr(msg, COMMITMENT_DST, qmod)[0]]

        overrides = {hintlib.BSB22_PLACEHOLDER: bsb22_override}

    ck = None
    if checkpoint_dir is not None:
        import hashlib

        nb = (q.bit_length() + 7) // 8  # Fr width (48 bytes on BW6-761)
        binding = hashlib.sha256(
            b"g16ck" + cs.nb_constraints.to_bytes(8, "big")
            + pk.domain_log_n.to_bytes(2, "big")
            # the commitment-hash mode changes the solved commitment wire:
            # a resume across modes must invalidate the saved solve
            + repr(commitment_hash).encode()
            + b"".join(int(v % q).to_bytes(nb, "big") for v in public_values)
            # bind the secret witness too: resuming with different secrets
            # must invalidate the saved solved witness
            + b"|sec|"
            + b"".join(int(v % q).to_bytes(nb, "big") for v in secret_values)
        ).digest()
        ck = _Checkpoint(checkpoint_dir, binding)

    # overlap PK device staging with the host witness solve (SURVEY
    # §2.4(d) explicit async dispatch; ≙ the reference's lazy
    # setupDevicePointers running while the CPU solves, icicle.go:145-150):
    # the staging thread's numpy/jax work releases the GIL, the solve
    # spends its time inside the native core which does too.
    stage_box = {}
    stage_thread = None
    # skip staging when a resumed run already holds the MSM results — the
    # staged arrays would never be read (and the transfer competes with
    # whatever stage comes next on the single axon chip)
    if engine == "device" and not pk._device \
            and not (ck is not None and ck.has("msms")):
        import threading

        def _stage():
            try:
                stage_box["dev"] = pk.device_arrays(ctx)
            except Exception as e:  # re-raised on join
                stage_box["err"] = e

        stage_thread = threading.Thread(target=_stage, daemon=True)
        stage_thread.start()

    res = None
    if ck is not None:
        saved = ck.load("solve")
        if saved is not None:
            res, commitment_pts, committed_values = saved
    if res is None:
        res = solve(cs, public_values, secret_values,
                    hint_overrides=overrides)
        if ck is not None:
            ck.save("solve", (res, commitment_pts, committed_values))
    t_solved = time.perf_counter()
    logger().info("groth16 prove: solve took=%.3fs", t_solved - t_start)

    # proofs of knowledge, folded with the G16-BSB22 challenge
    # (≙ prove.go:121-141)
    commitment_pok = None
    if cs.commitments:
        from ..hash_to_field import G16_FOLD_DST

        poks = [
            pedersen.prove_knowledge(curve, pk.commitment_keys[i],
                                     committed_values[i])
            for i in range(len(cs.commitments))
        ]
        wires_all = res.wires
        msg = b"".join(
            int(wires_all[c.commitment_index]).to_bytes(fr_bytes, "big")
            for c in cs.commitments
        )
        challenge = hash_to_fr(msg, G16_FOLD_DST, q)[0]
        commitment_pok = pedersen.fold_proofs(curve, poks, challenge)

    log_n = pk.domain_log_n
    n = 1 << log_n

    if engine == "host":
        from .host_compute import compute_h_host, msm_host, \
            z_scalars_bitreversed

        h = compute_h_host(res.a, res.b, res.c, log_n, curve.fr)
        wires_i = res.wires
        if cs.commitments:
            excluded = {c.commitment_index for c in cs.commitments}
            for c in cs.commitments:
                excluded.update(c.private_committed)
            priv_i = [wires_i[w] for w in range(cs.nb_public, len(wires_i))
                      if w not in excluded]
        else:
            priv_i = wires_i[cs.nb_public:]
        g1h, g2h = curve.g1, curve.g2
        ar_msm = msm_host(g1h, pk.g1_a, wires_i)
        bs1_msm = msm_host(g1h, pk.g1_b, wires_i)
        bs2_msm = msm_host(g2h, pk.g2_b, wires_i)
        krs_msm = []
        if priv_i:
            krs_msm.append(msm_host(g1h, pk.g1_k, priv_i))
        krs_msm.append(msm_host(
            g1h, pk.g1_z,
            z_scalars_bitreversed(h, log_n, len(pk.g1_z))))
        return _assemble_proof(
            cs, pk, curve, q, rand, ar_msm, bs1_msm, bs2_msm, krs_msm,
            commitment_pts, commitment_pok, logger, t_start, "host",
        )

    # --- device phase (limb arrays straight from the solver — no host
    # bigint conversions on the hot path) ----------------------------------
    h_scalars = ck.load("h") if ck is not None else None
    if h_scalars is None:
        import numpy as np

        if mesh is not None:
            h_scalars = _compute_h_sharded(
                ctx, res.a_u16(), res.b_u16(), res.c_u16(), log_n, mesh
            )
        else:
            h_scalars = _compute_h(
                ctx, res.a_u16(), res.b_u16(), res.c_u16(), log_n
            )
        if ck is not None:
            h_scalars = np.asarray(h_scalars)
            ck.save("h", h_scalars)
    try:
        h_scalars.block_until_ready()
    except AttributeError:
        pass
    t_h = time.perf_counter()
    logger().info("groth16 prove: computeH took=%.3fs", t_h - t_solved)

    if stage_thread is not None:
        stage_thread.join()
        if "err" in stage_box:
            raise stage_box["err"]
        dev = stage_box["dev"]
    elif ck is not None and ck.has("msms"):
        dev = None  # resumed past the MSM stage: the PK is never read
    else:
        dev = pk.device_arrays(ctx)
    t_pk = time.perf_counter()
    logger().info("groth16 prove: pk staging took=%.3fs (overlapped)",
                  t_pk - t_h)
    wires_u16 = res.wires_u16()
    wires = ctx.fr_scalars(wires_u16)
    nw = wires_u16.shape[0]
    if cs.commitments:
        # pk.K excludes commitment wires and committed private wires
        # (their K points became vk.K entries / Pedersen bases)
        import numpy as np

        excluded = {c.commitment_index for c in cs.commitments}
        for c in cs.commitments:
            excluded.update(c.private_committed)
        k_idx = np.array(
            [w for w in range(cs.nb_public, nw) if w not in excluded],
            dtype=np.int64,
        )
        priv_u16 = wires_u16[k_idx]
    else:
        priv_u16 = wires_u16[cs.nb_public:]
    priv_wires = ctx.fr_scalars(priv_u16)
    nb_priv = priv_u16.shape[0]

    msms = ck.load("msms") if ck is not None else None
    if msms is None and mesh is not None:
        # sharded MSMs: concurrent sub-mesh dispatches when the mesh is
        # wide enough (the reference's 4-goroutine fan-out, prove.go:310,
        # as mesh-level parallelism), else data-parallel on the full mesh
        from ...parallel.pipeline import (
            dispatch_msm, pipelined_groth16_msms, split_submeshes,
        )

        devices = list(mesh.devices.flat)
        if len(devices) >= 4:
            share = len(devices) // 4
            meshes = split_submeshes(
                devices,
                {"a": share, "b1": share, "b2": share,
                 "hk": len(devices) - 3 * share},
            )
            out = pipelined_groth16_msms(
                ctx, meshes, dev, wires, priv_wires, h_scalars
            )
        else:
            out = {
                "ar": dispatch_msm(ctx.msm_g1, mesh, dev["a"][0],
                                   dev["a"][1], wires),
                "bs1": dispatch_msm(ctx.msm_g1, mesh, dev["b1"][0],
                                    dev["b1"][1], wires),
                "bs2": dispatch_msm(ctx.msm_g2, mesh, dev["b2"][0],
                                    dev["b2"][1], wires),
            }
            if nb_priv > 0:
                out["krs_k"] = dispatch_msm(ctx.msm_g1, mesh, dev["k"][0],
                                            dev["k"][1], priv_wires)
            out["krs_z"] = dispatch_msm(ctx.msm_g1, mesh, dev["z"][0],
                                        dev["z"][1], h_scalars)
        krs_parts = [out[k] for k in ("krs_k", "krs_z") if k in out]
        msms = (
            ctx.g1_to_host(out["ar"]), ctx.g1_to_host(out["bs1"]),
            ctx.g2_to_host(out["bs2"]),
            [ctx.g1_to_host(p) for p in krs_parts],
        )
        if ck is not None:
            ck.save("msms", msms)
    if msms is None:
        # pad operands to one shared (shape, window) jit signature —
        # n=35/37/64 would otherwise compile three separate MSM kernels
        # (minutes each on XLA-CPU; the MULTICHIP_r03 timeout). Production
        # sizes pad to 1024-multiples (≤0.1% extra identity rows) so the
        # A/B1/K MSMs share one compiled kernel.
        from ...parallel.pipeline import _pad_msm_inputs

        def _msm(kern, pts, inf, scal):
            pts, inf, scal = _pad_msm_inputs(pts, inf, scal, 1)
            return kern.msm(pts, inf, scal, pick_window(scal.shape[0]))

        import os as _os

        if _os.environ.get("GNARK_TPU_BATCH_MSM", "0") == "1":
            # one dispatch set for every equal-padded-size G1 operand
            # (A/B1/K always coincide; Z joins when the domain pads to the
            # wire count): msm_batch stacks problems into the global
            # window axis so they share the wave while_loop — M× fewer
            # per-wave dispatches, the dominant cost of the prover's
            # small-N MSMs (PERF_NOTES round-5 2-chain teardown).
            # ≙ ICICLE MSM cfg.BatchSize (one launch, many MSMs).
            g1_ops = [("ar", dev["a"], wires), ("bs1", dev["b1"], wires)]
            if nb_priv > 0:
                g1_ops.append(("k", dev["k"], priv_wires))
            g1_ops.append(("z", dev["z"], h_scalars))
            padded = {}
            for name, (pts, inf), scal in g1_ops:
                padded[name] = _pad_msm_inputs(pts, inf, scal, 1)
            groups: dict = {}
            for name, (pts, inf, scal) in padded.items():
                groups.setdefault(scal.shape[0], []).append(
                    (name, pts, inf, scal))
            res = {}
            for n_pad, grp in groups.items():
                if len(grp) == 1:
                    name, pts, inf, scal = grp[0]
                    res[name] = ctx.msm_g1.msm(
                        pts, inf, scal, pick_window(n_pad))
                    continue
                import jax as _jx

                stacked_pts = _jx.tree.map(
                    lambda *ls: jnp.stack(ls), *[g[1] for g in grp])
                out = ctx.msm_g1.msm_batch(
                    stacked_pts,
                    jnp.stack([g[2] for g in grp]),
                    jnp.stack([g[3] for g in grp]),
                    pick_window(n_pad),
                )
                for m, (name, *_rest) in enumerate(grp):
                    res[name] = _jx.tree.map(lambda a, m=m: a[m], out)
            ar_dev, bs1_dev = res["ar"], res["bs1"]
            krs_parts = [res[k] for k in ("k", "z") if k in res]
            bs2_dev = _msm(ctx.msm_g2, dev["b2"][0], dev["b2"][1], wires)
        else:
            ar_dev = _msm(ctx.msm_g1, dev["a"][0], dev["a"][1], wires)
            bs1_dev = _msm(ctx.msm_g1, dev["b1"][0], dev["b1"][1], wires)
            bs2_dev = _msm(ctx.msm_g2, dev["b2"][0], dev["b2"][1], wires)
            krs_parts = []
            if nb_priv > 0:
                krs_parts.append(
                    _msm(ctx.msm_g1, dev["k"][0], dev["k"][1], priv_wires)
                )
            krs_parts.append(
                _msm(ctx.msm_g1, dev["z"][0], dev["z"][1], h_scalars)
            )
        msms = (
            ctx.g1_to_host(ar_dev), ctx.g1_to_host(bs1_dev),
            ctx.g2_to_host(bs2_dev), [ctx.g1_to_host(p) for p in krs_parts],
        )
        if ck is not None:
            ck.save("msms", msms)
    ar_msm, bs1_msm, bs2_msm, krs_msm = msms
    logger().info(
        "groth16 prove: msms (incl. wire staging) took=%.3fs",
        time.perf_counter() - t_pk,
    )

    import jax as _jax

    return _assemble_proof(
        cs, pk, curve, q, rand, ar_msm, bs1_msm, bs2_msm, krs_msm,
        commitment_pts, commitment_pok, logger, t_start,
        _jax.default_backend(),
    )


def _assemble_proof(cs, pk, curve, q, rand, ar_msm, bs1_msm, bs2_msm,
                    krs_msm, commitment_pts, commitment_pok, logger,
                    t_start, backend_name):
    """Blinding + final point assembly (host side for BOTH engines;
    toxic randomness r, s never leaves the host)."""
    import time

    g1, g2 = curve.g1, curve.g2
    r = rand(q)
    s = rand(q)

    # Ar = α + Σw·A + r·δ
    ar = g1.add(g1.add(pk.g1_alpha, ar_msm), g1.scalar_mul(pk.g1_delta, r))
    # Bs (G2) = β + Σw·B + s·δ
    bs = g2.add(g2.add(pk.g2_beta, bs2_msm), g2.scalar_mul(pk.g2_delta, s))
    # Bs1 (G1 shadow of Bs) for Krs
    bs1 = g1.add(g1.add(pk.g1_beta, bs1_msm), g1.scalar_mul(pk.g1_delta, s))
    # Krs = Σ_priv w·K + h·Z + s·Ar + r·Bs1 − r·s·δ
    krs = None
    for p in krs_msm:
        krs = g1.add(krs, p)
    krs = g1.add(krs, g1.scalar_mul(ar, s))
    krs = g1.add(krs, g1.scalar_mul(bs1, r))
    krs = g1.add(krs, g1.scalar_mul(pk.g1_delta, (-r * s) % q))

    logger().info(
        "groth16 prove: curve=%s constraints=%d took=%.3fs (acceleration=%s)",
        curve.name, cs.nb_constraints, time.perf_counter() - t_start,
        backend_name,
    )  # ≙ icicle.go:412 structured "done" log
    return Proof(ar=ar, krs=krs, bs=bs, commitments=commitment_pts,
                 commitment_pok=commitment_pok)
