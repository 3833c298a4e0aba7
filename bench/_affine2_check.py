"""CPU validation of the Fp2 (G2) affine wave primitives: TCurve2.batch_inv2
and one affine_add_masked call vs host Fp2/EC math (no MSM while_loop — the
full G2 MSM graph is pathological to compile on XLA-CPU).

Run: python -u bench/_affine2_check.py
"""
import jax

jax.config.update("jax_platforms", "cpu")
import random

import numpy as np
import jax.numpy as jnp

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.curves.tower import Fp2
from gnark_icicle_tpu.ops.field import field_for
from gnark_icicle_tpu.ops.ec_t import TCurve2

FP = field_for(bn254.P)
G2_B3 = bn254.G2_B * 3
tc = TCurve2(FP, -1, (G2_B3.c0, G2_B3.c1))
K = FP.K
R = 1 << (16 * K)
rng = random.Random(5)


def enc(vals):
    """host ints -> (K, N) Montgomery limb plane"""
    mont = [v * R % bn254.P for v in vals]
    return jnp.asarray(
        [[(m >> (16 * i)) & 0xFFFF for m in mont] for i in range(K)],
        jnp.int32,
    )


def dec(plane):
    a = np.asarray(plane)
    out = []
    for j in range(a.shape[1]):
        m = sum(int(a[i, j]) << (16 * i) for i in range(K))
        out.append(m * pow(R, -1, bn254.P) % bn254.P)
    return out


# 1. batch_inv2 at odd width
n = 19
c0s = [rng.randrange(1, bn254.P) for _ in range(n)]
c1s = [rng.randrange(bn254.P) for _ in range(n)]
inv = tc.batch_inv2((enc(c0s), enc(c1s)), use_pallas=False)
i0, i1 = dec(inv[0]), dec(inv[1])
for j in range(n):
    a = Fp2(bn254.TOWER, c0s[j], c1s[j])
    w = a.inv()
    assert (i0[j], i1[j]) == (w.c0, w.c1), j
print("batch_inv2 ok", flush=True)

# 2. one affine_add_masked wave: generic add, doubling, P+(-P), identity
#    lane, masked lane — all in one call
g = bn254.G2.generator
P1 = bn254.G2.scalar_mul(g, 7)
P2 = bn254.G2.scalar_mul(g, 11)
P3 = bn254.G2.scalar_mul(g, 13)
lanes_acc = [P1, P2, P3, None, P1]     # lane 3: identity accumulator
lanes_q = [P2, P2, P3, P3, P2]         # lane 1: doubling; lane 2: P+(-P)
signs = [0, 0, 1, 0, 0]                # lane 2 negates q -> P3 + (-P3)
valid = [True, True, True, True, False]  # lane 4 masked off

zero2 = Fp2.zero(bn254.TOWER)
acc_pts = [p if p is not None else ((zero2, zero2)) for p in lanes_acc]
acc = (enc([p[0].c0 for p in acc_pts]), enc([p[0].c1 for p in acc_pts]),
       enc([p[1].c0 for p in acc_pts]), enc([p[1].c1 for p in acc_pts]))
qpl = (enc([p[0].c0 for p in lanes_q]), enc([p[0].c1 for p in lanes_q]),
       enc([p[1].c0 for p in lanes_q]), enc([p[1].c1 for p in lanes_q]))
inf = jnp.asarray([p is None for p in lanes_acc])
vld = jnp.asarray(valid)
sg = jnp.asarray(signs, jnp.int32)

out, out_inf = tc.affine_add_masked(acc, inf, qpl, vld, sg,
                                    use_pallas=False)
o = [dec(pl) for pl in out]
oi = np.asarray(out_inf)

want = [
    bn254.G2.add(P1, P2),          # generic
    bn254.G2.scalar_mul(g, 22),    # doubling
    None,                          # P3 - P3
    P3,                            # identity + q
    P1,                            # masked: unchanged
]
for j, w in enumerate(want):
    if w is None:
        assert bool(oi[j]), j
        continue
    assert not bool(oi[j]), j
    got = ((o[0][j], o[1][j]), (o[2][j], o[3][j]))
    wt = ((w[0].c0, w[0].c1), (w[1].c0, w[1].c1))
    assert got == wt, (j, got, wt)
print("affine2 add ok", flush=True)
