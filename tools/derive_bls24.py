"""Derive every BLS24-315 constant from the in-tree-pinned invariants.

PARITY memo (PARITY.md round-5): seed, moduli, tower (u²=13, v²=u) and
GLV λ/ω are pinned by the reference tree; the curve is pinned up to
isomorphism (b=1 is the smallest coefficient with the correct order);
generators are NOT pinned anywhere — this script derives DETERMINISTIC
ones (smallest-x valid points, cofactor-cleared, order-asserted) and
prints the constant block pasted into curves/bls24_315.py.

Run:  python tools/derive_bls24.py   (pure host integer math)
"""

import math

X = -0xbfcfffff
R = X**8 - X**4 + 1
P = (X - 1)**2 * R // 3 + X
T = X + 1
B = 1
N1 = P + 1 - T
H1 = N1 // R
assert H1 * R == N1

# ---------------------------------------------------------------------------
# Fp4 = Fp[u]/(u²−13), then [v]/(v²−u): elements as 4-tuples
# (a0 + a1 u) + (a2 + a3 u) v
# ---------------------------------------------------------------------------
U_SQ = 13


def f4_add(a, b):
    return tuple((x + y) % P for x, y in zip(a, b))


def f4_sub(a, b):
    return tuple((x - y) % P for x, y in zip(a, b))


def f2_mul(a0, a1, b0, b1):
    m0 = a0 * b0 % P
    m1 = a1 * b1 % P
    m2 = (a0 + a1) * (b0 + b1) % P
    return (m0 + U_SQ * m1) % P, (m2 - m0 - m1) % P


def f4_mul(a, b):
    # (A0 + A1 v)(B0 + B1 v) = A0B0 + u·A1B1 + (A0B1 + A1B0) v, v² = u
    a0, a1, a2, a3 = a
    b0, b1, b2, b3 = b
    c0, c1 = f2_mul(a0, a1, b0, b1)
    d0, d1 = f2_mul(a2, a3, b2, b3)
    # u·(d0 + d1 u) = 13 d1 + d0 u
    lo = ((c0 + U_SQ * d1) % P, (c1 + d0) % P)
    s0, s1 = f2_mul(a0, a1, b2, b3)
    t0, t1 = f2_mul(a2, a3, b0, b1)
    hi = ((s0 + t0) % P, (s1 + t1) % P)
    return (lo[0], lo[1], hi[0], hi[1])


def f4_pow(a, e):
    res = (1, 0, 0, 0)
    while e:
        if e & 1:
            res = f4_mul(res, a)
        a = f4_mul(a, a)
        e >>= 1
    return res


def f4_is_zero(a):
    return all(c % P == 0 for c in a)


Q4 = P**4


def f4_sqrt(a):
    """Tonelli–Shanks in Fp4 (group order Q4 − 1)."""
    if f4_is_zero(a):
        return (0, 0, 0, 0)
    if f4_pow(a, (Q4 - 1) // 2) != (1, 0, 0, 0):
        return None
    q, s = Q4 - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    # find a non-residue
    z = None
    for c0 in range(2, 50):
        for cand in ((c0, 1, 0, 0), (c0, 0, 1, 0), (c0, 1, 1, 1)):
            if f4_pow(cand, (Q4 - 1) // 2) != (1, 0, 0, 0):
                z = cand
                break
        if z:
            break
    m, c = s, f4_pow(z, q)
    t, r_ = f4_pow(a, q), f4_pow(a, (q + 1) // 2)
    one = (1, 0, 0, 0)
    while t != one:
        i, t2 = 0, t
        while t2 != one:
            t2 = f4_mul(t2, t2)
            i += 1
        b = c
        for _ in range(m - i - 1):
            b = f4_mul(b, b)
        m, c = i, f4_mul(b, b)
        t = f4_mul(t, c)
        r_ = f4_mul(r_, b)
    return r_


def main():
    # G1 generator: smallest x with a curve point; clear cofactor
    def sqrt_fp(a):
        if pow(a, (P - 1) // 2, P) != 1:
            return None
        # P % 4 check
        if P % 4 == 3:
            return pow(a, (P + 1) // 4, P)
        # generic Tonelli
        q, s = P - 1, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        z = 2
        while pow(z, (P - 1) // 2, P) != P - 1:
            z += 1
        m, c = s, pow(z, q, P)
        t, r_ = pow(a, q, P), pow(a, (q + 1) // 2, P)
        while t != 1:
            i, t2 = 0, t
            while t2 != 1:
                t2 = t2 * t2 % P
                i += 1
            b = pow(c, 1 << (m - i - 1), P)
            m, c = i, b * b % P
            t, r_ = t * c % P, r_ * b % P
        return r_

    def ec_mul_fp(pt, k):
        def add(Pp, Qq):
            if Pp is None:
                return Qq
            if Qq is None:
                return Pp
            if Pp[0] == Qq[0]:
                if (Pp[1] + Qq[1]) % P == 0:
                    return None
                lam = 3 * Pp[0] * Pp[0] * pow(2 * Pp[1], -1, P) % P
            else:
                lam = (Qq[1] - Pp[1]) * pow(Qq[0] - Pp[0], -1, P) % P
            xr = (lam * lam - Pp[0] - Qq[0]) % P
            return (xr, (lam * (Pp[0] - xr) - Pp[1]) % P)

        res, acc = None, pt
        while k:
            if k & 1:
                res = add(res, acc)
            acc = add(acc, acc)
            k >>= 1
        return res

    g1 = None
    for x in range(1, 200):
        rhs = (x * x * x + B) % P
        y = sqrt_fp(rhs)
        if y is None:
            continue
        cand = ec_mul_fp((x, min(y, P - y)), H1)
        if cand is not None and ec_mul_fp(cand, R) is None:
            g1 = cand
            break
    print("G1_GEN =", g1)
    assert ec_mul_fp(g1, R) is None

    # G2: sextic twists y² = x³ + b·v and b/v over Fp4; the one with the
    # r-divisible order (p⁴+1 − (3f+t4)/2, derived in PARITY memo)
    t2_ = T * T - 2 * P
    t4 = t2_ * t2_ - 2 * P * P
    f2v = (4 * P**4 - t4 * t4) // 3
    f = math.isqrt(f2v)
    assert f * f == f2v
    n2 = P**4 + 1 - (3 * f + t4) // 2
    assert n2 % R == 0
    h2 = n2 // R
    print("H2 =", hex(h2))

    v = (0, 0, 1, 0)          # the Fp4 element v
    v_inv = f4_pow(v, Q4 - 2)
    bv = tuple(c * B % P for c in v)
    bvi = tuple(c * B % P for c in v_inv)

    def ec_mul_f4(pt, k, b4):
        def add(Pp, Qq):
            if Pp is None:
                return Qq
            if Qq is None:
                return Pp
            if Pp[0] == Qq[0]:
                if f4_is_zero(f4_add(Pp[1], Qq[1])):
                    return None
                num = tuple(3 * c % P for c in f4_mul(Pp[0], Pp[0]))
                den = tuple(2 * c % P for c in Pp[1])
            else:
                num = f4_sub(Qq[1], Pp[1])
                den = f4_sub(Qq[0], Pp[0])
            lam = f4_mul(num, f4_pow(den, Q4 - 2))
            xr = f4_sub(f4_sub(f4_mul(lam, lam), Pp[0]), Qq[0])
            return (xr, f4_sub(f4_mul(lam, f4_sub(Pp[0], xr)), Pp[1]))

        res, acc = None, pt
        while k:
            if k & 1:
                res = add(res, acc)
            acc = add(acc, acc)
            k >>= 1
        return res

    def find_g2(b4):
        for c0 in range(0, 60):
            for c1 in range(0, 4):
                xx = (c0, c1, 0, 0)
                rhs = f4_add(f4_mul(f4_mul(xx, xx), xx), b4)
                y = f4_sqrt(rhs)
                if y is None:
                    continue
                pt = (xx, y)
                # order of the full twist group must be n2 for the right
                # twist; cofactor-clear and check order r
                if ec_mul_f4(pt, n2, b4) is not None:
                    return None  # wrong twist (order doesn't annihilate)
                g = ec_mul_f4(pt, h2, b4)
                if g is not None and ec_mul_f4(g, R, b4) is None:
                    return g
        return None

    for name, b4 in (("b*v", bv), ("b/v", bvi)):
        g2 = find_g2(b4)
        print("twist", name, "->", "FOUND" if g2 else "no")
        if g2:
            print("G2_B =", b4)
            print("G2_GEN_X =", g2[0])
            print("G2_GEN_Y =", g2[1])
            break


if __name__ == "__main__":
    main()
