"""Derive + verify every BLS12-377 / BW6-761 constant offline.

The 2-chain constants baked into curves/bls12_377.py and curves/bw6_761.py
are DERIVED here from first principles (no network, no copied tables):

- BLS12-377: p, r from the BLS12 polynomial parametrization of the seed
  x = 0x8508c00000000001 (t = x+1, r = x⁴−x²+1, p = (x−1)²·r/3 + x).
- Curve orders over Fp / Fp2 from the Frobenius trace (Cornacchia's
  algorithm solves 4p = t² + 3y² for the CM discriminant −3 family to
  enumerate the six twist orders; the right one is picked by r-divisibility
  and verified by killing random points).
- BW6-761: p is documented in the reference comments
  (std/math/emulated/emparams/emparams.go:236); r = p_BLS377 is the
  2-chain property. Orders/cofactors derived the same Cornacchia way.
- Generators: smallest-x lift, cofactor-cleared, order-r checked. (gnark's
  canonical generators differ only by choice; any order-r point generates
  the same protocol — byte-level fixture interop would need the canonical
  ones, which are unavailable offline. Candidate canonical values are
  tried first and used when they verify.)

Run: python tools/derive_2chain.py   (pure host Python, a few seconds)
"""

import sys


def sqrt_mod(a, p):
    """Tonelli-Shanks."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # general case
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c, t, r = i, b * b % p, t * b * b % p, r * b % p
    return r


def cornacchia_3(p):
    """Solve 4p = t² + 3y² (CM discriminant −3). Returns (t, y) with t>0."""
    # solve x² ≡ −3 (mod 4p) via x² ≡ −3 mod p then CRT parity fix
    r = sqrt_mod(-3 % p, p)
    assert r is not None
    if r % 2 == 0:
        r = p - r  # make r odd so r² ≡ -3 mod 4 holds (r odd ⇒ r²≡1≡-3 mod4)
    # lattice reduction: run Euclid on (2p, r) until below 2√p
    a, b = 2 * p, r
    import math

    lim = math.isqrt(4 * p)
    while b > lim:
        a, b = b, a % b
    t = b
    rem = 4 * p - t * t
    assert rem % 3 == 0
    y2 = rem // 3
    y = math.isqrt(y2)
    assert y * y == y2, "not representable"
    return t, y


def six_orders(p, t, y):
    """The six possible orders of y²=x³+b over Fp (j=0 sextic twists)."""
    return [
        p + 1 - t,
        p + 1 + t,
        p + 1 - (t + 3 * y) // 2,
        p + 1 + (t + 3 * y) // 2,
        p + 1 - (t - 3 * y) // 2,
        p + 1 + (t - 3 * y) // 2,
    ]


def curve_order(p, b, orders, trials=4):
    """Which of the candidate orders annihilates random points of
    y² = x³ + b over Fp."""
    import random

    rng = random.Random(0xC0FFEE)

    def lift(xx):
        rhs = (pow(xx, 3, p) + b) % p
        yy = sqrt_mod(rhs, p)
        return None if yy is None else (xx, yy)

    def mul(n, P):
        # affine double-and-add (slow but fine here)
        R = None
        Q = P
        while n:
            if n & 1:
                R = add(R, Q)
            Q = add(Q, Q)
            n >>= 1
        return R

    def add(P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2 and (y1 + y2) % p == 0:
            return None
        if P == Q:
            lam = 3 * x1 * x1 * pow(2 * y1, -1, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
        x3 = (lam * lam - x1 - x2) % p
        return (x3, (lam * (x1 - x3) - y1) % p)

    cands = list(orders)
    for _ in range(trials):
        P = None
        while P is None:
            P = lift(rng.randrange(p))
        cands = [n for n in cands if mul(n, P) is None]
        if len(cands) == 1:
            return cands[0]
    assert cands, "no candidate order survived"
    return cands[0]


def is_prime(n):
    """Deterministic-enough Miller-Rabin for our sizes."""
    import random

    if n < 2:
        return False
    for sp in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % sp == 0:
            return n == sp
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    rng = random.Random(1)
    for _ in range(40):
        a = rng.randrange(2, n - 1)
        v = pow(a, d, n)
        if v in (1, n - 1):
            continue
        for _ in range(s - 1):
            v = v * v % n
            if v == n - 1:
                break
        else:
            return False
    return True


def two_adicity(n):
    v = 0
    while n % 2 == 0:
        n //= 2
        v += 1
    return v


def smallest_generator(p):
    """Smallest multiplicative generator of Fp* (p−1 factored enough by
    trial division + the big prime cofactor check)."""
    n = p - 1
    fac = set()
    m = n
    for d in range(2, 100000):
        while m % d == 0:
            fac.add(d)
            m //= d
        if d * d > m:
            break
    if m > 1:
        fac.add(m)  # treat the (possibly composite) cofactor as one block
    for g in range(2, 1000):
        if all(pow(g, n // f, p) != 1 for f in fac):
            return g
    raise AssertionError


def ec_add(p, P, Q):
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2 and (y1 + y2) % p == 0:
        return None
    if P == Q:
        lam = 3 * x1 * x1 * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    return (x3, (lam * (x1 - x3) - y1) % p)


def ec_mul(p, n, P):
    R = None
    while n:
        if n & 1:
            R = ec_add(p, R, P)
        P = ec_add(p, P, P)
        n >>= 1
    return R


def derive_g1_generator(p, b, h, r, candidates=()):
    """Order-r G1 point: try candidate canonical coords first, else lift the
    smallest x and clear the cofactor."""
    for (cx, cy) in candidates:
        if (cy * cy - cx**3 - b) % p == 0:
            P = (cx, cy)
            if ec_mul(p, r, P) is None:
                return P, True
    x = 0
    while True:
        rhs = (x**3 + b) % p
        y = sqrt_mod(rhs, p)
        if y is not None and y != 0:
            P = ec_mul(p, h, (x, min(y, p - y)))
            if P is not None and ec_mul(p, r, P) is None:
                return P, False
        x += 1


# ---------------------------------------------------------------------------
# Fp2 arithmetic for the BLS12-377 G2 side (u² = −5)
# ---------------------------------------------------------------------------
class F2:
    __slots__ = ("p", "beta", "c0", "c1")

    def __init__(self, p, beta, c0, c1):
        self.p, self.beta = p, beta
        self.c0, self.c1 = c0 % p, c1 % p

    def _new(self, c0, c1):
        return F2(self.p, self.beta, c0, c1)

    def __add__(self, o):
        return self._new(self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o):
        return self._new(self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self):
        return self._new(-self.c0, -self.c1)

    def __mul__(self, o):
        if isinstance(o, int):
            return self._new(self.c0 * o, self.c1 * o)
        a, b, c, d = self.c0, self.c1, o.c0, o.c1
        return self._new(a * c + self.beta * b * d, a * d + b * c)

    def inv(self):
        a, b = self.c0, self.c1
        n = (a * a - self.beta * b * b) % self.p
        ni = pow(n, -1, self.p)
        return self._new(a * ni, -b * ni)

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1

    def is_zero(self):
        return self.c0 == 0 and self.c1 == 0

    def sqrt(self):
        """Square root in Fp2 (complex method), p ≡ 3 mod 4 style general:
        use the norm: if x = a+bu, N(x)=a²−βb²; solve via Fp sqrt."""
        p = self.p
        if self.is_zero():
            return self
        n = (self.c0 * self.c0 - self.beta * self.c1 * self.c1) % p
        sn = sqrt_mod(n, p)
        if sn is None:
            return None
        for s in (sn, p - sn):
            a2 = (self.c0 + s) * pow(2, -1, p) % p
            sa = sqrt_mod(a2, p)
            if sa is None:
                continue
            if sa == 0:
                continue
            b = self.c1 * pow(2 * sa, -1, p) % p
            cand = self._new(sa, b)
            if cand * cand == self:
                return cand
        return None


def ec2_add(P, Q):
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2 and (y1 + y2).is_zero():
        return None
    if x1 == x2 and y1 == y2:
        lam = (x1 * x1 * 3) * (y1 * 2).inv()
    else:
        lam = (y2 - y1) * (x2 - x1).inv()
    x3 = lam * lam - x1 - x2
    return (x3, lam * (x1 - x3) - y1)


def ec2_mul(n, P):
    R = None
    while n:
        if n & 1:
            R = ec2_add(R, P)
        P = ec2_add(P, P)
        n >>= 1
    return R


def main():
    import math

    x = 0x8508C00000000001
    r377 = x**4 - x**2 + 1
    assert (x - 1) ** 2 * r377 % 3 == 0
    p377 = ((x - 1) ** 2 * r377) // 3 + x
    print("== BLS12-377 ==")
    print("x_seed =", hex(x))
    print("r =", r377, f"({r377.bit_length()}b, prime={is_prime(r377)})")
    print("p =", p377, f"({p377.bit_length()}b, prime={is_prime(p377)})")
    print("r 2-adicity =", two_adicity(r377 - 1),
          " gen =", smallest_generator(r377))
    print("p 2-adicity =", two_adicity(p377 - 1),
          " gen =", smallest_generator(p377))

    # G1: y² = x³ + 1, trace t = x+1
    t = x + 1
    n1 = p377 + 1 - t
    assert n1 % r377 == 0
    h1 = n1 // r377
    # sanity: Cornacchia agrees some twist order == n1
    tc, yc = cornacchia_3(p377)
    assert n1 in six_orders(p377, tc, yc)
    print("G1 order = h1*r, h1 =", h1)
    cand_g1 = [(
        81937999373150964239938255573465948239988671502647976594219695644855304257327692006745978603320413799295628339695,
        241266749859715473739788878240585681733927191168601896383759122102112907357779751001206799952863815012735208165030,
    )]
    G1, canonical = derive_g1_generator(p377, 1, h1, r377, cand_g1)
    print("G1 gen =", G1, "(candidate verified)" if canonical else "(derived)")

    # Fp2 = Fp[u]/(u² + 5): check −5 is a non-residue
    assert pow(-5 % p377, (p377 - 1) // 2, p377) == p377 - 1
    beta = -5
    # D-twist: y² = x³ + 1/u  (b' = b/ξ with ξ = u, b = 1)
    inv_u = F2(p377, beta, 0, 1).inv()
    print("b_twist = 1/u =", (inv_u.c0, inv_u.c1))
    # expected from reference sw_bls12377/pairing2.go:381
    assert inv_u.c0 == 0 and inv_u.c1 == 155198655607781456406391640216936120121836107652948796323930557600032281009004493664981332883744016074664192874906

    # E'(Fp2) order: Frobenius² trace t2 = t²−2p is exact, so the twist
    # volume f2 comes straight from 4p² = t2² + 3f2²
    t2 = t * t - 2 * p377
    f2sq, rem = divmod(4 * p377 * p377 - t2 * t2, 3)
    assert rem == 0
    yc2 = math.isqrt(f2sq)
    assert yc2 * yc2 == f2sq
    tc2 = t2

    def lift2(xx):
        X = F2(p377, beta, xx, 0)
        rhs = X * X * X + inv_u
        return rhs.sqrt()

    orders2 = six_orders(p377 * p377, tc2, yc2)
    # find a point on the twist and the order that kills it
    xx = 0
    P2 = None
    while P2 is None:
        y2v = lift2(xx)
        if y2v is not None and not y2v.is_zero():
            P2 = (F2(p377, beta, xx, 0), y2v)
            break
        xx += 1
    surv = [n for n in orders2 if ec2_mul(n, P2) is None]
    assert len(surv) >= 1, "no twist order matched"
    n2 = surv[0]
    assert n2 % r377 == 0, "twist order not divisible by r — wrong twist?"
    h2 = n2 // r377
    print("G2 order = h2*r, h2 bits =", h2.bit_length())
    cand_g2 = [(
        (233578398248691099356572568220835526895379068987715365179118596935057653620464273615301663571204657964920925606294,
         140913150380207355837477652521042157274541796891053068589147167627541651775299824604154852141315666357241556069118),
        (63160294768292073209381361943935198908131692476676907196754037919244929611450776219210369229519898517858833747423,
         149157405641012693445398062341192467754805999074082136895788947234480009303640899064710353187729182149407503257491),
    )]
    G2 = None
    for (cx, cy) in cand_g2:
        X = F2(p377, beta, *cx)
        Y = F2(p377, beta, *cy)
        if (Y * Y == X * X * X + inv_u) and ec2_mul(r377, (X, Y)) is None:
            G2 = (X, Y)
            print("G2 gen = candidate verified")
            break
    if G2 is None:
        xx = 0
        while True:
            X = F2(p377, beta, xx, 1)
            rhs = X * X * X + inv_u
            Y = rhs.sqrt()
            if Y is not None and not Y.is_zero():
                Pt = ec2_mul(h2, (X, Y))
                if Pt is not None and ec2_mul(r377, Pt) is None:
                    G2 = Pt
                    print("G2 gen = derived:",
                          (G2[0].c0, G2[0].c1), (G2[1].c0, G2[1].c1))
                    break
            xx += 1

    # == BW6-761 ==
    print("== BW6-761 ==")
    p761 = 6891450384315732539396789682275657542479668912536150109513790160209623422243491736087683183289411687640864567753786613451161759120554247759349511699125301598951605099378508850372543631423596795951899700429969112842764913119068299
    r761 = p377
    print("p =", f"{p761.bit_length()}b, prime={is_prime(p761)}")
    print("p 2-adicity =", two_adicity(p761 - 1),
          " gen =", smallest_generator(p761))
    tb, yb = cornacchia_3(p761)
    orders6 = six_orders(p761, tb, yb)
    nb1 = curve_order(p761, -1, orders6)   # G1: y² = x³ − 1
    nb2 = curve_order(p761, 4, orders6)    # G2: y² = x³ + 4
    print("order(b=-1) % r =", nb1 % r761, " order(b=4) % r =", nb2 % r761)
    assert nb1 % r761 == 0 and nb2 % r761 == 0
    hb1, hb2 = nb1 // r761, nb2 // r761
    print("h1 bits =", hb1.bit_length(), " h2 bits =", hb2.bit_length())
    # sextic nonresidue for Fp6 = Fp[w]/(w⁶ − γ): γ = −4 must be a
    # non-square and non-cube so the M-twist map lands on y²=x³+4
    g = -4 % p761
    assert pow(g, (p761 - 1) // 2, p761) != 1, "-4 is a square"
    assert p761 % 3 == 1 and pow(g, (p761 - 1) // 3, p761) != 1, "-4 is a cube"
    print("γ = −4 is a valid sextic non-residue")
    GB1, c1 = derive_g1_generator(p761, -1, hb1, r761, [])
    print("BW6 G1 gen =", GB1)
    GB2, c2 = derive_g1_generator(p761, 4, hb2, r761, [])
    print("BW6 G2 gen =", GB2)
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
