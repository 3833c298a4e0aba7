"""NTT vs naive host DFT; round-trips; coset pipeline (computeH shape)."""

import random

import numpy as np
import pytest

from gnark_icicle_tpu.curves import BN254
from gnark_icicle_tpu.ops.field import LimbField
from gnark_icicle_tpu.ops.ntt import Domain, domain_for, bitrev_indices

FR = BN254.fr
F = LimbField(FR.modulus)


def _naive_dft(coeffs, omega, q):
    n = len(coeffs)
    return [
        sum(coeffs[j] * pow(omega, i * j, q) for j in range(n)) % q
        for i in range(n)
    ]


@pytest.mark.parametrize("log_n", [0, 1, 3, 5])
def test_ntt_matches_naive(log_n):
    q = FR.modulus
    n = 1 << log_n
    rng = random.Random(log_n)
    coeffs = [rng.randrange(q) for _ in range(n)]
    dom = domain_for(F, FR, log_n)
    got = F.decode(np.asarray(dom.ntt(F.encode(coeffs))))
    assert got == _naive_dft(coeffs, dom.omega, q)


@pytest.mark.parametrize("log_n", [4, 6])
def test_roundtrips(log_n):
    q = FR.modulus
    n = 1 << log_n
    rng = random.Random(100 + log_n)
    vals = [rng.randrange(q) for _ in range(n)]
    dom = domain_for(F, FR, log_n)
    X = F.encode(vals)

    # natural->natural
    assert F.decode(np.asarray(dom.intt(dom.ntt(X)))) == vals
    # the rev-form pairing used by provers: no permutation materialized
    rev = dom.intt_nat_to_rev(X)
    back = dom.ntt_rev_to_nat(rev)
    assert F.decode(np.asarray(back)) == vals


def test_rev_order_consistency():
    log_n = 3
    n = 1 << log_n
    q = FR.modulus
    rng = random.Random(5)
    vals = [rng.randrange(q) for _ in range(n)]
    dom = domain_for(F, FR, log_n)
    X = F.encode(vals)
    import jax.numpy as jnp

    rev_out = np.asarray(dom.ntt_nat_to_rev(jnp.array(X)))  # donated copy
    nat_out = np.asarray(dom.ntt(X))
    perm = bitrev_indices(n)
    assert np.array_equal(rev_out[perm], nat_out)


@pytest.mark.parametrize("log_n", [4])
def test_coset_pipeline(log_n):
    """The Groth16 computeH inner shape: intt -> coset ntt -> ops -> coset intt.

    Checks that coset evaluation really evaluates p at g*omega^i and that the
    coset round-trip is the identity (reference flow: icicle.go:488-510).
    """
    q = FR.modulus
    n = 1 << log_n
    rng = random.Random(7)
    coeffs = [rng.randrange(q) for _ in range(n)]
    dom = domain_for(F, FR, log_n, coset=True)
    g = FR.multiplicative_generator

    C = F.encode(coeffs)
    # natural coeffs -> pretend they're bitrev by permuting: use intt pairing
    # instead: start from evaluations of the poly on the plain domain.
    evals = dom.ntt(C)
    coeffs_rev = dom.intt_nat_to_rev(evals)
    coset_evals = dom.coset_ntt_rev_in(coeffs_rev)
    want = [
        sum(coeffs[j] * pow(g, j, q) * pow(dom.omega, i * j, q) for j in range(n)) % q
        for i in range(n)
    ]
    assert F.decode(np.asarray(coset_evals)) == want

    # coset round-trip back to bitrev coeffs
    back_rev = dom.coset_intt_nat_to_rev(coset_evals)
    perm = bitrev_indices(n)
    got = np.asarray(back_rev)[perm]
    assert F.decode(got) == coeffs


@pytest.mark.parametrize("log_n", [0, 1, 4, 6])
def test_transposed_butterflies_bit_exact(log_n):
    """The transposed (K, lanes) stage engine must match the (N, K) path
    bit-for-bit — both DIF and DIT, forward and inverse twiddles, with a
    batch dim (the 4-step parallel NTT shape)."""
    import jax.numpy as jnp

    q = FR.modulus
    n = 1 << log_n
    rng = random.Random(100 + log_n)
    dom = domain_for(F, FR, log_n)
    vals = [rng.randrange(q) for _ in range(2 * n)]
    x = jnp.asarray(F.encode(vals)).reshape(2, n, F.K)  # batch of 2
    for tw, key in ((dom.tw_fwd, "f"), (dom.tw_inv, "i")):
        for dif in (True, False):
            got = dom._butterflies_t(x, tw, dif=dif)
            saved = dom._use_t
            dom._use_t = False
            try:
                want = dom._dif(x, tw, key) if dif else dom._dit(x, tw, key)
            finally:
                dom._use_t = saved
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("log_n", [6, 9])
def test_four_step_matches_domain(log_n):
    """The chunked 4-step engine (big-N path) must match the monolithic
    Domain transform bit-for-bit, fwd and inverse."""
    from gnark_icicle_tpu.ops.ntt import FourStepNTT

    q = FR.modulus
    n = 1 << log_n
    rng = random.Random(400 + log_n)
    vals = [rng.randrange(q) for _ in range(n)]
    dom = domain_for(F, FR, log_n)
    fs = FourStepNTT(F, log_n, FR.root_of_unity(log_n), n_chunks=4)
    X = F.encode(vals)
    import jax.numpy as jnp

    got = np.asarray(fs.ntt(jnp.asarray(X)))
    want = np.asarray(dom.ntt(jnp.asarray(X)))
    np.testing.assert_array_equal(got, want)
    back = np.asarray(fs.intt(jnp.asarray(got)))
    np.testing.assert_array_equal(back, X)
