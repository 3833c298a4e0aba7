"""Security/concurrency regression analogs.

1. GHSA-9xcg-3q8v-7fq6 (commitment hiding): a BSB22 commitment to a
   low-entropy secret must not let a verifier brute-force the secret from
   the proof's commitment point. Reference:
   internal/security_tests/advisory-9xcg/advisory_test.go:24 (the attack is
   guessed·basis[0] == proof.Commitments[0]). The fix (there and here) is a
   random hiding mask appended to every committed set — this test runs the
   actual attack against a real proof AND demonstrates red-team teeth by
   disabling the mask and confirming the attack then succeeds.

2. issue1048 (hint execution under solver parallelism): with the OpenMP
   level solver, hints must (a) run strictly in instruction order with
   deterministic error reporting, and (b) never observe partially-solved
   wire state from the parallel R1C batches of their own or earlier levels.
   Reference: internal/regression_tests/issue1048/issue1048_test.go (two
   controllable hints; with one task the first hint's error always wins).
   Our solver intentionally keeps hints host-sequential between OpenMP
   level batches (native.py solve_native), so the first-in-instruction-order
   failing hint must win every time.
"""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.constraint import hints as hintlib
from gnark_icicle_tpu.constraint.solver import solve, UnsatisfiedConstraintError
from gnark_icicle_tpu.backend import groth16

CURVE = bn254.BN254
Q = CURVE.fr.modulus
BOUND = 1024  # ten bits of entropy, as in the reference test


class LowEntropyCommit(Circuit):
    """≙ advisory-9xcg's Circuit: commit to one low-entropy secret."""

    x = Secret()
    p = Public()

    def define(self, api):
        c = api.commit(self.x)
        api.assert_is_different(c, 0)
        api.assert_is_different(self.x, 0)
        api.assert_is_equal(self.p, 1)


def _commitment_attack(pk, proof, bound=BOUND):
    """The GHSA-9xcg brute force: guess·basis[0] == proof.commitments[0]?
    Returns the recovered secret or None."""
    basis0 = pk.commitment_keys[0].basis[0]
    target = proof.commitments[0]
    for guess in range(bound):
        if guess == 0:
            pt = None
        else:
            pt = bn254.G1.scalar_mul(basis0, guess)
        if pt == target:
            return guess
    return None


def _prove_low_entropy(secret):
    cs = compile_circuit(Q, LowEntropyCommit)
    pk, vk = groth16.setup(cs, CURVE, rng=random.Random(42))
    proof = groth16.prove(cs, pk, [1], [secret], CURVE,
                          rng=random.Random(43), engine="host")
    groth16.verify(proof, vk, [1], CURVE)  # raises on failure
    return pk, proof


def test_advisory_9xcg_commitment_is_hiding():
    secret = random.Random(7).randrange(1, BOUND)
    pk, proof = _prove_low_entropy(secret)
    recovered = _commitment_attack(pk, proof)
    assert recovered is None, (
        f"GHSA-9xcg: secret witness {recovered} recovered from the "
        "proof's commitment — the hiding mask is missing or ineffective"
    )


def test_advisory_9xcg_attack_has_teeth(monkeypatch):
    """Red-team control: with the hiding mask forced to zero (the broken
    pre-advisory behavior), the same attack MUST recover the secret —
    proving the positive test above actually exercises the attack."""
    monkeypatch.setitem(hintlib._REGISTRY, hintlib.RANDOMIZE,
                        lambda q, inputs: [0])
    secret = random.Random(9).randrange(1, BOUND)
    pk, proof = _prove_low_entropy(secret)
    recovered = _commitment_attack(pk, proof)
    assert recovered == secret, (
        "the attack failed to recover the secret even without the mask — "
        "the hiding test is not exercising the real attack surface"
    )


# ---------------------------------------------------------------------------
# issue1048 analog
# ---------------------------------------------------------------------------

WIDE = 600  # > the 512-constraint native-solver threshold, one wide level


class HintOrderCircuit(Circuit):
    """Two failing hints astride a wide (OpenMP-parallel) R1C level."""

    a = Secret()
    s = Public()

    def define(self, api):
        h1 = api.new_hint(FAIL1, 1, self.a)[0]
        acc = api.mul(self.a, self.a)
        for i in range(WIDE):
            # independent muls: one wide dependency level
            api.assert_is_equal(api.mul(self.a, i + 1),
                                api.mul(self.a, i + 1))
        h2 = api.new_hint(FAIL2, 1, self.a)[0]
        # keep hint outputs alive
        api.assert_is_equal(api.mul(h1, 0), api.mul(h2, 0))
        api.assert_is_equal(self.s, self.a)


def _fail1(q, inputs):
    raise RuntimeError("hint controllable 1")


def _fail2(q, inputs):
    raise RuntimeError("hint controllable 2")


FAIL1 = hintlib.register_hint(_fail1, "test.fail1")
FAIL2 = hintlib.register_hint(_fail2, "test.fail2")


@pytest.mark.parametrize("native", [False, True])
def test_issue1048_first_hint_error_wins(native):
    """Whichever parallelism the level solver uses, the FIRST failing hint
    in instruction order must produce the error, deterministically."""
    cs = compile_circuit(Q, HintOrderCircuit)
    for _ in range(5):
        with pytest.raises(UnsatisfiedConstraintError) as ei:
            solve(cs, [3], [3], native=native)
        assert "hint controllable 1" in str(ei.value), (
            "a later hint's failure surfaced before an earlier one — "
            "hint execution order is not deterministic under the "
            f"{'native OpenMP' if native else 'python'} solver"
        )


class HintProbeCircuit(Circuit):
    """A hint whose inputs are produced by a wide parallel level; the hint
    itself checks it observed fully-solved values."""

    a = Secret()
    s = Public()

    def define(self, api):
        # one wide level of independent products w_i = a·(a+i)
        ws = [api.mul(self.a, api.add(self.a, i)) for i in range(WIDE)]
        outs = api.new_hint(PROBE, 1, *ws)
        api.assert_is_equal(api.mul(outs[0], 0), 0)
        api.assert_is_equal(self.s, self.a)


_probe_expected = {}


def _probe(q, inputs):
    a = _probe_expected["a"]
    for i, v in enumerate(inputs):
        want = a * (a + i) % q
        if int(v) != want:
            raise RuntimeError(
                f"hint observed PARTIAL state: input {i} = {v}, want {want}"
            )
    return [1]


PROBE = hintlib.register_hint(_probe, "test.probe_full_state")


@pytest.mark.parametrize("native", [False, True])
def test_issue1048_hint_never_sees_partial_state(native):
    """Adversarial probe: the hint validates every input against the host
    recomputation; any torn/unsolved wire from the OpenMP batch fails."""
    cs = compile_circuit(Q, HintProbeCircuit)
    a = 1234567
    _probe_expected["a"] = a
    for _ in range(5):
        # the probe raises on any partial observation; solving through
        # proves every input it saw was final
        solve(cs, [a], [a], native=native)
