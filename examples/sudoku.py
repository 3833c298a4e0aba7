"""Sudoku example: prove knowledge of a solution to a public challenge grid.

≙ reference examples/sudoku/sudoku_example_test.go:20-100 — same statement
(cell ranges, row/column/box uniqueness, challenge consistency) with a
cheaper uniqueness encoding than the reference's 2,916 AssertIsDifferent
pairs: each cell v ∈ 1..9 maps to 16^v (4 selects off its range-check
bits, computed once per cell), and a 9-cell group is a permutation of
1..9 iff Σ 16^v == Σ_{v=1..9} 16^v — base-16 digits can accumulate at
most 9 < 16 contributions, so no carries occur and digit-wise equality
forces exactly one of each value. 758 constraints vs 22,437 for the
pairwise encoding.
Run: python examples/sudoku.py
"""

import os
import sys

if os.environ.get("JAX_PLATFORMS") == "cpu":  # honor the env var even though
    import jax                                # site config pins the platform

    jax.config.update("jax_platforms", "cpu")

import random
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.backend import groth16


class Sudoku(Circuit):
    challenge = Public(shape=(9, 9))   # 0 = blank cell
    solution = Secret(shape=(9, 9))

    def define(self, api):
        sol = self.solution
        ch = self.challenge
        target = sum(16 ** v for v in range(1, 10))
        # 1. every cell in 1..9, and its 16^v encoding from the same bits
        enc = [[None] * 9 for _ in range(9)]
        for i in range(9):
            for j in range(9):
                v = sol[i][j]
                api.assert_is_less_or_equal(v, 9)
                api.assert_is_less_or_equal(1, v)
                bits = api.to_binary(v, 4)
                p = None
                for k, bit in enumerate(bits):
                    f = api.add(1, api.mul(bit, 16 ** (1 << k) - 1))
                    p = f if p is None else api.mul(p, f)
                enc[i][j] = p
        # 2-4. rows / columns / boxes are permutations of 1..9
        groups = []
        for i in range(9):
            groups.append([enc[i][j] for j in range(9)])
            groups.append([enc[j][i] for j in range(9)])
        for br in range(3):
            for bc in range(3):
                groups.append([
                    enc[br * 3 + a // 3][bc * 3 + a % 3] for a in range(9)
                ])
        for g in groups:
            api.assert_is_equal(api.add(*g), target)
        # 5. solution matches the challenge where given
        for i in range(9):
            for j in range(9):
                blank = api.is_zero(ch[i][j])
                api.assert_is_equal(
                    api.select(blank, sol[i][j], ch[i][j]), sol[i][j]
                )


SOLUTION = [
    [5, 3, 4, 6, 7, 8, 9, 1, 2],
    [6, 7, 2, 1, 9, 5, 3, 4, 8],
    [1, 9, 8, 3, 4, 2, 5, 6, 7],
    [8, 5, 9, 7, 6, 1, 4, 2, 3],
    [4, 2, 6, 8, 5, 3, 7, 9, 1],
    [7, 1, 3, 9, 2, 4, 8, 5, 6],
    [9, 6, 1, 5, 3, 7, 2, 8, 4],
    [2, 8, 7, 4, 1, 9, 6, 3, 5],
    [3, 4, 5, 2, 8, 6, 1, 7, 9],
]


def main():
    rng = random.Random(9)
    challenge = [
        [v if rng.random() < 0.4 else 0 for v in row] for row in SOLUTION
    ]
    t0 = time.time()
    cs = compile_circuit(bn254.R, Sudoku)
    print(f"compiled {cs.nb_constraints} constraints "
          f"in {time.time()-t0:.1f}s")
    w = Sudoku(challenge=challenge, solution=SOLUTION)
    pub, sec = w.witness_values(bn254.R)
    pk, vk = groth16.setup(cs, bn254.BN254, rng=random.Random(1),
                           engine="host")
    proof = groth16.prove(cs, pk, pub, sec, bn254.BN254,
                          rng=random.Random(2), engine="host")
    groth16.verify(proof, vk, pub, bn254.BN254)
    print("sudoku solution proven and verified")
    # a wrong solution must not prove
    bad = [row[:] for row in SOLUTION]
    bad[0][0], bad[0][1] = bad[0][1], bad[0][0]
    wbad = Sudoku(challenge=challenge, solution=bad)
    pub_b, sec_b = wbad.witness_values(bn254.R)
    try:
        groth16.prove(cs, pk, pub_b, sec_b, bn254.BN254,
                      rng=random.Random(3), engine="host")
        raise SystemExit("BUG: invalid solution proved")
    except Exception:
        print("invalid solution rejected at solve time")


if __name__ == "__main__":
    main()
