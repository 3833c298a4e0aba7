"""zk-rollup example: EdDSA-authorized transfers against a MiMC Merkle
account tree, proven with Groth16 on the device kernels.

≙ reference examples/rollup/ (circuit.go — eddsa transfer signatures +
merkle account inclusion + balance updates; operator.go — the host-side
state machine). Accounts are leaves H(pub.x, pub.y, balance, nonce); one
proof attests root_before → root_after for a batch of transfers.

Run: python examples/rollup.py
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.curves import twisted_edwards as te
from gnark_icicle_tpu.frontend import Circuit, Public, Secret
from gnark_icicle_tpu.std.hash.mimc import MiMC, MiMCHost
from gnark_icicle_tpu.std.merkle import verify_proof, MerkleTreeHost
from gnark_icicle_tpu.std.eddsa import verify_signature

Q = bn254.R
DEPTH = 2  # 4 accounts (keep the example provable in minutes; scale freely)


def account_leaf_host(pub, balance, nonce):
    h = MiMCHost(Q)
    h.write(pub[0], pub[1], balance, nonce)
    return h.h


def transfer_msg_host(sender_pub, receiver_pub, amount, nonce):
    h = MiMCHost(Q)
    h.write(sender_pub[0], receiver_pub[0], amount, nonce)
    return h.h


class TransferCircuit(Circuit):
    """One rollup transfer (the reference batches these; batch = repeat)."""

    root_before = Public()
    root_after = Public()

    sender_pub_x = Secret()
    sender_pub_y = Secret()
    receiver_pub_x = Secret()
    receiver_pub_y = Secret()
    sender_balance = Secret()
    sender_nonce = Secret()
    receiver_balance = Secret()
    receiver_nonce = Secret()
    amount = Secret()
    # signature
    sig_rx = Secret()
    sig_ry = Secret()
    sig_s = Secret()
    # merkle paths: sender against root_before, receiver against root_mid
    sender_sibs = Secret(shape=DEPTH)
    sender_dirs = Secret(shape=DEPTH)
    receiver_sibs = Secret(shape=DEPTH)
    receiver_dirs = Secret(shape=DEPTH)

    def _leaf(self, api, px, py, bal, nonce):
        h = MiMC(api, Q)
        h.write(px, py, bal, nonce)
        return h.sum()

    def _root(self, api, leaf, sibs, dirs):
        cur = leaf
        for sib, bit in zip(sibs, dirs):
            api.assert_is_boolean(bit)
            left = api.select(bit, sib, cur)
            right = api.select(bit, cur, sib)
            h = MiMC(api, Q)
            h.write(left, right)
            cur = h.sum()
        return cur

    def define(self, api):
        sender_pub = (self.sender_pub_x, self.sender_pub_y)
        receiver_pub = (self.receiver_pub_x, self.receiver_pub_y)

        # 1. the sender authorized this transfer
        h = MiMC(api, Q)
        h.write(self.sender_pub_x, self.receiver_pub_x, self.amount,
                self.sender_nonce)
        msg = h.sum()
        verify_signature(api, Q, sender_pub, (self.sig_rx, self.sig_ry),
                         self.sig_s, msg)

        # 2. funds are sufficient (64-bit balances)
        api.assert_is_less_or_equal(self.amount, self.sender_balance)

        # 3. sender pre-state is in root_before
        sender_leaf = self._leaf(api, self.sender_pub_x, self.sender_pub_y,
                                 self.sender_balance, self.sender_nonce)
        root = self._root(api, sender_leaf, self.sender_sibs,
                          self.sender_dirs)
        api.assert_is_equal(root, self.root_before)

        # 4. sender post-state defines the mid root
        sender_after = self._leaf(
            api, self.sender_pub_x, self.sender_pub_y,
            api.sub(self.sender_balance, self.amount),
            api.add(self.sender_nonce, 1),
        )
        root_mid = self._root(api, sender_after, self.sender_sibs,
                              self.sender_dirs)

        # 5. receiver pre-state is in root_mid; post-state gives root_after
        recv_leaf = self._leaf(api, self.receiver_pub_x, self.receiver_pub_y,
                               self.receiver_balance, self.receiver_nonce)
        root2 = self._root(api, recv_leaf, self.receiver_sibs,
                           self.receiver_dirs)
        api.assert_is_equal(root2, root_mid)
        recv_after = self._leaf(
            api, self.receiver_pub_x, self.receiver_pub_y,
            api.add(self.receiver_balance, self.amount),
            self.receiver_nonce,
        )
        root3 = self._root(api, recv_after, self.receiver_sibs,
                           self.receiver_dirs)
        api.assert_is_equal(root3, self.root_after)


class Operator:
    """Host rollup operator: accounts, state tree, witness assembly
    (≙ examples/rollup/operator.go)."""

    def __init__(self, n_accounts: int = 1 << DEPTH):
        self.keys = [te.generate_key(f"acct{i}".encode())
                     for i in range(n_accounts)]
        self.balances = [1000] * n_accounts
        self.nonces = [0] * n_accounts
        self.tree = MerkleTreeHost(Q, [
            account_leaf_host(self.keys[i].public, self.balances[i],
                              self.nonces[i])
            for i in range(n_accounts)
        ])

    def transfer(self, frm: int, to: int, amount: int) -> "TransferCircuit":
        """Execute + build the witness for one transfer."""
        kp = self.keys[frm]
        root_before = self.tree.root
        msg = transfer_msg_host(kp.public, self.keys[to].public, amount,
                                self.nonces[frm])
        R, s = te.sign(kp, msg)

        sender_sibs, sender_dirs = self.tree.proof(frm)
        w = dict(
            root_before=root_before,
            sender_pub_x=kp.public[0], sender_pub_y=kp.public[1],
            receiver_pub_x=self.keys[to].public[0],
            receiver_pub_y=self.keys[to].public[1],
            sender_balance=self.balances[frm],
            sender_nonce=self.nonces[frm],
            receiver_balance=self.balances[to],
            receiver_nonce=self.nonces[to],
            amount=amount, sig_rx=R[0], sig_ry=R[1], sig_s=s,
            sender_sibs=sender_sibs, sender_dirs=sender_dirs,
        )
        # apply sender side, take receiver proof from the mid tree
        self.balances[frm] -= amount
        self.nonces[frm] += 1
        self.tree.update(frm, account_leaf_host(
            kp.public, self.balances[frm], self.nonces[frm]))
        recv_sibs, recv_dirs = self.tree.proof(to)
        w.update(receiver_sibs=recv_sibs, receiver_dirs=recv_dirs)
        self.balances[to] += amount
        self.tree.update(to, account_leaf_host(
            self.keys[to].public, self.balances[to], self.nonces[to]))
        w.update(root_after=self.tree.root)
        return TransferCircuit(**w)


def main():
    from gnark_icicle_tpu.frontend import compile_circuit
    from gnark_icicle_tpu.backend import groth16
    import time

    op = Operator()
    witness = op.transfer(0, 1, 250)

    t0 = time.time()
    cs = compile_circuit(Q, TransferCircuit)
    print(f"compiled: {cs} ({time.time()-t0:.1f}s)")
    rng = random.Random()
    t0 = time.time()
    pk, vk = groth16.setup(cs, bn254.BN254, rng=rng)
    print(f"setup ({time.time()-t0:.1f}s)")
    pub, sec = witness.witness_values(Q)
    t0 = time.time()
    proof = groth16.prove(cs, pk, pub, sec, bn254.BN254, rng=rng)
    print(f"proved ({time.time()-t0:.1f}s)")
    groth16.verify(proof, vk, pub, bn254.BN254)
    print("verified: rollup state transition is valid")


if __name__ == "__main__":
    main()
