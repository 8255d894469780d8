"""Relay demo: stateful RLN spam prevention with slashing.

Mirrors rln-cli/src/examples/relay.rs: users register into a persistent
Poseidon tree, send rate-limited messages (one per epoch at limit 1), a
nullifier log detects double-signaling, and the violator's identity secret
is recovered with the share algebra.
"""

from __future__ import annotations

import argparse
import tempfile

from .. import RLN, RLNWitnessInput, hash_to_field_le, keygen, poseidon_hash, poseidon_hash_pair
from ..protocol.proof import proof_values_from_witness
from ..tree.pmtree import PmTree, PmTreeConfig
from ._common import fr_hex, say, setup_jax_cache

LIMIT = 1


def run_demo(depth: int = 20, prove: bool = False) -> bool:
    setup_jax_cache()
    cfg = PmTreeConfig.create(temporary=True)
    tree = PmTree(depth, cfg)
    rln = RLN.stateful(tree=tree) if prove else None

    say("== relay demo: register 3 users ==")
    users = []
    for i in range(3):
        secret, commitment = keygen()
        rate_commitment = poseidon_hash_pair(commitment, LIMIT)
        tree.set(i, rate_commitment)
        users.append(secret)
        say(f"user {i}: rate commitment {fr_hex(rate_commitment)}")
    say(f"tree root: {fr_hex(tree.root())}")

    epoch = hash_to_field_le(b"demo-epoch")
    rln_id = hash_to_field_le(b"relay-demo")
    ext = poseidon_hash_pair(epoch, rln_id)

    nullifier_log = {}

    def signal(user: int, message: bytes):
        mp = tree.proof(user)
        w = RLNWitnessInput.new_single(
            users[user], LIMIT, 0, mp.get_path_elements(), mp.get_path_index(),
            hash_to_field_le(message), ext,
        )
        values = proof_values_from_witness(w)
        if prove:
            proof, values = rln.generate_proof(w)
            assert rln.verify_rln_proof(proof, values, hash_to_field_le(message))
        if values.nullifier in nullifier_log:
            prior = nullifier_log[values.nullifier]
            from ..protocol.slashing import recover_id_secret

            recovered = recover_id_secret(prior, values)
            say(f"SPAM detected! recovered secret {fr_hex(recovered)}")
            return recovered
        nullifier_log[values.nullifier] = values
        say(f"user {user} signaled: nullifier {fr_hex(values.nullifier)}")
        return None

    say("== users signal once each ==")
    signal(0, b"hello from user 0")
    signal(1, b"hello from user 1")
    say("== user 0 signals twice in the same epoch ==")
    recovered = signal(0, b"second message, same epoch")
    ok = recovered == users[0]
    say(f"slashing recovered the correct secret: {ok}")
    tree.close_db_connection()
    return ok


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--demo", action="store_true", help="run the scripted demo")
    parser.add_argument("--prove", action="store_true", help="generate real ZK proofs")
    parser.add_argument("--depth", type=int, default=20)
    args = parser.parse_args()
    assert run_demo(args.depth, args.prove)


if __name__ == "__main__":
    main()
