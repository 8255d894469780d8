"""Groth16 verifier (host-side pairing check).

Mirrors ark-groth16 `verify_proof` as used by the reference
(rln/src/protocol/proof.rs:856-894, rln/src/protocol/zk.rs:101-128):

    e(A, B) == e(alpha, beta) * e(sum_i pub_i * gamma_abc_i, gamma) * e(C, delta)

Verification is not on the TPU hot path (proving is); like the reference,
which verifies on CPU through arkworks, we verify with the host pairing.
The prepared key caches the public-input bases (analog of
ark `prepare_verifying_key`, cached by ArkGroth16Backend —
rln/src/circuit/mod.rs:314-320).
"""

from __future__ import annotations

from typing import List, Sequence

from ..circuit.zkey import VerifyingKey
from ..hostmath import bn254


class PreparedVerifyingKey:
    def __init__(self, vk: VerifyingKey):
        self.vk = vk
        # e(alpha, beta) Miller value could be cached; with a shared final
        # exponentiation the win is small, so keep it simple and explicit.

    def num_public_inputs(self) -> int:
        return len(self.vk.gamma_abc_g1) - 1


def prepare_verifying_key(vk: VerifyingKey) -> PreparedVerifyingKey:
    return PreparedVerifyingKey(vk)


def verify_proof(pvk: PreparedVerifyingKey, proof, public_inputs: Sequence[int]) -> bool:
    """proof = (a: G1, b: G2, c: G1) affine tuples; public_inputs: Fr ints."""
    vk = pvk.vk
    if len(public_inputs) != len(vk.gamma_abc_g1) - 1:
        raise ValueError(
            f"expected {len(vk.gamma_abc_g1) - 1} public inputs, got {len(public_inputs)}"
        )
    a, b, c = proof
    acc = vk.gamma_abc_g1[0]
    for s, base in zip(public_inputs, vk.gamma_abc_g1[1:]):
        acc = bn254.G1.add(acc, bn254.G1.mul(base, s))
    return bn254.multi_pairing_is_one(
        [
            (bn254.G1.neg(a), b),
            (vk.alpha_g1, vk.beta_g2),
            (acc, vk.gamma_g2),
            (c, vk.delta_g2),
        ]
    )


def rln_public_inputs(values) -> List[int]:
    """Order proof values into circuit public inputs.

    Single: [y, root, nullifier, x, external_nullifier]
    Multi:  [ys..., root, nullifiers..., x, external_nullifier, selectors...]
    (reference: rln/src/protocol/proof.rs:861-886, zk.rs:106-123)
    """
    from ..protocol.proof import RLNProofValues  # local import to avoid cycle

    assert isinstance(values, RLNProofValues)
    if values.is_single:
        return [values.y, values.root, values.nullifier, values.x, values.external_nullifier]
    inputs: List[int] = list(values.ys)
    inputs.append(values.root)
    inputs.extend(values.nullifiers)
    inputs.append(values.x)
    inputs.append(values.external_nullifier)
    inputs.extend(1 if u else 0 for u in values.selector_used)
    return inputs
