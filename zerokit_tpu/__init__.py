"""zerokit_tpu: a TPU-native RLN (Rate-Limiting Nullifier) proving framework.

From-scratch reimplementation of the capabilities of vacp2p/zerokit with a
JAX/XLA/Pallas compute path: limb-decomposed Montgomery BN254 field kernels,
batched Poseidon/Merkle, a vectorized circom witness-graph interpreter, and a
batched Groth16 prover (NTT witness map + Pippenger MSMs), plus the RLN
protocol layer (identities, proofs, slashing, byte-exact wire formats).
"""

__version__ = "0.1.0"

from .api import RLN  # noqa: F401
from .protocol.identity import IdSecret  # noqa: F401
from .protocol.keygen import (  # noqa: F401
    extended_keygen,
    extended_seeded_keygen,
    hash_to_field_be,
    hash_to_field_le,
    keygen,
    seeded_keygen,
)
from .protocol.proof import RLNProof, RLNProofValues, proof_values_from_witness  # noqa: F401
from .protocol.slashing import compute_id_secret, recover_id_secret, recover_secret  # noqa: F401
from .protocol.witness import (  # noqa: F401
    RLNPartialWitnessInput,
    RLNWitnessInput,
    compute_tree_root,
)
from .hash.poseidon import poseidon_hash, poseidon_hash_pair  # noqa: F401
from .tree.merkle import FullMerkleTree, OptimalMerkleTree  # noqa: F401
