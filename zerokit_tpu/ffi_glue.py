"""Byte-level glue behind the C FFI (native/rln_ffi.cpp).

The reference exposes its engine to C through ~74 `ffi_*` functions over
serialized buffers (rln/src/ffi/ffi_rln.rs, ffi_rln_v3.rs, ffi_tree.rs).
Here the C ABI library routes every call to this module: all arguments and
results are primitive ints/bytes, handles are small integers into a
process-global table, and every wire format is the byte-exact zerokit
layout from protocol/serialize.py.

Keeping the marshalling on the Python side means the C++ layer stays a thin
embedding shim (GIL + error capture) with no Python C-API object juggling.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

from .api import RLN
from .protocol import serialize as ser
from .protocol.keygen import (
    extended_keygen,
    extended_seeded_keygen,
    hash_to_field_be,
    hash_to_field_le,
    keygen,
    seeded_keygen,
)
from .hash.poseidon import poseidon_hash
from .protocol.slashing import recover_secret
from .tree.merkle import FullMerkleTree, OptimalMerkleTree
from .tree.pmtree import PmTree

_lock = threading.Lock()
_handles: Dict[int, RLN] = {}
_next_handle = 1

_TREES = {
    "full": FullMerkleTree,
    "optimal": OptimalMerkleTree,
    "pmtree": PmTree,
}


def _fr_bytes(v: int, be: bool = False) -> bytes:
    return ser.fr_to_bytes(v, be)


def _fr_from(data: bytes, be: bool = False) -> int:
    v, _ = ser.bytes_to_fr(data, be)
    return v


# -- lifecycle (reference: ffi_rln_v3.rs:324-506 ctors, ffi_rln.rs new/free) --


def new(
    stateful: bool,
    mode: str,
    tree_backend: str = "optimal",
    zkey_bytes: Optional[bytes] = None,
    graph_bytes: Optional[bytes] = None,
    tree_config_json: Optional[str] = None,
) -> int:
    global _next_handle
    if stateful:
        rln = RLN.stateless(mode, zkey_bytes or None, graph_bytes or None)
        cls = _TREES[tree_backend]
        if tree_backend == "pmtree" and tree_config_json:
            from .tree.pmtree import PmTreeConfig

            rln.tree = PmTree(
                rln.graph.tree_depth, PmTreeConfig.from_json(tree_config_json)
            )
        else:
            rln.tree = cls(rln.graph.tree_depth)
    else:
        rln = RLN.stateless(mode, zkey_bytes or None, graph_bytes or None)
    with _lock:
        h = _next_handle
        _next_handle += 1
        _handles[h] = rln
    return h


def free(handle: int) -> None:
    with _lock:
        _handles.pop(handle, None)


def _get(handle: int) -> RLN:
    rln = _handles.get(handle)
    if rln is None:
        raise KeyError(f"invalid RLN handle {handle}")
    return rln


# -- tree ops (reference: ffi_tree.rs:21-258, ffi_rln_v3.rs tree surface) -----


def set_leaf(handle: int, index: int, fr_le: bytes) -> None:
    _get(handle).set_leaf(index, _fr_from(fr_le))


def get_leaf(handle: int, index: int) -> bytes:
    return _fr_bytes(_get(handle).get_leaf(index))


def set_leaves_from(handle: int, index: int, leaves_le: bytes) -> None:
    vals, _ = ser.bytes_to_vec_fr(leaves_le, False)
    _get(handle).set_leaves_from(index, vals)


def init_tree_with_leaves(handle: int, leaves_le: bytes) -> None:
    vals, _ = ser.bytes_to_vec_fr(leaves_le, False)
    _get(handle).init_tree_with_leaves(vals)


def atomic_operation(handle: int, index: int, leaves_le: bytes, indices: List[int]) -> None:
    vals, _ = ser.bytes_to_vec_fr(leaves_le, False)
    _get(handle).atomic_operation(index, vals, list(indices))


def set_next_leaf(handle: int, fr_le: bytes) -> None:
    _get(handle).set_next_leaf(_fr_from(fr_le))


def delete_leaf(handle: int, index: int) -> None:
    _get(handle).delete_leaf(index)


def get_root(handle: int) -> bytes:
    return _fr_bytes(_get(handle).get_root())


def get_subtree_root(handle: int, level: int, index: int) -> bytes:
    return _fr_bytes(_get(handle).get_subtree_root(level, index))


def leaves_set(handle: int) -> int:
    return _get(handle).leaves_set()


def get_merkle_proof(handle: int, index: int) -> bytes:
    """Serialized as vec<Fr> path elements + vec<u8> path index (LE), the
    reference FFI layout (ffi_rln.rs get_proof serialization)."""
    proof = _get(handle).get_merkle_proof(index)
    out = ser.vec_fr_to_bytes(proof.get_path_elements(), False)
    out += ser.vec_u8_to_bytes(proof.get_path_index(), False)
    return out


def get_empty_leaves_indices(handle: int) -> List[int]:
    return _get(handle).get_empty_leaves_indices()


def set_metadata(handle: int, metadata: bytes) -> None:
    _get(handle).set_metadata(metadata)


def get_metadata(handle: int) -> bytes:
    return _get(handle).get_metadata()


def flush(handle: int) -> None:
    _get(handle).flush()


def tree_depth(handle: int) -> int:
    return _get(handle).tree_depth()


# -- proof ops (reference: ffi_rln.rs prove/verify, ffi_rln_v3.rs:507-1605) ---


def generate_proof(handle: int, witness_bytes: bytes, be: bool) -> bytes:
    """witness wire bytes in -> proof_v3 wire bytes out (128-B LE Groth16
    proof + proof values; serialize.rs:676-714 CanonicalSerializeMixed)."""
    rln = _get(handle)
    witness, _ = ser.bytes_to_rln_witness(witness_bytes, be)
    proof, values = rln.generate_proof(witness)
    return ser.proof_v3_to_bytes(proof, values)


def prove_with_witness(
    handle: int, calculated_le: bytes, witness_bytes: bytes, be: bool
) -> bytes:
    """Externally-computed witness vector (n_wires LE 32-byte Fr concat) +
    witness-input wire bytes -> proof_v3 wire bytes (the browser/wasm flow;
    reference public.rs:643 generate_rln_proof_with_witness)."""
    rln = _get(handle)
    if len(calculated_le) % 32:
        raise ValueError("calculated witness must be 32-byte LE field elements")
    cw = [
        int.from_bytes(calculated_le[i : i + 32], "little")
        for i in range(0, len(calculated_le), 32)
    ]
    witness, _ = ser.bytes_to_rln_witness(witness_bytes, be)
    proof, values = rln.generate_proof_with_witness(cw, witness)
    return ser.proof_v3_to_bytes(proof, values)


def verify(handle: int, proof_bytes: bytes) -> bool:
    rln = _get(handle)
    proof, values = ser.bytes_to_proof_v3(proof_bytes)
    return rln.verify(proof, values)


def verify_rln_proof(handle: int, proof_bytes: bytes, x_le: bytes) -> bool:
    """False (not an error) on semantic rejection, like the reference FFI's
    CBoolResult (ffi_utils.rs)."""
    rln = _get(handle)
    proof, values = ser.bytes_to_proof_v3(proof_bytes)
    from . import errors

    try:
        return rln.verify_rln_proof(proof, values, _fr_from(x_le))
    except errors.ZerokitError:
        return False


def verify_with_roots(handle: int, proof_bytes: bytes, x_le: bytes, roots_le: bytes) -> bool:
    rln = _get(handle)
    proof, values = ser.bytes_to_proof_v3(proof_bytes)
    roots, _ = ser.bytes_to_vec_fr(roots_le, False) if roots_le else ([], 0)
    from . import errors

    try:
        return rln.verify_with_roots(proof, values, _fr_from(x_le), roots)
    except errors.ZerokitError:
        return False


def generate_partial_proof(handle: int, partial_witness_bytes: bytes, be: bool) -> bytes:
    rln = _get(handle)
    pw, _ = ser.bytes_to_rln_partial_witness(partial_witness_bytes, be)
    partial = rln.generate_partial_proof(pw)
    return ser.rln_partial_proof_to_bytes(partial)


def finish_proof(handle: int, partial_proof_bytes: bytes, witness_bytes: bytes, be: bool) -> bytes:
    rln = _get(handle)
    partial = ser.bytes_to_rln_partial_proof(partial_proof_bytes)
    witness, _ = ser.bytes_to_rln_witness(witness_bytes, be)
    proof, values = rln.finish_proof(partial, witness)
    return ser.proof_v3_to_bytes(proof, values)


def recover_id_secret(proof1_bytes: bytes, proof2_bytes: bytes) -> bytes:
    _, v1 = ser.bytes_to_proof_v3(proof1_bytes)
    _, v2 = ser.bytes_to_proof_v3(proof2_bytes)
    return _fr_bytes(recover_secret(v1, v2))


# -- primitives (reference: ffi_rln.rs keygen/hash exports) -------------------


def ffi_keygen(seed: Optional[bytes] = None) -> bytes:
    sk, pk = seeded_keygen(seed) if seed else keygen()
    return _fr_bytes(int(sk)) + _fr_bytes(pk)


def ffi_extended_keygen(seed: Optional[bytes] = None) -> bytes:
    parts = extended_seeded_keygen(seed) if seed else extended_keygen()
    return b"".join(_fr_bytes(int(p)) for p in parts)


def ffi_hash(signal: bytes, be: bool) -> bytes:
    v = hash_to_field_be(signal) if be else hash_to_field_le(signal)
    return _fr_bytes(v, be)


def ffi_poseidon_hash(inputs_le: bytes) -> bytes:
    vals, _ = ser.bytes_to_vec_fr(inputs_le, False)
    return _fr_bytes(poseidon_hash(vals))
