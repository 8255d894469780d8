"""Pre-compiled circom circuit artifacts (binary data, not code).

Provenance: these are the standard RLN circuit artifacts produced by the
public circom-rln + circom-witnesscalc + ark-zkey toolchains (see the
reference's rln/README.md:166-308 for the build recipe). They are
cryptographic *data* — a trusted-setup proving key and a compiled witness
graph — required byte-exactly for proof compatibility; they cannot be
re-derived without re-running the circom trusted setup, which would produce a
different (incompatible) key. The framework code that consumes them is written
from scratch.

Layout (same as the reference resource tree, rln/resources/):
    tree_depth_{10,20}/{graph.bin, rln_final.arkzkey, config.json}
    tree_depth_{10,20}/multi_message_id/max_out_4/{graph.bin, rln_final.arkzkey}
"""

import os

_ROOT = os.path.dirname(__file__)


def resource_path(rel: str) -> str:
    return os.path.join(_ROOT, rel)


def load_resource(rel: str) -> bytes:
    with open(resource_path(rel), "rb") as f:
        return f.read()
