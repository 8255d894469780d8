"""Witness interpreters: host exact semantics + TPU schedule parity.

Operator edge cases mirror the reference's inline tests
(rln/src/circuit/iden3calc/graph.rs:468-724).
"""

import random

import numpy as np
import pytest

from zerokit_tpu.circuit import graph as gm
from zerokit_tpu.circuit import witness_host as wh
from zerokit_tpu.circuit.graph import graph_from_file
from zerokit_tpu.circuit.witness_eval import UnsupportedGraph, WitnessEvaluator, compile_graph
from zerokit_tpu.circuit.witness_host import WitnessCalcError, calc_witness, calc_witness_partial
from zerokit_tpu.constants import R
from zerokit_tpu.ff.field import FR
from zerokit_tpu.hash.keccak import keccak256
from zerokit_tpu.resources import resource_path

GRAPH_20 = resource_path("tree_depth_20/graph.bin")
GRAPH_20_MULTI = resource_path("tree_depth_20/multi_message_id/max_out_4/graph.bin")

HALF = (R - 1) // 2


def test_duo_op_semantics():
    # graph.rs:486-559 vectors
    assert wh.eval_duo(gm.OP_DIV, 2, 3) == (
        7296080957279758407415468581752425029516121466805344781232734728858602831873
    )
    assert wh.eval_duo(gm.OP_DIV, 6, 2) == 3
    assert wh.eval_duo(gm.OP_DIV, 7, 2) == (
        10944121435919637611123202872628637544274182200208017171849102093287904247812
    )
    assert wh.eval_duo(gm.OP_IDIV, 2, 3) == 0
    assert wh.eval_duo(gm.OP_IDIV, 7, 2) == 3
    assert wh.eval_duo(gm.OP_MOD, 7, 2) == 1
    assert wh.eval_duo(gm.OP_MOD, 7, 9) == 7
    # zero divisors (graph.rs:619-625)
    assert wh.eval_duo(gm.OP_DIV, 7, 0) == 0
    assert wh.eval_duo(gm.OP_IDIV, 7, 0) == 0
    assert wh.eval_duo(gm.OP_MOD, 7, 0) == 0
    # pow + comparisons (graph.rs:628-646)
    assert wh.eval_duo(gm.OP_POW, 2, 5) == 32
    assert wh.eval_duo(gm.OP_EQ, 2, 3) == 0
    assert wh.eval_duo(gm.OP_NEQ, 2, 3) == 1
    assert wh.eval_duo(gm.OP_LT, 2, 3) == 1
    assert wh.eval_duo(gm.OP_GT, 2, 3) == 0
    assert wh.eval_duo(gm.OP_LEQ, 2, 3) == 1
    assert wh.eval_duo(gm.OP_GEQ, 2, 3) == 0
    assert wh.eval_duo(gm.OP_LAND, 0, 1) == 0
    assert wh.eval_duo(gm.OP_LOR, 0, 1) == 1
    # bitwise (graph.rs:700-707)
    assert wh.eval_duo(gm.OP_BOR, 5, 3) == 7
    assert wh.eval_duo(gm.OP_BXOR, 5, 3) == 6
    assert wh.eval_duo(gm.OP_BAND, 5, 3) == 1


def test_signed_comparisons():
    # graph.rs:557-607, 683-698: negative range above (p-1)/2
    neg1 = R - 1
    neg2 = R - 2
    assert wh.eval_duo(gm.OP_GEQ, 10, 3) == 1
    assert wh.eval_duo(gm.OP_GEQ, 3, 3) == 1
    assert wh.eval_duo(gm.OP_GEQ, 2, 3) == 0
    assert wh.eval_duo(gm.OP_GEQ, neg1, 3) == 0
    assert wh.eval_duo(gm.OP_GEQ, neg1, neg2) == 1
    assert wh.eval_duo(gm.OP_GEQ, neg2, neg1) == 0
    assert wh.eval_duo(gm.OP_GEQ, neg2, neg2) == 1
    pos, neg, negg = 1, HALF + 1, HALF + 2
    assert wh.eval_duo(gm.OP_LT, pos, neg) == 0
    assert wh.eval_duo(gm.OP_GT, pos, neg) == 1
    assert wh.eval_duo(gm.OP_LT, neg, pos) == 1
    assert wh.eval_duo(gm.OP_LT, negg, neg) == 0
    assert wh.eval_duo(gm.OP_GT, negg, neg) == 1


def test_shifts():
    # graph.rs:477-483, 649-664
    assert wh.eval_duo(gm.OP_SHL, 4, 2) == 16
    assert wh.eval_duo(gm.OP_SHL, 5, 0) == 5
    assert wh.eval_duo(gm.OP_SHL, 5, 254) == 0
    assert wh.eval_duo(gm.OP_SHR, 5, 0) == 5
    assert wh.eval_duo(gm.OP_SHR, 5, 254) == 0
    assert wh.eval_duo(gm.OP_SHR, 1, 64) == 0
    assert wh.eval_duo(gm.OP_SHR, 1 << 100, 37) == 1 << 63


def test_uno_tres():
    assert wh.eval_uno(gm.UNO_NEG, 5) == R - 5
    assert wh.eval_uno(gm.UNO_NEG, 0) == 0
    with pytest.raises(WitnessCalcError):
        wh.eval_uno(gm.UNO_ID, 1)
    assert wh.eval_tres(gm.TRES_TERNCOND, 0, 7, 9) == 9
    assert wh.eval_tres(gm.TRES_TERNCOND, 1, 7, 9) == 7


def _witness_inputs(multi: bool, batch: int, seed: int = 9):
    rnd = random.Random(seed)

    def h2f(b):
        return int.from_bytes(keccak256(b), "little") % R

    base = {
        "identitySecret": [[h2f(b"s%d" % i) for i in range(batch)]],
        "userMessageLimit": [[100] * batch],
        "pathElements": [[rnd.randrange(R) for _ in range(batch)] for _ in range(20)],
        "identityPathIndex": [[rnd.randrange(2) for _ in range(batch)] for _ in range(20)],
        "x": [[h2f(b"x%d" % i) for i in range(batch)]],
        "externalNullifier": [[12345] * batch],
    }
    if multi:
        base["messageId"] = [[1] * batch, [2] * batch, [3] * batch, [0] * batch]
        base["selectorUsed"] = [[1] * batch, [1] * batch, [0] * batch, [0] * batch]
    else:
        base["messageId"] = [[1] * batch]
    return base


@pytest.mark.slow
@pytest.mark.parametrize(
    "path,multi", [(GRAPH_20, False), (GRAPH_20_MULTI, True)], ids=["single", "multi"]
)
def test_device_matches_host(path, multi):
    g = graph_from_file(path, 20, 4 if multi else None)
    ev = WitnessEvaluator(g)
    B = 2
    named = _witness_inputs(multi, B)
    buf = ev.build_input_buffer(named, B)
    out = np.asarray(ev.evaluate_mont(buf))
    for bidx in range(B):
        host = calc_witness({k: [col[bidx] for col in v] for k, v in named.items()}, g)
        dev = FR.decode(out[:, :, bidx])
        assert all(int(dev[i]) == host[i] for i in range(len(host)))


def test_partial_witness_none_propagation():
    g = graph_from_file(GRAPH_20, 20, None)
    named = {
        "identitySecret": [7],
        "userMessageLimit": [100],
        "messageId": [None],
        "pathElements": [0] * 20,
        "identityPathIndex": [0] * 20,
        "x": [None],
        "externalNullifier": [None],
    }
    out = calc_witness_partial(named, g)
    known = sum(1 for v in out if v is not None)
    assert out[0] == 1  # constant-1 wire always known
    assert 0 < known < len(out)
    # full evaluation on the same known inputs agrees on the known positions
    named_full = dict(named)
    named_full.update({"messageId": [1], "x": [5], "externalNullifier": [6]})
    full = calc_witness(named_full, g)
    for got, expect in zip(out, full):
        if got is not None:
            assert got == expect


def test_unsupported_ops_route_to_host():
    bad = gm.Graph(
        nodes=[gm.Node(kind=gm.K_INPUT, a=1), gm.Node(kind=gm.K_DUO, op=gm.OP_POW, a=0, b=0)],
        signals=[1],
        input_mapping={"x": (1, 1)},
        tree_depth=0,
        max_out=1,
    )
    with pytest.raises(UnsupportedGraph):
        compile_graph(bad)
