"""Circuit resource loaders: arkzkey + witness graph, incl. the snarkjs anchor.

Golden values come from the reference's test suite:
  * circuit shape facts — SURVEY.md §2b (parsed from resources),
  * hardcoded snarkjs proof — rln/tests/public.rs:85-233 (cross-toolchain
    parity anchor: a proof produced by snarkjs must verify under our verifier).
"""

import os

import pytest

from zerokit_tpu.circuit import graph as graphmod
from zerokit_tpu.circuit.zkey import zkey_from_file
from zerokit_tpu.groth16.verifier import prepare_verifying_key, verify_proof
from zerokit_tpu.resources import resource_path

ZKEY_20 = resource_path("tree_depth_20/rln_final.arkzkey")
GRAPH_20 = resource_path("tree_depth_20/graph.bin")
GRAPH_20_MULTI = resource_path("tree_depth_20/multi_message_id/max_out_4/graph.bin")


def test_zkey_shape():
    zk = zkey_from_file(ZKEY_20)
    m = zk.matrices
    assert m.num_instance_variables == 6
    assert m.num_witness_variables == 5839
    assert m.num_constraints == 5820
    assert len(zk.pk.a_query) == 5844
    assert len(zk.pk.h_query) == 8192
    assert len(zk.pk.l_query) == 5838
    assert len(zk.pk.vk.gamma_abc_g1) == 6


def test_graph_shape():
    g = graphmod.graph_from_file(GRAPH_20, 20, None)
    assert len(g.nodes) == 23414
    assert len(g.signals) == 5844
    assert g.tree_depth == 20
    assert g.max_out == 1
    assert g.input_mapping["pathElements"] == (6, 20)
    assert graphmod.inputs_size(g.nodes) == 46

    gm = graphmod.graph_from_file(GRAPH_20_MULTI, 20, 4)
    assert len(gm.nodes) == 29254
    assert len(gm.signals) == 7401
    assert gm.max_out == 4


def test_graph_mismatch_errors():
    with pytest.raises(graphmod.GraphReadError):
        graphmod.graph_from_file(GRAPH_20, 21, None)
    with pytest.raises(graphmod.GraphReadError):
        graphmod.graph_from_file(GRAPH_20_MULTI, 20, 5)
    with pytest.raises(graphmod.GraphReadError):
        graphmod.graph_from_bytes(b"")
    with pytest.raises(graphmod.GraphReadError):
        graphmod.graph_from_bytes(b"x" * 32)


@pytest.mark.slow
def test_snarkjs_hardcoded_proof_verifies():
    """The snarkjs-generated proof from rln/tests/public.rs:85-160 must verify."""
    zk = zkey_from_file(ZKEY_20)
    pvk = prepare_verifying_key(zk.pk.vk)
    proof = (
        (
            606446415626469993821291758185575230335423926365686267140465300918089871829,
            14881534001609371078663128199084130129622943308489025453376548677995646280161,
        ),
        (
            (
                18053812507994813734583839134426913715767914942522332114506614735770984570178,
                11219916332635123001710279198522635266707985651975761715977705052386984005181,
            ),
            (
                17371289494006920912949790045699521359436706797224428511776122168520286372970,
                14038575727257298083893642903204723310279435927688342924358714639926373603890,
            ),
        ),
        (
            17701377127561410274754535747274973758826089226897242202671882899370780845888,
            12608543716397255084418384146504333522628400182843246910626782513289789807030,
        ),
    )
    root = 8502402278351299594663821509741133196466235670407051417832304486953898514733
    x = 20645213238265527935869146898028115621427162613172918400241870500502509785943
    ext = 21074405743803627666274838159589343934394162804826017440941339048886754734203
    y = 16401008481486069296141645075505218976370369489687327284155463920202585288271
    nullifier = 9102791780887227194595604713537772536258726662792598131262022534710887343694
    assert verify_proof(pvk, proof, [y, root, nullifier, x, ext])
    # tampered public input must fail
    assert not verify_proof(pvk, proof, [y + 1, root, nullifier, x, ext])
