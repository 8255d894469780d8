"""Vectorized witness-graph interpreter for TPU.

The reference evaluates the 23K-node circom graph sequentially per proof
(rln/src/circuit/iden3calc/graph.rs:246-272). The graph's critical path is
~10K levels deep (the Poseidon chain), so a TPU cannot win inside one proof —
it wins by evaluating the whole *batch* of proofs at every node.

Design:
  * The graph is compiled once into a register-allocated SIMD schedule:
    values live in a slot buffer of shape (16 limbs, n_slots, B) in Montgomery
    form; nodes are packed into steps of fixed width W (levels chunked, padded
    with NOPs writing a scratch slot).
  * Steps run under lax.scan: gather W operand rows, compute all op
    candidates, lax.select_n by op code, scatter W results. One compiled body
    serves every segment of the same (kind, padded length).
  * Two scan bodies: LEAN (Mul/Add/Sub/Neg/Eq/Neq/Land/Lor/TernCond — one
    Montgomery multiply per lane) and RICH (adds canonical-domain ops:
    Shr/Band/Bor/Bxor and signed comparisons, each ~3 extra Montgomery
    reductions). Levels are grouped into maximal runs of the same kind.
  * Div nodes (field inversion) break the scan; all Divs of a level are
    batched through one Fermat-inversion scan.
  * Pow/Idiv/Mod/Shl never occur in RLN circuits; graphs containing them are
    routed to the exact host interpreter (witness_host.py) instead.

Operator semantics are bit-identical to the reference (verified against the
host interpreter in tests): signed comparisons split at (p-1)/2, Shr clamps
at 254, bitwise ops conditionally subtract p once.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LIMB_BITS, NUM_LIMBS, R
from ..ff.field import FR, FrField, U32, _MASK, _sub_limbs
from . import graph as g

W = 4  # scan step width (nodes per step); avg level width is ~2.3

# fast-op codes used inside scan bodies
F_NOP = 0
F_MUL = 1
F_ADD = 2
F_SUB = 3
F_NEG = 4
F_EQ = 5
F_NEQ = 6
F_LAND = 7
F_LOR = 8
F_TERN = 9
# rich-only codes
F_SHR = 10
F_BAND = 11
F_BOR = 12
F_BXOR = 13
F_LT = 14
F_GT = 15
F_LEQ = 16
F_GEQ = 17

N_LEAN = 10
N_RICH = 18

_LEAN_MAP = {
    g.OP_MUL: F_MUL,
    g.OP_ADD: F_ADD,
    g.OP_SUB: F_SUB,
    g.OP_EQ: F_EQ,
    g.OP_NEQ: F_NEQ,
    g.OP_LAND: F_LAND,
    g.OP_LOR: F_LOR,
}
_RICH_MAP = {
    g.OP_SHR: F_SHR,
    g.OP_BAND: F_BAND,
    g.OP_BOR: F_BOR,
    g.OP_BXOR: F_BXOR,
    g.OP_LT: F_LT,
    g.OP_GT: F_GT,
    g.OP_LEQ: F_LEQ,
    g.OP_GEQ: F_GEQ,
}
_UNSUPPORTED = {g.OP_POW, g.OP_IDIV, g.OP_MOD, g.OP_SHL}


class UnsupportedGraph(ValueError):
    """Graph uses ops outside the TPU fast path; use the host interpreter."""


@dataclass
class Segment:
    kind: str  # "lean" | "rich"
    ops: np.ndarray  # (steps, W) int32
    ia: np.ndarray
    ib: np.ndarray
    ic: np.ndarray
    write_start: int  # first slot of the segment's contiguous step windows
    div_ia: np.ndarray  # Div nodes executed after the scan: (n,) each
    div_ib: np.ndarray
    div_out: np.ndarray
    node_ids: np.ndarray = None  # (steps, W) node index per lane (-1 = NOP pad)
    div_node_ids: np.ndarray = None


@dataclass
class CompiledGraph:
    graph: g.Graph
    n_slots: int
    const_slots: np.ndarray  # (n_consts,)
    const_values: np.ndarray  # (16, n_consts) Montgomery
    input_positions: np.ndarray  # (n_input_nodes,) index into input buffer
    input_slots: np.ndarray  # (n_input_nodes,)
    inputs_size: int
    segments: List[Segment]
    output_slots: np.ndarray  # (n_signals,)
    scratch_write: int = 0  # W-slot window that padded steps write into


def compile_graph(graph: g.Graph, reuse_slots: bool = True) -> CompiledGraph:
    nodes = graph.nodes
    n = len(nodes)
    for node in nodes:
        if node.kind == g.K_DUO and node.op in _UNSUPPORTED:
            raise UnsupportedGraph(f"op {g.DUO_OP_NAMES[node.op]} not on the TPU fast path")
        if node.kind == g.K_UNO and node.op == g.UNO_ID:
            raise UnsupportedGraph("UnoOp::Id is an error in the reference interpreter")

    # node levels (operands strictly precede in index order)
    level = [0] * n
    for i, node in enumerate(nodes):
        if node.kind == g.K_UNO:
            level[i] = level[node.a] + 1
        elif node.kind == g.K_DUO:
            level[i] = max(level[node.a], level[node.b]) + 1
        elif node.kind == g.K_TRES:
            level[i] = max(level[node.a], level[node.b], level[node.c]) + 1
    n_levels = max(level) + 1 if n else 0
    by_level: List[List[int]] = [[] for _ in range(n_levels)]
    for i in range(n):
        if nodes[i].kind not in (g.K_INPUT, g.K_CONST):
            by_level[level[i]].append(i)

    def level_kind(lv: List[int]) -> str:
        kind = "lean"
        for i in lv:
            node = nodes[i]
            if node.kind == g.K_DUO and node.op in _RICH_MAP:
                kind = "rich"
            if node.kind == g.K_DUO and node.op == g.OP_DIV:
                return "div"
        return kind

    # group consecutive levels into segments; a level containing Div closes one
    raw_segments: List[Tuple[str, List[int], List[int]]] = []  # (kind, scan_nodes, div_nodes)
    cur_kind = None
    cur_nodes: List[int] = []
    for lv in range(1, n_levels):
        nodes_here = by_level[lv]
        if not nodes_here:
            continue
        k = level_kind(nodes_here)
        if k == "div":
            divs = [i for i in nodes_here if nodes[i].kind == g.K_DUO and nodes[i].op == g.OP_DIV]
            rest = [i for i in nodes_here if i not in set(divs)]
            rk = level_kind(rest) if rest else (cur_kind or "lean")
            merged_kind = "rich" if ("rich" in (cur_kind, rk)) else "lean"
            raw_segments.append((merged_kind, cur_nodes + rest, divs))
            cur_kind, cur_nodes = None, []
        elif cur_kind is None or k == cur_kind:
            cur_kind = k if cur_kind is None else cur_kind
            cur_nodes.extend(nodes_here)
        else:
            raw_segments.append((cur_kind, cur_nodes, []))
            cur_kind, cur_nodes = k, list(nodes_here)
    if cur_nodes:
        raw_segments.append((cur_kind or "lean", cur_nodes, []))

    # Slot allocation is APPEND-ONLY: each scan step owns a contiguous W-slot
    # window and a node's slot is its window position, so the scan body's
    # write is one dynamic_update_slice at start = write_start + t*W — no
    # scatter. (The round-4 design register-allocated slots with reuse and
    # wrote via `.at[:, out].set`; the 4-index dynamic scatter per step
    # dominated the evaluator's device time on TPU.) Values are never
    # overwritten; the buffer grows to ~W * n_steps slots, a deliberate
    # memory-for-scatter trade (~40K slots for the depth-20 graph).
    # slot 0 = scratch zero that NOP pad lanes read (never written).
    slot_of = [-1] * n
    next_slot = 1

    const_nodes = [i for i in range(n) if nodes[i].kind == g.K_CONST]
    input_nodes = [i for i in range(n) if nodes[i].kind == g.K_INPUT]
    for i in const_nodes + input_nodes:
        slot_of[i] = next_slot
        next_slot += 1

    segments: List[Segment] = []
    for kind, scan_nodes, div_nodes in raw_segments:
        steps_ops, steps_ia, steps_ib, steps_ic = [], [], [], []
        steps_nid = []
        write_start = next_slot
        # chunk by level boundaries inside the segment: nodes are in level
        # order; nodes of the same level are independent. We must not put a
        # node in the same step as its operand; chunking within a single
        # level is always safe.
        i0 = 0
        while i0 < len(scan_nodes):
            this_level = level[scan_nodes[i0]]
            i1 = i0
            while i1 < len(scan_nodes) and level[scan_nodes[i1]] == this_level:
                i1 += 1
            for c0 in range(i0, i1, W):
                chunk = scan_nodes[c0 : min(c0 + W, i1)]
                ops_row, ia_row, ib_row, ic_row = [], [], [], []
                nid_row = list(chunk)
                for lane, i in enumerate(chunk):
                    node = nodes[i]
                    if node.kind == g.K_UNO:
                        code, a, b, c = F_NEG, node.a, node.a, node.a
                    elif node.kind == g.K_TRES:
                        code, a, b, c = F_TERN, node.a, node.b, node.c
                    elif node.op == g.OP_MUL:
                        code, a, b, c = F_MUL, node.a, node.b, node.a
                    elif node.op in _LEAN_MAP:
                        code, a, b, c = _LEAN_MAP[node.op], node.a, node.b, node.a
                    else:
                        code, a, b, c = _RICH_MAP[node.op], node.a, node.b, node.a
                    ia_row.append(slot_of[a])
                    ib_row.append(slot_of[b])
                    ic_row.append(slot_of[c])
                    ops_row.append(code)
                    slot_of[i] = next_slot + lane
                while len(ops_row) < W:
                    ops_row.append(F_NOP)
                    ia_row.append(0)
                    ib_row.append(0)
                    ic_row.append(0)
                    nid_row.append(-1)
                next_slot += W  # pad lanes own (and zero) their slots
                steps_ops.append(ops_row)
                steps_ia.append(ia_row)
                steps_ib.append(ib_row)
                steps_ic.append(ic_row)
                steps_nid.append(nid_row)
            i0 = i1
        div_ia, div_ib, div_out = [], [], []
        for i in div_nodes:
            node = nodes[i]
            div_ia.append(slot_of[node.a])
            div_ib.append(slot_of[node.b])
            slot_of[i] = next_slot
            div_out.append(next_slot)
            next_slot += 1

        def arr(x, dtype=np.int32):
            return np.asarray(x, dtype=dtype)

        segments.append(
            Segment(
                kind=kind,
                ops=arr(steps_ops),
                ia=arr(steps_ia),
                ib=arr(steps_ib),
                ic=arr(steps_ic),
                write_start=write_start,
                div_ia=arr(div_ia),
                div_ib=arr(div_ib),
                div_out=arr(div_out),
                node_ids=arr(steps_nid, np.int64),
                div_node_ids=arr(div_nodes, np.int64),
            )
        )
    scratch_write = next_slot  # W-slot window that padded-out steps write
    next_slot += W

    const_values = FR.encode([nodes[i].const % R for i in const_nodes])
    if const_values.ndim == 1:
        const_values = const_values.reshape(NUM_LIMBS, 0)
    return CompiledGraph(
        graph=graph,
        n_slots=next_slot,
        const_slots=np.asarray([slot_of[i] for i in const_nodes], dtype=np.int32),
        const_values=np.asarray(const_values, dtype=np.uint32),
        input_positions=np.asarray([nodes[i].a for i in input_nodes], dtype=np.int32),
        input_slots=np.asarray([slot_of[i] for i in input_nodes], dtype=np.int32),
        inputs_size=g.inputs_size(nodes),
        segments=segments,
        output_slots=np.asarray([slot_of[s] for s in graph.signals], dtype=np.int32),
        scratch_write=scratch_write,
    )


# ---------------------------------------------------------------------------
# runtime
# ---------------------------------------------------------------------------

_HALF_LIMBS = np.array(
    [((R - 1) // 2 >> (LIMB_BITS * i)) & 0xFFFF for i in range(NUM_LIMBS)], dtype=np.uint32
)


def _signed_lt(a_canon, b_canon):
    """Signed a < b (reference graph.rs:456-466). Inputs canonical limbs."""
    half = jnp.broadcast_to(
        jnp.asarray(_HALF_LIMBS, U32).reshape((NUM_LIMBS,) + (1,) * (a_canon.ndim - 1)),
        a_canon.shape,
    )
    _, bha = _sub_limbs(half, a_canon)  # borrow => half < a => a negative
    _, bhb = _sub_limbs(half, b_canon)
    a_neg = bha != 0
    b_neg = bhb != 0
    _, bab = _sub_limbs(a_canon, b_canon)
    raw_lt = bab != 0
    # (a_neg, b_neg): (F,F)->raw, (T,F)->True, (F,T)->False, (T,T)->raw
    return jnp.where(a_neg == b_neg, raw_lt, a_neg)


def _bool_to_mont(flag, like):
    one = FrField.one(like)
    return jnp.where(flag[None], one, jnp.zeros_like(like))


def _dynamic_shr(a_canon, b_canon):
    """Barrel shifter: a >> b with Shr clamping semantics (graph.rs:328-363)."""
    shift = b_canon[0]  # b < 2^16 when meaningful; larger handled by clamp
    big = jnp.any(b_canon[1:] != 0, axis=0) | (b_canon[0] >= 254)
    v = a_canon
    for k in range(8):  # shifts up to 255 in powers of two
        bit = (shift >> k) & 1
        shifted = FrField.canon_shift_right_const(v, 1 << k)
        v = jnp.where(bit[None] != 0, shifted, v)
    v = jnp.where(big[None], jnp.zeros_like(v), v)
    return v


def _bitwise_fix(d):
    """Conditionally subtract p once when d > p (graph.rs:365-414)."""
    p_b = jnp.broadcast_to(
        jnp.asarray(FR.p_limbs, U32).reshape((NUM_LIMBS,) + (1,) * (d.ndim - 1)), d.shape
    )
    diff, borrow = _sub_limbs(d, p_b)
    gt = (borrow == 0) & jnp.any(d != p_b, axis=0)
    return jnp.where(gt[None], diff, d)


def _step_candidates(a, b, c, rich: bool):
    """All op results for one gathered step. a/b/c: (16, W, B) Montgomery."""
    zero = jnp.zeros_like(a)
    mul = FrField.mul(a, b)
    add = FrField.add(a, b)
    sub = FrField.sub(a, b)
    neg = FrField.neg(a)
    a_zero = FrField.is_zero(a)
    b_zero = FrField.is_zero(b)
    eqf = FrField.eq(a, b)
    cands = [
        a,  # NOP
        mul,
        add,
        sub,
        neg,
        _bool_to_mont(eqf, a),
        _bool_to_mont(~eqf, a),
        _bool_to_mont(~a_zero & ~b_zero, a),
        _bool_to_mont(~a_zero | ~b_zero, a),
        jnp.where(a_zero[None], c, b),  # TernCond
    ]
    if rich:
        ac = FrField.from_mont(a)
        bc = FrField.from_mont(b)
        shr = FrField.to_mont(_dynamic_shr(ac, bc))
        band = FrField.to_mont(_bitwise_fix(ac & bc))
        bor = FrField.to_mont(_bitwise_fix(ac | bc))
        bxor = FrField.to_mont(_bitwise_fix(ac ^ bc))
        lt = _signed_lt(ac, bc)
        gt = _signed_lt(bc, ac)
        cands += [
            shr,
            band,
            bor,
            bxor,
            _bool_to_mont(lt, a),
            _bool_to_mont(gt, a),
            _bool_to_mont(~gt, a),  # Leq
            _bool_to_mont(~lt, a),  # Geq
        ]
    return cands


@functools.lru_cache(maxsize=None)
def _scan_fn(kind: str, n_steps: int):
    rich = kind == "rich"

    def run(buf, ops, ia, ib, ic, starts):
        def body(buf, step):
            op, sia, sib, sic, start = step
            a = buf[:, sia]
            b = buf[:, sib]
            c = buf[:, sic]
            cands = _step_candidates(a, b, c, rich)
            which = jnp.broadcast_to(op[None, :, None], a.shape)
            res = jax.lax.select_n(which, *cands)
            # contiguous W-slot window write — no scatter (see compile_graph)
            buf = jax.lax.dynamic_update_slice_in_dim(buf, res, start, axis=1)
            return buf, None

        buf, _ = jax.lax.scan(body, buf, (ops, ia, ib, ic, starts))
        return buf

    return jax.jit(run, donate_argnums=(0,))


@jax.jit
def _div_apply(buf, ia, ib, out):
    a = buf[:, ia]
    b = buf[:, ib]
    res = FrField.mul(a, FrField.inv(b))  # inv(0)=0 matches Div-by-zero = 0
    return buf.at[:, out].set(res)


def _pad_steps(seg: Segment, scratch_write: int, multiple: int = 64):
    """Pads the step count to a size class; padded steps are all-NOP rows
    that write the dedicated scratch window. Returns (ops, ia, ib, ic,
    starts) with starts[t] the write offset of step t."""
    n = seg.ops.shape[0]
    target = max(multiple, ((n + multiple - 1) // multiple) * multiple)
    pad = target - n
    starts = np.concatenate(
        [
            seg.write_start + W * np.arange(n, dtype=np.int32),
            np.full(pad, scratch_write, dtype=np.int32),
        ]
    )
    if pad == 0:
        return seg.ops, seg.ia, seg.ib, seg.ic, starts

    def p(x):
        fill = np.zeros((pad, W), dtype=x.dtype)
        return np.concatenate([x, fill], axis=0)

    return p(seg.ops), p(seg.ia), p(seg.ib), p(seg.ic), starts


class WitnessEvaluator:
    """Batched witness evaluation for one compiled graph."""

    def __init__(self, graph: g.Graph, reuse_slots: bool = True):
        self.compiled = compile_graph(graph, reuse_slots=reuse_slots)
        self.graph = graph

    def evaluate_mont(self, input_buffer_canon: np.ndarray) -> jnp.ndarray:
        """input_buffer_canon: (16, inputs_size, B) canonical limbs
        (position 0 must hold the constant 1). Returns the full assignment
        (16, n_signals, B) in Montgomery form."""
        cg = self.compiled
        batch = input_buffer_canon.shape[2]
        buf = jnp.zeros((NUM_LIMBS, cg.n_slots, batch), dtype=U32)
        if cg.const_slots.size:
            consts = jnp.broadcast_to(
                jnp.asarray(cg.const_values)[:, :, None],
                (NUM_LIMBS, cg.const_slots.size, batch),
            )
            buf = buf.at[:, jnp.asarray(cg.const_slots)].set(consts)
        inp = jnp.asarray(input_buffer_canon)[:, jnp.asarray(cg.input_positions)]
        buf = buf.at[:, jnp.asarray(cg.input_slots)].set(FrField.to_mont(inp))
        for seg in cg.segments:
            if seg.ops.size:
                ops, ia, ib, ic, starts = _pad_steps(seg, cg.scratch_write)
                fn = _scan_fn(seg.kind, ops.shape[0])
                buf = fn(
                    buf,
                    jnp.asarray(ops),
                    jnp.asarray(ia),
                    jnp.asarray(ib),
                    jnp.asarray(ic),
                    jnp.asarray(starts),
                )
            if seg.div_ia.size:
                buf = _div_apply(
                    buf,
                    jnp.asarray(seg.div_ia),
                    jnp.asarray(seg.div_ib),
                    jnp.asarray(seg.div_out),
                )
        return buf[:, jnp.asarray(cg.output_slots)]

    def build_input_buffer(
        self, named_inputs: Dict[str, Sequence[Sequence[int]]], batch: int
    ) -> np.ndarray:
        """named_inputs: name -> per-slot list of per-batch ints
        (shape [signal_len][batch]). Returns (16, inputs_size, B) canonical."""
        from ..ff.field import encode_canonical_fast

        cg = self.compiled
        flat_vals: List[int] = []
        positions: List[int] = []
        for name, values in named_inputs.items():
            if name not in self.graph.input_mapping:
                raise KeyError(f"missing input {name}")
            offset, length = self.graph.input_mapping[name]
            if length != len(values):
                raise ValueError(
                    f"invalid input length for {name}: expected {length}, got {len(values)}"
                )
            for i, per_batch in enumerate(values):
                if len(per_batch) != batch:
                    raise ValueError(f"batch mismatch for {name}[{i}]")
                positions.append(offset + i)
                flat_vals.extend(int(v) for v in per_batch)
        out = np.zeros((NUM_LIMBS, cg.inputs_size, batch), dtype=np.uint32)
        out[0, 0, :] = 1  # constant-1 wire
        if flat_vals:
            enc = encode_canonical_fast(flat_vals).reshape(NUM_LIMBS, len(positions), batch)
            out[:, np.asarray(positions)] = enc
        return out
