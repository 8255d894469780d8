// JS client for the zerokit-tpu proving service — the TPU-native analog of
// the reference's WASM bindings (rln-wasm/src/wasm_rln.rs: WasmRLN
// generateProof/verify/verifyWithRoots and the js-rln integration).
//
// A TPU prover cannot run inside the browser the way zerokit's Rust->WASM
// build does, so the equivalent deployment shape is: the proving engine runs
// server-side (zerokit_tpu/server.py, micro-batching onto the TPU) and JS
// callers speak the same byte-exact zerokit wire formats over HTTP. Witness
// construction below mirrors rln_witness_to_bytes_le (witness.rs:369-422):
// everything a browser/node relay needs without any crypto dependency.
//
// Usage:
//   import { RlnClient, serializeWitness, frToBytes } from "./rln_client.mjs";
//   const rln = new RlnClient("http://localhost:8077");
//   const proof = await rln.prove(serializeWitness({...}));
//   await rln.verify(proof, xBytes, [rootBytes]);

const FR_BYTES = 32;

export function frToBytes(value) {
  // bigint -> 32-byte little-endian Fr (utils.rs fr_to_bytes_le)
  const out = new Uint8Array(FR_BYTES);
  let v = BigInt(value);
  for (let i = 0; i < FR_BYTES; i++) {
    out[i] = Number(v & 0xffn);
    v >>= 8n;
  }
  return out;
}

export function bytesToFr(bytes) {
  let v = 0n;
  for (let i = FR_BYTES - 1; i >= 0; i--) v = (v << 8n) | BigInt(bytes[i]);
  return v;
}

function u64le(n) {
  const out = new Uint8Array(8);
  let v = BigInt(n);
  for (let i = 0; i < 8; i++) {
    out[i] = Number(v & 0xffn);
    v >>= 8n;
  }
  return out;
}

function concat(parts) {
  const len = parts.reduce((a, p) => a + p.length, 0);
  const out = new Uint8Array(len);
  let off = 0;
  for (const p of parts) {
    out.set(p, off);
    off += p.length;
  }
  return out;
}

export function toHex(bytes) {
  return Array.from(bytes, (b) => b.toString(16).padStart(2, "0")).join("");
}

export function fromHex(hex) {
  const out = new Uint8Array(hex.length / 2);
  for (let i = 0; i < out.length; i++)
    out[i] = parseInt(hex.slice(2 * i, 2 * i + 2), 16);
  return out;
}

// v2 LE witness wire format (mode.rs:26-47, witness.rs:369-422):
// version byte 0x00 | identity_secret | user_message_limit | message_id |
// vec<Fr> path_elements | vec<u8> path_index | x | external_nullifier
export function serializeWitness({
  identitySecret,
  userMessageLimit,
  messageId,
  pathElements,
  pathIndex,
  x,
  externalNullifier,
}) {
  const parts = [
    Uint8Array.of(0x00),
    frToBytes(identitySecret),
    frToBytes(userMessageLimit),
    frToBytes(messageId),
    u64le(pathElements.length),
    ...pathElements.map(frToBytes),
    u64le(pathIndex.length),
    Uint8Array.from(pathIndex.map(Number)),
    frToBytes(x),
    frToBytes(externalNullifier),
  ];
  return concat(parts);
}

export class RlnClient {
  constructor(baseUrl = "http://127.0.0.1:8077", fetchImpl = fetch) {
    this.baseUrl = baseUrl.replace(/\/$/, "");
    this.fetch = fetchImpl;
  }

  async _post(path, payload) {
    const res = await this.fetch(this.baseUrl + path, {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify(payload),
    });
    const body = await res.json();
    if (!res.ok) throw new Error(body.error || `HTTP ${res.status}`);
    return body;
  }

  async health() {
    const res = await this.fetch(this.baseUrl + "/healthz");
    return res.json();
  }

  /** witnessBytes: Uint8Array (v2 LE wire format) -> proof bytes (v2 RLN
   *  proof layout: 128-byte LE Groth16 proof + proof values). */
  async prove(witnessBytes) {
    const body = await this._post("/prove", { witness_hex: toHex(witnessBytes) });
    return fromHex(body.proof_hex);
  }

  /** proofBytes + optional signal hash + accepted roots. x/roots may be
   *  bigints or 32-byte LE Uint8Arrays; the service takes hex integers. */
  async verify(proofBytes, x = null, roots = []) {
    const asHexInt = (v) =>
      (v instanceof Uint8Array ? bytesToFr(v) : BigInt(v)).toString(16);
    const payload = { proof_hex: toHex(proofBytes) };
    if (x !== null) payload.x = asHexInt(x);
    if (roots.length) payload.roots = roots.map(asHexInt);
    const body = await this._post("/verify", payload);
    return !!body.valid;
  }
}

// ---------------------------------------------------------------------------
// WasmRLN-flow parity additions (reference rln-wasm/src/wasm_rln.rs:12-85):
// local proof/value (de)serialization, the two-phase partial/finish flow,
// Identity via the keygen endpoint, and a Merkle tree builder whose Poseidon
// evaluations come from the service (the engine's hashers, hashers.rs:26-93).
// The Groth16 pairing check itself stays server-side — that is the one
// deliberate deviation from in-browser WASM verification, documented in the
// header above.
// ---------------------------------------------------------------------------

function readVecFr(bytes, off) {
  let n = 0n;
  for (let i = 7; i >= 0; i--) n = (n << 8n) | BigInt(bytes[off + i]);
  off += 8;
  const out = [];
  for (let i = 0; i < Number(n); i++) {
    out.push(bytesToFr(bytes.subarray(off, off + FR_BYTES)));
    off += FR_BYTES;
  }
  return [out, off];
}

function readVecU8(bytes, off) {
  let n = 0n;
  for (let i = 7; i >= 0; i--) n = (n << 8n) | BigInt(bytes[off + i]);
  off += 8;
  const out = Array.from(bytes.subarray(off, off + Number(n)));
  return [out, off + Number(n)];
}

// Partial (static) witness wire (serialize.py rln_partial_witness_to_bytes):
// version | identity_secret | user_message_limit | vec<Fr> path_elements |
// vec<u8> path_index
export function serializePartialWitness({
  identitySecret,
  userMessageLimit,
  pathElements,
  pathIndex,
  versionByte = 0x00,
}) {
  return concat([
    Uint8Array.of(versionByte),
    frToBytes(identitySecret),
    frToBytes(userMessageLimit),
    u64le(pathElements.length),
    ...pathElements.map(frToBytes),
    u64le(pathIndex.length),
    Uint8Array.from(pathIndex.map(Number)),
  ]);
}

/** Proof-values wire -> object (proof.rs:192-268 layout, LE). */
export function parseProofValues(bytes, off = 0) {
  const mode = bytes[off];
  off += 1;
  const root = bytesToFr(bytes.subarray(off, off + FR_BYTES));
  off += FR_BYTES;
  const externalNullifier = bytesToFr(bytes.subarray(off, off + FR_BYTES));
  off += FR_BYTES;
  const x = bytesToFr(bytes.subarray(off, off + FR_BYTES));
  off += FR_BYTES;
  if (mode === 0x00) {
    const y = bytesToFr(bytes.subarray(off, off + FR_BYTES));
    off += FR_BYTES;
    const nullifier = bytesToFr(bytes.subarray(off, off + FR_BYTES));
    off += FR_BYTES;
    return [{ mode: "single", root, externalNullifier, x, y, nullifier }, off];
  }
  let ys, nullifiers, selectors;
  [ys, off] = readVecFr(bytes, off);
  [nullifiers, off] = readVecFr(bytes, off);
  [selectors, off] = readVecU8(bytes, off);
  return [
    {
      mode: "multi",
      root,
      externalNullifier,
      x,
      ys,
      nullifiers,
      selectorUsed: selectors.map(Boolean),
    },
    off,
  ];
}

const GROTH16_PROOF_SIZE = 128; // compressed, circuit/mod.rs:82

/** Full RLN proof wire -> { groth16: Uint8Array(128), values } (the local
 *  half of WasmRLN verify: callers can read roots/nullifiers without a
 *  round trip; the pairing check stays on the service). */
export function parseProof(bytes) {
  const groth16 = bytes.subarray(1, 1 + GROTH16_PROOF_SIZE);
  const [values] = parseProofValues(bytes, 1 + GROTH16_PROOF_SIZE);
  return { versionByte: bytes[0], groth16, values };
}

/** Client-side root membership check, mirroring the order the engine uses
 *  (roots checked BEFORE the pairing — public.rs:944-952). */
export function rootAccepted(proofBytes, roots) {
  const { values } = parseProof(proofBytes);
  if (!roots.length) return true;
  return roots.some((r) => (r instanceof Uint8Array ? bytesToFr(r) : BigInt(r)) === values.root);
}

/** LOCAL Groth16 verification — no service round trip (the in-client verify
 *  of the reference's WasmRLN, wasm_rln.rs:28-43): parses the 128-byte
 *  compressed proof, orders the public inputs from the proof values, and
 *  runs the BigInt pairing check (pairing.mjs). vk comes from the engine
 *  (see tools/export_js_fixture.py for the JSON shape, or GET /vk when the
 *  service exposes it). Throws on malformed/non-subgroup proof points;
 *  returns false on a failed pairing. ~100s of ms of BigInt math — use the
 *  service's /verify for high-rate paths. */
export async function verifyProofLocal(proofBytes, vk, { x = null, roots = [] } = {}) {
  const { proofFromBytes, verifyGroth16, rlnPublicInputs } = await import(
    "./pairing.mjs"
  );
  const { values } = parseProof(proofBytes);
  // V3 ordering: root/x checks BEFORE the pairing (public.rs:944-952)
  if (roots.length && !rootAccepted(proofBytes, roots)) return false;
  if (x !== null) {
    const xv = x instanceof Uint8Array ? bytesToFr(x) : BigInt(x);
    if (xv !== values.x) return false;
  }
  let proof;
  try {
    proof = proofFromBytes(proofBytes.subarray(1, 129));
  } catch {
    return false; // invalid points = invalid proof (ark decode semantics)
  }
  return verifyGroth16(vk, proof, rlnPublicInputs(values));
}

export class Identity {
  constructor({ secret, commitment, trapdoor = null, nullifier = null }) {
    this.secret = secret;
    this.commitment = commitment;
    this.trapdoor = trapdoor;
    this.nullifier = nullifier;
  }

  /** Local keygen (crypto.mjs): secrets never leave the client — the same
   *  capability as the reference's in-browser keygen (wasm_utils.rs:233+).
   *  Replaces the server /keygen round-trip for identity creation. */
  static async generate() {
    const { keygen } = await import("./crypto.mjs");
    const k = keygen();
    return new Identity({ secret: k.idSecret, commitment: k.idCommitment });
  }

  static async fromSeed(signalBytes) {
    const { seededKeygen } = await import("./crypto.mjs");
    const k = seededKeygen(signalBytes);
    return new Identity({ secret: k.idSecret, commitment: k.idCommitment });
  }

  static async generateExtended() {
    const { extendedKeygen } = await import("./crypto.mjs");
    const k = extendedKeygen();
    return new Identity({
      secret: k.idSecret, commitment: k.idCommitment,
      trapdoor: k.trapdoor, nullifier: k.nullifier,
    });
  }

  static async extendedFromSeed(signalBytes) {
    const { extendedSeededKeygen } = await import("./crypto.mjs");
    const k = extendedSeededKeygen(signalBytes);
    return new Identity({
      secret: k.idSecret, commitment: k.idCommitment,
      trapdoor: k.trapdoor, nullifier: k.nullifier,
    });
  }
}

/** Local Poseidon pair hash for MerkleTree — removes the HTTP round-trip
 *  per hash (a depth-20 insert previously cost ~20 /poseidon calls). */
export async function localHashPair(a, b) {
  const { poseidonHashPair } = await import("./crypto.mjs");
  return poseidonHashPair(a, b);
}

export class MerkleTree {
  /** Poseidon-hash Merkle tree with hashing delegated to `hashPair`
   *  (async). Mirrors the reference node test's host-side
   *  OptimalMerkleTree (rln-wasm/tests/node.rs). */
  constructor(depth, hashPair) {
    this.depth = depth;
    this.hashPair = hashPair;
    this.leaves = [];
    this._defaults = null; // per-level default nodes, built lazily
  }

  async _defaultNodes() {
    if (!this._defaults) {
      const d = [0n];
      for (let i = 0; i < this.depth; i++) d.push(await this.hashPair(d[i], d[i]));
      this._defaults = d;
    }
    return this._defaults;
  }

  async set(index, leaf) {
    while (this.leaves.length <= index) this.leaves.push(0n);
    this.leaves[index] = leaf;
  }

  async root() {
    const defaults = await this._defaultNodes();
    let level = this.leaves.slice();
    for (let l = 0; l < this.depth; l++) {
      const next = [];
      for (let i = 0; i < Math.max(1, Math.ceil(level.length / 2)); i++) {
        const a = level[2 * i] ?? defaults[l];
        const b = level[2 * i + 1] ?? defaults[l];
        next.push(await this.hashPair(a, b));
      }
      level = next;
    }
    return level[0];
  }

  async proof(index) {
    const defaults = await this._defaultNodes();
    let level = this.leaves.slice();
    const pathElements = [];
    const pathIndex = [];
    let idx = index;
    for (let l = 0; l < this.depth; l++) {
      const sib = idx ^ 1;
      pathElements.push(level[sib] ?? defaults[l]);
      pathIndex.push(idx & 1);
      const next = [];
      for (let i = 0; i < Math.max(1, Math.ceil(level.length / 2)); i++) {
        const a = level[2 * i] ?? defaults[l];
        const b = level[2 * i + 1] ?? defaults[l];
        next.push(await this.hashPair(a, b));
      }
      level = next;
      idx >>= 1;
    }
    return { pathElements, pathIndex };
  }
}

// -- service-backed methods on the client ------------------------------------

RlnClient.prototype.provePartial = async function (partialWitnessBytes) {
  const body = await this._post("/prove_partial", {
    partial_witness_hex: toHex(partialWitnessBytes),
  });
  return fromHex(body.partial_proof_hex);
};

RlnClient.prototype.finish = async function (partialProofBytes, witnessBytes) {
  const body = await this._post("/finish", {
    partial_proof_hex: toHex(partialProofBytes),
    witness_hex: toHex(witnessBytes),
  });
  return fromHex(body.proof_hex);
};

/** Identity generation (reference wasm_utils Identity/seeded variants);
 *  seed: optional Uint8Array for deterministic keys (keygen.rs:50). */
RlnClient.prototype.keygen = async function (seed = null, extended = false) {
  const payload = { extended };
  if (seed) payload.seed_hex = toHex(seed);
  const body = await this._post("/keygen", payload);
  return new Identity({
    secret: BigInt("0x" + body.secret),
    commitment: BigInt("0x" + body.commitment),
    trapdoor: body.trapdoor ? BigInt("0x" + body.trapdoor) : null,
    nullifier: body.nullifier ? BigInt("0x" + body.nullifier) : null,
  });
};

RlnClient.prototype.poseidon = async function (...inputs) {
  const body = await this._post("/poseidon", {
    inputs: inputs.map((v) => BigInt(v).toString(16)),
  });
  return BigInt("0x" + body.hash);
};

RlnClient.prototype.hashPair = function (a, b) {
  return this.poseidon(a, b);
};

/** Local values + server pairing: the WasmRLN verifyWithRoots flow. */
RlnClient.prototype.verifyWithRoots = async function (proofBytes, x, roots) {
  if (!rootAccepted(proofBytes, roots)) return false;
  return this.verify(proofBytes, x, roots);
};

// -- local slashing (reference slashing.rs:12-36; pure bigint math) ----------

export const FR_MODULUS =
  21888242871839275222246405745257275088548364400416034343698204186575808495617n;

function mod(a, m = FR_MODULUS) {
  const r = a % m;
  return r < 0n ? r + m : r;
}

function invMod(a, m = FR_MODULUS) {
  // extended Euclid; a must be nonzero mod m
  let [old_r, r] = [mod(a, m), m];
  let [old_s, s] = [1n, 0n];
  while (r !== 0n) {
    const q = old_r / r;
    [old_r, r] = [r, old_r - q * r];
    [old_s, s] = [s, old_s - q * s];
  }
  if (old_r !== 1n) throw new Error("not invertible");
  return mod(old_s, m);
}

/** Two proofs of the SAME identity/external-nullifier with different
 *  signals leak the secret: a1 = (y1-y2)/(x1-x2), a0 = y1 - x1*a1
 *  (compute_id_secret, slashing.rs:12-36). Runs entirely client-side. */
export function recoverIdSecret(proofBytes1, proofBytes2) {
  const v1 = parseProof(proofBytes1).values;
  const v2 = parseProof(proofBytes2).values;
  if (v1.externalNullifier !== v2.externalNullifier)
    throw new Error("external nullifiers differ");
  if (v1.mode !== "single" || v2.mode !== "single")
    throw new Error("multi-mode slashing: use the engine's recover endpoint");
  if (v1.nullifier !== v2.nullifier) throw new Error("nullifiers differ");
  if (v1.x === v2.x) throw new Error("same signal: nothing leaked");
  const a1 = mod((v1.y - v2.y) * invMod(v1.x - v2.x));
  return mod(v1.y - v1.x * a1);
}
