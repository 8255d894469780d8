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
