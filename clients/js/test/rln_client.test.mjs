// Node test suite for the JS client, mirroring the reference's
// rln-wasm/tests/node.rs flow: build a Merkle tree host-side, construct a
// witness, prove through the engine, parse/verify the proof, run the
// two-phase partial/finish flow, and recover a double-signaling secret.
//
// Run with a live proving service:
//   python -m zerokit_tpu.server   (or the depth-10 helper below)
//   RLN_SERVICE_URL=http://127.0.0.1:8077 node --test clients/js/test
//
// Tiers: codec/unit tests always run (no service needed). Service-backed
// tests run when RLN_SERVICE_URL is set; the prove/finish tests additionally
// need RLN_TEST_PROVE=1 (a cold CPU prove can take minutes — the engine's
// persistent XLA cache makes reruns fast).

import assert from "node:assert/strict";
import test from "node:test";

import {
  FR_MODULUS,
  Identity,
  MerkleTree,
  RlnClient,
  bytesToFr,
  frToBytes,
  fromHex,
  parseProof,
  parseProofValues,
  recoverIdSecret,
  rootAccepted,
  serializePartialWitness,
  serializeWitness,
  toHex,
} from "../rln_client.mjs";

const SERVICE = process.env.RLN_SERVICE_URL || null;
const PROVE = process.env.RLN_TEST_PROVE === "1";

// ---------------------------------------------------------------------------
// Local codec tests (no service)
// ---------------------------------------------------------------------------

test("fr byte roundtrip", () => {
  const v = 1234567890123456789012345678901234567890n % FR_MODULUS;
  assert.equal(bytesToFr(frToBytes(v)), v);
  assert.equal(toHex(frToBytes(1n)).slice(0, 2), "01");
  assert.deepEqual(fromHex(toHex(frToBytes(v))), frToBytes(v));
});

test("witness wire layout matches the v2 LE format", () => {
  const w = serializeWitness({
    identitySecret: 3n,
    userMessageLimit: 100n,
    messageId: 1n,
    pathElements: [5n, 6n],
    pathIndex: [0, 1],
    x: 7n,
    externalNullifier: 8n,
  });
  // version | 3 Fr | u64 len | 2 Fr | u64 len | 2 bytes | 2 Fr
  assert.equal(w.length, 1 + 3 * 32 + 8 + 2 * 32 + 8 + 2 + 2 * 32);
  assert.equal(w[0], 0x00);
  assert.equal(bytesToFr(w.subarray(1, 33)), 3n);
});

test("partial witness wire layout", () => {
  const w = serializePartialWitness({
    identitySecret: 3n,
    userMessageLimit: 100n,
    pathElements: [5n],
    pathIndex: [1],
  });
  assert.equal(w.length, 1 + 2 * 32 + 8 + 32 + 8 + 1);
});

test("proof values parse (single mode synthetic wire)", () => {
  const parts = [
    Uint8Array.of(0x00),
    frToBytes(11n), // root
    frToBytes(22n), // external nullifier
    frToBytes(33n), // x
    frToBytes(44n), // y
    frToBytes(55n), // nullifier
  ];
  const wire = new Uint8Array(parts.reduce((a, p) => a + p.length, 0));
  let off = 0;
  for (const p of parts) {
    wire.set(p, off);
    off += p.length;
  }
  const [values, read] = parseProofValues(wire);
  assert.equal(read, wire.length);
  assert.deepEqual(values, {
    mode: "single",
    root: 11n,
    externalNullifier: 22n,
    x: 33n,
    y: 44n,
    nullifier: 55n,
  });
  // full proof wire = version + 128B groth16 + values
  const proofWire = new Uint8Array(1 + 128 + wire.length);
  proofWire[0] = 0x00;
  proofWire.set(wire, 129);
  const parsed = parseProof(proofWire);
  assert.equal(parsed.groth16.length, 128);
  assert.equal(parsed.values.root, 11n);
  assert.ok(rootAccepted(proofWire, [11n]));
  assert.ok(!rootAccepted(proofWire, [12n]));
});

test("recoverIdSecret recovers a line's intercept", () => {
  // y = a0 + x*a1 for a0=99, a1=7 at two signals
  const a0 = 99n, a1 = 7n;
  const mk = (x) => {
    const parts = [
      Uint8Array.of(0x00),
      frToBytes(1n),
      frToBytes(2n),
      frToBytes(x),
      frToBytes((a0 + x * a1) % FR_MODULUS),
      frToBytes(5n),
    ];
    const wire = new Uint8Array(1 + 128 + parts.reduce((a, p) => a + p.length, 0));
    let off = 129;
    for (const p of parts) {
      wire.set(p, off);
      off += p.length;
    }
    return wire;
  };
  assert.equal(recoverIdSecret(mk(10n), mk(20n)), a0);
});

// ---------------------------------------------------------------------------
// Service-backed tests (RLN_SERVICE_URL)
// ---------------------------------------------------------------------------

test("service: keygen + poseidon + tree root", { skip: !SERVICE }, async () => {
  const rln = new RlnClient(SERVICE);
  const health = await rln.health();
  assert.equal(health.status, "ok");
  const idA = await rln.keygen(frToBytes(1111n));
  const idB = await rln.keygen(frToBytes(1111n));
  assert.equal(idA.secret, idB.secret); // seeded determinism (keygen.rs:50)
  const ext = await rln.keygen(null, true);
  assert.ok(ext.trapdoor !== null && ext.nullifier !== null);
  const h = await rln.poseidon(1n, 2n);
  assert.ok(h > 0n && h < FR_MODULUS);
});

test("service: full prove/verify + partial/finish + slashing",
  { skip: !(SERVICE && PROVE) }, async () => {
  const rln = new RlnClient(SERVICE);
  const depth = (await rln.health()).tree_depth;
  const id = await rln.keygen(frToBytes(42n));
  const limit = 10n;
  const tree = new MerkleTree(depth, (a, b) => rln.hashPair(a, b));
  const rateCommitment = await rln.poseidon(id.commitment, limit);
  await tree.set(0, rateCommitment);
  const { pathElements, pathIndex } = await tree.proof(0);
  const root = await tree.root();
  const ext = await rln.poseidon(777n, 888n);

  const mkWitness = (x, messageId = 1n) =>
    serializeWitness({
      identitySecret: id.secret,
      userMessageLimit: limit,
      messageId,
      pathElements,
      pathIndex,
      x,
      externalNullifier: ext,
    });

  const proof1 = await rln.prove(mkWitness(1001n));
  const parsed = parseProof(proof1);
  assert.equal(parsed.values.root, root);
  assert.ok(await rln.verifyWithRoots(proof1, 1001n, [root]));
  assert.ok(!(await rln.verifyWithRoots(proof1, 1001n, [root + 1n])));

  // two-phase: partial proof cached, finish per message
  const partial = await rln.provePartial(
    serializePartialWitness({
      identitySecret: id.secret,
      userMessageLimit: limit,
      pathElements,
      pathIndex,
    })
  );
  const proof2 = await rln.finish(partial, mkWitness(2002n));
  assert.ok(await rln.verify(proof2, 2002n));

  // double-signaling with the SAME message id leaks the secret locally
  const secret = recoverIdSecret(proof1, proof2);
  assert.equal(secret, id.secret);
});
