// Local-crypto parity tests: golden vectors generated from the Python
// package (zerokit_tpu.hash.poseidon / protocol.keygen), which is itself
// bit-checked against the reference's test vectors
// (utils/tests/poseidon_hash_test.rs, rln/tests/protocol.rs:461-507).
// These run with no service — the crypto is fully local (crypto.mjs).

import { test } from "node:test";
import assert from "node:assert/strict";

import {
  ChaCha20Rng,
  arkFrRand,
  computeMerkleRoot,
  extendedSeededKeygen,
  hashToFieldBe,
  hashToFieldLe,
  keccak256,
  keygen,
  poseidonHash,
  poseidonHashPair,
  rateCommitment,
  seededKeygen,
} from "../crypto.mjs";
import { Identity, MerkleTree, localHashPair } from "../rln_client.mjs";

const enc = new TextEncoder();

test("poseidon golden vectors (python parity)", () => {
  assert.equal(
    poseidonHash([1n, 2n]),
    7853200120776062878684798364095072458815029376092732009249414926327459813530n
  );
  assert.equal(
    poseidonHash([42n]),
    12326503012965816391338144612242952408728683609716147019497703475006801258307n
  );
  assert.equal(
    poseidonHash([1n, 2n, 3n, 4n, 5n, 6n, 7n, 8n]),
    18604317144381847857886385684060986177838410221561136253933256952257712543953n
  );
});

test("keccak hash-to-field (hashers.rs:73-93 parity)", () => {
  const want =
    542459961222600534389010438909776248285383231809144255733113943864327251396n;
  assert.equal(hashToFieldLe(enc.encode("hello rln")), want);
  // the BE variant reverses the digest then reads big-endian — numerically
  // identical to LE (matches the engine's tested behavior)
  assert.equal(hashToFieldBe(enc.encode("hello rln")), want);
  // empty-input keccak well-known digest
  const empty = Array.from(keccak256(new Uint8Array(0)))
    .map((b) => b.toString(16).padStart(2, "0"))
    .join("");
  assert.equal(
    empty,
    "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
  );
});

test("seeded keygen matches engine vectors (keygen.rs:50-92)", () => {
  const k = seededKeygen(enc.encode("seed-vector"));
  assert.equal(
    k.idSecret,
    20852320250745359717662725207086563397884464469567582351374204948236507013000n
  );
  assert.equal(
    k.idCommitment,
    20168673515114082292826622575515718167587793507969516571957891610119773985603n
  );
  const e = extendedSeededKeygen(enc.encode("seed-vector"));
  assert.equal(e.trapdoor, k.idSecret); // first draw from the same stream
  assert.equal(
    e.nullifier,
    20952193839394686794464224849533124547352770122815828592723972242405953759829n
  );
  assert.equal(
    e.idCommitment,
    809779198566144764889403524362780875830169112922857726056800533363554663375n
  );
});

test("random keygen is self-consistent and in-range", () => {
  const k = keygen();
  assert.ok(k.idSecret > 0n);
  assert.equal(poseidonHash([k.idSecret]), k.idCommitment);
  const k2 = keygen();
  assert.notEqual(k.idSecret, k2.idSecret);
});

test("chacha20 stream determinism", () => {
  const seed = keccak256(enc.encode("stream"));
  const a = new ChaCha20Rng(seed);
  const b = new ChaCha20Rng(seed);
  for (let i = 0; i < 40; i++) assert.equal(a.nextU32(), b.nextU32());
  assert.equal(arkFrRand(a), arkFrRand(b));
});

test("local merkle tree matches computeMerkleRoot along its own proofs", async () => {
  const depth = 6;
  const tree = new MerkleTree(depth, localHashPair);
  const ids = [];
  for (let i = 0; i < 5; i++) {
    const id = await Identity.fromSeed(enc.encode(`member-${i}`));
    ids.push(id);
    await tree.set(i, rateCommitment(id.commitment, 10n));
  }
  const root = await tree.root();
  for (let i = 0; i < 5; i++) {
    const { pathElements, pathIndex } = await tree.proof(i);
    const leaf = rateCommitment(ids[i].commitment, 10n);
    assert.equal(computeMerkleRoot(leaf, pathElements, pathIndex), root);
  }
});

test("poseidonHashPair equals 2-input hash", () => {
  assert.equal(poseidonHashPair(3n, 4n), poseidonHash([3n, 4n]));
});

test("depth-20 empty tree root matches the engine golden vector", async () => {
  // reference vector: rln/tests/protocol.rs depth-20 empty-tree root,
  // reproduced by zerokit_tpu.tree.merkle.OptimalMerkleTree(20).root()
  const tree = new MerkleTree(20, localHashPair);
  assert.equal(
    await tree.root(),
    15019797232609675441998260052101280400536945603062888308240081994073687793470n
  );
});
