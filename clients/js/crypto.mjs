// Local BN254/Poseidon cryptography for the JS client — no server round-trips.
//
// The reference's WASM build (rln-wasm/src/wasm_rln.rs, wasm_utils.rs) runs
// identity generation, Poseidon hashing and Merkle-tree maintenance directly
// in the browser; this module gives the JS client the same local capability
// with plain BigInt:
//   * Poseidon hash (t = 2..9) with Grain-LFSR-generated parameters —
//     bit-exact with utils/src/poseidon/* (constants generated, not copied);
//   * Keccak-256 + hashToFieldLe/Be (rln/src/hashers.rs:73-93);
//   * Identity keygen incl. the ChaCha20-seeded deterministic variants
//     (rln/src/protocol/keygen.rs:16-92, ark UniformRand semantics);
//   * Merkle root recomputation for witness/path checks.
//
// Proving still goes to the TPU service (a browser cannot run the device
// pipeline); everything identity- and tree-shaped is local, so secrets never
// leave the client (closing the /keygen plaintext-transport caveat).

// BN254 scalar field modulus r
export const R =
  21888242871839275222246405745257275088548364400416034343698204186575808495617n;
const MONT_R = 1n << 256n;
const MONT_R_INV = modInv(MONT_R % R, R); // function declarations hoist

export function modInv(a, m) {
  let [old_r, r] = [((a % m) + m) % m, m];
  let [old_s, s] = [1n, 0n];
  while (r !== 0n) {
    const q = old_r / r;
    [old_r, r] = [r, old_r - q * r];
    [old_s, s] = [s, old_s - q * s];
  }
  if (old_r !== 1n) throw new Error("not invertible");
  return ((old_s % m) + m) % m;
}

export function modPow(base, exp, m) {
  let result = 1n;
  base = ((base % m) + m) % m;
  while (exp > 0n) {
    if (exp & 1n) result = (result * base) % m;
    base = (base * base) % m;
    exp >>= 1n;
  }
  return result;
}

// ---------------------------------------------------------------------------
// Grain LFSR parameter generation (mirrors zerokit_tpu/hash/grain.py /
// utils/src/poseidon/poseidon_constants.rs — generated, not hardcoded)
// ---------------------------------------------------------------------------

class GrainLFSR {
  constructor(primeNumBits, t, rf, rp) {
    const state = new Array(80).fill(false);
    state[1] = true; // is_field
    const fill = (lo, hi, value) => {
      let cur = value;
      for (let i = hi; i >= lo; i--) {
        state[i] = (cur & 1) === 1;
        cur >>= 1;
      }
    };
    fill(6, 17, primeNumBits);
    fill(18, 29, t);
    fill(30, 39, rf);
    fill(40, 49, rp);
    for (let i = 50; i < 80; i++) state[i] = true;
    this.primeNumBits = primeNumBits;
    this.state = state;
    this.head = 0;
    for (let i = 0; i < 160; i++) this._update();
  }

  _update() {
    const s = this.state;
    const h = this.head;
    const bit =
      s[(h + 62) % 80] ^
      s[(h + 51) % 80] ^
      s[(h + 38) % 80] ^
      s[(h + 23) % 80] ^
      s[(h + 13) % 80] ^
      s[h];
    s[h] = bit;
    this.head = (h + 1) % 80;
    return bit;
  }

  getBits(numBits) {
    const res = [];
    while (res.length < numBits) {
      let bit = this._update();
      while (!bit) {
        this._update(); // discard the second bit of a 0-prefixed pair
        bit = this._update();
      }
      res.push(this._update());
    }
    return res;
  }

  bitsToInt() {
    const bits = this.getBits(this.primeNumBits);
    bits.reverse();
    let val = 0n;
    for (let byteIdx = 0; byteIdx < bits.length; byteIdx += 8) {
      let b = 0n;
      for (let i = 0; i < 8 && byteIdx + i < bits.length; i++) {
        if (bits[byteIdx + i]) b |= 1n << BigInt(i);
      }
      val |= b << BigInt(byteIdx);
    }
    return val;
  }

  fieldElementsRejection(num) {
    const res = [];
    while (res.length < num) {
      const v = this.bitsToInt();
      if (v < R) res.push(v);
    }
    return res;
  }

  fieldElementsModP(num) {
    const res = [];
    for (let i = 0; i < num; i++) res.push(this.bitsToInt() % R);
    return res;
  }
}

// (t, RF, RP) — reference rln/src/hashers.rs:14-23 (skip_matrices = 0)
const ROUND_PARAMS = new Map([
  [2, [8, 56]],
  [3, [8, 57]],
  [4, [8, 56]],
  [5, [8, 60]],
  [6, [8, 60]],
  [7, [8, 63]],
  [8, [8, 64]],
  [9, [8, 63]],
]);

const paramCache = new Map();

export function poseidonParams(t) {
  if (paramCache.has(t)) return paramCache.get(t);
  const rp = ROUND_PARAMS.get(t);
  if (!rp) throw new Error(`no Poseidon parameters for t=${t}`);
  const [rf, partial] = rp;
  const lfsr = new GrainLFSR(254, t, rf, partial);
  const ark = [];
  for (let r = 0; r < rf + partial; r++) ark.push(...lfsr.fieldElementsRejection(t));
  const xs = lfsr.fieldElementsModP(t);
  const ys = lfsr.fieldElementsModP(t);
  const mds = [];
  for (let i = 0; i < t; i++) {
    const row = [];
    for (let j = 0; j < t; j++) row.push(modInv((xs[i] + ys[j]) % R, R));
    mds.push(row);
  }
  const params = { rf, rp: partial, ark, mds };
  paramCache.set(t, params);
  return params;
}

export function poseidonHash(inputs) {
  if (inputs.length === 0) throw new Error("empty input");
  const t = inputs.length + 1;
  const { rf, rp, ark, mds } = poseidonParams(t);
  let state = [0n, ...inputs.map((x) => ((BigInt(x) % R) + R) % R)];
  const pow5 = (x) => {
    const x2 = (x * x) % R;
    return (((x2 * x2) % R) * x) % R;
  };
  for (let rnd = 0; rnd < rf + rp; rnd++) {
    state = state.map((s, i) => (s + ark[rnd * t + i]) % R);
    if (rnd < rf / 2 || rnd >= rf / 2 + rp) {
      state = state.map(pow5);
    } else {
      state[0] = pow5(state[0]);
    }
    const next = new Array(t).fill(0n);
    for (let i = 0; i < t; i++) {
      let acc = 0n;
      for (let j = 0; j < t; j++) acc += mds[i][j] * state[j];
      next[i] = acc % R;
    }
    state = next;
  }
  return state[0];
}

export function poseidonHashPair(a, b) {
  return poseidonHash([a, b]);
}

// ---------------------------------------------------------------------------
// Keccak-256 (original padding 0x01) — rln/src/hashers.rs hash-to-field
// ---------------------------------------------------------------------------

const KECCAK_RC = [
  0x0000000000000001n, 0x0000000000008082n, 0x800000000000808an,
  0x8000000080008000n, 0x000000000000808bn, 0x0000000080000001n,
  0x8000000080008081n, 0x8000000000008009n, 0x000000000000008an,
  0x0000000000000088n, 0x0000000080008009n, 0x000000008000000an,
  0x000000008000808bn, 0x800000000000008bn, 0x8000000000008089n,
  0x8000000000008003n, 0x8000000000008002n, 0x8000000000000080n,
  0x000000000000800an, 0x800000008000000an, 0x8000000080008081n,
  0x8000000000008080n, 0x0000000080000001n, 0x8000000080008008n,
];
const ROTC = [1, 3, 6, 10, 15, 21, 28, 36, 45, 55, 2, 14, 27, 41, 56, 8, 25, 43, 62, 18, 39, 61, 20, 44];
const PILN = [10, 7, 11, 17, 18, 3, 5, 16, 8, 21, 24, 4, 15, 23, 19, 13, 12, 2, 20, 14, 22, 9, 6, 1];
const M64 = (1n << 64n) - 1n;

function rotl64(x, n) {
  return ((x << BigInt(n)) | (x >> BigInt(64 - n))) & M64;
}

function keccakF(st) {
  for (let round = 0; round < 24; round++) {
    const bc = [];
    for (let i = 0; i < 5; i++)
      bc[i] = st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20];
    for (let i = 0; i < 5; i++) {
      const t = bc[(i + 4) % 5] ^ rotl64(bc[(i + 1) % 5], 1);
      for (let j = 0; j < 25; j += 5) st[j + i] ^= t;
    }
    let t = st[1];
    for (let i = 0; i < 24; i++) {
      const j = PILN[i];
      const tmp = st[j];
      st[j] = rotl64(t, ROTC[i]);
      t = tmp;
    }
    for (let j = 0; j < 25; j += 5) {
      for (let i = 0; i < 5; i++) bc[i] = st[j + i];
      for (let i = 0; i < 5; i++)
        st[j + i] = bc[i] ^ (~bc[(i + 1) % 5] & M64 & bc[(i + 2) % 5]);
    }
    st[0] ^= KECCAK_RC[round];
  }
}

export function keccak256(data) {
  const st = new Array(25).fill(0n);
  const rate = 136;
  const msg = data instanceof Uint8Array ? data : new Uint8Array(data);
  let offset = 0;
  const absorb = (block) => {
    for (let i = 0; i < rate / 8; i++) {
      let lane = 0n;
      for (let b = 7; b >= 0; b--) lane = (lane << 8n) | BigInt(block[i * 8 + b]);
      st[i] ^= lane;
    }
    keccakF(st);
  };
  while (msg.length - offset >= rate) {
    absorb(msg.subarray(offset, offset + rate));
    offset += rate;
  }
  const block = new Uint8Array(rate);
  block.set(msg.subarray(offset));
  block[msg.length - offset] = 0x01;
  block[rate - 1] |= 0x80;
  absorb(block);
  const out = new Uint8Array(32);
  for (let i = 0; i < 4; i++) {
    let lane = st[i];
    for (let b = 0; b < 8; b++) {
      out[i * 8 + b] = Number(lane & 0xffn);
      lane >>= 8n;
    }
  }
  return out;
}

export function hashToFieldLe(signal) {
  const d = keccak256(signal);
  let v = 0n;
  for (let i = 31; i >= 0; i--) v = (v << 8n) | BigInt(d[i]);
  return v % R;
}

export function hashToFieldBe(signal) {
  // reference semantics (hashers.rs:84-93): reverse the digest, then read
  // big-endian — numerically equal to the LE interpretation
  const d = keccak256(signal).slice().reverse();
  let v = 0n;
  for (let i = 31; i >= 0; i--) v = (v << 8n) | BigInt(d[31 - i]);
  return v % R;
}

// ---------------------------------------------------------------------------
// ChaCha20Rng + ark UniformRand (deterministic seeded keygen —
// rln/src/protocol/keygen.rs:50-92 semantics)
// ---------------------------------------------------------------------------

const M32 = 0xffffffff;

function rotl32(v, c) {
  return ((v << c) | (v >>> (32 - c))) & M32;
}

export class ChaCha20Rng {
  constructor(seed32) {
    if (seed32.length !== 32) throw new Error("seed must be 32 bytes");
    this.key = [];
    for (let i = 0; i < 8; i++) {
      this.key.push(
        (seed32[4 * i] |
          (seed32[4 * i + 1] << 8) |
          (seed32[4 * i + 2] << 16) |
          (seed32[4 * i + 3] << 24)) >>>
          0
      );
    }
    this.counter = 0n;
    this.buf = [];
  }

  _block() {
    const state = [
      0x61707865, 0x3320646e, 0x79622d32, 0x6b206574,
      ...this.key,
      Number(this.counter & 0xffffffffn),
      Number((this.counter >> 32n) & 0xffffffffn),
      0, 0,
    ];
    const w = state.slice();
    const qr = (a, b, c, d) => {
      w[a] = (w[a] + w[b]) & M32;
      w[d] = rotl32((w[d] ^ w[a]) >>> 0, 16);
      w[c] = (w[c] + w[d]) & M32;
      w[b] = rotl32((w[b] ^ w[c]) >>> 0, 12);
      w[a] = (w[a] + w[b]) & M32;
      w[d] = rotl32((w[d] ^ w[a]) >>> 0, 8);
      w[c] = (w[c] + w[d]) & M32;
      w[b] = rotl32((w[b] ^ w[c]) >>> 0, 7);
    };
    for (let i = 0; i < 10; i++) {
      qr(0, 4, 8, 12); qr(1, 5, 9, 13); qr(2, 6, 10, 14); qr(3, 7, 11, 15);
      qr(0, 5, 10, 15); qr(1, 6, 11, 12); qr(2, 7, 8, 13); qr(3, 4, 9, 14);
    }
    this.counter += 1n;
    return w.map((x, i) => ((x + state[i]) & M32) >>> 0);
  }

  nextU32() {
    if (this.buf.length === 0) this.buf = this._block();
    return this.buf.shift();
  }

  nextU64() {
    const lo = BigInt(this.nextU32());
    const hi = BigInt(this.nextU32());
    return lo | (hi << 32n);
  }
}

export function arkFrRand(rng) {
  // ark samples the raw Montgomery representation (2 shave bits, rejection)
  const shaveMask = (1n << 62n) - 1n;
  for (;;) {
    const limbs = [rng.nextU64(), rng.nextU64(), rng.nextU64(), rng.nextU64()];
    limbs[3] &= shaveMask;
    let raw = 0n;
    for (let i = 3; i >= 0; i--) raw = (raw << 64n) | limbs[i];
    if (raw < R) return (raw * MONT_R_INV) % R;
  }
}

// ---------------------------------------------------------------------------
// Identity (keygen.rs:16-92). Random variants use WebCrypto randomness.
// ---------------------------------------------------------------------------

function randomFr() {
  // Rejection sampling after shaving to 254 bits (mirrors ark's uniform
  // Fr sampling): reducing 256 raw bits mod the 254-bit R would bias the
  // low range by ~2^-1.6.
  const shave = (1n << 254n) - 1n;
  for (;;) {
    const bytes = new Uint8Array(32);
    globalThis.crypto.getRandomValues(bytes); // browser + node >= 18
    let v = 0n;
    for (let i = 31; i >= 0; i--) v = (v << 8n) | BigInt(bytes[i]);
    v &= shave;
    if (v < R) return v;
  }
}

export function keygen() {
  const secret = randomFr();
  return { idSecret: secret, idCommitment: poseidonHash([secret]) };
}

export function extendedKeygen() {
  const trapdoor = randomFr();
  const nullifier = randomFr();
  const secret = poseidonHashPair(trapdoor, nullifier);
  return { trapdoor, nullifier, idSecret: secret, idCommitment: poseidonHash([secret]) };
}

export function seededKeygen(signal) {
  const rng = new ChaCha20Rng(keccak256(signal));
  const secret = arkFrRand(rng);
  return { idSecret: secret, idCommitment: poseidonHash([secret]) };
}

export function extendedSeededKeygen(signal) {
  const rng = new ChaCha20Rng(keccak256(signal));
  const trapdoor = arkFrRand(rng);
  const nullifier = arkFrRand(rng);
  const secret = poseidonHashPair(trapdoor, nullifier);
  return { trapdoor, nullifier, idSecret: secret, idCommitment: poseidonHash([secret]) };
}

// rate commitment for RLN membership: H(H(secret), userMessageLimit)
export function rateCommitment(idCommitment, userMessageLimit) {
  return poseidonHashPair(idCommitment, BigInt(userMessageLimit));
}

// Merkle root from a leaf and a path (bit 0 = node is left child) —
// matches compute_root_from (utils/src/merkle_tree/merkle_tree.rs:90-99).
export function computeMerkleRoot(leaf, pathElements, pathIndex) {
  let acc = BigInt(leaf);
  for (let i = 0; i < pathElements.length; i++) {
    acc = pathIndex[i] === 0
      ? poseidonHashPair(acc, pathElements[i])
      : poseidonHashPair(pathElements[i], acc);
  }
  return acc;
}
