// BN254 ate pairing + Groth16 verification in pure BigInt — the in-client
// verify half of the reference's WasmRLN (rln-wasm/src/wasm_rln.rs:28-43,
// which verifies in-process through arkworks). This is a mechanical
// transliteration of the engine's host oracle
// (zerokit_tpu/hostmath/bn254.py + arkserde.py), which is itself
// parity-tested against the native tower pairing and the snarkjs anchor
// proof. Fq12 is the flattened tower Fq[w]/(w^12 - 18 w^6 + 82)
// (xi = 9 + u, u = w^6 - 9); elements are 12-entry BigInt arrays.
//
// Not a hot path: one verify costs ~4 Miller loops + 1 final
// exponentiation of BigInt arithmetic (hundreds of ms in a browser). For
// high-rate verification keep the proving service's /verify endpoint; this
// module removes the HARD dependency on it (verification works offline).

export const Q =
  21888242871839275222246405745257275088696311157297823662689037894645226208583n;
export const R_ORDER =
  21888242871839275222246405745257275088548364400416034343698204186575808495617n;
const BN_X = 4965661367192848881n;

const mod = (a, m = Q) => ((a % m) + m) % m;

function powmod(base, exp, m = Q) {
  let result = 1n;
  base = mod(base, m);
  while (exp > 0n) {
    if (exp & 1n) result = (result * base) % m;
    base = (base * base) % m;
    exp >>= 1n;
  }
  return result;
}

const fqInv = (a) => powmod(a, Q - 2n);

// ---------------------------------------------------------------------------
// Fq2 (pairs [c0, c1], u^2 = -1) — used for G2 points and decompression
// ---------------------------------------------------------------------------

export const fq2Add = (a, b) => [mod(a[0] + b[0]), mod(a[1] + b[1])];
export const fq2Sub = (a, b) => [mod(a[0] - b[0]), mod(a[1] - b[1])];
export const fq2Neg = (a) => [mod(-a[0]), mod(-a[1])];
export function fq2Mul(a, b) {
  const t0 = a[0] * b[0];
  const t1 = a[1] * b[1];
  const t2 = (a[0] + a[1]) * (b[0] + b[1]);
  return [mod(t0 - t1), mod(t2 - t0 - t1)];
}
export const fq2Sqr = (a) => fq2Mul(a, a);
export function fq2Inv(a) {
  const norm = mod(a[0] * a[0] + a[1] * a[1]);
  const ninv = fqInv(norm);
  return [mod(a[0] * ninv), mod(-a[1] * ninv)];
}

// b2 = 3 / (9 + u)
const B2_DEN_INV = fqInv(mod(9n * 9n + 1n));
export const B_G2 = [mod(3n * 9n * B2_DEN_INV), mod(-3n * B2_DEN_INV)];

export const G1_GENERATOR = [1n, 2n];
export const G2_GENERATOR = [
  [
    10857046999023057135944570762232829481370756359578518086990519993285655852781n,
    11559732032986387107991004021392285783925812861821192530917403151452391805634n,
  ],
  [
    8495653923123431417604973247489272438418190587263600148770280649306958101930n,
    4082367875863433681332203403145435568316851327593401208105741076214120093531n,
  ],
];

// ---------------------------------------------------------------------------
// Affine group laws (null = point at infinity) — G1 over Fq, G2 over Fq2
// ---------------------------------------------------------------------------

function curveOps(fadd, fsub, fmul, fsqr, finv, fneg, fscalar, isZero, b) {
  const double = (p) => {
    if (p === null) return null;
    const [x, y] = p;
    if (isZero(y)) return null;
    const m = fmul(fscalar(fsqr(x), 3n), finv(fscalar(y, 2n)));
    const nx = fsub(fsqr(m), fscalar(x, 2n));
    const ny = fsub(fmul(m, fsub(x, nx)), y);
    return [nx, ny];
  };
  // structural equality over BigInt | BigInt[] (JSON.stringify rejects BigInt)
  const eq = (a, b2) =>
    Array.isArray(a) ? a.every((v, i) => v === b2[i]) : a === b2;
  const add = (p, q) => {
    if (p === null) return q;
    if (q === null) return p;
    const [x1, y1] = p;
    const [x2, y2] = q;
    if (eq(x1, x2)) {
      if (eq(y1, y2)) return double(p);
      return null;
    }
    const m = fmul(fsub(y2, y1), finv(fsub(x2, x1)));
    const nx = fsub(fsqr(m), fadd(x1, x2));
    const ny = fsub(fmul(m, fsub(x1, nx)), y1);
    return [nx, ny];
  };
  const mulRaw = (p, k) => {
    // raw ladder, NOT reduced mod r (subgroup checks need the true k)
    let acc = null;
    let base = p;
    while (k > 0n) {
      if (k & 1n) acc = add(acc, base);
      base = double(base);
      k >>= 1n;
    }
    return acc;
  };
  const mul = (p, k) => mulRaw(p, mod(k, R_ORDER));
  const neg = (p) => (p === null ? null : [p[0], fneg(p[1])]);
  const onCurve = (p) => {
    if (p === null) return true;
    const [x, y] = p;
    return eq(fsqr(y), fadd(fmul(fsqr(x), x), b));
  };
  return { add, double, mul, mulRaw, neg, onCurve };
}

export const G1 = curveOps(
  (a, b) => mod(a + b),
  (a, b) => mod(a - b),
  (a, b) => mod(a * b),
  (a) => mod(a * a),
  fqInv,
  (a) => mod(-a),
  (a, k) => mod(a * k),
  (a) => a === 0n,
  3n,
);

export const G2 = curveOps(
  fq2Add,
  fq2Sub,
  fq2Mul,
  fq2Sqr,
  fq2Inv,
  fq2Neg,
  (a, k) => [mod(a[0] * k), mod(a[1] * k)],
  (a) => a[0] === 0n && a[1] === 0n,
  B_G2,
);

// ---------------------------------------------------------------------------
// Fq12 = Fq[w]/(w^12 - 18 w^6 + 82) — 12-entry BigInt arrays
// ---------------------------------------------------------------------------

const FQ12_ONE = [1n, 0n, 0n, 0n, 0n, 0n, 0n, 0n, 0n, 0n, 0n, 0n];

export function fq12Mul(a, b) {
  const prod = new Array(23).fill(0n);
  for (let i = 0; i < 12; i++) {
    const ai = a[i];
    if (ai === 0n) continue;
    for (let j = 0; j < 12; j++) {
      if (b[j] !== 0n) prod[i + j] += ai * b[j];
    }
  }
  for (let deg = 22; deg >= 12; deg--) {
    const c = prod[deg];
    if (c === 0n) continue;
    prod[deg] = 0n;
    const base = deg - 12;
    prod[base + 6] += 18n * c; // w^12 = 18 w^6 - 82
    prod[base] -= 82n * c;
  }
  return prod.slice(0, 12).map((c) => mod(c));
}

const fq12Sqr = (a) => fq12Mul(a, a);
const fq12Scalar = (a, k) => a.map((c) => mod(c * k));
const fq12Add = (a, b) => a.map((c, i) => mod(c + b[i]));
const fq12Sub = (a, b) => a.map((c, i) => mod(c - b[i]));
const fq12Neg = (a) => a.map((c) => mod(-c));
const fq12Eq = (a, b) => a.every((c, i) => c === b[i]);

export function fq12Pow(a, e) {
  let result = FQ12_ONE;
  let base = a;
  while (e > 0n) {
    if (e & 1n) result = fq12Mul(result, base);
    base = fq12Sqr(base);
    e >>= 1n;
  }
  return result;
}

function polyDegree(p) {
  for (let i = p.length - 1; i >= 0; i--) if (mod(p[i]) !== 0n) return i;
  return -1;
}

export function fq12Inv(a) {
  // extended Euclid over Fq[w] against the modulus polynomial
  let lm = [1n, ...new Array(12).fill(0n)];
  let hm = new Array(13).fill(0n);
  let low = [...a, 0n];
  let high = [82n, 0n, 0n, 0n, 0n, 0n, mod(-18n), 0n, 0n, 0n, 0n, 0n, 1n];
  while (polyDegree(low) > 0) {
    const dl = polyDegree(low);
    const dh = polyDegree(high);
    if (dl > dh) {
      [low, high] = [high, low];
      [lm, hm] = [hm, lm];
      continue;
    }
    const factor = mod(high[dh] * fqInv(low[dl]));
    const shift = dh - dl;
    for (let i = 0; i <= dl; i++) high[i + shift] = mod(high[i + shift] - factor * low[i]);
    for (let i = 0; i < lm.length - shift; i++)
      hm[i + shift] = mod(hm[i + shift] - factor * lm[i]);
    [low, high] = [high, low];
    [lm, hm] = [hm, lm];
  }
  const invConst = fqInv(mod(low[0]));
  return lm.slice(0, 12).map((c) => mod(c * invConst));
}

const fq12Div = (a, b) => fq12Mul(a, fq12Inv(b));

// ---------------------------------------------------------------------------
// Ate pairing (affine Miller loop over twisted points in E(Fq12))
// ---------------------------------------------------------------------------

const ATE_LOOP_COUNT = 6n * BN_X + 2n;
const LOG_ATE = ATE_LOOP_COUNT.toString(2).length - 2;

const W2 = FQ12_ONE.map((_, i) => (i === 2 ? 1n : 0n));
const W3 = FQ12_ONE.map((_, i) => (i === 3 ? 1n : 0n));
const W1 = FQ12_ONE.map((_, i) => (i === 1 ? 1n : 0n));

function twist(pt) {
  if (pt === null) return null;
  const [[x0, x1], [y0, y1]] = pt;
  const nx = new Array(12).fill(0n);
  nx[0] = mod(x0 - 9n * x1);
  nx[6] = x1;
  const ny = new Array(12).fill(0n);
  ny[0] = mod(y0 - 9n * y1);
  ny[6] = y1;
  return [fq12Mul(nx, W2), fq12Mul(ny, W3)];
}

function castG1(pt) {
  if (pt === null) return null;
  const [x, y] = pt;
  return [
    FQ12_ONE.map((_, i) => (i === 0 ? x : 0n)),
    FQ12_ONE.map((_, i) => (i === 0 ? y : 0n)),
  ];
}

function f12Double(p) {
  const [x, y] = p;
  const m = fq12Div(fq12Scalar(fq12Sqr(x), 3n), fq12Scalar(y, 2n));
  const nx = fq12Sub(fq12Sqr(m), fq12Scalar(x, 2n));
  const ny = fq12Sub(fq12Mul(m, fq12Sub(x, nx)), y);
  return [nx, ny];
}

function f12Add(p, q) {
  if (p === null) return q;
  if (q === null) return p;
  const [x1, y1] = p;
  const [x2, y2] = q;
  if (fq12Eq(x1, x2) && fq12Eq(y1, y2)) return f12Double(p);
  if (fq12Eq(x1, x2)) return null;
  const m = fq12Div(fq12Sub(y2, y1), fq12Sub(x2, x1));
  const nx = fq12Sub(fq12Sqr(m), fq12Add(x1, x2));
  const ny = fq12Sub(fq12Mul(m, fq12Sub(x1, nx)), y1);
  return [nx, ny];
}

function lineFunc(p1, p2, t) {
  const [x1, y1] = p1;
  const [x2, y2] = p2;
  const [xt, yt] = t;
  if (!fq12Eq(x1, x2)) {
    const m = fq12Div(fq12Sub(y2, y1), fq12Sub(x2, x1));
    return fq12Sub(fq12Mul(m, fq12Sub(xt, x1)), fq12Sub(yt, y1));
  }
  if (fq12Eq(y1, y2)) {
    const m = fq12Div(fq12Scalar(fq12Sqr(x1), 3n), fq12Scalar(y1, 2n));
    return fq12Sub(fq12Mul(m, fq12Sub(xt, x1)), fq12Sub(yt, y1));
  }
  return fq12Sub(xt, x1);
}

export function millerLoop(qPt, pPt) {
  if (qPt === null || pPt === null) return FQ12_ONE;
  const qt = twist(qPt);
  const pt = castG1(pPt);
  let rPt = qt;
  let f = FQ12_ONE;
  for (let i = LOG_ATE; i >= 0; i--) {
    f = fq12Mul(fq12Sqr(f), lineFunc(rPt, rPt, pt));
    rPt = f12Double(rPt);
    if (ATE_LOOP_COUNT & (1n << BigInt(i))) {
      f = fq12Mul(f, lineFunc(rPt, qt, pt));
      rPt = f12Add(rPt, qt);
    }
  }
  const q1 = [fq12Pow(qt[0], Q), fq12Pow(qt[1], Q)];
  const nq2 = [fq12Pow(q1[0], Q), fq12Neg(fq12Pow(q1[1], Q))];
  f = fq12Mul(f, lineFunc(rPt, q1, pt));
  rPt = f12Add(rPt, q1);
  f = fq12Mul(f, lineFunc(rPt, nq2, pt));
  return f;
}

// Frobenius f^(q^k) via precomputed (w^(q^k))^i bases (Fq-linear map)
const frobBases = new Map();
function frobBasis(k) {
  if (frobBases.has(k)) return frobBases.get(k);
  let wq;
  if (k === 1) {
    wq = fq12Pow(W1, Q);
  } else {
    wq = fq12Frobenius(frobBasis(1)[1], k - 1);
  }
  const pows = [FQ12_ONE];
  for (let i = 0; i < 11; i++) pows.push(fq12Mul(pows[pows.length - 1], wq));
  frobBases.set(k, pows);
  return pows;
}

export function fq12Frobenius(f, k = 1) {
  k %= 12;
  if (k === 0) return f;
  const basis = frobBasis(k);
  const out = new Array(12).fill(0n);
  for (let i = 0; i < 12; i++) {
    const c = f[i];
    if (c === 0n) continue;
    const bi = basis[i];
    for (let j = 0; j < 12; j++) {
      if (bi[j] !== 0n) out[j] += c * bi[j];
    }
  }
  return out.map((c) => mod(c));
}

const cycloConj = (f) => fq12Frobenius(f, 6);

export function finalExponentiation(f) {
  // easy part: f^((q^6 - 1)(q^2 + 1))
  f = fq12Mul(fq12Frobenius(f, 6), fq12Inv(f));
  f = fq12Mul(fq12Frobenius(f, 2), f);
  const m = f;
  // hard part: Scott et al. addition chain (matches hostmath/bn254.py)
  const mx = fq12Pow(m, BN_X);
  const mx2 = fq12Pow(mx, BN_X);
  const mx3 = fq12Pow(mx2, BN_X);
  const y0 = fq12Mul(
    fq12Mul(fq12Frobenius(m, 1), fq12Frobenius(m, 2)),
    fq12Frobenius(m, 3),
  );
  const y1 = cycloConj(m);
  const y2 = fq12Frobenius(mx2, 2);
  const y3 = cycloConj(fq12Frobenius(mx, 1));
  const y4 = cycloConj(fq12Mul(mx, fq12Frobenius(mx2, 1)));
  const y5 = cycloConj(mx2);
  const y6 = cycloConj(fq12Mul(mx3, fq12Frobenius(mx3, 1)));
  let t0 = fq12Sqr(y6);
  t0 = fq12Mul(t0, y4);
  t0 = fq12Mul(t0, y5);
  let t1 = fq12Mul(y3, y5);
  t1 = fq12Mul(t1, t0);
  t0 = fq12Mul(t0, y2);
  t1 = fq12Sqr(t1);
  t1 = fq12Mul(t1, t0);
  t1 = fq12Sqr(t1);
  t0 = fq12Mul(t1, y1);
  t1 = fq12Mul(t1, y0);
  t0 = fq12Sqr(t0);
  return fq12Mul(t0, t1);
}

export function pairing(qPt, pPt) {
  return finalExponentiation(millerLoop(qPt, pPt));
}

/** prod e(P_i, Q_i) == 1 with one shared final exponentiation.
 *  pairs: array of [g1Point, g2Point] (null = infinity, skipped). */
export function multiPairingIsOne(pairs) {
  let acc = FQ12_ONE;
  for (const [pPt, qPt] of pairs) {
    if (pPt === null || qPt === null) continue;
    acc = fq12Mul(acc, millerLoop(qPt, pPt));
  }
  return fq12Eq(finalExponentiation(acc), FQ12_ONE);
}

// ---------------------------------------------------------------------------
// ark compressed point decoding (arkserde.py semantics) + validation
// ---------------------------------------------------------------------------

const FLAG_INFINITY = 0x40;
const FLAG_Y_NEG = 0x80;
const FLAG_MASK = 0xc0;

function leToBig(bytes) {
  let v = 0n;
  for (let i = bytes.length - 1; i >= 0; i--) v = (v << 8n) | BigInt(bytes[i]);
  return v;
}

const fqIsNeg = (y) => y > mod(-y);
function fq2IsNeg(y) {
  const ny = fq2Neg(y);
  return y[1] > ny[1] || (y[1] === ny[1] && y[0] > ny[0]);
}

const SQRT_EXP = (Q + 1n) / 4n; // Q % 4 == 3

function fqSqrt(a) {
  a = mod(a);
  const r = powmod(a, SQRT_EXP);
  return (r * r) % Q === a ? r : null;
}

function fq2Sqrt(a) {
  const [a0, a1] = [mod(a[0]), mod(a[1])];
  if (a1 === 0n) {
    let r = fqSqrt(a0);
    if (r !== null) return [r, 0n];
    r = fqSqrt(mod(-a0));
    return r === null ? null : [0n, r];
  }
  const s = fqSqrt(mod(a0 * a0 + a1 * a1));
  if (s === null) return null;
  const twoInv = fqInv(2n);
  let x = fqSqrt(mod((a0 + s) * twoInv));
  if (x === null) x = fqSqrt(mod((a0 - s) * twoInv));
  if (x === null) return null;
  const y = mod(a1 * fqInv(mod(2n * x)));
  const cand = [x, y];
  const sq = fq2Sqr(cand);
  if (sq[0] !== a0 || sq[1] !== a1) return null;
  return cand;
}

/** 32-byte ark compressed G1 -> [x, y] | null. Throws on invalid points. */
export function g1FromCompressed(bytes) {
  if (bytes.length !== 32) throw new Error("g1: need 32 bytes");
  const flags = bytes[31] & FLAG_MASK;
  const xb = Uint8Array.from(bytes);
  xb[31] &= ~FLAG_MASK & 0xff;
  if (flags & FLAG_INFINITY) return null;
  const x = leToBig(xb);
  if (x >= Q) throw new Error("g1: non-canonical x");
  let y = fqSqrt(mod(x * x * x + 3n));
  if (y === null) throw new Error("g1: not on curve");
  if (Boolean(flags & FLAG_Y_NEG) !== fqIsNeg(y)) y = mod(-y);
  return [x, y];
}

/** 64-byte ark compressed G2 -> [[x0,x1],[y0,y1]] | null. Validates the
 *  r-torsion subgroup (pairing semantics are undefined outside it). */
export function g2FromCompressed(bytes, checkSubgroup = true) {
  if (bytes.length !== 64) throw new Error("g2: need 64 bytes");
  const flags = bytes[63] & FLAG_MASK;
  const xb = Uint8Array.from(bytes);
  xb[63] &= ~FLAG_MASK & 0xff;
  if (flags & FLAG_INFINITY) return null;
  const x = [leToBig(xb.subarray(0, 32)), leToBig(xb.subarray(32, 64))];
  if (x[0] >= Q || x[1] >= Q) throw new Error("g2: non-canonical x");
  const rhs = fq2Add(fq2Mul(fq2Sqr(x), x), B_G2);
  let y = fq2Sqrt(rhs);
  if (y === null) throw new Error("g2: not on curve");
  if (Boolean(flags & FLAG_Y_NEG) !== fq2IsNeg(y)) y = fq2Neg(y);
  const pt = [x, y];
  if (checkSubgroup && G2.mulRaw(pt, R_ORDER) !== null)
    throw new Error("g2: not in the r-torsion subgroup");
  return pt;
}

// ---------------------------------------------------------------------------
// Groth16 verification
// ---------------------------------------------------------------------------

/** 128-byte compressed Groth16 proof -> { a, b, c } affine points. */
export function proofFromBytes(bytes) {
  if (bytes.length !== 128) throw new Error("proof: need 128 bytes");
  return {
    a: g1FromCompressed(bytes.subarray(0, 32)),
    b: g2FromCompressed(bytes.subarray(32, 96)),
    c: g1FromCompressed(bytes.subarray(96, 128)),
  };
}

/** vk: { alphaG1: [x,y], betaG2, gammaG2, deltaG2: [[..],[..]],
 *  gammaAbcG1: [[x,y], ...] } with BigInt (or decimal-string) coordinates.
 *  publicInputs: array of BigInt Fr values in circuit order
 *  (single: [y, root, nullifier, x, extNullifier] — proof.rs:861-886). */
export function verifyGroth16(vk, proof, publicInputs) {
  const big = (v) => (typeof v === "bigint" ? v : BigInt(v));
  const g1 = (p) => (p === null ? null : [big(p[0]), big(p[1])]);
  const g2 = (p) =>
    p === null ? null : [[big(p[0][0]), big(p[0][1])], [big(p[1][0]), big(p[1][1])]];
  const abc = vk.gammaAbcG1.map(g1);
  if (publicInputs.length !== abc.length - 1)
    throw new Error(`expected ${abc.length - 1} public inputs`);
  const { a, b, c } = proof;
  if (!G1.onCurve(a) || !G1.onCurve(c) || !G2.onCurve(b)) return false;
  let acc = abc[0];
  for (let i = 0; i < publicInputs.length; i++)
    acc = G1.add(acc, G1.mul(abc[i + 1], mod(big(publicInputs[i]), R_ORDER)));
  return multiPairingIsOne([
    [G1.neg(a), b],
    [g1(vk.alphaG1), g2(vk.betaG2)],
    [acc, g2(vk.gammaG2)],
    [c, g2(vk.deltaG2)],
  ]);
}

/** Public-input ordering for RLN proof values (proof.rs:861-886). */
export function rlnPublicInputs(values) {
  if (values.mode === "single")
    return [values.y, values.root, values.nullifier, values.x, values.externalNullifier];
  return [
    ...values.ys,
    values.root,
    ...values.nullifiers,
    values.x,
    values.externalNullifier,
    ...values.selectorUsed.map((u) => (u ? 1n : 0n)),
  ];
}
