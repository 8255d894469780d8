// BN254 optimal-ate pairing and Groth16 verification primitives (host side).
//
// Role: fast verification for the serving path. The reference verifies
// through ark-groth16 (rln/src/protocol/proof.rs:856-894, ~1-2 ms); the
// framework's pure-Python pairing (zerokit_tpu/hostmath/bn254.py) is the
// bit-exact oracle but runs ~170 ms/proof — far too slow for a >=1000
// proofs/s pipeline. This file implements the same pairing over the proper
// Fq2/Fq6/Fq12 tower with a projective Miller loop (no per-step inversions)
// and the Scott et al. hard-part final exponentiation; parity against the
// Python oracle is asserted in tests/test_hostmath.py.
//
// Tower: Fq2 = Fq[u]/(u^2+1), Fq6 = Fq2[v]/(v^3 - xi), xi = 9+u,
// Fq12 = Fq6[w]/(w^2 - v). D-type twist: E'/Fq2: y^2 = x^3 + 3/xi,
// untwist psi(x, y) = (x w^2, y w^3).
//
// Line function at P=(xP,yP) for a step at R=(X,Y,Z) on E' (derived from
// l = yP - lambda' xP w + (lambda' x' - y') w^3, scaled by a nonzero Fq2
// factor, which the final exponentiation kills):
//   doubling (scale 2YZ^2): c0 = 2YZ^2*yP, cw = -3X^2 Z*xP,
//                           cw3 = 3X^3 - 2Y^2 Z
//   addition (scale v = x2 Z - X; u = y2 Z - Y):
//                           c0 = v*yP, cw = -u*xP, cw3 = u*x2 - v*y2
// Positions in the tower: c0 -> a0.d0, cw -> a1.d0, cw3 -> a1.d1.
//
// All external I/O is canonical little-endian 32-byte field elements;
// all-zero coordinates encode the point at infinity.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace pairing {

typedef unsigned __int128 u128;

// ---------------------------------------------------------------------------
// Fq Montgomery arithmetic (4 x 64-bit limbs, CIOS)
// ---------------------------------------------------------------------------

static const uint64_t MOD_Q[4] = {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                                  0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const uint64_t NINV_Q = 0x87d20782e4866389ULL;
static const uint64_t R2_Q[4] = {0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                                 0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL};
static const uint64_t ONE_Q[4] = {0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                                  0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL};
// q - 2 (Fermat inversion exponent)
static const uint64_t QM2[4] = {0x3c208c16d87cfd45ULL, 0x97816a916871ca8dULL,
                                0xb85045b68181585dULL, 0x30644e72e131a029ULL};

// BN parameter x and the ate loop count 6x+2
static const uint64_t BN_X = 0x44e992b44a6909f1ULL;
static const uint64_t ATE_LO = 0x9d797039be763ba8ULL;
static const uint64_t ATE_HI = 0x1ULL;  // 65-bit value 0x1_9d797039be763ba8

struct Fp {
  uint64_t v[4];
};

static inline bool fp_geq_mod(const uint64_t a[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] > MOD_Q[i]) return true;
    if (a[i] < MOD_Q[i]) return false;
  }
  return true;
}

static inline void fp_sub_mod(uint64_t a[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - MOD_Q[i] - (uint64_t)borrow;
    a[i] = (uint64_t)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

static inline void fp_add(Fp &o, const Fp &a, const Fp &b) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + (uint64_t)carry;
    o.v[i] = (uint64_t)s;
    carry = s >> 64;
  }
  if (carry || fp_geq_mod(o.v)) fp_sub_mod(o.v);
}

static inline void fp_sub(Fp &o, const Fp &a, const Fp &b) {
  u128 borrow = 0;
  uint64_t t[4];
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - (uint64_t)borrow;
    t[i] = (uint64_t)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)t[i] + MOD_Q[i] + (uint64_t)carry;
      t[i] = (uint64_t)s;
      carry = s >> 64;
    }
  }
  std::memcpy(o.v, t, 32);
}

static inline void fp_neg(Fp &o, const Fp &a) {
  bool zero = !(a.v[0] | a.v[1] | a.v[2] | a.v[3]);
  if (zero) {
    std::memset(o.v, 0, 32);
    return;
  }
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)MOD_Q[i] - a.v[i] - (uint64_t)borrow;
    o.v[i] = (uint64_t)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

static inline void fp_mul(Fp &o, const Fp &a, const Fp &b) {
  uint64_t t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)t[j] + (u128)a.v[i] * b.v[j] + (uint64_t)carry;
      t[j] = (uint64_t)cur;
      carry = cur >> 64;
    }
    u128 cur4 = (u128)t[4] + (uint64_t)carry;
    t[4] = (uint64_t)cur4;
    t[5] = (uint64_t)(cur4 >> 64);

    uint64_t m = t[0] * NINV_Q;
    carry = ((u128)t[0] + (u128)m * MOD_Q[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 cur = (u128)t[j] + (u128)m * MOD_Q[j] + (uint64_t)carry;
      t[j - 1] = (uint64_t)cur;
      carry = cur >> 64;
    }
    u128 last = (u128)t[4] + (uint64_t)carry;
    t[3] = (uint64_t)last;
    t[4] = t[5] + (uint64_t)(last >> 64);
  }
  std::memcpy(o.v, t, 32);
  if (t[4] || fp_geq_mod(o.v)) fp_sub_mod(o.v);
}

static inline void fp_sqr(Fp &o, const Fp &a) { fp_mul(o, a, a); }

static inline void fp_set_one(Fp &o) { std::memcpy(o.v, ONE_Q, 32); }
static inline void fp_set_zero(Fp &o) { std::memset(o.v, 0, 32); }
static inline bool fp_is_zero(const Fp &a) {
  return !(a.v[0] | a.v[1] | a.v[2] | a.v[3]);
}

static void fp_pow(Fp &o, const Fp &a, const uint64_t e[4]) {
  Fp result, base = a;
  fp_set_one(result);
  // LSB-first square-and-multiply
  for (int limb = 0; limb < 4; ++limb) {
    uint64_t bits = e[limb];
    for (int i = 0; i < 64; ++i) {
      if (bits & 1) fp_mul(result, result, base);
      fp_sqr(base, base);
      bits >>= 1;
    }
  }
  o = result;
}

static inline void fp_inv(Fp &o, const Fp &a) { fp_pow(o, a, QM2); }

static inline void fp_from_le(Fp &o, const uint8_t *b) {
  std::memcpy(o.v, b, 32);
  Fp r2;
  std::memcpy(r2.v, R2_Q, 32);
  fp_mul(o, o, r2);
}

static inline void fp_to_le(uint8_t *b, const Fp &a) {
  Fp one, t;
  one.v[0] = 1;
  one.v[1] = one.v[2] = one.v[3] = 0;
  fp_mul(t, a, one);
  std::memcpy(b, t.v, 32);
}

// ---------------------------------------------------------------------------
// Fq2 = Fq[u]/(u^2 + 1)
// ---------------------------------------------------------------------------

struct Fp2 {
  Fp a, b;  // a + b u
};

static inline void f2_add(Fp2 &o, const Fp2 &x, const Fp2 &y) {
  fp_add(o.a, x.a, y.a);
  fp_add(o.b, x.b, y.b);
}
static inline void f2_sub(Fp2 &o, const Fp2 &x, const Fp2 &y) {
  fp_sub(o.a, x.a, y.a);
  fp_sub(o.b, x.b, y.b);
}
static inline void f2_neg(Fp2 &o, const Fp2 &x) {
  fp_neg(o.a, x.a);
  fp_neg(o.b, x.b);
}
static inline void f2_conj(Fp2 &o, const Fp2 &x) {
  o.a = x.a;
  fp_neg(o.b, x.b);
}
static inline void f2_mul(Fp2 &o, const Fp2 &x, const Fp2 &y) {
  Fp t0, t1, t2, s1, s2;
  fp_mul(t0, x.a, y.a);
  fp_mul(t1, x.b, y.b);
  fp_add(s1, x.a, x.b);
  fp_add(s2, y.a, y.b);
  fp_mul(t2, s1, s2);
  Fp o_a;
  fp_sub(o_a, t0, t1);
  fp_sub(t2, t2, t0);
  fp_sub(o.b, t2, t1);
  o.a = o_a;
}
static inline void f2_sqr(Fp2 &o, const Fp2 &x) {
  // (a+bu)^2 = (a+b)(a-b) + 2ab u
  Fp s, d, t;
  fp_add(s, x.a, x.b);
  fp_sub(d, x.a, x.b);
  fp_mul(t, x.a, x.b);
  fp_mul(o.a, s, d);
  fp_add(o.b, t, t);
}
static inline void f2_mul_fp(Fp2 &o, const Fp2 &x, const Fp &k) {
  fp_mul(o.a, x.a, k);
  fp_mul(o.b, x.b, k);
}
static inline void f2_dbl(Fp2 &o, const Fp2 &x) { f2_add(o, x, x); }
static inline void f2_inv(Fp2 &o, const Fp2 &x) {
  Fp n, t, ninv;
  fp_sqr(n, x.a);
  fp_sqr(t, x.b);
  fp_add(n, n, t);
  fp_inv(ninv, n);
  fp_mul(o.a, x.a, ninv);
  Fp nb;
  fp_neg(nb, x.b);
  fp_mul(o.b, nb, ninv);
}
static inline void f2_set_zero(Fp2 &o) {
  fp_set_zero(o.a);
  fp_set_zero(o.b);
}
static inline void f2_set_one(Fp2 &o) {
  fp_set_one(o.a);
  fp_set_zero(o.b);
}
static inline bool f2_is_zero(const Fp2 &x) {
  return fp_is_zero(x.a) && fp_is_zero(x.b);
}
// multiply by xi = 9 + u
static inline void f2_mul_xi(Fp2 &o, const Fp2 &x) {
  // (9a - b) + (9b + a) u
  Fp t8a, t8b, na, nb;
  fp_add(t8a, x.a, x.a);  // 2a
  fp_add(t8a, t8a, t8a);  // 4a
  fp_add(t8a, t8a, t8a);  // 8a
  fp_add(na, t8a, x.a);   // 9a
  fp_add(t8b, x.b, x.b);
  fp_add(t8b, t8b, t8b);
  fp_add(t8b, t8b, t8b);
  fp_add(nb, t8b, x.b);  // 9b
  Fp oa;
  fp_sub(oa, na, x.b);
  fp_add(o.b, nb, x.a);
  o.a = oa;
}

// ---------------------------------------------------------------------------
// Fq6 = Fq2[v]/(v^3 - xi)
// ---------------------------------------------------------------------------

struct Fp6 {
  Fp2 c0, c1, c2;
};

static inline void f6_add(Fp6 &o, const Fp6 &x, const Fp6 &y) {
  f2_add(o.c0, x.c0, y.c0);
  f2_add(o.c1, x.c1, y.c1);
  f2_add(o.c2, x.c2, y.c2);
}
static inline void f6_sub(Fp6 &o, const Fp6 &x, const Fp6 &y) {
  f2_sub(o.c0, x.c0, y.c0);
  f2_sub(o.c1, x.c1, y.c1);
  f2_sub(o.c2, x.c2, y.c2);
}
static inline void f6_neg(Fp6 &o, const Fp6 &x) {
  f2_neg(o.c0, x.c0);
  f2_neg(o.c1, x.c1);
  f2_neg(o.c2, x.c2);
}
static inline void f6_set_zero(Fp6 &o) {
  f2_set_zero(o.c0);
  f2_set_zero(o.c1);
  f2_set_zero(o.c2);
}
static inline void f6_set_one(Fp6 &o) {
  f2_set_one(o.c0);
  f2_set_zero(o.c1);
  f2_set_zero(o.c2);
}
static inline bool f6_is_zero(const Fp6 &x) {
  return f2_is_zero(x.c0) && f2_is_zero(x.c1) && f2_is_zero(x.c2);
}
// multiply by v: (c0, c1, c2) -> (xi c2, c0, c1)
static inline void f6_mul_v(Fp6 &o, const Fp6 &x) {
  Fp2 t;
  f2_mul_xi(t, x.c2);
  o.c2 = x.c1;
  o.c1 = x.c0;
  o.c0 = t;
}
static inline void f6_mul(Fp6 &o, const Fp6 &x, const Fp6 &y) {
  Fp2 v0, v1, v2, t0, t1, t2;
  f2_mul(v0, x.c0, y.c0);
  f2_mul(v1, x.c1, y.c1);
  f2_mul(v2, x.c2, y.c2);
  // c0 = v0 + xi((x1+x2)(y1+y2) - v1 - v2)
  Fp2 a12, b12;
  f2_add(a12, x.c1, x.c2);
  f2_add(b12, y.c1, y.c2);
  f2_mul(t0, a12, b12);
  f2_sub(t0, t0, v1);
  f2_sub(t0, t0, v2);
  f2_mul_xi(t0, t0);
  // c1 = (x0+x1)(y0+y1) - v0 - v1 + xi v2
  Fp2 a01, b01;
  f2_add(a01, x.c0, x.c1);
  f2_add(b01, y.c0, y.c1);
  f2_mul(t1, a01, b01);
  f2_sub(t1, t1, v0);
  f2_sub(t1, t1, v1);
  Fp2 xv2;
  f2_mul_xi(xv2, v2);
  f2_add(t1, t1, xv2);
  // c2 = (x0+x2)(y0+y2) - v0 - v2 + v1
  Fp2 a02, b02;
  f2_add(a02, x.c0, x.c2);
  f2_add(b02, y.c0, y.c2);
  f2_mul(t2, a02, b02);
  f2_sub(t2, t2, v0);
  f2_sub(t2, t2, v2);
  f2_add(t2, t2, v1);
  f2_add(o.c0, t0, v0);
  o.c1 = t1;
  o.c2 = t2;
}
static inline void f6_sqr(Fp6 &o, const Fp6 &x) { f6_mul(o, x, x); }
static inline void f6_inv(Fp6 &o, const Fp6 &x) {
  // standard: A = c0^2 - xi c1 c2, B = xi c2^2 - c0 c1, C = c1^2 - c0 c2
  // t = c0 A + xi(c2 B + c1 C); inv = (A, B, C) / t
  Fp2 A, B, C, t, tmp;
  f2_sqr(A, x.c0);
  f2_mul(tmp, x.c1, x.c2);
  f2_mul_xi(tmp, tmp);
  f2_sub(A, A, tmp);
  f2_sqr(B, x.c2);
  f2_mul_xi(B, B);
  f2_mul(tmp, x.c0, x.c1);
  f2_sub(B, B, tmp);
  f2_sqr(C, x.c1);
  f2_mul(tmp, x.c0, x.c2);
  f2_sub(C, C, tmp);
  Fp2 t1, t2;
  f2_mul(t1, x.c2, B);
  f2_mul(t2, x.c1, C);
  f2_add(t1, t1, t2);
  f2_mul_xi(t1, t1);
  f2_mul(t, x.c0, A);
  f2_add(t, t, t1);
  Fp2 tinv;
  f2_inv(tinv, t);
  f2_mul(o.c0, A, tinv);
  f2_mul(o.c1, B, tinv);
  f2_mul(o.c2, C, tinv);
}
static inline void f6_mul_fp2(Fp6 &o, const Fp6 &x, const Fp2 &k) {
  f2_mul(o.c0, x.c0, k);
  f2_mul(o.c1, x.c1, k);
  f2_mul(o.c2, x.c2, k);
}

// ---------------------------------------------------------------------------
// Fq12 = Fq6[w]/(w^2 - v)
// ---------------------------------------------------------------------------

struct Fp12 {
  Fp6 a, b;  // a + b w
};

static inline void f12_set_one(Fp12 &o) {
  f6_set_one(o.a);
  f6_set_zero(o.b);
}
static inline bool f12_is_one(const Fp12 &x) {
  if (!f6_is_zero(x.b)) return false;
  Fp6 one;
  f6_set_one(one);
  return std::memcmp(&x.a, &one, sizeof(Fp6)) == 0;
}
static inline void f12_mul(Fp12 &o, const Fp12 &x, const Fp12 &y) {
  Fp6 v0, v1, t, sx, sy;
  f6_mul(v0, x.a, y.a);
  f6_mul(v1, x.b, y.b);
  f6_add(sx, x.a, x.b);
  f6_add(sy, y.a, y.b);
  f6_mul(t, sx, sy);
  f6_sub(t, t, v0);
  f6_sub(t, t, v1);
  Fp6 vv1;
  f6_mul_v(vv1, v1);
  f6_add(o.a, v0, vv1);
  o.b = t;
}
static inline void f12_sqr(Fp12 &o, const Fp12 &x) {
  // complex squaring: c1 = 2ab; c0 = (a+b)(a+vb) - ab - v ab
  Fp6 ab, apb, avb, t;
  f6_mul(ab, x.a, x.b);
  f6_add(apb, x.a, x.b);
  f6_mul_v(avb, x.b);
  f6_add(avb, x.a, avb);
  f6_mul(t, apb, avb);
  f6_sub(t, t, ab);
  Fp6 vab;
  f6_mul_v(vab, ab);
  f6_sub(t, t, vab);
  o.a = t;
  f6_add(o.b, ab, ab);
}
static inline void f12_conj(Fp12 &o, const Fp12 &x) {
  o.a = x.a;
  f6_neg(o.b, x.b);
}
static inline void f12_inv(Fp12 &o, const Fp12 &x) {
  Fp6 a2, b2, t, tinv;
  f6_sqr(a2, x.a);
  f6_sqr(b2, x.b);
  f6_mul_v(t, b2);
  f6_sub(t, a2, t);
  f6_inv(tinv, t);
  f6_mul(o.a, x.a, tinv);
  Fp6 nb;
  f6_neg(nb, x.b);
  f6_mul(o.b, nb, tinv);
}

// gamma1 = xi^((q-1)/6) in Fq2 and its powers (Montgomery form, set at init)
static Fp2 G1F[6];  // G1F[i] = gamma1^i, i = 0..5
static bool g_frob_ready = false;

static void frob_init() {
  if (g_frob_ready) return;
  static const uint64_t G1C0[4] = {0xd60b35dadcc9e470ULL, 0x5c521e08292f2176ULL,
                                   0xe8b99fdd76e68b60ULL, 0x1284b71c2865a7dfULL};
  static const uint64_t G1C1[4] = {0xca5cf05f80f362acULL, 0x747992778eeec7e5ULL,
                                   0xa6327cfe12150b8eULL, 0x246996f3b4fae7e6ULL};
  uint8_t buf[32];
  std::memcpy(buf, G1C0, 32);
  fp_from_le(G1F[1].a, buf);
  std::memcpy(buf, G1C1, 32);
  fp_from_le(G1F[1].b, buf);
  f2_set_one(G1F[0]);
  for (int i = 2; i < 6; ++i) f2_mul(G1F[i], G1F[i - 1], G1F[1]);
  g_frob_ready = true;
}

// f^q on Fq6: (c0*, c1* g2, c2* g4)
static inline void f6_frob(Fp6 &o, const Fp6 &x) {
  Fp2 t;
  f2_conj(o.c0, x.c0);
  f2_conj(t, x.c1);
  f2_mul(o.c1, t, G1F[2]);
  f2_conj(t, x.c2);
  f2_mul(o.c2, t, G1F[4]);
}

// f^q on Fq12
static inline void f12_frob(Fp12 &o, const Fp12 &x) {
  f6_frob(o.a, x.a);
  Fp6 t;
  f6_frob(t, x.b);
  f6_mul_fp2(o.b, t, G1F[1]);
}

static inline void f12_frob_k(Fp12 &o, const Fp12 &x, int k) {
  o = x;
  Fp12 t;
  for (int i = 0; i < k; ++i) {
    f12_frob(t, o);
    o = t;
  }
}

static void f12_pow_u64(Fp12 &o, const Fp12 &x, uint64_t e) {
  Fp12 result, base = x;
  f12_set_one(result);
  while (e) {
    if (e & 1) {
      Fp12 t;
      f12_mul(t, result, base);
      result = t;
    }
    Fp12 s;
    f12_sqr(s, base);
    base = s;
    e >>= 1;
  }
  o = result;
}

// ---------------------------------------------------------------------------
// Curve points
// ---------------------------------------------------------------------------

struct G1Affine {
  Fp x, y;
  bool inf;
};
struct G2Affine {
  Fp2 x, y;
  bool inf;
};
struct G2Proj {
  Fp2 X, Y, Z;
};

// ---------------------------------------------------------------------------
// Miller loop
// ---------------------------------------------------------------------------

// Sparse line element: c0 (w^0, Fq2 in a.c0), cw (w^1 -> b.c0), cw3 (w^3 -> b.c1)
static inline void line_to_f12(Fp12 &o, const Fp2 &c0, const Fp2 &cw,
                               const Fp2 &cw3) {
  f6_set_zero(o.a);
  f6_set_zero(o.b);
  o.a.c0 = c0;
  o.b.c0 = cw;
  o.b.c1 = cw3;
}

// Multiply f by the sparse line (general f12_mul would also work; this saves
// roughly a third of the Fq2 multiplies).
static inline void f12_mul_line(Fp12 &f, const Fp2 &c0, const Fp2 &cw,
                                const Fp2 &cw3) {
  Fp12 l;
  line_to_f12(l, c0, cw, cw3);
  Fp12 t;
  f12_mul(t, f, l);
  f = t;
}

// Doubling step: updates R and accumulates the line at P into f.
static void dbl_step(Fp12 &f, G2Proj &R, const Fp &xP, const Fp &yP) {
  Fp2 XX, YY, ZZ, YZ, X3, t;
  f2_sqr(XX, R.X);                      // X^2
  f2_sqr(YY, R.Y);                      // Y^2
  f2_sqr(ZZ, R.Z);                      // Z^2
  f2_mul(YZ, R.Y, R.Z);                 // YZ
  // line coefficients (scaled by 2YZ^2)
  Fp2 c0, cw, cw3, tmp;
  f2_mul(c0, YZ, R.Z);                  // YZ^2
  f2_dbl(c0, c0);                       // 2YZ^2
  f2_mul_fp(c0, c0, yP);               // * yP
  Fp2 threeXX;
  f2_dbl(threeXX, XX);
  f2_add(threeXX, threeXX, XX);         // 3X^2
  f2_mul(cw, threeXX, R.Z);             // 3X^2 Z
  f2_mul_fp(cw, cw, xP);
  f2_neg(cw, cw);                       // -3X^2 Z xP
  f2_mul(cw3, threeXX, R.X);            // 3X^3
  f2_mul(tmp, YY, R.Z);
  f2_dbl(tmp, tmp);                     // 2Y^2 Z
  f2_sub(cw3, cw3, tmp);                // 3X^3 - 2Y^2 Z
  f12_mul_line(f, c0, cw, cw3);
  // point doubling: w=3X^2, s=YZ, B=X Y s, h=w^2-8B
  Fp2 w = threeXX, s = YZ, Bv, h;
  f2_mul(Bv, R.X, R.Y);
  f2_mul(Bv, Bv, s);                    // XYs
  f2_sqr(h, w);
  f2_dbl(t, Bv);
  f2_dbl(t, t);
  f2_dbl(t, t);                         // 8B
  f2_sub(h, h, t);                      // h
  Fp2 hs;
  f2_mul(hs, h, s);
  f2_dbl(X3, hs);                       // X3 = 2hs
  Fp2 fourB, y2s2, Y3, Z3;
  f2_dbl(fourB, Bv);
  f2_dbl(fourB, fourB);                 // 4B
  f2_sub(t, fourB, h);                  // 4B - h
  f2_mul(Y3, w, t);
  Fp2 ss;
  f2_sqr(ss, s);
  f2_mul(y2s2, YY, ss);
  f2_dbl(y2s2, y2s2);
  f2_dbl(y2s2, y2s2);
  f2_dbl(y2s2, y2s2);                   // 8 Y^2 s^2
  f2_sub(Y3, Y3, y2s2);
  f2_mul(Z3, ss, s);                    // s^3
  f2_dbl(Z3, Z3);
  f2_dbl(Z3, Z3);
  f2_dbl(Z3, Z3);                       // 8 s^3
  R.X = X3;
  R.Y = Y3;
  R.Z = Z3;
}

// Mixed addition step R += Q, line at P accumulated into f.
static void add_step(Fp12 &f, G2Proj &R, const G2Affine &Q, const Fp &xP,
                     const Fp &yP) {
  Fp2 u, v, t;
  f2_mul(u, Q.y, R.Z);
  f2_sub(u, u, R.Y);                    // u = y2 Z - Y
  f2_mul(v, Q.x, R.Z);
  f2_sub(v, v, R.X);                    // v = x2 Z - X
  // line: c0 = v yP, cw = -u xP, cw3 = u x2 - v y2
  Fp2 c0, cw, cw3, t2;
  f2_mul_fp(c0, v, yP);
  f2_mul_fp(cw, u, xP);
  f2_neg(cw, cw);
  f2_mul(cw3, u, Q.x);
  f2_mul(t2, v, Q.y);
  f2_sub(cw3, cw3, t2);
  f12_mul_line(f, c0, cw, cw3);
  // point: A = u^2 Z - v^3 - 2 v^2 X
  Fp2 uu, vv, vvv, A, vvX;
  f2_sqr(uu, u);
  f2_sqr(vv, v);
  f2_mul(vvv, vv, v);
  f2_mul(A, uu, R.Z);
  f2_sub(A, A, vvv);
  f2_mul(vvX, vv, R.X);
  f2_dbl(t, vvX);
  f2_sub(A, A, t);
  Fp2 X3, Y3, Z3;
  f2_mul(X3, v, A);
  f2_sub(t, vvX, A);
  f2_mul(Y3, u, t);
  f2_mul(t, vvv, R.Y);
  f2_sub(Y3, Y3, t);
  f2_mul(Z3, vvv, R.Z);
  R.X = X3;
  R.Y = Y3;
  R.Z = Z3;
}

// pi(Q) = (conj(x) g1^2, conj(y) g1^3)
static void g2_frob(G2Affine &o, const G2Affine &q) {
  Fp2 t;
  f2_conj(t, q.x);
  f2_mul(o.x, t, G1F[2]);
  f2_conj(t, q.y);
  f2_mul(o.y, t, G1F[3]);
  o.inf = q.inf;
}

// Miller loop for one (P, Q) pair, multiplied into f.
static void miller_loop(Fp12 &f, const G1Affine &P, const G2Affine &Q) {
  if (P.inf || Q.inf) return;
  frob_init();
  G2Proj R;
  R.X = Q.x;
  R.Y = Q.y;
  f2_set_one(R.Z);
  // 65-bit loop count 6x+2; iterate from bit 63 of the combined value down
  // (top bit implicit: R starts at Q, f starts as-is).
  for (int i = 63; i >= 0; --i) {
    Fp12 fs;
    f12_sqr(fs, f);
    f = fs;
    dbl_step(f, R, P.x, P.y);
    uint64_t bit = (i >= 64) ? ((ATE_HI >> (i - 64)) & 1) : ((ATE_LO >> i) & 1);
    if (bit) add_step(f, R, Q, P.x, P.y);
  }
  G2Affine q1, q2n;
  g2_frob(q1, Q);
  g2_frob(q2n, q1);
  f2_neg(q2n.y, q2n.y);
  add_step(f, R, q1, P.x, P.y);
  add_step(f, R, q2n, P.x, P.y);
}

// NOTE on the loop bounds: ATE = 6x+2 = 0x1_9d797039be763ba8 (65 bits). The
// standard double-and-add starts below the MSB (bit 64 implicit), so the
// loop runs bits 63..0 — matching hostmath/bn254.py's _LOG_ATE = 63.

static void final_exponentiation(Fp12 &f) {
  frob_init();
  // easy part: f^((q^6-1)(q^2+1))
  Fp12 t, inv, f6c;
  f12_conj(f6c, f);
  f12_inv(inv, f);
  f12_mul(t, f6c, inv);  // f^(q^6 - 1)
  Fp12 t2;
  f12_frob_k(t2, t, 2);
  f12_mul(f, t2, t);  // now in the cyclotomic subgroup
  // hard part (Scott et al. chain, mirrors hostmath/bn254.py)
  Fp12 m = f, mx, mx2, mx3;
  f12_pow_u64(mx, m, BN_X);
  f12_pow_u64(mx2, mx, BN_X);
  f12_pow_u64(mx3, mx2, BN_X);
  Fp12 y0, y1, y2, y3, y4, y5, y6, fr1, fr2, fr3;
  f12_frob_k(fr1, m, 1);
  f12_frob_k(fr2, m, 2);
  f12_frob_k(fr3, m, 3);
  f12_mul(y0, fr1, fr2);
  f12_mul(y0, y0, fr3);
  f12_conj(y1, m);
  f12_frob_k(y2, mx2, 2);
  f12_frob_k(t, mx, 1);
  f12_conj(y3, t);
  f12_frob_k(t, mx2, 1);
  f12_mul(t, mx, t);
  f12_conj(y4, t);
  f12_conj(y5, mx2);
  f12_frob_k(t, mx3, 1);
  f12_mul(t, mx3, t);
  f12_conj(y6, t);
  Fp12 t0, t1;
  f12_sqr(t0, y6);
  f12_mul(t0, t0, y4);
  f12_mul(t0, t0, y5);
  f12_mul(t1, y3, y5);
  f12_mul(t1, t1, t0);
  f12_mul(t0, t0, y2);
  f12_sqr(t1, t1);
  f12_mul(t1, t1, t0);
  f12_sqr(t1, t1);
  f12_mul(t0, t1, y1);
  f12_mul(t1, t1, y0);
  f12_sqr(t0, t0);
  f12_mul(f, t0, t1);
}

// ---------------------------------------------------------------------------
// Generic Jacobian curve ops over Fp (G1) or Fp2 (G2), via field overloads
// ---------------------------------------------------------------------------

static inline void fe_add(Fp &o, const Fp &a, const Fp &b) { fp_add(o, a, b); }
static inline void fe_sub(Fp &o, const Fp &a, const Fp &b) { fp_sub(o, a, b); }
static inline void fe_mul(Fp &o, const Fp &a, const Fp &b) { fp_mul(o, a, b); }
static inline void fe_sqr(Fp &o, const Fp &a) { fp_sqr(o, a); }
static inline void fe_inv(Fp &o, const Fp &a) { fp_inv(o, a); }
static inline bool fe_is_zero(const Fp &a) { return fp_is_zero(a); }
static inline void fe_set_zero(Fp &o) { fp_set_zero(o); }
static inline void fe_set_one(Fp &o) { fp_set_one(o); }
static inline void fe_add(Fp2 &o, const Fp2 &a, const Fp2 &b) { f2_add(o, a, b); }
static inline void fe_sub(Fp2 &o, const Fp2 &a, const Fp2 &b) { f2_sub(o, a, b); }
static inline void fe_mul(Fp2 &o, const Fp2 &a, const Fp2 &b) { f2_mul(o, a, b); }
static inline void fe_sqr(Fp2 &o, const Fp2 &a) { f2_sqr(o, a); }
static inline void fe_inv(Fp2 &o, const Fp2 &a) { f2_inv(o, a); }
static inline bool fe_is_zero(const Fp2 &a) { return f2_is_zero(a); }
static inline void fe_set_zero(Fp2 &o) { f2_set_zero(o); }
static inline void fe_set_one(Fp2 &o) { f2_set_one(o); }

template <typename F>
struct Jac {
  F X, Y, Z;
  bool inf;
};
template <typename F>
struct AffPt {
  F x, y;
  bool inf;
};

template <typename F>
static void jac_dbl(Jac<F> &o, const Jac<F> &p) {
  if (p.inf || fe_is_zero(p.Y)) {
    o.inf = true;
    return;
  }
  F A, B, C, D, E, Fv, t;
  fe_sqr(A, p.X);
  fe_sqr(B, p.Y);
  fe_sqr(C, B);
  // D = 2((X+B)^2 - A - C)
  fe_add(t, p.X, B);
  fe_sqr(D, t);
  fe_sub(D, D, A);
  fe_sub(D, D, C);
  fe_add(D, D, D);
  fe_add(E, A, A);
  fe_add(E, E, A);  // 3A
  fe_sqr(Fv, E);
  fe_sub(o.X, Fv, D);
  fe_sub(o.X, o.X, D);
  F eightC;
  fe_add(eightC, C, C);
  fe_add(eightC, eightC, eightC);
  fe_add(eightC, eightC, eightC);
  fe_sub(t, D, o.X);
  F newY, newZ;
  fe_mul(newY, E, t);
  fe_sub(newY, newY, eightC);
  fe_mul(newZ, p.Y, p.Z);
  fe_add(o.Z, newZ, newZ);
  o.Y = newY;
  o.inf = false;
}

template <typename F, typename A>
static void jac_add_affine(Jac<F> &o, const Jac<F> &p, const A &q) {
  if (q.inf) {
    o = p;
    return;
  }
  if (p.inf) {
    o.X = q.x;
    o.Y = q.y;
    fe_set_one(o.Z);
    o.inf = false;
    return;
  }
  F Z1Z1, U2, S2, H, HH, I, J, rr, V, t;
  fe_sqr(Z1Z1, p.Z);
  fe_mul(U2, q.x, Z1Z1);
  fe_mul(S2, q.y, Z1Z1);
  fe_mul(S2, S2, p.Z);
  fe_sub(H, U2, p.X);
  fe_sub(rr, S2, p.Y);
  if (fe_is_zero(H)) {
    if (fe_is_zero(rr)) {
      jac_dbl(o, p);
      return;
    }
    o.inf = true;
    return;
  }
  fe_add(rr, rr, rr);  // r = 2(S2-Y1)
  fe_sqr(HH, H);
  fe_add(I, HH, HH);
  fe_add(I, I, I);  // I = 4 HH
  fe_mul(J, H, I);
  fe_mul(V, p.X, I);
  F newX;
  fe_sqr(newX, rr);
  fe_sub(newX, newX, J);
  fe_sub(newX, newX, V);
  fe_sub(newX, newX, V);
  fe_sub(t, V, newX);
  F newY;
  fe_mul(newY, rr, t);
  F y1j;
  fe_mul(y1j, p.Y, J);
  fe_add(y1j, y1j, y1j);
  fe_sub(newY, newY, y1j);
  fe_add(t, p.Z, H);
  F newZ;
  fe_sqr(newZ, t);
  fe_sub(newZ, newZ, Z1Z1);
  fe_sub(newZ, newZ, HH);
  o.X = newX;
  o.Y = newY;
  o.Z = newZ;
  o.inf = false;
}

// General Jacobian + Jacobian (handles equal/opposite operands).
template <typename F>
static void jac_add(Jac<F> &o, const Jac<F> &p, const Jac<F> &q) {
  if (p.inf) {
    o = q;
    return;
  }
  if (q.inf) {
    o = p;
    return;
  }
  F Z1Z1, Z2Z2, U1, U2, S1, S2, t;
  fe_sqr(Z1Z1, p.Z);
  fe_sqr(Z2Z2, q.Z);
  fe_mul(U1, p.X, Z2Z2);
  fe_mul(U2, q.X, Z1Z1);
  fe_mul(S1, p.Y, q.Z);
  fe_mul(S1, S1, Z2Z2);
  fe_mul(S2, q.Y, p.Z);
  fe_mul(S2, S2, Z1Z1);
  F H, rr;
  fe_sub(H, U2, U1);
  fe_sub(rr, S2, S1);
  if (fe_is_zero(H)) {
    if (fe_is_zero(rr)) {
      jac_dbl(o, p);
      return;
    }
    o.inf = true;
    return;
  }
  fe_add(rr, rr, rr);  // r = 2(S2-S1)
  F HH, I, J, V;
  fe_sqr(HH, H);
  fe_add(I, HH, HH);
  fe_add(I, I, I);  // I = 4HH
  fe_mul(J, H, I);
  fe_mul(V, U1, I);
  F newX;
  fe_sqr(newX, rr);
  fe_sub(newX, newX, J);
  fe_sub(newX, newX, V);
  fe_sub(newX, newX, V);
  fe_sub(t, V, newX);
  F newY;
  fe_mul(newY, rr, t);
  F s1j;
  fe_mul(s1j, S1, J);
  fe_add(s1j, s1j, s1j);
  fe_sub(newY, newY, s1j);
  F newZ;
  fe_add(t, p.Z, q.Z);
  fe_sqr(newZ, t);
  fe_sub(newZ, newZ, Z1Z1);
  fe_sub(newZ, newZ, Z2Z2);
  fe_mul(newZ, newZ, H);
  o.X = newX;
  o.Y = newY;
  o.Z = newZ;
  o.inf = false;
}

template <typename F, typename A>
static void jac_to_affine(A &o, const Jac<F> &p) {
  if (p.inf || fe_is_zero(p.Z)) {
    o.inf = true;
    fe_set_zero(o.x);
    fe_set_zero(o.y);
    return;
  }
  F zi, zi2, zi3;
  fe_inv(zi, p.Z);
  fe_sqr(zi2, zi);
  fe_mul(zi3, zi2, zi);
  fe_mul(o.x, p.X, zi2);
  fe_mul(o.y, p.Y, zi3);
  o.inf = false;
}

typedef Jac<Fp> G1Proj;

static inline void g1_dbl(G1Proj &o, const G1Proj &p) { jac_dbl(o, p); }
static inline void g1_add_affine(G1Proj &o, const G1Proj &p, const G1Affine &q) {
  jac_add_affine(o, p, q);
}
static inline void g1_to_affine(G1Affine &o, const G1Proj &p) {
  jac_to_affine(o, p);
}

// ---------------------------------------------------------------------------
// Pippenger MSM (host Pippenger, 8-bit windows). Role: the prover's MSM
// backend on CPU-only hosts (compiling the device MSM pipeline costs minutes
// per program under XLA:CPU) and the verifier's public-input combination.
// Matches ark-ec VariableBaseMSM semantics (rln/src/partial_proof.rs:98-104).
// ---------------------------------------------------------------------------

// Small-n path: per-point 4-bit windowed double-and-add. Pippenger's
// 255-bucket reduction costs ~16K adds regardless of n, so below ~32
// points the direct method wins by orders of magnitude (the prover's
// per-proof blinding assembly is 3-5 point combinations).
template <typename F, typename A>
static void msm_small(Jac<F> &out, const A *points, const uint8_t *scalars,
                      size_t n) {
  Jac<F> acc;
  acc.inf = true;
  for (size_t i = 0; i < n; ++i) {
    if (points[i].inf) continue;
    const uint8_t *s = scalars + 32 * i;
    // 16-entry table of j*P
    Jac<F> table[16];
    table[0].inf = true;
    table[1].X = points[i].x;
    table[1].Y = points[i].y;
    fe_set_one(table[1].Z);
    table[1].inf = false;
    for (int j = 2; j < 16; ++j) jac_add_affine(table[j], table[j - 1], points[i]);
    Jac<F> r;
    r.inf = true;
    bool started = false;
    for (int nib = 63; nib >= 0; --nib) {
      if (started) {
        for (int d = 0; d < 4; ++d) {
          Jac<F> t;
          jac_dbl(t, r);
          r = t;
        }
      }
      uint8_t digit = (s[nib / 2] >> ((nib & 1) * 4)) & 0xF;
      if (digit) {
        Jac<F> t;
        jac_add(t, r, table[digit]);
        r = t;
        started = true;
      }
    }
    Jac<F> t;
    jac_add(t, acc, r);
    acc = t;
  }
  out = acc;
}

template <typename F, typename A>
static void msm_pippenger(Jac<F> &out, const A *points, const uint8_t *scalars,
                          size_t n) {
  if (n <= 32) {
    msm_small(out, points, scalars, n);
    return;
  }
  const int windows = 32;  // 256 bits / 8
  static thread_local std::vector<Jac<F>> buckets;
  buckets.assign(255, Jac<F>{});
  Jac<F> total;
  total.inf = true;
  for (int w = windows - 1; w >= 0; --w) {
    for (int d = 0; d < 255; ++d) buckets[d].inf = true;
    if (!total.inf) {
      for (int i = 0; i < 8; ++i) {
        Jac<F> t;
        jac_dbl(t, total);
        total = t;
      }
    }
    bool any = false;
    for (size_t i = 0; i < n; ++i) {
      if (points[i].inf) continue;
      uint8_t d = scalars[32 * i + w];  // LE byte w = window w digit
      if (!d) continue;
      Jac<F> t;
      jac_add_affine(t, buckets[d - 1], points[i]);
      buckets[d - 1] = t;
      any = true;
    }
    if (!any) continue;
    Jac<F> running, acc, t;
    running.inf = true;
    acc.inf = true;
    for (int d = 254; d >= 0; --d) {
      jac_add(t, running, buckets[d]);
      running = t;
      jac_add(t, acc, running);
      acc = t;
    }
    jac_add(t, total, acc);
    total = t;
  }
  out = total;
}

// ---------------------------------------------------------------------------
// Deserialization
// ---------------------------------------------------------------------------

static void read_g1(G1Affine &o, const uint8_t *b) {
  bool zero = true;
  for (int i = 0; i < 64; ++i) zero &= (b[i] == 0);
  o.inf = zero;
  fp_from_le(o.x, b);
  fp_from_le(o.y, b + 32);
}

static void read_g2(G2Affine &o, const uint8_t *b) {
  bool zero = true;
  for (int i = 0; i < 128; ++i) zero &= (b[i] == 0);
  o.inf = zero;
  fp_from_le(o.x.a, b);
  fp_from_le(o.x.b, b + 32);
  fp_from_le(o.y.a, b + 64);
  fp_from_le(o.y.b, b + 96);
}

// ---------------------------------------------------------------------------
// Point validation (untrusted proof bytes)
// ---------------------------------------------------------------------------

// Fr group order r, canonical LE bytes (subgroup checks).
static const uint8_t MOD_R_LE[32] = {
    0x01, 0x00, 0x00, 0xf0, 0x93, 0xf5, 0xe1, 0x43, 0x91, 0x70, 0xb9,
    0x79, 0x48, 0xe8, 0x33, 0x28, 0x5d, 0x58, 0x81, 0x81, 0xb6, 0x45,
    0x50, 0xb8, 0x29, 0xa0, 0x31, 0xe1, 0x72, 0x4e, 0x64, 0x30};

// raw canonical-LE 32-byte value < q?
static bool le_lt_q(const uint8_t *b) {
  uint64_t v[4];
  std::memcpy(v, b, 32);
  for (int i = 3; i >= 0; --i) {
    if (v[i] < MOD_Q[i]) return true;
    if (v[i] > MOD_Q[i]) return false;
  }
  return false;  // equal to q: non-canonical
}

static void fp_small(Fp &o, uint64_t v) {
  uint8_t b[32] = {0};
  std::memcpy(b, &v, 8);
  fp_from_le(o, b);
}

// y^2 == x^3 + 3 over Fq (G1 curve; cofactor 1, so on-curve + canonical
// range is the full G1 validity check — matches ark CanonicalDeserialize).
static bool g1_on_curve(const G1Affine &p) {
  Fp y2, x3, t, b3;
  fe_sqr(y2, p.y);
  fe_sqr(t, p.x);
  fe_mul(x3, t, p.x);
  fp_small(b3, 3);
  fe_add(x3, x3, b3);
  fe_sub(t, y2, x3);
  return fe_is_zero(t);
}

// y^2 == x^3 + 3/xi over Fq2 (the D-type twist E').
static bool g2_on_curve(const G2Affine &p) {
  Fp2 xi, b2, y2, x3, t;
  fp_small(xi.a, 9);
  fp_small(xi.b, 1);
  f2_inv(b2, xi);
  Fp three;
  fp_small(three, 3);
  fp_mul(b2.a, b2.a, three);
  fp_mul(b2.b, b2.b, three);
  fe_sqr(y2, p.y);
  fe_sqr(t, p.x);
  fe_mul(x3, t, p.x);
  fe_add(x3, x3, b2);
  fe_sub(t, y2, x3);
  return fe_is_zero(t);
}

// ---------------------------------------------------------------------------
// Batched Groth16 blinding assembly (prover host side)
// ---------------------------------------------------------------------------

// Fixed-base 4-bit window table: tbl[w*15 + d-1] = d * 2^(4w) * base for
// w in [0, 64). ~1.1K group ops once per base; afterwards every scalar
// multiplication by that base is <= 64 additions with no doublings.
template <typename F>
static void fixed_table_build(std::vector<Jac<F>> &tbl, const Jac<F> &base) {
  tbl.assign(64 * 15, Jac<F>{});
  Jac<F> pw = base;
  for (int w = 0; w < 64; ++w) {
    Jac<F> acc = pw;
    for (int d = 1; d <= 15; ++d) {
      tbl[w * 15 + d - 1] = acc;
      if (d < 15) {
        Jac<F> t;
        jac_add(t, acc, pw);
        acc = t;
      }
    }
    if (w < 63)
      for (int i = 0; i < 4; ++i) {
        Jac<F> t;
        jac_dbl(t, pw);
        pw = t;
      }
  }
}

template <typename F>
static void fixed_table_mul(Jac<F> &out, const std::vector<Jac<F>> &tbl,
                            const uint8_t *scalar) {
  Jac<F> acc;
  acc.inf = true;
  for (int w = 0; w < 64; ++w) {
    uint8_t d = (scalar[w / 2] >> ((w & 1) * 4)) & 0xF;
    if (!d) continue;
    Jac<F> t;
    jac_add(t, acc, tbl[w * 15 + d - 1]);
    acc = t;
  }
  out = acc;
}

// s1*P1 + s2*P2 with a shared doubling chain (Straus/Shamir, 4-bit windows):
// 252 doublings + <=2*63 additions instead of two independent ladders.
template <typename F, typename A>
static void joint_mul2(Jac<F> &out, const A &p1, const uint8_t *s1,
                       const A &p2, const uint8_t *s2) {
  Jac<F> t1[16], t2[16];
  t1[0].inf = true;
  t2[0].inf = true;
  for (int j = 1; j < 16; ++j) {
    jac_add_affine(t1[j], t1[j - 1], p1);
    jac_add_affine(t2[j], t2[j - 1], p2);
  }
  Jac<F> r;
  r.inf = true;
  bool started = false;
  for (int nib = 63; nib >= 0; --nib) {
    if (started)
      for (int d = 0; d < 4; ++d) {
        Jac<F> t;
        jac_dbl(t, r);
        r = t;
      }
    uint8_t d1 = (s1[nib / 2] >> ((nib & 1) * 4)) & 0xF;
    uint8_t d2 = (s2[nib / 2] >> ((nib & 1) * 4)) & 0xF;
    if (d1) {
      Jac<F> t;
      jac_add(t, r, t1[d1]);
      r = t;
      started = true;
    }
    if (d2) {
      Jac<F> t;
      jac_add(t, r, t2[d2]);
      r = t;
      started = true;
    }
  }
  out = r;
}

template <typename F, typename A>
static void affine_to_jac(Jac<F> &o, const A &p) {
  if (p.inf) {
    o.inf = true;
    return;
  }
  o.X = p.x;
  o.Y = p.y;
  fe_set_one(o.Z);
  o.inf = false;
}

}  // namespace pairing

extern "C" {

// prod_i e(P_i, Q_i) == 1 with one shared final exponentiation.
// g1s: n*64 bytes (x||y LE); g2s: n*128 bytes (x.c0||x.c1||y.c0||y.c1 LE).
// All-zero coordinates = infinity (the pair is skipped).
// Returns 0 and sets *out to 1/0; nonzero on argument errors.
int rln_multi_pairing_is_one(const uint8_t *g1s, const uint8_t *g2s, size_t n,
                             int *out) {
  using namespace pairing;
  if (!g1s || !g2s || !out) return -1;
  frob_init();
  Fp12 f;
  f12_set_one(f);
  bool any = false;
  for (size_t i = 0; i < n; ++i) {
    G1Affine p;
    G2Affine q;
    read_g1(p, g1s + 64 * i);
    read_g2(q, g2s + 128 * i);
    if (p.inf || q.inf) continue;
    Fp12 fi;  // fresh accumulator: the loop squares its accumulator, so a
    f12_set_one(fi);  // shared one would square earlier pairs' results too
    miller_loop(fi, p, q);
    Fp12 t;
    f12_mul(t, f, fi);
    f = t;
    any = true;
  }
  if (any) final_exponentiation(f);
  *out = f12_is_one(f) ? 1 : 0;
  return 0;
}

// One full pairing e(P, Q) -> 12*32 bytes (Fq coefficients of the tower:
// a.c0.a, a.c0.b, a.c1.a, ... b.c2.b), for cross-checks against the host
// Python pairing.
int rln_pairing(const uint8_t *g1, const uint8_t *g2, uint8_t *out384) {
  using namespace pairing;
  if (!g1 || !g2 || !out384) return -1;
  frob_init();
  Fp12 f;
  f12_set_one(f);
  G1Affine p;
  G2Affine q;
  read_g1(p, g1);
  read_g2(q, g2);
  if (!p.inf && !q.inf) {
    miller_loop(f, p, q);
    final_exponentiation(f);
  }
  const Fp2 *c2s[6] = {&f.a.c0, &f.a.c1, &f.a.c2, &f.b.c0, &f.b.c1, &f.b.c2};
  for (int i = 0; i < 6; ++i) {
    fp_to_le(out384 + 64 * i, c2s[i]->a);
    fp_to_le(out384 + 64 * i + 32, c2s[i]->b);
  }
  return 0;
}

// out = sum_i scalars[i] * points[i] over G1 (Pippenger, 8-bit windows).
// points: n*64 LE; scalars: n*32 LE (canonical, < r). out: 64 bytes;
// (0,0) = infinity.
int rln_g1_msm(const uint8_t *points, const uint8_t *scalars, size_t n,
               uint8_t *out) {
  using namespace pairing;
  if (!points || !scalars || !out) return -1;
  std::vector<G1Affine> pts(n);
  for (size_t i = 0; i < n; ++i) read_g1(pts[i], points + 64 * i);
  Jac<Fp> acc;
  msm_pippenger(acc, pts.data(), scalars, n);
  G1Affine o;
  g1_to_affine(o, acc);
  fp_to_le(out, o.x);
  fp_to_le(out + 32, o.y);
  return 0;
}

// Same over G2. points: n*128 LE (x.c0||x.c1||y.c0||y.c1); out: 128 bytes.
int rln_g2_msm(const uint8_t *points, const uint8_t *scalars, size_t n,
               uint8_t *out) {
  using namespace pairing;
  if (!points || !scalars || !out) return -1;
  std::vector<G2Affine> pts(n);
  for (size_t i = 0; i < n; ++i) read_g2(pts[i], points + 128 * i);
  Jac<Fp2> acc;
  msm_pippenger(acc, pts.data(), scalars, n);
  G2Affine o;
  jac_to_affine(o, acc);
  fp_to_le(out, o.x.a);
  fp_to_le(out + 32, o.x.b);
  fp_to_le(out + 64, o.y.a);
  fp_to_le(out + 96, o.y.b);
  return 0;
}

// Proof-point validation for untrusted bytes (ark CanonicalDeserialize
// semantics: reject non-canonical coordinates and off-curve points; G2
// additionally requires r-torsion membership — the twist's full group
// order is r*c2 with gcd(r, c2) = 1, so [r]Q == inf iff Q lies in the
// order-r subgroup the pairing is defined on).
// Returns 1 valid (infinity counts as valid), 0 invalid, <0 on bad args.
int rln_g1_is_valid(const uint8_t *g1) {
  using namespace pairing;
  if (!g1) return -1;
  bool zero = true;
  for (int i = 0; i < 64; ++i) zero &= (g1[i] == 0);
  if (zero) return 1;
  if (!le_lt_q(g1) || !le_lt_q(g1 + 32)) return 0;
  G1Affine p;
  read_g1(p, g1);
  return g1_on_curve(p) ? 1 : 0;
}

int rln_g2_is_valid(const uint8_t *g2, int check_subgroup) {
  using namespace pairing;
  if (!g2) return -1;
  bool zero = true;
  for (int i = 0; i < 128; ++i) zero &= (g2[i] == 0);
  if (zero) return 1;
  for (int c = 0; c < 4; ++c)
    if (!le_lt_q(g2 + 32 * c)) return 0;
  G2Affine q;
  read_g2(q, g2);
  if (!g2_on_curve(q)) return 0;
  if (check_subgroup) {
    Jac<Fp2> acc;
    msm_small(acc, &q, MOD_R_LE, 1);
    if (!(acc.inf || fe_is_zero(acc.Z))) return 0;
  }
  return 1;
}

// Batched Groth16 blinding assembly. For each proof b (ark-groth16
// semantics; reference math rln/src/partial_proof.rs:237-268):
//   g_a  = alpha + A_b + r_b*delta1
//   g2_b = beta2 + B2_b + s_b*delta2
//   g_c  = s_b*alpha + r_b*beta1 + rs_b*delta1 + s_b*A_b + r_b*B1_b
//          + L_b + H_b
// The g_c line is the expansion of s*g_a + r*g1_b - rs*delta1 + L + H and is
// identical for r = 0 (where the reference's g1_b is the infinity point).
// rs must be (r*s mod r_order), supplied by the caller. Scalars are 32-byte
// canonical LE; points as in the other entry points. One call assembles the
// whole batch: fixed-base window tables for alpha/beta1/delta1/delta2 are
// built once, the two variable-base terms share a Straus double chain.
int rln_groth16_assemble_batch(
    const uint8_t *alpha_g1, const uint8_t *beta_g1, const uint8_t *delta_g1,
    const uint8_t *beta_g2, const uint8_t *delta_g2, const uint8_t *a_pts,
    const uint8_t *b1_pts, const uint8_t *b2_pts, const uint8_t *l_pts,
    const uint8_t *h_pts, const uint8_t *rs, const uint8_t *ss,
    const uint8_t *rss, size_t batch, uint8_t *out_a, uint8_t *out_b,
    uint8_t *out_c) {
  using namespace pairing;
  if (!alpha_g1 || !beta_g1 || !delta_g1 || !beta_g2 || !delta_g2 || !a_pts ||
      !b1_pts || !b2_pts || !l_pts || !h_pts || !rs || !ss || !rss || !out_a ||
      !out_b || !out_c)
    return -1;
  G1Affine alpha, beta1, delta1;
  G2Affine beta2, delta2;
  read_g1(alpha, alpha_g1);
  read_g1(beta1, beta_g1);
  read_g1(delta1, delta_g1);
  read_g2(beta2, beta_g2);
  read_g2(delta2, delta_g2);
  Jac<Fp> j_alpha, j_beta1, j_delta1;
  Jac<Fp2> j_delta2;
  affine_to_jac(j_alpha, alpha);
  affine_to_jac(j_beta1, beta1);
  affine_to_jac(j_delta1, delta1);
  affine_to_jac(j_delta2, delta2);
  std::vector<Jac<Fp>> t_alpha, t_beta1, t_delta1;
  std::vector<Jac<Fp2>> t_delta2;
  fixed_table_build(t_alpha, j_alpha);
  fixed_table_build(t_beta1, j_beta1);
  fixed_table_build(t_delta1, j_delta1);
  fixed_table_build(t_delta2, j_delta2);

  auto work = [&](size_t lo, size_t hi) {
    for (size_t b = lo; b < hi; ++b) {
      G1Affine a, b1, l, h;
      G2Affine b2;
      read_g1(a, a_pts + 64 * b);
      read_g1(b1, b1_pts + 64 * b);
      read_g2(b2, b2_pts + 128 * b);
      read_g1(l, l_pts + 64 * b);
      read_g1(h, h_pts + 64 * b);
      const uint8_t *r_b = rs + 32 * b;
      const uint8_t *s_b = ss + 32 * b;
      const uint8_t *rs_b = rss + 32 * b;
      // g_a = alpha + A + r*delta1
      Jac<Fp> ga, t;
      fixed_table_mul(ga, t_delta1, r_b);
      jac_add_affine(t, ga, a);
      jac_add_affine(ga, t, alpha);
      // g2_b = beta2 + B2 + s*delta2
      Jac<Fp2> gb, t2;
      fixed_table_mul(gb, t_delta2, s_b);
      jac_add_affine(t2, gb, b2);
      jac_add_affine(gb, t2, beta2);
      // g_c = s*alpha + r*beta1 + rs*delta1 + (s*A + r*B1) + L + H
      Jac<Fp> gc, u;
      fixed_table_mul(gc, t_alpha, s_b);
      fixed_table_mul(u, t_beta1, r_b);
      jac_add(t, gc, u);
      fixed_table_mul(u, t_delta1, rs_b);
      jac_add(gc, t, u);
      joint_mul2(u, a, s_b, b1, r_b);
      jac_add(t, gc, u);
      jac_add_affine(gc, t, l);
      jac_add_affine(t, gc, h);
      gc = t;
      G1Affine oa, oc;
      G2Affine ob;
      jac_to_affine(oa, ga);
      jac_to_affine(ob, gb);
      jac_to_affine(oc, gc);
      fp_to_le(out_a + 64 * b, oa.x);
      fp_to_le(out_a + 64 * b + 32, oa.y);
      fp_to_le(out_b + 128 * b, ob.x.a);
      fp_to_le(out_b + 128 * b + 32, ob.x.b);
      fp_to_le(out_b + 128 * b + 64, ob.y.a);
      fp_to_le(out_b + 128 * b + 96, ob.y.b);
      fp_to_le(out_c + 64 * b, oc.x);
      fp_to_le(out_c + 64 * b + 32, oc.y);
    }
  };
  size_t nt = std::thread::hardware_concurrency();
  if (nt > batch) nt = batch;
  if (nt > 16) nt = 16;
  if (nt <= 1) {
    work(0, batch);
  } else {
    std::vector<std::thread> threads;
    size_t per = (batch + nt - 1) / nt;
    for (size_t i = 0; i < nt; ++i) {
      size_t lo = i * per, hi = lo + per < batch ? lo + per : batch;
      if (lo >= hi) break;
      threads.emplace_back(work, lo, hi);
    }
    for (auto &th : threads) th.join();
  }
  return 0;
}

}  // extern "C"
