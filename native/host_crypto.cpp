// Native host crypto core for lasso-tpu.
//
// The reference implementation's host-side work (transcript hashing, RNG
// streams, small curve algebra, latency-bound MSMs) is native Rust; this is
// the TPU build's native equivalent, exposed through a plain C ABI and
// loaded from Python via ctypes (lasso_tpu/native/__init__.py).  The pure
// Python implementations remain as the canonical oracles; parity tests pin
// this library against them.
//
// Contents:
//   * keccak-f[1600] permutation (backs the merlin/STROBE transcript)
//   * ChaCha block function (rand_chacha-compatible RNG streams)
//   * 4x64-limb Montgomery field arithmetic over arbitrary 256-bit moduli
//   * extended twisted Edwards group ops (unified hwcd, complete for
//     ark-curve25519's a/d), scalar mul, bullet-fold, and Pippenger MSM
//     with the reference's small-scalar window policy
//     (reference: src/msm/mod.rs:96-116)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// keccak-f[1600]
// ---------------------------------------------------------------------------

static const uint64_t KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static inline uint64_t rol64(uint64_t v, int n) {
  n &= 63;
  return n ? (v << n) | (v >> (64 - n)) : v;
}

void keccak_f1600(uint8_t *state) {
  uint64_t a[25];
  std::memcpy(a, state, 200);
  // lane order matches the Python implementation: a[x + 5*y]
  static const int ROT[5][5] = {{0, 36, 3, 41, 18},
                                {1, 44, 10, 45, 2},
                                {62, 6, 43, 15, 61},
                                {28, 55, 25, 21, 56},
                                {27, 20, 39, 8, 14}};
  for (int rnd = 0; rnd < 24; rnd++) {
    uint64_t c[5], d[5];
    for (int x = 0; x < 5; x++)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; x++)
      d[x] = c[(x + 4) % 5] ^ rol64(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) a[x + 5 * y] ^= d[x];
    uint64_t b[25];
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rol64(a[x + 5 * y], ROT[x][y]);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        a[x + 5 * y] =
            b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
    a[0] ^= KECCAK_RC[rnd];
  }
  std::memcpy(state, a, 200);
}

// ---------------------------------------------------------------------------
// ChaCha block (64-bit LE counter variant, as rand_chacha uses)
// ---------------------------------------------------------------------------

static inline uint32_t rotl32(uint32_t v, int n) {
  return (v << n) | (v >> (32 - n));
}

void chacha_block(const uint32_t *key8, uint64_t counter,
                  const uint32_t *nonce2, int rounds, uint32_t *out16) {
  uint32_t st[16] = {0x61707865u, 0x3320646Eu, 0x79622D32u, 0x6B206574u};
  for (int i = 0; i < 8; i++) st[4 + i] = key8[i];
  st[12] = (uint32_t)(counter & 0xFFFFFFFFu);
  st[13] = (uint32_t)(counter >> 32);
  st[14] = nonce2[0];
  st[15] = nonce2[1];
  uint32_t x[16];
  std::memcpy(x, st, sizeof(st));
#define QR(a, b, c, d)                \
  x[a] += x[b]; x[d] = rotl32(x[d] ^ x[a], 16); \
  x[c] += x[d]; x[b] = rotl32(x[b] ^ x[c], 12); \
  x[a] += x[b]; x[d] = rotl32(x[d] ^ x[a], 8);  \
  x[c] += x[d]; x[b] = rotl32(x[b] ^ x[c], 7);
  for (int i = 0; i < rounds / 2; i++) {
    QR(0, 4, 8, 12) QR(1, 5, 9, 13) QR(2, 6, 10, 14) QR(3, 7, 11, 15)
    QR(0, 5, 10, 15) QR(1, 6, 11, 12) QR(2, 7, 8, 13) QR(3, 4, 9, 14)
  }
#undef QR
  for (int i = 0; i < 16; i++) out16[i] = x[i] + st[i];
}

// ---------------------------------------------------------------------------
// 4x64 Montgomery field arithmetic
// ---------------------------------------------------------------------------

typedef unsigned __int128 u128;

struct FieldCtx {
  uint64_t p[4];
  uint64_t n0;     // -p^{-1} mod 2^64
  uint64_t r2[4];  // R^2 mod p
};

struct CurveCtx {
  FieldCtx fp;
  uint64_t aR[4];  // curve a, Montgomery form
  uint64_t dR[4];  // curve d, Montgomery form
  uint64_t oneR[4];
};

static CurveCtx g_curve;

static inline int f_cmp(const uint64_t *a, const uint64_t *b) {
  for (int i = 3; i >= 0; i--) {
    if (a[i] < b[i]) return -1;
    if (a[i] > b[i]) return 1;
  }
  return 0;
}

static inline void f_sub_raw(uint64_t *r, const uint64_t *a,
                             const uint64_t *b) {
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)a[i] - b[i] - borrow;
    r[i] = (uint64_t)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

static inline void f_add(const FieldCtx &f, uint64_t *r, const uint64_t *a,
                         const uint64_t *b) {
  u128 carry = 0;
  for (int i = 0; i < 4; i++) {
    u128 s = (u128)a[i] + b[i] + carry;
    r[i] = (uint64_t)s;
    carry = s >> 64;
  }
  if (carry || f_cmp(r, f.p) >= 0) f_sub_raw(r, r, f.p);
}

static inline void f_sub(const FieldCtx &f, uint64_t *r, const uint64_t *a,
                         const uint64_t *b) {
  if (f_cmp(a, b) >= 0) {
    f_sub_raw(r, a, b);
  } else {
    uint64_t t[4];
    f_sub_raw(t, b, a);
    f_sub_raw(r, f.p, t);
  }
}

// CIOS Montgomery multiply
static void f_mul(const FieldCtx &f, uint64_t *r, const uint64_t *a,
                  const uint64_t *b) {
  uint64_t t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; i++) {
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 s = (u128)t[j] + (u128)a[i] * b[j] + carry;
      t[j] = (uint64_t)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[4] + carry;
    t[4] = (uint64_t)s;
    t[5] = (uint64_t)(s >> 64);

    uint64_t m = t[0] * f.n0;
    carry = 0;
    {
      u128 s2 = (u128)t[0] + (u128)m * f.p[0];
      carry = s2 >> 64;
    }
    for (int j = 1; j < 4; j++) {
      u128 s2 = (u128)t[j] + (u128)m * f.p[j] + carry;
      t[j - 1] = (uint64_t)s2;
      carry = s2 >> 64;
    }
    u128 s3 = (u128)t[4] + carry;
    t[3] = (uint64_t)s3;
    t[4] = t[5] + (uint64_t)(s3 >> 64);
  }
  if (t[4] || f_cmp(t, f.p) >= 0) f_sub_raw(t, t, f.p);
  std::memcpy(r, t, 32);
}

static void f_to_mont(const FieldCtx &f, uint64_t *r, const uint64_t *a) {
  f_mul(f, r, a, f.r2);
}

static void f_from_mont(const FieldCtx &f, uint64_t *r, const uint64_t *a) {
  uint64_t one[4] = {1, 0, 0, 0};
  f_mul(f, r, a, one);
}

// ---------------------------------------------------------------------------
// extended twisted Edwards points (coords in Montgomery form)
// ---------------------------------------------------------------------------

struct Pt {
  uint64_t x[4], y[4], z[4], t[4];
};

static void pt_identity(Pt &p) {
  std::memset(&p, 0, sizeof(p));
  std::memcpy(p.y, g_curve.oneR, 32);
  std::memcpy(p.z, g_curve.oneR, 32);
}

// add-2008-hwcd (unified, complete for a QR / d non-QR)
static void pt_add(Pt &r, const Pt &p, const Pt &q) {
  const FieldCtx &f = g_curve.fp;
  uint64_t A[4], B[4], C[4], D[4], E[4], F[4], G[4], H[4];
  uint64_t s1[4], s2[4], tmp[4];
  f_mul(f, A, p.x, q.x);
  f_mul(f, B, p.y, q.y);
  f_mul(f, tmp, p.t, q.t);
  f_mul(f, C, tmp, g_curve.dR);
  f_mul(f, D, p.z, q.z);
  f_add(f, s1, p.x, p.y);
  f_add(f, s2, q.x, q.y);
  f_mul(f, E, s1, s2);
  f_sub(f, E, E, A);
  f_sub(f, E, E, B);
  f_sub(f, F, D, C);
  f_add(f, G, D, C);
  f_mul(f, tmp, A, g_curve.aR);
  f_sub(f, H, B, tmp);
  f_mul(f, r.x, E, F);
  f_mul(f, r.y, G, H);
  f_mul(f, r.z, F, G);
  f_mul(f, r.t, E, H);
}

static void pt_dbl(Pt &r, const Pt &p) { pt_add(r, p, p); }

static void pt_neg(Pt &r, const Pt &p) {
  const FieldCtx &f = g_curve.fp;
  uint64_t zero[4] = {0, 0, 0, 0};
  f_sub(f, r.x, zero, p.x);
  std::memcpy(r.y, p.y, 32);
  std::memcpy(r.z, p.z, 32);
  f_sub(f, r.t, zero, p.t);
}

// scalar: 4 u64 little-endian words, canonical
static void pt_scalar_mul(Pt &r, const Pt &p, const uint64_t *k) {
  Pt acc, base = p;
  pt_identity(acc);
  int top = 255;
  while (top >= 0 && !((k[top / 64] >> (top % 64)) & 1)) top--;
  for (int i = 0; i <= top; i++) {
    if ((k[i / 64] >> (i % 64)) & 1) pt_add(acc, acc, base);
    if (i != top) pt_dbl(base, base);
  }
  r = acc;
}

// ---------------------------------------------------------------------------
// public API (plain-int coords at the boundary; Montgomery inside)
// ---------------------------------------------------------------------------

void set_curve_ctx(const uint64_t *p, uint64_t n0, const uint64_t *r2,
                   const uint64_t *a_plain, const uint64_t *d_plain) {
  std::memcpy(g_curve.fp.p, p, 32);
  g_curve.fp.n0 = n0;
  std::memcpy(g_curve.fp.r2, r2, 32);
  f_to_mont(g_curve.fp, g_curve.aR, a_plain);
  f_to_mont(g_curve.fp, g_curve.dR, d_plain);
  uint64_t one[4] = {1, 0, 0, 0};
  f_to_mont(g_curve.fp, g_curve.oneR, one);
}

static void pt_from_plain(Pt &r, const uint64_t *xyzt16) {
  const FieldCtx &f = g_curve.fp;
  f_to_mont(f, r.x, xyzt16 + 0);
  f_to_mont(f, r.y, xyzt16 + 4);
  f_to_mont(f, r.z, xyzt16 + 8);
  f_to_mont(f, r.t, xyzt16 + 12);
}

static void pt_to_plain(uint64_t *xyzt16, const Pt &p) {
  const FieldCtx &f = g_curve.fp;
  f_from_mont(f, xyzt16 + 0, p.x);
  f_from_mont(f, xyzt16 + 4, p.y);
  f_from_mont(f, xyzt16 + 8, p.z);
  f_from_mont(f, xyzt16 + 12, p.t);
}

void point_add(const uint64_t *p16, const uint64_t *q16, uint64_t *out16) {
  Pt p, q, r;
  pt_from_plain(p, p16);
  pt_from_plain(q, q16);
  pt_add(r, p, q);
  pt_to_plain(out16, r);
}

void point_mul(const uint64_t *p16, const uint64_t *k4, uint64_t *out16) {
  Pt p, r;
  pt_from_plain(p, p16);
  pt_scalar_mul(r, p, k4);
  pt_to_plain(out16, r);
}

// bullet basis fold: out[i] = g_lo[i]*u_inv + g_hi[i]*u
void fold_points(const uint64_t *g16s, size_t n_half, const uint64_t *u4,
                 const uint64_t *u_inv4, uint64_t *out16s) {
  for (size_t i = 0; i < n_half; i++) {
    Pt lo, hi, a, b, r;
    pt_from_plain(lo, g16s + 16 * i);
    pt_from_plain(hi, g16s + 16 * (n_half + i));
    pt_scalar_mul(a, lo, u_inv4);
    pt_scalar_mul(b, hi, u4);
    pt_add(r, a, b);
    pt_to_plain(out16s + 16 * i, r);
  }
}

// Pippenger MSM with the reference's window policy: windows sized to the
// actual max scalar bit width, bail to full width past 60 bits.
void msm(const uint64_t *points16s, const uint64_t *scalars4s, size_t n,
         uint64_t *out16) {
  Pt acc;
  pt_identity(acc);
  if (n == 0) {
    pt_to_plain(out16, acc);
    return;
  }
  std::vector<Pt> pts(n);
  for (size_t i = 0; i < n; i++) pt_from_plain(pts[i], points16s + 16 * i);

  int max_bits = 1;
  for (size_t i = 0; i < n; i++) {
    const uint64_t *s = scalars4s + 4 * i;
    for (int w = 3; w >= 0; w--) {
      if (s[w]) {
        int bits = 64 * w + 64 - __builtin_clzll(s[w]);
        if (bits > max_bits) max_bits = bits;
        break;
      }
    }
  }

  int c;
  if (n < 32) {
    c = 3;
  } else {
    // ln_without_floats(n) + 2
    int log2n = 63 - __builtin_clzll((uint64_t)n);
    c = log2n * 69 / 100 + 2;
    if (c > 16) c = 16;
  }
  int num_windows = (max_bits + c - 1) / c;
  uint64_t mask = (1ULL << c) - 1;

  std::vector<Pt> buckets(((size_t)1 << c) - 1);
  std::vector<bool> used(buckets.size());

  for (int w = num_windows - 1; w >= 0; w--) {
    if (w != num_windows - 1)
      for (int k = 0; k < c; k++) pt_dbl(acc, acc);
    std::fill(used.begin(), used.end(), false);
    int shift = w * c;
    for (size_t i = 0; i < n; i++) {
      const uint64_t *s = scalars4s + 4 * i;
      int word = shift / 64, off = shift % 64;
      uint64_t d = s[word] >> off;
      if (off && word + 1 < 4) d |= s[word + 1] << (64 - off);
      d &= mask;
      if (d) {
        if (used[d - 1]) {
          pt_add(buckets[d - 1], buckets[d - 1], pts[i]);
        } else {
          buckets[d - 1] = pts[i];
          used[d - 1] = true;
        }
      }
    }
    Pt running, window_sum;
    pt_identity(running);
    pt_identity(window_sum);
    for (size_t b = buckets.size(); b-- > 0;) {
      if (used[b]) pt_add(running, running, buckets[b]);
      pt_add(window_sum, window_sum, running);
    }
    pt_add(acc, acc, window_sum);
  }
  pt_to_plain(out16, acc);
}

}  // extern "C"
