// AVX-512 IFMA tier: 8-point-parallel Ed25519 group arithmetic.
//
// Vertical vectorization — one __m512i lane per POINT, one Fe8 register per
// limb — so the complete-addition formulas run on 8 points at once with no
// cross-lane shuffles.  vpmadd52{lo,hi}uq gives eight 52x52->104-bit
// multiply-accumulates per instruction pair, ~5x the scalar mulx path.
//
// Used by the compression-round generator fold (verifiable_mpc_tpu/ac20/
// compressed_pivot.py; reference: ac20/compressed_pivot.py:41-42 "g_prime =
// g_L^c * g_R"), where every point is multiplied by the SAME round challenge:
// the wNAF digit stream is shared, so all 8 lanes take identical branches.
// Also backs the fixed-base batch exponentiation (table gathers per lane).
//
// Limb discipline (stricter than the scalar tier): every Fe8 keeps limbs
// < 2^52 at all times, because vpmadd52 reads only the low 52 bits of each
// operand.  fe8_add/fe8_sub therefore always run a carry pass; the cost is
// ~16 cheap ops vs ~60 for a mul.
//
// Compiled only when the build host has AVX512IFMA (-march=native); the
// generic ed25519.cc entry points test vmpc_ed_ifma_available() at runtime.

#include <cstdint>
#include <cstring>

typedef uint64_t u64;

#if defined(__AVX512IFMA__) && defined(__AVX512VL__) && defined(__AVX512DQ__)

#include <immintrin.h>

namespace {

static const u64 M51 = (1ULL << 51) - 1;
static const u64 FOURP51[5] = {
    (M51 + 1 - 19) * 4, M51 * 4, M51 * 4, M51 * 4, M51 * 4,
};

struct Fe8 {
  __m512i v[5];  // radix 2^51; invariant: every limb < 2^52
};

struct Pt8 {
  Fe8 x, y, z, t;
};

static inline __m512i bc(u64 x) { return _mm512_set1_epi64((long long)x); }

// carry a 5-limb row with limbs < 2^63 down to limbs < 2^52
static inline void fe8_carry(Fe8 &o) {
  const __m512i m = bc(M51);
  const __m512i nineteen = bc(19);
  o.v[1] = _mm512_add_epi64(o.v[1], _mm512_srli_epi64(o.v[0], 51));
  o.v[0] = _mm512_and_epi64(o.v[0], m);
  o.v[2] = _mm512_add_epi64(o.v[2], _mm512_srli_epi64(o.v[1], 51));
  o.v[1] = _mm512_and_epi64(o.v[1], m);
  o.v[3] = _mm512_add_epi64(o.v[3], _mm512_srli_epi64(o.v[2], 51));
  o.v[2] = _mm512_and_epi64(o.v[2], m);
  o.v[4] = _mm512_add_epi64(o.v[4], _mm512_srli_epi64(o.v[3], 51));
  o.v[3] = _mm512_and_epi64(o.v[3], m);
  __m512i c = _mm512_srli_epi64(o.v[4], 51);
  o.v[4] = _mm512_and_epi64(o.v[4], m);
  // carry < 2^12 here, so 19*c fits easily and limb0 stays < 2^52
  o.v[0] = _mm512_add_epi64(o.v[0], _mm512_mullo_epi64(c, nineteen));
  o.v[1] = _mm512_add_epi64(o.v[1], _mm512_srli_epi64(o.v[0], 51));
  o.v[0] = _mm512_and_epi64(o.v[0], m);
}

static inline void fe8_add(Fe8 &o, const Fe8 &a, const Fe8 &b) {
  for (int i = 0; i < 5; i++) o.v[i] = _mm512_add_epi64(a.v[i], b.v[i]);
  fe8_carry(o);
}

static inline void fe8_sub(Fe8 &o, const Fe8 &a, const Fe8 &b) {
  // a + 4p - b; 4p limbs (~2^53) dominate b (< 2^52): no underflow
  for (int i = 0; i < 5; i++)
    o.v[i] = _mm512_sub_epi64(_mm512_add_epi64(a.v[i], bc(FOURP51[i])), b.v[i]);
  fe8_carry(o);
}

// t[0..9] (each < 2^56) -> o with limbs < 2^52: fold *19, then carry
static inline void fe8_reduce10(Fe8 &o, __m512i *t) {
  const __m512i nineteen = bc(19);
  for (int k = 0; k < 5; k++)
    o.v[k] = _mm512_add_epi64(t[k], _mm512_mullo_epi64(t[k + 5], nineteen));
  fe8_carry(o);
}

static inline void fe8_mul(Fe8 &o, const Fe8 &a, const Fe8 &b) {
  __m512i lo[9], hi[9];
  const __m512i z = _mm512_setzero_si512();
  for (int k = 0; k < 9; k++) lo[k] = hi[k] = z;
  for (int i = 0; i < 5; i++)
    for (int j = 0; j < 5; j++) {
      lo[i + j] = _mm512_madd52lo_epu64(lo[i + j], a.v[i], b.v[j]);
      hi[i + j] = _mm512_madd52hi_epu64(hi[i + j], a.v[i], b.v[j]);
    }
  // product limb k (weight 2^51k) = lo[k] + 2*hi[k-1]
  // (hi has weight 2^52 relative to its column: 2^52 = 2 * 2^51)
  __m512i t[10];
  t[0] = lo[0];
  for (int k = 1; k < 9; k++)
    t[k] = _mm512_add_epi64(lo[k], _mm512_add_epi64(hi[k - 1], hi[k - 1]));
  t[9] = _mm512_add_epi64(hi[8], hi[8]);
  fe8_reduce10(o, t);
}

static inline void fe8_sq(Fe8 &o, const Fe8 &a) {
  __m512i lo[9], hi[9];
  const __m512i z = _mm512_setzero_si512();
  for (int k = 0; k < 9; k++) lo[k] = hi[k] = z;
  // off-diagonal pairs once, then double the accumulators
  for (int i = 0; i < 5; i++)
    for (int j = i + 1; j < 5; j++) {
      lo[i + j] = _mm512_madd52lo_epu64(lo[i + j], a.v[i], a.v[j]);
      hi[i + j] = _mm512_madd52hi_epu64(hi[i + j], a.v[i], a.v[j]);
    }
  for (int k = 0; k < 9; k++) {
    lo[k] = _mm512_add_epi64(lo[k], lo[k]);
    hi[k] = _mm512_add_epi64(hi[k], hi[k]);
  }
  for (int i = 0; i < 5; i++) {
    lo[2 * i] = _mm512_madd52lo_epu64(lo[2 * i], a.v[i], a.v[i]);
    hi[2 * i] = _mm512_madd52hi_epu64(hi[2 * i], a.v[i], a.v[i]);
  }
  __m512i t[10];
  t[0] = lo[0];
  for (int k = 1; k < 9; k++)
    t[k] = _mm512_add_epi64(lo[k], _mm512_add_epi64(hi[k - 1], hi[k - 1]));
  t[9] = _mm512_add_epi64(hi[8], hi[8]);
  fe8_reduce10(o, t);
}

static Fe8 TWO_D_8;  // 2d broadcast into all lanes

static inline void fe8_zero(Fe8 &o) {
  for (int i = 0; i < 5; i++) o.v[i] = _mm512_setzero_si512();
}

static inline void fe8_one(Fe8 &o) {
  fe8_zero(o);
  o.v[0] = bc(1);
}

static inline void pt8_identity(Pt8 &o) {
  fe8_zero(o.x);
  fe8_one(o.y);
  fe8_one(o.z);
  fe8_zero(o.t);
}

// add-2008-hwcd-3, identical schedule to the scalar pt_add
static void pt8_add(Pt8 &o, const Pt8 &p, const Pt8 &q) {
  Fe8 a, b, c, d, e, f, g, h, t0, t1;
  fe8_sub(t0, p.y, p.x);
  fe8_sub(t1, q.y, q.x);
  fe8_mul(a, t0, t1);
  fe8_add(t0, p.y, p.x);
  fe8_add(t1, q.y, q.x);
  fe8_mul(b, t0, t1);
  fe8_mul(t0, p.t, TWO_D_8);
  fe8_mul(c, t0, q.t);
  fe8_add(t0, p.z, p.z);
  fe8_mul(d, t0, q.z);
  fe8_sub(e, b, a);
  fe8_sub(f, d, c);
  fe8_add(g, d, c);
  fe8_add(h, b, a);
  fe8_mul(o.x, e, f);
  fe8_mul(o.y, g, h);
  fe8_mul(o.z, f, g);
  fe8_mul(o.t, e, h);
}

static void pt8_double(Pt8 &o, const Pt8 &p) {
  Fe8 a, b, c, h, e, g, f, t0;
  fe8_sq(a, p.x);
  fe8_sq(b, p.y);
  fe8_sq(c, p.z);
  fe8_add(c, c, c);
  fe8_add(h, a, b);
  fe8_add(t0, p.x, p.y);
  fe8_sq(t0, t0);
  fe8_sub(e, h, t0);
  fe8_sub(g, a, b);
  fe8_add(f, c, g);
  fe8_mul(o.x, e, f);
  fe8_mul(o.y, g, h);
  fe8_mul(o.t, e, h);
  fe8_mul(o.z, f, g);
}

static void pt8_neg(Pt8 &o, const Pt8 &p) {
  Fe8 zero;
  fe8_zero(zero);
  fe8_sub(o.x, zero, p.x);
  o.y = p.y;
  o.z = p.z;
  fe8_sub(o.t, zero, p.t);
}

// ---- packed 4x64 <-> lane transposes -------------------------------------

// unpack one packed 4x64 value into radix-51 limbs (same as ed25519.cc)
static inline void unpack51(u64 *o, const u64 *d) {
  o[0] = d[0] & M51;
  o[1] = ((d[0] >> 51) | (d[1] << 13)) & M51;
  o[2] = ((d[1] >> 38) | (d[2] << 26)) & M51;
  o[3] = ((d[2] >> 25) | (d[3] << 39)) & M51;
  o[4] = d[3] >> 12;
}

// full canonicalization (copy of ed25519.cc fe_pack over a plain array)
static void pack51(u64 *d, const u64 *a) {
  static const u64 P[4] = {0xffffffffffffffedULL, 0xffffffffffffffffULL,
                           0xffffffffffffffffULL, 0x7fffffffffffffffULL};
  u64 t[5];
  memcpy(t, a, sizeof(t));
  for (int pass = 0; pass < 3; pass++) {
    u64 c = 0;
    for (int i = 0; i < 5; i++) {
      t[i] += c;
      c = t[i] >> 51;
      t[i] &= M51;
    }
    t[0] += 19 * c;
  }
  u64 c = t[0] >> 51;
  t[0] &= M51;
  t[1] += c;
  c = t[1] >> 51;
  t[1] &= M51;
  t[2] += c;
  c = t[2] >> 51;
  t[2] &= M51;
  t[3] += c;
  c = t[3] >> 51;
  t[3] &= M51;
  t[4] += c;
  u64 p4[4];
  p4[0] = t[0] | (t[1] << 51);
  p4[1] = (t[1] >> 13) | (t[2] << 38);
  p4[2] = (t[2] >> 26) | (t[3] << 25);
  p4[3] = (t[3] >> 39) | (t[4] << 12);
  unsigned __int128 borrow = 0;
  u64 s[4];
  for (int i = 0; i < 4; i++) {
    unsigned __int128 diff = (unsigned __int128)p4[i] - P[i] - borrow;
    s[i] = (u64)diff;
    borrow = (diff >> 64) & 1;
  }
  memcpy(d, borrow ? p4 : s, 32);
}

// load m (<=8) points, point i at src + idx[i]*16 (xyzt packed 4x64);
// missing lanes get the identity so the shared ladder stays branch-free
static void load_pt8(Pt8 &o, const u64 *src, const u64 *idx, int m) {
  alignas(64) u64 lanes[4][5][8];  // [coord][limb][lane]
  for (int c = 0; c < 4; c++)
    for (int l = 0; l < 5; l++)
      for (int k = 0; k < 8; k++) lanes[c][l][k] = 0;
  for (int k = 0; k < 8; k++) {
    if (k < m) {
      const u64 *p = src + idx[k] * 16;
      u64 f[5];
      for (int c = 0; c < 4; c++) {
        unpack51(f, p + c * 4);
        for (int l = 0; l < 5; l++) lanes[c][l][k] = f[l];
      }
    } else {
      lanes[1][0][k] = 1;  // y = 1
      lanes[2][0][k] = 1;  // z = 1
    }
  }
  Fe8 *coords[4] = {&o.x, &o.y, &o.z, &o.t};
  for (int c = 0; c < 4; c++)
    for (int l = 0; l < 5; l++)
      coords[c]->v[l] = _mm512_load_si512((const void *)lanes[c][l]);
}

static void store_pt8(u64 *dst, const Pt8 &p, int m) {
  alignas(64) u64 lanes[4][5][8];
  const Fe8 *coords[4] = {&p.x, &p.y, &p.z, &p.t};
  for (int c = 0; c < 4; c++)
    for (int l = 0; l < 5; l++)
      _mm512_store_si512((void *)lanes[c][l], coords[c]->v[l]);
  for (int k = 0; k < m; k++) {
    u64 f[5];
    for (int c = 0; c < 4; c++) {
      for (int l = 0; l < 5; l++) f[l] = lanes[c][l][k];
      pack51(dst + k * 16 + c * 4, f);
    }
  }
}

static void init_two_d() {
  static bool done = false;
  if (done) return;
  static const u64 TWO_D_PLAIN[4] = {0xebd69b9426b2f159ULL,
                                     0x00e0149a8283b156ULL,
                                     0x198e80f2eef3d130ULL,
                                     0x2406d9dc56dffce7ULL};
  u64 f[5];
  unpack51(f, TWO_D_PLAIN);
  for (int l = 0; l < 5; l++) TWO_D_8.v[l] = bc(f[l]);
  done = true;
}

// shared-digit wNAF ladder on 8 points: every lane multiplies by the SAME
// scalar, so the digit loop is one branch stream for all lanes
static void pt8_scalar_mul_wnaf(Pt8 &o, const Pt8 &p, const signed char *digits,
                                int len) {
  Pt8 table[8];  // 1p, 3p, ..., 15p
  table[0] = p;
  Pt8 p2, tmp;
  pt8_double(p2, p);
  for (int i = 1; i < 8; i++) pt8_add(table[i], table[i - 1], p2);
  Pt8 acc;
  pt8_identity(acc);
  for (int i = len - 1; i >= 0; i--) {
    pt8_double(tmp, acc);
    acc = tmp;
    int d = digits[i];
    if (d > 0) {
      pt8_add(tmp, acc, table[d >> 1]);
      acc = tmp;
    } else if (d < 0) {
      Pt8 neg;
      pt8_neg(neg, table[(-d) >> 1]);
      pt8_add(tmp, acc, neg);
      acc = tmp;
    }
  }
  o = acc;
}

}  // namespace

extern "C" {

int vmpc_ed_ifma_available(void) {
  return __builtin_cpu_supports("avx512ifma") &&
         __builtin_cpu_supports("avx512dq") &&
         __builtin_cpu_supports("avx512vl");
}

// one 8-lane block of the fold: out_i = gl_i^c * gr_i for up to 8 points.
// digits/len: shared wNAF-5 recoding of c (done once by the caller).
void vmpc_ed_fold_block8(const u64 *gl, const u64 *gr, u64 lo, u64 m,
                         const signed char *digits, int len, u64 *out) {
  init_two_d();
  u64 idx[8];
  for (int k = 0; k < 8; k++) idx[k] = lo + ((u64)k < m ? (u64)k : 0);
  Pt8 l, r, s, res;
  load_pt8(l, gl, idx, (int)m);
  load_pt8(r, gr, idx, (int)m);
  pt8_scalar_mul_wnaf(s, l, digits, len);
  pt8_add(res, s, r);
  store_pt8(out + lo * 16, res, (int)m);
}

// one 8-lane block of same-scalar batch scalar-mul: out_i = p_i^c
void vmpc_ed_smul_block8(const u64 *pts, u64 lo, u64 m,
                         const signed char *digits, int len, u64 *out) {
  init_two_d();
  u64 idx[8];
  for (int k = 0; k < 8; k++) idx[k] = lo + ((u64)k < m ? (u64)k : 0);
  Pt8 p, s;
  load_pt8(p, pts, idx, (int)m);
  pt8_scalar_mul_wnaf(s, p, digits, len);
  store_pt8(out + lo * 16, s, (int)m);
}

}  // extern "C"

#else  // no AVX512IFMA at build time: stubs so the .so always links

extern "C" {
int vmpc_ed_ifma_available(void) { return 0; }
void vmpc_ed_fold_block8(const u64 *, const u64 *, u64, u64,
                         const signed char *, int, u64 *) {}
void vmpc_ed_smul_block8(const u64 *, u64, u64, const signed char *, int,
                         u64 *) {}
}

#endif
