// Native host tier: Ed25519 group arithmetic over GF(2^255 - 19).
//
// 4x64-bit Montgomery limbs (unsigned __int128 multiplies), extended
// twisted-Edwards coordinates with the complete add-2008-hwcd-3 formulas,
// and a bucket-method (Pippenger) MSM.  Exposed through a C ABI and loaded
// from Python with ctypes (no pybind11 in this environment).
//
// This is the framework's fast CPU path: it backs the dispatch layer when no
// TPU is attached and provides the host-side reference the TPU kernels are
// tested against at scale.

#include <cstdint>
#include <cstring>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace {

// p = 2^255 - 19
static const u64 P[4] = {0xffffffffffffffedULL, 0xffffffffffffffffULL,
                         0xffffffffffffffffULL, 0x7fffffffffffffffULL};
// -p^{-1} mod 2^64
static const u64 NPRIME = 0x86bca1af286bca1bULL;
// R^2 mod p (R = 2^256)
static const u64 R2[4] = {0x00000000000005a4ULL, 0ULL, 0ULL, 0ULL};
// R mod p (Montgomery one)
static const u64 ONE_M[4] = {0x0000000000000026ULL, 0ULL, 0ULL, 0ULL};
// 2d * R mod p (Montgomery domain), d = -121665/121666 mod p
static u64 TWO_D_M[4];

struct Fe {
  u64 v[4];
};

static inline void fe_set(Fe &o, const u64 *src) { memcpy(o.v, src, 32); }

static inline void fe_add(Fe &o, const Fe &a, const Fe &b) {
  u128 c = 0;
  u64 t[4];
  for (int i = 0; i < 4; i++) {
    c += (u128)a.v[i] + b.v[i];
    t[i] = (u64)c;
    c >>= 64;
  }
  // conditional subtract p (sum < 2p < 2^256, carry-out impossible for p<2^255)
  u128 borrow = 0;
  u64 s[4];
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)t[i] - P[i] - borrow;
    s[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  u64 keep = (u64)0 - (u64)(borrow & 1 & !c);  // borrow && no carry -> keep t
  for (int i = 0; i < 4; i++) o.v[i] = (t[i] & keep) | (s[i] & ~keep);
}

static inline void fe_sub(Fe &o, const Fe &a, const Fe &b) {
  u128 borrow = 0;
  u64 t[4];
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    t[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {
    u128 c = 0;
    for (int i = 0; i < 4; i++) {
      c += (u128)t[i] + P[i];
      t[i] = (u64)c;
      c >>= 64;
    }
  }
  memcpy(o.v, t, 32);
}

// Montgomery multiplication (CIOS)
static inline void fe_mul(Fe &o, const Fe &a, const Fe &b) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; i++) {
    u128 c = 0;
    u64 ai = a.v[i];
    for (int j = 0; j < 4; j++) {
      c += (u128)t[j] + (u128)ai * b.v[j];
      t[j] = (u64)c;
      c >>= 64;
    }
    c += t[4];
    t[4] = (u64)c;
    t[5] = (u64)(c >> 64);

    u64 m = t[0] * NPRIME;
    c = (u128)t[0] + (u128)m * P[0];
    c >>= 64;
    for (int j = 1; j < 4; j++) {
      c += (u128)t[j] + (u128)m * P[j];
      t[j - 1] = (u64)c;
      c >>= 64;
    }
    c += t[4];
    t[3] = (u64)c;
    t[4] = t[5] + (u64)(c >> 64);
    t[5] = 0;
  }
  // t[0..4] holds result < 2p; conditional subtract
  u128 borrow = 0;
  u64 s[4];
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)t[i] - P[i] - borrow;
    s[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  if (t[4] || !borrow) {
    memcpy(o.v, s, 32);
  } else {
    memcpy(o.v, t, 32);
  }
}

static inline void fe_to_mont(Fe &o, const Fe &a) {
  Fe r2;
  fe_set(r2, R2);
  fe_mul(o, a, r2);
}

static inline void fe_from_mont(Fe &o, const Fe &a) {
  Fe one;
  memset(one.v, 0, 32);
  one.v[0] = 1;
  fe_mul(o, a, one);
}

struct Pt {
  Fe x, y, z, t;
};

static void pt_identity(Pt &o) {
  memset(&o, 0, sizeof(o));
  fe_set(o.y, ONE_M);
  fe_set(o.z, ONE_M);
}

// unified add (complete on the prime-order subgroup)
static void pt_add(Pt &o, const Pt &p, const Pt &q) {
  Fe a, b, c, d, e, f, g, h, t0, t1;
  fe_sub(t0, p.y, p.x);
  fe_sub(t1, q.y, q.x);
  fe_mul(a, t0, t1);
  fe_add(t0, p.y, p.x);
  fe_add(t1, q.y, q.x);
  fe_mul(b, t0, t1);
  Fe twod;
  fe_set(twod, TWO_D_M);
  fe_mul(t0, p.t, twod);
  fe_mul(c, t0, q.t);
  fe_add(t0, p.z, p.z);
  fe_mul(d, t0, q.z);
  fe_sub(e, b, a);
  fe_sub(f, d, c);
  fe_add(g, d, c);
  fe_add(h, b, a);
  fe_mul(o.x, e, f);
  fe_mul(o.y, g, h);
  fe_mul(o.z, f, g);
  fe_mul(o.t, e, h);
}

// dedicated doubling (dbl-2008-hwcd): 4M + 4S vs the unified add's 9M
static void pt_double(Pt &o, const Pt &p) {
  Fe a, b, c, h, e, g, f, t0;
  fe_mul(a, p.x, p.x);
  fe_mul(b, p.y, p.y);
  fe_mul(c, p.z, p.z);
  fe_add(c, c, c);
  fe_add(h, a, b);
  fe_add(t0, p.x, p.y);
  fe_mul(t0, t0, t0);
  fe_sub(e, h, t0);
  fe_sub(g, a, b);
  fe_add(f, c, g);
  fe_mul(o.x, e, f);
  fe_mul(o.y, g, h);
  fe_mul(o.t, e, h);
  fe_mul(o.z, f, g);
}

static void pt_neg(Pt &o, const Pt &p) {
  Fe zero;
  memset(zero.v, 0, 32);
  fe_sub(o.x, zero, p.x);
  o.y = p.y;
  o.z = p.z;
  fe_sub(o.t, zero, p.t);
}

static void load_pt(Pt &o, const u64 *src) {
  // src: 16 u64 = x, y, z, t in normal domain
  Fe tmp;
  memcpy(tmp.v, src + 0, 32);
  fe_to_mont(o.x, tmp);
  memcpy(tmp.v, src + 4, 32);
  fe_to_mont(o.y, tmp);
  memcpy(tmp.v, src + 8, 32);
  fe_to_mont(o.z, tmp);
  memcpy(tmp.v, src + 12, 32);
  fe_to_mont(o.t, tmp);
}

static void store_pt(u64 *dst, const Pt &p) {
  Fe tmp;
  fe_from_mont(tmp, p.x);
  memcpy(dst + 0, tmp.v, 32);
  fe_from_mont(tmp, p.y);
  memcpy(dst + 4, tmp.v, 32);
  fe_from_mont(tmp, p.z);
  memcpy(dst + 8, tmp.v, 32);
  fe_from_mont(tmp, p.t);
  memcpy(dst + 12, tmp.v, 32);
}

static int scalar_bit(const u64 *s, int bit) {
  return (s[bit >> 6] >> (bit & 63)) & 1;
}

// width-5 NAF recode: digits odd in [-15, 15] or 0; returns digit count.
// ~n/6 nonzero digits vs n/2 set bits for plain double-and-add.
static int wnaf5(const u64 *s, signed char *digits) {
  u64 k[5] = {s[0], s[1], s[2], s[3], 0};
  int len = 0;
  while (k[0] | k[1] | k[2] | k[3] | k[4]) {
    int d = 0;
    if (k[0] & 1) {
      d = (int)(k[0] & 31);
      if (d > 16) d -= 32;
      // k -= d
      if (d > 0) {
        u128 borrow = (u64)d;
        for (int i = 0; i < 5 && borrow; i++) {
          u128 t = (u128)k[i] - borrow;
          k[i] = (u64)t;
          borrow = (t >> 64) ? 1 : 0;
        }
      } else {
        u128 carry = (u64)(-d);
        for (int i = 0; i < 5 && carry; i++) {
          carry += k[i];
          k[i] = (u64)carry;
          carry >>= 64;
        }
      }
    }
    digits[len++] = (signed char)d;
    // k >>= 1
    for (int i = 0; i < 4; i++) k[i] = (k[i] >> 1) | (k[i + 1] << 63);
    k[4] >>= 1;
  }
  return len;
}

// scalar mul via precomputed wNAF digits and the point's odd multiples
static void pt_scalar_mul_wnaf(Pt &o, const Pt &p, const signed char *digits,
                               int len) {
  Pt table[8];  // 1p, 3p, 5p, ..., 15p
  table[0] = p;
  Pt p2, tmp;
  pt_double(p2, p);
  for (int i = 1; i < 8; i++) pt_add(table[i], table[i - 1], p2);
  Pt acc;
  pt_identity(acc);
  for (int i = len - 1; i >= 0; i--) {
    pt_double(tmp, acc);
    acc = tmp;
    int d = digits[i];
    if (d > 0) {
      pt_add(tmp, acc, table[d >> 1]);
      acc = tmp;
    } else if (d < 0) {
      Pt neg;
      pt_neg(neg, table[(-d) >> 1]);
      pt_add(tmp, acc, neg);
      acc = tmp;
    }
  }
  o = acc;
}

static void pt_scalar_mul(Pt &o, const Pt &p, const u64 *s) {
  signed char digits[260];
  int len = wnaf5(s, digits);
  pt_scalar_mul_wnaf(o, p, digits, len);
}

// a^(p-2) in Montgomery domain (Fermat inversion)
static void fe_inv(Fe &o, const Fe &a) {
  static const u64 PM2[4] = {0xffffffffffffffebULL, 0xffffffffffffffffULL,
                             0xffffffffffffffffULL, 0x7fffffffffffffffULL};
  Fe r;
  fe_set(r, ONE_M);
  for (int bit = 254; bit >= 0; bit--) {
    Fe t;
    fe_mul(t, r, r);
    r = t;
    if ((PM2[bit >> 6] >> (bit & 63)) & 1) {
      fe_mul(t, r, a);
      r = t;
    }
  }
  o = r;
}

static void init_constants() {
  static bool done = false;
  if (done) return;
  // 2d mod p = 2 * (-121665/121666): precomputed plain value
  static const u64 TWO_D_PLAIN[4] = {0xebd69b9426b2f159ULL, 0x00e0149a8283b156ULL,
                                     0x198e80f2eef3d130ULL, 0x2406d9dc56dffce7ULL};
  Fe tmp;
  memcpy(tmp.v, TWO_D_PLAIN, 32);
  Fe m;
  fe_to_mont(m, tmp);
  memcpy(TWO_D_M, m.v, 32);
  done = true;
}

}  // namespace

extern "C" {

// points: n*16 u64 (xyzt plain), scalars: n*4 u64, out: 16 u64
void vmpc_ed_msm(const u64 *points, const u64 *scalars, u64 n, u64 *out) {
  init_constants();
  // Pippenger: window size by n
  int w = 4;
  if (n >= 32) w = 8;
  if (n >= 4096) w = 12;
  if (n >= 262144) w = 16;
  int nwin = (256 + w - 1) / w;
  size_t nbuckets = ((size_t)1 << w) - 1;

  std::vector<Pt> pts(n);
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < (long long)n; i++) load_pt(pts[i], points + i * 16);

  // windows are independent: bucket-accumulate them in parallel
  std::vector<Pt> window_sums(nwin);
#pragma omp parallel for schedule(dynamic, 1)
  for (int win = 0; win < nwin; win++) {
    std::vector<Pt> buckets(nbuckets);
    std::vector<char> used(nbuckets, 0);
    int base = win * w;
    for (u64 i = 0; i < n; i++) {
      u64 digit = 0;
      for (int k = w - 1; k >= 0; k--) {
        int bit = base + k;
        digit = (digit << 1) | (bit < 256 ? scalar_bit(scalars + i * 4, bit) : 0);
      }
      if (!digit) continue;
      size_t b = digit - 1;
      if (!used[b]) {
        buckets[b] = pts[i];
        used[b] = 1;
      } else {
        Pt tmp;
        pt_add(tmp, buckets[b], pts[i]);
        buckets[b] = tmp;
      }
    }
    // running-sum bucket combine: sum_k k*B_k
    Pt running, windowsum;
    pt_identity(running);
    pt_identity(windowsum);
    for (size_t b = nbuckets; b-- > 0;) {
      if (used[b]) {
        Pt tmp;
        pt_add(tmp, running, buckets[b]);
        running = tmp;
      }
      Pt tmp;
      pt_add(tmp, windowsum, running);
      windowsum = tmp;
    }
    window_sums[win] = windowsum;
  }

  Pt result;
  pt_identity(result);
  for (int win = nwin - 1; win >= 0; win--) {
    for (int k = 0; k < w; k++) {
      Pt tmp;
      pt_double(tmp, result);
      result = tmp;
    }
    Pt tmp;
    pt_add(tmp, result, window_sums[win]);
    result = tmp;
  }
  store_pt(out, result);
}

// base: 16 u64, exps: n*4, out: n*16
void vmpc_ed_batch_exp(const u64 *base, const u64 *exps, u64 n, u64 *out) {
  init_constants();
  Pt b;
  load_pt(b, base);
  // 8-bit fixed-base comb (see bn256.cc batch_exp): <= 32 adds per
  // exponentiation after a 32*255-add table build
  std::vector<Pt> table(32 * 255);
  Pt cur = b;
  for (int win = 0; win < 32; win++) {
    Pt *t = &table[win * 255];
    t[0] = cur;
    for (int v = 2; v <= 255; v++) pt_add(t[v - 1], t[v - 2], cur);
    if (win < 31) {
      Pt nxt;
      pt_add(nxt, t[254], cur);  // 256*cur = 255*cur + cur
      cur = nxt;
    }
  }
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < (long long)n; i++) {
    Pt acc;
    pt_identity(acc);
    const u64 *e = exps + i * 4;
    for (int win = 0; win < 32; win++) {
      unsigned byte = (unsigned)((e[win / 8] >> (8 * (win % 8))) & 0xFF);
      if (byte) {
        Pt tmp;
        pt_add(tmp, acc, table[win * 255 + byte - 1]);
        acc = tmp;
      }
    }
    store_pt(out + i * 16, acc);
  }
}

// gl, gr: n*16, c: 4 u64, out: n*16  (out_i = gl_i^c * gr_i)
void vmpc_ed_fold(const u64 *gl, const u64 *gr, const u64 *c, u64 n, u64 *out) {
  init_constants();
  // one wNAF recode of the shared challenge for the whole vector
  signed char digits[260];
  int len = wnaf5(c, digits);
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < (long long)n; i++) {
    Pt l, r, s, tmp;
    load_pt(l, gl + i * 16);
    load_pt(r, gr + i * 16);
    pt_scalar_mul_wnaf(s, l, digits, len);
    pt_add(tmp, s, r);
    store_pt(out + i * 16, tmp);
  }
}

// in-place affine normalization of n plain-domain points: x/z, y/z, 1, x*y/z^2
// (matches groups/edwards.py EdwardsPoint.normalize / batch_normalize).
// Montgomery's batch-inversion trick per OpenMP chunk.
void vmpc_ed_batch_normalize(u64 *pts, u64 n) {
  init_constants();
#pragma omp parallel
  {
    int nthreads = 1, tid = 0;
#ifdef _OPENMP
    nthreads = omp_get_num_threads();
    tid = omp_get_thread_num();
#endif
    u64 chunk = (n + nthreads - 1) / nthreads;
    u64 lo = (u64)tid * chunk;
    u64 hi = lo + chunk < n ? lo + chunk : n;
    if (lo < hi) {
      u64 m = hi - lo;
      std::vector<Fe> zs(m), prefix(m + 1);
      for (u64 i = 0; i < m; i++) {
        Fe tmp;
        memcpy(tmp.v, pts + (lo + i) * 16 + 8, 32);
        fe_to_mont(zs[i], tmp);
      }
      fe_set(prefix[0], ONE_M);
      for (u64 i = 0; i < m; i++) fe_mul(prefix[i + 1], prefix[i], zs[i]);
      Fe inv;
      fe_inv(inv, prefix[m]);
      for (u64 i = m; i-- > 0;) {
        Fe zinv, t;
        fe_mul(zinv, prefix[i], inv);
        fe_mul(t, inv, zs[i]);
        inv = t;
        Fe x, y, xn, yn, tn;
        memcpy(x.v, pts + (lo + i) * 16 + 0, 32);
        fe_to_mont(x, x);
        memcpy(y.v, pts + (lo + i) * 16 + 4, 32);
        fe_to_mont(y, y);
        fe_mul(xn, x, zinv);
        fe_mul(yn, y, zinv);
        fe_mul(tn, xn, yn);
        Fe plain;
        fe_from_mont(plain, xn);
        memcpy(pts + (lo + i) * 16 + 0, plain.v, 32);
        fe_from_mont(plain, yn);
        memcpy(pts + (lo + i) * 16 + 4, plain.v, 32);
        memset(pts + (lo + i) * 16 + 8, 0, 32);
        pts[(lo + i) * 16 + 8] = 1;
        fe_from_mont(plain, tn);
        memcpy(pts + (lo + i) * 16 + 12, plain.v, 32);
      }
    }
  }
}

// serialization bytes for n normalized plain-domain points: per point the
// canonical hash encoding 0x12 (T_ED) then for x,y,z,t a 4-byte big-endian
// length and the value as a minimal signed big-endian int (coords are in
// [0, p), hence non-negative: nbytes = floor(bitlen/8) + 1).
// out must hold >= n * 149 bytes; *outlen receives the bytes written.
void vmpc_ed_hash_encode(const u64 *pts, u64 n, unsigned char *out,
                         u64 *outlen) {
  unsigned char *w = out;
  for (u64 i = 0; i < n; i++) {
    *w++ = 0x12;
    for (int j = 0; j < 4; j++) {
      const u64 *v = pts + i * 16 + j * 4;
      int bitlen = 0;
      for (int k = 3; k >= 0; k--) {
        if (v[k]) {
          bitlen = 64 * k + 64 - __builtin_clzll(v[k]);
          break;
        }
      }
      int nbytes = bitlen / 8 + 1;
      w[0] = 0;
      w[1] = 0;
      w[2] = (unsigned char)(nbytes >> 8);
      w[3] = (unsigned char)(nbytes & 0xff);
      w += 4;
      for (int b = nbytes - 1; b >= 0; b--) {
        *w++ = (unsigned char)(v[b >> 3] >> ((b & 7) * 8));
      }
    }
  }
  *outlen = (u64)(w - out);
}

// pairwise ops for testing: out = a + b
void vmpc_ed_add(const u64 *a, const u64 *b, u64 *out) {
  init_constants();
  Pt pa, pb, o;
  load_pt(pa, a);
  load_pt(pb, b);
  pt_add(o, pa, pb);
  store_pt(out, o);
}

// scalar mul for testing
void vmpc_ed_scalar_mul(const u64 *a, const u64 *s, u64 *out) {
  init_constants();
  Pt pa, o;
  load_pt(pa, a);
  pt_scalar_mul(o, pa, s);
  store_pt(out, o);
}

}  // extern "C"
