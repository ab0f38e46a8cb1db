// Native host tier: Ed25519 group arithmetic over GF(2^255 - 19).
//
// Radix-2^51 pseudo-Mersenne field arithmetic (donna-style lazy reduction:
// adds/subs are 5 limb ops with NO carries or conditional subtracts; muls
// fold the 2^255 overflow back with *19), extended twisted-Edwards
// coordinates with the complete add-2008-hwcd-3 formulas, and a
// bucket-method (Pippenger) MSM.  Exposed through a C ABI and loaded from
// Python with ctypes (no pybind11 in this environment).
//
// Limb-bound discipline (audited against the two point formulas):
// stored coordinates and mul/sq outputs have limbs < 2^52; fe_add of two
// such values < 2^53; fe_sub adds 4p (limbs ~2^53) so < a + 2^53.1; the
// worst mul input is f = c + g in pt_double with limbs < 2^54.4, giving
// per-column u128 sums < 2^115 — comfortably inside u128.
//
// This is the framework's fast CPU path: it backs the dispatch layer when
// no TPU is attached and provides the host-side reference the TPU kernels
// are tested against at scale.

#include <cstdint>
#include <cstring>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace {

// p = 2^255 - 19 (packed 4x64 form, used only at the canonical boundary)
static const u64 P[4] = {0xffffffffffffffedULL, 0xffffffffffffffffULL,
                         0xffffffffffffffffULL, 0x7fffffffffffffffULL};

static const u64 M51 = (1ULL << 51) - 1;
// 4p in radix 2^51: headroom added in fe_sub so limb subtraction of any
// reduced (< 2^52) operand cannot underflow
static const u64 FOURP[5] = {
    (M51 + 1 - 19) * 4, M51 * 4, M51 * 4, M51 * 4, M51 * 4,
};

struct Fe {
  u64 v[5];  // radix 2^51, plain (non-Montgomery) domain
};

static Fe TWO_D_F;  // 2d, d = -121665/121666 mod p

static inline void fe_zero(Fe &o) { memset(o.v, 0, sizeof(o.v)); }

static inline void fe_one(Fe &o) {
  fe_zero(o);
  o.v[0] = 1;
}

// packed 4x64 little-endian (value < 2^256; bits >= 255 must be clear) ->
// radix 2^51
static inline void fe_unpack(Fe &o, const u64 *d) {
  o.v[0] = d[0] & M51;
  o.v[1] = ((d[0] >> 51) | (d[1] << 13)) & M51;
  o.v[2] = ((d[1] >> 38) | (d[2] << 26)) & M51;
  o.v[3] = ((d[2] >> 25) | (d[3] << 39)) & M51;
  o.v[4] = d[3] >> 12;
}

// full canonicalization: carry chains + one conditional subtract of p
static void fe_pack(u64 *d, const Fe &a) {
  u64 t[5];
  memcpy(t, a.v, sizeof(t));
  for (int pass = 0; pass < 3; pass++) {
    u64 c = 0;
    for (int i = 0; i < 5; i++) {
      t[i] += c;
      c = t[i] >> 51;
      t[i] &= M51;
    }
    t[0] += 19 * c;
  }
  // now value < 2^255 + small and limbs < 2^51 (+ tiny in t[0]); one more
  // mini-carry keeps every limb strictly < 2^51 except possibly t[4] + 1
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
  // value < 2p: at most one subtract
  u128 borrow = 0;
  u64 s[4];
  for (int i = 0; i < 4; i++) {
    u128 diff = (u128)p4[i] - P[i] - borrow;
    s[i] = (u64)diff;
    borrow = (diff >> 64) & 1;
  }
  memcpy(d, borrow ? p4 : s, 32);
}

static inline void fe_add(Fe &o, const Fe &a, const Fe &b) {
  for (int i = 0; i < 5; i++) o.v[i] = a.v[i] + b.v[i];
}

static inline void fe_sub(Fe &o, const Fe &a, const Fe &b) {
  // b must be reduced (< 2^52 limbs): coordinates and mul/sq outputs are
  for (int i = 0; i < 5; i++) o.v[i] = a.v[i] + FOURP[i] - b.v[i];
}

// carry a 5x u128 row vector into limbs < 2^52
static inline void fe_carry_from(Fe &o, u128 *t) {
  t[1] += (u64)(t[0] >> 51);
  o.v[0] = (u64)t[0] & M51;
  t[2] += (u64)(t[1] >> 51);
  o.v[1] = (u64)t[1] & M51;
  t[3] += (u64)(t[2] >> 51);
  o.v[2] = (u64)t[2] & M51;
  t[4] += (u64)(t[3] >> 51);
  o.v[3] = (u64)t[3] & M51;
  u128 c = t[4] >> 51;
  o.v[4] = (u64)t[4] & M51;
  u128 c0 = (u128)o.v[0] + 19 * c;  // c can reach ~2^60: fold in u128
  o.v[1] += (u64)(c0 >> 51);
  o.v[0] = (u64)c0 & M51;
}

static inline void fe_mul(Fe &o, const Fe &a, const Fe &b) {
  const u64 a0 = a.v[0], a1 = a.v[1], a2 = a.v[2], a3 = a.v[3], a4 = a.v[4];
  const u64 b0 = b.v[0], b1 = b.v[1], b2 = b.v[2], b3 = b.v[3], b4 = b.v[4];
  const u64 b1_19 = b1 * 19, b2_19 = b2 * 19, b3_19 = b3 * 19,
            b4_19 = b4 * 19;
  u128 t[5];
  t[0] = (u128)a0 * b0 + (u128)a1 * b4_19 + (u128)a2 * b3_19 +
         (u128)a3 * b2_19 + (u128)a4 * b1_19;
  t[1] = (u128)a0 * b1 + (u128)a1 * b0 + (u128)a2 * b4_19 +
         (u128)a3 * b3_19 + (u128)a4 * b2_19;
  t[2] = (u128)a0 * b2 + (u128)a1 * b1 + (u128)a2 * b0 +
         (u128)a3 * b4_19 + (u128)a4 * b3_19;
  t[3] = (u128)a0 * b3 + (u128)a1 * b2 + (u128)a2 * b1 + (u128)a3 * b0 +
         (u128)a4 * b4_19;
  t[4] = (u128)a0 * b4 + (u128)a1 * b3 + (u128)a2 * b2 + (u128)a3 * b1 +
         (u128)a4 * b0;
  fe_carry_from(o, t);
}

static inline void fe_sq(Fe &o, const Fe &a) {
  const u64 a0 = a.v[0], a1 = a.v[1], a2 = a.v[2], a3 = a.v[3], a4 = a.v[4];
  const u64 d0 = a0 * 2, d1 = a1 * 2;
  const u64 a3_19 = a3 * 19, a4_19 = a4 * 19;
  u128 t[5];
  t[0] = (u128)a0 * a0 + (u128)d1 * a4_19 + (u128)(a2 * 2) * a3_19;
  t[1] = (u128)d0 * a1 + (u128)(a2 * 2) * a4_19 + (u128)a3 * a3_19;
  t[2] = (u128)d0 * a2 + (u128)a1 * a1 + (u128)(a3 * 2) * a4_19;
  t[3] = (u128)d0 * a3 + (u128)d1 * a2 + (u128)a4 * a4_19;
  t[4] = (u128)d0 * a4 + (u128)d1 * a3 + (u128)a2 * a2;
  fe_carry_from(o, t);
}

struct Pt {
  Fe x, y, z, t;
};

static void pt_identity(Pt &o) {
  fe_zero(o.x);
  fe_one(o.y);
  fe_one(o.z);
  fe_zero(o.t);
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
  fe_mul(t0, p.t, TWO_D_F);
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
  fe_sq(a, p.x);
  fe_sq(b, p.y);
  fe_sq(c, p.z);
  fe_add(c, c, c);
  fe_add(h, a, b);
  fe_add(t0, p.x, p.y);
  fe_sq(t0, t0);
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
  fe_zero(zero);
  fe_sub(o.x, zero, p.x);
  o.y = p.y;
  o.z = p.z;
  fe_sub(o.t, zero, p.t);
}

static void load_pt(Pt &o, const u64 *src) {
  // src: 16 u64 = x, y, z, t packed 4x64 plain domain
  fe_unpack(o.x, src + 0);
  fe_unpack(o.y, src + 4);
  fe_unpack(o.z, src + 8);
  fe_unpack(o.t, src + 12);
}

static void store_pt(u64 *dst, const Pt &p) {
  fe_pack(dst + 0, p.x);
  fe_pack(dst + 4, p.y);
  fe_pack(dst + 8, p.z);
  fe_pack(dst + 12, p.t);
}

// ---- cached (z = 1) form for batch-normalized tables ----------------------
// (y+x, y-x, 2d*t): the mixed add below is 7M vs the unified add's 9M + the
// 2d multiply.  Tables (MSM inputs, the fixed-base comb) are normalized once
// with Montgomery's batch-inversion trick (one Fermat inversion per pass).

struct CPt {
  Fe ypx, ymx, t2d;
};

static void fe_inv(Fe &o, const Fe &a);  // defined below (Fermat ladder)

// canonical zero test (handles non-canonical representations 0 and p)
static bool fe_is_zero(const Fe &a) {
  u64 d[4];
  fe_pack(d, a);
  return (d[0] | d[1] | d[2] | d[3]) == 0;
}

static void pts_to_cached(const std::vector<Pt> &pts, std::vector<CPt> &out) {
  size_t n = pts.size();
  out.resize(n);
  if (n == 0) return;
  // Every VALID Edwards point (identity included) has z != 0, but a
  // malformed/adversarial z = 0 entry would zero the running product and
  // silently corrupt the whole batch after the single Fermat inversion.
  // Mirror the BN path (bn256.cc pts_to_affine inf flags): substitute 1 in
  // the inversion chain and emit the identity's cached form (ypx=1, ymx=1,
  // t2d=0 — exactly neutral under pt_add_cached), so a bad entry acts as
  // the identity instead of poisoning every other point.
  std::vector<char> bad(n, 0);
  std::vector<Fe> prefix(n + 1);
  fe_one(prefix[0]);
  for (size_t i = 0; i < n; i++) {
    Fe z = pts[i].z;
    if (fe_is_zero(z)) {
      bad[i] = 1;
      fe_one(z);
    }
    fe_mul(prefix[i + 1], prefix[i], z);
  }
  Fe inv;
  fe_inv(inv, prefix[n]);
  for (size_t i = n; i-- > 0;) {
    if (bad[i]) {
      fe_one(out[i].ypx);
      fe_one(out[i].ymx);
      fe_zero(out[i].t2d);
      continue;  // z was replaced by 1 in the chain: inv is already right
    }
    Fe zinv, t, x, y, tt;
    fe_mul(zinv, prefix[i], inv);
    fe_mul(t, inv, pts[i].z);
    inv = t;
    fe_mul(x, pts[i].x, zinv);
    fe_mul(y, pts[i].y, zinv);
    fe_mul(tt, pts[i].t, zinv);
    fe_add(out[i].ypx, y, x);
    fe_sub(out[i].ymx, y, x);
    fe_mul(out[i].t2d, tt, TWO_D_F);
  }
}

// complete on the subgroup like pt_add (identity in either operand works)
static void pt_add_cached(Pt &o, const Pt &p, const CPt &q) {
  Fe a, b, c, d, e, f, g, h, t0;
  fe_sub(t0, p.y, p.x);
  fe_mul(a, t0, q.ymx);
  fe_add(t0, p.y, p.x);
  fe_mul(b, t0, q.ypx);
  fe_mul(c, p.t, q.t2d);
  fe_add(d, p.z, p.z);
  fe_sub(e, b, a);
  fe_sub(f, d, c);
  fe_add(g, d, c);
  fe_add(h, b, a);
  fe_mul(o.x, e, f);
  fe_mul(o.y, g, h);
  fe_mul(o.z, f, g);
  fe_mul(o.t, e, h);
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

// a^(p-2) (Fermat inversion)
static void fe_inv(Fe &o, const Fe &a) {
  static const u64 PM2[4] = {0xffffffffffffffebULL, 0xffffffffffffffffULL,
                             0xffffffffffffffffULL, 0x7fffffffffffffffULL};
  Fe r;
  fe_one(r);
  for (int bit = 254; bit >= 0; bit--) {
    Fe t;
    fe_sq(t, r);
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
  fe_unpack(TWO_D_F, TWO_D_PLAIN);
  done = true;
}

}  // namespace

extern "C" {

// points: n*16 u64 (xyzt plain), scalars: n*4 u64, out: 16 u64
void vmpc_ed_msm(const u64 *points, const u64 *scalars, u64 n, u64 *out) {
  init_constants();
  // Pippenger: window size by n
  // Window size by n, capped at 11: beyond that the per-thread bucket
  // array (2^w * 128 B) falls out of L2 and the accumulate phase goes
  // memory-bound — measured at n=2^18 on 4 cores: w=11 686k pts/s,
  // w=12 683k, w=13 624k, w=16 433k (the old asymptotic-count choice).
  int w = 4;
  if (n >= 32) w = 8;
  if (n >= 4096) w = 11;
  if (n >= 1048576) w = 12;
  int nwin = (256 + w - 1) / w;
  size_t nbuckets = ((size_t)1 << w) - 1;

  std::vector<Pt> pts(n);
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < (long long)n; i++) load_pt(pts[i], points + i * 16);

  // normalize once: every bucket accumulate is then a 7M cached add
  std::vector<CPt> cpts;
  pts_to_cached(pts, cpts);

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
        pt_add_cached(tmp, buckets[b], cpts[i]);
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
  // batch-normalize the comb (one inversion): each comb add is then 7M
  std::vector<CPt> ctable;
  pts_to_cached(table, ctable);
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < (long long)n; i++) {
    Pt acc;
    pt_identity(acc);
    const u64 *e = exps + i * 4;
    for (int win = 0; win < 32; win++) {
      unsigned byte = (unsigned)((e[win / 8] >> (8 * (win % 8))) & 0xFF);
      if (byte) {
        Pt tmp;
        pt_add_cached(tmp, acc, ctable[win * 255 + byte - 1]);
        acc = tmp;
      }
    }
    store_pt(out + i * 16, acc);
  }
}

// AVX-512 IFMA tier (ed25519_ifma.cc): 8-point-parallel blocks
int vmpc_ed_ifma_available(void);
void vmpc_ed_fold_block8(const u64 *gl, const u64 *gr, u64 lo, u64 m,
                         const signed char *digits, int len, u64 *out);
void vmpc_ed_smul_block8(const u64 *pts, u64 lo, u64 m,
                         const signed char *digits, int len, u64 *out);

// gl, gr: n*16, c: 4 u64, out: n*16  (out_i = gl_i^c * gr_i)
void vmpc_ed_fold(const u64 *gl, const u64 *gr, const u64 *c, u64 n, u64 *out) {
  init_constants();
  // one wNAF recode of the shared challenge for the whole vector
  signed char digits[260];
  int len = wnaf5(c, digits);
  if (vmpc_ed_ifma_available() && n >= 8) {
    long long nblocks = (long long)((n + 7) / 8);
#pragma omp parallel for schedule(static)
    for (long long b = 0; b < nblocks; b++) {
      u64 lo = (u64)b * 8;
      u64 m = n - lo < 8 ? n - lo : 8;
      vmpc_ed_fold_block8(gl, gr, lo, m, digits, len, out);
    }
    return;
  }
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
      for (u64 i = 0; i < m; i++)
        fe_unpack(zs[i], pts + (lo + i) * 16 + 8);
      fe_one(prefix[0]);
      for (u64 i = 0; i < m; i++) fe_mul(prefix[i + 1], prefix[i], zs[i]);
      Fe inv;
      fe_inv(inv, prefix[m]);
      for (u64 i = m; i-- > 0;) {
        Fe zinv, t;
        fe_mul(zinv, prefix[i], inv);
        fe_mul(t, inv, zs[i]);
        inv = t;
        Fe x, y, xn, yn, tn;
        fe_unpack(x, pts + (lo + i) * 16 + 0);
        fe_unpack(y, pts + (lo + i) * 16 + 4);
        fe_mul(xn, x, zinv);
        fe_mul(yn, y, zinv);
        fe_mul(tn, xn, yn);
        fe_pack(pts + (lo + i) * 16 + 0, xn);
        fe_pack(pts + (lo + i) * 16 + 4, yn);
        memset(pts + (lo + i) * 16 + 8, 0, 32);
        pts[(lo + i) * 16 + 8] = 1;
        fe_pack(pts + (lo + i) * 16 + 12, tn);
      }
    }
  }
}

// serialization bytes for n normalized plain-domain points: per point the
// canonical hash encoding 0x12 (T_ED) then for x,y,z,t a 4-byte big-endian
// length and the value as a minimal signed big-endian int (coords are in
// [0, p), hence non-negative: nbytes = floor(bitlen/8) + 1).
// out must hold >= n * 149 bytes; *outlen receives the bytes written.
static inline int fe_enc_nbytes(const u64 *v) {
  int bitlen = 0;
  for (int k = 3; k >= 0; k--) {
    if (v[k]) {
      bitlen = 64 * k + 64 - __builtin_clzll(v[k]);
      break;
    }
  }
  return bitlen / 8 + 1;
}

void vmpc_ed_hash_encode(const u64 *pts, u64 n, unsigned char *out,
                         u64 *outlen) {
  // encode lengths are data-dependent (minimal signed big-endian), so run
  // two passes: per-point byte counts, serial prefix sum, parallel writes
  std::vector<u64> off(n + 1);
  off[0] = 0;
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < (long long)n; i++) {
    u64 len = 1;
    for (int j = 0; j < 4; j++)
      len += 4 + (u64)fe_enc_nbytes(pts + i * 16 + j * 4);
    off[i + 1] = len;
  }
  for (u64 i = 0; i < n; i++) off[i + 1] += off[i];
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < (long long)n; i++) {
    unsigned char *w = out + off[i];
    *w++ = 0x12;
    for (int j = 0; j < 4; j++) {
      const u64 *v = pts + i * 16 + j * 4;
      int nbytes = fe_enc_nbytes(v);
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
  *outlen = off[n];
}

// rows: [n, 16] u64 with canonical x (cols 0..3) and y (cols 4..7) set;
// fills z = 1 (cols 8..11) and t = x*y mod p (cols 12..15).  Lets the TPU
// engine download only two coordinates per folded generator (the tunnel
// download leg is ~28 MB/s) and reconstruct the extended row host-side.
void vmpc_ed_rows_fill_t(u64 *rows, u64 n) {
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < (long long)n; i++) {
    u64 *r = rows + i * 16;
    Fe x, y, t;
    fe_unpack(x, r);
    fe_unpack(y, r + 4);
    fe_mul(t, x, y);
    r[8] = 1;
    r[9] = 0;
    r[10] = 0;
    r[11] = 0;
    fe_pack(r + 12, t);
  }
}

// Batch signed 4-bit recode: [n, 4] u64 canonical residues (< order) ->
// [64, n] int8 signed digits in [-7, 8], MSB-first rows.  Byte-identical
// to ops/msm_pallas._digits_signed_from_u64x4 (same balanced form and
// per-sign carry thresholds).  Returns nonzero on digit-carry overflow
// (cannot happen for canonical residues of a < 2^255 order).
int vmpc_recode_signed4(const u64 *scalars, u64 n, const u64 *order,
                        const u64 *half, signed char *out) {
  int overflow = 0;
#pragma omp parallel for schedule(static) reduction(| : overflow)
  for (long long i = 0; i < (long long)n; i++) {
    const u64 *a = scalars + i * 4;
    int neg = 0;
    for (int j = 3; j >= 0; j--) {
      if (a[j] > half[j]) {
        neg = 1;
        break;
      }
      if (a[j] < half[j]) break;
    }
    u64 bal[4];
    if (neg) {
      u64 borrow = 0;
      for (int j = 0; j < 4; j++) {
        u128 diff = (u128)order[j] - a[j] - borrow;
        bal[j] = (u64)diff;
        borrow = (u64)((diff >> 64) & 1);
      }
    } else {
      memcpy(bal, a, 32);
    }
    int d[64];
    for (int w = 0; w < 64; w++)
      d[w] = (int)((bal[w >> 4] >> ((w & 15) * 4)) & 0xF);
    const int thresh = neg ? 8 : 9;
    int carry = 0;
    for (int w = 0; w < 64; w++) {
      int v = d[w] + carry;
      carry = v >= thresh;
      d[w] = v - 16 * carry;
    }
    overflow |= carry;
    if (neg)
      for (int w = 0; w < 64; w++) d[w] = -d[w];
    for (int w = 0; w < 64; w++)
      out[(u64)(63 - w) * n + (u64)i] = (signed char)d[w];
  }
  return overflow;
}

// Recode + offset-7 nibble pack in one pass: out is [32, n] u8, row j
// packing MSB-first digit rows (2j, 2j+1) as lo | hi<<4 — byte-identical
// to ops/msm_pallas._pack_digits over the [64, n] recode.  Returns the
// max windows_needed over all scalars (64 - first nonzero MSB row; >= 1),
// or -1 on digit-carry overflow.  Trimming to 8 windows is a row slice
// (out[28:]) on the caller.
long long vmpc_recode_signed4_packed(const u64 *scalars, u64 n,
                                     const u64 *order, const u64 *half,
                                     unsigned char *out) {
  int overflow = 0;
  long long wneed = 1;
#pragma omp parallel for schedule(static) reduction(| : overflow) \
    reduction(max : wneed)
  for (long long i = 0; i < (long long)n; i++) {
    const u64 *a = scalars + i * 4;
    int neg = 0;
    for (int j = 3; j >= 0; j--) {
      if (a[j] > half[j]) {
        neg = 1;
        break;
      }
      if (a[j] < half[j]) break;
    }
    u64 bal[4];
    if (neg) {
      u64 borrow = 0;
      for (int j = 0; j < 4; j++) {
        u128 diff = (u128)order[j] - a[j] - borrow;
        bal[j] = (u64)diff;
        borrow = (u64)((diff >> 64) & 1);
      }
    } else {
      memcpy(bal, a, 32);
    }
    int d[64];
    for (int w = 0; w < 64; w++)
      d[w] = (int)((bal[w >> 4] >> ((w & 15) * 4)) & 0xF);
    const int thresh = neg ? 8 : 9;
    int carry = 0;
    for (int w = 0; w < 64; w++) {
      int v = d[w] + carry;
      carry = v >= thresh;
      d[w] = v - 16 * carry;
    }
    overflow |= carry;
    if (neg)
      for (int w = 0; w < 64; w++) d[w] = -d[w];
    long long top = 0;  // highest little-endian window with a nonzero digit
    for (int w = 63; w >= 0; w--) {
      if (d[w]) {
        top = w + 1;
        break;
      }
    }
    if (top > wneed) wneed = top;
    // MSB-first row of little-endian window w is (63 - w); packed row j
    // holds rows (2j, 2j+1) -> windows (63-2j, 62-2j)
    for (int j = 0; j < 32; j++) {
      unsigned lo = (unsigned)(d[63 - 2 * j] + 7);
      unsigned hi = (unsigned)(d[62 - 2 * j] + 7);
      out[(u64)j * n + (u64)i] = (unsigned char)(lo | (hi << 4));
    }
  }
  return overflow ? -1 : wneed;
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
