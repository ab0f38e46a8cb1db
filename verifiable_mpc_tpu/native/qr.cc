// 1024-bit Montgomery arithmetic + Pippenger multiexp for the QR group
// (quadratic residues mod a safe prime, reference sec_groups QuadraticResidue
// flavor).  The reference computes every commitment / fold / setup step with
// Python pow() — ~1.5 ms per 1023-bit exponentiation; the AC20 QR-1024
// config (reference demos/demo_zkp_ac20.py:51) spends minutes in those loops
// at 2^12+.  Pippenger turns an n-term multi-exponentiation into ~n + 2^w
// Montgomery multiplications per window (~100 ns each here).
//
// Group ops are modular MULTIPLICATIONS (abelian, written multiplicatively):
// bucket accumulation, window combination and the final chain are all
// mont_mul calls.  Fixed 16x64-bit limbs (moduli up to 1024 bits).

#include <cstdint>
#include <cstring>
#include <vector>

typedef uint64_t u64;
typedef unsigned __int128 u128;

namespace qrc {

static const int NL = 16;  // 16 x 64 = 1024-bit

struct Ctx {
  u64 p[NL];
  u64 n0;       // -p^-1 mod 2^64
  u64 r2[NL];   // 2^2048 mod p
  u64 one[NL];  // 2^1024 mod p (Montgomery 1)
};

static int cmp_p(const u64 *a, const u64 *p) {
  for (int i = NL - 1; i >= 0; i--) {
    if (a[i] > p[i]) return 1;
    if (a[i] < p[i]) return -1;
  }
  return 0;
}

static void sub_p(u64 *a, const u64 *p) {
  u128 borrow = 0;
  for (int i = 0; i < NL; i++) {
    u128 d = (u128)a[i] - p[i] - (u64)borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

// a = 2a mod p (a < p)
static void dbl_mod(u64 *a, const u64 *p) {
  u64 carry = 0;
  for (int i = 0; i < NL; i++) {
    u64 v = a[i];
    a[i] = (v << 1) | carry;
    carry = v >> 63;
  }
  if (carry || cmp_p(a, p) >= 0) sub_p(a, p);
}

static void ctx_init(Ctx &c, const u64 *p) {
  memcpy(c.p, p, sizeof(c.p));
  u64 inv = p[0];  // p odd
  for (int i = 0; i < 6; i++) inv *= 2 - p[0] * inv;  // Newton mod 2^64
  c.n0 = ~inv + 1;
  // one = 2^1024 mod p, r2 = 2^2048 mod p by doubling
  u64 t[NL];
  memset(t, 0, sizeof(t));
  t[0] = 1;
  for (int i = 0; i < 1024; i++) dbl_mod(t, p);
  memcpy(c.one, t, sizeof(t));
  for (int i = 0; i < 1024; i++) dbl_mod(t, p);
  memcpy(c.r2, t, sizeof(t));
}

// CIOS Montgomery multiply: out = a*b*2^-1024 mod p
static void mmul(const Ctx &c, const u64 *a, const u64 *b, u64 *out) {
  u64 t[NL + 2];
  memset(t, 0, sizeof(t));
  for (int i = 0; i < NL; i++) {
    u128 carry = 0;
    u64 ai = a[i];
    for (int j = 0; j < NL; j++) {
      u128 cur = (u128)t[j] + (u128)ai * b[j] + (u64)carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[NL] + (u64)carry;
    t[NL] = (u64)cur;
    t[NL + 1] = (u64)(cur >> 64);

    u64 m = t[0] * c.n0;
    carry = 0;
    u128 first = (u128)t[0] + (u128)m * c.p[0];
    carry = first >> 64;
    for (int j = 1; j < NL; j++) {
      u128 cur2 = (u128)t[j] + (u128)m * c.p[j] + (u64)carry;
      t[j - 1] = (u64)cur2;
      carry = cur2 >> 64;
    }
    u128 cur3 = (u128)t[NL] + (u64)carry;
    t[NL - 1] = (u64)cur3;
    t[NL] = t[NL + 1] + (u64)(cur3 >> 64);
    t[NL + 1] = 0;
  }
  if (t[NL] || cmp_p(t, c.p) >= 0) sub_p(t, c.p);
  memcpy(out, t, NL * 8);
}

static void msq(const Ctx &c, u64 *a) { mmul(c, a, a, a); }

static inline int exp_digit(const u64 *e, int bit, int w) {
  // little-endian bit window [bit, bit+w)
  int limb = bit >> 6, off = bit & 63;
  u64 v = e[limb] >> off;
  if (off + w > 64 && limb + 1 < NL) v |= e[limb + 1] << (64 - off);
  return (int)(v & ((1u << w) - 1));
}

}  // namespace qrc

extern "C" {

// out = prod bases[i] ^ exps[i] mod p.  bases: [n, 16] canonical residues,
// exps: [n, 16] canonical (< group order < 2^1023).
void vmpc_qr_multiexp(const u64 *p, const u64 *bases, const u64 *exps, u64 n,
                      u64 *out) {
  using namespace qrc;
  Ctx c;
  ctx_init(c, p);
  int w = n >= 65536 ? 14 : n >= 8192 ? 12 : n >= 512 ? 9 : 6;
  int nwin = (1023 + w - 1) / w;
  int nbuckets = (1 << w) - 1;

  std::vector<u64> bm((size_t)n * NL);
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < (long long)n; i++)
    mmul(c, bases + i * NL, c.r2, bm.data() + i * NL);

  std::vector<u64> winsum((size_t)nwin * NL);
  std::vector<unsigned char> winused(nwin, 0);
#pragma omp parallel
  {
    std::vector<u64> buckets((size_t)nbuckets * NL);
    std::vector<unsigned char> used(nbuckets);
#pragma omp for schedule(dynamic, 1)
    for (int win = 0; win < nwin; win++) {
      memset(used.data(), 0, used.size());
      for (u64 i = 0; i < n; i++) {
        int d = exp_digit(exps + i * NL, win * w, w);
        if (!d) continue;
        u64 *bk = buckets.data() + (size_t)(d - 1) * NL;
        if (!used[d - 1]) {
          memcpy(bk, bm.data() + i * NL, NL * 8);
          used[d - 1] = 1;
        } else {
          mmul(c, bk, bm.data() + i * NL, bk);
        }
      }
      // sum_d d * B_d via running suffix products
      u64 run[NL], acc[NL];
      int run_set = 0, acc_set = 0;
      for (int d = nbuckets - 1; d >= 0; d--) {
        if (used[d]) {
          if (!run_set) {
            memcpy(run, buckets.data() + (size_t)d * NL, NL * 8);
            run_set = 1;
          } else {
            mmul(c, run, buckets.data() + (size_t)d * NL, run);
          }
        }
        if (run_set) {
          if (!acc_set) {
            memcpy(acc, run, NL * 8);
            acc_set = 1;
          } else {
            mmul(c, acc, run, acc);
          }
        }
      }
      if (acc_set) {
        memcpy(winsum.data() + (size_t)win * NL, acc, NL * 8);
        winused[win] = 1;
      }
    }
  }

  u64 res[NL];
  memcpy(res, c.one, sizeof(res));
  for (int win = nwin - 1; win >= 0; win--) {
    for (int s = 0; s < w; s++) msq(c, res);
    if (winused[win]) mmul(c, res, winsum.data() + (size_t)win * NL, res);
  }
  u64 onev[NL];
  memset(onev, 0, sizeof(onev));
  onev[0] = 1;
  mmul(c, res, onev, out);  // from Montgomery
}

// out[i] = base ^ exps[i] mod p (fixed-base 4-bit comb; generator setup).
void vmpc_qr_batch_exp(const u64 *p, const u64 *base, const u64 *exps, u64 n,
                       u64 *out) {
  using namespace qrc;
  Ctx c;
  ctx_init(c, p);
  const int W = 4, NWIN = 256;  // 1024 bits / 4
  std::vector<u64> table((size_t)NWIN * 15 * NL);
  u64 bw[NL];
  mmul(c, base, c.r2, bw);  // base in Montgomery form
  for (int win = 0; win < NWIN; win++) {
    u64 *row = table.data() + (size_t)win * 15 * NL;
    memcpy(row, bw, NL * 8);  // d = 1
    for (int d = 2; d <= 15; d++)
      mmul(c, row + (size_t)(d - 2) * NL, bw, row + (size_t)(d - 1) * NL);
    // bw = bw^16
    u64 *e8 = row + (size_t)14 * NL;  // bw^15
    mmul(c, e8, bw, bw);              // bw^16
  }
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < (long long)n; i++) {
    u64 acc[NL];
    memcpy(acc, c.one, sizeof(acc));
    const u64 *e = exps + i * NL;
    for (int win = 0; win < NWIN; win++) {
      int d = exp_digit(e, win * W, W);
      if (d)
        mmul(c, acc, table.data() + ((size_t)win * 15 + d - 1) * NL, acc);
    }
    u64 onev[NL];
    memset(onev, 0, sizeof(onev));
    onev[0] = 1;
    mmul(c, acc, onev, out + i * NL);
  }
}

// out[i] = gl[i]^cc * gr[i] mod p (protocol-4 generator fold).
void vmpc_qr_fold(const u64 *p, const u64 *gl, const u64 *gr, const u64 *cc,
                  u64 n, u64 *out) {
  using namespace qrc;
  Ctx c;
  ctx_init(c, p);
  int topbit = 1022;
  while (topbit > 0 && !((cc[topbit >> 6] >> (topbit & 63)) & 1)) topbit--;
  int nwin = topbit / 4 + 1;  // 4-bit windows, LSB window 0
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < (long long)n; i++) {
    u64 base[NL], tbl[15][NL], acc[NL];
    mmul(c, gl + i * NL, c.r2, base);
    memcpy(tbl[0], base, NL * 8);
    for (int d = 2; d <= 15; d++) mmul(c, tbl[d - 2], base, tbl[d - 1]);
    memcpy(acc, c.one, sizeof(acc));
    for (int win = nwin - 1; win >= 0; win--) {
      for (int s = 0; s < 4; s++) msq(c, acc);
      int d = exp_digit(cc, win * 4, 4);
      if (d) mmul(c, acc, tbl[d - 1], acc);
    }
    // times gr (canonical): acc is Montgomery, gr plain -> mmul gives
    // (acc * R^-1) * gr ... convert acc first, then one plain modmul via
    // Montgomery with gr in Montgomery form
    u64 grm[NL];
    mmul(c, gr + i * NL, c.r2, grm);
    mmul(c, acc, grm, acc);  // still Montgomery
    u64 onev[NL];
    memset(onev, 0, sizeof(onev));
    onev[0] = 1;
    mmul(c, acc, onev, out + i * NL);
  }
}

}  // extern "C"
