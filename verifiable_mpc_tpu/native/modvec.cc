// Vector modular arithmetic over a runtime <=256-bit modulus (Barrett).
//
// The reference evaluates linear forms and folds witness vectors with
// per-element Python bigint loops (/root/reference/verifiable_mpc/ac20/
// pivot.py:89-96, compressed_pivot.py:70-84).  This tier provides the
// speed-of-light host path for those O(n)-scalar protocol steps: dot
// products, axpy folds, scalar scaling and the nullity weighted combine,
// all over 4x64-bit little-endian limbs with a modulus in [2^192, 2^256).
//
// Layout: values n*4 u64; context = p[4] | mu[6] | r512[4] where
// mu = floor(2^512 / p) and r512 = 2^512 mod p (precomputed host-side).

#include <cstring>
#include <vector>

typedef unsigned long long u64;
typedef __uint128_t u128;

namespace {

// a*b -> 8 limbs (schoolbook 4x4)
static inline void mul_4x4(const u64 *a, const u64 *b, u64 *o) {
  u64 r[8] = {0};
  for (int i = 0; i < 4; i++) {
    u64 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 t = (u128)a[i] * b[j] + r[i + j] + carry;
      r[i + j] = (u64)t;
      carry = (u64)(t >> 64);
    }
    r[i + 4] = carry;
  }
  std::memcpy(o, r, sizeof(r));
}

// o += a over `n` limbs; returns carry-out
static inline u64 add_n(u64 *o, const u64 *a, int n) {
  u64 carry = 0;
  for (int i = 0; i < n; i++) {
    u128 t = (u128)o[i] + a[i] + carry;
    o[i] = (u64)t;
    carry = (u64)(t >> 64);
  }
  return carry;
}

// o = a - b over n limbs; returns borrow-out
static inline u64 sub_n(u64 *o, const u64 *a, const u64 *b, int n) {
  u64 borrow = 0;
  for (int i = 0; i < n; i++) {
    u128 t = (u128)a[i] - b[i] - borrow;
    o[i] = (u64)t;
    borrow = (u64)(t >> 64) & 1;  // high half is 0 or all-ones
  }
  return borrow;
}

static inline int cmp_n(const u64 *a, const u64 *b, int n) {
  for (int i = n - 1; i >= 0; i--) {
    if (a[i] != b[i]) return a[i] < b[i] ? -1 : 1;
  }
  return 0;
}

// Barrett reduction (HAC 14.42, b=2^64, k=4): x (8 limbs, < 2^512) mod p.
static void barrett(const u64 *ctx, const u64 *x, u64 *out) {
  const u64 *p = ctx;
  const u64 *mu = ctx + 4;
  // q1 = x >> 64*(k-1) -> limbs 3..7 (5 limbs)
  const u64 *q1 = x + 3;
  // q2 = q1 * mu (5 x 6 -> up to 11 limbs)
  u64 q2[11] = {0};
  for (int i = 0; i < 5; i++) {
    u64 carry = 0;
    for (int j = 0; j < 6; j++) {
      u128 t = (u128)q1[i] * mu[j] + q2[i + j] + carry;
      q2[i + j] = (u64)t;
      carry = (u64)(t >> 64);
    }
    q2[i + 6] = carry;
  }
  // q3 = q2 >> 64*(k+1) -> limbs 5..10 (6 limbs)
  const u64 *q3 = q2 + 5;
  // r1 = x mod b^(k+1) (5 limbs)
  u64 r1[5];
  std::memcpy(r1, x, 5 * sizeof(u64));
  // r2 = (q3 * p) mod b^(k+1) (low 5 limbs of 6x4 product)
  u64 r2[5] = {0};
  for (int i = 0; i < 5; i++) {
    u64 carry = 0;
    for (int j = 0; j < 4 && i + j < 5; j++) {
      u128 t = (u128)q3[i] * p[j] + r2[i + j] + carry;
      r2[i + j] = (u64)t;
      carry = (u64)(t >> 64);
    }
    if (i + 4 < 5) r2[i + 4] += carry;
  }
  // r = r1 - r2 mod b^(k+1)
  u64 r[5];
  if (sub_n(r, r1, r2, 5)) {
    // add b^(k+1): nothing to do beyond the implicit wraparound of sub_n
    // (two's-complement wrap over 5 limbs IS the mod-b^(k+1) result)
  }
  // at most two conditional subtracts of p
  u64 pe[5] = {p[0], p[1], p[2], p[3], 0};
  for (int it = 0; it < 4; it++) {
    if (cmp_n(r, pe, 5) < 0) break;
    sub_n(r, r, pe, 5);
  }
  std::memcpy(out, r, 4 * sizeof(u64));
}

// (a*b) mod p, a,b < p
static inline void mulmod(const u64 *ctx, const u64 *a, const u64 *b,
                          u64 *out) {
  u64 prod[8];
  mul_4x4(a, b, prod);
  barrett(ctx, prod, out);
}

// (a+b) mod p, a,b < p
static inline void addmod(const u64 *ctx, const u64 *a, const u64 *b,
                          u64 *out) {
  u64 t[4];
  u64 carry = 0;
  for (int i = 0; i < 4; i++) {
    u128 s = (u128)a[i] + b[i] + carry;
    t[i] = (u64)s;
    carry = (u64)(s >> 64);
  }
  if (carry || cmp_n(t, ctx, 4) >= 0) sub_n(t, t, ctx, 4);
  std::memcpy(out, t, 4 * sizeof(u64));
}

// 8-limb accumulator with wrap counter: acc += prod8, wraps counted in c.
struct Acc512 {
  u64 acc[8];
  u64 wraps;
  void init() {
    std::memset(acc, 0, sizeof(acc));
    wraps = 0;
  }
  inline void add(const u64 *prod8) { wraps += add_n(acc, prod8, 8); }
  // fold into 4-limb residue: Barrett(acc) + wraps * (2^512 mod p)
  void reduce(const u64 *ctx, u64 *out) const {
    u64 base[4];
    barrett(ctx, acc, base);
    if (wraps) {
      const u64 *r512 = ctx + 10;
      u64 w4[4] = {wraps, 0, 0, 0};
      u64 prod[8];
      mul_4x4(w4, r512, prod);
      u64 wred[4];
      barrett(ctx, prod, wred);
      addmod(ctx, base, wred, out);
    } else {
      std::memcpy(out, base, 4 * sizeof(u64));
    }
  }
  void merge(const Acc512 &o) {
    wraps += o.wraps + add_n(acc, o.acc, 8);
  }
};

// modular inverse via Fermat: a^(p-2) mod p (p prime), a != 0
static void invmod(const u64 *ctx, const u64 *a, u64 *out) {
  u64 e[4];  // p - 2
  u64 two[4] = {2, 0, 0, 0};
  sub_n(e, ctx, two, 4);
  u64 acc[4] = {1, 0, 0, 0};
  for (int i = 255; i >= 0; i--) {
    mulmod(ctx, acc, acc, acc);
    if ((e[i / 64] >> (i % 64)) & 1) mulmod(ctx, acc, a, acc);
  }
  std::memcpy(out, acc, 4 * sizeof(u64));
}

// small signed integer -> canonical mod-p limbs (|v| < p)
static void smallmod(const u64 *ctx, long long v, u64 *out) {
  if (v >= 0) {
    out[0] = (u64)v;
    out[1] = out[2] = out[3] = 0;
  } else {
    u64 a[4] = {(u64)(-v), 0, 0, 0};
    sub_n(out, ctx, a, 4);
  }
}

// batch inverse (Montgomery's trick): out[i] = 1/xs[i], xs canonical != 0
static void batch_inverse(const u64 *ctx, const u64 *xs, u64 n, u64 *out) {
  u64 *prefix = new u64[(n + 1) * 4];
  prefix[0] = 1;
  prefix[1] = prefix[2] = prefix[3] = 0;
  for (u64 i = 0; i < n; i++)
    mulmod(ctx, prefix + i * 4, xs + i * 4, prefix + (i + 1) * 4);
  u64 inv_all[4];
  invmod(ctx, prefix + n * 4, inv_all);
  for (u64 i = n; i-- > 0;) {
    mulmod(ctx, prefix + i * 4, inv_all, out + i * 4);
    mulmod(ctx, inv_all, xs + i * 4, inv_all);
  }
  delete[] prefix;
}

}  // namespace

// exact integer polynomial product over 9x64-bit rows (ntt.cc)
extern "C" void vmpc_ntt_poly_mul(const u64 *a, u64 na, const u64 *b, u64 nb,
                                  u64 *out);

namespace {

// mod-p polynomial product via the exact 9-prime CRT NTT: canonical 4-limb
// inputs ride as zero-extended 9-limb rows; each exact output coefficient
// (< n * p^2 < 2^525 for n <= 2^20) reduces as barrett(low 8 limbs) +
// limb8 * (2^512 mod p).
static void poly_mul_mod(const u64 *ctx, const u64 *a, u64 na, const u64 *b,
                         u64 nb, u64 *out /* (na+nb-1)*4 */) {
  u64 *a9 = new u64[na * 9]();
  u64 *b9 = new u64[nb * 9]();
  for (u64 i = 0; i < na; i++) std::memcpy(a9 + i * 9, a + i * 4, 32);
  for (u64 i = 0; i < nb; i++) std::memcpy(b9 + i * 9, b + i * 4, 32);
  u64 no = na + nb - 1;
  u64 *o9 = new u64[no * 9];
  vmpc_ntt_poly_mul(a9, na, b9, nb, o9);
  const u64 *r512 = ctx + 10;
  for (u64 i = 0; i < no; i++) {
    const u64 *row = o9 + i * 9;
    u64 lo[4];
    barrett(ctx, row, lo);
    if (row[8]) {
      u64 h4[4] = {row[8], 0, 0, 0};
      u64 prod[8], hr[4];
      mul_4x4(h4, r512, prod);
      barrett(ctx, prod, hr);
      addmod(ctx, lo, hr, lo);
    }
    std::memcpy(out + i * 4, lo, 32);
  }
  delete[] a9;
  delete[] b9;
  delete[] o9;
}

}  // namespace

extern "C" {

// out[0..3] = sum_i a[i]*b[i] mod p
void vmpc_modvec_dot(const u64 *ctx, const u64 *a, const u64 *b, u64 n,
                     u64 *out) {
  Acc512 acc;
  acc.init();
#pragma omp parallel if (n >= 4096)
  {
    Acc512 local;
    local.init();
    u64 prod[8];
#pragma omp for nowait
    for (long long i = 0; i < (long long)n; i++) {
      mul_4x4(a + 4 * i, b + 4 * i, prod);
      local.add(prod);
    }
#pragma omp critical
    acc.merge(local);
  }
  acc.reduce(ctx, out);
}

// out[i] = (c*x[i] + y[i]) mod p
void vmpc_modvec_axpy(const u64 *ctx, const u64 *c, const u64 *x,
                      const u64 *y, u64 n, u64 *out) {
#pragma omp parallel for if (n >= 2048)
  for (long long i = 0; i < (long long)n; i++) {
    u64 t[4];
    mulmod(ctx, c, x + 4 * i, t);
    addmod(ctx, t, y + 4 * i, out + 4 * i);
  }
}

// out[i] = c*x[i] mod p
void vmpc_modvec_scale(const u64 *ctx, const u64 *c, const u64 *x, u64 n,
                       u64 *out) {
#pragma omp parallel for if (n >= 2048)
  for (long long i = 0; i < (long long)n; i++) {
    mulmod(ctx, c, x + 4 * i, out + 4 * i);
  }
}

// Sequential multiplication-triples pass (reference circuit_builder.py:
// 133-151).  vals = [inputs || gamma] as reduced 4-limb rows; for mul
// gate i, with CSR entries e in [lptr[i], lptr[i+1]) (left) and
// [rptr[i], rptr[i+1]) (right):
//   alpha_i = lconst_i + sum_e lcoef[e] * vals[lidx[e]]
//   beta_i  = rconst_i + sum_e rcoef[e] * vals[ridx[e]]
//   gamma_i = alpha_i * beta_i;   vals[n_in + i] = gamma_i
// Inherently sequential: forms reference earlier gates' gamma values.
void vmpc_modvec_mul_triples(const u64 *ctx, u64 n_in, u64 m,
                             const u64 *lptr, const u64 *lidx,
                             const u64 *lcoef, const u64 *lconst,
                             const u64 *rptr, const u64 *ridx,
                             const u64 *rcoef, const u64 *rconst,
                             u64 *vals, u64 *alpha, u64 *beta) {
  (void)n_in;
  for (u64 i = 0; i < m; i++) {
    for (int side = 0; side < 2; side++) {
      const u64 *ptr = side ? rptr : lptr;
      const u64 *idx = side ? ridx : lidx;
      const u64 *coef = side ? rcoef : lcoef;
      const u64 *cst = side ? rconst : lconst;
      u64 *o = (side ? beta : alpha) + 4 * i;
      Acc512 acc;
      acc.init();
      u64 prod[8];
      for (u64 e = ptr[i]; e < ptr[i + 1]; e++) {
        mul_4x4(coef + 4 * e, vals + 4 * idx[e], prod);
        acc.add(prod);
      }
      u64 s[4];
      acc.reduce(ctx, s);
      addmod(ctx, s, cst + 4 * i, o);
    }
    mulmod(ctx, alpha + 4 * i, beta + 4 * i, vals + 4 * (n_in + i));
  }
}

// Lagrange basis row over CONSECUTIVE integer nodes a..a+n-1 at point c:
//   out[i] = prefix[i] * suffix[i+1] * (-1)^(n-1-i) / (i! * (n-1-i)!)
// with prefix/suffix products of d_j = (c - a - j) mod p and every
// factorial inverse derived from ONE modular inversion — the exact
// algorithm (and therefore the exact reduced integers) of
// ac20/recombine._lagrange_row_consecutive, whose Python big-int loops
// cost ~0.5 s per protocol-8 challenge at 2^16 gates.
void vmpc_lagrange_consecutive(const u64 *ctx, u64 a, u64 n, const u64 *c4,
                               u64 *out) {
  std::vector<u64> diffs(4 * n), prefix(4 * (n + 1)), suffix(4 * (n + 1));
  std::vector<u64> fact(4 * n), inv_fact(4 * n);
  const u64 *p = ctx;  // ctx rows start with the modulus (see _modvec_ctx)
  u64 node[4];
  for (u64 i = 0; i < n; i++) {
    smallmod(ctx, (long long)(a + i), node);
    u64 *d = diffs.data() + 4 * i;
    if (cmp_n(c4, node, 4) >= 0) {
      sub_n(d, c4, node, 4);
    } else {
      u64 t[4];
      sub_n(t, p, node, 4);  // p - node
      for (int k = 0; k < 4; k++) d[k] = t[k];
      addmod(ctx, d, c4, d);
    }
  }
  prefix[0] = 1; prefix[1] = prefix[2] = prefix[3] = 0;
  for (u64 i = 0; i < n; i++)
    mulmod(ctx, prefix.data() + 4 * i, diffs.data() + 4 * i,
           prefix.data() + 4 * (i + 1));
  suffix[4 * n] = 1; suffix[4 * n + 1] = suffix[4 * n + 2] = suffix[4 * n + 3] = 0;
  for (long long i = (long long)n - 1; i >= 0; i--)
    mulmod(ctx, suffix.data() + 4 * (i + 1), diffs.data() + 4 * i,
           suffix.data() + 4 * i);
  fact[0] = 1; fact[1] = fact[2] = fact[3] = 0;
  u64 iv[4];
  for (u64 i = 1; i < n; i++) {
    smallmod(ctx, (long long)i, iv);
    mulmod(ctx, fact.data() + 4 * (i - 1), iv, fact.data() + 4 * i);
  }
  invmod(ctx, fact.data() + 4 * (n - 1), inv_fact.data() + 4 * (n - 1));
  for (u64 i = n - 1; i >= 1; i--) {
    smallmod(ctx, (long long)i, iv);
    mulmod(ctx, inv_fact.data() + 4 * i, iv, inv_fact.data() + 4 * (i - 1));
  }
#pragma omp parallel for if (n >= 4096)
  for (long long i = 0; i < (long long)n; i++) {
    u64 num[4], invd[4], o[4];
    mulmod(ctx, prefix.data() + 4 * i, suffix.data() + 4 * (i + 1), num);
    mulmod(ctx, inv_fact.data() + 4 * i, inv_fact.data() + 4 * (n - 1 - i),
           invd);
    if ((n - 1 - i) % 2 == 1) {
      // negate: p - invd (invd != 0: factorials are units)
      u64 t[4];
      sub_n(t, p, invd, 4);
      for (int k = 0; k < 4; k++) invd[k] = t[k];
    }
    mulmod(ctx, num, invd, o);
    for (int k = 0; k < 4; k++) out[4 * i + k] = o[k];
  }
}

// Sparse CSR matvec: out[i] = sum_e coef[e] * vec[idx[e]] mod p for the
// entries of row i (the per-column QAP basis evaluations v_i(s) etc.,
// trinocchio/qap_fast.vwy_at).
void vmpc_modvec_csr_dot(const u64 *ctx, u64 nrows, const u64 *ptr,
                         const u64 *idx, const u64 *coef, const u64 *vec,
                         u64 *out) {
#pragma omp parallel for schedule(static) if (nrows >= 1024)
  for (long long i = 0; i < (long long)nrows; i++) {
    Acc512 acc;
    acc.init();
    u64 prod[8];
    for (u64 e = ptr[i]; e < ptr[i + 1]; e++) {
      mul_4x4(coef + 4 * e, vec + 4 * idx[e], prod);
      acc.add(prod);
    }
    acc.reduce(ctx, out + 4 * i);
  }
}

// out[i] = base^0..base^(count-1) * start  (geometric scalar chain mod p)
void vmpc_modvec_powers(const u64 *ctx, const u64 *base, u64 count,
                        u64 *out) {
  if (count == 0) return;
  out[0] = 1;
  out[1] = out[2] = out[3] = 0;
  for (u64 i = 1; i < count; i++)
    mulmod(ctx, out + 4 * (i - 1), base, out + 4 * i);
}

// out[j] = sum_i w[i] * rows[i*n + j] mod p   (s rows of length n)
void vmpc_modvec_weighted_sum(const u64 *ctx, const u64 *w, const u64 *rows,
                              u64 s, u64 n, u64 *out) {
#pragma omp parallel for if (n >= 512)
  for (long long j = 0; j < (long long)n; j++) {
    Acc512 acc;
    acc.init();
    u64 prod[8];
    for (u64 i = 0; i < s; i++) {
      mul_4x4(w + 4 * i, rows + 4 * (i * n + j), prod);
      acc.add(prod);
    }
    acc.reduce(ctx, out + 4 * j);
  }
}

// serialization bytes for n reduced field elements hashed as SIGNED ints
// (the canonical transcript encoding: v > p/2 encodes as v - p).  Per
// element: 0x01 (T_INT), 4-byte big-endian length, minimal signed
// big-endian two's-complement bytes.  out >= n * 38; *outlen written.
void vmpc_modvec_hash_encode_signed(const u64 *ctx, const u64 *vals, u64 n,
                                    unsigned char *out, u64 *outlen) {
  const u64 *p = ctx;
  // half = p // 2
  u64 half[4];
  for (int i = 3; i >= 0; i--) half[i] = (p[i] >> 1) | (i < 3 ? (p[i + 1] << 63) : 0);
  unsigned char *w = out;
  for (u64 i = 0; i < n; i++) {
    const u64 *v = vals + i * 4;
    u64 mag[4];
    bool neg = cmp_n(v, half, 4) > 0;  // v > p/2  ->  encode v - p (negative)
    if (neg) {
      sub_n(mag, p, v, 4);  // magnitude = p - v
    } else {
      std::memcpy(mag, v, 32);
    }
    int bitlen = 0;
    for (int k = 3; k >= 0; k--) {
      if (mag[k]) {
        bitlen = 64 * k + 64 - __builtin_clzll(mag[k]);
        break;
      }
    }
    int nbytes = bitlen / 8 + 1;
    *w++ = 0x01;
    w[0] = 0;
    w[1] = 0;
    w[2] = (unsigned char)(nbytes >> 8);
    w[3] = (unsigned char)(nbytes & 0xff);
    w += 4;
    if (neg) {
      // two's complement of mag over nbytes bytes
      u64 tc[5] = {~mag[0], ~mag[1], ~mag[2], ~mag[3], ~0ULL};
      u64 carry = 1;
      for (int k = 0; k < 5 && carry; k++) {
        tc[k] += carry;
        carry = tc[k] == 0 ? 1 : 0;
      }
      for (int b = nbytes - 1; b >= 0; b--) {
        *w++ = (unsigned char)(tc[b >> 3] >> ((b & 7) * 8));
      }
    } else {
      for (int b = nbytes - 1; b >= 0; b--) {
        *w++ = (unsigned char)(mag[b >> 3] >> ((b & 7) * 8));
      }
    }
  }
  *outlen = (u64)(w - out);
}

// out[i] = (a[i]*b[i]) mod p  (Hadamard; h = f*g pointwise products)
void vmpc_modvec_hadamard(const u64 *ctx, const u64 *a, const u64 *b, u64 n,
                          u64 *out) {
#pragma omp parallel for if (n >= 2048)
  for (long long i = 0; i < (long long)n; i++) {
    mulmod(ctx, a + 4 * i, b + 4 * i, out + 4 * i);
  }
}

// [f(s + base + i) for i < count] from consecutive samples vals =
// [f(base), ..., f(base + d)] of a degree-<=d polynomial — the closed-form
// Lagrange-at-consecutive-nodes convolution of tools/fastpoly.py
// shift_evaluations, with every per-element pass (factorials, batch
// inverses, the delta/G vectors, the W ladder) in C and the convolution on
// the 9-prime CRT NTT.  `s` is the integer target offset (may be negative);
// the caller guarantees s+i-k != 0 for all windows (targets distinct from
// base points).
void vmpc_shift_evaluations(const u64 *ctx, const u64 *vals, u64 n,
                            long long s, u64 count, u64 *out) {
  const u64 d = n - 1;
  // inv_fact[k]: factorial prefix, one inversion, backward unwind
  u64 *fact = new u64[n * 4];
  fact[0] = 1;
  fact[1] = fact[2] = fact[3] = 0;
  for (u64 k = 1; k <= d; k++) {
    u64 k4[4];
    smallmod(ctx, (long long)k, k4);
    mulmod(ctx, fact + (k - 1) * 4, k4, fact + k * 4);
  }
  u64 *inv_fact = new u64[n * 4];
  invmod(ctx, fact + d * 4, inv_fact + d * 4);
  for (u64 k = d; k > 0; k--) {
    u64 k4[4];
    smallmod(ctx, (long long)k, k4);
    mulmod(ctx, inv_fact + k * 4, k4, inv_fact + (k - 1) * 4);
  }
  // delta[k] = (-1)^(d-k) vals[k] / (k! (d-k)!)
  u64 *delta = new u64[n * 4];
  for (u64 k = 0; k <= d; k++) {
    u64 t[4];
    mulmod(ctx, vals + k * 4, inv_fact + k * 4, t);
    mulmod(ctx, t, inv_fact + (d - k) * 4, t);
    if ((d - k) & 1) {
      u64 neg[4];
      if (t[0] | t[1] | t[2] | t[3]) {
        sub_n(neg, ctx, t, 4);
      } else {
        neg[0] = neg[1] = neg[2] = neg[3] = 0;
      }
      std::memcpy(delta + k * 4, neg, 32);
    } else {
      std::memcpy(delta + k * 4, t, 32);
    }
  }
  // G[j] = 1 / (s + j - d), j < d + count
  u64 ng = d + count;
  u64 *gs = new u64[ng * 4];
  for (u64 j = 0; j < ng; j++)
    smallmod(ctx, s + (long long)j - (long long)d, gs + j * 4);
  u64 *G = new u64[ng * 4];
  batch_inverse(ctx, gs, ng, G);
  // conv[i + d] = sum_k delta_k / (s + i - k)
  u64 *conv = new u64[(n + ng - 1) * 4];
  poly_mul_mod(ctx, delta, n, G, ng, conv);
  // W_i = prod_{j<=d} (s + i - j); W_{i+1} = W_i (s+i+1) / (s+i-d)
  u64 *den = new u64[count * 4];
  for (u64 i = 0; i < count; i++)
    smallmod(ctx, s + (long long)i - (long long)d, den + i * 4);
  u64 *den_inv = new u64[count * 4];
  batch_inverse(ctx, den, count, den_inv);
  u64 w[4] = {1, 0, 0, 0};
  for (u64 j = 0; j <= d; j++) {
    u64 t[4];
    smallmod(ctx, s - (long long)j, t);
    mulmod(ctx, w, t, w);
  }
  for (u64 i = 0; i < count; i++) {
    mulmod(ctx, w, conv + (i + d) * 4, out + i * 4);
    u64 t[4];
    smallmod(ctx, s + (long long)i + 1, t);
    mulmod(ctx, w, t, w);
    mulmod(ctx, w, den_inv + i * 4, w);
  }
  delete[] fact;
  delete[] inv_fact;
  delete[] delta;
  delete[] gs;
  delete[] G;
  delete[] conv;
  delete[] den;
  delete[] den_inv;
}

}  // extern "C"
