// Native host tier: exact integer polynomial multiplication via a 9-prime
// CRT NTT (62-bit primes, 2^24 max transform size, OpenMP over primes).
//
// Replaces the pure-Python big-prime NTT for the QAP/h-polynomial pipeline
// (interpolation trees, products, Newton division) — the dominant prover
// cost at 2^14+ gates.  Coefficients cross the C ABI as [n, 9] u64
// little-endian limbs (values < 2^558); products are exact over Z as long
// as every output coefficient is below the CRT modulus (~2^558), which the
// caller guarantees (min(na,nb) * max_a * max_b bound).

#include <cstdint>
#include <cstring>
#include <vector>
#include <map>

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace nttc {

static const int NPRIMES = 9;
static const int NLIMBS = 9;

struct PrimeInfo {
  u64 q;
  u64 g;  // generator of the full multiplicative group's 2-part
};

static const PrimeInfo PRIMES[NPRIMES] = {
    {4611686018326724609ULL, 3ULL},  {4611686018309947393ULL, 5ULL},
    {4611686018058289153ULL, 5ULL},  {4611686017974403073ULL, 3ULL},
    {4611686017773076481ULL, 3ULL},  {4611686017554972673ULL, 5ULL},
    {4611686016867106817ULL, 3ULL},  {4611686016649003009ULL, 17ULL},
    {4611686015709478913ULL, 3ULL},
};

static inline u64 mulmod(u64 a, u64 b, u64 q) { return (u64)((u128)a * b % q); }

// Shoup multiplication: b fixed with precomputed b_shoup = floor(b<<64 / q);
// one u128 high-mul + two u64 muls, no division (q < 2^63, result < q)
static inline u64 mulmod_shoup(u64 a, u64 b, u64 b_shoup, u64 q) {
  u64 hi = (u64)(((u128)a * b_shoup) >> 64);
  u64 r = a * b - hi * q;  // correct mod 2^64, value in [0, 2q)
  return r >= q ? r - q : r;
}

static inline u64 shoup_precompute(u64 b, u64 q) {
  return (u64)(((u128)b << 64) / q);
}

static u64 powmod(u64 a, u64 e, u64 q) {
  u64 r = 1;
  a %= q;
  while (e) {
    if (e & 1) r = mulmod(r, a, q);
    a = mulmod(a, a, q);
    e >>= 1;
  }
  return r;
}

// cached per (prime index, log2 n): forward/inverse twiddles + bitrev
struct Plan {
  std::vector<u64> tw, tw_inv;
  std::vector<u64> tw_s, tw_inv_s;  // Shoup companions
  std::vector<uint32_t> rev;
  u64 n_inv, n_inv_s;
};

static Plan &plan_for(int pi, int logn) {
  static std::map<long, Plan> cache;
  long key = (long)pi * 64 + logn;
  auto it = cache.find(key);
  if (it != cache.end()) return it->second;
  Plan p;
  u64 q = PRIMES[pi].q;
  u64 n = 1ULL << logn;
  // primitive n-th root: g^((q-1)/n)
  u64 w = powmod(PRIMES[pi].g, (q - 1) >> logn, q);
  u64 w_inv = powmod(w, q - 2, q);
  p.tw.resize(n / 2);
  p.tw_inv.resize(n / 2);
  if (n >= 2) {
    p.tw[0] = 1;
    p.tw_inv[0] = 1;
  }
  for (u64 i = 1; i < n / 2; i++) {
    p.tw[i] = mulmod(p.tw[i - 1], w, q);
    p.tw_inv[i] = mulmod(p.tw_inv[i - 1], w_inv, q);
  }
  p.tw_s.resize(n / 2);
  p.tw_inv_s.resize(n / 2);
  for (u64 i = 0; i < n / 2; i++) {
    p.tw_s[i] = shoup_precompute(p.tw[i], q);
    p.tw_inv_s[i] = shoup_precompute(p.tw_inv[i], q);
  }
  p.rev.resize(n);
  for (u64 i = 0; i < n; i++) {
    uint32_t r = 0;
    u64 x = i;
    for (int b = 0; b < logn; b++) {
      r = (r << 1) | (x & 1);
      x >>= 1;
    }
    p.rev[i] = r;
  }
  p.n_inv = powmod(n % q, q - 2, q);
  p.n_inv_s = shoup_precompute(p.n_inv, q);
  return cache.emplace(key, std::move(p)).first->second;
}

static void ntt(u64 *x, u64 n, int logn, int pi, bool inverse) {
  u64 q = PRIMES[pi].q;
  Plan &p = plan_for(pi, logn);
  const u64 *tw = inverse ? p.tw_inv.data() : p.tw.data();
  const u64 *tws = inverse ? p.tw_inv_s.data() : p.tw_s.data();
  // bit-reverse permutation
  for (u64 i = 0; i < n; i++) {
    u64 r = p.rev[i];
    if (i < r) {
      u64 t = x[i];
      x[i] = x[r];
      x[r] = t;
    }
  }
  for (int s = 0; s < logn; s++) {
    u64 half = 1ULL << s;
    u64 step = n >> (s + 1);  // twiddle stride
    for (u64 start = 0; start < n; start += 2 * half) {
      for (u64 k = 0; k < half; k++) {
        u64 u = x[start + k];
        u64 v = mulmod_shoup(x[start + k + half], tw[k * step],
                             tws[k * step], q);
        u64 s1 = u + v;
        if (s1 >= q) s1 -= q;
        u64 s2 = u + q - v;
        if (s2 >= q) s2 -= q;
        x[start + k] = s1;
        x[start + k + half] = s2;
      }
    }
  }
  if (inverse) {
    for (u64 i = 0; i < n; i++)
      x[i] = mulmod_shoup(x[i], p.n_inv, p.n_inv_s, q);
  }
}

// reduce a 9-limb little-endian value mod q: one Shoup mul per NONZERO
// limb (zero-extended 4-limb values skip 5), one division total
static u64 limbs_mod(const u64 *limbs, u64 q, const u64 *pow64,
                     const u64 *pow64_s) {
  u128 acc = 0;
  for (int k = 0; k < NLIMBS; k++) {
    if (limbs[k]) acc += mulmod_shoup(limbs[k], pow64[k], pow64_s[k], q);
  }
  return (u64)(acc % q);
}

}  // namespace nttc

extern "C" {

// a: na x 9 u64, b: nb x 9 u64; out: (na+nb-1) x 9 u64 (exact product)
void vmpc_ntt_poly_mul(const u64 *a, u64 na, const u64 *b, u64 nb, u64 *out) {
  using namespace nttc;
  u64 out_len = na + nb - 1;
  int logn = 0;
  while ((1ULL << logn) < out_len) logn++;
  u64 n = 1ULL << logn;

  // warm the plan cache serially: plan_for's static map is not safe to
  // mutate from concurrent OpenMP threads
  for (int pi = 0; pi < NPRIMES; pi++) plan_for(pi, logn);

  std::vector<std::vector<u64>> results(NPRIMES);

#pragma omp parallel for schedule(dynamic, 1)
  for (int pi = 0; pi < NPRIMES; pi++) {
    u64 q = PRIMES[pi].q;
    u64 pow64[NLIMBS], pow64_s[NLIMBS];
    pow64[0] = 1 % q;
    u64 two64 = ((u128)1 << 64) % q;
    for (int k = 1; k < NLIMBS; k++) pow64[k] = mulmod(pow64[k - 1], two64, q);
    for (int k = 0; k < NLIMBS; k++) pow64_s[k] = shoup_precompute(pow64[k], q);

    std::vector<u64> fa(n, 0), fb(n, 0);
    for (u64 i = 0; i < na; i++)
      fa[i] = limbs_mod(a + i * NLIMBS, q, pow64, pow64_s);
    for (u64 i = 0; i < nb; i++)
      fb[i] = limbs_mod(b + i * NLIMBS, q, pow64, pow64_s);
    ntt(fa.data(), n, logn, pi, false);
    ntt(fb.data(), n, logn, pi, false);
    for (u64 i = 0; i < n; i++) fa[i] = mulmod(fa[i], fb[i], q);
    ntt(fa.data(), n, logn, pi, true);
    fa.resize(out_len);
    results[pi] = std::move(fa);
  }

  // Garner mixed-radix CRT: x = v0 + q0*(v1 + q1*(v2 + ...)), accumulated
  // into 9-limb little-endian integers.
  u64 inv[NPRIMES][NPRIMES];    // inv[j][i] = (q_i)^-1 mod q_j  (i < j)
  u64 inv_s[NPRIMES][NPRIMES];  // Shoup companions
  for (int j = 1; j < NPRIMES; j++)
    for (int i = 0; i < j; i++) {
      inv[j][i] = powmod(PRIMES[i].q % PRIMES[j].q, PRIMES[j].q - 2,
                         PRIMES[j].q);
      inv_s[j][i] = shoup_precompute(inv[j][i], PRIMES[j].q);
    }

#pragma omp parallel for schedule(static)
  for (long long c = 0; c < (long long)out_len; c++) {
    u64 v[NPRIMES];  // mixed-radix digits
    for (int j = 0; j < NPRIMES; j++) {
      u64 qj = PRIMES[j].q;
      u64 x = results[j][c];
      for (int i = 0; i < j; i++) {
        // x = (x - v_i) * inv(q_i) mod q_j; v_i < q_i < 2*q_j, so one
        // conditional subtract canonicalizes it
        u64 vi = v[i] >= qj ? v[i] - qj : v[i];
        u64 d = x >= vi ? x - vi : x + qj - vi;
        x = mulmod_shoup(d, inv[j][i], inv_s[j][i], qj);
      }
      v[j] = x;
    }
    // value = ((v8*q7 + v7)*q6 + ... )*q0 + v0, multiword accumulation
    u64 limbs[NLIMBS] = {0};
    limbs[0] = v[NPRIMES - 1];
    for (int j = NPRIMES - 2; j >= 0; j--) {
      u128 acc = 0;
      u64 mul = PRIMES[j].q;
      for (int k = 0; k < NLIMBS; k++) {
        acc += (u128)limbs[k] * mul;
        limbs[k] = (u64)acc;
        acc >>= 64;
      }
      u128 addc = v[j];
      for (int k = 0; k < NLIMBS && addc; k++) {
        addc += limbs[k];
        limbs[k] = (u64)addc;
        addc >>= 64;
      }
    }
    memcpy(out + c * NLIMBS, limbs, sizeof(limbs));
  }
}

}  // extern "C"
