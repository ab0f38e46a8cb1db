"""Limb-major fixed-limb big-integer arithmetic (Pallas-lowerable).

The batch-major layout of :mod:`limbs` ([..., 16] with the limb index on the
minor axis) trips Mosaic's vector layout rules inside Pallas kernels: every
limb shift becomes a minor-dim concatenate/roll (the documented blocker in
ops/pallas_kernels.py).  This module stores the SAME 16x16-bit representation
transposed — shape [L, *batch] with the limb index on the LEADING axis — so

* limb shifts are static pads on axis 0 (sublane copies, cleanly lowerable),
* every carry/borrow step operates on a full [*batch] tile (batch on
  sublanes x lanes when batch is >= 2-D),
* modulus constants are Python int scalars embedded as immediates (nothing
  captured, no constant tensors — the other Mosaic constraint).

Design note on trace size vs runtime: a fully unrolled row-list formulation
is ~1.3x cheaper at runtime but traces ~10x more primitives (Mosaic compile
minutes -> hours per shape).  This module therefore works on whole [L,*B]
tensors with ONE padded accumulate per schoolbook column group, pairing each
high half with the next low half first so the pad waste stays small.

Values are u32 tensors with each row < 2^16 (canonical) unless noted.  All
functions broadcast over arbitrary trailing batch dims and contain no
data-dependent control flow, so they can be used both in plain XLA code and
inside Pallas kernel bodies.  Oracle-tested against :mod:`limbs` /
Python bigints (tests/test_msm_pallas.py).
"""

from __future__ import annotations

import jax.numpy as jnp

LIMB_BITS = 16
LIMBS = 16
MASK = (1 << LIMB_BITS) - 1


def int_to_scalar_limbs(x: int, limbs: int = LIMBS) -> tuple:
    """Python int -> tuple of Python-int limbs (compile-time constants)."""
    out = []
    for _ in range(limbs):
        out.append(x & MASK)
        x >>= LIMB_BITS
    assert x == 0, "value too large for limb count"
    return tuple(out)


def _shift(x, k: int, total: int):
    """Place rows of x starting at row k of a [total, *batch] zero tensor."""
    r = x.shape[0]
    assert k + r <= total
    pad = [(k, total - r - k)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def carry(cols, out_rows: int):
    """Sequential carry propagation: cols [K, *B] (entries < 2^32) ->
    canonical [out_rows, *B] (each row < 2^16).  Rows beyond K are carry
    overflow; rows beyond out_rows are dropped (mod 2^(16*out_rows))."""
    k_in = cols.shape[0]
    out = []
    c = jnp.zeros(cols.shape[1:], jnp.uint32)
    for k in range(out_rows):
        v = (cols[k] + c) if k < k_in else c
        out.append(v & MASK)
        c = v >> LIMB_BITS
    return jnp.stack(out, axis=0)


def _mul_cols(a, b_rows, total: int):
    """Column accumulation of a [L,*B] times one factor per iteration.

    b_rows yields (j, bj) pairs where bj is a [*B] row or a u32 scalar.
    Each iteration pairs the high halves of step j with the low halves of
    step j+1 (both live at row offset j+1), so only ONE padded accumulate
    of the [total,*B] running sum happens per j — the pad waste stays
    ~L/(2*total) instead of 2x."""
    L = a.shape[0]
    cols = jnp.zeros((total,) + a.shape[1:], jnp.uint32)
    pending = None  # high halves of the previous j, shifted to offset j+1
    pend_j = 0
    for j, bj in b_rows:
        prod = a * bj  # exact: both operands < 2^16
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        if pending is not None and pend_j == j:
            # hi_{j-1} sits at the same offset as lo_j: fuse (full-width add)
            lo = lo + pending  # rows < 2^17, still exact in u32
            pending = None
        elif pending is not None:
            cols = cols + _shift(pending[: total - pend_j], pend_j, total)
            pending = None
        cols = cols + _shift(lo[: total - j], j, total)
        if j + 1 < total:
            pending = hi
            pend_j = j + 1
    if pending is not None:
        cols = cols + _shift(pending[: total - pend_j], pend_j, total)
    return cols


def mul_wide(a, b):
    """[L,*B] x [L,*B] -> [2L,*B] full product, canonical limbs.

    Column sums stay < (2L+1) * 2^16 < 2^22, exact in u32."""
    L = a.shape[0]
    cols = _mul_cols(a, ((j, b[j]) for j in range(L)), 2 * L + 1)
    return carry(cols, 2 * L)


def mul_wide_const(a, c_ints, out_rows: int | None = None):
    """[L,*B] times compile-time-constant limbs -> [out_rows,*B] canonical.

    Truncates columns >= out_rows (use out_rows=L for a mul-low)."""
    L = a.shape[0]
    if out_rows is None:
        out_rows = L + len(c_ints)
    total = out_rows + 1
    pairs = (
        (j, jnp.uint32(cj))
        for j, cj in enumerate(c_ints)
        if cj != 0 and j < total
    )
    cols = _mul_cols(a, pairs, total)
    return carry(cols, out_rows)


def _borrow_sub_const(a, c_ints):
    """a - const -> (diff [L,*B], borrow [*B]); rows of a must be canonical."""
    L = a.shape[0]
    out = []
    borrow = jnp.zeros(a.shape[1:], jnp.uint32)
    for k in range(L):
        ck = c_ints[k] if k < len(c_ints) else 0
        v = a[k] + jnp.uint32((1 << LIMB_BITS) - ck) - borrow
        out.append(v & MASK)
        borrow = 1 - (v >> LIMB_BITS)
    return jnp.stack(out, axis=0), borrow


def _borrow_sub(a, b):
    L = a.shape[0]
    out = []
    borrow = jnp.zeros(a.shape[1:], jnp.uint32)
    for k in range(L):
        v = a[k] + jnp.uint32(1 << LIMB_BITS) - b[k] - borrow
        out.append(v & MASK)
        borrow = 1 - (v >> LIMB_BITS)
    return jnp.stack(out, axis=0), borrow


def add_mod(a, b, p_ints):
    """(a + b) mod p for canonical a, b < p."""
    L = a.shape[0]
    s = carry(a + b, L + 1)  # rows < 2^17 pre-carry
    diff, borrow = _borrow_sub_const(s, p_ints)
    return jnp.where((borrow == 0)[None], diff, s)[:L]


def sub_mod(a, b, p_ints):
    """(a - b) mod p for canonical a, b < p."""
    L = a.shape[0]
    diff, borrow = _borrow_sub(a, b)
    # per-row scalar immediates (a non-splat constant tensor would have to be
    # captured, which Mosaic kernel bodies disallow)
    padd = jnp.stack(
        [diff[k] + jnp.uint32(p_ints[k] if k < len(p_ints) else 0) for k in range(L)],
        axis=0,
    )
    corrected = carry(padd, L)
    return jnp.where((borrow != 0)[None], corrected, diff)


def neg_mod(a, p_ints):
    """(-a) mod p for canonical a < p (maps 0 -> 0)."""
    return sub_mod(jnp.zeros_like(a), a, p_ints)


def mont_redc(t, p_ints, nprime_ints):
    """REDC: t [2L,*B] canonical -> t * R^-1 mod p, [L,*B], canonical < p."""
    L = t.shape[0] // 2
    m = mul_wide_const(t[:L], nprime_ints, L)  # low half only
    mn = mul_wide_const(m, p_ints, 2 * L)
    total = carry(t + mn, 2 * L + 1)  # rows < 2^17 pre-carry
    hi = total[L:]  # [L+1, *B]; row L is the carry bit
    res = hi[:L]
    top = hi[L]
    diff, borrow = _borrow_sub_const(res, p_ints)
    need_sub = (top != 0) | (borrow == 0)
    return jnp.where(need_sub[None], diff, res)


def _sq_cols(a):
    """Schoolbook columns of a^2, [2L+1,*B] with entries < 2^22.

    Half the limb products of a full mul: cross terms a_j*a_k (j < k) are
    accumulated once and doubled, the diagonal a_j^2 added after.  The same
    hi/lo fusion as :func:`_mul_cols` keeps it at ONE padded accumulate per
    j: lo_j starts at column 2j+1 and hi_{j-1} at column 2j, so prepending a
    zero row to lo_j aligns both at 2j with equal row counts (L-j)."""
    n = a.shape[0]
    total = 2 * n + 1
    cols = jnp.zeros((total,) + a.shape[1:], jnp.uint32)
    pending = None  # hi halves of iteration j-1, at column offset 2j
    for j in range(n - 1):
        prod = a[j + 1 :] * a[j]  # [n-1-j, *B], exact: both operands < 2^16
        lo = prod & MASK  # column offset 2j+1
        hi = prod >> LIMB_BITS  # column offset 2j+2
        lo = _shift(lo, 1, n - j)  # re-anchor at offset 2j
        if pending is not None:
            lo = lo + pending  # rows < 2^17, still exact in u32
        cols = cols + _shift(lo, 2 * j, total)
        pending = hi
    if pending is not None:
        cols = cols + _shift(pending, 2 * n - 2, total)
    cols = cols + cols  # double the cross terms (entries < 2^21)
    prod = a * a
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    diag = jnp.stack(
        [lo[c // 2] if c % 2 == 0 else hi[c // 2] for c in range(2 * n)],
        axis=0,
    )
    return cols + _shift(diag, 0, total)


def sq_wide(a):
    """[L,*B] -> [2L,*B] full square, canonical limbs (~47% fewer limb
    products than mul_wide(a, a))."""
    return carry(_sq_cols(a), 2 * a.shape[0])


def mont_mul(a, b, p_ints, nprime_ints):
    return mont_redc(mul_wide(a, b), p_ints, nprime_ints)


def mont_sq(a, p_ints, nprime_ints):
    return mont_redc(sq_wide(a), p_ints, nprime_ints)


def mont_mul_const(a, c_mont_ints, p_ints, nprime_ints):
    """a * c (c a compile-time Montgomery-domain constant) mod p."""
    L = a.shape[0]
    return mont_redc(mul_wide_const(a, c_mont_ints, 2 * L), p_ints, nprime_ints)


# ---------------------------------------------------------------------------
# pseudo-Mersenne arithmetic mod p25519 = 2^255 - 19
#
# Ed25519's prime admits a far cheaper reduction than Montgomery REDC:
# 2^256 == 38 (mod p), so the high columns of a schoolbook product fold back
# into the low 16 with a single x38 scale instead of two extra full 16-limb
# multiplies.  Values here live in the RELAXED domain: 16 canonical limbs
# (< 2^16 each), value anywhere in [0, 2^256) congruent to the intended
# residue — only the host decode reduces fully mod p.  Per field-mul this is
# ~2.6x fewer VPU ops than mont_mul (the REDC path is kept below for
# non-Mersenne moduli, e.g. BN254).
# ---------------------------------------------------------------------------

P25519 = (1 << 255) - 19


def _fold_top25519(s, out_rows: int):
    """[17,*B] canonical -> row16 folded into row0 with weight 38."""
    row0 = (s[0] + jnp.uint32(38) * s[16])[None]
    return carry(jnp.concatenate([row0, s[1:16]], axis=0), out_rows)


def reduce25519(cols):
    """Column tensor [R,*B] (16 <= R <= 33, entries < 2^27) -> [16,*B]
    canonical limbs; value < 2^256, congruent mod 2^255 - 19.

    2^(256+16j) == 38 * 2^16j (mod p): rows >= 16 fold back with weight 38
    (row 32, when present, folds twice: weight 38^2 = 1444).  Entry bounds:
    38 * 2^27 + 2^27 < 2^32 keeps everything exact in u32; the folded value
    is < 2^268, so one 17-row carry plus two fold-the-top passes produce a
    canonical 16-row result < 2^256 (the second fold's top is in {0, 1} and
    when it is 1 the remaining value is tiny, so no carry escapes row 15)."""
    R = cols.shape[0]
    assert 16 <= R <= 33
    lo = cols[:16]
    if R > 16:
        hi = jnp.uint32(38) * cols[16 : min(R, 32)]
        lo = lo + _shift(hi, 0, 16)
    if R == 33:
        top = jnp.uint32(38 * 38) * cols[32]
        lo = jnp.concatenate([(lo[0] + top)[None], lo[1:]], axis=0)
    s = carry(lo, 17)
    s = _fold_top25519(s, 17)
    return _fold_top25519(s, 16)


def mul25519(a, b):
    """a * b mod p25519 (relaxed domain, [16,*B] each)."""
    L = a.shape[0]
    cols = _mul_cols(a, ((j, b[j]) for j in range(L)), 2 * L + 1)
    return reduce25519(cols)


def sq25519(a):
    """a^2 mod p25519 — the doubling-ladder hot op (~47% fewer limb
    products than mul25519(a, a); column entries < 2^22 < 2^27)."""
    return reduce25519(_sq_cols(a))


def mul25519_const(a, c_ints):
    """a times a compile-time constant (plain residue limbs)."""
    pairs = ((j, jnp.uint32(cj)) for j, cj in enumerate(c_ints) if cj != 0)
    cols = _mul_cols(a, pairs, 2 * a.shape[0] + 1)
    return reduce25519(cols)


def add25519(a, b):
    return reduce25519(a + b)


# 2^257 - 76 == 2p25519 * 2 in borrow-free per-limb form: every limb m_k is
# >= 0xffff (so m_k - b_k never underflows in u32) and sum(m_k 2^16k) is
# exactly 2^257 - 76 -- the standard telescoping-borrow constant used to
# compute subtraction as an addition.
_M2P25519 = tuple(
    (((1 << 257) - 76) & MASK) + (1 << LIMB_BITS)
    if k == 0
    else ((((1 << 257) - 76) >> (LIMB_BITS * k)) & MASK) - 1 + (1 << LIMB_BITS)
    for k in range(16)
)
assert sum(m << (LIMB_BITS * k) for k, m in enumerate(_M2P25519)) == (1 << 257) - 76


def sub25519(a, b):
    """a - b mod p25519: a + (2^257 - 76) - b, always non-negative."""
    cols = jnp.stack(
        [a[k] + jnp.uint32(_M2P25519[k]) - b[k] for k in range(16)], axis=0
    )
    return reduce25519(cols)


def neg25519(b):
    cols = jnp.stack(
        [jnp.uint32(_M2P25519[k]) - b[k] for k in range(16)], axis=0
    )
    return reduce25519(cols)


_P25519_LIMBS = None


def _p25519_limbs():
    global _P25519_LIMBS
    if _P25519_LIMBS is None:
        _P25519_LIMBS = tuple(int_to_scalar_limbs(P25519))
    return _P25519_LIMBS


def canon25519(a):
    """Relaxed [16, *B] (< 2^256, congruent mod p) -> canonical residue
    < p: two conditional subtractions (2^256 - 1 = 2p + 37)."""
    p_ints = _p25519_limbs()
    for _ in range(2):
        diff, borrow = _borrow_sub_const(a, p_ints)
        a = jnp.where((borrow == 1)[None], a, diff)
    return a


def inv25519(z):
    """z^(p-2) over [16, *B] limb rows — the curve25519 Fermat chain
    (254 squarings + 11 multiplies), vectorized over the whole batch."""
    import jax

    def pow2k(v, k):
        return jax.lax.fori_loop(0, k, lambda _, a: sq25519(a), v)

    z2 = sq25519(z)
    z9 = mul25519(sq25519(sq25519(z2)), z)
    z11 = mul25519(z9, z2)
    z2_5_0 = mul25519(sq25519(z11), z9)
    z2_10_0 = mul25519(pow2k(z2_5_0, 5), z2_5_0)
    z2_20_0 = mul25519(pow2k(z2_10_0, 10), z2_10_0)
    z2_40_0 = mul25519(pow2k(z2_20_0, 20), z2_20_0)
    z2_50_0 = mul25519(pow2k(z2_40_0, 10), z2_10_0)
    z2_100_0 = mul25519(pow2k(z2_50_0, 50), z2_50_0)
    z2_200_0 = mul25519(pow2k(z2_100_0, 100), z2_100_0)
    z2_250_0 = mul25519(pow2k(z2_200_0, 50), z2_50_0)
    return mul25519(pow2k(z2_250_0, 5), z11)


def const_rows(c_ints, batch_shape):
    """Constant limbs -> [L, *batch] tensor built from per-row splats
    (no non-splat constant tensor is materialized)."""
    batch_shape = tuple(batch_shape)
    return jnp.stack(
        [jnp.full(batch_shape, c, jnp.uint32) for c in c_ints], axis=0
    )
