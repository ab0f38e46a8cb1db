"""Fixed-limb big-integer arithmetic for TPU (JAX/XLA).

Data layout (SURVEY.md §7 "data layout first"): a 256-bit field element is a
vector of L=16 limbs of 16 bits, stored in uint32 with the high half zero —
products of two limbs then fit exactly in uint32, and column sums of the
schoolbook multiplication stay below 2^21, so no 64-bit arithmetic is needed
(TPUs have no native u64 multiply; SURVEY.md §7 hard part 2).

All functions are pure jnp ops over arrays shaped [..., L]: they broadcast
over arbitrary batch dimensions, contain no data-dependent control flow, and
are jit/vmap/shard_map-compatible.  Modular multiplication is Montgomery
(separated REDC).
"""

from __future__ import annotations

import contextlib
import functools

import numpy as np
import jax
import jax.numpy as jnp

LIMB_BITS = 16
LIMBS = 16  # 256 bits
MASK = (1 << LIMB_BITS) - 1


# ---------------------------------------------------------------------------
# host <-> limb conversions (numpy, not traced)
# ---------------------------------------------------------------------------


def int_to_limbs(x: int, limbs: int = LIMBS) -> np.ndarray:
    out = np.zeros(limbs, dtype=np.uint32)
    for i in range(limbs):
        out[i] = x & MASK
        x >>= LIMB_BITS
    assert x == 0, "value too large for limb count"
    return out


def ints_to_limbs(xs, limbs: int = LIMBS) -> np.ndarray:
    """Vectorized batch conversion via a byte view."""
    n = len(xs)
    nbytes = limbs * LIMB_BITS // 8
    buf = bytearray(n * nbytes)
    for i, x in enumerate(xs):
        buf[i * nbytes : (i + 1) * nbytes] = int(x).to_bytes(nbytes, "little")
    arr = np.frombuffer(bytes(buf), dtype=np.uint16).reshape(n, limbs)
    return arr.astype(np.uint32)


def limbs_to_int(limbs_arr) -> int:
    x = 0
    arr = np.asarray(limbs_arr)
    for i in range(arr.shape[-1] - 1, -1, -1):
        x = (x << LIMB_BITS) | int(arr[i])
    return x


def limbs_to_ints(arr) -> list:
    arr = np.asarray(arr).astype(np.uint16)
    n, limbs = arr.shape
    raw = arr.tobytes()
    nbytes = limbs * 2
    return [
        int.from_bytes(raw[i * nbytes : (i + 1) * nbytes], "little")
        for i in range(n)
    ]


# ---------------------------------------------------------------------------
# traced limb arithmetic
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _acc_matrix(L: int, out_cols: int):
    """One-hot anti-diagonal accumulation matrix [2*L*L, out_cols].

    Row (0, i, j) routes the low half of a_i*b_j to column i+j; row (1, i, j)
    routes the high half to column i+j+1.  Column sums stay below
    2*L*(2^16-1) < 2^21, exactly representable in f32 (24-bit mantissa), so
    the accumulation runs as a single f32 matmul — this is the MXU mapping
    of schoolbook limb multiplication.
    """
    T = np.zeros((2, L, L, out_cols), np.float32)
    for i in range(L):
        for j in range(L):
            if i + j < out_cols:
                T[0, i, j, i + j] = 1.0
            if i + j + 1 < out_cols:
                T[1, i, j, i + j + 1] = 1.0
    # cache the numpy value (a jnp constant created inside a trace would leak
    # a tracer out through the lru_cache)
    return T.reshape(2 * L * L, out_cols)


_SHIFT_ACCUM = False


@contextlib.contextmanager
def shift_accum():
    """Force the pad/shift-add accumulation while tracing (Pallas kernel
    bodies cannot capture the one-hot matmul constant)."""
    global _SHIFT_ACCUM
    saved = _SHIFT_ACCUM
    _SHIFT_ACCUM = True
    try:
        yield
    finally:
        _SHIFT_ACCUM = saved


def _mul_cols_shift(a, b, out_cols):
    """Exact u32 pad/shift-add column accumulation (no constants captured)."""
    L = a.shape[-1]
    batch = a.shape[:-1]
    prod = a[..., :, None] * b[..., None, :]
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    def shifted(row_vals, offset):
        # pad right then roll: a single aligned concatenate + static roll is
        # Mosaic-lowerable, unlike per-offset 1-wide concat segments
        width = row_vals.shape[-1]
        tail = out_cols - width
        if tail > 0:
            base = jnp.concatenate(
                [row_vals, jnp.zeros(batch + (tail,), jnp.uint32)], axis=-1
            )
        else:
            base = row_vals[..., :out_cols]
        if offset == 0:
            return base
        # offset + width <= out_cols always holds here, so no wrap-around
        return jnp.roll(base, offset, axis=-1)

    cols = jnp.zeros(batch + (out_cols,), dtype=jnp.uint32)
    for i in range(min(L, out_cols)):
        w_lo = min(L, out_cols - i)
        cols = cols + shifted(lo[..., i, :w_lo], i)
        w_hi = min(L, out_cols - i - 1)
        if w_hi > 0:
            cols = cols + shifted(hi[..., i, :w_hi], i + 1)
    return cols


def _mul_cols(a, b, out_cols):
    """Anti-diagonal (column) accumulation of the limb products.

    The limb products are computed exactly in u32 on the VPU, split into
    8-bit planes (values <= 255, exactly representable in bf16), and the
    anti-diagonal sums run as two bf16 x bf16 -> f32 matmuls against the 0/1
    accumulation matrix — the *native* MXU path, exact because every column
    sum stays far below 2^24.  (A plain f32 matmul is NOT exact on the TPU
    MXU — it executes as lossy bf16 passes — which this decomposition
    sidesteps while keeping compile time low.)
    """
    if _SHIFT_ACCUM:
        return _mul_cols_shift(a, b, out_cols)
    L = a.shape[-1]
    batch = a.shape[:-1]
    prod = a[..., :, None] * b[..., None, :]  # [..., L, L] u32, exact
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    T = jnp.asarray(_acc_matrix(L, out_cols), dtype=jnp.bfloat16)

    def planes(shift):
        return jnp.concatenate(
            [
                ((lo >> shift) & 0xFF).reshape(batch + (L * L,)),
                ((hi >> shift) & 0xFF).reshape(batch + (L * L,)),
            ],
            axis=-1,
        ).astype(jnp.bfloat16)

    cols0 = jnp.matmul(planes(0), T, preferred_element_type=jnp.float32)
    cols8 = jnp.matmul(planes(8), T, preferred_element_type=jnp.float32)
    return cols0.astype(jnp.uint32) + (cols8.astype(jnp.uint32) << 8)


def mul_wide(a, b):
    """Full product of two [..., L] limb vectors -> [..., 2L] limb vector."""
    L = a.shape[-1]
    return _carry(_mul_cols(a, b, 2 * L + 1))[..., : 2 * L]


def mul_low(a, b, out_limbs=None):
    """Low half of the product (mod 2^(16*out_limbs))."""
    L = a.shape[-1]
    out_limbs = out_limbs or L
    return _carry(_mul_cols(a, b, out_limbs + 1))[..., :out_limbs]


def _carry(cols):
    """Propagate carries so every limb is < 2^16 (sequential static scan)."""
    n = cols.shape[-1]
    out = []
    c = jnp.zeros(cols.shape[:-1], dtype=jnp.uint32)
    for k in range(n):
        v = cols[..., k] + c
        out.append(v & MASK)
        c = v >> LIMB_BITS
    return jnp.stack(out, axis=-1)


def add_raw(a, b):
    """a + b with carry, same limb count (assumes no overflow past top)."""
    s = a + b
    return _carry(s)


def _borrow_sub(a, b):
    """a - b -> (diff, borrow_out) elementwise over limbs."""
    n = a.shape[-1]
    out = []
    borrow = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
    for k in range(n):
        # compute in uint32: a - b - borrow + 2^16, track wraparound
        v = a[..., k] + (1 << LIMB_BITS) - b[..., k] - borrow
        out.append(v & MASK)
        borrow = 1 - (v >> LIMB_BITS)  # 1 if we wrapped (a < b + borrow)
    return jnp.stack(out, axis=-1), borrow


def geq(a, b):
    """a >= b as a boolean [..., ] mask."""
    _, borrow = _borrow_sub(a, b)
    return borrow == 0


def cond_sub(a, p_limbs):
    """a - p if a >= p else a."""
    diff, borrow = _borrow_sub(a, p_limbs)
    keep = (borrow != 0)[..., None]
    return jnp.where(keep, a, diff)


def add_mod(a, b, p_limbs):
    # a + b can exceed 2^256 for moduli close to the limb capacity (BN256 p),
    # so carry into an extra limb before the conditional subtract.
    L = a.shape[-1]
    ext = jnp.zeros(a.shape[:-1] + (1,), dtype=jnp.uint32)
    s = _carry(jnp.concatenate([a + b, ext], axis=-1))
    p_ext = jnp.concatenate(
        [jnp.broadcast_to(p_limbs, a.shape), ext], axis=-1
    )
    diff, borrow = _borrow_sub(s, p_ext)
    return jnp.where((borrow == 0)[..., None], diff, s)[..., :L]


def sub_mod(a, b, p_limbs):
    diff, borrow = _borrow_sub(a, b)
    corrected = _carry(diff + p_limbs)[..., : a.shape[-1]]
    return jnp.where((borrow != 0)[..., None], corrected, diff)


def mont_redc(t_wide, p_limbs, n_prime_limbs):
    """REDC parameterized by the modulus constants (usable inside Pallas
    kernels where constants arrive as kernel inputs)."""
    L = t_wide.shape[-1] // 2
    t_lo = t_wide[..., :L]
    m = mul_low(t_lo, n_prime_limbs, L)
    mn = mul_wide(m, p_limbs)  # [..., 2L]
    # t + m*n: low half becomes zero; compute full sum with carries
    # (padded add instead of scatter-add: Mosaic has no scatter lowering)
    pad1 = jnp.zeros(t_wide.shape[:-1] + (1,), jnp.uint32)
    total = jnp.concatenate([t_wide, pad1], axis=-1) + jnp.concatenate(
        [mn, pad1], axis=-1
    )
    total = _carry(total)
    hi = total[..., L : 2 * L + 1]
    top = hi[..., L:]  # the (L+1)-th limb (carry bit)
    res = hi[..., :L]
    # if top bit set, subtract p once more (res + 2^256 >= p always)
    diff, borrow = _borrow_sub(res, jnp.broadcast_to(p_limbs, res.shape))
    need_sub = (top[..., 0] != 0) | (borrow == 0)
    return jnp.where(need_sub[..., None], diff, res)


def mont_mul(a, b, p_limbs, n_prime_limbs):
    return mont_redc(mul_wide(a, b), p_limbs, n_prime_limbs)


class MontCtx:
    """Per-modulus constants for Montgomery arithmetic (device-resident)."""

    def __init__(self, p: int, limbs: int = LIMBS):
        self.p = p
        self.limbs = limbs
        self.bits = limbs * LIMB_BITS
        R = 1 << self.bits
        self.R = R
        # constants are numpy (not device) arrays so they embed as literals
        # in traced code — required for Pallas kernel bodies
        self.p_limbs = int_to_limbs(p, limbs)
        self.n_prime = (-pow(p, -1, R)) % R
        self.n_prime_limbs = int_to_limbs(self.n_prime, limbs)
        self.r2 = R * R % p
        self.r2_limbs = int_to_limbs(self.r2, limbs)
        self.one_mont = int_to_limbs(R % p, limbs)
        self.zero = int_to_limbs(0, limbs)

    # -- Montgomery core ---------------------------------------------------
    def redc(self, t_wide):
        """REDC: t_wide [..., 2L] -> t_wide * R^-1 mod p, [..., L]."""
        return mont_redc(t_wide, self.p_limbs, self.n_prime_limbs)

    def mul(self, a, b):
        return mont_mul(a, b, self.p_limbs, self.n_prime_limbs)

    def square(self, a):
        return self.redc(mul_wide(a, a))

    def to_mont(self, a):
        return self.redc(mul_wide(a, self.r2_limbs))

    def from_mont(self, a):
        L = self.limbs
        t = jnp.concatenate([a, jnp.zeros(a.shape[:-1] + (L,), jnp.uint32)], axis=-1)
        return self.redc(t)

    def add(self, a, b):
        return add_mod(a, b, self.p_limbs)

    def sub(self, a, b):
        return sub_mod(a, b, self.p_limbs)

    def neg(self, a):
        return sub_mod(jnp.broadcast_to(self.zero, a.shape), a, self.p_limbs)

    # -- host helpers ------------------------------------------------------
    def _jit(self, name, fn):
        key = "_jit_" + name
        cached = getattr(self, key, None)
        if cached is None:
            cached = jax.jit(fn)
            setattr(self, key, cached)
        return cached

    def encode(self, xs) -> jnp.ndarray:
        """ints -> Montgomery-domain device limbs [n, L]."""
        arr = ints_to_limbs([x % self.p for x in xs], self.limbs)
        return self._jit("to_mont", self.to_mont)(jnp.asarray(arr))

    def decode(self, arr) -> list:
        """Montgomery-domain device limbs -> list of ints."""
        plain = self._jit("from_mont", self.from_mont)(arr)
        return limbs_to_ints(np.asarray(plain))


@functools.lru_cache(maxsize=None)
def mont_ctx(p: int, limbs: int = LIMBS) -> MontCtx:
    return MontCtx(p, limbs)
