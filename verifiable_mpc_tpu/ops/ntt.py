"""NTT-based exact polynomial multiplication (TPU kernel + host fallback).

The protocol fields (Ed25519 order, BN256 order) have tiny 2-adicity (2 and
5), so no radix-2 NTT exists inside them.  Instead, polynomial products are
computed *exactly over the integers* in a single large NTT-friendly prime
P = k*2^a + 1 chosen with P > n * p^2, then reduced mod the protocol field —
turning the reference's O(n^2) schoolbook (qap_creator.py:62-67) into
O(n log n) with TPU-resident butterflies.

Kernel shape: the coefficient vector lives on device as [n, 34] 16-bit limbs
(544-bit Montgomery arithmetic from :mod:`limbs`); one `lax.scan` over the
log2(n) butterfly stages whose body is a single batched Montgomery multiply
plus add/sub — gather/scatter index tables and twiddle indices are
precomputed host-side per size.  Sequential depth is log2(n); every stage is
an n/2-lane vector op.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..groups.qr import _is_probable_prime
from . import limbs as lb

TWO_ADICITY = 24  # supports NTT sizes up to 2^24
PRIME_BITS = 528
NTT_LIMBS = 34  # 544 bits


@functools.lru_cache(maxsize=None)
def ntt_prime(bits: int = PRIME_BITS, two_adicity: int = TWO_ADICITY) -> int:
    """Smallest prime k*2^a + 1 with at least `bits` bits (deterministic)."""
    a = two_adicity
    k = (1 << (bits - a)) + 1
    while True:
        P = k * (1 << a) + 1
        if _is_probable_prime(P):
            return P
        k += 2


@functools.lru_cache(maxsize=None)
def _primitive_root_of_unity(P: int, order: int) -> int:
    """Element of exact multiplicative order `order` (a power of two) in GF(P)."""
    assert (P - 1) % order == 0
    cofactor = (P - 1) // order
    g = 2
    while True:
        w = pow(g, cofactor, P)
        if pow(w, order // 2, P) != 1 and pow(w, order, P) == 1:
            return w
        g += 1


@functools.lru_cache(maxsize=None)
def _plan(n: int):
    """Host-side butterfly plan for size n: bit-reversal permutation,
    per-stage gather indices and twiddle indices."""
    assert n & (n - 1) == 0
    stages = n.bit_length() - 1
    # bit reversal
    rev = np.zeros(n, dtype=np.int32)
    for i in range(n):
        r = 0
        x = i
        for _ in range(stages):
            r = (r << 1) | (x & 1)
            x >>= 1
        rev[i] = r
    idx_a = np.zeros((stages, n // 2), np.int32)
    idx_b = np.zeros((stages, n // 2), np.int32)
    idx_w = np.zeros((stages, n // 2), np.int32)
    for s in range(stages):
        half = 1 << s
        step = n // (2 * half)  # twiddle stride into the w^k table
        pos = 0
        for start in range(0, n, 2 * half):
            for k in range(half):
                idx_a[s, pos] = start + k
                idx_b[s, pos] = start + k + half
                idx_w[s, pos] = k * step
                pos += 1
    return rev, idx_a, idx_b, idx_w


class NTTEngine:
    """Size-n NTT over GF(P) with device-resident tables."""

    def __init__(self, n: int, P: int = None, limbs: int = NTT_LIMBS):
        self.n = n
        self.P = P or ntt_prime()
        self.ctx = lb.mont_ctx(self.P, limbs)
        w = _primitive_root_of_unity(self.P, n)
        w_inv = pow(w, -1, self.P)
        powers = [1] * (n // 2)
        powers_inv = [1] * (n // 2)
        for i in range(1, n // 2):
            powers[i] = powers[i - 1] * w % self.P
            powers_inv[i] = powers_inv[i - 1] * w_inv % self.P
        self.tw = self.ctx.encode(powers)
        self.tw_inv = self.ctx.encode(powers_inv)
        self.n_inv = self.ctx.encode([pow(n, -1, self.P)])[0]
        rev, idx_a, idx_b, idx_w = _plan(n)
        self.rev = jnp.asarray(rev)
        self.idx_a = jnp.asarray(idx_a)
        self.idx_b = jnp.asarray(idx_b)
        self.idx_w = jnp.asarray(idx_w)
        self._fwd = jax.jit(lambda x: self._transform(x, self.tw))
        self._bwd = jax.jit(self._inverse)

    def _transform(self, x, tw):
        ctx = self.ctx
        x = jnp.take(x, self.rev, axis=0)

        def stage(x, inputs):
            ia, ib, iw = inputs
            u = jnp.take(x, ia, axis=0)
            v = ctx.mul(jnp.take(x, ib, axis=0), jnp.take(tw, iw, axis=0))
            x = x.at[ia].set(ctx.add(u, v))
            x = x.at[ib].set(ctx.sub(u, v))
            return x, None

        x, _ = jax.lax.scan(stage, x, (self.idx_a, self.idx_b, self.idx_w))
        return x

    def _inverse(self, x):
        ctx = self.ctx
        y = self._transform(x, self.tw_inv)
        scale = jnp.broadcast_to(self.n_inv, y.shape)
        return ctx.mul(y, scale)

    # -- host API ----------------------------------------------------------
    def forward(self, ints):
        assert len(ints) == self.n
        return self._fwd(self.ctx.encode(ints))

    def inverse_to_ints(self, dev):
        return self.ctx.decode(self._bwd(dev))

    def pointwise_mul(self, a_dev, b_dev):
        return self.ctx._jit("mul", self.ctx.mul)(a_dev, b_dev)


@functools.lru_cache(maxsize=None)
def _engine(n: int) -> NTTEngine:
    return NTTEngine(n)


def _next_pow2(x: int) -> int:
    return 1 << max(1, (x - 1).bit_length())


# below this transform size the host NTT wins: the device path pays
# int<->limb conversion and (tunnel) transfer per call, which at 2^14..2^17
# outweighs the butterfly speedup.  Keeping coefficient vectors
# device-resident across the subproduct trees (docs/ROADMAP.md) is what
# makes smaller thresholds pay off.
DEVICE_NTT_THRESHOLD = 1 << 18


# the native 9-prime CRT NTT wins from small sizes up (C++ with OpenMP);
# below this the schoolbook in fastpoly already took over
NATIVE_NTT_THRESHOLD = 64


# mesh backend: sharded four-step NTT (parallel/ntt_mesh.py), registered by
# enable_multichip() so the polynomial hot spots of the QAP pipeline
# (reference qap_creator.py:96-176, pynocchio.py:203-211) scale over the
# device mesh.  (fn(a, b) -> exact integer product coefficients, min_n)
_MESH_BACKEND = None


def register_mesh_backend(fn, min_n: int = 1 << 14):
    global _MESH_BACKEND
    _MESH_BACKEND = (fn, min_n)


def poly_mul_ints(a, b, use_device=None) -> list:
    """Exact integer polynomial product.

    Backend order: mesh-sharded four-step NTT (if registered, large sizes)
    -> native C++ CRT-NTT (if built) -> TPU big-prime NTT for very large
    sizes -> host-Python big-prime NTT."""
    la, lb_ = len(a), len(b)
    out_len = la + lb_ - 1
    n = _next_pow2(out_len)
    max_a = max(max(a, default=1), 1)
    max_b = max(max(b, default=1), 1)
    if (min(la, lb_) * max_a * max_b).bit_length() > PRIME_BITS:
        # coefficients past every direct backend's exactness bound (the
        # QR-1024 field: ~1023-bit values): base-2^256 limb split, K*K
        # sub-convolutions through the fast C CRT NTT, shift-recombined.
        # Exact for coefficients up to 2^(256*K) with n*2^512 < 2^556.
        return _poly_mul_ints_limbsplit(a, b, max_a, max_b)[:out_len]
    if _MESH_BACKEND is not None and n >= _MESH_BACKEND[1]:
        return _MESH_BACKEND[0](a, b)[:out_len]
    if use_device is None:
        # the native C++ CRT NTT beats the device path at every size when a
        # toolchain exists: the TPU engine pays int<->limb conversion plus
        # (tunnel) transfer per call.  Device only on explicit request or as
        # the large-size fallback without a native build.
        if n >= NATIVE_NTT_THRESHOLD:
            from .. import native

            if native.available():
                return native.ntt_poly_mul_ints(a, b)[:out_len]
        use_device = n >= DEVICE_NTT_THRESHOLD
    P = ntt_prime()
    # exactness bound: every product coefficient < P
    assert (
        min(la, lb_) * max(max(a, default=1), 1) * max(max(b, default=1), 1) < P
    ), "coefficients too large for exact NTT recovery"
    if use_device:
        eng = _engine(n)
        fa = eng.forward(list(a) + [0] * (n - la))
        fb = eng.forward(list(b) + [0] * (n - lb_))
        fc = eng.pointwise_mul(fa, fb)
        out = eng.inverse_to_ints(fc)
        return out[:out_len]
    return _poly_mul_host(a, b, out_len, n, P)


def _poly_mul_host(a, b, out_len, n, P):
    w = _primitive_root_of_unity(P, n)
    fa = _ntt_host(list(a) + [0] * (n - len(a)), P, w)
    fb = _ntt_host(list(b) + [0] * (n - len(b)), P, w)
    fc = [x * y % P for x, y in zip(fa, fb)]
    w_inv = pow(w, -1, P)
    out = _ntt_host(fc, P, w_inv)
    n_inv = pow(n, -1, P)
    return [c * n_inv % P for c in out[:out_len]]


@functools.lru_cache(maxsize=None)
def _host_plan(n: int):
    """Butterfly plan as plain Python lists (numpy scalar indexing is ~10x
    slower in the hot loop)."""
    rev, idx_a, idx_b, idx_w = _plan(n)
    return (
        rev.tolist(),
        [row.tolist() for row in idx_a],
        [row.tolist() for row in idx_b],
        [row.tolist() for row in idx_w],
    )


@functools.lru_cache(maxsize=None)
def _host_twiddles(P: int, w: int, half: int):
    tw = [1] * half
    for i in range(1, half):
        tw[i] = tw[i - 1] * w % P
    return tw


def _ntt_host(values, P, w):
    n = len(values)
    rev, idx_a, idx_b, idx_w = _host_plan(n)
    x = [values[r] for r in rev]
    tw = _host_twiddles(P, w, n // 2)
    stages = n.bit_length() - 1
    for s in range(stages):
        ia_row = idx_a[s]
        ib_row = idx_b[s]
        iw_row = idx_w[s]
        for pos in range(n // 2):
            ia = ia_row[pos]
            ib = ib_row[pos]
            v = x[ib] * tw[iw_row[pos]] % P
            u = x[ia]
            x[ia] = (u + v) % P
            x[ib] = (u - v) % P
    return x


# ---------------------------------------------------------------------------
# protocol-field integration (mod-p polynomial products via integer lifting)
# ---------------------------------------------------------------------------


def _poly_mul_ints_limbsplit(a, b, max_a: int, max_b: int) -> list:
    """Exact product for LARGE coefficients (e.g. the 1024-bit QR field):
    write a(x) = sum_k A_k(x) 2^(base k) with A_k's coefficients < 2^base,
    convolve every (A_k, B_l) pair through the direct backends, and
    recombine with shifts.  K*L sub-convolutions of the same length —
    quasi-linear where the reference's schoolbook is O(n^2) in 1024-bit
    multiplies (qap_creator.py:62-67).

    ``base`` is sized so each sub-convolution fits the direct CRT bound
    (min_len * 2^(2*base) < 2^PRIME_BITS) and, crucially, is STRICTLY
    smaller than the current coefficient width — a fixed 256-bit base
    made no progress for ~257-bit coefficients whose n pushed the bound
    just over the limit (infinite recursion)."""
    base = (PRIME_BITS - 4 - min(len(a), len(b)).bit_length()) // 2
    base = max(64, min(256, base))
    ka = (max(max_a.bit_length(), 1) + base - 1) // base
    kb = (max(max_b.bit_length(), 1) + base - 1) // base
    mask = (1 << base) - 1
    a_limbs = [[(c >> (base * k)) & mask for c in a] for k in range(ka)]
    b_limbs = [[(c >> (base * l)) & mask for c in b] for l in range(kb)]
    out = [0] * (len(a) + len(b) - 1)
    for k in range(ka):
        ak = a_limbs[k]
        if not any(ak):
            continue
        for l in range(kb):
            bl = b_limbs[l]
            if not any(bl):
                continue
            conv = poly_mul_ints(ak, bl)
            shift = base * (k + l)
            for i, c in enumerate(conv):
                if c:
                    out[i] += c << shift
    return out


def poly_mul_mod(a_ints, b_ints, p: int, use_device=None) -> list:
    """(a * b) mod p coefficient-wise, exact via integer NTT."""
    a = [x % p for x in a_ints]
    b = [x % p for x in b_ints]
    prod = poly_mul_ints(a, b, use_device)
    return [c % p for c in prod]


def _as_int(c):
    if isinstance(c, int):
        return c
    if hasattr(c, "value") and isinstance(c.value, int):
        return c.value
    return None


def _poly_backend(a_coeffs, b_coeffs):
    """Backend for tools.poly.multiply_polys; None -> caller falls back."""
    field = None
    a_ints, b_ints = [], []
    for coeffs, out in ((a_coeffs, a_ints), (b_coeffs, b_ints)):
        for c in coeffs:
            v = _as_int(c)
            if v is None:
                return None  # secure shares etc.: keep the generic path
            out.append(v)
            if not isinstance(c, int) and field is None:
                field = type(c)
    if field is None:
        return None  # plain ints: ambiguous modulus
    p = field.modulus
    prod = poly_mul_mod(a_ints, b_ints, p)
    return [field(c) for c in prod]


def register(min_len: int = 128):
    """Install the NTT backend for large polynomial products."""
    from ..tools import poly

    poly.register_poly_mul_backend(_poly_backend, min_len)
