"""TPU kernels for the three hot group primitives over Ed25519:

* :func:`msm` — multi-scalar multiplication (Pedersen commitments, A/B of the
  compression rounds, Pinocchio-style proof sums; reference hot spots
  pivot.py:139-145 and compressed_pivot.py:41-42),
* :func:`fold` — the per-round generator fold g' = g_L^c * g_R
  (compressed_pivot.py:64),
* :func:`batch_exp` — fixed-base batch exponentiation (generator/CRS setup,
  circuit_sat_r1cs.py:47-93).

Kernel shape: bit-serial over the 253 scalar bits with all bit-planes
processed as one giant vectorized accumulator — a `lax.scan` over N/W point
chunks whose body is a single complete Edwards addition on a [253, W] lane
grid.  Sequential depth is N/W (not N), every step saturates the VPU, and
the traced graph stays small (one adder), so XLA compile time is bounded.

Host points/scalars are converted at the boundary; compiled kernels are
cached per batch shape.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..groups.edwards import ELL, EdwardsPoint
from . import curve_ed as ced
from . import dispatch
from . import limbs as lb

NBITS = 253  # ceil(log2(ELL))
DEFAULT_CHUNK = 256
WINDOW = 4  # digit width of the windowed MSM
NWINDOWS = 64  # 256 / WINDOW


def _scalar_bits(scalars, nbits=NBITS) -> np.ndarray:
    """[N] ints -> [nbits, N] uint32 bit planes, MSB first."""
    arr = lb.ints_to_limbs([int(s) % ELL for s in scalars]).astype(np.uint16)
    bytes_view = arr.view(np.uint8).reshape(len(scalars), -1)
    bits = np.unpackbits(bytes_view, axis=1, bitorder="little")  # [N, 256]
    bits = bits[:, :nbits][:, ::-1]  # MSB first
    return np.ascontiguousarray(bits.T).astype(np.uint32)


def _scalar_digits(scalars, order: int = ELL) -> np.ndarray:
    """[N] ints -> [NWINDOWS, N] uint32 4-bit digits, most significant first."""
    # int() first: field elements carry SIGNED int representatives, and
    # dispatch.multiexp hands backends raw scalars (gf % order can stay a
    # field element whose int() is negative)
    arr = lb.ints_to_limbs(
        [int(s) % order for s in scalars]
    ).astype(np.uint16)  # [N, 16]
    n = arr.shape[0]
    digits = np.zeros((n, NWINDOWS), np.uint32)
    for limb in range(16):  # each 16-bit limb holds 4 digits (LSB order)
        for k in range(4):
            digits[:, 4 * limb + k] = (arr[:, limb] >> (4 * k)) & 0xF
    return np.ascontiguousarray(digits[:, ::-1].T)  # MSB window first


def _msm_body(points, digits, n: int, chunk: int):
    """Unjitted windowed-MSM body (also the per-device body of the sharded
    MSM).

    4-bit digits: each point chunk first builds its multiple table
    k*P (k = 0..15) with a 15-step inner scan (one adder in the graph), the
    [NWINDOWS, chunk] digit grid gathers its multiples, and one complete
    addition accumulates them — ~78 lane-adds per point instead of the 253
    of the bit-serial variant.
    """
    assert n % chunk == 0
    acc = ced.identity((NWINDOWS, chunk))

    # Precompute k*P (k = 0..15) for every point with ONE top-level scan —
    # nesting the table scan inside the chunk scan multiplies XLA compile
    # time by an order of magnitude.  Memory: 16 multiples, ~4 KB/point.
    def table_step(carry, _):
        nxt = ced.add(carry, points)
        return nxt, nxt

    _, multiples = jax.lax.scan(
        table_step, ced.identity((n,)), None, length=15
    )  # 4 x [15, n, L] = 1P..15P
    table = tuple(
        jnp.concatenate([ident0[None], m], axis=0)
        for ident0, m in zip(ced.identity((n,)), multiples)
    )  # 4 x [16, n, L]

    def chunk_step(acc, inputs):
        tab_c, digs_c = inputs  # 4 x [16, chunk, L]; [NWINDOWS, chunk]
        # select each window's multiple: out[w, c] = tab_c[digit[w, c], c]
        # via a 16-way where-chain (gathers under scan lower poorly)
        sel = tuple(
            jnp.broadcast_to(t[0][None], (NWINDOWS,) + t[0].shape) for t in tab_c
        )
        for k in range(1, 16):
            mask = (digs_c == k)[..., None]
            sel = tuple(
                jnp.where(mask, t[k][None], s) for t, s in zip(tab_c, sel)
            )
        return ced.add(acc, sel), None

    tab_chunks = tuple(
        jnp.moveaxis(t.reshape(16, n // chunk, chunk, t.shape[-1]), 1, 0)
        for t in table
    )  # 4 x [n//chunk, 16, chunk, L]
    dig_chunks = jnp.moveaxis(
        digits.reshape(NWINDOWS, n // chunk, chunk), 1, 0
    )  # [n//chunk, NWINDOWS, chunk]
    acc, _ = jax.lax.scan(chunk_step, acc, (tab_chunks, dig_chunks))

    # reduce over the chunk lane (single-adder butterfly reduction)
    acc = ced.reduce_lanes(acc, axis=1)  # [NWINDOWS, L] per coord

    # Horner over windows, MSB first: acc1 = 16*acc1 + S_w
    def horner(carry, s_w):
        for _ in range(WINDOW):
            carry = ced.double(carry)
        carry = ced.add(carry, s_w)
        return carry, None

    out, _ = jax.lax.scan(horner, ced.identity(()), acc)
    return out


@functools.lru_cache(maxsize=None)
def _msm_kernel(n: int, chunk: int):
    return jax.jit(lambda points, digits: _msm_body(points, digits, n, chunk))


def _pow2_pad(n: int, chunk: int) -> int:
    """Pad batch sizes to powers of two so every protocol-level MSM size
    (commitments, per-round A/B, Pinocchio sums) lands on one of ~10 cached
    kernels instead of compiling per exact size."""
    target = max(chunk, 1 << (n - 1).bit_length())
    return target


def msm(points, scalars, chunk=DEFAULT_CHUNK) -> EdwardsPoint:
    """prod points[i] ** scalars[i] on TPU."""
    n = len(points)
    assert n == len(scalars)
    target = _pow2_pad(n, chunk)
    pad = target - n
    if pad:
        points = list(points) + [EdwardsPoint.identity] * pad
        scalars = list(scalars) + [0] * pad
    dev_pts = ced.encode_points(points)
    digits = jnp.asarray(_scalar_digits(scalars))
    out = _msm_kernel(target, min(chunk, target))(dev_pts, digits)
    return ced.decode_point(out)


def _fold_body(g_l, g_r, c_bits, n: int):
    """Unjitted fold body: g_l^c * g_r, bit-serial over the shared scalar."""
    ident = ced.identity((n,))

    def step(acc, bit):
        acc = ced.double(acc)
        acc = ced.add(acc, ced.select(jnp.broadcast_to(bit != 0, (n,)), g_l, ident))
        return acc, None

    acc, _ = jax.lax.scan(step, ident, c_bits)
    return ced.add(acc, g_r)


@functools.lru_cache(maxsize=None)
def _fold_kernel(n: int):
    return jax.jit(lambda g_l, g_r, c_bits: _fold_body(g_l, g_r, c_bits, n))


def fold(g_l, g_r, c: int) -> list:
    """[g_l[i]**c * g_r[i]] on TPU."""
    n = len(g_l)
    dev_l = ced.encode_points(g_l)
    dev_r = ced.encode_points(g_r)
    c_bits = jnp.asarray(_scalar_bits([c])[:, 0])
    out = _fold_kernel(n)(dev_l, dev_r, c_bits)
    return ced.decode_points(out)


@functools.lru_cache(maxsize=None)
def _batch_exp_kernel(n: int):
    def kernel(base_powers, bits):
        # base_powers: 4 x [NBITS, L] (2^b * G, MSB order); bits: [NBITS, n]
        ident = ced.identity((n,))

        def step(acc, inputs):
            g_b, bits_b = inputs  # 4 x [L], [n]
            bcast = tuple(jnp.broadcast_to(a[None], (n, a.shape[-1])) for a in g_b)
            acc = ced.add(acc, ced.select(bits_b != 0, bcast, ident))
            return acc, None

        acc, _ = jax.lax.scan(step, ident, (base_powers, bits))
        return acc

    return jax.jit(kernel)


def batch_exp(base: EdwardsPoint, exponents) -> list:
    """[base ** e for e in exponents] on TPU (fixed-base, shared powers)."""
    n = len(exponents)
    target = _pow2_pad(n, 1)
    exponents = list(exponents) + [0] * (target - n)
    powers = []
    acc = base
    for _ in range(NBITS):
        powers.append(acc)
        acc = acc + acc
    powers = powers[::-1]  # MSB order to match _scalar_bits
    dev_powers = ced.encode_points(powers)
    bits = jnp.asarray(_scalar_bits(exponents))
    out = _batch_exp_kernel(target)(dev_powers, bits)
    return ced.decode_points(out)[:n]


def register(min_batch: int = 512, chunk: int = DEFAULT_CHUNK):
    """Install the TPU kernels as the dispatch backends for Ed25519."""
    dispatch.register_msm_backend(
        EdwardsPoint, lambda pts, sc: msm(pts, sc, chunk=chunk), min_batch
    )
    dispatch.register_fold_backend(EdwardsPoint, fold, min_batch)
    dispatch.register_batch_exp_backend(
        EdwardsPoint, lambda base, exps: batch_exp(base, exps), min_batch
    )
