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


def _scalar_bits(scalars, nbits=NBITS) -> np.ndarray:
    """[N] ints -> [nbits, N] uint32 bit planes, MSB first."""
    arr = lb.ints_to_limbs([s % ELL for s in scalars]).astype(np.uint16)
    bytes_view = arr.view(np.uint8).reshape(len(scalars), -1)
    bits = np.unpackbits(bytes_view, axis=1, bitorder="little")  # [N, 256]
    bits = bits[:, :nbits][:, ::-1]  # MSB first
    return np.ascontiguousarray(bits.T).astype(np.uint32)


def _msm_body(points, bits, n: int, chunk: int):
    """Unjitted MSM body (also the per-device body of the sharded MSM)."""
    assert n % chunk == 0
    acc = ced.identity((NBITS, chunk))
    ident = ced.identity((NBITS, chunk))

    def chunk_step(acc, inputs):
        pts_c, bits_c = inputs  # pts_c: 4 x [chunk, L]; bits_c: [NBITS, chunk]
        bcast = tuple(
            jnp.broadcast_to(a[None], (NBITS, chunk, a.shape[-1])) for a in pts_c
        )
        sel = ced.select(bits_c != 0, bcast, ident)
        return ced.add(acc, sel), None

    pts_chunks = tuple(a.reshape(n // chunk, chunk, a.shape[-1]) for a in points)
    bits_chunks = jnp.moveaxis(
        bits.reshape(NBITS, n // chunk, chunk), 1, 0
    )  # [n//chunk, NBITS, chunk]
    acc, _ = jax.lax.scan(chunk_step, acc, (pts_chunks, bits_chunks))

    # reduce over the chunk lane (single-adder butterfly reduction)
    acc = ced.reduce_lanes(acc, axis=1)  # [NBITS, L] per coord

    # Horner over bit planes, MSB first: acc1 = 2*acc1 + S_b
    def horner(carry, s_b):
        carry = ced.double(carry)
        carry = ced.add(carry, s_b)
        return carry, None

    out, _ = jax.lax.scan(horner, ced.identity(()), acc)
    return out


@functools.lru_cache(maxsize=None)
def _msm_kernel(n: int, chunk: int):
    return jax.jit(lambda points, bits: _msm_body(points, bits, n, chunk))


def msm(points, scalars, chunk=DEFAULT_CHUNK) -> EdwardsPoint:
    """prod points[i] ** scalars[i] on TPU."""
    n = len(points)
    assert n == len(scalars)
    pad = (-n) % chunk
    if pad:
        points = list(points) + [EdwardsPoint.identity] * pad
        scalars = list(scalars) + [0] * pad
    dev_pts = ced.encode_points(points)
    bits = jnp.asarray(_scalar_bits(scalars))
    out = _msm_kernel(n + pad, min(chunk, n + pad))(dev_pts, bits)
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
    powers = []
    acc = base
    for _ in range(NBITS):
        powers.append(acc)
        acc = acc + acc
    powers = powers[::-1]  # MSB order to match _scalar_bits
    dev_powers = ced.encode_points(powers)
    bits = jnp.asarray(_scalar_bits(exponents))
    out = _batch_exp_kernel(n)(dev_powers, bits)
    return ced.decode_points(out)


def register(min_batch: int = 512):
    """Install the TPU kernels as the dispatch backends for Ed25519."""
    dispatch.register_msm_backend(EdwardsPoint, msm, min_batch)
    dispatch.register_fold_backend(EdwardsPoint, fold, min_batch)
    dispatch.register_batch_exp_backend(
        EdwardsPoint, lambda base, exps: batch_exp(base, exps), min_batch
    )
