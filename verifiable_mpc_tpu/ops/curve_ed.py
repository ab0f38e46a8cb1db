"""Batched Ed25519 point arithmetic on TPU (extended twisted Edwards).

Points are struct-of-arrays: four limb tensors (X, Y, Z, T), each [..., 16]
uint32 in the Montgomery domain of GF(2^255 - 19).  The unified
add-2008-hwcd-3 formulas are complete on the prime-order subgroup, so there
is no data-dependent control flow anywhere — identity, doubling and general
addition all take the same vectorized path (the property that makes Edwards
the right curve for SIMD/vector hardware; SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..groups.edwards import D, P as ED_P, EdwardsPoint
from . import limbs as lb

CTX = None  # initialized lazily to keep jax import cost off the module path


def ctx():
    global CTX
    if CTX is None:
        CTX = lb.mont_ctx(ED_P)
        # host-side Montgomery encoding: device ops here would leak tracers
        # if ctx() is first touched inside a jit trace
        CTX.two_d_mont = lb.int_to_limbs(2 * D * CTX.R % ED_P)
    return CTX


def identity(batch_shape=()):
    """(0 : 1 : 1 : 0) in Montgomery limbs, broadcast to batch_shape."""
    c = ctx()
    zero = jnp.broadcast_to(c.zero, batch_shape + (c.limbs,))
    one = jnp.broadcast_to(c.one_mont, batch_shape + (c.limbs,))
    return (zero, one, one, zero)


def add_with_constants(p, q, p_limbs, n_prime_limbs, two_d_mont):
    """Unified addition (add-2008-hwcd-3) parameterized by the field
    constants — the form used inside Pallas kernels."""

    def mul(a, b):
        return lb.mont_mul(a, b, p_limbs, n_prime_limbs)

    def add_(a, b):
        return lb.add_mod(a, b, p_limbs)

    def sub_(a, b):
        return lb.sub_mod(a, b, p_limbs)

    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    a = mul(sub_(y1, x1), sub_(y2, x2))
    b = mul(add_(y1, x1), add_(y2, x2))
    cc = mul(mul(t1, jnp.broadcast_to(two_d_mont, t1.shape)), t2)
    d = mul(add_(z1, z1), z2)
    e = sub_(b, a)
    f = sub_(d, cc)
    g = add_(d, cc)
    h = add_(b, a)
    return (mul(e, f), mul(g, h), mul(f, g), mul(e, h))


def add(p, q):
    """Unified addition (add-2008-hwcd-3): 9 modmuls, complete."""
    c = ctx()
    return add_with_constants(p, q, c.p_limbs, c.n_prime_limbs, c.two_d_mont)


def double(p):
    return add(p, p)


def select(mask, p, q):
    """mask ? p : q, elementwise over the batch dims (mask: [...])."""
    m = mask[..., None]
    return tuple(jnp.where(m, a, b) for a, b in zip(p, q))


def negate(p):
    c = ctx()
    x, y, z, t = p
    return (c.neg(x), y, z, c.neg(t))


def reduce_lanes(p, axis=0):
    """Sum (group op) a power-of-two lane dimension down to one point.

    Butterfly all-reduce via rotations inside a scan — a single adder in the
    traced graph regardless of the lane count (keeps XLA compile time flat).
    """
    import numpy as np
    import jax

    n = p[0].shape[axis]
    assert n & (n - 1) == 0, "lane count must be a power of two"
    if n == 1:
        return tuple(jnp.take(a, 0, axis=axis) for a in p)
    shifts = jnp.asarray([1 << k for k in range(int(np.log2(n)))], jnp.int32)

    def step(acc, shift):
        rolled = tuple(jnp.roll(a, shift, axis=axis) for a in acc)
        return add(acc, rolled), None

    acc, _ = jax.lax.scan(step, p, shifts)
    return tuple(jnp.take(a, 0, axis=axis) for a in acc)


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------


def encode_points(points) -> tuple:
    """List of EdwardsPoint -> Montgomery limb tensors ([n, 16] each)."""
    c = ctx()
    xs, ys, zs, ts = [], [], [], []
    for pt in points:
        xs.append(pt.x)
        ys.append(pt.y)
        zs.append(pt.z)
        ts.append(pt.t)
    to_mont = c._jit("to_mont", c.to_mont)

    def enc(vals):
        return to_mont(jnp.asarray(lb.ints_to_limbs(vals)))
    return (enc(xs), enc(ys), enc(zs), enc(ts))


def decode_points(dev) -> list:
    """Montgomery limb tensors -> list of EdwardsPoint."""
    c = ctx()
    from_mont = c._jit("from_mont", c.from_mont)
    coords = [lb.limbs_to_ints(np.asarray(from_mont(a))) for a in dev]
    out = []
    for x, y, z, t in zip(*coords):
        out.append(EdwardsPoint(x, y, z, t))
    return out


def decode_point(dev) -> EdwardsPoint:
    return decode_points(tuple(a[None] if a.ndim == 1 else a for a in dev))[0]


# --- plain (non-Montgomery) boundary for the pseudo-Mersenne Pallas path ---


def encode_points_plain(points) -> tuple:
    """List of EdwardsPoint -> plain limb tensors ([n, 16] each).

    No device-side Montgomery conversion: the fused Pallas kernels run
    directly on plain residues with x38 pseudo-Mersenne folding
    (ops/limbs_lm.py reduce25519), so encoding is one host conversion."""
    xs, ys, zs, ts = [], [], [], []
    for pt in points:
        xs.append(pt.x)
        ys.append(pt.y)
        zs.append(pt.z)
        ts.append(pt.t)
    from .. import native

    if native.fastser() is not None:
        # C bigint conversion + little-endian u16 reinterpret: one pass
        # instead of a per-int to_bytes loop (1.5 s per 2^18-point encode)
        return tuple(
            jnp.asarray(
                native._ints_to_u64x4(v, ED_P)
                .view(np.uint16)
                .astype(np.uint32)
            )
            for v in (xs, ys, zs, ts)
        )
    return tuple(jnp.asarray(lb.ints_to_limbs(v)) for v in (xs, ys, zs, ts))


def decode_points_plain(dev) -> list:
    """Plain limb tensors (relaxed: values < 2^256) -> list of EdwardsPoint."""
    coords = [lb.limbs_to_ints(np.asarray(a)) for a in dev]
    return [
        EdwardsPoint(x % ED_P, y % ED_P, z % ED_P, t % ED_P)
        for x, y, z, t in zip(*coords)
    ]


def decode_point_plain(dev) -> EdwardsPoint:
    return decode_points_plain(
        tuple(a[None] if a.ndim == 1 else a for a in dev)
    )[0]
