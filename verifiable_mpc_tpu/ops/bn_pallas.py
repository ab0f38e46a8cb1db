"""BN256 G1 curve adapter for the fused Pallas MSM/fold kernels.

Extends the limb-major machinery of ops/msm_pallas.py to the BN256 pairing
curve's G1 (y^2 = x^3 + 3 over GF(p), p 254-bit) so that Pinocchio's eight
proof MSMs and its key generation (reference pynocchio.py:228-273, :101-200)
can run on TPU instead of the native C++ host tier.

Group law: COMPLETE projective a=0 short-Weierstrass formulas
(Renes-Costello-Batina 2015, Algorithms 7 and 9) — branch-free, identity-
safe, exactly what a lane-parallel kernel needs (the host tier's jacobian
formulas branch on Z=0 / P==Q, groups/bn256.py:56-80).  Host points are
jacobian; encode normalizes to affine (Montgomery-batched) and lifts to
projective (X, Y, 1); identity encodes as (0, 1, 0).

The twist group (coordinates in GF(p^2)) stays on the native host tier —
its MSMs in Pinocchio keygen are one of eight key components and the limb
cost quadruples; see docs/ROADMAP.md.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..groups import bn256
from ..groups.bn256 import BNPoint
from . import dispatch
from . import limbs as lb
from . import limbs_lm as lm
from . import msm_pallas as mp

L = mp.L
P = int(bn256.P)
ORDER = int(bn256.ORDER)
R = 1 << 256
R_INV = pow(R, -1, P)
ONE_MONT = R % P
B3_MONT = (9 * R) % P  # 3*b with b = 3
N_PRIME = (-pow(P, -1, R)) % R  # REDC constant: -p^-1 mod 2^256


@functools.lru_cache(maxsize=None)
def _consts():
    return {
        "p": lm.int_to_scalar_limbs(P),
        "np": lm.int_to_scalar_limbs(N_PRIME),
        "b3": lm.int_to_scalar_limbs(B3_MONT),
        "one": lm.int_to_scalar_limbs(ONE_MONT),
    }


def bn_add_lm(p, q, k):
    """Complete projective addition, RCB15 Algorithm 7 (a=0, 12M + 2mb3)."""

    def mul(a, b):
        return lm.mont_mul(a, b, k["p"], k["np"])

    def b3mul(a):
        return lm.mont_mul_const(a, k["b3"], k["p"], k["np"])

    def add_(a, b):
        return lm.add_mod(a, b, k["p"])

    def sub_(a, b):
        return lm.sub_mod(a, b, k["p"])

    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = sub_(mul(add_(x1, y1), add_(x2, y2)), add_(t0, t1))  # x1y2+x2y1
    t4 = sub_(mul(add_(y1, z1), add_(y2, z2)), add_(t1, t2))  # y1z2+y2z1
    xz = sub_(mul(add_(x1, z1), add_(x2, z2)), add_(t0, t2))  # x1z2+x2z1
    t0 = add_(add_(t0, t0), t0)  # 3*x1x2
    t2 = b3mul(t2)  # b3*z1z2
    z3 = add_(t1, t2)
    t1 = sub_(t1, t2)
    y3 = b3mul(xz)  # b3*(x1z2+x2z1)
    x_out = sub_(mul(t3, t1), mul(t4, y3))
    y_out = add_(mul(y3, t0), mul(t1, z3))
    z_out = add_(mul(z3, t4), mul(t0, t3))
    return (x_out, y_out, z_out)


def bn_dbl_lm(p, k):
    """Complete projective doubling, RCB15 Algorithm 9 (a=0, 6M+2S + 1mb3)."""

    def mul(a, b):
        return lm.mont_mul(a, b, k["p"], k["np"])

    def sq(a):
        return lm.mont_sq(a, k["p"], k["np"])

    def b3mul(a):
        return lm.mont_mul_const(a, k["b3"], k["p"], k["np"])

    def add_(a, b):
        return lm.add_mod(a, b, k["p"])

    x, y, z = p
    t0 = sq(y)
    z3 = add_(t0, t0)
    z3 = add_(z3, z3)
    z3 = add_(z3, z3)  # 8*y^2
    t1 = mul(y, z)
    t2 = b3mul(sq(z))  # b3*z^2
    x3 = mul(t2, z3)
    y3 = add_(t0, t2)
    z3 = mul(t1, z3)
    t1 = add_(t2, t2)
    t2 = add_(t1, t2)  # 3*b3*z^2
    t0 = lm.sub_mod(t0, t2, k["p"])  # y^2 - 3*b3*z^2
    y3 = add_(x3, mul(t0, y3))
    t1 = mul(x, y)
    x3 = mul(t0, t1)
    x3 = add_(x3, x3)
    return (x3, y3, z3)


def _to_mont_rows(vals) -> jnp.ndarray:
    """Host ints -> [n, L] uint32 Montgomery-domain limbs."""
    return jnp.asarray(
        lb.ints_to_limbs([(v * R) % P for v in vals]).astype(np.uint32)
    )


def _from_mont_ints(arr) -> list:
    """[n, L] uint32 Montgomery limbs -> host ints."""
    return [(v * R_INV) % P for v in lb.limbs_to_ints(np.asarray(arr))]


class _BnAdapter:
    NC = 3  # X, Y, Z projective
    group_cls = BNPoint
    order = ORDER
    name = "bn256_g1"

    consts = staticmethod(_consts)
    add = staticmethod(bn_add_lm)
    dbl = staticmethod(bn_dbl_lm)

    @staticmethod
    def identity(batch_shape, k):
        zero = lm.const_rows((0,) * L, batch_shape)
        one = lm.const_rows(k["one"], batch_shape)
        return (zero, one, zero)

    @staticmethod
    def neg_where(mask, p, k):
        """-(X, Y, Z) = (X, -Y, Z) where mask (broadcast [1,*B])."""
        x, y, z = p
        return (x, jnp.where(mask, lm.neg_mod(y, k["p"]), y), z)

    @staticmethod
    def encode(points):
        """Jacobian host points -> projective (X, Y, 1) Montgomery limbs."""
        norm = BNPoint.batch_normalize(points)
        xs, ys, zs = [], [], []
        for pt in norm:
            if BNPoint._is_identity(pt):
                xs.append(0)
                ys.append(1)
                zs.append(0)
            else:
                xs.append(int(pt.x))
                ys.append(int(pt.y))
                zs.append(1)
        return (_to_mont_rows(xs), _to_mont_rows(ys), _to_mont_rows(zs))

    @staticmethod
    def decode_many(dev):
        coords = [_from_mont_ints(a) for a in dev]
        out = []
        for x, y, z in zip(*coords):
            if z == 0:
                out.append(BNPoint.identity)
            else:
                zi = pow(z, -1, P)
                out.append(
                    BNPoint(
                        bn256.GFp(x * zi % P),
                        bn256.GFp(y * zi % P),
                        check=False,
                    )
                )
        return out

    @staticmethod
    def decode_one(dev):
        return _BnAdapter.decode_many(
            tuple(a[None] if a.ndim == 1 else a for a in dev)
        )[0]


BN = _BnAdapter()


def msm(points, scalars, chunk: int = 128, sub: int = 8,
        interpret: bool | None = None) -> BNPoint:
    """prod points[i] ** scalars[i] on BN256 G1 via the fused Pallas kernel."""
    return mp._msm_generic(BN, points, scalars, chunk, sub, interpret)


def fold(g_l, g_r, c: int, chunk: int = 128, sub: int = 8,
         interpret: bool | None = None) -> list:
    """[g_l[i]**c * g_r[i]] on BN256 G1 via the fused Pallas kernel."""
    return mp._fold_generic(BN, g_l, g_r, c, chunk, sub, interpret)


def batch_exp(base, exponents, chunk: int = 128, sub: int = 8,
              interpret: bool | None = None) -> list:
    """[base ** e for e in exponents] on BN256 G1 via the fused kernel."""
    return mp._batch_exp_generic(BN, base, exponents, chunk, sub, interpret)


def batch_exp_comb(base, exponents, chunk: int = 128, sub: int = 8,
                   interpret: bool | None = None) -> list:
    """[base ** e] via the fixed-base comb kernel (no doubling ladder)."""
    return mp._batch_exp_comb_generic(BN, base, exponents, chunk, sub,
                                      interpret)


def register(min_batch: int = 512, chunk: int = 128):
    """Install the fused kernels as the BN256-G1 dispatch backends."""
    dispatch.register_msm_backend(
        BNPoint, lambda pts, sc: msm(pts, sc, chunk=chunk), min_batch
    )
    dispatch.register_fold_backend(
        BNPoint, lambda gl, gr, c: fold(gl, gr, c, chunk=chunk), min_batch
    )
    dispatch.register_batch_exp_backend(
        BNPoint, lambda b, e: batch_exp_comb(b, e, chunk=chunk), min_batch
    )
