"""BN256 twist (G2) curve adapter for the fused Pallas MSM/fold kernels.

Extends the curve-generic machinery of ops/msm_pallas.py to the sextic
twist E': y^2 = x^3 + 3/xi over GF(p^2) (xi = i + 3, i^2 = -1), completing
TPU coverage of Pinocchio's key-generation and proof MSMs — the w-terms of
the evaluation key live on the twist (reference pynocchio.py:101-167,
demos/demo_zkp_pynocchio.py:27-42).

A G2 point is six limb-major rows (x0, x1, y0, y1, z0, z1): each GF(p^2)
coordinate is a (real, imag) pair of 16x16-bit Montgomery-domain limb
vectors.  GF(p^2) multiplication is Karatsuba over the base-field kernels
(3 Montgomery muls), squaring uses (a0+a1)(a0-a1) / 2*a0*a1 (2 muls).

Group law: complete projective a=0 short-Weierstrass formulas
(Renes-Costello-Batina 2015, Algorithms 7 and 9) over GF(p^2), same as the
G1 adapter (ops/bn_pallas.py) with field ops lifted to the extension.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..groups import bn256
from ..groups.bn256 import BNTwistPoint
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

_B3 = 3 * bn256.B2  # 3 * b' with b' = 3 / xi, in GF(p^2)
B3_0, B3_1 = int(_B3.c0), int(_B3.c1)


@functools.lru_cache(maxsize=None)
def _consts():
    def mont(v):
        return lm.int_to_scalar_limbs((v * R) % P)

    return {
        "p": lm.int_to_scalar_limbs(P),
        "np": lm.int_to_scalar_limbs((-pow(P, -1, R)) % R),
        "one": lm.int_to_scalar_limbs(ONE_MONT),
        "b3_0": mont(B3_0),
        "b3_1": mont(B3_1),
        "b3_01": mont((B3_0 + B3_1) % P),
    }


# --- GF(p^2) arithmetic on (real, imag) pairs of limb-major rows ----------


def _add2(a, b, k):
    return (lm.add_mod(a[0], b[0], k["p"]), lm.add_mod(a[1], b[1], k["p"]))


def _sub2(a, b, k):
    return (lm.sub_mod(a[0], b[0], k["p"]), lm.sub_mod(a[1], b[1], k["p"]))


def _mul2(a, b, k):
    """Karatsuba: 3 base-field Montgomery muls, i^2 = -1."""
    t0 = lm.mont_mul(a[0], b[0], k["p"], k["np"])
    t1 = lm.mont_mul(a[1], b[1], k["p"], k["np"])
    t2 = lm.mont_mul(
        lm.add_mod(a[0], a[1], k["p"]),
        lm.add_mod(b[0], b[1], k["p"]),
        k["p"],
        k["np"],
    )
    real = lm.sub_mod(t0, t1, k["p"])
    imag = lm.sub_mod(t2, lm.add_mod(t0, t1, k["p"]), k["p"])
    return (real, imag)


def _sq2(a, k):
    """(a0 + a1 i)^2 = (a0+a1)(a0-a1) + 2 a0 a1 i — 2 muls."""
    m1 = lm.mont_mul(
        lm.add_mod(a[0], a[1], k["p"]),
        lm.sub_mod(a[0], a[1], k["p"]),
        k["p"],
        k["np"],
    )
    m2 = lm.mont_mul(a[0], a[1], k["p"], k["np"])
    return (m1, lm.add_mod(m2, m2, k["p"]))


def _b3mul2(a, k):
    """a * (3b') with the constant's components precomputed (3 const-muls)."""
    t0 = lm.mont_mul_const(a[0], k["b3_0"], k["p"], k["np"])
    t1 = lm.mont_mul_const(a[1], k["b3_1"], k["p"], k["np"])
    t2 = lm.mont_mul_const(
        lm.add_mod(a[0], a[1], k["p"]), k["b3_01"], k["p"], k["np"]
    )
    real = lm.sub_mod(t0, t1, k["p"])
    imag = lm.sub_mod(t2, lm.add_mod(t0, t1, k["p"]), k["p"])
    return (real, imag)


def _pair(flat):
    """(x0, x1, y0, y1, z0, z1) -> three GF(p^2) pairs."""
    return (flat[0], flat[1]), (flat[2], flat[3]), (flat[4], flat[5])


def _flat(x, y, z):
    return (x[0], x[1], y[0], y[1], z[0], z[1])


def bn2_add_lm(p, q, k):
    """Complete projective addition over GF(p^2), RCB15 Algorithm 7."""
    x1, y1, z1 = _pair(p)
    x2, y2, z2 = _pair(q)
    t0 = _mul2(x1, x2, k)
    t1 = _mul2(y1, y2, k)
    t2 = _mul2(z1, z2, k)
    t3 = _sub2(
        _mul2(_add2(x1, y1, k), _add2(x2, y2, k), k), _add2(t0, t1, k), k
    )
    t4 = _sub2(
        _mul2(_add2(y1, z1, k), _add2(y2, z2, k), k), _add2(t1, t2, k), k
    )
    xz = _sub2(
        _mul2(_add2(x1, z1, k), _add2(x2, z2, k), k), _add2(t0, t2, k), k
    )
    t0 = _add2(_add2(t0, t0, k), t0, k)  # 3*x1x2
    t2 = _b3mul2(t2, k)
    z3 = _add2(t1, t2, k)
    t1 = _sub2(t1, t2, k)
    y3 = _b3mul2(xz, k)
    x_out = _sub2(_mul2(t3, t1, k), _mul2(t4, y3, k), k)
    y_out = _add2(_mul2(y3, t0, k), _mul2(t1, z3, k), k)
    z_out = _add2(_mul2(z3, t4, k), _mul2(t0, t3, k), k)
    return _flat(x_out, y_out, z_out)


def bn2_dbl_lm(p, k):
    """Complete projective doubling over GF(p^2), RCB15 Algorithm 9."""
    x, y, z = _pair(p)
    t0 = _sq2(y, k)
    z3 = _add2(t0, t0, k)
    z3 = _add2(z3, z3, k)
    z3 = _add2(z3, z3, k)
    t1 = _mul2(y, z, k)
    t2 = _b3mul2(_sq2(z, k), k)
    x3 = _mul2(t2, z3, k)
    y3 = _add2(t0, t2, k)
    z3 = _mul2(t1, z3, k)
    t1 = _add2(t2, t2, k)
    t2 = _add2(t1, t2, k)
    t0 = _sub2(t0, t2, k)
    y3 = _add2(x3, _mul2(t0, y3, k), k)
    t1 = _mul2(x, y, k)
    x3 = _mul2(t0, t1, k)
    x3 = _add2(x3, x3, k)
    return _flat(x3, y3, z3)


def _to_mont_rows(vals) -> jnp.ndarray:
    return jnp.asarray(
        lb.ints_to_limbs([(v * R) % P for v in vals]).astype(np.uint32)
    )


def _from_mont_ints(arr) -> list:
    return [(v * R_INV) % P for v in lb.limbs_to_ints(np.asarray(arr))]


class _Bn2Adapter:
    NC = 6  # (x0, x1, y0, y1, z0, z1) projective over GF(p^2)
    group_cls = BNTwistPoint
    order = ORDER
    name = "bn256_g2"

    consts = staticmethod(_consts)
    add = staticmethod(bn2_add_lm)
    dbl = staticmethod(bn2_dbl_lm)

    @staticmethod
    def identity(batch_shape, k):
        zero = lm.const_rows((0,) * L, batch_shape)
        one = lm.const_rows(k["one"], batch_shape)
        return (zero, zero, one, zero, zero, zero)

    @staticmethod
    def neg_where(mask, p, k):
        x0, x1, y0, y1, z0, z1 = p
        return (
            x0,
            x1,
            jnp.where(mask, lm.neg_mod(y0, k["p"]), y0),
            jnp.where(mask, lm.neg_mod(y1, k["p"]), y1),
            z0,
            z1,
        )

    @staticmethod
    def encode(points):
        """Jacobian host points -> projective Montgomery limb rows."""
        norm = BNTwistPoint.batch_normalize(points)
        comps = [[] for _ in range(6)]
        for pt in norm:
            if BNTwistPoint._is_identity(pt):
                vals = (0, 0, 1, 0, 0, 0)
            else:
                vals = (
                    int(pt.x.c0), int(pt.x.c1),
                    int(pt.y.c0), int(pt.y.c1),
                    1, 0,
                )
            for lst, v in zip(comps, vals):
                lst.append(v)
        return tuple(_to_mont_rows(c) for c in comps)

    @staticmethod
    def decode_many(dev):
        comps = [_from_mont_ints(a) for a in dev]
        out = []
        gf2 = bn256.GFp2
        for x0, x1, y0, y1, z0, z1 in zip(*comps):
            if z0 == 0 and z1 == 0:
                out.append(BNTwistPoint.identity)
            else:
                z = gf2(z0, z1)
                zi = z.reciprocal()
                out.append(
                    BNTwistPoint(
                        gf2(x0, x1) * zi, gf2(y0, y1) * zi, check=False
                    )
                )
        return out

    @staticmethod
    def decode_one(dev):
        return _Bn2Adapter.decode_many(
            tuple(a[None] if a.ndim == 1 else a for a in dev)
        )[0]


BN2 = _Bn2Adapter()


def msm(points, scalars, chunk: int = 128, sub: int = 8,
        interpret: bool | None = None) -> BNTwistPoint:
    """prod points[i] ** scalars[i] on the BN256 twist (fused Pallas)."""
    return mp._msm_generic(BN2, points, scalars, chunk, sub, interpret)


def fold(g_l, g_r, c: int, chunk: int = 128, sub: int = 8,
         interpret: bool | None = None) -> list:
    """[g_l[i]**c * g_r[i]] on the BN256 twist (fused Pallas)."""
    return mp._fold_generic(BN2, g_l, g_r, c, chunk, sub, interpret)


def batch_exp(base, exponents, chunk: int = 128, sub: int = 8,
              interpret: bool | None = None) -> list:
    """[base ** e for e in exponents] on the BN256 twist (fused Pallas)."""
    return mp._batch_exp_generic(BN2, base, exponents, chunk, sub, interpret)


def register(min_batch: int = 512, chunk: int = 128):
    """Install the fused kernels as the BN256-twist dispatch backends."""
    dispatch.register_msm_backend(
        BNTwistPoint, lambda pts, sc: msm(pts, sc, chunk=chunk), min_batch
    )
    dispatch.register_fold_backend(
        BNTwistPoint, lambda gl, gr, c: fold(gl, gr, c, chunk=chunk), min_batch
    )
    dispatch.register_batch_exp_backend(
        BNTwistPoint, lambda b, e: batch_exp(b, e, chunk=chunk), min_batch
    )
