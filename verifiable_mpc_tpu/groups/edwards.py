"""Ed25519 prime-order subgroup in extended twisted Edwards coordinates.

Capability parity with ``EllipticCurve('Ed25519', 'projective')`` from
``mpyc.fingroups`` as used by the reference demos
(/root/reference/demos/demo_zkp_ac20.py:46).  The group exposed to the
protocols is the prime-order subgroup (order ``ELL``); commitments and
Fiat-Shamir transcripts use normalized affine coordinates.

TPU note: host scalar multiplication here is the correctness path for small
vectors; bulk MSM is dispatched to :mod:`verifiable_mpc_tpu.ops.msm`.
"""

from __future__ import annotations

import functools

from ..fields import GF
from .base import FiniteGroupElement

P = 2**255 - 19
ELL = 2**252 + 27742317777372353535851937790883648493  # subgroup order
D = (-121665 * pow(121666, -1, P)) % P
TWO_D = 2 * D % P

BASE_Y = 4 * pow(5, -1, P) % P
BASE_X = 15112221349535400772501151409588531511454012693041857206046113283949847762202


class EdwardsPoint(FiniteGroupElement):
    """Point on -x^2 + y^2 = 1 + d x^2 y^2 (extended coordinates X:Y:Z:T)."""

    __slots__ = ("x", "y", "z", "t")

    order = ELL
    field = GF(P)
    curvename = "Ed25519"
    is_scalar_mul_by_star = True

    def __init__(self, x, y, z=1, t=None):
        self.x = x % P
        self.y = y % P
        self.z = z % P
        if t is None:
            zinv = pow(self.z, -1, P)
            t = self.x * self.y * zinv % P
        self.t = t % P

    # -- group law (unified, complete for a = -1 twisted Edwards) ----------
    @classmethod
    def _op(cls, p1, p2):
        # add-2008-hwcd-3
        a = (p1.y - p1.x) * (p2.y - p2.x) % P
        b = (p1.y + p1.x) * (p2.y + p2.x) % P
        c = p1.t * TWO_D % P * p2.t % P
        d = 2 * p1.z * p2.z % P
        e = b - a
        f = d - c
        g = d + c
        h = b + a
        return cls(e * f % P, g * h % P, f * g % P, e * h % P)

    @classmethod
    def _inv(cls, p1):
        return cls(-p1.x % P, p1.y, p1.z, -p1.t % P)

    @classmethod
    def _scalar_mul(cls, a, k: int):
        k %= cls.order
        result = _IDENTITY
        base = a
        while k:
            if k & 1:
                result = cls._op(result, base)
            base = cls._op(base, base)
            k >>= 1
        return result

    # -- additive notation (Pinocchio style) -------------------------------
    def __add__(self, other):
        if isinstance(other, EdwardsPoint):
            return type(self)._op(self, other)
        return NotImplemented

    def __sub__(self, other):
        if isinstance(other, EdwardsPoint):
            return type(self)._op(self, type(self)._inv(other))
        return NotImplemented

    def __neg__(self):
        return type(self)._inv(self)

    # -- normalization / comparison / transcripts --------------------------
    def normalize(self):
        zinv = pow(self.z, -1, P)
        x = self.x * zinv % P
        y = self.y * zinv % P
        return type(self)(x, y, 1, x * y % P)

    @classmethod
    def batch_normalize(cls, points):
        # one modular inverse for the whole vector (Montgomery's trick);
        # z is never 0 on the complete Edwards addition law
        n = len(points)
        prefix = [1] * (n + 1)
        for i, p in enumerate(points):
            prefix[i + 1] = prefix[i] * p.z % P
        inv = pow(prefix[n], -1, P)
        out = [None] * n
        for i in range(n - 1, -1, -1):
            zinv = prefix[i] * inv % P
            inv = inv * points[i].z % P
            x = points[i].x * zinv % P
            y = points[i].y * zinv % P
            out[i] = cls(x, y, 1, x * y % P)
        return out

    def affine(self):
        n = self.normalize()
        return (n.x, n.y)

    def __eq__(self, other):
        if not isinstance(other, EdwardsPoint):
            return NotImplemented
        # cross-multiplied projective comparison
        return (
            self.x * other.z % P == other.x * self.z % P
            and self.y * other.z % P == other.y * self.z % P
        )

    def __hash__(self):
        return hash(("Ed25519",) + self.affine())

    def __repr__(self):
        return f"({self.x}, {self.y}, {self.z})"

    def is_on_curve(self):
        x, y = self.affine()
        return (-x * x + y * y) % P == (1 + D * x * x % P * y * y) % P


_IDENTITY = EdwardsPoint(0, 1, 1, 0)
EdwardsPoint.identity = _IDENTITY
EdwardsPoint.generator = EdwardsPoint(BASE_X, BASE_Y)


@functools.lru_cache(maxsize=None)
def edwards_group(curvename="Ed25519", coordinates="projective"):
    """Return the Ed25519 group class (coordinates arg kept for API parity)."""
    if curvename != "Ed25519":
        raise ValueError(f"unsupported Edwards curve {curvename}")
    return EdwardsPoint
