"""BN256 pairing-friendly curve and its sextic twist (jacobian coordinates).

Parameter parity with the reference's BN256 usage
(/root/reference/verifiable_mpc/ac20/pairing.py:51-53 defines
v=1868033, u=v^3, p=36u^4+36u^3+24u^2+6u+1; the dclxvi/"bn256" curve):

    E : y^2 = x^3 + 3           over GF(p),   generator (1, -2)
    E': y^2 = x^3 + 3/xi        over GF(p^2), xi = i + 3

Group order n = 36u^4+36u^3+18u^2+6u+1 (prime).  The twist generator is
derived deterministically (smallest x = c + i with a square RHS, cofactor
2p - n cleared); it need not coincide with any other library's constant —
all protocol transcripts are internally consistent.
"""

from __future__ import annotations

from ..fields import GF, GF2
from .base import FiniteGroupElement

V = 1868033
U = V**3
P = 36 * U**4 + 36 * U**3 + 24 * U**2 + 6 * U + 1
ORDER = 36 * U**4 + 36 * U**3 + 18 * U**2 + 6 * U + 1  # prime group order
TRACE = 6 * U**2 + 1  # t, with #E(GF(p)) = p + 1 - t = ORDER

GFp = GF(P)
GFp.is_signed = False  # coordinates print as 0..p-1 in transcripts
GFp2 = GF2(P)

XI = GFp2(3, 1)  # i + 3
B = GFp(3)
B2 = GFp2(3, 0) / XI  # twist coefficient b' = b / xi


class _WeierstrassJacobian(FiniteGroupElement):
    """Shared jacobian-coordinate group law; coords are field elements."""

    __slots__ = ("x", "y", "z")

    b = None  # curve coefficient
    coord_field = None

    def __init__(self, x, y, z=1, check=True):
        f = type(self).coord_field
        self.x = x if isinstance(x, f) else f(x)
        self.y = y if isinstance(y, f) else f(y)
        self.z = z if isinstance(z, f) else f(z)

    @classmethod
    def _is_identity(cls, p):
        return not bool(p.z)

    @classmethod
    def _op(cls, p1, p2):
        if cls._is_identity(p1):
            return p2
        if cls._is_identity(p2):
            return p1
        z1z1 = p1.z * p1.z
        z2z2 = p2.z * p2.z
        u1 = p1.x * z2z2
        u2 = p2.x * z1z1
        s1 = p1.y * p2.z * z2z2
        s2 = p2.y * p1.z * z1z1
        if u1 == u2:
            if s1 == s2:
                return cls._double(p1)
            return cls.identity
        h = u2 - u1
        i = (h + h) ** 2
        j = h * i
        r = (s2 - s1) + (s2 - s1)
        v = u1 * i
        x3 = r * r - j - v - v
        y3 = r * (v - x3) - (s1 * j + s1 * j)
        z3 = ((p1.z + p2.z) ** 2 - z1z1 - z2z2) * h
        return cls(x3, y3, z3, check=False)

    @classmethod
    def _double(cls, p):
        if cls._is_identity(p):
            return p
        a = p.x * p.x
        b = p.y * p.y
        c = b * b
        d = (p.x + b) ** 2 - a - c
        d = d + d
        e = a + a + a
        f = e * e
        x3 = f - d - d
        c8 = c + c
        c8 = c8 + c8
        c8 = c8 + c8
        y3 = e * (d - x3) - c8
        z3 = p.y * p.z
        z3 = z3 + z3
        return cls(x3, y3, z3, check=False)

    @classmethod
    def _inv(cls, p):
        return cls(p.x, -p.y, p.z, check=False)

    @classmethod
    def _scalar_mul(cls, a, k: int):
        k %= cls.order
        result = cls.identity
        base = a
        while k:
            if k & 1:
                result = cls._op(result, base)
            base = cls._double(base)
            k >>= 1
        return result

    # -- additive notation -------------------------------------------------
    def __add__(self, other):
        if isinstance(other, type(self)):
            return type(self)._op(self, other)
        return NotImplemented

    def __sub__(self, other):
        if isinstance(other, type(self)):
            return type(self)._op(self, type(self)._inv(other))
        return NotImplemented

    def __neg__(self):
        return type(self)._inv(self)

    # -- normalization / comparison / transcripts --------------------------
    def normalize(self):
        cls = type(self)
        if cls._is_identity(self):
            return cls.identity
        zinv = self.z.reciprocal()
        zinv2 = zinv * zinv
        return cls(self.x * zinv2, self.y * zinv2 * zinv, cls.coord_field(1), check=False)

    @classmethod
    def batch_normalize(cls, points):
        # batched z-inversion (Montgomery's trick), field-generic so it
        # covers both GFp (G1) and GFp2 (twist) coordinates
        one = cls.coord_field(1)
        n = len(points)
        idx = [i for i, p in enumerate(points) if not cls._is_identity(p)]
        prefix = [one] * (len(idx) + 1)
        for j, i in enumerate(idx):
            prefix[j + 1] = prefix[j] * points[i].z
        inv = prefix[-1].reciprocal()
        out = [cls.identity] * n
        for j in range(len(idx) - 1, -1, -1):
            i = idx[j]
            zinv = prefix[j] * inv
            inv = inv * points[i].z
            zinv2 = zinv * zinv
            out[i] = cls(
                points[i].x * zinv2,
                points[i].y * zinv2 * zinv,
                one,
                check=False,
            )
        return out

    def affine(self):
        n = self.normalize()
        return (n.x, n.y)

    def __eq__(self, other):
        if not isinstance(other, type(self)):
            return NotImplemented
        cls = type(self)
        if cls._is_identity(self) or cls._is_identity(other):
            return cls._is_identity(self) and cls._is_identity(other)
        z1z1 = self.z * self.z
        z2z2 = other.z * other.z
        return (
            self.x * z2z2 == other.x * z1z1
            and self.y * other.z * z2z2 == other.y * self.z * z1z1
        )

    def __hash__(self):
        n = self.normalize()
        return hash((type(self).curvename, repr(n.x), repr(n.y)))

    def __repr__(self):
        return f"({self.x}, {self.y}, {self.z})"

    def is_on_curve(self):
        if type(self)._is_identity(self):
            return True
        x, y = self.affine()
        return y * y == x * x * x + type(self).b


class BNPoint(_WeierstrassJacobian):
    __slots__ = ()
    order = ORDER
    field = GFp
    coord_field = GFp
    b = B
    curvename = "BN256"
    is_scalar_mul_by_star = True


class BNTwistPoint(_WeierstrassJacobian):
    __slots__ = ()
    order = ORDER
    field = GFp2
    coord_field = GFp2
    b = B2
    curvename = "BN256_twist"
    is_scalar_mul_by_star = True


BNPoint.identity = BNPoint(1, 1, 0, check=False)
BNPoint.generator = BNPoint(GFp(1), GFp(P - 2))

BNTwistPoint.identity = BNTwistPoint(GFp2(1), GFp2(1), GFp2(0), check=False)


def _raw_mul(a, k):
    """Double-and-add without reducing k mod the subgroup order."""
    cls = type(a)
    result = cls.identity
    base = a
    while k:
        if k & 1:
            result = cls._op(result, base)
        base = cls._double(base)
        k >>= 1
    return result


def _derive_twist_generator():
    cofactor = 2 * P - ORDER  # #E'(GF(p^2)) = n * (2p - n)
    c = 0
    while True:
        x = GFp2(c, 1)
        rhs = x * x * x + B2
        if rhs.is_sqr():
            pt = BNTwistPoint(x, rhs.sqrt())
            g2 = _raw_mul(pt, cofactor)
            if not BNTwistPoint._is_identity(g2) and BNTwistPoint._is_identity(
                _raw_mul(g2, ORDER)
            ):
                return g2.normalize()
        c += 1


BNTwistPoint.generator = _derive_twist_generator()
