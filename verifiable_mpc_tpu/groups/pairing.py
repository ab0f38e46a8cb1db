"""Optimal ate pairing on BN256.

Capability parity with reference /root/reference/verifiable_mpc/ac20/pairing.py
(GFp6/GFp12 tower :103-371, NAF Miller loop :503-554, final exponentiation
:557-611, ``optimal_ate`` :614-645), built on this package's own field and
curve classes.  Standard algorithms from Beuchat et al. (eprint 2010/354) and
the dclxvi line-function form.

Tower: GFp2 = GFp[i]/(i^2+1); GFp6 = GFp2[tau]/(tau^3 - xi), xi = i + 3;
GFp12 = GFp6[omega]/(omega^2 - tau).  A GFp6 element (x, y, z) denotes
x*tau^2 + y*tau + z.

Pairing verification is low-throughput (11 pairings per Pinocchio verify,
reference pynocchio.py:276-325), so this stays a host implementation.
"""

from __future__ import annotations

from .bn256 import GFp2, P, U, BNPoint, BNTwistPoint

XI = GFp2(3, 1)  # i + 3

# Frobenius constants xi^{j*(p-1)/6}
XI1 = [XI ** (j * (P - 1) // 6) for j in range(1, 6)]
XI1 = [None] + XI1  # 1-indexed like the literature
XI2 = [None] + [x * x.conjugate() for x in XI1[1:]]

_ZERO2 = GFp2(0, 0)
_ONE2 = GFp2(1, 0)


def _to_naf(x: int):
    z = []
    while x > 0:
        if x % 2 == 0:
            z.append(0)
        else:
            zi = 2 - (x % 4)
            x -= zi
            z.append(zi)
        x //= 2
    return z


NAF_6U2 = list(reversed(_to_naf(6 * U + 2)))[1:]


class GFp6:
    __slots__ = ("x", "y", "z")

    def __init__(self, x, y, z):
        self.x, self.y, self.z = x, y, z

    def __eq__(self, other):
        return self.x == other.x and self.y == other.y and self.z == other.z

    def __repr__(self):
        return f"({self.x},{self.y},{self.z})"

    def __add__(a, b):
        return GFp6(a.x + b.x, a.y + b.y, a.z + b.z)

    def __sub__(a, b):
        return GFp6(a.x - b.x, a.y - b.y, a.z - b.z)

    def __neg__(a):
        return GFp6(-a.x, -a.y, -a.z)

    def double(a):
        return GFp6(a.x + a.x, a.y + a.y, a.z + a.z)

    def __mul__(a, b):
        # Karatsuba-style interpolation (eprint 2010/354, Alg. 13)
        t0 = a.z * b.z
        t1 = a.y * b.y
        t2 = a.x * b.x
        tz = ((a.x + a.y) * (b.x + b.y) - t1 - t2) * XI + t0
        ty = (a.y + a.z) * (b.y + b.z) - t0 - t1 + t2 * XI
        tx = (a.x + a.z) * (b.x + b.z) - t0 + t1 - t2
        return GFp6(tx, ty, tz)

    def mul_scalar(self, k):
        return GFp6(self.x * k, self.y * k, self.z * k)

    def mul_tau(a):
        return GFp6(a.y, a.z, a.x * XI)

    def square(a):
        return a * a

    def inverse(a):
        # eprint 2010/354, Alg. 17
        XX = a.x * a.x
        YY = a.y * a.y
        ZZ = a.z * a.z
        XY = a.x * a.y
        XZ = a.x * a.z
        YZ = a.y * a.z
        A = ZZ - XY * XI
        B = XX * XI - YZ
        C = YY - XZ
        F = (C * a.y) * XI + A * a.z + (B * a.x) * XI
        F = F.reciprocal()
        return GFp6(C * F, B * F, A * F)

    def is_zero(self):
        return not (bool(self.x) or bool(self.y) or bool(self.z))


GFP6_ZERO = GFp6(_ZERO2, _ZERO2, _ZERO2)
GFP6_ONE = GFp6(_ZERO2, _ZERO2, _ONE2)


class GFp12:
    __slots__ = ("x", "y")

    def __init__(self, x, y):
        self.x, self.y = x, y

    def __eq__(self, other):
        return self.x == other.x and self.y == other.y

    def __repr__(self):
        return f"({self.x},{self.y})"

    def is_one(self):
        return self.x.is_zero() and self.y == GFP6_ONE

    def conjugate_of(self):
        return GFp12(-self.x, self.y)

    def frobenius(self):
        e1 = GFp6(
            self.x.x.conjugate() * XI1[5],
            self.x.y.conjugate() * XI1[3],
            self.x.z.conjugate() * XI1[1],
        )
        e2 = GFp6(
            self.y.x.conjugate() * XI1[4],
            self.y.y.conjugate() * XI1[2],
            self.y.z.conjugate(),
        )
        return GFp12(e1, e2)

    def frobenius_p2(self):
        e1 = GFp6(self.x.x * XI2[5], self.x.y * XI2[3], self.x.z * XI2[1])
        e2 = GFp6(self.y.x * XI2[4], self.y.y * XI2[2], self.y.z)
        return GFp12(e1, e2)

    def __mul__(a, b):
        axbx = a.x * b.x
        axby = a.x * b.y
        aybx = a.y * b.x
        ayby = a.y * b.y
        return GFp12(axby + aybx, ayby + axbx.mul_tau())

    def mul_scalar(self, k: GFp6):
        return GFp12(self.x * k, self.y * k)

    def square(a):
        v0 = a.x * a.y
        t = a.x.mul_tau() + a.y
        ty = (a.x + a.y) * t - v0 - v0.mul_tau()
        return GFp12(v0.double(), ty)

    def exp(self, k: int):
        result = GFP12_ONE
        base = self
        while k:
            if k & 1:
                result = result * base
            base = base.square()
            k >>= 1
        return result

    def inverse(a):
        t1 = a.x.square()
        t2 = a.y.square()
        t1 = t2 - t1.mul_tau()
        t2 = t1.inverse()
        return GFp12(-a.x, a.y).mul_scalar(t2)


GFP12_ONE = GFp12(GFP6_ZERO, GFP6_ONE)


# ---------------------------------------------------------------------------
# Line functions (dclxvi form): twist point arithmetic fused with the
# evaluation of the tangent/secant line at the GFp point q.
# ---------------------------------------------------------------------------


def _line_add(r, p, q, r2):
    r_t = r.z ** 2
    b_ = p.x * r_t
    d_ = (p.y + r.z) ** 2 - r2 - r_t
    d_ = d_ * r_t
    h = b_ - r.x
    i = h ** 2
    e = i * 4
    j = h * e
    l1 = d_ - r.y - r.y
    v = r.x * e
    r_x = l1 ** 2 - j - v - v
    r_z = (r.z + h) ** 2 - r_t - i
    t = (v - r_x) * l1
    t2 = r.y * j
    r_y = t - t2 - t2
    r_out = BNTwistPoint(r_x, r_y, r_z, check=False)

    t = (p.y + r_z) ** 2 - r2 - r_z ** 2
    t2 = l1 * p.x * 2
    a = t2 - t
    c = r_z * (q.y + q.y)
    b = (-l1) * (q.x + q.x)
    return a, b, c, r_out


def _line_double(r, q):
    r_t = r.z ** 2
    A = r.x ** 2
    B = r.y ** 2
    C = B ** 2
    D = ((r.x + B) ** 2 - A - C) * 2
    E = A * 3
    F = E ** 2
    C8 = C * 8
    r_x = F - D - D
    r_y = E * (D - r_x) - C8
    r_z = (r.y + r.z) ** 2 - B - r_t
    r_out = BNTwistPoint(r_x, r_y, r_z, check=False)

    a = (r.x + E) ** 2 - A - F - B * 4
    t = E * r_t * 2
    b = (-t) * q.x
    c = r_z * r_t * 2 * q.y
    return a, b, c, r_out


def _mul_line(f: GFp12, a, b, c):
    t1 = GFp6(_ZERO2, a, b)
    t2 = GFp6(_ZERO2, a, b + c)
    t1 = t1 * f.x
    t3 = f.y.mul_scalar(c)
    fx = f.x + f.y
    fy = t3
    fx = fx * t2 - t1 - fy
    fy = fy + t1.mul_tau()
    return GFp12(fx, fy)


def miller(q, p):
    """Miller loop on twist point q and BN point p (both normalized)."""
    Q = q
    mQ = BNTwistPoint._inv(Q)
    f = GFP12_ONE
    T = Q
    Qp = Q.y ** 2

    for naf_i in NAF_6U2:
        f = f.square()
        a, b, c, T = _line_double(T, p)
        f = _mul_line(f, a, b, c)
        if naf_i == 1:
            a, b, c, T = _line_add(T, Q, p, Qp)
            f = _mul_line(f, a, b, c)
        elif naf_i == -1:
            a, b, c, T = _line_add(T, mQ, p, Qp)
            f = _mul_line(f, a, b, c)

    # Frobenius twists of Q for the final two line additions
    Q1 = BNTwistPoint(
        Q.x.conjugate() * XI1[2], Q.y.conjugate() * XI1[3], _ONE2, check=False
    )
    Q2 = BNTwistPoint(Q.x * XI2[2].c0, Q.y, _ONE2, check=False)

    Qp = Q1.y ** 2
    a, b, c, T = _line_add(T, Q1, p, Qp)
    f = _mul_line(f, a, b, c)

    Qp = Q2.y ** 2
    a, b, c, T = _line_add(T, Q2, p, Qp)
    f = _mul_line(f, a, b, c)

    return f


def final_exp(inp: GFp12) -> GFp12:
    """Hard part of the final exponentiation (eprint 2010/354, Alg. 31)."""
    t1 = inp.conjugate_of() * inp.inverse()  # inp^(p^6 - 1)
    t1 = t1 * t1.frobenius_p2()  # ^(p^2 + 1)

    fp1 = t1.frobenius()
    fp2 = t1.frobenius_p2()
    fp3 = fp2.frobenius()

    fu1 = t1.exp(U)
    fu2 = fu1.exp(U)
    fu3 = fu2.exp(U)

    y3 = fu1.frobenius()
    fu2p = fu2.frobenius()
    fu3p = fu3.frobenius()
    y2 = fu2.frobenius_p2()

    y0 = fp1 * fp2 * fp3
    y1 = t1.conjugate_of()
    y5 = fu2.conjugate_of()
    y3 = y3.conjugate_of()
    y4 = (fu1 * fu2p).conjugate_of()
    y6 = (fu3 * fu3p).conjugate_of()

    t0 = y6.square() * y4 * y5
    t1b = y3 * y5 * t0
    t0 = t0 * y2
    t1b = (t1b.square() * t0).square()
    t0 = t1b * y1
    t1b = t1b * y0
    t0 = t0.square() * t1b
    return t0


def optimal_ate(a, b) -> GFp12:
    """Optimal ate pairing e(a, b); a on BN256_twist, b on BN256
    (argument order parity with reference pairing.py:614-645)."""
    a = a.normalize()
    b = b.normalize()
    if BNTwistPoint._is_identity(a) or BNPoint._is_identity(b):
        return GFP12_ONE
    return final_exp(miller(a, b))
