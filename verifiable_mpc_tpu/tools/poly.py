"""Dense polynomial arithmetic over prime fields.

Capability parity with reference
/root/reference/verifiable_mpc/tools/qap_creator.py (Poly class, Lagrange
interpolation over the 1..m domain, long division) with better algorithms:

* interpolation is O(n^2) via a single shared master polynomial instead of
  the reference's O(n^3)-ish per-singleton products (qap_creator.py:139-164);
* multiplication auto-dispatches to the TPU NTT backend for large degrees
  (registered by :mod:`verifiable_mpc_tpu.ops.ntt`).

Coefficients are stored lowest-degree-first, as in the reference.
"""

from __future__ import annotations

from ..fields import FiniteFieldElement

_NTT_MUL_BACKEND = [None, 1 << 30]  # (callable, min_degree)


def register_poly_mul_backend(fn, min_len: int = 128):
    _NTT_MUL_BACKEND[0] = fn
    _NTT_MUL_BACKEND[1] = min_len


class Poly:
    __slots__ = ("coeffs",)

    def __init__(self, coeffs):
        self.coeffs = list(coeffs)

    def __add__(self, other):
        return Poly(add_polys(self.coeffs, other.coeffs))

    def __sub__(self, other):
        return Poly(subtract_polys(self.coeffs, other.coeffs))

    def __mul__(self, other):
        if isinstance(other, Poly):
            return Poly(multiply_polys(self.coeffs, other.coeffs))
        return Poly([other * c for c in self.coeffs])

    def __rmul__(self, other):
        return self * other

    def __truediv__(self, other):
        d, r = div_polys(self.coeffs, other.coeffs)
        return Poly(d), Poly(r)

    def __len__(self):
        return len(self.coeffs)

    def __eq__(self, other):
        return self.coeffs == other.coeffs

    def eval(self, value):
        # Horner; matches reference eval_poly semantics (qap_creator.py:108-109)
        result = 0
        for c in reversed(self.coeffs):
            result = result * value + c
        return result

    def __call__(self, value):
        return self.eval(value)

    def __str__(self):
        return str(self.coeffs)


def add_polys(a, b, subtract=False):
    input_was_poly = isinstance(a, Poly)
    if input_was_poly:
        a, b = a.coeffs, b.coeffs
    o = [0] * max(len(a), len(b))
    for i, ai in enumerate(a):
        o[i] = o[i] + ai
    for i, bi in enumerate(b):
        o[i] = o[i] - bi if subtract else o[i] + bi
    return Poly(o) if input_was_poly else o


def subtract_polys(a, b):
    return add_polys(a, b, subtract=True)


def multiply_polys(a, b):
    backend, min_len = _NTT_MUL_BACKEND
    if backend is not None and min(len(a), len(b)) >= min_len:
        result = backend(a, b)
        if result is not None:
            return result
    o = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        if isinstance(ai, int) and ai == 0:
            continue
        for j, bj in enumerate(b):
            o[i + j] = o[i + j] + ai * bj
    return o


def div_polys(a, b):
    """Quotient and remainder of a/b (reference qap_creator.py:96-104)."""
    o = [0] * (len(a) - len(b) + 1)
    remainder = list(a)
    binv = None
    while len(remainder) >= len(b):
        if binv is None:
            lead = b[-1]
            binv = (
                lead.reciprocal()
                if isinstance(lead, FiniteFieldElement)
                else 1 / lead
            )
        leading_fac = remainder[-1] * binv
        pos = len(remainder) - len(b)
        o[pos] = leading_fac
        for i, bi in enumerate(b):
            remainder[pos + i] = remainder[pos + i] - bi * leading_fac
        remainder = remainder[:-1]
    return o, remainder


def eval_poly(poly, x):
    result = 0
    for c in reversed(poly):
        result = result * x + c
    return result


def lagrange_interp_ff(vec, ff):
    """Interpolate p with p(i+1) = vec[i] over points 1..len(vec).

    Output matches reference qap_creator.py:154-164 (coefficient list, same
    domain), computed via the master-polynomial method:
        M(X) = prod (X - i),  p = sum_i vec[i] * M / (X - i) / M'(i).
    """
    n = len(vec)
    pts = [ff(i + 1) for i in range(n)]
    # master polynomial M(X) = prod (X - pts[i])
    m = [ff(1)]
    for pt in pts:
        m = multiply_polys(m, [-pt, ff(1)])
    o = [ff(0)] * n
    for i, pt in enumerate(pts):
        # basis_i = M / (X - pt), synthetic division (exact)
        basis = [ff(0)] * n
        carry = m[n]  # leading coeff (1)
        for j in range(n - 1, -1, -1):
            basis[j] = carry
            carry = m[j] + carry * pt
        denom = eval_poly(basis, pt)
        scale = vec[i] * denom.reciprocal()
        for j in range(n):
            o[j] = o[j] + basis[j] * scale
    return o


def r1cs_to_qap_ff(A, B, C, ff):
    """Interpolate each R1CS column; target t = prod (X - i)
    (reference qap_creator.py:168-176)."""
    A, B, C = transpose(A), transpose(B), transpose(C)
    new_A = [lagrange_interp_ff(a, ff) for a in A]
    new_B = [lagrange_interp_ff(b, ff) for b in B]
    new_C = [lagrange_interp_ff(c, ff) for c in C]
    Z = [ff(1)]
    for i in range(1, len(A[0]) + 1):
        Z = multiply_polys(Z, [ff(-i), ff(1)])
    return new_A, new_B, new_C, Z


def transpose(matrix):
    return list(map(list, zip(*matrix)))
