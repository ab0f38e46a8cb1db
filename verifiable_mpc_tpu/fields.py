"""Prime fields and the quadratic extension used by the BN256 twist.

Host-side scalar field arithmetic over Python ints. This is the *protocol*
layer representation: small vectors of field elements that feed Fiat-Shamir
transcripts. Bulk arithmetic (vectors of thousands of elements) is performed
on TPU in fixed-limb form by :mod:`verifiable_mpc_tpu.ops`.

Capability parity with the reference's use of ``mpyc.finfields``
(see /root/reference/verifiable_mpc/ac20/pivot.py:14 and
/root/reference/demos/demo_zkp_ac20.py:19): ``GF(modulus)`` returns a field
class with ``modulus``/``order`` attributes, signed int conversion, and
operator support against plain ints.

Transcript note: ``repr`` of a field element is the decimal representation of
``int(element)`` (signed representative iff ``is_signed``), because the
reference hashes ``str(input_list)`` (pivot.py:131-136) and list printing
calls ``repr`` on the members.
"""

from __future__ import annotations

import functools


class FiniteFieldElement:
    """Base class for prime-field elements (one subclass per modulus)."""

    __slots__ = ("value",)

    modulus: int = 0
    order: int = 0
    is_signed: bool = True

    def __init__(self, value):
        if isinstance(value, FiniteFieldElement):
            value = value.value
        self.value = value % self.modulus

    # -- conversions ------------------------------------------------------
    def __int__(self):
        v = self.value
        if type(self).is_signed and v > self.modulus // 2:
            v -= self.modulus
        return v

    def signed_(self):
        v = self.value
        return v - self.modulus if v > self.modulus // 2 else v

    def __repr__(self):
        return str(int(self))

    def __str__(self):
        return str(int(self))

    # -- arithmetic -------------------------------------------------------
    def _coerce(self, other):
        cls = type(self)
        if isinstance(other, cls):
            return other.value
        if isinstance(other, int):
            return other % cls.modulus
        if isinstance(other, FiniteFieldElement):
            raise TypeError(
                f"mixing elements of GF({cls.modulus}) and GF({type(other).modulus})"
            )
        return NotImplemented

    def __add__(self, other):
        v = self._coerce(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)(self.value + v)

    __radd__ = __add__

    def __sub__(self, other):
        v = self._coerce(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)(self.value - v)

    def __rsub__(self, other):
        v = self._coerce(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)(v - self.value)

    def __mul__(self, other):
        v = self._coerce(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)(self.value * v)

    __rmul__ = __mul__

    def __neg__(self):
        return type(self)(-self.value)

    def __pow__(self, exponent):
        if isinstance(exponent, FiniteFieldElement):
            exponent = exponent.value
        return type(self)(pow(self.value, exponent, self.modulus))

    def __truediv__(self, other):
        v = self._coerce(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)(self.value * pow(v, -1, self.modulus))

    def __rtruediv__(self, other):
        v = self._coerce(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)(v * pow(self.value, -1, self.modulus))

    def __mod__(self, other):
        # The reference occasionally writes `(expr) % gf.order` on values that
        # are already field elements; keep this a no-op for the field modulus.
        if isinstance(other, int) and other == self.modulus:
            return type(self)(self.value)
        return NotImplemented

    def __eq__(self, other):
        if isinstance(other, int):
            return self.value == other % self.modulus
        if isinstance(other, FiniteFieldElement):
            return (
                type(other).modulus == type(self).modulus
                and other.value == self.value
            )
        return NotImplemented

    def __hash__(self):
        return hash((type(self).modulus, self.value))

    def __bool__(self):
        return self.value != 0

    @classmethod
    def inverse_of(cls, value):
        return cls(pow(int(value), -1, cls.modulus))

    def reciprocal(self):
        return type(self)(pow(self.value, -1, self.modulus))


@functools.lru_cache(maxsize=None)
def GF(modulus: int):
    """Return (cached) prime-field class for the given modulus."""
    if modulus <= 1:
        raise ValueError("modulus must be a prime > 1")

    name = f"GF({modulus})"
    cls = type(name, (FiniteFieldElement,), {"__slots__": ()})
    cls.modulus = modulus
    cls.order = modulus
    cls.is_signed = True
    return cls


# ---------------------------------------------------------------------------
# Quadratic extension GF(p^2) = GF(p)[i] / (i^2 + 1), used by the BN256 twist
# (reference: ac20/pairing.py:48-78 builds on MPyC's extension fields).
# ---------------------------------------------------------------------------


class QuadraticExtensionElement:
    """Element c0 + c1*i of GF(p^2) with i^2 = -1."""

    __slots__ = ("c0", "c1")

    modulus: int = 0  # characteristic p
    order: int = 0  # p**2

    def __init__(self, c0, c1=0):
        p = self.modulus
        if isinstance(c0, QuadraticExtensionElement):
            c0, c1 = c0.c0, c0.c1
        elif isinstance(c0, (list, tuple)):
            coeffs = list(c0) + [0, 0]
            c0, c1 = coeffs[0], coeffs[1]
        if isinstance(c0, FiniteFieldElement):
            c0 = c0.value
        if isinstance(c1, FiniteFieldElement):
            c1 = c1.value
        self.c0 = c0 % p
        self.c1 = c1 % p

    # -- helpers ----------------------------------------------------------
    def _coerce(self, other):
        cls = type(self)
        if isinstance(other, cls):
            return other
        if isinstance(other, int):
            return cls(other, 0)
        if isinstance(other, FiniteFieldElement) and type(other).modulus == cls.modulus:
            return cls(other.value, 0)
        return None

    def __add__(self, other):
        o = self._coerce(other)
        if o is None:
            return NotImplemented
        return type(self)(self.c0 + o.c0, self.c1 + o.c1)

    __radd__ = __add__

    def __sub__(self, other):
        o = self._coerce(other)
        if o is None:
            return NotImplemented
        return type(self)(self.c0 - o.c0, self.c1 - o.c1)

    def __rsub__(self, other):
        o = self._coerce(other)
        if o is None:
            return NotImplemented
        return o - self

    def __mul__(self, other):
        o = self._coerce(other)
        if o is None:
            return NotImplemented
        p = self.modulus
        a0, a1, b0, b1 = self.c0, self.c1, o.c0, o.c1
        # (a0 + a1 i)(b0 + b1 i) with i^2 = -1
        t0 = a0 * b0
        t1 = a1 * b1
        c0 = (t0 - t1) % p
        c1 = ((a0 + a1) * (b0 + b1) - t0 - t1) % p
        return type(self)(c0, c1)

    __rmul__ = __mul__

    def __neg__(self):
        return type(self)(-self.c0, -self.c1)

    def __pow__(self, exponent):
        if isinstance(exponent, FiniteFieldElement):
            exponent = exponent.value
        if exponent < 0:
            return self.reciprocal() ** (-exponent)
        result = type(self)(1, 0)
        base = self
        e = exponent
        while e:
            if e & 1:
                result = result * base
            base = base * base
            e >>= 1
        return result

    def reciprocal(self):
        p = self.modulus
        norm = (self.c0 * self.c0 + self.c1 * self.c1) % p
        inv = pow(norm, -1, p)
        return type(self)(self.c0 * inv, -self.c1 * inv)

    def __truediv__(self, other):
        o = self._coerce(other)
        if o is None:
            return NotImplemented
        return self * o.reciprocal()

    def conjugate(self):
        return type(self)(self.c0, -self.c1)

    def __eq__(self, other):
        o = self._coerce(other)
        if o is None:
            return NotImplemented
        return self.c0 == o.c0 and self.c1 == o.c1

    def __hash__(self):
        return hash((type(self).modulus, "p2", self.c0, self.c1))

    def __bool__(self):
        return self.c0 != 0 or self.c1 != 0

    def __int__(self):
        if self.c1 != 0:
            raise ValueError("not a base-field element")
        return self.c0

    def __repr__(self):
        return f"({self.c0}, {self.c1})"

    def is_sqr(self):
        # x is a square in GF(p^2) iff its norm is a square in GF(p).
        p = self.modulus
        norm = (self.c0 * self.c0 + self.c1 * self.c1) % p
        return pow(norm, (p - 1) // 2, p) in (0, 1)

    def sqrt(self):
        """Square root in GF(p^2) for p % 4 == 3 (complex method)."""
        p = self.modulus
        cls = type(self)
        if self.c1 == 0:
            c0 = self.c0
            if pow(c0, (p - 1) // 2, p) in (0, 1):
                return cls(pow(c0, (p + 1) // 4, p), 0)
            # sqrt(c0) = sqrt(-c0) * i since i^2 = -1
            r = pow(-c0 % p, (p + 1) // 4, p)
            return cls(0, r)
        norm = (self.c0 * self.c0 + self.c1 * self.c1) % p
        alpha = pow(norm, (p + 1) // 4, p)  # sqrt of norm
        for sign in (1, -1):
            a = (self.c0 + sign * alpha) * pow(2, -1, p) % p
            if pow(a, (p - 1) // 2, p) in (0, 1):
                x0 = pow(a, (p + 1) // 4, p)
                if x0 == 0:
                    continue
                x1 = self.c1 * pow(2 * x0, -1, p) % p
                cand = cls(x0, x1)
                if cand * cand == self:
                    return cand
        raise ValueError("element is not a square")


@functools.lru_cache(maxsize=None)
def GF2(modulus: int):
    """Return (cached) GF(p^2) class (i^2 = -1; requires p % 4 == 3)."""
    if modulus % 4 != 3:
        raise ValueError("GF2 requires p % 4 == 3 so that i^2 = -1 is irreducible")
    name = f"GF({modulus}^2)"
    cls = type(name, (QuadraticExtensionElement,), {"__slots__": ()})
    cls.modulus = modulus
    cls.order = modulus * modulus
    return cls
