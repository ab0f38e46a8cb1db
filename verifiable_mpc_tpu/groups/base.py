"""Group element base API.

Mirrors the surface of ``mpyc.fingroups`` that the reference library uses
(see SURVEY.md "MPyC API surface"): class-level ``order``/``generator``/
``identity``, ``operation`` for tree reductions (reference pivot.py:26-28),
``**`` exponentiation, ``*`` group operation, ``@`` group operation
(reference trinocchio/pynocchio.py:34 ``point_add = FiniteGroupElement.__matmul__``),
and ``normalize()`` ahead of Fiat-Shamir hashing (reference pivot.py:169-172).

A *group* is a class; *elements* are instances.  Both multiplicative and
additive notations are accepted on every group so that the AC20 modules
(multiplicative style) and the Pinocchio modules (additive style) share one
element type.
"""

from __future__ import annotations


class FiniteGroupElement:
    __slots__ = ()

    order: int = 0  # order of the (sub)group being used
    is_additive = False
    is_multiplicative = True

    # -- to be provided by subclasses -------------------------------------
    @classmethod
    def _op(cls, a, b):
        raise NotImplementedError

    @classmethod
    def _inv(cls, a):
        raise NotImplementedError

    @classmethod
    def _scalar_mul(cls, a, k: int):
        """Generic double-and-add; subclasses may override."""
        if isinstance(k, int) and k < 0:
            a = cls._inv(a)
            k = -k
        result = cls.identity
        base = a
        while k:
            if k & 1:
                result = cls._op(result, base)
            base = cls._op(base, base)
            k >>= 1
        return result

    # -- generic protocol surface -----------------------------------------
    @staticmethod
    def operation(a, b):
        return type(a)._op(a, b)

    def inverse(self):
        return type(self)._inv(self)

    def __matmul__(self, other):
        return type(self)._op(self, other)

    def __invert__(self):
        return type(self)._inv(self)

    def __mul__(self, other):
        cls = type(self)
        if isinstance(other, cls):
            return cls._op(self, other)
        k = _as_int(other)
        if k is not None and cls.is_scalar_mul_by_star:
            return cls._scalar_mul(self, k)
        return NotImplemented

    def __rmul__(self, other):
        cls = type(self)
        k = _as_int(other)
        if k is not None and cls.is_scalar_mul_by_star:
            return cls._scalar_mul(self, k)
        return NotImplemented

    def __pow__(self, exponent):
        k = _as_int(exponent)
        if k is None:
            return NotImplemented
        return type(self)._scalar_mul(self, k)

    def normalize(self):
        return self

    @classmethod
    def batch_normalize(cls, points):
        """Canonical representatives for a list of elements.

        Fiat-Shamir transcripts hash str() of group elements, so any vector
        recomputed independently by prover and verifier (e.g. the folded
        generators of Protocol 4) must be reduced to canonical coordinates —
        otherwise different compute backends (pure Python / native C++ /
        TPU) would yield different projective representatives and thus
        different challenges.  Elliptic subclasses override this with one
        batched inversion (Montgomery's trick)."""
        return [p.normalize() for p in points]

    # Scalar-mul via `*` only on elliptic curves (Pinocchio style); on
    # multiplicative groups `*` is strictly the group operation.
    is_scalar_mul_by_star = False


def _as_int(value):
    if isinstance(value, int):
        return value
    if hasattr(value, "value") and isinstance(getattr(value, "value"), int):
        # field element: use its signed representative, matching the
        # reference's int() conversions (pivot.py:119-128)
        return int(value)
    return None


class classproperty:
    def __init__(self, fget):
        self.fget = fget

    def __get__(self, obj, owner):
        return self.fget(owner)
