"""Native-accelerated vector arithmetic over prime fields.

The reference computes every O(n) scalar step of the protocols with Python
bigint loops: linear-form evaluation (/root/reference/verifiable_mpc/ac20/
pivot.py:89-96), the z-vector and form folds of Protocol 4
(compressed_pivot.py:70-84) and the nullity combine (nullity.py:21-40).
These helpers route those steps to the native Barrett vector kernels
(native/modvec.cc) when — and only when — the Python expression they replace
would produce *reduced field elements*: every helper returns ``None`` unless
all type guards hold (so secure shares, plain-int witnesses whose Python
result would be an unreduced int, and mixed-field inputs all fall back to
the original expression at the call site).  This keeps proof objects and
Fiat-Shamir transcripts byte-identical between backends.
"""

from __future__ import annotations

from ..fields import FiniteFieldElement
from .. import native

MIN_N = 32  # below this, conversion overhead beats the Python loop win

_WARM: dict = {}


def _native_ok(gf) -> bool:
    if not native.SCALAR_TIER:
        return False
    m = getattr(gf, "modulus", 0)
    ok = _WARM.get(m)
    if ok is None:
        ok = (1 << 192) <= m < (1 << 256) and native.available()
        _WARM[m] = ok
    return ok


def _gf_vals(xs, gf):
    """Canonical int values if every element is a gf element; else None."""
    vals = []
    for x in xs:
        if type(x) is gf or (
            isinstance(x, FiniteFieldElement)
            and type(x).modulus == gf.modulus
        ):
            vals.append(x.value)
        else:
            return None
    return vals


def _mixed_vals(xs, gf):
    """Canonical int values if every element is an int or gf element."""
    vals = []
    for x in xs:
        if isinstance(x, int):
            vals.append(x)
        elif (
            isinstance(x, FiniteFieldElement)
            and type(x).modulus == gf.modulus
        ):
            vals.append(x.value)
        else:
            return None
    return vals


def _scalar_val(c, gf):
    if isinstance(c, int):
        return c
    if isinstance(c, FiniteFieldElement) and type(c).modulus == gf.modulus:
        return c.value
    return None


def dot(coeffs, values, gf):
    """<coeffs, values> as a gf element, or None.

    Requires int/gf entries only AND at least one product term touching a gf
    element: then the Python accumulation ``result = c*v + result`` the
    caller would run also yields a reduced gf element (gf arithmetic coerces
    the int terms mod p)."""
    if len(coeffs) < MIN_N or not _native_ok(gf):
        return None
    cc = _mixed_vals(coeffs, gf)
    if cc is None:
        return None
    vv = _mixed_vals(values, gf)
    if vv is None or len(vv) != len(cc):
        return None
    ff = FiniteFieldElement
    if not any(
        isinstance(c, ff) or isinstance(v, ff)
        for c, v in zip(coeffs, values)
    ):
        return None  # all-int dot: Python would give an unreduced int
    return gf(native.mod_dot(cc, vv, gf.modulus))


def axpy_mixed(c, x, y, gf):
    """[x_i * gf(c) + y_i] as gf elements, or None.

    For call sites whose Python expression multiplies by ``gf(c)`` (the
    Protocol-4 form fold, reference compressed_pivot.py:70-73): the result
    is a reduced gf element for ANY int/gf mix of x and y."""
    if len(x) < MIN_N or not _native_ok(gf):
        return None
    cv = _scalar_val(c, gf)
    if cv is None:
        return None
    xx = _mixed_vals(x, gf)
    if xx is None:
        return None
    yy = _mixed_vals(y, gf)
    if yy is None or len(yy) != len(xx):
        return None
    return [gf(v) for v in native.mod_axpy(cv, xx, yy, gf.modulus)]


def axpy(c, x, y, gf):
    """[c*x_i + y_i] as gf elements, or None.

    Requires all x to be gf elements (c*x_i is then a gf element and the
    sum reduces regardless of y's int/gf mix)."""
    if len(x) < MIN_N or not _native_ok(gf):
        return None
    cv = _scalar_val(c, gf)
    if cv is None:
        return None
    xx = _gf_vals(x, gf)
    if xx is None:
        return None
    yy = _mixed_vals(y, gf)
    if yy is None or len(yy) != len(xx):
        return None
    return [gf(v) for v in native.mod_axpy(cv, xx, yy, gf.modulus)]


def scale(c, x, gf, zero_ints_ok=False):
    """[c * x_i] as gf elements, or None.  Requires all x gf elements;
    with ``zero_ints_ok`` the int 0 is also allowed (Python would keep it
    an int 0, which serializes byte-identically to the gf(0) returned
    here — only safe when the result feeds hashes/value comparisons)."""
    if len(x) < MIN_N or not _native_ok(gf):
        return None
    cv = _scalar_val(c, gf)
    if cv is None:
        return None
    if zero_ints_ok:
        xx = []
        for v in x:
            if isinstance(v, FiniteFieldElement):
                if type(v).modulus != gf.modulus:
                    return None
                xx.append(v.value)
            elif isinstance(v, int) and v == 0:
                xx.append(0)
            else:
                return None
    else:
        xx = _gf_vals(x, gf)
        if xx is None:
            return None
    return [gf(v) for v in native.mod_scale(cv, xx, gf.modulus)]


def weighted_sum(weights, rows, gf):
    """[sum_i w_i * rows[i][j] for j] as gf elements, or None.

    The nullity combine L = sum rho^i L_i (reference nullity.py:21-40).
    Row entries must be gf elements or the int 0 (sparse padding): a column
    whose every entry is int-0 sums to Python int 0, which serializes
    byte-identically to the gf(0) this helper returns; any nonzero int
    entry would make the Python column an unreduced int, so we fall back."""
    if not rows or len(rows[0]) < MIN_N or not _native_ok(gf):
        return None
    ww = _mixed_vals(weights, gf)
    if ww is None:
        return None
    n = len(rows[0])
    vals = []
    for r in rows:
        if len(r) != n:
            return None
        rv = []
        for x in r:
            if isinstance(x, FiniteFieldElement):
                if type(x).modulus != gf.modulus:
                    return None
                rv.append(x.value)
            elif isinstance(x, int) and x == 0:
                rv.append(0)
            else:
                return None
        vals.append(rv)
    return [gf(v) for v in native.mod_weighted_sum(ww, vals, gf.modulus)]


def hadamard_ints(a, b, gf):
    """[gf(a_i * b_i)] for plain-int inputs, or None."""
    if len(a) < MIN_N or len(a) != len(b) or not _native_ok(gf):
        return None
    if not (all(type(v) is int for v in a) and all(type(v) is int for v in b)):
        return None
    return [gf(v) for v in native.mod_hadamard(a, b, gf.modulus)]


def hadamard(a, b, gf):
    """[a_i * b_i] as gf elements, or None.  Requires all gf elements."""
    if len(a) < MIN_N or not _native_ok(gf):
        return None
    aa = _gf_vals(a, gf)
    if aa is None:
        return None
    bb = _gf_vals(b, gf)
    if bb is None or len(bb) != len(aa):
        return None
    return [gf(v) for v in native.mod_hadamard(aa, bb, gf.modulus)]
