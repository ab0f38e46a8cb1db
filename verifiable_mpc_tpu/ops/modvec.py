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


def _zero_or_gf_vals(xs, gf):
    """Canonical ints if every element is a gf element or the int 0."""
    vals = []
    for x in xs:
        if isinstance(x, FiniteFieldElement):
            if type(x).modulus != gf.modulus:
                return None
            vals.append(x.value)
        elif isinstance(x, int) and x == 0:
            vals.append(0)
        else:
            return None
    return vals


# int_mode for the one-pass C converter (native.vals_to_arr):
#   0 = gf elements only, 1 = gf elements + any ints, 2 = gf + int 0 only
_PY_GUARDS = {0: _gf_vals, 1: _mixed_vals, 2: _zero_or_gf_vals}


def _arr(xs, gf, int_mode):
    """[n,4] u64 rows for xs under the given int-mix guard, or None.

    One C pass (type check + .value load + limb export fused) when the
    extension is available; the per-element Python guards remain the
    fallback for missing-toolchain setups and same-modulus field
    *subclasses* (the C path checks exact types only)."""
    arr = native.vals_to_arr(xs, gf, gf.modulus, int_mode)
    if arr is not None:
        return arr
    vals = _PY_GUARDS[int_mode](xs, gf)
    if vals is None:
        return None
    return native._ints_to_u64x4(vals, gf.modulus)


def dot(coeffs, values, gf, allow_all_int=False):
    """<coeffs, values> as a gf element, or None.

    Requires int/gf entries only AND at least one product term touching a gf
    element: then the Python accumulation ``result = c*v + result`` the
    caller would run also yields a reduced gf element (gf arithmetic coerces
    the int terms mod p).  ``allow_all_int=True`` skips that requirement —
    for callers whose accumulation is reduced anyway (e.g. form_eval when
    the form CONSTANT is a field element seeding the accumulator)."""
    if len(coeffs) < MIN_N or not _native_ok(gf):
        return None
    ff = FiniteFieldElement
    if not allow_all_int and not any(
        isinstance(c, ff) or isinstance(v, ff)
        for c, v in zip(coeffs, values)
    ):
        return None  # all-int dot: Python would give an unreduced int
    cc = _arr_cached(coeffs, gf)
    if cc is None:
        return None
    vv = _arr(values, gf, 1)
    if vv is None or len(vv) != len(cc):
        return None
    return gf(native.mod_dot_arr(cc, vv, gf.modulus))


_COEFF_ARR_CACHE = {}  # id(list) -> (list ref, modulus, arr)


def _arr_cached(coeffs, gf):
    """_arr with a small identity-keyed memo: protocol 5 evaluates the SAME
    combined form against several vectors (t over r, lz over z, the
    protocol-8 y's), and at 2^16 each conversion walks 262k unreduced
    bigints.  Keyed by list identity + a kept reference (forms never mutate
    coeffs in place — the algebra builds new lists); bounded size."""
    key = id(coeffs)
    hit = _COEFF_ARR_CACHE.get(key)
    if hit is not None and hit[0] is coeffs and hit[1] == gf.modulus:
        return hit[2]
    arr = _arr(coeffs, gf, 1)
    if arr is not None and len(coeffs) >= 4096:
        if len(_COEFF_ARR_CACHE) > 16:
            _COEFF_ARR_CACHE.clear()
        _COEFF_ARR_CACHE[key] = (coeffs, gf.modulus, arr)
    return arr


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
    xx = _arr(x, gf, 1)
    if xx is None:
        return None
    yy = _arr(y, gf, 1)
    if yy is None or len(yy) != len(xx):
        return None
    return native.arr_to_vals(native.mod_axpy_arr(cv, xx, yy, gf.modulus), gf)


def axpy(c, x, y, gf):
    """[c*x_i + y_i] as gf elements, or None.

    Requires all x to be gf elements (c*x_i is then a gf element and the
    sum reduces regardless of y's int/gf mix)."""
    if len(x) < MIN_N or not _native_ok(gf):
        return None
    cv = _scalar_val(c, gf)
    if cv is None:
        return None
    xx = _arr(x, gf, 0)
    if xx is None:
        return None
    yy = _arr(y, gf, 1)
    if yy is None or len(yy) != len(xx):
        return None
    return native.arr_to_vals(native.mod_axpy_arr(cv, xx, yy, gf.modulus), gf)


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
    xx = _arr(x, gf, 2 if zero_ints_ok else 0)
    if xx is None:
        return None
    return native.arr_to_vals(native.mod_scale_arr(cv, xx, gf.modulus), gf)


def weighted_sum(weights, rows, gf):
    """[sum_i w_i * rows[i][j] for j] as gf elements, or None.

    The nullity combine L = sum rho^i L_i (reference nullity.py:21-40).
    Row entries must be gf elements or the int 0 (sparse padding): a column
    whose every entry is int-0 sums to Python int 0, which serializes
    byte-identically to the gf(0) this helper returns; any nonzero int
    entry would make the Python column an unreduced int, so we fall back."""
    if not rows or len(rows[0]) < MIN_N or not _native_ok(gf):
        return None
    ww = _arr(weights, gf, 1)
    if ww is None:
        return None
    n = len(rows[0])
    import numpy as np

    mats = []
    for r in rows:
        if len(r) != n:
            return None
        rr = _arr(r, gf, 2)
        if rr is None:
            return None
        mats.append(rr)
    flat = np.concatenate(mats)
    return native.arr_to_vals(
        native.mod_weighted_sum_arr(ww, flat, len(rows), n, gf.modulus), gf
    )


def hadamard_ints(a, b, gf):
    """[gf(a_i * b_i)] for plain-int inputs, or None."""
    if len(a) < MIN_N or len(a) != len(b) or not _native_ok(gf):
        return None
    if not (all(type(v) is int for v in a) and all(type(v) is int for v in b)):
        return None
    aa = native._ints_to_u64x4(a, gf.modulus)
    bb = native._ints_to_u64x4(b, gf.modulus)
    return native.arr_to_vals(
        native.mod_hadamard_arr(aa, bb, gf.modulus), gf
    )


def hadamard(a, b, gf):
    """[a_i * b_i] as gf elements, or None.  Requires all gf elements."""
    if len(a) < MIN_N or not _native_ok(gf):
        return None
    aa = _arr(a, gf, 0)
    if aa is None:
        return None
    bb = _arr(b, gf, 0)
    if bb is None or len(bb) != len(aa):
        return None
    return native.arr_to_vals(native.mod_hadamard_arr(aa, bb, gf.modulus), gf)
