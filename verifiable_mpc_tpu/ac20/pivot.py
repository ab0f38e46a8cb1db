"""AC20 Protocol 2 ("pivot"): Sigma-protocol for linear-form openings.

Implements the non-interactive pivot of Attema-Cramer (eprint 2020/152) with
behavior parity to reference /root/reference/verifiable_mpc/ac20/pivot.py:
AffineForm/LinearForm algebra (pivot.py:31-116), the Fiat-Shamir hash over
``str(input_list)`` (pivot.py:131-136), Pedersen vector commitments
(pivot.py:139-145) and prover/verifier (pivot.py:156-205).

TPU-first deviations: commitments and folds dispatch through
``ops.dispatch`` so large vectors run on the MSM kernel, and protocol
randomness is injectable (``verifiable_mpc_tpu.rng``).
"""

from __future__ import annotations

import hashlib
import logging

from .. import rng, serialization
from ..fields import FiniteFieldElement
from ..groups import is_elliptic
from . import ref_transcript
from ..ops import modvec
from ..ops.dispatch import multiexp, list_mul  # noqa: F401 (list_mul is API)

logger_piv = logging.getLogger("pivot")
logger_piv.setLevel(logging.INFO)


class AffineForm:
    """Affine form a(x) = <coeffs, x> + constant.

    Coefficients may be ints, field elements or secure shares; operator
    behavior mirrors reference pivot.py:31-95 (including ``repr``, which
    feeds Fiat-Shamir transcripts).
    """

    __slots__ = ("coeffs", "constant")

    def __init__(self, coeffs, constant):
        self.coeffs = coeffs
        self.constant = constant

    def __add__(self, other):
        if isinstance(other, AffineForm):
            assert len(self) == len(
                other
            ), "Length of linear forms to add not consistent."
            new_coeffs = [a + b for a, b in zip(self.coeffs, other.coeffs)]
            new_constant = self.constant + other.constant
        elif _is_scalar(other):
            new_coeffs = self.coeffs
            new_constant = self.constant + other
        else:
            raise NotImplementedError(
                f"Addition of form not defined for type: {type(other)}"
            )
        return AffineForm(new_coeffs, new_constant)

    def __radd__(self, other):
        if isinstance(other, int) and other == 0:
            return self
        return self.__add__(other)

    def __sub__(self, other):
        return self + (-1) * other

    def __mul__(self, other):
        if _is_scalar(other):
            new_coeffs = [c * other for c in self.coeffs]
            new_constant = self.constant * other
        else:
            raise NotImplementedError(
                f"Multiplication of form not defined for type: {type(other)}"
            )
        return type(self)(new_coeffs, new_constant)

    def __rmul__(self, other):
        return self * other

    def __len__(self):
        return len(self.coeffs)

    def __eq__(self, other):
        return self.coeffs == other.coeffs

    def __repr__(self):
        # transcript format parity: reference pivot.py:81-82
        return f"{str(self.coeffs)}, {str(self.constant)}"

    def eval(self, values):
        assert len(values) == len(
            self.coeffs
        ), "Length of inputs to be equal to coefficients of linear form."
        result = self.constant
        for c, v in zip(self.coeffs, values):
            result = c * v + result
        return result

    def __call__(self, values):
        return self.eval(values)


class LinearForm(AffineForm):
    """Affine form with constant forced to 0 (reference pivot.py:98-116).

    Adding a scalar or another form degrades to a plain AffineForm.
    """

    __slots__ = ()

    def __init__(self, coeffs, constant=0):
        self.coeffs = coeffs
        self.constant = 0

    def __mul__(self, other):
        if _is_scalar(other):
            return LinearForm([c * other for c in self.coeffs])
        raise NotImplementedError(
            f"Multiplication of form not defined for type: {type(other)}"
        )

    __rmul__ = __mul__


def _is_scalar(value):
    if isinstance(value, (int, FiniteFieldElement)):
        return True
    # secure shares pass through untouched (MPC prover path)
    return getattr(type(value), "is_secure_object", False)


def _int(value):
    """Field elements -> signed int; ints and secure shares pass through
    (reference pivot.py:119-128)."""
    if isinstance(value, int):
        return value
    if isinstance(value, FiniteFieldElement):
        return int(value)
    if getattr(type(value), "is_secure_object", False):
        return value
    raise NotImplementedError(f"cannot convert {type(value)}")


def form_eval(L, values, gf):
    """L(values), with the O(n) scalar accumulation routed through the
    native vector kernel when types allow (falls back to the plain Python
    evaluation otherwise — secure shares, mixed fields, int-typed
    results).  Value- and type-identical to ``L(values)``: the native dot
    only engages when the Python accumulation would produce a reduced gf
    element, and the constant is added back with the same coercion rules."""
    constant = L.constant
    if not isinstance(constant, (int, FiniteFieldElement)):
        return L(values)  # secure shares etc.
    if (
        isinstance(constant, FiniteFieldElement)
        and type(constant).modulus != gf.modulus
    ):
        return L(values)
    # a FIELD constant seeds the Python accumulator with a gf element, so
    # even an all-int coeffs/values dot reduces — native allowed then
    y = modvec.dot(
        L.coeffs, values, gf,
        allow_all_int=isinstance(constant, FiniteFieldElement),
    )
    if y is None:
        return L(values)
    if isinstance(constant, int) and constant == 0:
        return y
    return y + constant


def fiat_shamir_hash(input_list, order):
    """SHA-256 of the canonical binary serialization of ``input_list``,
    little-endian, mod order.

    DELIBERATE DEVIATION from the reference (pivot.py:131-136), which
    hashes ``str(input_list)``: building multi-megabyte decimal strings of
    the generator vectors dominated prove AND verify wall-clock at 2^14+
    gates (60%+ of each).  The tagged binary encoding (serialization.py)
    binds exactly the same mathematical objects, streams into the hasher
    without materializing the encoding, and is backend-independent.
    Cross-implementation byte parity with the reference was never testable
    here (MPyC is not installable, BASELINE.md); self-consistency is pinned
    by the golden-transcript tests.

    Opt-in ``transcript="ref"`` on the protocol entry points activates
    :mod:`.ref_transcript`, which reproduces the reference's string bytes
    exactly (see that module for the derivation and its assumptions)."""
    h = hashlib.sha256()
    if ref_transcript.ACTIVE:
        h.update(ref_transcript.ref_encode(input_list))
    else:
        serialization.hash_into(h, input_list)
    return int.from_bytes(h.digest(), "little") % order


def fiat_shamir_hash_suffixed(input_list, suffixes, order):
    """[fiat_shamir_hash(input_list + s, order) for s in suffixes], hashing
    the shared prefix once (byte-identical transcripts; the prefix of e.g.
    Protocol 5's c0/c1 pair carries the whole generator vector)."""
    if ref_transcript.ACTIVE:
        out = []
        for data in ref_transcript.ref_encode_suffixed(input_list, suffixes):
            h = hashlib.sha256()
            h.update(data)
            out.append(int.from_bytes(h.digest(), "little") % order)
        return out
    hashers = serialization.hash_list_with_suffixes(
        hashlib.sha256, input_list, suffixes
    )
    return [int.from_bytes(h.digest(), "little") % order for h in hashers]


def vector_commitment(x, gamma, g, h):
    """Pedersen vector commitment h^gamma * prod g_i^{x_i} (AC20 Def. 1).

    Routed through the MSM dispatcher: one multiexp of length len(x)+1
    instead of the reference's sequential loop (pivot.py:139-145).
    Exponents pass through raw: ``int(gf_element)`` IS the reference's
    ``_int`` signed representative (fields.py:40-44), and each dispatch
    backend converts in one fused C pass — a [_int(xi) ...] pre-pass here
    walked the 2^18-element z twice per commitment."""
    assert len(g) >= len(x), "Not enough generators."
    return multiexp(list(g[: len(x)]) + [h], list(x) + [int(gamma)])


def vector_commitment_async(x, gamma, g, h):
    """Launch :func:`vector_commitment`; returns a zero-arg thunk.  With
    the TPU backend the MSM overlaps host work done before the thunk runs
    (identical result either way)."""
    from ..ops.dispatch import multiexp_async

    assert len(g) >= len(x), "Not enough generators."
    return multiexp_async(list(g[: len(x)]) + [h], list(x) + [int(gamma)])


def affine_to_linear(L, y, n):
    """Shift an affine form (and claimed evaluation) to a linear form
    (reference pivot.py:148-153).

    The reference computes the constant as ``L([0]*n)`` — an O(n) field
    pass over a zero vector whose only effect is coercing the constant to
    the coefficients' field.  Reproduce that coercion with a type scan
    (no arithmetic); any exotic coefficient type falls back to the
    reference expression."""
    constant = None
    c0 = L.constant
    if isinstance(c0, FiniteFieldElement):
        constant = c0
    elif isinstance(c0, int):
        constant = c0
        for c in L.coeffs:
            if isinstance(c, FiniteFieldElement):
                # c*0 + acc promotes the accumulator into c's field
                constant = type(c)(c0)
                break
            if not isinstance(c, int):
                constant = None  # secure shares etc.: exact reference path
                break
    if constant is None:
        constant = L([0] * n)
    return L - constant, y - constant


def prove_linear_form_eval(g, h, P, L, y, x, gamma, gf, transcript="v1"):
    """Non-interactive Sigma-protocol Pi_s (reference pivot.py:156-181).

    transcript="ref": reference string-encoding bytes (ref_transcript.py)."""
    if transcript == "ref":
        with ref_transcript.active():
            return prove_linear_form_eval(g, h, P, L, y, x, gamma, gf)
    n = len(x)
    L, y = affine_to_linear(L, y, n)
    r = [gf(rng.randrange(gf.order)) for _ in range(n)]
    rho = rng.randrange(gf.order)
    t = L(r)
    A = vector_commitment(r, rho, g, h)
    logger_piv.debug("Prover computed A=%s.", A)

    if is_elliptic(A):
        input_list = [t, A.normalize(), g, h, P.normalize(), L, y]
    else:
        input_list = [t, A, g, h, P, L, y]

    c = fiat_shamir_hash(input_list, gf.order)
    z = [c * x_i + r[i] for i, x_i in enumerate(x)]
    phi = (c * gamma + rho) % gf.order
    return z, phi, c


def verify_linear_form_proof(g, h, P, L, y, z, phi, c, transcript="v1"):
    """Verifier of Pi_s (reference pivot.py:184-205)."""
    if transcript == "ref":
        with ref_transcript.active():
            return verify_linear_form_proof(g, h, P, L, y, z, phi, c)
    n = len(z)
    L, y = affine_to_linear(L, y, n)
    A_check = vector_commitment(z, phi, g, h) * ((P ** c) ** (-1))
    t_check = L(z) - c * y
    order = type(t_check).order

    if is_elliptic(A_check):
        input_list = [t_check, A_check.normalize(), g, h, P.normalize(), L, y]
    else:
        input_list = [t_check, A_check, g, h, P, L, y]

    hash_check = fiat_shamir_hash(input_list, order)
    return c == hash_check
