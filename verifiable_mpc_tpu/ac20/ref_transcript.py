"""Reference-parity Fiat-Shamir byte encoding (opt-in ``transcript="ref"``).

The reference hashes ``str(input_list).encode("utf-8")``
(/root/reference/verifiable_mpc/ac20/pivot.py:131-136), i.e. the Python
``repr`` of every transcript object — MPyC field elements, MPyC group
elements, AffineForms, circuit strings, tags.  The default transcript here
is a binary encoding (docs/TRANSCRIPTS.md); this module reproduces the
reference's STRING bytes so the north-star "bit-identical transcripts"
claim becomes testable the day MPyC is installable: run the reference with
its ``*_hash_inputs`` debug loggers, run this mode, and diff token by token.

MPyC is not installable in this environment (BASELINE.md), so the repr
formats below are derived from MPyC's public source and the reference's
own usage, each marked with the assumption to verify:

A1. ``finfields.GF(p)`` elements repr as the decimal SIGNED representative
    (``is_signed`` defaults to True: the reference demos explicitly set
    ``gf.is_signed = False`` to turn it off, demo_zkp_pynocchio.py:42, and
    pivot._int relies on ``int(field_element)``).  Matches this repo's
    ``fields.FiniteFieldElement.__repr__``.
A2. ``fingroups`` elliptic-curve points hold ``value = (x, y, z)`` — a
    tuple of coordinate field elements — and group elements repr as
    ``f'{self.value}'``, so an Ed25519 'projective' point reprs as the
    3-tuple ``(x, y, z)`` (this repo's extended ``t`` coordinate is
    dropped).  A value-based repr is forced: the reference verifier
    recomputes points and re-hashes them, so an identity-based default
    repr could never verify.
A3. The coordinate field is ``GF(p)`` with the default ``is_signed=True``
    (A1), so coordinates repr SIGNED.
A4. ``QuadraticResidues`` elements repr as their field value — signed,
    per A1/A3.

Representative caveat (documented, inherent): encoding parity makes the
hash bytes equal when both sides hash the same COORDINATES.  Values the
reference normalizes at hash sites (A, B, P, Q — ``.normalize()`` -> z=1)
are therefore parity-safe; raw projective vectors (the folded g_hat, the
CRS generators) are hashed at whatever representative each implementation
computed, so a cross-implementation run must either share the CRS/fold
representatives (e.g. import the CRS through the canonical serialization)
or normalize those vectors on both sides.  This repo batch-normalizes all
hashed vectors (groups/base.py batch_normalize), i.e. hashes z=1
representatives throughout.

A5. ``finfields.ExtensionFieldElement`` (the BN256-twist coordinate field
    GF(p^2), built by ``fingroups`` as ``GF(gfpx.GFpX(p)('x^2+1'))``,
    reference pairing.py:45-49 via ``EllipticCurve('BN256_twist')``) reprs
    as its ``value`` — a ``gfpx.Polynomial`` — in gfpx's term-string
    format.
A6. ``gfpx.Polynomial`` term format: terms in DESCENDING degree joined by
    ``+``, zero coefficients skipped, coefficient 1 omitted (``x``, not
    ``1x``), no ``*`` between coefficient and indeterminate (``2x``),
    powers as ``x^k``, the degree-0 term a bare integer, and the zero
    polynomial ``0``.  gfpx coefficients are canonical residues in
    {0..p-1} — UNSIGNED (``is_signed`` is a prime-field concept; gfpx has
    none), so c1*i + c0 reprs as e.g. ``{c1}x+{c0}``.
A7. BN256-twist points repr like A2: the jacobian ``value = (x, y, z)``
    3-tuple, each coordinate per A5/A6.  (The reference's KoE flow hashes
    the twist pi inside the ``z_commitment`` dict verbatim — no
    ``.normalize()`` at the hash sites, circuit_sat_r1cs.py:436-447 — so
    the representative caveat below applies to the twist exactly as to
    the folded g_hat.)

Scope: int/str/bool/list/tuple/dict, prime-field elements, Ed25519 points,
BN256 G1 jacobian points, BN256-twist points (GF(p^2) coordinates, MPyC
gfpx polynomial reprs — the KoE pivot), QR elements, Affine/Linear/Sparse
forms, Circuit (the reference's recursive ``print_circuit`` expansion).
"""

from __future__ import annotations

import contextlib

from ..fields import FiniteFieldElement, QuadraticExtensionElement
from ..groups.edwards import EdwardsPoint, P as ED_P
from ..groups.bn256 import BNPoint, BNTwistPoint, P as BN_P
from ..groups.qr import QuadraticResidueElement

ACTIVE = False


@contextlib.contextmanager
def active():
    """Enable the reference string encoding inside this block (set by the
    ``transcript="ref"`` entry points; consulted by pivot.fiat_shamir_hash)."""
    global ACTIVE
    saved = ACTIVE
    ACTIVE = True
    try:
        yield
    finally:
        ACTIVE = saved


def _signed(v: int, p: int) -> int:
    return v - p if v > p // 2 else v


def _join(items) -> str:
    return ", ".join(ref_repr(i) for i in items)


def _gfpx_terms(c0: int, c1: int) -> str:
    """MPyC ``gfpx.Polynomial`` term string for c1*x + c0 (A6): descending
    degree, ``+``-joined, zero terms skipped, unit coefficients omitted,
    no ``*``, canonical UNSIGNED coefficients, zero polynomial ``0``."""
    terms = []
    if c1:
        terms.append("x" if c1 == 1 else f"{c1}x")
    if c0:
        terms.append(str(c0))
    return "+".join(terms) if terms else "0"


def ref_repr(obj) -> str:
    """repr(obj) as the MPyC-based reference would produce it."""
    # local import: circuit_builder imports pivot which imports this module
    from . import circuit_builder as cb
    from . import pivot as pivot_mod

    if type(obj) is bool or obj is None:
        return repr(obj)
    if isinstance(obj, int):
        return repr(int(obj))
    if isinstance(obj, str):
        return repr(obj)
    if isinstance(obj, FiniteFieldElement):
        return str(int(obj))  # A1 (signed iff is_signed, this repo's repr)
    if isinstance(obj, QuadraticExtensionElement):
        return _gfpx_terms(obj.c0, obj.c1)  # A5/A6
    if isinstance(obj, EdwardsPoint):
        # A2/A3: 3-tuple of signed projective coordinates, extended t dropped
        return (
            f"({_signed(obj.x, ED_P)}, {_signed(obj.y, ED_P)}, "
            f"{_signed(obj.z, ED_P)})"
        )
    if isinstance(obj, BNPoint):
        # .value is the 0..p-1 residue regardless of the field's is_signed
        x, y, z = obj.x.value, obj.y.value, obj.z.value
        return f"({_signed(x, BN_P)}, {_signed(y, BN_P)}, {_signed(z, BN_P)})"
    if isinstance(obj, BNTwistPoint):
        # A7: jacobian 3-tuple of GF(p^2) coords, gfpx polynomial reprs
        return (
            f"({_gfpx_terms(obj.x.c0, obj.x.c1)}, "
            f"{_gfpx_terms(obj.y.c0, obj.y.c1)}, "
            f"{_gfpx_terms(obj.z.c0, obj.z.c1)})"
        )
    if isinstance(obj, QuadraticResidueElement):
        return str(_signed(obj.value, type(obj).modulus))  # A4
    if isinstance(obj, pivot_mod.AffineForm):  # covers LinearForm
        # reference pivot.py:81-82: f"{str(coeffs)}, {str(constant)}"
        return f"[{_join(obj.coeffs)}], {ref_repr(obj.constant)}"
    if isinstance(obj, cb.SparseForm):
        raise NotImplementedError(
            "SparseForm reached a ref-transcript hash site: densify first "
            "(the reference hashes dense AffineForm reprs)"
        )
    if isinstance(obj, cb.Circuit):
        # the reference hashes str(circuit) — a str, so it reprs QUOTED
        return repr(print_circuit_ref(obj))
    if isinstance(obj, list):
        return f"[{_join(obj)}]"
    if isinstance(obj, tuple):
        if len(obj) == 1:
            return f"({ref_repr(obj[0])},)"
        return f"({_join(obj)})"
    if isinstance(obj, dict):
        inner = ", ".join(
            f"{ref_repr(k)}: {ref_repr(v)}" for k, v in obj.items()
        )
        return f"{{{inner}}}"
    raise NotImplementedError(
        f"no reference repr rule for {type(obj).__name__}"
    )


def ref_encode(input_list) -> bytes:
    """``str(input_list).encode("utf-8")`` exactly as the reference
    (pivot.py:131-136) computes it."""
    return f"[{_join(input_list)}]".encode("utf-8")


def ref_encode_suffixed(input_list, suffixes):
    """[ref_encode(input_list + s) for s in suffixes] sharing the prefix."""
    prefix = f"[{_join(input_list)}"
    return [f"{prefix}, {_join(s)}]".encode("utf-8") for s in suffixes]


def print_circuit_ref(circuit) -> str:
    """The reference's ``str(circuit)`` (circuit_builder.py:410-414): every
    out-gate's subtree fully expanded, one tab per level — shared gates are
    re-expanded at every reference, so this is EXPONENTIAL on DAGs with
    shared sub-expressions (the reference pays the same cost).  The default
    transcript hashes the O(circuit) structural encoding instead
    (docs/TRANSCRIPTS.md); use small circuits with ref mode."""
    out = []
    for gate in circuit.out_gates():
        stack = [(gate, 0)]
        while stack:
            g, lvl = stack.pop()
            out.append("\t" * lvl + str(g) + "\n")
            for child in reversed(circuit.children(g)):
                stack.append((child, lvl + 1))
    return "".join(out)
