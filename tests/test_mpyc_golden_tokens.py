"""Vendored golden repr tokens pinning assumptions A1-A7 (ref_transcript).

The reference hashes ``str(input_list)`` — Python reprs of MPyC objects
(reference pivot.py:131-136).  MPyC is not installable here, so
ac20/ref_transcript.py's encoding rules A1-A7 were DERIVED from MPyC's
source.  This module freezes the exact tokens those rules produce for
pinned values, so that

1. any drift in the encoder is a visible protocol break (tokens are
   hard-coded strings, not round-trips through the encoder), and
2. the day MPyC is importable, the SAME pinned values are fed through real
   ``mpyc.finfields`` / ``mpyc.fingroups`` / ``mpyc.gfpx`` objects and the
   ``str()`` output is compared token-for-token (``test_live_mpyc_*`` below
   run automatically then; today they skip).

Derivations per assumption:

A1  finfields.PrimeFieldElement.__repr__ -> decimal of ``int(self)``,
    signed iff ``is_signed`` (default True; the reference demos turn it
    OFF explicitly where unsigned is wanted, demo_zkp_pynocchio.py:42).
A2  fingroups.FiniteGroupElement.__repr__ -> ``f'{self.value}'``; for
    elliptic-curve points ``value`` is the coordinate tuple ``(x, y, z)``
    (projective/jacobian).  Forced value-based: the reference verifier
    re-hashes recomputed points (compressed_pivot.py:166-169), which an
    identity-based repr could never verify.
A3  The curve coordinate field is ``finfields.GF(p)`` with default
    ``is_signed=True`` -> coordinates repr signed.
A4  QuadraticResidues elements repr as their residue per A1/A3.
A5  finfields.ExtensionFieldElement.__repr__ -> ``f'{self.value}'`` with
    ``value`` a ``gfpx.Polynomial``.
A6  gfpx.Polynomial term strings: descending degree, '+'-joined, zero
    terms skipped, unit coefficients omitted, no '*', coefficients
    canonical residues in {0..p-1} (gfpx has no signed mode), zero
    polynomial '0'.
A7  BN256-twist points: A2 tuple of A5/A6 coordinates.
"""

import pytest

import verifiable_mpc_tpu.ac20.ref_transcript as rt
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups.bn256 import GFp2, P as BN_P
from verifiable_mpc_tpu.groups.edwards import EdwardsPoint, P as ED_P
from verifiable_mpc_tpu.groups.qr import QuadraticResidues

try:  # live-MPyC comparison leg (runs when MPyC becomes installable)
    import mpyc.finfields as mpyc_finfields
    import mpyc.fingroups as mpyc_fingroups
    import mpyc.gfpx as mpyc_gfpx
except ImportError:  # pragma: no cover - the expected state here
    mpyc_finfields = mpyc_fingroups = mpyc_gfpx = None

needs_mpyc = pytest.mark.skipif(
    mpyc_finfields is None, reason="MPyC not installed (BASELINE.md)"
)

# --------------------------------------------------------------------------
# pinned values -> frozen tokens
# --------------------------------------------------------------------------

# A1: prime field, signed default.  (value, modulus) -> token
PRIME_FIELD_TOKENS = [
    ((5, 11), "5"),
    ((6, 11), "-5"),  # 6 > 11//2: signed representative
    ((0, 11), "0"),
    ((10, 11), "-1"),
    ((ED_P - 1, ED_P), "-1"),
    ((ED_P // 2, ED_P), str(ED_P // 2)),  # largest non-negative
    ((ED_P // 2 + 1, ED_P), str(ED_P // 2 + 1 - ED_P)),  # smallest negative
]

# A2/A3: Ed25519 base point, projective (x, y, z) with signed coordinates.
# x(B) < p/2 prints positive; y(B) = 4/5 mod p > p/2 prints negative.
ED_GEN_TOKEN = (
    "(15112221349535400772501151409588531511454012693041857206046113283949847762202, "
    "-11579208923731619542357098500868790785326998466564056403945758400791312963989, "
    "1)"
)

# A6: gfpx term strings for c1*x + c0 over GF(BN_P).
GFPX_TOKENS = [
    ((0, 0), "0"),
    ((5, 0), "5"),
    ((0, 1), "x"),
    ((3, 1), "x+3"),  # xi = i + 3, reference pairing.py:57
    ((7, 2), "2x+7"),
    ((0, 9), "9x"),
    ((BN_P - 1, BN_P - 1), f"{BN_P - 1}x+{BN_P - 1}"),  # unsigned residues
]


def test_prime_field_tokens_pinned():
    for (v, p), token in PRIME_FIELD_TOKENS:
        gf = GF(p)
        assert rt.ref_repr(gf(v)) == token, (v, p)


def test_ed25519_generator_token_pinned():
    assert rt.ref_repr(EdwardsPoint.generator) == ED_GEN_TOKEN
    # normalization is the identity on the affine-constructed generator
    assert rt.ref_repr(EdwardsPoint.generator.normalize()) == ED_GEN_TOKEN


def test_qr_tokens_pinned():
    group = QuadraticResidues(l=64)
    p = group.modulus
    assert p == 9223372036854778487  # pinned modulus for l=64
    assert rt.ref_repr(group.generator) == "4"
    assert rt.ref_repr(group.generator**5) == "1024"
    # a signed case: v > p/2 reprs as v - p (A4 via A1)
    big = group.generator ** ((p - 1) // 2 - 1)
    v = big.value
    expect = str(v - p) if v > p // 2 else str(v)
    assert rt.ref_repr(big) == expect


def test_gfpx_tokens_pinned():
    for (c0, c1), token in GFPX_TOKENS:
        assert rt.ref_repr(GFp2(c0, c1)) == token, (c0, c1)


# --------------------------------------------------------------------------
# live-MPyC legs: same pinned values through real MPyC objects
# --------------------------------------------------------------------------


@needs_mpyc
def test_live_mpyc_prime_field_reprs():  # pragma: no cover - needs MPyC
    for (v, p), token in PRIME_FIELD_TOKENS:
        gf = mpyc_finfields.GF(p)
        assert f"{gf(v)}" == token, (v, p)


@needs_mpyc
def test_live_mpyc_ed25519_repr():  # pragma: no cover - needs MPyC
    curve = mpyc_fingroups.EllipticCurve("Ed25519", coordinates="projective")
    g = curve.generator
    assert f"{g}" == ED_GEN_TOKEN


@needs_mpyc
def test_live_mpyc_gfpx_reprs():  # pragma: no cover - needs MPyC
    poly_cls = mpyc_gfpx.GFpX(BN_P)
    for (c0, c1), token in GFPX_TOKENS:
        assert f"{poly_cls([c0, c1])}" == token, (c0, c1)
    # and through the extension FIELD element (A5)
    gf2 = mpyc_finfields.GF(poly_cls("x^2+1"))
    for (c0, c1), token in GFPX_TOKENS:
        assert f"{gf2([c0, c1])}" == token, (c0, c1)


@needs_mpyc
def test_live_mpyc_qr_repr():  # pragma: no cover - needs MPyC
    group = mpyc_fingroups.QuadraticResidues(l=64)
    assert group.order * 2 + 1 == 9223372036854778487
    assert f"{group.generator}" == "4"
