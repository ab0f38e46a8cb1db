"""Group zoo: Ed25519, BN256 (+twist), quadratic residues.

Factory parity with ``mpyc.fingroups``: ``EllipticCurve(name, coords)`` and
``QuadraticResidues(l=...)`` (reference demos/demo_zkp_ac20.py:22,36-51).
Coordinate-system arguments are accepted for API compatibility; internally
Ed25519 uses extended twisted-Edwards coordinates and the BN curves use
jacobian coordinates.
"""

from .base import FiniteGroupElement
from .edwards import EdwardsPoint, edwards_group
from .bn256 import BNPoint, BNTwistPoint
from .qr import QuadraticResidues, find_safe_prime

EllipticCurvePoint = (EdwardsPoint, BNPoint, BNTwistPoint)  # isinstance tuple


def EllipticCurve(curvename: str, coordinates: str = None):
    if curvename == "Ed25519":
        return edwards_group("Ed25519", coordinates or "projective")
    if curvename == "BN256":
        return BNPoint
    if curvename == "BN256_twist":
        return BNTwistPoint
    raise ValueError(f"unsupported curve: {curvename}")


def is_elliptic(element) -> bool:
    return isinstance(element, EllipticCurvePoint)


__all__ = [
    "FiniteGroupElement",
    "EllipticCurve",
    "EllipticCurvePoint",
    "QuadraticResidues",
    "find_safe_prime",
    "EdwardsPoint",
    "BNPoint",
    "BNTwistPoint",
    "is_elliptic",
]
