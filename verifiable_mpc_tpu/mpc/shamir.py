"""Shamir secret sharing over prime fields.

Replaces the reference's dependency on MPyC's thresha machinery
(SURVEY.md "MPyC API surface"): random polynomial sharing, recombination at
arbitrary points, and the Lagrange coefficients used for exponent-space
recombination (reference demos/demo_zkp_trinocchio.py:87-94).
"""

from __future__ import annotations

import random as _random

from ..ac20.recombine import _recombination_vectors

_sysrand = _random.SystemRandom()


def share(field, secret, m, t, rnd=None):
    """Shamir-share `secret` into m shares with threshold t (degree-t poly).

    Returns list of share values (ints mod field.modulus), share i belongs
    to party i and is the evaluation at x = i + 1.
    """
    rnd = rnd or _sysrand
    p = field.modulus
    secret = int(secret) % p
    coeffs = [secret] + [rnd.randrange(p) for _ in range(t)]
    shares = []
    for i in range(1, m + 1):
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * i + c) % p
        shares.append(acc)
    return shares


def recombination_vector(field, m, x_r=0):
    """Lagrange coefficients to interpolate at x_r from points 1..m."""
    return _recombination_vectors(field, tuple(range(1, m + 1)), (x_r,))[0]


def recombine_at_zero(field, shares):
    """Interpolate the secret (x=0) from all m shares."""
    m = len(shares)
    vec = recombination_vector(field, m)
    p = field.modulus
    acc = 0
    for s, lam in zip(shares, vec):
        acc = (acc + int(s) * lam) % p
    return field(acc)
