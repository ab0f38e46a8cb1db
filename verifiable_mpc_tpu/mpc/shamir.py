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


def sqrt_mod(a: int, p: int) -> int:
    """Canonical square root of a quadratic residue mod odd prime p
    (Tonelli-Shanks; the smaller of the two roots, so every party computes
    the same value from the same public input)."""
    a %= p
    if a == 0:
        return 0
    assert pow(a, (p - 1) // 2, p) == 1, "not a quadratic residue"
    if p % 4 == 3:
        r = pow(a, (p + 1) // 4, p)
        return min(r, p - r)
    # write p - 1 = q * 2^s with q odd
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    # any quadratic non-residue z (deterministic scan keeps parties in sync)
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        t2, i = t, 0
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return min(r, p - r)
