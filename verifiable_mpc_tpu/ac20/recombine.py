"""Lagrange recombination vectors and share recombination.

Behavior parity with reference /root/reference/verifiable_mpc/ac20/recombine.py
(cached coefficient matrices over arbitrary evaluation points; used both for
MPC share recombination and as plain Lagrange-basis evaluation inside the
linear-form construction).
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=None)
def _recombination_vectors(field, xs, xr):
    """Lagrange coefficient matrix: rows = targets xr, columns = nodes xs."""
    modulus = field.modulus
    xs = [x % modulus for x in xs]
    xr = [x % modulus for x in xr]
    d = [None] * len(xs)
    for i, x_i in enumerate(xs):
        q = 1
        for j, x_j in enumerate(xs):
            if i != j:
                q = q * (x_i - x_j) % modulus
        d[i] = q
    matrix = [None] * len(xr)
    for r, x_r in enumerate(xr):
        matrix[r] = [None] * len(xs)
        p = 1
        for x_j in xs:
            p = p * (x_r - x_j) % modulus
        p = field(p)
        for i, x_i in enumerate(xs):
            matrix[r][i] = (p / field((x_r - x_i) * d[i])).value
    return matrix


def recombine(field, points, x_rs=0):
    """Recombine shares given by (x, share) points at x-coordinates x_rs."""
    xs, shares = list(zip(*points))
    scalar_output = not isinstance(x_rs, list)
    if scalar_output:
        x_rs = (x_rs,)
    m = len(shares)
    width = len(x_rs)
    T_is_field = isinstance(shares[0], field)
    vector = _recombination_vectors(field, tuple(xs), tuple(x_rs))
    sums = [0] * width
    for i in range(m):
        s = shares[i]
        if T_is_field:
            s = s.value
        for r in range(width):
            sums[r] += s * vector[r][i]
    sums = [field(s) for s in sums]
    if scalar_output:
        return sums[0]
    return sums
