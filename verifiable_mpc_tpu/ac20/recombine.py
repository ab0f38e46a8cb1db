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
    """Lagrange coefficient matrix: rows = targets xr, columns = nodes xs.

    For consecutive-integer node sets (the 0..m ranges used throughout the
    circuit-satisfiability layer) an O(n)-per-target prefix/suffix-product
    fast path replaces the generic O(n^2) construction — required at
    2^16-gate scale.
    """
    modulus = field.modulus
    if len(xs) > 64 and all(
        xs[i + 1] - xs[i] == 1 for i in range(len(xs) - 1)
    ):
        return [_lagrange_row_consecutive(field, xs, x_r) for x_r in xr]
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


def _lagrange_row_consecutive(field, xs, x_r):
    """lambda_i(x_r) for consecutive nodes xs = a..a+n-1, in O(n).

    lambda_i = prod_{j != i} (x_r - x_j) / (x_i - x_j); for consecutive nodes
    the denominator is (-1)^(n-1-i) * i! * (n-1-i)!.

    The C tier runs the identical algorithm (same reduced integers — these
    rows are transcript-visible through the unreduced-int form coefficients
    that weight them); the Python big-int loops below are the fallback.
    """
    modulus = field.modulus
    if len(xs) >= 4096 and (1 << 192) <= modulus < (1 << 256):
        from .. import native

        if native.SCALAR_TIER:
            return native.lagrange_consecutive(
                modulus, xs[0], len(xs), x_r
            )
    n = len(xs)
    x_r = x_r % modulus
    diffs = [(x_r - x_j) % modulus for x_j in xs]
    prefix = [1] * (n + 1)
    for i in range(n):
        prefix[i + 1] = prefix[i] * diffs[i] % modulus
    suffix = [1] * (n + 1)
    for i in range(n - 1, -1, -1):
        suffix[i] = suffix[i + 1] * diffs[i] % modulus
    fact = [1] * n
    for i in range(1, n):
        fact[i] = fact[i - 1] * i % modulus
    # all factorial inverses from ONE modular inversion
    inv_fact = [1] * n
    inv_fact[n - 1] = pow(fact[n - 1], -1, modulus)
    for i in range(n - 1, 0, -1):
        inv_fact[i - 1] = inv_fact[i] * i % modulus
    row = [0] * n
    for i in range(n):
        num = prefix[i] * suffix[i + 1] % modulus
        inv_denom = inv_fact[i] * inv_fact[n - 1 - i] % modulus
        if (n - 1 - i) % 2 == 1:
            inv_denom = modulus - inv_denom
        row[i] = num * inv_denom % modulus
    return row


def recombine(field, points, x_rs=0):
    """Recombine shares given by (x, share) points at x-coordinates x_rs."""
    xs, shares = list(zip(*points))
    scalar_output = not isinstance(x_rs, list)
    if scalar_output:
        x_rs = (x_rs,)
    m = len(shares)
    width = len(x_rs)
    T_is_field = isinstance(shares[0], field)
    if (
        m * width > 1 << 12
        and all(isinstance(s, (int, field)) for s in shares)
        and list(xs) == list(range(xs[0], xs[0] + m))
        and list(x_rs) == list(range(x_rs[0], x_rs[0] + width))
        and (x_rs[0] > xs[-1] or x_rs[-1] < xs[0])
    ):
        # CONSECUTIVE nodes and targets (the f/g share extrapolation to
        # m+1..2m, reference mpc_ac20.py:326-336): one closed-form
        # convolution instead of the O(m log^2 m) subproduct tree — the
        # tree's ~2k small NTT calls were half the MPC party wall time
        from ..tools import fastpoly

        vals = [
            (s.value if isinstance(s, field) else int(s)) % field.modulus
            for s in shares
        ]
        out = fastpoly.shift_evaluations(
            vals, xs[0], x_rs[0], width, field.modulus
        )
        sums = [field(v) for v in out]
        return sums[0] if scalar_output else sums
    if m * width > 1 << 16 and all(
        isinstance(s, (int, field)) for s in shares
    ):
        # large extrapolations (share values at m+1..2m, reference
        # mpc_ac20.py:334-336): interpolate + multi-point evaluate in
        # O(m log^2 m) instead of applying an O(m x width) matrix
        from ..tools import fastpoly

        vals = [
            (s.value if isinstance(s, field) else int(s)) % field.modulus
            for s in shares
        ]
        coeffs = fastpoly.interpolate(list(xs), vals, field.modulus)
        sums = [
            field(v) for v in fastpoly.multipoint_eval(coeffs, list(x_rs), field.modulus)
        ]
        return sums[0] if scalar_output else sums
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
