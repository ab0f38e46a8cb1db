"""Fast polynomial algorithm tests vs naive implementations."""

import random

from verifiable_mpc_tpu.groups.bn256 import ORDER as P
from verifiable_mpc_tpu.tools import fastpoly as fp

rng = random.Random(88)


def naive_mul(a, b, p):
    o = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            o[i + j] = (o[i + j] + ai * bj) % p
    return o


def test_inv_series():
    f = [rng.randrange(1, P)] + [rng.randrange(P) for _ in range(40)]
    k = 37
    g = fp.poly_inv_series(f, k, P)
    prod = naive_mul(f, g, P)[:k]
    assert prod == [1] + [0] * (k - 1)


def test_divmod_matches_naive():
    for da, db in [(10, 3), (100, 40), (130, 65)]:
        a = [rng.randrange(P) for _ in range(da + 1)]
        b = [rng.randrange(P) for _ in range(db)] + [rng.randrange(1, P)]
        q, r = fp.poly_divmod(a, b, P)
        recomposed = fp.poly_add(naive_mul(b, q, P), r, P)
        assert fp._trim([c % P for c in recomposed]) == fp._trim(a)


def test_multipoint_eval():
    f = [rng.randrange(P) for _ in range(150)]
    points = [rng.randrange(P) for _ in range(130)]
    got = fp.multipoint_eval(f, points, P)
    assert got == [fp._horner(f, u, P) for u in points]


def test_interpolate_roundtrip():
    n = 129  # odd-ish size exercises the unbalanced tree
    points = random.Random(3).sample(range(1, 10**6), n)
    values = [rng.randrange(P) for _ in range(n)]
    coeffs = fp.interpolate(points, values, P)
    assert len(coeffs) <= n
    evals = fp.multipoint_eval(coeffs, points, P)
    assert evals == values


def test_interpolate_matches_naive_small_domain():
    # the 1..m domain used by calculate_fgh_polys (reference :380-388)
    n = 70
    points = list(range(1, n + 1))
    values = [rng.randrange(P) for _ in range(n)]
    fast = fp.interpolate(points, values, P)
    naive = fp._naive_interpolate(points, values, P)
    assert fp._trim(fast) == fp._trim(naive)


def test_shift_evaluations_matches_horner():
    # the fgh geometry: f sampled at 1..m+1, extended to 0 and m+2..2m
    m = 150
    coeffs = [rng.randrange(P) for _ in range(m + 1)]
    vals = [fp._horner(coeffs, k, P) for k in range(1, m + 2)]
    f0 = fp.shift_evaluations(vals, 1, 0, 1, P)
    assert f0 == [fp._horner(coeffs, 0, P)]
    hi = fp.shift_evaluations(vals, 1, m + 2, m - 1, P)
    assert hi == [fp._horner(coeffs, t, P) for t in range(m + 2, 2 * m + 1)]


def test_batch_inverse():
    xs = [rng.randrange(1, P) for _ in range(37)]
    invs = fp.batch_inverse(xs, P)
    assert all(x * i % P == 1 for x, i in zip(xs, invs))


def test_shift_evaluations_native_matches_python():
    """The C implementation (native/modvec.cc vmpc_shift_evaluations) must
    agree with the pure-Python closed form on the same inputs."""
    from verifiable_mpc_tpu import native

    if not native.available():
        import pytest

        pytest.skip("no C toolchain")
    m = 260  # above _FAST_THRESHOLD: the dispatcher takes the C path
    vals = [rng.randrange(P) for _ in range(m + 1)]
    for base, target, count in ((1, 0, 1), (1, m + 2, m - 1), (5, 300, 40)):
        got = fp.shift_evaluations(vals, base, target, count, P)
        # force the pure-Python branch via the threshold guard
        saved = fp._FAST_THRESHOLD
        fp._FAST_THRESHOLD = 1 << 30
        try:
            expect = fp.shift_evaluations(vals, base, target, count, P)
        finally:
            fp._FAST_THRESHOLD = saved
        assert got == expect
