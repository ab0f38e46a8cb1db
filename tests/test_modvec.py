"""Oracle tests: native Barrett vector mod-p ops vs Python bigint."""

import random

import pytest

from verifiable_mpc_tpu import native
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.ops import modvec

ED_ELL = 2**252 + 27742317777372353535851937790883648493
BN_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native tier unavailable"
)


@pytest.fixture(autouse=True)
def _scalar_tier():
    saved = native.SCALAR_TIER
    native.enable_scalar_tier()
    yield
    native.SCALAR_TIER = saved


@pytest.mark.parametrize("p", [ED_ELL, BN_R, (1 << 255) - 19])
def test_mod_dot_oracle(p):
    rng = random.Random(1234)
    for n in (1, 2, 33, 257):
        a = [rng.randrange(p) for _ in range(n)]
        b = [rng.randrange(p) for _ in range(n)]
        assert native.mod_dot(a, b, p) == sum(
            x * y for x, y in zip(a, b)
        ) % p


def test_mod_dot_unreduced_inputs():
    p = BN_R
    rng = random.Random(5)
    a = [rng.randrange(1 << 256) for _ in range(64)]  # not reduced
    b = [-rng.randrange(1 << 255) for _ in range(64)]  # negative
    assert native.mod_dot(a, b, p) == sum(x * y for x, y in zip(a, b)) % p


@pytest.mark.parametrize("p", [ED_ELL, BN_R])
def test_mod_axpy_scale_hadamard(p):
    rng = random.Random(99)
    n = 123
    c = rng.randrange(p)
    x = [rng.randrange(p) for _ in range(n)]
    y = [rng.randrange(p) for _ in range(n)]
    assert native.mod_axpy(c, x, y, p) == [
        (c * xi + yi) % p for xi, yi in zip(x, y)
    ]
    assert native.mod_scale(c, x, p) == [c * xi % p for xi in x]
    assert native.mod_hadamard(x, y, p) == [
        xi * yi % p for xi, yi in zip(x, y)
    ]


def test_mod_weighted_sum():
    p = ED_ELL
    rng = random.Random(7)
    s, n = 9, 65
    w = [rng.randrange(p) for _ in range(s)]
    rows = [[rng.randrange(p) for _ in range(n)] for _ in range(s)]
    out = native.mod_weighted_sum(w, rows, p)
    for j in range(n):
        assert out[j] == sum(w[i] * rows[i][j] for i in range(s)) % p


def test_helpers_type_guards():
    gf = GF(BN_R)
    n = 64
    rng = random.Random(3)
    coeffs = [gf(rng.randrange(BN_R)) for _ in range(n)]
    values = [rng.randrange(BN_R) for _ in range(n)]

    d = modvec.dot(coeffs, values, gf)
    ref = 0
    for c, v in zip(coeffs, values):
        ref = c * v + ref
    assert type(d) is gf and d == ref

    # int coeffs -> guard trips (Python result would be an unreduced int)
    assert modvec.dot(values, values, gf) is None
    # mixed-field coeffs -> guard trips
    other = GF(ED_ELL)
    bad = coeffs[:-1] + [other(1)]
    assert modvec.dot(bad, values, gf) is None

    z = modvec.axpy(5, coeffs, values, gf)
    assert z == [5 * c + v for c, v in zip(coeffs, values)]
    assert all(type(e) is gf for e in z)
    assert modvec.axpy(5, values, values, gf) is None  # int x-vector

    sc = modvec.scale(gf(7), coeffs, gf)
    assert sc == [gf(7) * c for c in coeffs]

    w = [3, gf(11)]
    rows = [coeffs, [gf(rng.randrange(BN_R)) for _ in range(n)]]
    ws = modvec.weighted_sum(w, rows, gf)
    for j in range(5):
        assert ws[j] == 3 * rows[0][j] + gf(11) * rows[1][j]

    h = modvec.hadamard(coeffs, rows[1], gf)
    assert h == [a * b for a, b in zip(coeffs, rows[1])]
