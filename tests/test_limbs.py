"""Limb-arithmetic kernel tests: random vectors vs Python bigints
(SURVEY.md §7 oracle for layer 1)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from verifiable_mpc_tpu.ops import limbs as lb

ED_P = 2**255 - 19
ED_L = 2**252 + 27742317777372353535851937790883648493
BN_P = __import__(
    "verifiable_mpc_tpu.groups.bn256", fromlist=["P"]
).P

rng = random.Random(31337)


@pytest.mark.parametrize("p", [ED_P, ED_L, BN_P])
def test_mont_mul_matches_bigint(p):
    ctx = lb.mont_ctx(p)
    n = 32
    xs = [rng.randrange(p) for _ in range(n)]
    ys = [rng.randrange(p) for _ in range(n)]
    xm = ctx.encode(xs)
    ym = ctx.encode(ys)
    prod = ctx.decode(ctx.mul(xm, ym))
    assert prod == [x * y % p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("p", [ED_P, BN_P])
def test_add_sub_neg(p):
    ctx = lb.mont_ctx(p)
    n = 32
    xs = [rng.randrange(p) for _ in range(n)]
    ys = [rng.randrange(p) for _ in range(n)]
    # add/sub are domain-agnostic; test on plain encodings
    xa = jnp.asarray(lb.ints_to_limbs(xs))
    ya = jnp.asarray(lb.ints_to_limbs(ys))
    assert lb.limbs_to_ints(np.asarray(ctx.add(xa, ya))) == [
        (x + y) % p for x, y in zip(xs, ys)
    ]
    assert lb.limbs_to_ints(np.asarray(ctx.sub(xa, ya))) == [
        (x - y) % p for x, y in zip(xs, ys)
    ]
    assert lb.limbs_to_ints(np.asarray(ctx.neg(xa))) == [(-x) % p for x in xs]


def test_mul_wide_edges():
    a = jnp.asarray(lb.ints_to_limbs([0, 1, 2**256 - 1, 2**255]))
    b = jnp.asarray(lb.ints_to_limbs([0, 2**256 - 1, 2**256 - 1, 2]))
    wide = lb.mul_wide(a, b)
    expected = [0, 2**256 - 1, (2**256 - 1) ** 2, 2**256]
    got = [lb.limbs_to_int(np.asarray(wide)[i]) for i in range(4)]
    assert got == expected


def test_roundtrip_conversions():
    xs = [0, 1, ED_P - 1, rng.randrange(ED_P)]
    arr = lb.ints_to_limbs(xs)
    assert lb.limbs_to_ints(arr) == xs
    assert lb.limbs_to_int(lb.int_to_limbs(12345678901234567890)) == 12345678901234567890


@pytest.mark.parametrize("p", [ED_P])
def test_mont_encode_decode_roundtrip(p):
    ctx = lb.mont_ctx(p)
    xs = [0, 1, p - 1, rng.randrange(p)]
    assert ctx.decode(ctx.encode(xs)) == xs
