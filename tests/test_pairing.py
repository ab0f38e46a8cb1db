"""Pairing tests: bilinearity, non-degeneracy, identity handling."""

import random

from verifiable_mpc_tpu.groups.bn256 import BNPoint, BNTwistPoint, ORDER
from verifiable_mpc_tpu.groups.pairing import GFP12_ONE, optimal_ate

rng = random.Random(99)


def test_nondegenerate():
    e = optimal_ate(BNTwistPoint.generator, BNPoint.generator)
    assert not e.is_one()
    assert e.exp(ORDER).is_one()


def test_bilinearity():
    g1 = BNPoint.generator
    g2 = BNTwistPoint.generator
    a = rng.randrange(1, ORDER)
    b = rng.randrange(1, ORDER)
    lhs = optimal_ate(g2 ** a, g1 ** b)
    rhs = optimal_ate(g2, g1).exp(a * b % ORDER)
    assert lhs == rhs
    # split across the two arguments
    assert optimal_ate(g2 ** a, g1) == optimal_ate(g2, g1 ** a)


def test_identity_pairs_to_one():
    assert optimal_ate(BNTwistPoint.identity, BNPoint.generator) == GFP12_ONE
    assert optimal_ate(BNTwistPoint.generator, BNPoint.identity) == GFP12_ONE
