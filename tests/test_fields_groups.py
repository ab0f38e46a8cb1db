"""Algebra substrate tests: prime fields, GF(p^2), Ed25519, BN256, QR.

Oracle style mirrors the reference's unit tier (SURVEY.md §4): real groups,
tiny witnesses, plus randomized checks against Python-int arithmetic.
"""

import random

import pytest

from verifiable_mpc_tpu.fields import GF, GF2
from verifiable_mpc_tpu.groups import (
    EllipticCurve,
    QuadraticResidues,
)
from verifiable_mpc_tpu.groups.bn256 import ORDER as BN_ORDER, P as BN_P, TRACE

rng = random.Random(12345)


class TestPrimeField:
    def test_ops_match_int_arithmetic(self):
        p = 2**61 - 1
        gf = GF(p)
        for _ in range(50):
            a, b = rng.randrange(p), rng.randrange(1, p)
            assert (gf(a) + gf(b)).value == (a + b) % p
            assert (gf(a) - gf(b)).value == (a - b) % p
            assert (gf(a) * gf(b)).value == (a * b) % p
            assert (gf(a) / gf(b)).value == a * pow(b, -1, p) % p
            assert (gf(a) ** 5).value == pow(a, 5, p)
            assert (gf(a) ** -1).value == pow(a, -1, p) if a else True

    def test_signed_repr(self):
        gf = GF(11)
        assert repr(gf(3)) == "3"
        assert repr(gf(10)) == "-1"  # signed representative by default
        gf.is_signed = False
        try:
            assert repr(gf(10)) == "10"
        finally:
            gf.is_signed = True

    def test_int_mixing(self):
        gf = GF(101)
        assert gf(5) + 3 == gf(8)
        assert 3 + gf(5) == gf(8)
        assert 2 * gf(5) == gf(10)
        assert sum([gf(1), gf(2)]) == gf(3)  # __radd__ with int 0
        assert gf(5) == 5 and 5 == gf(5).value


class TestGF2:
    def test_field_axioms(self):
        gf2 = GF2(BN_P)
        for _ in range(20):
            a = gf2(rng.randrange(BN_P), rng.randrange(BN_P))
            b = gf2(rng.randrange(BN_P), rng.randrange(BN_P))
            assert (a + b) - b == a
            assert (a * b) / b == a
            assert a * a.reciprocal() == gf2(1)
            sq = a * a
            r = sq.sqrt()
            assert r * r == sq

    def test_i_squared(self):
        gf2 = GF2(BN_P)
        i = gf2(0, 1)
        assert i * i == gf2(-1 % BN_P, 0)


class TestEd25519:
    def test_group_law(self):
        group = EllipticCurve("Ed25519", "projective")
        g = group.generator
        assert g.is_on_curve()
        assert (g ** 2) * g == g ** 3
        assert g ** group.order == group.identity
        a, b = rng.randrange(group.order), rng.randrange(group.order)
        assert (g ** a) * (g ** b) == g ** ((a + b) % group.order)
        assert (g ** a) ** -1 == g ** (group.order - a)
        # additive notation (Pinocchio style)
        assert g + g == g ** 2
        assert 3 * g == g ** 3
        n = (g ** a).normalize()
        assert n == g ** a and n.z == 1

    def test_identity(self):
        group = EllipticCurve("Ed25519")
        assert group.identity * group.generator == group.generator
        assert group.generator ** 0 == group.identity


class TestBN256:
    def test_g1(self):
        group = EllipticCurve("BN256", "jacobian")
        g = group.generator
        assert g.is_on_curve()
        assert g ** BN_ORDER == group.identity
        assert BN_P + 1 - TRACE == BN_ORDER
        a = rng.randrange(BN_ORDER)
        q = g ** a
        assert q.is_on_curve()
        assert (q * g) == g ** (a + 1)
        assert q + (-q) == group.identity

    def test_twist(self):
        group = EllipticCurve("BN256_twist", "jacobian")
        g2 = group.generator
        assert g2.is_on_curve()
        assert g2 ** BN_ORDER == group.identity
        assert g2 ** 5 != group.identity
        a = rng.randrange(BN_ORDER)
        assert (g2 ** a) * (g2 ** (BN_ORDER - a)) == group.identity


class TestQR:
    def test_small_group(self):
        group = QuadraticResidues(l=64)
        g = group.generator
        assert g ** group.order == group.identity
        assert 2 * group.order + 1 == group.modulus
        a, b = rng.randrange(group.order), rng.randrange(group.order)
        assert (g ** a) * (g ** b) == g ** ((a + b) % group.order)

    def test_1024_is_rfc_prime(self):
        group = QuadraticResidues(l=1024)
        assert group.modulus.bit_length() == 1024
        g = group.generator
        assert g ** group.order == group.identity
