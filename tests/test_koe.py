"""KoE pivot tests (mirror of reference ac20/test/test_koe.py)."""

import random

import pytest

import verifiable_mpc_tpu.ac20.knowledge_of_exponent as koe
import verifiable_mpc_tpu.ac20.pivot as pivot
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve

rng = random.Random(5)

group1 = EllipticCurve("BN256", "projective")
group2 = EllipticCurve("BN256_twist", "projective")
order = group1.order
gf = GF(order)


def test_open_linear_form_koe():
    x = [gf(1), gf(2), gf(0), gf(0)]
    n = len(x)
    gamma = gf(rng.randrange(1, order))
    pp = koe.trusted_setup(group1.generator, group2.generator, n, order)
    L = pivot.LinearForm([gf(rng.randrange(order)) for _ in range(n)])

    P, pi = koe.restriction_argument_prover(range(n), x, gamma, pp)
    assert koe.restriction_argument_verifier(P, pi, pp)
    proof, u = koe.opening_linear_form_prover(L, x, gamma, pp, P, pi)
    verification = koe.opening_linear_form_verifier(L, pp, proof, u)
    assert all(verification.values())


def test_nullity_koe():
    x = [gf(1), gf(2), gf(3)]
    n = len(x)
    gamma = gf(rng.randrange(1, order))
    lin_forms = [
        pivot.LinearForm([6, 0, -2]),
        pivot.LinearForm([0, 3, -2]),
        pivot.LinearForm([2, 2, -2]),
    ]
    pp = koe.trusted_setup(group1.generator, group2.generator, n, order)
    P, pi = koe.restriction_argument_prover(range(n), x, gamma, pp)
    proof, L, u = koe.prove_nullity_koe(pp, lin_forms, x, gamma, gf, P, pi)
    verification = koe.opening_linear_form_verifier(L, pp, proof, u)
    assert all(verification.values())


def test_wrong_opening_rejected():
    x = [gf(1), gf(2), gf(0), gf(0)]
    n = len(x)
    gamma = gf(rng.randrange(1, order))
    pp = koe.trusted_setup(group1.generator, group2.generator, n, order)
    L = pivot.LinearForm([gf(rng.randrange(order)) for _ in range(n)])
    P, pi = koe.restriction_argument_prover(range(n), x, gamma, pp)
    proof, u = koe.opening_linear_form_prover(L, x, gamma, pp, P, pi)
    verification = koe.opening_linear_form_verifier(L, pp, proof, u + 1)
    assert not verification["PRQ_check"]
