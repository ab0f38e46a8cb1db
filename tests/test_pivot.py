"""Pivot / compressed-pivot / nullity protocol tests.

Mirrors the reference unit tier (ac20/test/test_pivot.py, test_nullity.py):
real small groups (QR l=64 for speed, Ed25519 for the EC path), tiny fixed
witnesses, interactive + non-interactive flows.
"""

import random

import pytest

import verifiable_mpc_tpu.ac20.pivot as pivot
import verifiable_mpc_tpu.ac20.compressed_pivot as compressed_pivot
import verifiable_mpc_tpu.ac20.nullity as nullity
from verifiable_mpc_tpu.ac20.setup_gens import PivotChoice, create_generators
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve, QuadraticResidues

prng = random.Random(2026)


@pytest.fixture(scope="module", params=["QR", "Elliptic"])
def setting(request):
    if request.param == "QR":
        group = QuadraticResidues(l=64)
    else:
        group = EllipticCurve("Ed25519", "projective")
    gf = GF(group.order)
    return group, gf


def make_g(group, n):
    h = group.generator
    exps = [prng.randrange(1, group.order) for _ in range(n)]
    return [h ** e for e in exps], h


class TestPivot:
    def test_interactive(self, setting):
        group, gf = setting
        x = [gf(1), gf(2), gf(0), gf(0)]
        n = len(x)
        g, h = make_g(group, n)
        gamma = prng.randrange(group.order)
        P = pivot.vector_commitment(x, gamma, g, h)
        L = pivot.LinearForm([prng.randrange(group.order) for _ in range(n)])
        y = L(x)

        r = [prng.randrange(group.order) for _ in range(n)]
        rho = prng.randrange(group.order)
        t = L(r)
        A = pivot.vector_commitment(r, rho, g, h)
        c = prng.randrange(group.order)
        z = [c * x_i + r[i] for i, x_i in enumerate(x)]
        phi = c * gamma + rho

        assert pivot.vector_commitment(z, phi, g, h) == A * (P ** c)
        assert L(z) == c * y + t

    def test_noninteractive(self, setting):
        group, gf = setting
        x = [gf(1), gf(2), gf(0), gf(0)]
        n = len(x)
        g, h = make_g(group, n)
        gamma = prng.randrange(group.order)
        P = pivot.vector_commitment(x, gamma, g, h)
        L = pivot.LinearForm([prng.randrange(group.order) for _ in range(n)])
        y = L(x)

        z, phi, c = pivot.prove_linear_form_eval(g, h, P, L, y, x, gamma, gf)
        assert pivot.verify_linear_form_proof(g, h, P, L, y, z, phi, c)

    def test_reject_wrong_claim(self, setting):
        group, gf = setting
        x = [gf(1), gf(2), gf(0), gf(0)]
        n = len(x)
        g, h = make_g(group, n)
        gamma = prng.randrange(group.order)
        P = pivot.vector_commitment(x, gamma, g, h)
        L = pivot.LinearForm([prng.randrange(group.order) for _ in range(n)])
        y = L(x)
        z, phi, c = pivot.prove_linear_form_eval(g, h, P, L, y, x, gamma, gf)
        assert not pivot.verify_linear_form_proof(g, h, P, L, y + 1, z, phi, c)


def test_linear_form_algebra():
    lf = pivot.LinearForm([0, 1, 2])
    assert (lf + lf + 2 * lf + lf.eval([1, 1, 1]) - lf).eval([1, 2, 3]) == 27
    assert lf([1, 2, 3]) == 8
    af = pivot.AffineForm([1, 0], 5)
    assert (af - 2)([3, 9]) == 6
    assert repr(lf) == "[0, 1, 2], 0"


class TestCompressedPivot:
    def test_protocol_5_roundtrip(self, setting):
        group, gf = setting
        # n + 1 must be a power of 2 after appending phi: n = 7 -> z_hat = 8
        x = [gf(v) for v in [1, 2, 3, 4, 0, 1, 5]]
        n = len(x)
        generators = create_generators(n, PivotChoice.compressed, group)
        g, h = generators["g"], generators["h"]
        gamma = prng.randrange(group.order)
        P = pivot.vector_commitment(x, gamma, g, h)
        L = pivot.LinearForm([prng.randrange(group.order) for _ in range(n)])
        y = L(x)

        proof = compressed_pivot.protocol_5_prover(generators, P, L, y, x, gamma, gf)
        assert compressed_pivot.protocol_5_verifier(generators, P, L, y, proof, gf)
        # log2(n+1) = 3 -> folds down from 8 to 2 in 2 rounds
        assert "A0" in proof and "A1" in proof and "A2" not in proof
        assert len(proof["z_prime"]) == 2

    def test_tampered_proof_rejected(self, setting):
        group, gf = setting
        x = [gf(v) for v in [1, 2, 3, 4, 0, 1, 5]]
        n = len(x)
        generators = create_generators(n, PivotChoice.compressed, group)
        gamma = prng.randrange(group.order)
        P = pivot.vector_commitment(x, gamma, generators["g"], generators["h"])
        L = pivot.LinearForm([prng.randrange(group.order) for _ in range(n)])
        y = L(x)
        proof = compressed_pivot.protocol_5_prover(generators, P, L, y, x, gamma, gf)
        bad = dict(proof)
        bad["z_prime"] = [z + 1 for z in proof["z_prime"]]
        assert not compressed_pivot.protocol_5_verifier(generators, P, L, y, bad, gf)


class TestNullity:
    def test_noninteractive(self, setting):
        group, gf = setting
        x = [gf(1), gf(2), gf(3)]
        lin_forms = [
            pivot.LinearForm([6, 0, -2]),
            pivot.LinearForm([0, 3, -2]),
            pivot.LinearForm([2, 2, -2]),
        ]
        generators = create_generators(len(x), PivotChoice.compressed, group)
        gamma = prng.randrange(group.order)
        P = pivot.vector_commitment(x, gamma, generators["g"], generators["h"])

        proof, L, y, rho = nullity.prove_nullity_compressed(
            generators, P, lin_forms, x, gamma, gf
        )
        assert nullity.verify_nullity_compressed(
            generators, P, L, lin_forms, rho, y, proof, gf
        )

    def test_combine_with_powers_matches_naive(self, setting):
        group, gf = setting
        lin_forms = [
            pivot.LinearForm([gf(6), gf(0), gf(-2)]),
            pivot.LinearForm([gf(0), gf(3), gf(-2)]),
            pivot.LinearForm([gf(2), gf(2), gf(-2)]),
        ]
        rho = gf(prng.randrange(group.order))
        naive = sum((f) * (rho ** i) for i, f in enumerate(lin_forms))
        fast = nullity.combine_with_powers(lin_forms, rho)
        assert naive.coeffs == fast.coeffs and naive.constant == fast.constant


def test_deterministic_rng_reproducible_proof():
    from verifiable_mpc_tpu import rng as vrng

    group = QuadraticResidues(l=64)
    gf = GF(group.order)
    x = [gf(1), gf(2), gf(0), gf(0)]
    g, h = make_g(group, len(x))
    L = pivot.LinearForm([3, 1, 4, 1])
    with vrng.deterministic(7):
        gamma = 11
        P = pivot.vector_commitment(x, gamma, g, h)
        proof1 = pivot.prove_linear_form_eval(g, h, P, L, L(x), x, gamma, gf)
    with vrng.deterministic(7):
        proof2 = pivot.prove_linear_form_eval(g, h, P, L, L(x), x, gamma, gf)
    assert proof1 == proof2
