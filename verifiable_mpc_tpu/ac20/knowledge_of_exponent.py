"""Constant-size pivot from the n-power Knowledge-of-Exponent assumption.

Behavior parity with reference
/root/reference/verifiable_mpc/ac20/knowledge_of_exponent.py: trusted setup
(:50-72), [Gro10] restriction argument (:75-98), linear-form opening via the
product-polynomial coefficient trick (:101-150), and KoE nullity (:153-162).

The 2n-power setup and the Q multiexp dispatch through ``ops.dispatch`` so
they batch onto the TPU MSM kernel.
"""

from __future__ import annotations

from .. import rng
from ..groups import pairing
from ..ops.dispatch import multiexp
from ..tools import poly as qc
from . import pivot


def _pairing(a, b):
    """First input on the base curve, second on the twist
    (Pinocchio/Trinocchio notation; reference knowledge_of_exponent.py:41-47)."""
    return pairing.optimal_ate(b, a)


def vector_commitment(x, gamma, g, h):
    """Pedersen commitment (KoE flavor, reference :29-38)."""
    assert len(g) >= len(x), "Not enough generators."
    return multiexp(list(g[: len(x)]) + [h], [int(xi) for xi in x] + [int(gamma)])


def trusted_setup(_g1, _g2, n, order, progress_bar=False):
    """Powers g1^{z^i}, g2^{alpha z^i}, i = 1..2n (reference :50-72)."""
    g_exp = rng.randrange(1, order)
    alpha = rng.randrange(order)
    z = rng.randrange(order)
    g1 = _g1 ** g_exp
    g2 = (_g2 ** g_exp) ** alpha

    # z^i ladder as scalars, then two fixed-base batches
    z_powers = []
    zi = 1
    for _ in range(2 * n):
        zi = zi * z % order
        z_powers.append(zi)
    from ..ops.dispatch import batch_exp

    pp_lhs = batch_exp(g1, z_powers)
    pp_rhs = batch_exp(g2, z_powers)
    return {"pp_lhs": pp_lhs, "pp_rhs": pp_rhs}


def restriction_argument_prover(S, x, gamma, pp):
    """[Gro10] restriction argument, prover side (reference :75-91)."""
    S = list(S)
    bases_l = [pp["pp_lhs"][0]] + [pp["pp_lhs"][i + 1] for i in S]
    bases_r = [pp["pp_rhs"][0]] + [pp["pp_rhs"][i + 1] for i in S]
    exps = [int(gamma)] + [int(x[i]) for i in S]
    P = multiexp(bases_l, exps)
    pi = multiexp(bases_r, exps)
    return P, pi


def restriction_argument_verifier(P, pi, pp):
    """Pairing check e(P, g2^alpha) == e(g1, pi) (reference :94-98)."""
    return _pairing(P, pp["pp_rhs"][0]) == _pairing(pp["pp_lhs"][0], pi)


def opening_linear_form_prover(L, x, gamma, pp, P=None, pi=None):
    """ZK argument of knowledge for a linear-form opening (reference :101-131)."""
    proof = {}
    n = len(x)
    S = range(n)
    assert 2 * n - 1 <= len(pp["pp_lhs"]), (
        "Requirement does not hold: 2*len(x)-1 <= number of generators in "
        "first group."
    )
    if P is None:
        P, pi = restriction_argument_prover(S, x, gamma, pp)
    proof["P"] = P
    proof["pi"] = pi

    u = L(x)
    L_linear, u_linear = pivot.affine_to_linear(L, u, n)

    c_poly_lhs = qc.Poly([gamma] + list(x))
    c_poly_rhs = qc.Poly([L_linear.coeffs[n - (j + 1)] for j in range(n)])
    c_poly = c_poly_lhs * c_poly_rhs

    assert u_linear == c_poly.coeffs[n], "L(x) not equal to n-th coefficient of c_poly"
    c_bar = list(c_poly.coeffs)
    c_bar[n] = 0
    assert len(pp["pp_lhs"]) == 2 * n
    Q = multiexp(pp["pp_lhs"], [-int(c) for c in c_bar])
    proof["Q"] = Q
    return proof, u


def opening_linear_form_verifier(L, pp, proof, u):
    """Two pairing checks (reference :134-150)."""
    n = len(L.coeffs)
    g1 = pp["pp_lhs"][0]
    g2 = pp["pp_rhs"][0]
    L_linear, u_linear = pivot.affine_to_linear(L, u, n)
    P, pi, Q = proof["P"], proof["pi"], proof["Q"]
    verification = {}
    verification["restriction_arg_check"] = restriction_argument_verifier(P, pi, pp)
    R = multiexp(
        [pp["pp_rhs"][j] for j in range(n)],
        [int(L_linear.coeffs[n - (j + 1)]) for j in range(n)],
    )
    check_lhs = _pairing(P, R) * _pairing(Q, g2)
    check_rhs = _pairing(g1, pp["pp_rhs"][n] ** int(u_linear))
    verification["PRQ_check"] = check_lhs == check_rhs
    return verification


def prove_nullity_koe(pp, lin_forms, x, gamma, gf, P, pi):
    """Nullity via the KoE opening (reference :153-162)."""
    input_list = [P, lin_forms]
    rho = pivot.fiat_shamir_hash(input_list, gf.order)
    L = sum((form_i) * (rho ** i) for i, form_i in enumerate(lin_forms))
    L = pivot.LinearForm([gf(c) if isinstance(c, int) else c for c in L.coeffs])
    proof, u = opening_linear_form_prover(L, x, gamma, pp, P, pi)
    return proof, L, u
