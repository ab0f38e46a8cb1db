"""AC20 Pi_Nullity: amortize many linear forms into one opening.

Behavior parity with reference /root/reference/verifiable_mpc/ac20/nullity.py:
combine s forms with powers of a Fiat-Shamir rho, then run the compressed
pivot on the single combined form.

The rho-power combination is done columnwise (one pass over the coefficient
matrix) instead of building s intermediate forms — same result, linear work.
"""

from __future__ import annotations

from ..ops import modvec
from . import compressed_pivot
from . import pivot


def combine_forms_with_powers(lin_forms, rho, gf):
    """sum_i rho^i * L_i — the nullity combine (reference nullity.py:24,
    circuit_sat_r1cs.py:489-505) with the O(s*n) coefficient work routed
    through the native columnwise kernel when every coefficient is a gf
    element (or sparse int 0).  Result is value- and byte-identical to the
    reference expression ``sum(form_i * rho**i)``; any secure-share or
    plain-int input falls back to that expression."""
    s = len(lin_forms)
    if s > 1 and gf is not None:
        rows = [f.coeffs for f in lin_forms]
        rho_pows = [pow(rho, i, gf.modulus) for i in range(s)]
        coeffs = modvec.weighted_sum(rho_pows, rows, gf)
        if coeffs is not None:
            # constants: exact Python semantics (small s)
            consts = [
                f.constant * (rho ** i) for i, f in enumerate(lin_forms)
            ]
            constant = consts[0]
            for cst in consts[1:]:
                constant = constant + cst
            return pivot.AffineForm(coeffs, constant)
    return sum((form_i) * (rho ** i) for i, form_i in enumerate(lin_forms))


def combine_with_powers(lin_forms, rho):
    """sum_i rho^i * L_i, computed columnwise."""
    s = len(lin_forms)
    if s == 0:
        raise ValueError("no forms to combine")
    rho_powers = [1]
    for _ in range(s - 1):
        rho_powers.append(rho_powers[-1] * rho)
    n = len(lin_forms[0])
    coeffs = [0] * n
    constant = 0
    for form, rp in zip(lin_forms, rho_powers):
        fc = form.coeffs
        for j in range(n):
            cj = fc[j]
            if isinstance(cj, int) and cj == 0:
                continue
            coeffs[j] = coeffs[j] + cj * rp
        constant = constant + form.constant * rp
    if isinstance(constant, int) and constant == 0:
        return pivot.LinearForm(coeffs)
    return pivot.AffineForm(coeffs, constant)


def prove_nullity_compressed(generators, P, lin_forms, x, gamma, gf):
    """Reference nullity.py:21-28."""
    input_list = [P, lin_forms]
    rho = pivot.fiat_shamir_hash(input_list, gf.order)
    L = combine_forms_with_powers(lin_forms, rho, gf)
    y = pivot.form_eval(L, x, gf)
    proof = compressed_pivot.protocol_5_prover(generators, P, L, y, x, gamma, gf)
    return proof, L, y, rho


def verify_nullity_compressed(generators, P, L, lin_forms, rho, y, proof, gf):
    """Reference nullity.py:31-40."""
    L_check = combine_forms_with_powers(lin_forms, rho, gf)
    if not L_check == L:
        return False
    return compressed_pivot.protocol_5_verifier(generators, P, L, y, proof, gf)
