"""AC20 circuit satisfiability (Protocol 8), circuit-builder front-end.

Behavior parity with reference
/root/reference/verifiable_mpc/ac20/circuit_sat_cb.py: power-of-two padding
check (:46-56), protocol-8 prover (:59-166), verifier (:169-252) and pivot
dispatch (:255-318).  ``str(circuit)`` is hashed in place of the code string
(:107).
"""

from __future__ import annotations

import logging

from .. import rng
from . import circuit_builder as cb
from . import compressed_pivot
from . import knowledge_of_exponent as koe
from . import nullity
from . import pivot
from . import ref_transcript
from .circuit_sat_r1cs import (  # noqa: F401 (re-exports are part of the API)
    PivotChoice,
    calculate_fgh_polys,
    create_generators,
    evaluate_at_range,
    lagrange,
    next_power_of_2,
)

logger_cs2 = logging.getLogger("circuit_sat")
logger_cs2.setLevel(logging.INFO)

logger_cs2_hin = logging.getLogger("circuit_sat_hash_inputs")
logger_cs2_hin.setLevel(logging.INFO)

logger_cs2_hout = logging.getLogger("circuit_sat_hash_outputs")
logger_cs2_hout.setLevel(logging.INFO)


def check_input_length_power_of_2(x, circuit, padding_value=0):
    """Padding needed so len(z)+1 is a power of two (reference :46-56)."""
    assert circuit.input_ct == len(x)
    z_len = circuit.input_ct + 3 + 2 * circuit.mul_ct
    if not bin(z_len + 1).count("1") == 1:
        padding = next_power_of_2(z_len) - z_len - 1
    else:
        padding = 0
    check = padding == 0
    return check, padding, z_len + padding


def protocol_8_excl_pivot_prover(generators, circuit, x, gf, use_koe=False):
    """Protocol 8 prover, excluding the pivot call (reference :59-166)."""
    if "g" in generators:
        g = generators["g"]
        h = generators["h"]
    elif "pp_lhs" in generators:
        use_koe = True
        pp = generators
    else:
        raise NotImplementedError

    n = len(x)
    assert n == circuit.input_ct
    proof = {}
    m = circuit.mul_ct

    a, b, c = circuit.multiplication_triples(x)

    from .circuit_sat_r1cs import (
        _FAST_POLY_THRESHOLD,
        _plain_values,
        calculate_fgh_evaluations,
    )

    f_poly = None
    if m >= _FAST_POLY_THRESHOLD and _plain_values(a):
        f0, g0, h0, h_evaluations = calculate_fgh_evaluations(a, b, gf)
        z = list(x) + [f0, g0, h0] + h_evaluations
    else:
        f_poly, g_poly, h_poly = calculate_fgh_polys(a, b, None, gf)
        h_evaluations = evaluate_at_range(h_poly, 1, 2 * m, gf)
        z = (
            list(x)
            + [f_poly.eval(0), g_poly.eval(0), h_poly.eval(0)]
            + h_evaluations
        )

    gamma = rng.randrange(1, gf.order)

    if use_koe:
        S = range(len(z))
        z_commitment_P, z_commitment_pi = koe.restriction_argument_prover(
            S, z, gamma, pp
        )
        z_commitment = {"P": z_commitment_P, "pi": z_commitment_pi}
        proof["z_commitment"] = z_commitment
        circuit_forms = cb.calculate_circuit_forms(circuit)
        circuit_forms = [cb.convert_to_ac20(f, circuit) for f in circuit_forms]
        outputs = circuit(x)
    else:
        logger_cs2.debug("Calculate [Z].")
        commit = pivot.vector_commitment_async(z, gamma, g, h)
        # challenge-independent host work overlaps the commitment MSM's
        # device time (TPU backend; host tiers computed eagerly above)
        circuit_forms = cb.calculate_circuit_forms(circuit)
        circuit_forms = [cb.convert_to_ac20(f, circuit) for f in circuit_forms]
        outputs = circuit(x)
        z_commitment = commit()
        if hasattr(z_commitment, "normalize"):
            # canonical representative: this value feeds the first
            # Fiat-Shamir hash RAW (reference :107 hashes it unnormalized),
            # so without this, backends computing different projective
            # coordinates of the SAME commitment would derive different
            # challenges (the fold path normalizes for the same reason,
            # ops/dispatch.fold_generators)
            z_commitment = z_commitment.normalize()
        proof["z_commitment"] = z_commitment

    input_list = [
        z_commitment,
        circuit,  # hashed structurally (serialization.py T_CIRCUIT)
        "First hash circuit satisfiability protocol",
    ]
    logger_cs2_hin.debug("protocol_8_cb prover (1): input_list=\n%s", input_list)
    c = pivot.fiat_shamir_hash(input_list, gf.order)
    logger_cs2_hout.debug("After hash, hash=\n%s", c)

    if f_poly is not None:  # evaluation-form path skips the redundant check
        y1 = f_poly.eval(c)
        y2 = g_poly.eval(c)
        y3 = h_poly.eval(c)
        assert y3 == y1 * y2

    linform_f = cb.calculate_fg_form(circuit, wire=0, challenge=c, gf=gf)
    linform_g = cb.calculate_fg_form(circuit, wire=1, challenge=c, gf=gf)
    linform_h = cb.calculate_h_form(circuit, c, gf)

    y1 = pivot.form_eval(linform_f, z, gf)
    y2 = pivot.form_eval(linform_g, z, gf)
    y3 = pivot.form_eval(linform_h, z, gf)
    assert y1 * y2 == y3
    proof["y1"] = y1
    proof["y2"] = y2
    proof["y3"] = y3

    # circuit_forms / outputs computed above (overlapping the commitment)
    proof["outputs"] = outputs

    lin_forms = [form - y for form, y in zip(circuit_forms, outputs)] + [
        linform_f - y1,
        linform_g - y2,
        linform_h - y3,
    ]

    input_list = [
        y1,
        y2,
        y3,
        z_commitment,
        outputs,
        circuit_forms,
        lin_forms,
        "Second hash circuit satisfiability protocol",
    ]
    logger_cs2_hin.debug("protocol_8_cb prover (2): input_list=\n%s", input_list)
    rho = pivot.fiat_shamir_hash(input_list, gf.order)
    logger_cs2_hout.debug("After hash, hash=\n%s", rho)
    L = nullity.combine_forms_with_powers(lin_forms, rho, gf)
    proof["L"] = L
    return proof, z_commitment, L, z, gamma


def protocol_8_excl_pivot_verifier(proof, circuit, gf, use_koe=False):
    """Protocol 8 verifier, excluding the pivot call (reference :169-252)."""
    verification = {}
    y1 = proof["y1"]
    y2 = proof["y2"]
    y3 = proof["y3"]
    if not y1 * y2 == y3:
        verification["y1*y2=y3"] = False
        return verification
    verification["y1*y2=y3"] = True

    z_commitment = proof["z_commitment"]
    input_list = [
        z_commitment,
        circuit,  # hashed structurally (serialization.py T_CIRCUIT)
        "First hash circuit satisfiability protocol",
    ]
    logger_cs2_hin.debug("protocol_8_cb verifier (1): input_list=\n%s", input_list)
    c = pivot.fiat_shamir_hash(input_list, gf.order)
    logger_cs2_hout.debug("After hash, hash=\n%s", c)

    linform_f = cb.calculate_fg_form(circuit, wire=0, challenge=c, gf=gf)
    linform_g = cb.calculate_fg_form(circuit, wire=1, challenge=c, gf=gf)
    linform_h = cb.calculate_h_form(circuit, c, gf)

    outputs = proof["outputs"]
    circuit_forms = cb.calculate_circuit_forms(circuit)
    circuit_forms = [cb.convert_to_ac20(f, circuit) for f in circuit_forms]

    lin_forms = [form - output for form, output in zip(circuit_forms, outputs)] + [
        linform_f - y1,
        linform_g - y2,
        linform_h - y3,
    ]

    input_list = [
        y1,
        y2,
        y3,
        z_commitment,
        outputs,
        circuit_forms,
        lin_forms,
        "Second hash circuit satisfiability protocol",
    ]
    logger_cs2_hin.debug("protocol_8_cb verifier (2): input_list=\n%s", input_list)
    rho = pivot.fiat_shamir_hash(input_list, gf.order)
    logger_cs2_hout.debug("After hash, hash=\n%s", rho)
    L = nullity.combine_forms_with_powers(lin_forms, rho, gf)

    if not L == proof["L"]:
        verification["L_wellformed_from_Cfgh_forms"] = False
        return verification, L
    verification["L_wellformed_from_Cfgh_forms"] = True
    return verification, L


def circuit_sat_prover(generators, circuit, x, gf, pivot_choice=PivotChoice.compressed,
                       transcript="v1"):
    """Protocol 8 prover with pivot dispatch (reference :255-282).

    transcript="v2" (compressed pivot only) uses chained round challenges —
    smaller hashes and a fold-free verifier; NOT reference-parity.
    transcript="ref" keeps the v1 structure but hashes the reference's
    exact ``str(input_list)`` bytes (ac20/ref_transcript.py)."""
    if transcript == "ref":
        with ref_transcript.active():
            return circuit_sat_prover(
                generators, circuit, x, gf, pivot_choice, transcript="v1"
            )
    proof, z_commitment, L, z, gamma = protocol_8_excl_pivot_prover(
        generators, circuit, x, gf
    )

    if pivot_choice == PivotChoice.compressed:
        pivot_proof = compressed_pivot.protocol_5_prover(
            generators, z_commitment, L, pivot.form_eval(L, z, gf), z, gamma,
            gf, transcript=transcript,
        )
    elif pivot_choice == PivotChoice.pivot:
        g = generators["g"]
        h = generators["h"]
        pivot_proof = pivot.prove_linear_form_eval(
            g, h, z_commitment, L, pivot.form_eval(L, z, gf), z, gamma, gf
        )
    elif pivot_choice == PivotChoice.koe:
        L = proof["L"]
        P = proof["z_commitment"]["P"]
        pi = proof["z_commitment"]["pi"]
        pivot_proof, u = koe.opening_linear_form_prover(L, z, gamma, generators, P, pi)
    else:
        raise NotImplementedError
    proof["pivot_proof"] = pivot_proof
    return proof


def circuit_sat_verifier(proof, generators, circuit, gf, pivot_choice=PivotChoice.compressed,
                         transcript="v1"):
    """Protocol 8 verifier with pivot dispatch (reference :285-318)."""
    if transcript == "ref":
        with ref_transcript.active():
            return circuit_sat_verifier(
                proof, generators, circuit, gf, pivot_choice, transcript="v1"
            )
    verification, L = protocol_8_excl_pivot_verifier(proof, circuit, gf)

    if pivot_choice == PivotChoice.compressed:
        z_commitment = proof["z_commitment"]
        pivot_proof = proof["pivot_proof"]
        pivot_verification = compressed_pivot.protocol_5_verifier(
            generators, z_commitment, L, 0, pivot_proof, gf,
            transcript=transcript,
        )
    elif pivot_choice == PivotChoice.pivot:
        z_commitment = proof["z_commitment"]
        g = generators["g"]
        h = generators["h"]
        z, phi, c = proof["pivot_proof"]
        pivot_verification = pivot.verify_linear_form_proof(
            g, h, z_commitment, L, 0, z, phi, c
        )
    elif pivot_choice == PivotChoice.koe:
        koe_pivot_proof = proof["pivot_proof"]
        pivot_verification = koe.opening_linear_form_verifier(
            L, generators, koe_pivot_proof, 0
        )
    else:
        raise NotImplementedError
    verification["pivot_verification"] = pivot_verification
    return verification
