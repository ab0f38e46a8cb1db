"""MPC (multi-party) prover for AC20, circuit-builder front-end.

Behavior parity with reference
/root/reference/verifiable_mpc/ac20/mpc_ac20_cb.py: prover on shares using
``circuit.multiplication_triples`` over sectypes (:39-154) and the top-level
dispatch (:157-189).
"""

from __future__ import annotations

import logging

from ..mpc.runtime import mpc
from . import circuit_builder as cb
from . import circuit_sat_r1cs as cs
from . import nullity
from . import pivot
from .mpc_ac20 import (  # noqa: F401 (re-exports are part of the API)
    create_generators,
    koe_opening_linear_form_prover,
    koe_restriction_argument_prover,
    koe_trusted_setup,
    protocol_4_prover,
    protocol_5_prover,
    prove_linear_form_eval,
    vector_commitment,
)
from .recombine import recombine

logger_cs_mpc_cb = logging.getLogger("cs_mpc")
logger_cs_mpc_cb.setLevel(logging.INFO)

logger_cs_mpc_cb_hin = logging.getLogger("cs_mpc_hash_inputs")
logger_cs_mpc_cb_hin.setLevel(logging.INFO)

logger_cs_mpc_cb_hout = logging.getLogger("cs_mpc_hash_outputs")
logger_cs_mpc_cb_hout.setLevel(logging.INFO)


async def protocol_8_excl_pivot_prover(generators, circuit, x, gf, use_koe=False):
    """Protocol 8 prover on shares, circuit-builder front-end
    (reference mpc_ac20_cb.py:39-154)."""
    secfld = type(x[0])
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

    logger_cs_mpc_cb.debug("Calculate a, b, c vectors.")
    a, b, c = circuit.multiplication_triples(x)

    logger_cs_mpc_cb.debug("Calculate z.")
    f0 = mpc._random(secfld)
    g0 = mpc._random(secfld)
    a = [f0] + a
    b = [g0] + b
    a, b = await mpc.gather(a, b)
    fs = recombine(gf, list(zip(range(m + 1), a)), list(range(m + 1, 2 * m + 1)))
    gs = recombine(gf, list(zip(range(m + 1), b)), list(range(m + 1, 2 * m + 1)))
    hs = list(map(secfld, await mpc.schur_prod(fs, gs)))
    z = list(x) + [f0, g0, f0 * g0] + c + hs

    gamma = mpc._random(secfld)

    if use_koe:
        S = range(len(z))
        z_commitment_P, z_commitment_pi = await koe_restriction_argument_prover(
            S, z, gamma, pp
        )
        z_commitment = {"P": z_commitment_P, "pi": z_commitment_pi}
        proof["z_commitment"] = z_commitment
    else:
        logger_cs_mpc_cb.debug("Calculate commitment for z, denoted by [z].")
        z_commitment = await vector_commitment(z, gamma, g, h)
        proof["z_commitment"] = z_commitment

    input_list = [
        z_commitment,
        circuit,  # hashed structurally, matching circuit_sat_cb's verifier
        "First hash circuit satisfiability protocol",
    ]
    logger_cs_mpc_cb_hin.debug("protocol_8 mpc cb prover (1): input_list=%s", input_list)
    c_challenge = pivot.fiat_shamir_hash(input_list, gf.order)
    logger_cs_mpc_cb_hout.debug("After hash, hash=\n%s", c_challenge)

    linform_f = cb.calculate_fg_form(circuit, wire=0, challenge=c_challenge, gf=gf)
    linform_g = cb.calculate_fg_form(circuit, wire=1, challenge=c_challenge, gf=gf)
    linform_h = cb.calculate_h_form(circuit, c_challenge, gf)

    y1 = linform_f(z)
    y2 = linform_g(z)
    y3 = linform_h(z)
    y1 = await mpc.output(y1, raw=True)
    y2 = await mpc.output(y2, raw=True)
    y3 = await mpc.output(y3, raw=True)

    assert y1 * y2 == y3
    proof["y1"] = y1
    proof["y2"] = y2
    proof["y3"] = y3

    circuit_forms = cb.calculate_circuit_forms(circuit)
    circuit_forms = [cb.convert_to_ac20(f, circuit) for f in circuit_forms]
    outputs = circuit(x)
    outputs = await mpc.output(outputs)
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
    logger_cs_mpc_cb_hin.debug("protocol_8 mpc cb prover (2): input_list=%s", input_list)
    rho = pivot.fiat_shamir_hash(input_list, gf.order)
    logger_cs_mpc_cb_hout.debug("After hash, hash=\n%s", rho)
    L = nullity.combine_forms_with_powers(lin_forms, rho, gf)
    proof["L"] = L
    return proof, z_commitment, L, z, gamma


async def circuit_sat_prover(generators, circuit, x, gf, pivot_choice=cs.PivotChoice.compressed):
    """Top-level MPC prover dispatch (reference mpc_ac20_cb.py:157-189)."""
    logger_cs_mpc_cb.debug("Enter circuit_sat_prover. pivot_choice=%s", pivot_choice)
    proof, z_commitment, L, z, gamma = await protocol_8_excl_pivot_prover(
        generators, circuit, x, gf
    )

    if pivot_choice == cs.PivotChoice.compressed:
        pivot_proof = await protocol_5_prover(
            generators, z_commitment, L, L(z), z, gamma, gf
        )
    elif pivot_choice == cs.PivotChoice.pivot:
        g = generators["g"]
        h = generators["h"]
        pivot_proof = await prove_linear_form_eval(
            g, h, z_commitment, L, L(z), z, gamma, gf
        )
    elif pivot_choice == cs.PivotChoice.koe:
        L = proof["L"]
        P = proof["z_commitment"]["P"]
        pi = proof["z_commitment"]["pi"]
        pivot_proof, u = await koe_opening_linear_form_prover(
            L, z, gamma, generators, P, pi
        )
    else:
        raise NotImplementedError
    proof["pivot_proof"] = pivot_proof
    return proof
