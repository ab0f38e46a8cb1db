"""MPC prover over the code-string/R1CS front-end (reference mpc_ac20.py),
single-party degenerate mode and 3-party SPMD."""

import pytest

import verifiable_mpc_tpu.ac20.circuit_sat_r1cs as cs
import verifiable_mpc_tpu.ac20.mpc_ac20 as mpc_cs
from verifiable_mpc_tpu.groups import QuadraticResidues
from verifiable_mpc_tpu.mpc.runtime import mpc, run_multi

CODE = """
def qeval(x1, x2):
    y = x1 * x2 + x1 + 3
    z = y * y + x2
    return z
"""


async def prove_and_verify(pivot_choice):
    await mpc.start()
    group = QuadraticResidues(l=64)
    sectype = mpc.SecInt(l=16, p=group.order)
    gf = sectype.field

    x = [sectype(3), sectype(5)]
    padded_x, padded_code, z_len = cs.input_length_power_of_2(
        [3, 5], CODE, pad_with=0
    )
    # re-wrap the padded inputs as sectypes
    x = [sectype(v) for v in padded_x]

    generators = await mpc_cs.create_generators(group, sectype, z_len)
    proof = await mpc_cs.circuit_sat_prover(
        generators, padded_code, x, gf, pivot_choice
    )
    verification = cs.circuit_sat_verifier(
        proof, generators, padded_code, gf, pivot_choice
    )
    await mpc.shutdown()
    return verification


def _ok(verification):
    return all(
        v if not isinstance(v, dict) else all(v.values())
        for v in verification.values()
    )


def test_mpc_r1cs_compressed_1party():
    v = mpc.run(prove_and_verify(cs.PivotChoice.compressed))
    assert _ok(v), v


def test_mpc_r1cs_pivot_1party():
    v = mpc.run(prove_and_verify(cs.PivotChoice.pivot))
    assert _ok(v), v


def test_mpc_r1cs_compressed_3party():
    results = run_multi(
        lambda: prove_and_verify(cs.PivotChoice.compressed), 3
    )
    for v in results:
        assert _ok(v), v
