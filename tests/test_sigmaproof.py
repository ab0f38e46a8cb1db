"""Standalone Sigma-proof gadget tests (plain + MPC witnesses) and the
circuit-graph/demo utilities."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demos"))

from verifiable_mpc_tpu import sigmaproof
from verifiable_mpc_tpu.groups import EllipticCurve, QuadraticResidues
from verifiable_mpc_tpu.mpc.runtime import mpc, run_multi


def test_not_zero_roundtrip():
    for group in (QuadraticResidues(l=64), EllipticCurve("Ed25519")):
        B, g, h, y = sigmaproof.commit_not_zero(5, group)
        proof = sigmaproof.prove_not_zero(5, y, B, g, h, group)
        assert sigmaproof.verify_not_zero(B, g, h, proof, group)
        bad = dict(proof)
        bad["r1"] = proof["r1"] + 1
        assert not sigmaproof.verify_not_zero(B, g, h, bad, group)


def test_not_zero_mpc_3party():
    group = QuadraticResidues(l=64)

    async def party():
        await mpc.start()
        sectype = mpc.SecFld(modulus=group.order)
        x = sectype(7)
        B, g, h, proof = await sigmaproof.sigma_prove_not_zero_mpc(x, group)
        ok = sigmaproof.verify_not_zero(B, g, h, proof, group)
        await mpc.shutdown()
        return ok

    results = run_multi(party, 3)
    assert all(results)


def test_circuit_graph_and_demo():
    import demo_circuit_builder as demo

    outputs, triples = demo.main(verbose=False)
    assert len(outputs) == 2

    from verifiable_mpc_tpu.ac20 import circuit_builder as cb
    from verifiable_mpc_tpu.tools import circuit_graph

    circuit = cb.Circuit()
    a = cb.CircuitVar(3, circuit, "a")
    b = cb.CircuitVar(4, circuit, "b")
    (a * b + 1).label_output("out")
    dot = circuit_graph.circuit_to_dot(circuit)
    assert "digraph circuit" in dot and "mul" in dot
    flat = circuit_graph.circuit_to_flatcode(circuit)
    assert flat[0][0] == "*"
