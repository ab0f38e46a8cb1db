"""Demonstrate the circuit_builder module (parity with reference
demos/demo_circuit_builder.py): build a circuit by computing with
CircuitVars, inspect it, evaluate it, and derive AC20 objects."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from verifiable_mpc_tpu.fields import GF
import verifiable_mpc_tpu.ac20.circuit_builder as cb
from verifiable_mpc_tpu.ac20.circuit_sat_r1cs import calculate_fgh_polys
from verifiable_mpc_tpu.tools.circuit_graph import circuit_to_dot


def main(verbose=True):
    circuit = cb.Circuit()
    gf = GF(2_147_483_647)

    b = cb.CircuitVar(gf(2), circuit, "b")
    c = cb.CircuitVar(gf(2), circuit, "c")

    d = c + c + c * c + c * c * 1 + 1 + b
    e = d * d + c + 10
    f = d * c + e
    f.label_output("f")
    g = f + 100
    g.label_output("g")

    if verbose:
        print(f"Output gates: {f=} and {g=}")
        print("Circuit attributes:")
        print(f"{circuit.mul_ct=}")
        print(f"{circuit.add_ct=}")
        print(f"{circuit.input_ct=}")
        print(f"{circuit.output_ct=}")
        print("String representation of circuit:")
        print(cb.print_circuit(circuit))
        print("CircuitVars: ", circuit.circuitvars)
        print("Input gates (indexes): ", circuit.input_gates)

    inputs = [gf(2), gf(2)]
    outputs = circuit(inputs)
    if verbose:
        print(f"Evaluate circuit for {inputs=}: {outputs}")

    alpha, beta, gamma = circuit.multiplication_triples(inputs)
    f_poly, g_poly, h_poly = calculate_fgh_polys(alpha, beta, None, gf)
    if verbose:
        print("f, g, h polynomials derived for the AC20 proof system.")
        print("DOT graph:")
        print(circuit_to_dot(circuit))
    return outputs, (alpha, beta, gamma)


if __name__ == "__main__":
    main()
