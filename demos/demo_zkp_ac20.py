"""Demo: single-prover AC20 circuit satisfiability.

Parity with reference /root/reference/demos/demo_zkp_ac20.py: builds the same
gadget circuit with the circuit-builder DSL, proves satisfiability with the
selected pivot (regular / compressed / KoE) over QR-1024, Ed25519 or BN256
groups, and verifies the proof.
"""

import argparse
import pprint
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve, QuadraticResidues
import verifiable_mpc_tpu.ac20.circuit_sat_cb as cs
import verifiable_mpc_tpu.ac20.circuit_builder as cb

pp = pprint.PrettyPrinter(indent=4)

PIVOT = cs.PivotChoice.compressed
GROUP = "QR"


def main(pivot_choice, n=3, group_choice=None, verbose=True, save_proof=None):
    group_choice = group_choice or GROUP
    if verbose:
        print("Pivot selected: ", pivot_choice)

    if pivot_choice == cs.PivotChoice.koe:
        group1 = EllipticCurve("BN256", "jacobian")
        group2 = EllipticCurve("BN256_twist", "jacobian")
        group = [group1, group2]
        gf = GF(group1.order)
    elif group_choice == "Elliptic":
        group = EllipticCurve("Ed25519", "projective")
        gf = GF(group.order)
    elif group_choice == "QR":
        group = QuadraticResidues(l=1024)
        gf = GF(group.order)
    else:
        raise ValueError(group_choice)

    circuit = cb.Circuit()
    b = cb.CircuitVar(1, circuit, "b")
    c = cb.CircuitVar(2, circuit, "c")

    d = c + c + c * c + c * c * 1 + 1 + b
    e = d * d + c ** n + 10
    f = d * c + e
    f.label_output("f")
    g = f != 100
    g.label_output("g")
    h = g >= 10
    h.label_output("h")

    x = circuit.initial_inputs()
    check, padding, g_length = cs.check_input_length_power_of_2(x, circuit)
    unused = [cb.CircuitVar(0, circuit, "unused_" + str(i)) for i in range(padding)]
    x = circuit.initial_inputs()
    if verbose:
        print("Length of input vector (incl. gadget witnesses): ", len(x))
        print("Length of commitment vector: ", g_length)

    generators = cs.create_generators(g_length, pivot_choice, group)
    if verbose:
        print("Generators created/trusted setup done.")
        print("Start non-interactive circuit satisfiability proof.")
    proof = cs.circuit_sat_prover(generators, circuit, x, gf, pivot_choice)
    if save_proof:
        from verifiable_mpc_tpu import checkpoint

        checkpoint.save(proof, save_proof)
        proof = checkpoint.load(save_proof)  # verify the serialized artifact
        if verbose:
            print(f"Proof checkpointed to {save_proof}.")
    if verbose:
        print("Start verification.")
    verification = cs.circuit_sat_verifier(proof, generators, circuit, gf, pivot_choice)
    if verbose:
        print("Verification checks: ")
        pp.pprint(verification)
    return verification


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-n", type=int, default=3, help="roughly number of multiplications")
    parser.add_argument("--elliptic", action="store_true",
                        help="use elliptic curve groups (default QR groups)")
    parser.add_argument("--basic", action="store_true",
                        help="use basic pivot (not the compressed pivot)")
    parser.add_argument("--koe", action="store_true",
                        help="use pivot based on Knowledge-of-Exponent assumption and BN256 curves")
    parser.add_argument("--save-proof", type=str, default=None,
                        help="serialize the proof to this path and verify the reloaded artifact")
    parser.add_argument("--pure-python", action="store_true",
                        help="keep the pure-Python group arithmetic "
                        "(default: the C++ host tier when available)")
    args = parser.parse_args()
    if not args.pure_python:
        import verifiable_mpc_tpu

        verifiable_mpc_tpu.enable_native()
    if args.elliptic:
        GROUP = "Elliptic"
    elif args.basic:
        PIVOT = cs.PivotChoice.pivot
    elif args.koe:
        PIVOT = cs.PivotChoice.koe

    main(PIVOT, args.n, save_proof=args.save_proof)
