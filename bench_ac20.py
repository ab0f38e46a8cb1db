"""End-to-end AC20 circuit-satisfiability benchmark at scale.

Builds a circuit with ~2^k multiplication gates via the circuit-builder DSL,
runs the full compressed-pivot prover + verifier over Ed25519, and reports
per-phase wall-clock (BASELINE.md config "AC20 proof generation for a
2^16-gate arithmetic circuit").

Backends: --native (C++ host tier, default if available) or --tpu (JAX
kernels).  The reference implementation cannot run here (MPyC is not
installable), so the comparison column reports the measured per-operation
rates of the pure-Python path extrapolated to this size — see BASELINE.md.

Usage: python bench_ac20.py [--log2-muls 16] [--tpu]
"""

import argparse
import sys
import time

import verifiable_mpc_tpu
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve
from verifiable_mpc_tpu.profiling import Phases
import verifiable_mpc_tpu.ac20.circuit_builder as cb
import verifiable_mpc_tpu.ac20.circuit_sat_cb as cs


def build_chain_circuit(n_muls: int, gf):
    """x_{i+1} = x_i * x_i + 1 chain: n_muls multiplication gates.

    Values are field elements so the witness stays reduced (plain ints would
    double in bit length at every squaring)."""
    circuit = cb.Circuit()
    x = cb.CircuitVar(gf(3), circuit, "x")
    acc = x
    for _ in range(n_muls - 1):
        acc = acc * acc + 1
    out = acc * x
    out.label_output("out")
    return circuit


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--log2-muls", type=int, default=10)
    parser.add_argument("--tpu", action="store_true")
    parser.add_argument("--pure-python", action="store_true")
    parser.add_argument(
        "--transcript", choices=["v1", "v2"], default="v1",
        help="v2: chained round challenges + fold-free verifier "
        "(faster, NOT reference-parity)",
    )
    parser.add_argument(
        "--group", choices=["ed25519", "qr"], default="ed25519",
        help="qr: 1024-bit safe-prime quadratic residues (BASELINE config 1, "
        "reference demos/demo_zkp_ac20.py:51 default group)",
    )
    parser.add_argument(
        "--pivot", choices=["compressed", "koe"], default="compressed",
        help="koe: knowledge-of-exponent pivot over BN256 pairing groups "
        "(reference knowledge_of_exponent.py; setup is 2n fixed-base exps)",
    )
    parser.add_argument(
        "--repeat", type=int, default=1,
        help="prove/verify N times and report the LAST iteration: the jit "
        "backend pays one-time per-process tracing/compile-cache costs on "
        "the first prove (the C++ tier is AOT — steady state is the "
        "comparable number)",
    )
    args = parser.parse_args()

    if args.tpu:
        verifiable_mpc_tpu.enable_compile_cache()
        verifiable_mpc_tpu.enable_tpu()
        backend = "tpu"
    elif not args.pure_python and verifiable_mpc_tpu.enable_native():
        backend = "native-c++"
    else:
        backend = "pure-python"
    print(f"backend: {backend}", file=sys.stderr)

    n_muls = 1 << args.log2_muls
    phases = Phases()

    pivot_choice = (
        cs.PivotChoice.koe if args.pivot == "koe" else cs.PivotChoice.compressed
    )
    if pivot_choice == cs.PivotChoice.koe:
        group = [
            EllipticCurve("BN256", "jacobian"),
            EllipticCurve("BN256_twist", "jacobian"),
        ]
        gf = GF(group[0].order)
    elif args.group == "qr":
        from verifiable_mpc_tpu.groups import QuadraticResidues

        group = QuadraticResidues(l=1024)
        gf = GF(group.order)
    else:
        group = EllipticCurve("Ed25519", "projective")
        gf = GF(group.order)

    with phases.phase("build_circuit"):
        circuit = build_chain_circuit(n_muls, gf)
    x = circuit.initial_inputs()
    check, padding, g_length = cs.check_input_length_power_of_2(x, circuit)
    with phases.phase("pad"):
        for i in range(padding):
            cb.CircuitVar(gf(0), circuit, "unused_" + str(i))
        x = circuit.initial_inputs()
    print(
        f"muls={circuit.mul_ct} commitment vector length={g_length}",
        file=sys.stderr,
    )

    for rep in range(args.repeat):
        tag = "" if rep == args.repeat - 1 else f"_warmup{rep}"
        with phases.phase("generators" + tag):
            generators = cs.create_generators(
                g_length, pivot_choice, group
            )
        with phases.phase("prove" + tag):
            proof = cs.circuit_sat_prover(
                generators, circuit, x, gf, pivot_choice,
                transcript=args.transcript,
            )
        with phases.phase("verify" + tag):
            verification = cs.circuit_sat_verifier(
                proof, generators, circuit, gf, pivot_choice,
                transcript=args.transcript,
            )

    ok = all(
        v if not isinstance(v, dict) else all(v.values())
        for v in verification.values()
    )
    phases.report(file=sys.stderr)
    print(f"verification: {ok}", file=sys.stderr)
    import json

    print(
        json.dumps(
            {
                "metric": f"ac20_prove_seconds_2^{args.log2_muls}_muls",
                "value": round(phases.durations["prove"], 3),
                "unit": "s",
                "backend": backend, "group": args.group, "pivot": args.pivot,
                "transcript": args.transcript,
                "verified": ok,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
