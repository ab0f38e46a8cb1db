"""Demo: multi-party (MPC) prover for AC20 circuit satisfiability.

Parity with reference /root/reference/demos/demo_zkp_mpc_ac20.py: the compute
parties hold Shamir shares of the witness, jointly sample generators, and
produce a publicly verifiable proof.  ``-M3`` runs three in-process parties
(SPMD over the in-process hub); without ``-M`` the single-party degenerate
mode runs, exactly like the reference's test usage.
"""

import argparse
import pprint
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from verifiable_mpc_tpu.groups import EllipticCurve, QuadraticResidues
from verifiable_mpc_tpu.mpc.runtime import mpc, run_multi
import verifiable_mpc_tpu.ac20.circuit_builder as cb
import verifiable_mpc_tpu.ac20.circuit_sat_cb as cs
import verifiable_mpc_tpu.ac20.mpc_ac20_cb as mpc_cs

pp = pprint.PrettyPrinter(indent=4)

PIVOT = cs.PivotChoice.compressed
GROUP = "QR"


async def main(pivot_choice, group_choice, n, verbose=True):
    await mpc.start()

    if pivot_choice == cs.PivotChoice.koe:
        group1 = EllipticCurve("BN256", "projective")
        group2 = EllipticCurve("BN256_twist", "projective")
        group = [group1, group2]
        sec_grp = mpc.SecGrp(group1)
    elif group_choice == "Elliptic":
        group = EllipticCurve("Ed25519", "projective")
        sec_grp = mpc.SecGrp(group)
    elif group_choice == "QR":
        group = QuadraticResidues(l=1024)
        sec_grp = mpc.SecGrp(group)
    else:
        raise ValueError

    if verbose:
        print("Start AC20 with group: ", group)

    sectype = mpc.SecInt(l=16, p=sec_grp.group.order)
    gf = sectype.field

    circuit = cb.Circuit()
    b = cb.CircuitVar(sectype(1), circuit, "b")
    c = cb.CircuitVar(sectype(2), circuit, "c")

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
    unused = [cb.CircuitVar(sectype(0), circuit, "unused_" + str(i)) for i in range(padding)]
    x = circuit.initial_inputs()

    if verbose:
        print("Length of input vector (incl. gadget witnesses): ", len(x))
        print("Length of commitment vector: ", g_length)
        print("Create generators.")
    if pivot_choice in [cs.PivotChoice.pivot, cs.PivotChoice.compressed]:
        generators = await mpc_cs.create_generators(group, sectype, g_length)
    elif pivot_choice in [cs.PivotChoice.koe]:
        generators = await mpc_cs.koe_trusted_setup(group, sectype, g_length)
    else:
        raise NotImplementedError

    if verbose:
        print("Start non-interactive circuit satisfiability proof.")
    proof = await mpc_cs.circuit_sat_prover(generators, circuit, x, gf, pivot_choice)

    if verbose:
        print("Start verification.")
    verification = cs.circuit_sat_verifier(proof, generators, circuit, gf, pivot_choice)

    if verbose:
        if all(_leaves(verification)):
            print("All checks passed.")
        else:
            print("Not all checks passed.")
        pp.pprint(verification)

    await mpc.shutdown()
    return verification


def _leaves(verification):
    out = []
    for v in verification.values():
        if isinstance(v, dict):
            out.extend(v.values())
        else:
            out.append(v)
    return out


def _run_tcp(args, pivot, group_choice):
    """Real multi-process topology (the reference's MPyC -M/-I model):
    each party is an OS process, messages ride the TCP plane
    (mpc.transport).  With -I this process IS party I; without -I the
    m party processes are spawned automatically."""
    import subprocess

    from verifiable_mpc_tpu.mpc.transport import run_tcp_party

    if args.I is not None:
        rc = run_tcp_party(
            lambda: _tcp_party_main(pivot, group_choice, args.n),
            args.I,
            args.M,
            base_port=args.port,
        )
        sys.exit(rc)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)]
            + [a for a in sys.argv[1:] if not a.startswith("-I")]
            + [f"-I{i}"],
        )
        for i in range(args.M)
    ]
    rcs = [p.wait(timeout=900) for p in procs]
    if any(rcs):
        sys.exit(f"party processes failed: rcs={rcs}")
    print(f"{args.M}-party proof over TCP completed and verified.")


async def _tcp_party_main(pivot, group_choice, n):
    verification = await main(pivot, group_choice, n, verbose=False)
    ok = all(_leaves(verification))
    print(f"PARTY_VERIFIED {mpc.pid} {ok}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-n", type=int, default=3, help="roughly number of multiplications")
    parser.add_argument("-M", type=int, default=1, help="number of MPC parties (in-process)")
    parser.add_argument("--elliptic", action="store_true",
                        help="use elliptic curve groups (default QR groups)")
    parser.add_argument("--basic", action="store_true",
                        help="use basic pivot (not the compressed pivot)")
    parser.add_argument("--koe", action="store_true",
                        help="use pivot based on Knowledge-of-Exponent assumption and BN256 curves")
    parser.add_argument("--tcp", action="store_true",
                        help="parties are OS processes over the TCP plane "
                        "(default: in-process SPMD hub)")
    parser.add_argument("-I", type=int, default=None,
                        help="with --tcp: this process runs party I")
    parser.add_argument("--port", type=int, default=23365,
                        help="with --tcp: base port of the party mesh")
    parser.add_argument("--pure-python", action="store_true",
                        help="keep the pure-Python group arithmetic "
                        "(default: the C++ host tier when available — each "
                        "party's local MSM/fold/exponentiation work)")
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

    if args.tcp and args.M > 1:
        _run_tcp(args, PIVOT, GROUP)
    elif args.M <= 1:
        mpc.run(main(PIVOT, GROUP, args.n))
    else:
        run_multi(lambda: main(PIVOT, GROUP, args.n, verbose=False), args.M)
        print(f"{args.M}-party proof completed and verified.")
