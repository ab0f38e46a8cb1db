"""Demo: Trinocchio multi-party SNARK.

Parity with reference /root/reference/demos/demo_zkp_trinocchio.py: party 0
acts as trusted dealer for the Pinocchio keys; every party computes a full
Pinocchio proof over its Shamir shares (embarrassingly parallel); the proof
shares are exchanged and Lagrange-recombined *in the exponent*; the public
output wires are opened and the standard Pinocchio verifier runs.

``-M3`` runs three in-process parties; the default is single-party mode.
"""

import argparse
import pprint as pp
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import verifiable_mpc_tpu.trinocchio.pynocchio as pynocchio
import verifiable_mpc_tpu.trinocchio.trinocchio as trinocchio
import verifiable_mpc_tpu.tools.code_to_qap as c2q
import verifiable_mpc_tpu.tools.poly as qc
from verifiable_mpc_tpu.mpc.runtime import mpc, run_multi
from verifiable_mpc_tpu.mpc import shamir


async def main(verbose=True, zk=True):
    """Multi-party SNARK; with zk=True the proof is zero-knowledge:
    the parties jointly sample shared blinding deltas (no party learns
    them), apply the Trinocchio h-polynomial correction on shares, and the
    per-party delta share values blind the recombined proof elements —
    completing the reference's TODO (demo_zkp_trinocchio.py:75)."""
    import types

    await mpc.start()
    m = len(mpc.parties)
    trusted_party_id = 0
    if verbose:
        print(f"MPC parties {mpc.parties}")
        print(f"Trusted party PID: {trusted_party_id}")

    secfld = mpc.SecFld(modulus=trinocchio.modulus)
    gf = secfld.field
    gf.is_signed = False

    inputs = [secfld(3), secfld(2)]
    code = """
def qeval(x, y):
    z = x**3 + 2*y**2
    return z + x + 5
"""

    qap = c2q.QAP(code, gf)
    if verbose:
        print(f"QAP created. Size: {qap.m}, degree {qap.d}.")

    # Trusted party's KeyGen step
    if mpc.pid == trusted_party_id:
        td = pynocchio.Trapdoor(trinocchio.modulus)
        gen = pynocchio.Generators(td, trinocchio.g1, trinocchio.g2)
        evalkey = pynocchio.generate_evalkey(td, qap, gen)
        verikey = pynocchio.generate_verikey(td, qap, gen)
    else:
        evalkey = None
        verikey = None

    evalkey = await mpc.transfer(evalkey, trusted_party_id)
    verikey = await mpc.transfer(verikey, trusted_party_id)
    if verbose:
        print("Trusted setup completed. Keysets received by parties.")

    # Prover's steps: witness and h-polynomial stay share-local
    c = qap.calculate_witness(inputs)
    p = pynocchio.compute_p_poly(qap, c)
    h, r = p / qap.t

    deltas_party = None
    if zk:
        deltas_sec = types.SimpleNamespace(
            v=mpc._random(secfld), w=mpc._random(secfld), y=mpc._random(secfld)
        )
        # h-polynomial ZK correction on shares (secure multiplications)
        h = h + pynocchio.compute_h_zk_terms(qap, c, deltas_sec)
        dv, dw, dy = await mpc.gather(
            deltas_sec.v, deltas_sec.w, deltas_sec.y
        )
        # per-party delta share values; recombining the blinded proof shares
        # in the exponent yields the delta-blinded proof
        deltas_party = types.SimpleNamespace(
            v=int(dv.value), w=int(dw.value), y=int(dy.value)
        )

    c_shares = await mpc.gather(c)
    h_coeffs_shares = await mpc.gather(h.coeffs)
    h_shares = qc.Poly(h_coeffs_shares)
    proof_input = pynocchio.compute_proof(
        qap, c_shares, h_shares, evalkey, deltas_party
    )
    if verbose:
        print("Proof computed.")

    # Exchange proof shares and recombine in the exponent
    proof_inputs = await mpc.transfer(proof_input)

    lagrange_vect = shamir.recombination_vector(gf, m)
    proof = {}
    for key in proof_input.keys():
        points_lambda = [
            lagrange_vect[i] * proof_inputs[i][key] for i in range(m)
        ]
        proof[key] = pynocchio.apply_to_list(trinocchio.point_add, points_lambda)
    if verbose:
        print("Proof recombined.")

    c_out = await mpc.output(c[1:])
    c_out = [1] + c_out
    c_client = c_out[: qap.out_ix + 1]

    verifications = pynocchio.verify(qap, verikey, proof, c_client)
    if verbose:
        if all(verifications.values()):
            print("All checks passed.")
        else:
            print("Not all checks passed.")
        pp.pprint(verifications)

    await mpc.shutdown()
    return verifications


async def _tcp_party_main():
    verifications = await main(verbose=False)
    ok = all(verifications.values())
    print(f"PARTY_VERIFIED {mpc.pid} {ok}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-M", type=int, default=1, help="number of MPC parties (in-process)")
    parser.add_argument("--tcp", action="store_true",
                        help="parties are OS processes over the TCP plane")
    parser.add_argument("-I", type=int, default=None,
                        help="with --tcp: this process runs party I")
    parser.add_argument("--port", type=int, default=23465,
                        help="with --tcp: base port of the party mesh")
    parser.add_argument("--pure-python", action="store_true",
                        help="keep the pure-Python group arithmetic "
                        "(default: the C++ host tier when available)")
    args = parser.parse_args()
    if not args.pure_python:
        import verifiable_mpc_tpu

        verifiable_mpc_tpu.enable_native()
    if args.tcp and args.M > 1:
        from verifiable_mpc_tpu.mpc.transport import run_tcp_party

        if args.I is not None:
            sys.exit(
                run_tcp_party(_tcp_party_main, args.I, args.M,
                              base_port=args.port)
            )
        import subprocess

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
        print(f"{args.M}-party Trinocchio proof over TCP completed and verified.")
    elif args.M <= 1:
        mpc.run(main())
    else:
        run_multi(lambda: main(verbose=False), args.M)
        print(f"{args.M}-party Trinocchio proof completed and verified.")
