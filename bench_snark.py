"""End-to-end Pinocchio / Trinocchio SNARK benchmark at scale.

Covers the last two BASELINE.json configs: the quasi-linear Pinocchio
pipeline (SparseQAP evaluation-form keygen + NTT h-polynomial + the 8 proof
MSMs, reference pynocchio.py:101-273) and the Trinocchio multi-party flow
(per-party proofs over Shamir shares, Lagrange recombination in the
exponent, reference demos/demo_zkp_trinocchio.py:70-94) on a 2^k-mul-gate
circuit.

Trinocchio mode measures the scaled per-party work (m full proof
computations over shares + exponent-space recombination + verify).  Witness
and h shares are dealt directly from the plain values (degree-t Shamir) —
the interactive MPC that produces them in production is exercised and
benchmarked separately (demo_zkp_mpc_ac20 / the mpc runtime tests); here the
m proof computations are the asymptotic cost.

Usage: python bench_snark.py [--log2-muls 12] [--trinocchio] [-M 3] [--tpu]
"""

import argparse
import json
import random
import sys
import time

import verifiable_mpc_tpu
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve
from verifiable_mpc_tpu.profiling import Phases
import verifiable_mpc_tpu.tools.poly as qc
import verifiable_mpc_tpu.trinocchio.pynocchio as pynocchio
import verifiable_mpc_tpu.trinocchio.qap_fast as qf


def chain_code(n_muls: int) -> str:
    """x_{i+1} = x_i * x_i + 1 chain with n_muls mul gates (one per line)."""
    lines = ["def qeval(x):", "    a0 = x * x + 1"]
    for i in range(1, n_muls - 1):
        lines.append(f"    a{i} = a{i-1} * a{i-1} + 1")
    lines.append(f"    return a{n_muls-2} * x")
    return "\n".join(lines) + "\n"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--log2-muls", type=int, default=12)
    parser.add_argument("--trinocchio", action="store_true")
    parser.add_argument("-M", type=int, default=3,
                        help="parties (trinocchio mode)")
    parser.add_argument("--tpu", action="store_true")
    parser.add_argument(
        "--repeat", type=int, default=1,
        help="keygen/prove/verify N times and report the LAST iteration "
        "(the jit backend pays per-process tracing/compile once; the C++ "
        "tier is AOT — steady state is the comparable number)",
    )
    args = parser.parse_args()

    if args.tpu:
        verifiable_mpc_tpu.enable_compile_cache()
        verifiable_mpc_tpu.enable_tpu()
        backend = "tpu"
    elif verifiable_mpc_tpu.enable_native():
        backend = "native-c++"
    else:
        backend = "pure-python"
    print(f"backend: {backend}", file=sys.stderr)

    n_muls = 1 << args.log2_muls
    phases = Phases()

    bn_curve = EllipticCurve("BN256", "jacobian")
    bn_twist = EllipticCurve("BN256_twist", "jacobian")
    modulus = bn_curve.order
    gf = GF(modulus)
    gf.is_signed = False

    with phases.phase("build_qap"):
        code = chain_code(n_muls)
        qap = qf.SparseQAP(code, gf)
    print(f"QAP size m={qap.m} degree d={qap.d}", file=sys.stderr)

    for rep in range(args.repeat if not args.trinocchio else 1):
        tag = "" if rep == args.repeat - 1 or args.trinocchio else (
            f"_warmup{rep}"
        )
        with phases.phase("keygen" + tag):
            td = pynocchio.Trapdoor(modulus)
            gen = pynocchio.Generators(
                td, bn_curve.generator, bn_twist.generator
            )
            evalkey, verikey = qf.generate_keys_fast(td, qap, gen)

        inputs = [gf(3)]
        with phases.phase("witness" + tag):
            c = qap.calculate_witness(inputs)

        if args.trinocchio:
            break
        with phases.phase("prove" + tag):
            deltas = pynocchio.SampleDeltas(modulus)
            proof = qf.compute_proof_fast(qap, c, evalkey, deltas)
        with phases.phase("verify" + tag):
            verifications = pynocchio.verify(
                qap, verikey, proof, c[: qap.out_ix + 1]
            )
    if not args.trinocchio:
        metric = f"pynocchio_prove_seconds_2^{args.log2_muls}_muls"
    else:
        from verifiable_mpc_tpu.mpc import shamir

        m = args.M
        t = (m - 1) // 2
        rnd = random.Random(42)
        with phases.phase("share_witness_h"):
            # h stays in evaluation form end to end: shares of the
            # evaluations ARE evaluations of the shared polynomial
            # (Shamir is linear), so each party commits its h share with
            # one Lagrange-key MSM
            h_plain = qap.h_evals(c)
            c_shares = [[0] * len(c) for _ in range(m)]
            for i, v in enumerate(c):
                for pid, sh in enumerate(
                    shamir.share(gf, int(v), m, t, rnd=rnd)
                ):
                    c_shares[pid][i] = sh
            h_shares = [[0] * len(h_plain) for _ in range(m)]
            for i, v in enumerate(h_plain):
                for pid, sh in enumerate(
                    shamir.share(gf, int(v), m, t, rnd=rnd)
                ):
                    h_shares[pid][i] = sh
        with phases.phase("prove_all_parties"):
            proof_inputs = [
                qf.compute_proof_fast(
                    qap, c_shares[pid], evalkey,
                    h_eval_vals=[int(v) for v in h_shares[pid]],
                )
                for pid in range(m)
            ]
        with phases.phase("recombine"):
            lagrange_vect = shamir.recombination_vector(gf, m)
            point_add = lambda a, b: a + b  # noqa: E731
            proof = {}
            for key in proof_inputs[0]:
                weighted = [
                    int(lagrange_vect[i]) * proof_inputs[i][key]
                    for i in range(m)
                ]
                proof[key] = pynocchio.apply_to_list(point_add, weighted)
        with phases.phase("verify"):
            verifications = pynocchio.verify(
                qap, verikey, proof, c[: qap.out_ix + 1]
            )
        metric = (
            f"trinocchio_{m}party_prove_seconds_2^{args.log2_muls}_muls"
        )

    ok = all(verifications.values())
    phases.report(file=sys.stderr)
    print(f"verification: {ok}", file=sys.stderr)
    prove_key = "prove" if not args.trinocchio else "prove_all_parties"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(phases.durations[prove_key], 3),
                "unit": "s",
                "backend": backend,
                "verified": ok,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
