"""Demo: single-prover Pinocchio zk-SNARK over BN256.

Parity with reference /root/reference/demos/demo_zkp_pynocchio.py."""

import pprint
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve
import verifiable_mpc_tpu.trinocchio.pynocchio as pynocchio
import verifiable_mpc_tpu.tools.code_to_qap as c2q
import verifiable_mpc_tpu.tools.poly as qc


def main(verbose=True):
    pp = pprint.PrettyPrinter(indent=4)

    bn_curve = EllipticCurve("BN256", "jacobian")
    g1 = bn_curve.generator
    bn_twist = EllipticCurve("BN256_twist", "jacobian")
    g2 = bn_twist.generator

    modulus = bn_curve.order
    gf = GF(modulus)
    gf.is_signed = False

    inputs = [gf(3)]
    code = """
def qeval(x):
    y = x**3 + x**2 + x
    return y + x + 5
"""

    qap = c2q.QAP(code, gf)
    if verbose:
        print(f"QAP created. Size: {qap.m}, degree {qap.d}.")

    td = pynocchio.Trapdoor(modulus)
    gen = pynocchio.Generators(td, g1, g2)
    evalkey = pynocchio.generate_evalkey(td, qap, gen)
    verikey = pynocchio.generate_verikey(td, qap, gen)
    if verbose:
        print("Trusted setup completed.")

    c = qap.calculate_witness(inputs)
    p = pynocchio.compute_p_poly(qap, c)
    h, r = p / qap.t
    assert r == qc.Poly(
        [0] * qap.d
    ), "Remainder of p(x)/t(x) for given witness is not 0"
    deltas = pynocchio.SampleDeltas(modulus)
    h = h + pynocchio.compute_h_zk_terms(qap, c, deltas)
    proof = pynocchio.compute_proof(qap, c, h, evalkey, deltas)
    if verbose:
        print("Proof computed.")

    verifications = pynocchio.verify(qap, verikey, proof, c[: qap.out_ix + 1])
    if verbose:
        if all(verifications.values()):
            print("All checks passed.")
        else:
            print("Not all checks passed.")
        pp.pprint(verifications)
    return verifications


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--pure-python", action="store_true",
                        help="keep the pure-Python group arithmetic "
                        "(default: the C++ host tier when available)")
    args = parser.parse_args()
    if not args.pure_python:
        import verifiable_mpc_tpu

        verifiable_mpc_tpu.enable_native()
    main()
