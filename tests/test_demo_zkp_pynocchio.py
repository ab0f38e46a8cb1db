"""Pinocchio demo integration test (mirror of reference
test/test_demo_zkp_pynocchio.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demos"))

import demo_zkp_pynocchio as demo


def test_demo_pynocchio():
    verifications = demo.main(verbose=False)
    assert all(verifications.values()), verifications


def test_pynocchio_rejects_bad_witness():
    import random

    from verifiable_mpc_tpu.fields import GF
    from verifiable_mpc_tpu.groups import EllipticCurve
    import verifiable_mpc_tpu.trinocchio.pynocchio as pynocchio
    import verifiable_mpc_tpu.tools.code_to_qap as c2q

    bn_curve = EllipticCurve("BN256", "jacobian")
    bn_twist = EllipticCurve("BN256_twist", "jacobian")
    modulus = bn_curve.order
    gf = GF(modulus)
    gf.is_signed = False

    qap = c2q.QAP("""
def qeval(x):
    y = x*x
    return y + 3
""", gf)
    td = pynocchio.Trapdoor(modulus)
    gen = pynocchio.Generators(td, bn_curve.generator, bn_twist.generator)
    evalkey = pynocchio.generate_evalkey(td, qap, gen)
    verikey = pynocchio.generate_verikey(td, qap, gen)

    c = qap.calculate_witness([gf(3)])
    p = pynocchio.compute_p_poly(qap, c)
    h, _ = p / qap.t
    proof = pynocchio.compute_proof(qap, c, h, evalkey)
    # claim a wrong public output
    c_bad = list(c[: qap.out_ix + 1])
    c_bad[qap.out_ix] = c_bad[qap.out_ix] + 1
    verification = pynocchio.verify(qap, verikey, proof, c_bad)
    assert not verification["H"]
