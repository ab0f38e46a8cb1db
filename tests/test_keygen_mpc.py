"""Dealerless (MPC) Pinocchio keygen: keys must verify standard proofs."""

import pytest

import verifiable_mpc_tpu.tools.code_to_qap as c2q
import verifiable_mpc_tpu.tools.poly as qc
import verifiable_mpc_tpu.trinocchio.pynocchio as pynocchio
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve
from verifiable_mpc_tpu.mpc.runtime import mpc, run_multi
from verifiable_mpc_tpu.trinocchio.keygen_mpc import generate_keys_mpc

CODE = """
def qeval(x):
    y = x*x
    return y + x + 2
"""


async def keygen_and_prove():
    await mpc.start()
    bn = EllipticCurve("BN256", "jacobian")
    tw = EllipticCurve("BN256_twist", "jacobian")
    gf = GF(bn.order)
    gf.is_signed = False
    sectype = mpc.SecFld(modulus=bn.order)

    qap = c2q.QAP(CODE, gf)
    evalkey, verikey = await generate_keys_mpc(
        qap, bn.generator, tw.generator, sectype
    )
    await mpc.shutdown()

    # a standard single-prover proof must verify under the MPC-generated keys
    c = qap.calculate_witness([gf(3)])
    p = pynocchio.compute_p_poly(qap, c)
    h, r = p / qap.t
    assert r == qc.Poly([0] * qap.d)
    proof = pynocchio.compute_proof(qap, c, h, evalkey)
    return pynocchio.verify(qap, verikey, proof, c[: qap.out_ix + 1])


def test_keygen_mpc_1party():
    verification = mpc.run(keygen_and_prove())
    assert all(verification.values()), verification


def test_keygen_mpc_3party():
    results = run_multi(keygen_and_prove, 3)
    for verification in results:
        assert all(verification.values()), verification
