"""Checkpointing + profiling subsystem tests."""

import verifiable_mpc_tpu.tools.code_to_qap as c2q
import verifiable_mpc_tpu.trinocchio.pynocchio as pynocchio
from verifiable_mpc_tpu import checkpoint
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve
from verifiable_mpc_tpu.profiling import Phases


def test_snark_keys_roundtrip(tmp_path):
    bn = EllipticCurve("BN256", "jacobian")
    tw = EllipticCurve("BN256_twist", "jacobian")
    gf = GF(bn.order)
    gf.is_signed = False
    qap = c2q.QAP("""
def qeval(x):
    y = x*x
    return y + 1
""", gf)
    td = pynocchio.Trapdoor(bn.order)
    gen = pynocchio.Generators(td, bn.generator, tw.generator)
    evalkey = pynocchio.generate_evalkey(td, qap, gen)
    verikey = pynocchio.generate_verikey(td, qap, gen)

    ek_path = str(tmp_path / "evalkey.vmpc")
    vk_path = str(tmp_path / "verikey.vmpc")
    checkpoint.save(evalkey, ek_path)
    checkpoint.save(verikey, vk_path)
    evalkey2 = checkpoint.load(ek_path)
    verikey2 = checkpoint.load(vk_path)
    assert set(evalkey2) == set(evalkey)
    assert all(evalkey2[k] == evalkey[k] for k in evalkey)

    # a proof made with reloaded keys verifies under reloaded verikey
    c = qap.calculate_witness([gf(3)])
    p = pynocchio.compute_p_poly(qap, c)
    h, _ = p / qap.t
    proof = pynocchio.compute_proof(qap, c, h, evalkey2)
    verification = pynocchio.verify(qap, verikey2, proof, c[: qap.out_ix + 1])
    assert all(verification.values())


def test_phases_report():
    phases = Phases()
    with phases.phase("a"):
        pass
    with phases.phase("b"):
        pass
    with phases.phase("a"):
        pass
    report = phases.report()
    assert "a" in report and "b" in report
    assert phases.order == ["a", "b"]
    assert phases.as_dict()["a"] >= 0
