"""Sparse/evaluation-form QAP path: must agree with the dense reference-style
path and verify end-to-end, including at moderate scale."""

import random

import pytest

import verifiable_mpc_tpu.tools.code_to_qap as c2q
import verifiable_mpc_tpu.tools.poly as qc
import verifiable_mpc_tpu.trinocchio.pynocchio as pynocchio
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve
from verifiable_mpc_tpu.trinocchio import qap_fast

rng = random.Random(55)

CODE = """
def qeval(x, y):
    z = x*x*y + 3*x + 1
    w = z*z + y
    return w + 7
"""

bn = EllipticCurve("BN256", "jacobian")
tw = EllipticCurve("BN256_twist", "jacobian")
gf = GF(bn.order)
gf.is_signed = False


def test_sparse_matches_dense_structure():
    dense = c2q.QAP(CODE, gf)
    sparse = qap_fast.SparseQAP(CODE, gf)
    assert sparse.d == dense.d and sparse.m == dense.m
    assert sparse.out_ix == dense.out_ix
    assert [int(c) for c in sparse.t_coeffs()] == [int(c) % gf.modulus for c in dense.t.coeffs]
    # v_i(s) agree with dense polynomial evaluation
    s = rng.randrange(bn.order)
    v_s, w_s, y_s = sparse.vwy_at(s)
    for i in range(sparse.m + 1):
        assert v_s[i] == int(dense.v[i].eval(gf(s))) % gf.modulus
        assert w_s[i] == int(dense.w[i].eval(gf(s))) % gf.modulus
        assert y_s[i] == int(dense.y[i].eval(gf(s))) % gf.modulus


def test_fast_keygen_and_prove_verify():
    sparse = qap_fast.SparseQAP(CODE, gf)
    td = pynocchio.Trapdoor(bn.order)
    gen = pynocchio.Generators(td, bn.generator, tw.generator)
    evalkey, verikey = qap_fast.generate_keys_fast(td, sparse, gen)

    # keys must equal the dense generator's keys
    dense = c2q.QAP(CODE, gf)
    evalkey_d = pynocchio.generate_evalkey(td, dense, gen)
    for key in evalkey_d:
        assert evalkey[key] == evalkey_d[key], key
    verikey_d = pynocchio.generate_verikey(td, dense, gen)
    for key in verikey_d:
        assert verikey[key] == verikey_d[key], key

    c = sparse.calculate_witness([gf(3), gf(2)])
    deltas = pynocchio.SampleDeltas(bn.order)
    proof = qap_fast.compute_proof_fast(sparse, c, evalkey, deltas)
    verification = pynocchio.verify(sparse, verikey, proof, c[: sparse.out_ix + 1])
    assert all(verification.values()), verification


def test_fast_path_scale_smoke():
    """A few hundred gates through the full fast pipeline."""
    lines = ["def qeval(x):", "    a0 = x*x + 1"]
    for i in range(1, 120):
        lines.append(f"    a{i} = a{i-1}*a{i-1} + {i}")
    lines.append("    return a119 + x")
    code = "\n".join(lines)

    sparse = qap_fast.SparseQAP(code, gf)
    td = pynocchio.Trapdoor(bn.order)
    gen = pynocchio.Generators(td, bn.generator, tw.generator)
    evalkey, verikey = qap_fast.generate_keys_fast(td, sparse, gen)
    c = sparse.calculate_witness([gf(3)])
    proof = qap_fast.compute_proof_fast(sparse, c, evalkey)
    verification = pynocchio.verify(sparse, verikey, proof, c[: sparse.out_ix + 1])
    assert all(verification.values()), verification
