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


def test_sparse_r1cs_cols_match_dense():
    """flatcode_to_r1cs_cols must reproduce the dense builder's matrices
    exactly (rows, coefficients, signs) on every op kind."""
    from verifiable_mpc_tpu.tools import code_to_r1cs as c2r

    code = """def qeval(x, y):
    a = x * x
    b = a + y
    c = b - 3
    d = c / y
    e = d * b
    return e * 5 + x
"""
    inputs, body = c2r.extract_inputs_and_body(c2r.parse(code))
    flatcode = c2r.flatten_body(body)
    A, B, C = c2r.flatcode_to_r1cs(inputs, flatcode)
    a_cols, b_cols, c_cols = c2r.flatcode_to_r1cs_cols(inputs, flatcode)
    nv = len(c2r.get_var_placement(inputs, flatcode))
    for dense, cols in ((A, a_cols), (B, b_cols), (C, c_cols)):
        rebuilt = [[0] * nv for _ in dense]
        for i, col in enumerate(cols):
            for j, v in col:
                rebuilt[j][i] += v
        assert rebuilt == dense


def test_h_evals_path_matches_coeff_path():
    """The Lagrange-key h commitment must equal the power-basis one — same
    group element h'(s)*g1 — and the two prover routes must produce
    identical proofs for identical deltas."""
    sparse = qap_fast.SparseQAP(CODE, gf)
    td = pynocchio.Trapdoor(bn.order)
    gen = pynocchio.Generators(td, bn.generator, tw.generator)
    evalkey, verikey = qap_fast.generate_keys_fast(td, sparse, gen)
    c = sparse.calculate_witness([gf(3), gf(2)])
    deltas = pynocchio.SampleDeltas(bn.order)

    proof_eval = qap_fast.compute_proof_fast(sparse, c, evalkey, deltas)

    # coefficient route on the same key (strip the lag section)
    key_coeff = {k: v for k, v in evalkey.items() if not k.startswith("lag")}
    proof_coeff = qap_fast.compute_proof_fast(sparse, c, key_coeff, deltas)

    assert set(proof_eval) == set(proof_coeff)
    for k in proof_eval:
        assert proof_eval[k] == proof_coeff[k], k

    # share-injected h evaluations (the Trinocchio per-party entry point)
    h_vals = sparse.h_evals(c, deltas)
    proof_inj = qap_fast.compute_proof_fast(
        sparse, c, evalkey, deltas, h_eval_vals=h_vals
    )
    assert proof_inj["h*g1"] == proof_eval["h*g1"]
