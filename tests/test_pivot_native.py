"""Parity tests: the resident Protocol-4 engine (ac20/pivot_native.py) must
be transcript- and proof-identical to the generic loop it replaces."""

import pytest

import verifiable_mpc_tpu.ac20.compressed_pivot as compressed_pivot
import verifiable_mpc_tpu.ac20.pivot as pivot
import verifiable_mpc_tpu.ac20.pivot_native as pivot_native
from verifiable_mpc_tpu import native
from verifiable_mpc_tpu import rng as vrng
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native tier unavailable"
)

N = 127  # n+1 = 128 generators: above the engine threshold, 6 rounds


@pytest.fixture()
def setup():
    from verifiable_mpc_tpu.ops import dispatch

    saved_flags = (native.SCALAR_TIER, native.REGISTERED)
    saved = (
        dict(dispatch._MSM_BACKENDS),
        dict(dispatch._FOLD_BACKENDS),
        dict(dispatch._BATCH_EXP_BACKENDS),
    )
    assert native.register(min_batch=4)
    group = EllipticCurve("Ed25519")
    gf = GF(group.order)
    x = [gf(v + 1) for v in range(N)]
    g = [group.generator ** (i + 2) for i in range(N)]
    gens = {"g": g, "h": group.generator, "k": group.generator ** 3}
    P = pivot.vector_commitment(x, 13, g, gens["h"])
    L = pivot.LinearForm([gf(i + 1) for i in range(N)])
    yield group, gf, x, g, gens, P, L
    native.SCALAR_TIER, native.REGISTERED = saved_flags
    dispatch._MSM_BACKENDS.clear()
    dispatch._MSM_BACKENDS.update(saved[0])
    dispatch._FOLD_BACKENDS.clear()
    dispatch._FOLD_BACKENDS.update(saved[1])
    dispatch._BATCH_EXP_BACKENDS.clear()
    dispatch._BATCH_EXP_BACKENDS.update(saved[2])


def _prove(gens, P, L, x, gf):
    with vrng.deterministic(42):
        return compressed_pivot.protocol_5_prover(
            gens, P, L, pivot.form_eval(L, x, gf), x, 13, gf
        )


def test_engine_proof_identical_to_generic(setup, monkeypatch):
    group, gf, x, g, gens, P, L = setup
    engine_proof = _prove(gens, P, L, x, gf)

    calls = {"n": 0}
    orig = pivot_native.try_protocol_4_prover

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pivot_native, "try_protocol_4_prover", counting)
    monkeypatch.setattr(pivot_native, "_MIN_N", 1 << 30)  # force generic
    generic_proof = _prove(gens, P, L, x, gf)
    assert calls["n"] == 1

    assert set(engine_proof) == set(generic_proof)
    for key in engine_proof:
        a, b = engine_proof[key], generic_proof[key]
        assert repr(a) == repr(b), key  # exact coords, types and values


def test_engine_verifier_matches_generic(setup, monkeypatch):
    group, gf, x, g, gens, P, L = setup
    proof = _prove(gens, P, L, x, gf)
    y = pivot.form_eval(L, x, gf)
    assert compressed_pivot.protocol_5_verifier(gens, P, L, y, proof, gf)
    monkeypatch.setattr(pivot_native, "_MIN_N", 1 << 30)
    assert compressed_pivot.protocol_5_verifier(gens, P, L, y, proof, gf)
    # tampered proof must fail through the engine path too
    monkeypatch.setattr(pivot_native, "_MIN_N", 64)
    bad = dict(proof)
    bad["z_prime"] = [v + 1 for v in proof["z_prime"]]
    assert not compressed_pivot.protocol_5_verifier(gens, P, L, y, bad, gf)


def test_engine_parity_with_raw_int_coeffs(setup, monkeypatch):
    """The circuit-sat flow hands protocol 5 a combined form whose
    coefficients include huge unreduced ints (the reference's int
    arithmetic); the engine must reduce them for math but hash the raw
    object in round 0 — challenge- and proof-identical to the generic
    loop."""
    group, gf, x, g, gens, P, L = setup
    coeffs = list(L.coeffs)
    coeffs[0] = 123 * gf.modulus + 7  # unreduced int
    coeffs[1] = gf.modulus - 1  # in range but signed-repr differs
    coeffs[2] = 0
    L2 = pivot.LinearForm(coeffs)
    engine_proof = _prove(gens, P, L2, x, gf)
    monkeypatch.setattr(pivot_native, "_MIN_N", 1 << 30)
    generic_proof = _prove(gens, P, L2, x, gf)
    for key in engine_proof:
        assert repr(engine_proof[key]) == repr(generic_proof[key]), key
    y = pivot.form_eval(L2, x, gf)
    assert compressed_pivot.protocol_5_verifier(gens, P, L2, y, engine_proof, gf)
    monkeypatch.setattr(pivot_native, "_MIN_N", 64)
    assert compressed_pivot.protocol_5_verifier(gens, P, L2, y, engine_proof, gf)


def test_engine_disengages_without_registration(setup, monkeypatch):
    group, gf, x, g, gens, P, L = setup
    native.REGISTERED = False
    assert (
        pivot_native.try_protocol_4_prover(
            g + [gens["h"]], gens["k"], P, pivot.LinearForm(L.coeffs + [0]),
            x + [gf(1)], gf, {}, 0
        )
        is None
    )
