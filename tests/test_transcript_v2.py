"""v2 transcript mode: chained round challenges + fold-free verifier.

Checks: end-to-end prove/verify round-trips (protocol 5 standalone and full
circuit-sat), the v2 verifier's exponent-product final generators match the
v1 fold chain on the same proof messages, tampered proofs are rejected, and
v1 transcripts are untouched (the golden tests in test_transcripts.py pin
that independently)."""

import random

import pytest

from verifiable_mpc_tpu import rng as vrng
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve
import verifiable_mpc_tpu.ac20.circuit_builder as cb
import verifiable_mpc_tpu.ac20.circuit_sat_cb as cs
import verifiable_mpc_tpu.ac20.compressed_pivot as cp
from verifiable_mpc_tpu.ac20 import pivot

group = EllipticCurve("Ed25519", "projective")
gf = GF(group.order)
rng = random.Random(31337)


def _setup(n):
    generators = cs.create_generators(n, cs.PivotChoice.compressed, group)
    x = [gf(rng.randrange(gf.order)) for _ in range(n)]
    gamma = rng.randrange(gf.order)
    L = pivot.LinearForm([rng.randrange(gf.order) for _ in range(n)])
    y = L(x)
    P = pivot.vector_commitment(x, gamma, generators["g"], generators["h"])
    return generators, x, gamma, L, y, P


def test_protocol5_v2_roundtrip():
    n = 15  # n+1 = 16: 3 folding rounds
    generators, x, gamma, L, y, P = _setup(n)
    proof = cp.protocol_5_prover(generators, P, L, y, x, gamma, gf,
                                 transcript="v2")
    assert cp.protocol_5_verifier(generators, P, L, y, proof, gf,
                                  transcript="v2")
    # v1 verifier must REJECT a v2 proof (different challenge chain)
    assert not cp.protocol_5_verifier(generators, P, L, y, proof, gf)


def test_protocol5_v2_rejects_tampering():
    n = 15
    generators, x, gamma, L, y, P = _setup(n)
    proof = cp.protocol_5_prover(generators, P, L, y, x, gamma, gf,
                                 transcript="v2")
    bad = dict(proof)
    bad["z_prime"] = [v + 1 for v in proof["z_prime"]]
    assert not cp.protocol_5_verifier(generators, P, L, y, bad, gf,
                                      transcript="v2")
    bad = dict(proof)
    bad["A0"] = proof["B0"]
    assert not cp.protocol_5_verifier(generators, P, L, y, bad, gf,
                                      transcript="v2")


def test_v2_final_generators_match_fold_chain():
    """The exponent-product MSM of protocol_4_verifier_v2 must reproduce
    exactly the generators the fold chain would produce."""
    from verifiable_mpc_tpu.ops.dispatch import fold_generators, multiexp

    n1 = 16
    g_hat = [group.generator ** rng.randrange(1, gf.order) for _ in range(n1)]
    cs_ = [rng.randrange(1, gf.order) for _ in range(3)]
    folded = list(g_hat)
    for c in cs_:
        half = len(folded) // 2
        folded = fold_generators(folded[:half], folded[half:], c)
    E = [1]
    for c in reversed(cs_):
        E = [(c * e) % gf.order for e in E] + E
    got = [multiexp(g_hat[0::2], E), multiexp(g_hat[1::2], E)]
    assert got == folded


def test_circuit_sat_v2_roundtrip():
    circuit = cb.Circuit()
    xv = cb.CircuitVar(gf(3), circuit, "x")
    yv = cb.CircuitVar(gf(5), circuit, "y")
    out = xv * yv + xv * 2 + 1
    out.label_output("out")
    x = circuit.initial_inputs()
    check, padding, g_length = cs.check_input_length_power_of_2(x, circuit)
    for i in range(padding):
        cb.CircuitVar(gf(0), circuit, "pad_" + str(i))
    x = circuit.initial_inputs()
    generators = cs.create_generators(
        g_length, cs.PivotChoice.compressed, group
    )
    proof = cs.circuit_sat_prover(
        generators, circuit, x, gf, cs.PivotChoice.compressed,
        transcript="v2",
    )
    verification = cs.circuit_sat_verifier(
        proof, generators, circuit, gf, cs.PivotChoice.compressed,
        transcript="v2",
    )
    ok = all(
        v if not isinstance(v, dict) else all(v.values())
        for v in verification.values()
    )
    assert ok
