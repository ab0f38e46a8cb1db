"""Evaluation-form f/g/h construction (m >= threshold) must produce proofs
the standard verifier accepts, in both front-ends."""

import verifiable_mpc_tpu.ac20.circuit_builder as cb
import verifiable_mpc_tpu.ac20.circuit_sat_cb as cs_cb
import verifiable_mpc_tpu.ac20.circuit_sat_r1cs as cs
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve


def _ok(verification):
    return all(
        v if not isinstance(v, dict) else all(v.values())
        for v in verification.values()
    )


group = EllipticCurve("Ed25519", "projective")
gf = GF(group.order)


def test_cb_eval_form_roundtrip():
    circuit = cb.Circuit()
    x = cb.CircuitVar(gf(3), circuit, "x")
    acc = x
    for i in range(140):  # > _FAST_POLY_THRESHOLD muls
        acc = acc * acc + i
    out = acc * x
    out.label_output("out")
    assert circuit.mul_ct >= cs._FAST_POLY_THRESHOLD

    xs = circuit.initial_inputs()
    _, padding, g_length = cs_cb.check_input_length_power_of_2(xs, circuit)
    for i in range(padding):
        cb.CircuitVar(gf(0), circuit, "u" + str(i))
    xs = circuit.initial_inputs()

    gens = cs_cb.create_generators(g_length, cs.PivotChoice.compressed, group)
    proof = cs_cb.circuit_sat_prover(gens, circuit, xs, gf, cs.PivotChoice.compressed)
    v = cs_cb.circuit_sat_verifier(proof, gens, circuit, gf, cs.PivotChoice.compressed)
    assert _ok(v), v


def test_r1cs_eval_form_roundtrip():
    lines = ["def qeval(x):", "    a0 = x*x + 1"]
    for i in range(1, 140):
        lines.append(f"    a{i} = a{i-1}*a{i-1} + {i}")
    lines.append("    return a139 + x")
    code = "\n".join(lines)

    x = [gf(3)]
    padded_x, padded_code, z_len = cs.input_length_power_of_2(x, code)
    gens = cs.create_generators(z_len, cs.PivotChoice.compressed, group)
    proof = cs.circuit_sat_prover(
        gens, padded_code, padded_x, gf, cs.PivotChoice.compressed
    )
    v = cs.circuit_sat_verifier(
        proof, gens, padded_code, gf, cs.PivotChoice.compressed
    )
    assert _ok(v), v


def test_fg_form_native_equals_python(monkeypatch):
    """The C CSR accumulation of calculate_fg_form is value-identical to
    the Python sparse loop at m >= 64 (coeffs, constant, and the
    serialized-hash view that feeds Fiat-Shamir)."""
    import random

    from verifiable_mpc_tpu import serialization

    rng = random.Random(23)
    circuit = cb.Circuit()
    x = cb.CircuitVar(gf(3), circuit, "x")
    y = cb.CircuitVar(gf(5), circuit, "y")
    acc = x
    for i in range(70):  # mix adds/scalar-muls so forms have real fan-in
        acc = acc * (y + i) + x * 2 + 1
    (acc * y).label_output("out")
    m = circuit.mul_ct
    assert m >= 64
    challenge = rng.randrange(1, gf.order)

    for wire in (0, 1):
        fast = cb.calculate_fg_form(circuit, wire, challenge, gf)
        monkeypatch.setattr(cb, "_fg_form_native", lambda *a: None)
        slow = cb.calculate_fg_form(circuit, wire, challenge, gf)
        monkeypatch.undo()
        assert len(fast.coeffs) == len(slow.coeffs)
        assert all(
            int(gf(a)) == int(gf(b))
            for a, b in zip(fast.coeffs, slow.coeffs)
        )
        assert int(gf(fast.constant)) == int(gf(slow.constant))
        assert serialization.dumps(fast) == serialization.dumps(slow)
