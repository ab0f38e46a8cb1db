"""Reference-parity transcript mode (transcript="ref").

Validates that ac20/ref_transcript.py reproduces the reference's
``str(input_list).encode("utf-8")`` Fiat-Shamir bytes (reference
pivot.py:131-136): the encoding rules against real Python ``str()``, the
circuit string against the reference's recursive ``print_circuit``
expansion, and frozen end-to-end transcripts for the pivot and compressed
paths under the deterministic RNG.
"""

import random

import verifiable_mpc_tpu.ac20.circuit_builder as cb
import verifiable_mpc_tpu.ac20.circuit_sat_cb as cs
import verifiable_mpc_tpu.ac20.compressed_pivot as compressed_pivot
import verifiable_mpc_tpu.ac20.pivot as pivot
import verifiable_mpc_tpu.ac20.ref_transcript as rt
from verifiable_mpc_tpu import rng as vrng
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve, QuadraticResidues
from verifiable_mpc_tpu.groups.edwards import P as ED_P

prng = random.Random(17)


def test_ref_encode_plain_python_types():
    """For plain Python values the encoding IS str(list)."""
    cases = [
        [1, -2, 0, 10**40],
        ["tag", "with 'quote'", ""],
        [[1, 2], (3, 4), (5,), {}, {"g": [1], "h": 2}],
        [True, False, None],
        [0, "First hash of compressed pivot"],
    ]
    for case in cases:
        assert rt.ref_encode(case) == str(case).encode("utf-8"), case


def test_ref_repr_field_elements_signed():
    gf = GF(101)
    assert rt.ref_repr(gf(5)) == "5"
    assert rt.ref_repr(gf(100)) == "-1"  # signed representative (A1)
    assert rt.ref_encode([gf(5), gf(100)]) == b"[5, -1]"


def test_ref_repr_edwards_point_three_signed_coords():
    g = EllipticCurve("Ed25519").generator
    s = rt.ref_repr(g)
    # 3-tuple (projective), extended t dropped (A2)
    assert s.startswith("(") and s.endswith(")") and s.count(",") == 2
    x, y, z = (int(v) for v in s[1:-1].split(", "))
    # signed coordinates (A3): congruent to the stored residues
    assert x % ED_P == g.x and y % ED_P == g.y and z % ED_P == g.z
    assert abs(x) <= ED_P // 2 and abs(y) <= ED_P // 2
    assert rt.ref_repr(g.normalize()).endswith(", 1)")
    # Ed25519 base point: y = 4/5 mod p > p/2, so its repr is negative
    assert y < 0


def test_ref_repr_qr_signed():
    group = QuadraticResidues(l=64)
    e = group.generator ** 5
    v = int(rt.ref_repr(e))
    assert v % group.modulus == e.value and abs(v) <= group.modulus // 2


def test_ref_repr_bn_twist_gfpx_tokens():
    """A5-A7: GF(p^2) coordinates repr as MPyC gfpx polynomial term
    strings (descending degree, '+'-joined, unit coefficients omitted,
    no '*', unsigned residues, zero polynomial '0')."""
    from verifiable_mpc_tpu.groups.bn256 import BNTwistPoint, GFp2
    from verifiable_mpc_tpu.groups.bn256 import P as BNP

    assert rt.ref_repr(GFp2(0, 1)) == "x"  # i itself (pairing.py:56)
    assert rt.ref_repr(GFp2(3, 1)) == "x+3"  # xi = i + 3 (pairing.py:57)
    assert rt.ref_repr(GFp2(5, 0)) == "5"
    assert rt.ref_repr(GFp2(0, 0)) == "0"
    assert rt.ref_repr(GFp2(7, 2)) == "2x+7"
    assert rt.ref_repr(GFp2(0, 9)) == "9x"
    # coefficients are canonical residues: NO signed repr (A6)
    assert rt.ref_repr(GFp2(BNP - 1, BNP - 1)) == f"{BNP - 1}x+{BNP - 1}"

    g2 = BNTwistPoint.generator
    expect = (
        f"({rt.ref_repr(g2.x)}, {rt.ref_repr(g2.y)}, {rt.ref_repr(g2.z)})"
    )
    assert rt.ref_repr(g2) == expect
    # the KoE z_commitment dict as the reference hashes it
    # (circuit_sat_r1cs.py:436-447): dict repr with quoted keys
    from verifiable_mpc_tpu.groups.bn256 import BNPoint

    g1 = BNPoint.generator
    d = {"P": g1, "pi": g2}
    assert (
        rt.ref_repr(d) == f"{{'P': {rt.ref_repr(g1)}, 'pi': {expect}}}"
    )


def test_circuit_sat_koe_ref_transcript_roundtrip():
    """ref mode through the KoE pivot (reference circuit_sat_r1cs.py koe
    branch + knowledge_of_exponent.py): the z_commitment {P, pi} dict with
    its BN256-twist pi is hashed in both protocol-8 hashes and the nullity
    hash, so this exercises the gfpx twist reprs end-to-end."""
    from verifiable_mpc_tpu.groups.bn256 import BNPoint, BNTwistPoint

    gf = GF(BNPoint.order)
    circuit = cb.Circuit()
    b = cb.CircuitVar(1, circuit, "b")
    c = cb.CircuitVar(2, circuit, "c")
    d = c * c + b * 3 + 1
    (d * c).label_output("f")
    xs = circuit.initial_inputs()
    _, padding, g_length = cs.check_input_length_power_of_2(xs, circuit)
    for i in range(padding):
        cb.CircuitVar(0, circuit, f"unused_{i}")
    xs = circuit.initial_inputs()
    group = [
        EllipticCurve("BN256", "jacobian"),
        EllipticCurve("BN256_twist", "jacobian"),
    ]
    with vrng.deterministic(93):
        gens = cs.create_generators(g_length, cs.PivotChoice.koe, group)
        proof = cs.circuit_sat_prover(
            gens, circuit, xs, gf, cs.PivotChoice.koe, transcript="ref"
        )
    v = cs.circuit_sat_verifier(
        proof, gens, circuit, gf, cs.PivotChoice.koe, transcript="ref"
    )
    flat = [
        x2 if not isinstance(x2, dict) else all(x2.values())
        for x2 in v.values()
    ]
    assert all(flat), v
    # the default transcript derives different challenges: the ref-mode
    # proof's nullity form no longer matches
    v1 = cs.circuit_sat_verifier(
        proof, gens, circuit, gf, cs.PivotChoice.koe
    )
    flat1 = [
        x2 if not isinstance(x2, dict) else all(x2.values())
        for x2 in v1.values()
    ]
    assert not all(flat1)


def test_ref_repr_affine_form_matches_reference_format():
    gf = GF(101)
    lf = pivot.LinearForm([1, gf(2)])
    assert rt.ref_repr(lf) == "[1, 2], 0"  # reference pivot.py:81-82
    af = pivot.AffineForm([0, gf(100)], gf(7))
    assert rt.ref_repr(af) == "[0, -1], 7"
    # nested in a list exactly as repr() would nest it
    assert rt.ref_encode([lf, 9]) == b"[[1, 2], 0, 9]"


def test_ref_circuit_string_matches_recursive_reference():
    """print_circuit_ref == the reference's recursive expansion
    (reference circuit_builder.py:403-414), including re-expansion of
    shared gates."""
    gf = GF(101)
    circuit = cb.Circuit()
    x = cb.CircuitVar(gf(3), circuit, "x")
    y = x * x + 1
    z = y * y  # shares y: the reference re-expands its subtree twice
    z.label_output("z")

    def ref_print_out_gate(circuit, gate, level=0):
        ret = "\t" * level + str(gate) + "\n"
        for child in circuit.children(gate):
            ret += ref_print_out_gate(circuit, child, level + 1)
        return ret

    expect = "".join(
        ref_print_out_gate(circuit, g) for g in circuit.out_gates()
    )
    assert rt.print_circuit_ref(circuit) == expect
    assert rt.ref_repr(circuit) == repr(expect)


def _pivot_proof(group, transcript):
    gf = GF(group.order)
    with vrng.deterministic(1234):
        x = [gf(1), gf(2), gf(3), gf(4)]
        g = [group.generator ** (i + 2) for i in range(4)]
        h = group.generator
        P = pivot.vector_commitment(x, 77, g, h)
        L = pivot.LinearForm([5, 6, 7, 8])
        return pivot.prove_linear_form_eval(
            g, h, P, L, L(x), x, 77, gf, transcript=transcript
        ), (g, h, P, L, L(x))


def test_pivot_ref_transcript_roundtrip_and_divergence():
    for group in (QuadraticResidues(l=64), EllipticCurve("Ed25519")):
        (z, phi, c), (g, h, P, L, y) = _pivot_proof(group, "ref")
        assert pivot.verify_linear_form_proof(
            g, h, P, L, y, z, phi, c, transcript="ref"
        )
        # same seed under the default transcript yields a DIFFERENT
        # challenge: the two byte encodings are distinct on purpose
        (_, _, c_v1), _ = _pivot_proof(group, "v1")
        assert c != c_v1
        assert not pivot.verify_linear_form_proof(
            g, h, P, L, y, z, phi, c, transcript="v1"
        )


def test_compressed_ref_transcript_roundtrip():
    group = EllipticCurve("Ed25519")
    gf = GF(group.order)

    def setup():
        x = [gf(v) for v in [1, 2, 3, 4, 5, 6, 7]]
        g = [group.generator ** (i + 2) for i in range(7)]
        gens = {"g": g, "h": group.generator, "k": group.generator ** 3}
        P = pivot.vector_commitment(x, 13, g, gens["h"])
        L = pivot.LinearForm(list(range(1, 8)))
        return x, gens, P, L

    x, gens, P, L = setup()
    with vrng.deterministic(99):
        proof = compressed_pivot.protocol_5_prover(
            gens, P, L, L(x), x, 13, gf, transcript="ref"
        )
    assert compressed_pivot.protocol_5_verifier(
        gens, P, L, L(x), proof, gf, transcript="ref"
    )
    assert not compressed_pivot.protocol_5_verifier(
        gens, P, L, L(x), proof, gf, transcript="v1"
    )


def test_circuit_sat_ref_transcript_roundtrip():
    group = EllipticCurve("Ed25519")
    gf = GF(group.order)
    circuit = cb.Circuit()
    xv = cb.CircuitVar(gf(3), circuit, "x")
    acc = xv
    for _ in range(3):
        acc = acc * acc + 1
    (acc * xv).label_output("out")
    xs = circuit.initial_inputs()
    _, padding, g_length = cs.check_input_length_power_of_2(xs, circuit)
    for i in range(padding):
        cb.CircuitVar(gf(0), circuit, f"unused_{i}")
    xs = circuit.initial_inputs()
    with vrng.deterministic(31):
        gens = cs.create_generators(g_length, cs.PivotChoice.compressed, group)
        proof = cs.circuit_sat_prover(
            gens, circuit, xs, gf, cs.PivotChoice.compressed, transcript="ref"
        )
    verification = cs.circuit_sat_verifier(
        proof, gens, circuit, gf, cs.PivotChoice.compressed, transcript="ref"
    )
    flat = [
        v if not isinstance(v, dict) else all(v.values())
        for v in verification.values()
    ]
    assert all(flat), verification


def test_ref_transcript_golden_bytes():
    """Frozen encoding of a representative input_list: any drift in the
    reference string layout is a protocol break, not a test to update."""
    group = EllipticCurve("Ed25519")
    gf = GF(group.order)
    g = group.generator
    lst = [
        gf(2) - gf(5),
        g.normalize(),
        [g, g.normalize()],
        pivot.LinearForm([1, gf(2)]),
        7,
        "First hash of compressed pivot",
    ]
    enc = rt.ref_encode(lst).decode()
    gx, gy = g.x, g.y  # generator is affine-constructed: z == 1
    sx = gx - ED_P if gx > ED_P // 2 else gx
    sy = gy - ED_P if gy > ED_P // 2 else gy
    expect = (
        f"[-3, ({sx}, {sy}, 1), [({sx}, {sy}, 1), ({sx}, {sy}, 1)], "
        f"[1, 2], 0, 7, 'First hash of compressed pivot']"
    )
    assert enc == expect


def test_circuit_sat_r1cs_ref_transcript_roundtrip():
    """ref mode on the code-string front-end: the code string hashes
    quoted (a str in the input_list), forms and points as ref reprs."""
    import verifiable_mpc_tpu.ac20.circuit_sat_r1cs as csr

    group = EllipticCurve("Ed25519", "projective")
    gf = GF(group.order)
    code = """
def qeval(x):
    a0 = x*x + 1
    a1 = a0*a0 + 2
    return a1 + x
"""
    x = [gf(3)]
    padded_x, padded_code, z_len = csr.input_length_power_of_2(x, code)
    with vrng.deterministic(77):
        gens = csr.create_generators(z_len, csr.PivotChoice.compressed, group)
        proof = csr.circuit_sat_prover(
            gens, padded_code, padded_x, gf, csr.PivotChoice.compressed,
            transcript="ref",
        )
    v = csr.circuit_sat_verifier(
        proof, gens, padded_code, gf, csr.PivotChoice.compressed,
        transcript="ref",
    )
    flat = [
        x2 if not isinstance(x2, dict) else all(x2.values())
        for x2 in v.values()
    ]
    assert all(flat), v
    # and the default transcript must reject the ref-mode proof
    v1 = csr.circuit_sat_verifier(
        proof, gens, padded_code, gf, csr.PivotChoice.compressed
    )
    flat1 = [
        x2 if not isinstance(x2, dict) else all(x2.values())
        for x2 in v1.values()
    ]
    assert not all(flat1)
