"""AC20 circuit satisfiability (Protocol 8), code-string/R1CS front-end.

Behavior parity with reference
/root/reference/verifiable_mpc/ac20/circuit_sat_r1cs.py: PivotChoice dispatch
(:39-44, :591-654), padding helpers (:96-128), linear-form extraction from
flatcode (:142-351), witness/vector helpers (:354-388) and the protocol-8
prover/verifier (:395-588).

TPU-first deviations: generator setup and commitments run through the batched
dispatch layer; ``express_as_x_or_gamma`` memoizes per-symbol splits so form
extraction stays linear in circuit size.
"""

from __future__ import annotations

import logging

from .. import rng
from ..tools import code_to_r1cs as c2r
from ..tools import poly as qc
from . import compressed_pivot
from . import knowledge_of_exponent as koe
from . import nullity
from . import pivot
from .recombine import _recombination_vectors
from .setup_gens import PivotChoice, create_generators  # noqa: F401 (re-export)

logger_cs = logging.getLogger("circuit_sat")
logger_cs.setLevel(logging.INFO)

logger_cs_hin = logging.getLogger("circuit_sat_hash_inputs")
logger_cs_hin.setLevel(logging.INFO)

logger_cs_hout = logging.getLogger("circuit_sat_hash_outputs")
logger_cs_hout.setLevel(logging.INFO)


def next_power_of_2(x):
    return 1 << (x).bit_length()


def _plain_values(values):
    from ..fields import FiniteFieldElement

    return all(isinstance(v, (int, FiniteFieldElement)) for v in values)


def input_length_power_of_2(x, code, pad_with=0):
    """Pad code and x so len(z)+1 is a power of two (reference :96-128)."""
    inputs, body = c2r.extract_inputs_and_body(c2r.parse(code))
    flatcode = c2r.flatten_body(body)
    m = len(mul_in_flatcode(flatcode))
    z_len = len(inputs) + 3 + 2 * m

    if not bin(z_len + 1).count("1") == 1:
        padding = next_power_of_2(z_len) - z_len - 1
    else:
        padding = 0
    padded_x = x + [type(x[0])(pad_with)] * padding
    new_z_len = len(padded_x) + 3 + 2 * m
    assert (
        bin(new_z_len + 1).count("1") == 1
    ), "This implementation requires n+1 to be power of 2 (else, use padding with zeros)."

    def_line = [line for line in code.split("\n") if line.startswith("def")][0]
    function_params = def_line[def_line.find("(") + 1 : def_line.find(")")]
    input_vars = [s.strip() for s in function_params.split(",")]
    new_input_vars = input_vars + ["padding_" + str(i) for i in range(padding)]
    padded_code = code.replace(function_params, ", ".join(new_input_vars), 1)
    return padded_x, padded_code, new_z_len


def calculate_witness(code, input_vars):
    inputs, body = c2r.extract_inputs_and_body(c2r.parse(code))
    flatcode = c2r.flatten_body(body)
    return c2r.assign_variables(inputs, input_vars, flatcode)


def mul_in_flatcode(flatcode):
    return [i for i, line in enumerate(flatcode) if line[0] == "*"]


def _operand_coeff_symbol(operand):
    """Split a flatcode operand into (coefficient, symbol); ints become
    (value, 1) (reference :148-160)."""
    if isinstance(operand, int):
        return operand, 1
    return 1, operand


def express_as_x_or_gamma(symbol, flatcode, varnames, n, _cache=None):
    """Express a flatcode symbol as a linear form over the z-vector
    (reference :142-233), with memoized recursive splitting."""
    mul_indices = mul_in_flatcode(flatcode)
    m = len(mul_indices)
    symbols_for_x = list(varnames[1 : n + 1])
    symbols_for_gammas = [flatcode[i][1] for i in mul_indices]

    assign_index = {}
    for i, line in enumerate(flatcode):
        if line[1] in assign_index:
            raise NotImplementedError("Code assumes that symbol only gets assigned once.")
        assign_index[line[1]] = i

    x_set = set(symbols_for_x)
    gamma_set = set(symbols_for_gammas)
    split_cache = {}

    def split(sym):
        if sym in split_cache:
            return split_cache[sym]
        if sym not in assign_index:
            raise ValueError("Symbol does not get assigned a value in flatcode.")
        line = flatcode[assign_index[sym]]
        if line[0] == "+":
            terms = [(line[2], 1), (line[3], 1)]
        elif line[0] == "-":
            terms = [(line[2], 1), (line[3], -1)]
        elif line[0] == "set":
            terms = [(line[2], 1)]
        else:
            raise NotImplementedError

        symbols, coeffs = [], []
        for operand, sign in terms:
            coeff, s = _operand_coeff_symbol(operand)
            coeff *= sign
            if s in x_set or s in gamma_set or isinstance(s, int):
                symbols.append(s)
                coeffs.append(coeff)
            elif not isinstance(s, str):
                raise NotImplementedError(
                    "Not able to parse other value types than ints and strings."
                )
            else:
                sub_syms, sub_coeffs = split(s)
                symbols.extend(sub_syms)
                coeffs.extend(c * coeff for c in sub_coeffs)
        split_cache[sym] = (symbols, coeffs)
        return symbols, coeffs

    symbols, coeffs = split(symbol)

    z_symbols = symbols_for_x + ["f0", "g0", "h0"] + symbols_for_gammas
    acc = {}
    const = 0
    for s, cf in zip(symbols, coeffs):
        if isinstance(s, int):
            const += cf * s if s != 1 else cf
        else:
            acc[s] = acc.get(s, 0) + cf
    form = pivot.LinearForm(
        [acc.get(z_i, 0) for z_i in z_symbols] + [0] * m
    )
    if const:
        form = form + const
    return form


def mul_gates_for_splitting(flatcode, varnames, n):
    """Mul-gate operands that are neither z-terms nor ints (reference :236-260)."""
    mul_indices = mul_in_flatcode(flatcode)
    symbols_for_x = list(varnames[1 : n + 1])
    symbols_for_gammas = [flatcode[i][1] for i in mul_indices]
    z_symbols = set(symbols_for_x) | set(symbols_for_gammas)

    requires_splitting = []
    for j in (2, 3):
        for ix in mul_indices:
            symbol = flatcode[ix][j]
            if not (symbol in z_symbols or isinstance(symbol, int)):
                wiretype = "left" if j == 2 else "right"
                requires_splitting.append((symbol, ix, wiretype))
    return requires_splitting


def lagrange(gf, lagr_range, c):
    return _recombination_vectors(gf, tuple(lagr_range), (c,))[0]


def create_fgh_linear_forms(r1cs, c, varnames, flatcode, mul_indices_of_flatcode, n, m, gf):
    """Linear forms for f(c), g(c), h(c) over the z-vector (reference :267-351)."""
    A, B, C = r1cs
    gamma_indices_of_varnames = [
        varnames.index(flatcode[i][1]) for i in mul_indices_of_flatcode
    ]
    symbols_to_split = mul_gates_for_splitting(flatcode, varnames, n)
    split_terms = [
        express_as_x_or_gamma(s_tuple[0], flatcode, varnames, n)
        for s_tuple in symbols_to_split
    ]
    varname_index = {v: i for i, v in enumerate(varnames)}

    def create_linear_form(M, wiretype):
        if wiretype == "left":
            poly_at_0_index = n
            lagr_range = range(m + 1)
        elif wiretype == "right":
            poly_at_0_index = n + 1
            lagr_range = range(m + 1)
        elif wiretype == "out":
            poly_at_0_index = n + 2
            lagr_range = range(2 * m + 1)
        else:
            raise ValueError(
                f"Wiretype {wiretype} should be either 'left', 'right' or 'out'."
            )

        lagr = lagrange(gf, lagr_range, c)

        def x_terms_j(ix):
            return pivot.LinearForm(
                [gf(M[ix][i + 1]) for i in range(n)] + [gf(0)] * (3 + 2 * m)
            )

        def gamma_terms_j(ix):
            return pivot.LinearForm(
                [gf(0)] * (n + 3)
                + [gf(M[ix][g_ix]) for g_ix in gamma_indices_of_varnames]
                + [0] * m
            )

        def other_terms_j(ix):
            return sum(
                gf(M[ix][varname_index[s_tuple[0]]]) * split_terms[i]
                for i, s_tuple in enumerate(symbols_to_split)
                if (s_tuple[1] == ix and s_tuple[2] == wiretype)
            )

        def uvw_form_j(ix):
            return gf(M[ix][0]) + x_terms_j(ix) + gamma_terms_j(ix) + other_terms_j(ix)

        poly_at_0 = [0] * (n + 3 + 2 * m)
        poly_at_0[poly_at_0_index] = 1
        linform_0_to_m = pivot.LinearForm(poly_at_0) * lagr[0] + sum(
            uvw_form_j(ix) * lagr[j + 1]
            for j, ix in enumerate(mul_indices_of_flatcode)
        )

        if wiretype == "out":
            linform = (
                linform_0_to_m
                + pivot.LinearForm(
                    [0] * (n + 3 + m) + [1 * lagr[1 + m + i] for i in range(m)]
                )
                + linform_0_to_m.constant
            )
        else:
            linform = linform_0_to_m
        return linform

    linform_f = create_linear_form(A, "left")
    linform_g = create_linear_form(B, "right")
    linform_h = create_linear_form(C, "out")
    return linform_f, linform_g, linform_h


def code_to_flatcode_and_r1cs(code):
    inputs, body = c2r.extract_inputs_and_body(c2r.parse(code))
    flatcode = c2r.flatten_body(body)
    varnames = c2r.get_var_placement(inputs, flatcode)
    r1cs = c2r.flatcode_to_r1cs(inputs, flatcode)
    return flatcode, inputs, varnames, r1cs


def _inner_prod_asymmetric(v1, v2):
    out = type(v2[-1])(0)
    for k in (i for i, e in enumerate(v1) if e != 0):
        out += v1[k] * v2[k]
    return out


def calculate_ab_vectors(r1cs, xc, mul_indices_of_flatcode):
    A, B, C = r1cs
    a = [_inner_prod_asymmetric(A[j], xc) for j in mul_indices_of_flatcode]
    b = [_inner_prod_asymmetric(B[j], xc) for j in mul_indices_of_flatcode]
    return a, b


_FAST_POLY_THRESHOLD = 128


def calculate_fgh_polys(a, b, c, gf):
    """Random masking polys f, g and their product h (reference :380-388).

    Above the threshold, interpolation over 1..m+1 and the f*g product run
    through the quasi-linear toolkit (subproduct trees + NTT) instead of the
    reference's O(m^2)/O(m^2) kernels."""
    r_a = rng.randrange(1, gf.order)
    r_b = rng.randrange(1, gf.order)
    if len(a) + 1 >= _FAST_POLY_THRESHOLD:
        from ..tools import fastpoly

        p = gf.modulus
        pts = list(range(1, len(a) + 2))
        fa = fastpoly.interpolate(pts, [int(gf(v)) % p for v in a] + [r_a], p)
        fb = fastpoly.interpolate(pts, [int(gf(v)) % p for v in b] + [r_b], p)
        fh = fastpoly.poly_mul(fa, fb, p)
        f_poly = qc.Poly([gf(v) for v in fa])
        g_poly = qc.Poly([gf(v) for v in fb])
        h_poly = qc.Poly([gf(v) for v in fh])
        return f_poly, g_poly, h_poly
    f_poly = qc.Poly(qc.lagrange_interp_ff([gf(v) for v in a] + [gf(r_a)], gf))
    g_poly = qc.Poly(qc.lagrange_interp_ff([gf(v) for v in b] + [gf(r_b)], gf))
    h_poly = f_poly * g_poly
    return f_poly, g_poly, h_poly


def calculate_fgh_evaluations(a, b, gf):
    """(f(0), g(0), h(0), [h(1..2m)]) built purely in evaluation form.

    f interpolates a + [r_a] at 1..m+1 (same polynomial as
    calculate_fgh_polys); its values at 0 and m+2..2m come from one
    extrapolation, and h's evaluations are pointwise products — the
    degree-2m coefficient product of the reference (qap_creator.py:62-67)
    is never formed.
    """
    from ..tools import fastpoly

    m = len(a)
    p = gf.modulus
    r_a = rng.randrange(1, gf.order)
    r_b = rng.randrange(1, gf.order)
    f_vals = [int(gf(v)) % p for v in a] + [r_a]  # f(1..m+1)
    g_vals = [int(gf(v)) % p for v in b] + [r_b]
    # single-point evaluations at 0: one C Lagrange row (consecutive nodes,
    # one modular inversion) + one C dot each — a count=1 shift_evaluations
    # paid a full NTT convolution per value
    f0 = g0 = None
    if m + 1 >= 64:
        from ..ops import modvec
        from .recombine import _recombination_vectors

        if modvec._native_ok(gf):
            from .. import native

            row = _recombination_vectors(gf, tuple(range(1, m + 2)), (0,))[0]
            row_arr = native._ints_to_u64x4([int(w) % p for w in row], p)
            f0 = native.mod_dot_arr(
                row_arr, native._ints_to_u64x4(f_vals, p), p
            )
            g0 = native.mod_dot_arr(
                row_arr, native._ints_to_u64x4(g_vals, p), p
            )
    if f0 is None:
        # consecutive sample points -> shift-of-evaluations (one NTT
        # convolution per target range)
        f0 = fastpoly.shift_evaluations(f_vals, 1, 0, 1, p)[0]
        g0 = fastpoly.shift_evaluations(g_vals, 1, 0, 1, p)[0]
    if m >= 2:
        f_hi = fastpoly.shift_evaluations(f_vals, 1, m + 2, m - 1, p)
        g_hi = fastpoly.shift_evaluations(g_vals, 1, m + 2, m - 1, p)
    else:
        f_hi, g_hi = [], []
    f_all = f_vals + f_hi  # f(1..2m)
    g_all = g_vals + g_hi
    from ..ops import modvec

    h_evals = modvec.hadamard_ints(f_all, g_all, gf)
    if h_evals is None:
        h_evals = [gf(u * v) for u, v in zip(f_all, g_all)]
    return gf(f0), gf(g0), gf(f0 * g0), h_evals


def evaluate_at_range(poly, start, count, gf):
    """[poly(start), ..., poly(start+count-1)] — fast multi-point evaluation
    above the threshold (the h(1..2m) vector, reference :427)."""
    if count >= _FAST_POLY_THRESHOLD:
        from ..tools import fastpoly

        p = gf.modulus
        coeffs = [int(gf(c)) % p for c in poly.coeffs]
        pts = list(range(start, start + count))
        return [gf(v) for v in fastpoly.multipoint_eval(coeffs, pts, p)]
    return [poly.eval(start + i) for i in range(count)]


def protocol_8_excl_pivot_prover(generators, code, x, gf, use_koe=False):
    """Protocol 8 prover, excluding the pivot call (reference :395-506)."""
    if "g" in generators:
        g = generators["g"]
        h = generators["h"]
    elif "pp_lhs" in generators:
        use_koe = True
        pp = generators
    else:
        raise NotImplementedError

    n = len(x)
    xc = calculate_witness(code, x)
    proof = {}
    flatcode, inputs, varnames, r1cs = code_to_flatcode_and_r1cs(code)

    mul_indices_of_flatcode = mul_in_flatcode(flatcode)
    m = len(mul_indices_of_flatcode)
    output_variables = [s for s in varnames if s.startswith("~out")]

    a, b = calculate_ab_vectors(r1cs, xc, mul_indices_of_flatcode)
    c = [a_i * b_i for a_i, b_i in zip(a, b)]

    f_poly = None
    if m >= _FAST_POLY_THRESHOLD and _plain_values(a):
        f0, g0, h0, h_evaluations = calculate_fgh_evaluations(a, b, gf)
        z = list(x) + [f0, g0, h0] + h_evaluations
    else:
        f_poly, g_poly, h_poly = calculate_fgh_polys(a, b, c, gf)
        h_evaluations = evaluate_at_range(h_poly, 1, 2 * m, gf)
        z = (
            list(x)
            + [f_poly.eval(0), g_poly.eval(0), h_poly.eval(0)]
            + h_evaluations
        )

    gamma = rng.randrange(1, gf.order)

    if use_koe:
        S = range(len(z))
        z_commitment_P, z_commitment_pi = koe.restriction_argument_prover(
            S, z, gamma, pp
        )
        z_commitment = {"P": z_commitment_P, "pi": z_commitment_pi}
        proof["z_commitment"] = z_commitment
    else:
        logger_cs.debug("Calculate [Z].")
        z_commitment = pivot.vector_commitment(z, gamma, g, h)
        if hasattr(z_commitment, "normalize"):
            # canonical representative before the raw first-hash (see the
            # same guard in circuit_sat_cb.protocol_8_excl_pivot_prover)
            z_commitment = z_commitment.normalize()
        proof["z_commitment"] = z_commitment

    input_list = [z_commitment, code, "First hash circuit satisfiability protocol"]
    logger_cs_hin.debug("protocol_8 prover (1): input_list=%s", input_list)
    c = pivot.fiat_shamir_hash(input_list, gf.order)
    logger_cs_hout.debug("After hash, hash=\n%s", c)

    if f_poly is not None:  # evaluation-form path skips the redundant check
        y1 = f_poly.eval(c)
        y2 = g_poly.eval(c)
        y3 = h_poly.eval(c)
        assert y3 == y1 * y2

    linform_f, linform_g, linform_h = create_fgh_linear_forms(
        r1cs, c, varnames, flatcode, mul_indices_of_flatcode, n, m, gf
    )

    y1 = pivot.form_eval(linform_f, z, gf)
    y2 = pivot.form_eval(linform_g, z, gf)
    y3 = pivot.form_eval(linform_h, z, gf)
    assert y1 * y2 == y3
    proof["y1"] = y1
    proof["y2"] = y2
    proof["y3"] = y3

    circuits = []
    outputs = []
    for output_var in output_variables:
        circuit = express_as_x_or_gamma(output_var, flatcode, varnames, n)
        y = circuit(z)
        assert (
            y == xc[varnames.index(output_var)]
        ), f"Output of circuit {y} not equal to ~out in witness."
        circuits.append(circuit)
        outputs.append(y)
    proof["outputs"] = outputs

    lin_forms = [circuit - y for circuit, y in zip(circuits, outputs)] + [
        linform_f - y1,
        linform_g - y2,
        linform_h - y3,
    ]

    input_list = [
        y1,
        y2,
        y3,
        z_commitment,
        outputs,
        circuits,
        lin_forms,
        "Second hash circuit satisfiability protocol",
    ]
    logger_cs_hin.debug("protocol_8 prover (2): input_list=%s", input_list)
    rho = pivot.fiat_shamir_hash(input_list, gf.order)
    logger_cs_hout.debug("After hash, hash=\n%s", rho)
    L = nullity.combine_forms_with_powers(lin_forms, rho, gf)
    proof["L"] = L
    return proof, z_commitment, L, z, gamma


def protocol_8_excl_pivot_verifier(proof, code, gf, use_koe=False):
    """Protocol 8 verifier, excluding the pivot call (reference :509-588)."""
    verification = {}
    y1 = proof["y1"]
    y2 = proof["y2"]
    y3 = proof["y3"]
    if not y1 * y2 == y3:
        verification["y1*y2=y3"] = False
        return verification
    verification["y1*y2=y3"] = True

    flatcode, inputs, varnames, r1cs = code_to_flatcode_and_r1cs(code)
    n = len(inputs)

    mul_indices_of_flatcode = mul_in_flatcode(flatcode)
    m = len(mul_indices_of_flatcode)
    output_variables = [s for s in varnames if s.startswith("~out")]

    # The prover hashes proof["z_commitment"] verbatim in both the Pedersen
    # and the KoE case (a dict {"P","pi"} for KoE), so the verifier does the
    # same — the reference's separate use_koe hash branch is unreachable
    # (circuit_sat_r1cs.py:527-541 guards on "P" in proof, which is nested).
    z_commitment = proof["z_commitment"]
    input_list = [z_commitment, code, "First hash circuit satisfiability protocol"]
    logger_cs_hin.debug("protocol_8 verifier (1): input_list=%s", input_list)
    c = pivot.fiat_shamir_hash(input_list, gf.order)
    logger_cs_hout.debug("After hash, hash=\n%s", c)

    linform_f, linform_g, linform_h = create_fgh_linear_forms(
        r1cs, c, varnames, flatcode, mul_indices_of_flatcode, n, m, gf
    )

    outputs = proof["outputs"]
    circuits = [
        express_as_x_or_gamma(output_var, flatcode, varnames, n)
        for output_var in output_variables
    ]

    lin_forms = [circuit - output for circuit, output in zip(circuits, outputs)] + [
        linform_f - y1,
        linform_g - y2,
        linform_h - y3,
    ]

    input_list = [
        y1,
        y2,
        y3,
        z_commitment,
        outputs,
        circuits,
        lin_forms,
        "Second hash circuit satisfiability protocol",
    ]
    logger_cs_hin.debug("protocol_8 verifier (2): input_list=%s", input_list)
    rho = pivot.fiat_shamir_hash(input_list, gf.order)
    logger_cs_hout.debug("After hash, hash=\n%s", rho)
    L = nullity.combine_forms_with_powers(lin_forms, rho, gf)

    if not L == proof["L"]:
        verification["L_wellformed_from_Cfgh_forms"] = False
        return verification, L
    verification["L_wellformed_from_Cfgh_forms"] = True
    return verification, L


def circuit_sat_prover(generators, code, x, gf, pivot_choice=PivotChoice.compressed,
                       transcript="v1"):
    """Protocol 8 prover with pivot dispatch (reference :591-618).

    transcript="ref": v1 structure, reference string-encoding bytes
    (ac20/ref_transcript.py)."""
    if transcript == "ref":
        from . import ref_transcript

        with ref_transcript.active():
            return circuit_sat_prover(
                generators, code, x, gf, pivot_choice, transcript="v1"
            )
    proof, z_commitment, L, z, gamma = protocol_8_excl_pivot_prover(
        generators, code, x, gf
    )

    if pivot_choice == PivotChoice.compressed:
        pivot_proof = compressed_pivot.protocol_5_prover(
            generators, z_commitment, L, pivot.form_eval(L, z, gf), z, gamma,
            gf, transcript=transcript,
        )
    elif pivot_choice == PivotChoice.pivot:
        g = generators["g"]
        h = generators["h"]
        pivot_proof = pivot.prove_linear_form_eval(
            g, h, z_commitment, L, pivot.form_eval(L, z, gf), z, gamma, gf
        )
    elif pivot_choice == PivotChoice.koe:
        L = proof["L"]
        P = proof["z_commitment"]["P"]
        pi = proof["z_commitment"]["pi"]
        pivot_proof, u = koe.opening_linear_form_prover(L, z, gamma, generators, P, pi)
    else:
        raise NotImplementedError
    proof["pivot_proof"] = pivot_proof
    return proof


def circuit_sat_verifier(proof, generators, code, gf, pivot_choice=PivotChoice.compressed,
                         transcript="v1"):
    """Protocol 8 verifier with pivot dispatch (reference :621-654)."""
    if transcript == "ref":
        from . import ref_transcript

        with ref_transcript.active():
            return circuit_sat_verifier(
                proof, generators, code, gf, pivot_choice, transcript="v1"
            )
    verification, L = protocol_8_excl_pivot_verifier(proof, code, gf)

    if pivot_choice == PivotChoice.compressed:
        z_commitment = proof["z_commitment"]
        pivot_proof = proof["pivot_proof"]
        pivot_verification = compressed_pivot.protocol_5_verifier(
            generators, z_commitment, L, 0, pivot_proof, gf,
            transcript=transcript,
        )
    elif pivot_choice == PivotChoice.pivot:
        z_commitment = proof["z_commitment"]
        g = generators["g"]
        h = generators["h"]
        z, phi, c = proof["pivot_proof"]
        pivot_verification = pivot.verify_linear_form_proof(
            g, h, z_commitment, L, 0, z, phi, c
        )
    elif pivot_choice == PivotChoice.koe:
        koe_pivot_proof = proof["pivot_proof"]
        pivot_verification = koe.opening_linear_form_verifier(
            L, generators, koe_pivot_proof, 0
        )
    else:
        raise NotImplementedError
    verification["pivot_verification"] = pivot_verification
    return verification
