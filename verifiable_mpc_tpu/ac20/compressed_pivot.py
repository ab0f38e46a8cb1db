"""AC20 Protocols 4+5: compressed pivot (Bulletproofs-style folding).

Behavior parity with reference
/root/reference/verifiable_mpc/ac20/compressed_pivot.py: Protocol 5 wraps the
pivot and derives challenges c0/c1 (reference :89-145), then Protocol 4 folds
commitment vector and generators over log2(n+1) rounds (reference :29-86).

TPU-first deviations:
* the recursion is an iterative host loop (static depth) whose per-round hot
  ops — two MSMs (A, B) and the generator fold g' = g_L^c * g_R — dispatch to
  the TPU kernels via ``ops.dispatch``;
* randomness is injectable via ``verifiable_mpc_tpu.rng``.
"""

from __future__ import annotations

import logging

from .. import rng
from ..groups import is_elliptic
from ..ops import modvec
from ..ops.dispatch import fold_generators
from . import pivot
from . import ref_transcript

logger_cp = logging.getLogger("compressed_pivot")
logger_cp.setLevel(logging.INFO)

logger_cp_hin = logging.getLogger("compressed_pivot_hash_inputs")
logger_cp_hin.setLevel(logging.INFO)

logger_cp_hout = logging.getLogger("compressed_pivot_hash_outputs")
logger_cp_hout.setLevel(logging.INFO)


def _round_challenge(A, B, g_hat, k, Q, L_tilde, order):
    """Fiat-Shamir challenge for one folding round (reference :47-59)."""
    if is_elliptic(A):
        input_list = [A.normalize(), B.normalize(), g_hat, k, Q.normalize(), L_tilde]
    else:
        input_list = [A, B, g_hat, k, Q, L_tilde]
    logger_cp_hin.debug("protocol_4 round: input_list=\n%s", input_list)
    c = pivot.fiat_shamir_hash(input_list, order)
    logger_cp_hout.debug("After hash, hash=\n%s", c)
    return c


def _round_challenge_v2(A, B, c_prev, order):
    """Chained round challenge of the v2 transcript: binds only the round's
    new messages (A, B) plus the previous challenge.

    Soundness: c_prev transitively binds the whole prior transcript (the
    protocol-5 first hash covers t, A, generators, P, L, y; each round binds
    the one before), and g_hat / Q / L_tilde are deterministic functions of
    that prior transcript — re-hashing them each round (the reference's
    v1 shape) adds bytes but no binding.  NOT parity-compatible with the
    reference; opt-in via transcript="v2" (see docs/TRANSCRIPTS.md)."""
    if is_elliptic(A):
        input_list = [A.normalize(), B.normalize(), c_prev]
    else:
        input_list = [A, B, c_prev]
    input_list.append("Round hash of compressed pivot v2")
    logger_cp_hin.debug("protocol_4 v2 round: input_list=\n%s", input_list)
    c = pivot.fiat_shamir_hash(input_list, order)
    logger_cp_hout.debug("After hash, hash=\n%s", c)
    return c


def _fold_form(L_tilde, c, gf):
    """L' = c*L_left + L_right (reference :70-73)."""
    assert (
        L_tilde.constant == 0
    ), "Next line assumes L_tilde is a linear form, not affine form."
    half = len(L_tilde.coeffs) // 2
    folded = modvec.axpy_mixed(c, L_tilde.coeffs[:half], L_tilde.coeffs[half:], gf)
    if folded is not None:
        return pivot.LinearForm(folded)
    c_l = [coeff * gf(c) for coeff in L_tilde.coeffs[:half]]
    return pivot.LinearForm(c_l) + pivot.LinearForm(L_tilde.coeffs[half:])


def _eval_masked(L_tilde, vals, side, half, gf):
    """L_tilde([0]*half + vals) / L_tilde(vals + [0]*half) without
    materializing the zero-padded vector (reference :41-45)."""
    coeffs = L_tilde.coeffs[half:] if side == "r" else L_tilde.coeffs[:half]
    y = modvec.dot(coeffs, vals, gf)
    if y is not None:
        return y
    if side == "r":
        return L_tilde([0] * half + list(vals))
    return L_tilde(list(vals) + [0] * half)


def protocol_4_prover(g_hat, k, Q, L_tilde, z_hat, gf, proof=None, round_i=0,
                      transcript="v1", c_prev=0):
    """Prover of Protocol 4, iterative (reference :29-86).

    transcript="v2" switches to the chained round challenges of
    :func:`_round_challenge_v2` (skips re-hashing g_hat/Q/L_tilde); c_prev
    seeds the chain (protocol 5 passes c1)."""
    proof = {} if proof is None else proof
    from . import pivot_native, pivot_tpu

    if pivot_tpu.ENABLED:
        res = pivot_tpu.try_protocol_4_prover(
            g_hat, k, Q, L_tilde, z_hat, gf, proof, round_i,
            transcript=transcript, c_prev=c_prev,
        )
        if res is not None:
            return res
    res = pivot_native.try_protocol_4_prover(
        g_hat, k, Q, L_tilde, z_hat, gf, proof, round_i,
        transcript=transcript, c_prev=c_prev,
    )
    if res is not None:
        return res
    order = k.order
    while True:
        half = len(g_hat) // 2
        g_hat_l, g_hat_r = g_hat[:half], g_hat[half:]
        z_hat_l, z_hat_r = z_hat[:half], z_hat[half:]
        logger_cp.debug("Calculate A_i, B_i.")
        A = pivot.vector_commitment(
            z_hat_l, int(_eval_masked(L_tilde, z_hat_l, "r", half, gf)), g_hat_r, k
        )
        B = pivot.vector_commitment(
            z_hat_r, int(_eval_masked(L_tilde, z_hat_r, "l", half, gf)), g_hat_l, k
        )
        proof["A" + str(round_i)] = A
        proof["B" + str(round_i)] = B

        if transcript == "v2":
            c = c_prev = _round_challenge_v2(A, B, c_prev, order)
        else:
            c = _round_challenge(A, B, g_hat, k, Q, L_tilde, order)

        logger_cp.debug("Calculate g_prime, Q_prime.")
        g_hat = fold_generators(g_hat_l, g_hat_r, c)
        Q = A * (Q ** c) * (B ** (c ** 2))
        L_tilde = _fold_form(L_tilde, c, gf)
        z_hat = modvec.axpy(c, z_hat_r, z_hat_l, gf)
        if z_hat is None:
            z_hat = [z_hat_l[i] + c * z_hat_r[i] for i in range(half)]

        if len(z_hat) <= 2:
            proof["z_prime"] = z_hat
            return proof
        round_i += 1


def protocol_4_verifier_v2(g_hat, k, Q, L_tilde, gf, proof, c_prev):
    """v2-transcript verifier: since the round challenges depend only on
    (A_i, B_i, previous challenge), ALL challenges are computable up front
    with no group work — the log2(n) generator folds of the v1 verifier
    (its dominant cost) collapse into ONE exponent-product MSM over the
    initial generators (Bulletproofs-style final-generator evaluation)."""
    from ..ops.dispatch import multiexp

    order = k.order
    n1 = len(g_hat)
    rounds = max(n1.bit_length() - 2, 0)  # fold until length 2

    cs = []
    for r in range(rounds):
        A, B = proof["A" + str(r)], proof["B" + str(r)]
        c_prev = _round_challenge_v2(A, B, c_prev, order)
        cs.append(c_prev)
        Q = A * (Q ** c_prev) * (B ** (c_prev ** 2))
        L_tilde = _fold_form(L_tilde, c_prev, gf)

    # exponent of original generator j in the final vector:
    # prod over rounds r of (c_r if bit_{K-1-r}(j) == 0 else 1); the final
    # slot is j's LSB.  Built by doubling with challenges in REVERSE round
    # order so round r's bit lands at significance K-2-r of the index j>>1
    # (round 0 splits on j's MSB).
    E = [1]
    for c in reversed(cs):
        E = [(c * e) % order for e in E] + E
    g_fin = [multiexp(g_hat[0::2], E), multiexp(g_hat[1::2], E)]
    z_prime = proof["z_prime"]
    Q_check = pivot.vector_commitment(z_prime, int(L_tilde(z_prime)), g_fin, k)
    logger_cp.debug("Q_check= %s", Q_check)
    logger_cp.debug("Q_prime= %s", Q)
    return Q_check == Q


def protocol_4_verifier(g_hat, k, Q, L_tilde, gf, proof, round_i=0,
                        transcript="v1", c_prev=0):
    """Verifier of Protocol 4, iterative (reference :148-202)."""
    from . import pivot_native, pivot_tpu

    if transcript == "v2":
        return protocol_4_verifier_v2(g_hat, k, Q, L_tilde, gf, proof, c_prev)
    if pivot_tpu.ENABLED:
        res = pivot_tpu.try_protocol_4_verifier(
            g_hat, k, Q, L_tilde, gf, proof, round_i
        )
        if res is not None:
            return res
    res = pivot_native.try_protocol_4_verifier(
        g_hat, k, Q, L_tilde, gf, proof, round_i
    )
    if res is not None:
        return res
    order = k.order
    while True:
        half = len(g_hat) // 2
        g_hat_l, g_hat_r = g_hat[:half], g_hat[half:]
        A = proof["A" + str(round_i)]
        B = proof["B" + str(round_i)]

        c = _round_challenge(A, B, g_hat, k, Q, L_tilde, order)

        g_hat = fold_generators(g_hat_l, g_hat_r, c)
        Q = A * (Q ** c) * (B ** (c ** 2))
        L_tilde = _fold_form(L_tilde, c, gf)

        if len(g_hat) <= 2:
            z_prime = proof["z_prime"]
            Q_check = pivot.vector_commitment(
                z_prime, int(L_tilde(z_prime)), g_hat, k
            )
            logger_cp.debug("Q_check= %s", Q_check)
            logger_cp.debug("Q_prime= %s", Q)
            return Q_check == Q
        round_i += 1


def _scaled_l_tilde(L, c1, gf):
    """L_tilde = LinearForm(L.coeffs + [0]) * c1 (reference :133-134,
    :223-224), with the scaling routed through the native vector kernel
    when the coefficients are field elements."""
    scaled = modvec.scale(c1, list(L.coeffs) + [0], gf, zero_ints_ok=True)
    if scaled is not None:
        return pivot.LinearForm(scaled)
    return pivot.LinearForm(list(L.coeffs) + [0]) * c1


def _first_hash(t, A, generators, P, L, y, order):
    """c0, c1 of Protocol 5 (reference :115-131)."""
    if is_elliptic(A):
        input_list = [t, A.normalize(), generators, P.normalize(), L, y]
    else:
        input_list = [t, A, generators, P, L, y]
    logger_cp_hin.debug("protocol_5: input_list=\n%s", input_list)
    c0, c1 = pivot.fiat_shamir_hash_suffixed(
        input_list,
        [
            [0, "First hash of compressed pivot"],
            [1, "First hash of compressed pivot"],
        ],
        order,
    )
    logger_cp_hout.debug("After hash, hash=\n%s, %s", c0, c1)
    return c0, c1


def protocol_5_prover(generators, P, L, y, x, gamma, gf, transcript="v1"):
    """Prover of Protocol 5 (reference :89-145).

    transcript="ref": v1 structure, reference string-encoding bytes
    (ac20/ref_transcript.py)."""
    if transcript == "ref":
        with ref_transcript.active():
            return protocol_5_prover(
                generators, P, L, y, x, gamma, gf, transcript="v1"
            )
    g, h, k = generators["g"], generators["h"], generators["k"]

    proof = {}
    n = len(x)
    L, y = pivot.affine_to_linear(L, y, n)
    assert (
        bin(n + 1).count("1") == 1
    ), "This implementation requires n+1 to be power of 2 (else, use padding with zeros)."

    order = gf.order
    r = rng.randvector(n, order)
    rho = rng.randrange(order)
    logger_cp.debug("Calculate t, A.")
    t = pivot.form_eval(L, r, gf)
    A = pivot.vector_commitment(r, rho, g, h)
    proof["t"] = t
    proof["A"] = A

    c0, c1 = _first_hash(t, A, generators, P, L, y, order)

    z = modvec.axpy(c0, x, r, gf)
    if z is None:
        z = [c0 * x_i + r[i] for i, x_i in enumerate(x)]
    phi = gf(c0 * gamma + rho)
    z_hat = z + [phi]
    g_hat = g + [h]
    logger_cp.debug("Calculate Q.")
    Q = A * (P ** c0) * (k ** int(c1 * (c0 * y + t)))
    L_tilde = _scaled_l_tilde(L, c1, gf)
    lz = pivot.form_eval(L, z, gf)
    ltz = pivot.form_eval(L_tilde, z_hat, gf)
    assert lz * c1 == ltz

    return protocol_4_prover(
        g_hat, k, Q, L_tilde, z_hat, gf, proof,
        transcript=transcript, c_prev=c1,
    )


def protocol_5_verifier(generators, P, L, y, proof, gf, transcript="v1"):
    """Verifier of Protocol 5 (reference :205-239)."""
    if transcript == "ref":
        with ref_transcript.active():
            return protocol_5_verifier(
                generators, P, L, y, proof, gf, transcript="v1"
            )
    g, h, k = generators["g"], generators["h"], generators["k"]

    order = gf.order
    n = len(g)
    L, y = pivot.affine_to_linear(L, y, n)
    t = proof["t"]
    A = proof["A"]

    c0, c1 = _first_hash(t, A, generators, P, L, y, order)

    g_hat = g + [h]
    logger_cp.debug("Calculate Q.")
    Q = A * (P ** c0) * (k ** int(c1 * (c0 * y + t)))
    L_tilde = _scaled_l_tilde(L, c1, gf)

    return protocol_4_verifier(
        g_hat, k, Q, L_tilde, gf, proof, transcript=transcript, c_prev=c1
    )
