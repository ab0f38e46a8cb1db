"""Resident-state engine for the Protocol-4 compression loop (Ed25519).

The generic loop in :mod:`compressed_pivot` converts between Python objects
and native limb arrays at every round boundary: points in/out of the fold
backend, scalars in/out of the modvec kernels, and a full re-serialization
of the generator vector and form coefficients for each Fiat-Shamir
challenge.  At 2^14+ gates those conversions dominate the prover.

This engine keeps the whole recursion state — generator vector, z-vector,
form coefficients — as u64 limb arrays for all log2(n+1) rounds
(reference compressed_pivot.py:29-86/:148-202): C++ does the dots, MSMs,
folds, batch normalization and even the transcript byte emission
(native/ed25519.cc, native/modvec.cc), and Python composes the O(1)
remainder of each round.  Byte-identical to the generic loop by
construction: same hash-input structure, same signed-int / point
encodings (pinned by tests/test_pivot_native.py and the golden-transcript
tests), and the same C++ MSM the dispatch backend uses, so the proof
objects carry identical coordinates.

Falls back (returns None) whenever the inputs are not plain Ed25519/gf
data — secure shares, other curves, small vectors, or an active
hash-input debug logger (the generic path logs complete input lists)."""

from __future__ import annotations

import hashlib
import logging
import struct

import numpy as np

from .. import native, serialization
from ..fields import FiniteFieldElement
from ..groups.edwards import ELL, EdwardsPoint
from . import pivot

_MIN_N = 64
_PACK_I = struct.Struct(">I").pack

logger_cp_hin = logging.getLogger("compressed_pivot_hash_inputs")
logger_cp_hout = logging.getLogger("compressed_pivot_hash_outputs")


def _scalars_or_none(vals, gf, zero_ints_ok=False):
    out = []
    for v in vals:
        if isinstance(v, FiniteFieldElement) and type(v).modulus == gf.modulus:
            out.append(v.value)
        elif zero_ints_ok and isinstance(v, int) and v == 0:
            out.append(0)
        else:
            return None
    return native._ints_to_u64x4(out, gf.modulus)


def _form_coeffs_reduced(coeffs, gf):
    """(limbs, exact): reduced limb array for the fold/dot math, plus
    whether the limb encoding also reproduces the hash bytes of the
    original coefficients.  The combined nullity form legitimately carries
    huge unreduced int coefficients (the reference's int arithmetic,
    circuit_sat_r1cs.py:489-505); their reduced value is correct for every
    computation, but the round-0 transcript hashes the raw ints, so when
    any nonzero int appears the caller must hash the original object."""
    out = []
    exact = True
    for v in coeffs:
        if isinstance(v, FiniteFieldElement):
            if type(v).modulus != gf.modulus:
                return None, False
            out.append(v.value)
        elif isinstance(v, int):
            out.append(v if 0 <= v < gf.modulus else v % gf.modulus)
            if not 0 <= v <= gf.modulus // 2:
                exact = False  # raw int hash bytes differ from signed repr
        else:
            return None, False
    return native._ints_to_u64x4(out, gf.modulus), exact


def _engine_ok(g_hat, k, gf):
    from . import ref_transcript

    if ref_transcript.ACTIVE:
        # the resident engine emits the default BINARY transcript bytes in
        # C; the reference-parity string encoding runs the generic loop
        return False
    if gf.modulus != ELL or not native.REGISTERED:
        return False
    n = len(g_hat)
    if n < _MIN_N or n & (n - 1):
        return False
    if type(k) is not EdwardsPoint or type(g_hat[0]) is not EdwardsPoint:
        return False
    if logger_cp_hin.isEnabledFor(logging.DEBUG) or logger_cp_hout.isEnabledFor(
        logging.DEBUG
    ):
        return False  # keep the transcript debug tooling on the generic path
    return True


def _round_challenge_resident(A, B, g_arr, k, Q, l_arr, order, l_obj=None):
    """Byte-identical to compressed_pivot._round_challenge: SHA-256 over the
    canonical encoding of [A.normalize(), B.normalize(), g_hat, k,
    Q.normalize(), L_tilde].  ``l_obj`` (a form whose raw coefficients are
    not reproducible from the reduced limbs — round 0 of the circuit-sat
    flow) is hashed via the generic encoder instead of the limb array."""
    h = hashlib.sha256()
    sink = serialization._HashSink(h)
    sink.write(bytes([serialization.T_LIST]) + _PACK_I(6))
    serialization._hash_obj(sink, A.normalize())
    serialization._hash_obj(sink, B.normalize())
    sink.write(bytes([serialization.T_LIST]) + _PACK_I(len(g_arr)))
    sink.write(native.ed_hash_encode_arr(g_arr))
    serialization._hash_obj(sink, k)
    serialization._hash_obj(sink, Q.normalize())
    if l_obj is not None:
        serialization._hash_obj(sink, l_obj)
    else:
        # L_tilde: T_FORM + coeffs list (signed ints) + constant 0
        sink.write(bytes([serialization.T_FORM]))
        sink.write(bytes([serialization.T_LIST]) + _PACK_I(len(l_arr)))
        sink.write(native.mod_hash_encode_signed_arr(l_arr, ELL))
        sink.write(b"\x01" + _PACK_I(1) + b"\x00")
    sink.flush()
    return int.from_bytes(h.digest(), "little") % order


def _pt(row16) -> EdwardsPoint:
    return native._u64_to_pts(row16.reshape(1, 16))[0]


_HALF_ELL = ELL // 2


def _signed(v: int) -> int:
    return v - ELL if v > _HALF_ELL else v


def _commit(g_half, z_half, y_can, k_arr, k_pt) -> EdwardsPoint:
    """vector_commitment(z_half, y, g_half, k) with dispatch's exact
    semantics: the C++ MSM above the registered min-batch, the Python
    tree-reduction (signed exponents, per pivot._int) below it — so the
    proof points carry coordinates identical to the generic loop's."""
    from ..ops import dispatch

    nb = len(g_half) + 1
    backend = dispatch._MSM_BACKENDS.get(EdwardsPoint)
    if backend is not None and nb >= backend[1]:
        pts = np.concatenate([g_half, k_arr], axis=0)
        sc = np.concatenate(
            [z_half, native._ints_to_u64x4([y_can], ELL)], axis=0
        )
        return _pt(native.ed_msm_arr(pts, sc))
    bases = native._u64_to_pts(np.ascontiguousarray(g_half)) + [k_pt]
    exps = [_signed(v) for v in native._u64x4_to_ints(z_half)] + [
        _signed(y_can % ELL)
    ]
    return dispatch._host_multiexp(bases, exps)


def try_protocol_4_prover(g_hat, k, Q, L_tilde, z_hat, gf, proof, round_i,
                          transcript="v1", c_prev=0):
    """Resident prover loop; None if the inputs don't qualify."""
    if not _engine_ok(g_hat, k, gf):
        return None
    if len(z_hat) != len(g_hat) or len(L_tilde.coeffs) != len(g_hat):
        return None
    z_arr = _scalars_or_none(z_hat, gf)
    if z_arr is None:
        return None
    l_arr, l_exact = _form_coeffs_reduced(L_tilde.coeffs, gf)
    if l_arr is None:
        return None
    l_obj = None if l_exact else L_tilde
    g_arr = native._pts_to_u64(g_hat)
    k_arr = native._pts_to_u64([k])
    order = k.order

    while True:
        n = len(g_arr)
        half = n // 2
        y_a = native.mod_dot_arr(l_arr[half:], z_arr[:half], ELL)
        y_b = native.mod_dot_arr(l_arr[:half], z_arr[half:], ELL)
        A = _commit(g_arr[half:], z_arr[:half], y_a, k_arr, k)
        B = _commit(g_arr[:half], z_arr[half:], y_b, k_arr, k)
        proof["A" + str(round_i)] = A
        proof["B" + str(round_i)] = B

        if transcript == "v2":
            from .compressed_pivot import _round_challenge_v2

            c = c_prev = _round_challenge_v2(A, B, c_prev, order)
        else:
            c = _round_challenge_resident(
                A, B, g_arr, k, Q, l_arr, order, l_obj
            )
        l_obj = None  # folded coefficients are reduced gf from round 1 on

        c4 = native._ints_to_u64x4([c], ELL)
        g_arr = native.ed_fold_arr(g_arr[:half], g_arr[half:], c4)
        native.ed_batch_normalize_arr(g_arr)
        Q = A * (Q ** c) * (B ** (c ** 2))
        l_arr = native.mod_axpy_arr(c, l_arr[:half], l_arr[half:], ELL)
        z_arr = native.mod_axpy_arr(c, z_arr[half:], z_arr[:half], ELL)

        if half <= 2:
            proof["z_prime"] = [
                gf(v) for v in native._u64x4_to_ints(z_arr)
            ]
            return proof
        round_i += 1


def try_protocol_4_verifier(g_hat, k, Q, L_tilde, gf, proof, round_i):
    """Resident verifier loop; None if the inputs don't qualify."""
    if not _engine_ok(g_hat, k, gf):
        return None
    if len(L_tilde.coeffs) != len(g_hat):
        return None
    l_arr, l_exact = _form_coeffs_reduced(L_tilde.coeffs, gf)
    if l_arr is None:
        return None
    l_obj = None if l_exact else L_tilde
    g_arr = native._pts_to_u64(g_hat)
    order = k.order

    while True:
        n = len(g_arr)
        half = n // 2
        A = proof["A" + str(round_i)]
        B = proof["B" + str(round_i)]
        if type(A) is not EdwardsPoint or type(B) is not EdwardsPoint:
            return None

        c = _round_challenge_resident(A, B, g_arr, k, Q, l_arr, order, l_obj)
        l_obj = None  # folded coefficients are reduced gf from round 1 on

        c4 = native._ints_to_u64x4([c], ELL)
        g_arr = native.ed_fold_arr(g_arr[:half], g_arr[half:], c4)
        native.ed_batch_normalize_arr(g_arr)
        Q = A * (Q ** c) * (B ** (c ** 2))
        l_arr = native.mod_axpy_arr(c, l_arr[:half], l_arr[half:], ELL)

        if half <= 2:
            # base case exactly as the generic verifier: tiny commitment
            # over Python objects (compressed_pivot.py:119-126)
            g_small = native._u64_to_pts(g_arr)
            L_small = pivot.LinearForm(
                [gf(v) for v in native._u64x4_to_ints(l_arr)]
            )
            z_prime = proof["z_prime"]
            Q_check = pivot.vector_commitment(
                z_prime, int(L_small(z_prime)), g_small, k
            )
            return Q_check == Q
        round_i += 1
