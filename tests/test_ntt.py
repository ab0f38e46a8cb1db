"""NTT polynomial-multiplication tests: device and host paths vs schoolbook
(SURVEY.md §7 oracle for layer 4)."""

import random

import pytest

from verifiable_mpc_tpu.groups.bn256 import ORDER as BN_ORDER
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.ops import ntt

rng = random.Random(4242)


def schoolbook(a, b, p):
    o = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            o[i + j] = (o[i + j] + ai * bj) % p
    return o


def test_ntt_prime_properties():
    P = ntt.ntt_prime()
    assert P.bit_length() >= 528
    assert (P - 1) % (1 << ntt.TWO_ADICITY) == 0
    w = ntt._primitive_root_of_unity(P, 1 << 10)
    assert pow(w, 1 << 10, P) == 1 and pow(w, 1 << 9, P) != 1


def test_host_poly_mul_matches_schoolbook():
    p = BN_ORDER
    a = [rng.randrange(p) for _ in range(13)]
    b = [rng.randrange(p) for _ in range(20)]
    got = ntt.poly_mul_mod(a, b, p, use_device=False)
    assert got == schoolbook(a, b, p)


def test_device_poly_mul_matches_schoolbook():
    p = BN_ORDER
    a = [rng.randrange(p) for _ in range(9)]
    b = [rng.randrange(p) for _ in range(8)]
    got = ntt.poly_mul_mod(a, b, p, use_device=True)
    assert got == schoolbook(a, b, p)


def test_native_crt_ntt_matches_schoolbook():
    from verifiable_mpc_tpu import native

    if not native.available():
        pytest.skip("no native toolchain")
    p = BN_ORDER
    for na, nb in [(1, 1), (7, 9), (64, 64), (100, 211)]:
        a = [rng.randrange(p) for _ in range(na)]
        b = [rng.randrange(p) for _ in range(nb)]
        got = native.ntt_poly_mul_ints(a, b)
        exp = [0] * (na + nb - 1)
        for i, x in enumerate(a):
            for j, y in enumerate(b):
                exp[i + j] += x * y
        assert got == exp
    # bound enforcement: 556-bit coefficient products must be rejected
    big = 1 << 280
    with pytest.raises(AssertionError):
        native.ntt_poly_mul_ints([big, big], [big, big])


def test_poly_mul_ints_native_dispatch():
    """poly_mul_ints routes sizes >= NATIVE_NTT_THRESHOLD to the native
    backend and stays exact."""
    from verifiable_mpc_tpu import native

    if not native.available():
        pytest.skip("no native toolchain")
    p = BN_ORDER
    n = ntt.NATIVE_NTT_THRESHOLD
    a = [rng.randrange(p) for _ in range(n)]
    b = [rng.randrange(p) for _ in range(n)]
    got = ntt.poly_mul_ints(a, b)
    exp = [0] * (2 * n - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            exp[i + j] += x * y
    assert got == exp


def test_backend_integration():
    from verifiable_mpc_tpu.tools import poly as qc

    gf = GF(BN_ORDER)
    saved = list(qc._NTT_MUL_BACKEND)
    try:
        ntt.register(min_len=4)
        a = [gf(rng.randrange(BN_ORDER)) for _ in range(10)]
        b = [gf(rng.randrange(BN_ORDER)) for _ in range(10)]
        got = qc.multiply_polys(a, b)
        expect = [gf(c) for c in schoolbook([x.value for x in a], [x.value for x in b], BN_ORDER)]
        assert got == expect
        # secure-share-like objects fall back to the generic path
        class Fake:
            is_secure_object = True
        assert ntt._poly_backend([Fake()], [Fake()]) is None
    finally:
        qc._NTT_MUL_BACKEND[0] = saved[0]
        qc._NTT_MUL_BACKEND[1] = saved[1]
