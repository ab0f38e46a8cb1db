"""Oracle tests for the resident-engine primitives: C++ batch normalization
and hash-encoding must match the Python group ops / serialization bytes."""

import hashlib
import random

import numpy as np
import pytest

from verifiable_mpc_tpu import native, serialization
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native tier unavailable"
)


def _rand_points(n, seed=7):
    r = random.Random(seed)
    g = EdwardsPoint.generator
    return [g ** r.randrange(1, ELL) * (g ** r.randrange(1, ELL)) for _ in range(n)]


def test_batch_normalize_matches_python():
    pts = _rand_points(9)
    arr = native._pts_to_u64(pts)
    native.ed_batch_normalize_arr(arr)
    got = native._u64_to_pts(arr)
    want = EdwardsPoint.batch_normalize(pts)
    for a, b in zip(got, want):
        assert (a.x, a.y, a.z, a.t) == (b.x, b.y, b.z, b.t)
        assert a.z == 1


def test_ed_hash_encode_byte_identity():
    pts = EdwardsPoint.batch_normalize(_rand_points(6)) + [
        EdwardsPoint.identity
    ]
    arr = native._pts_to_u64(pts)
    got = native.ed_hash_encode_arr(arr)
    h = hashlib.sha256()
    sink = serialization._HashSink(h)
    assert serialization._hash_list_fast(sink, pts)
    sink.flush()
    want = hashlib.sha256()
    want.update(got)
    assert want.digest() == h.digest()


def test_field_hash_encode_byte_identity():
    gf = GF(ELL)
    r = random.Random(11)
    vals = [gf(r.randrange(ELL)) for _ in range(40)] + [
        gf(0), gf(1), gf(ELL - 1), gf(ELL // 2), gf(ELL // 2 + 1)
    ]
    arr = native._ints_to_u64x4([v.value for v in vals], ELL)
    got = native.mod_hash_encode_signed_arr(arr, ELL)
    h = hashlib.sha256()
    sink = serialization._HashSink(h)
    assert serialization._hash_list_fast(sink, vals)
    sink.flush()
    assert hashlib.sha256(got).digest() == h.digest()


def test_arr_primitives_match_list_level():
    r = random.Random(3)
    n = 65
    p = ELL
    a = [r.randrange(p) for _ in range(n)]
    b = [r.randrange(p) for _ in range(n)]
    aa = native._ints_to_u64x4(a, p)
    bb = native._ints_to_u64x4(b, p)
    assert native.mod_dot_arr(aa, bb, p) == sum(
        x * y for x, y in zip(a, b)
    ) % p
    c = r.randrange(p)
    out = native.mod_axpy_arr(c, aa, bb, p)
    assert native._u64x4_to_ints(out) == [
        (c * x + y) % p for x, y in zip(a, b)
    ]
    # fold + msm array forms against the list-level wrappers
    pts = _rand_points(8, seed=5)
    arr = native._pts_to_u64(pts)
    sc = native._ints_to_u64x4(a[:8], p)
    got = native.ed_msm_arr(arr, sc)
    want = native.ed_msm(pts, a[:8])
    assert native._u64_to_pts(got[None])[0] == want
    c4 = native._ints_to_u64x4([c], p)
    folded = native.ed_fold_arr(arr[:4], arr[4:], c4)
    wantf = native.ed_fold(pts[:4], pts[4:], c)
    for x, y in zip(native._u64_to_pts(folded), wantf):
        assert x == y
