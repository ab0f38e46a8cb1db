"""Native C++ host-tier tests vs the pure-Python group arithmetic."""

import random

import pytest

from verifiable_mpc_tpu import native
from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint

rng = random.Random(9)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

G = EdwardsPoint.generator


def rand_points(n):
    return [G ** rng.randrange(1, ELL) for _ in range(n)]


def test_native_add_scalar_mul():
    import numpy as np

    lib = native.load()
    a, b = rand_points(2)
    pa = native._pts_to_u64([a])
    pb = native._pts_to_u64([b])
    out = np.zeros(16, dtype=np.uint64)
    lib.vmpc_ed_add(native._u64p(pa), native._u64p(pb), native._u64p(out))
    assert native._u64_to_pts(out[None])[0] == a * b

    s = rng.randrange(ELL)
    sc = native._scalars_to_u64([s], ELL)
    lib.vmpc_ed_scalar_mul(native._u64p(pa), native._u64p(sc), native._u64p(out))
    assert native._u64_to_pts(out[None])[0] == a ** s


@pytest.mark.parametrize("n", [1, 3, 33, 200])
def test_native_msm(n):
    pts = rand_points(n)
    scalars = [rng.randrange(ELL) for _ in range(n)]
    if n > 2:
        scalars[1] = 0
    got = native.ed_msm(pts, scalars)
    expect = EdwardsPoint.identity
    for p, s in zip(pts, scalars):
        expect = expect * (p ** s)
    assert got == expect


def test_native_batch_exp_and_fold():
    exps = [0, 1, ELL - 1] + [rng.randrange(ELL) for _ in range(5)]
    got = native.ed_batch_exp(G, exps)
    assert got == [G ** e for e in exps]

    n = 6
    g_l = rand_points(n)
    g_r = rand_points(n)
    c = rng.randrange(ELL)
    got = native.ed_fold(g_l, g_r, c)
    assert got == [(g_l[i] ** c) * g_r[i] for i in range(n)]


def test_native_registered_speedup():
    """The native MSM must agree with dispatch's host fallback."""
    from verifiable_mpc_tpu.ops import dispatch

    saved = dict(dispatch._MSM_BACKENDS)
    try:
        assert native.register(min_batch=4)
        pts = rand_points(64)
        scalars = [rng.randrange(ELL) for _ in range(64)]
        fast = dispatch.multiexp(pts, scalars)
        slow = dispatch._host_multiexp(pts, scalars)
        assert fast == slow
    finally:
        dispatch._MSM_BACKENDS.clear()
        dispatch._MSM_BACKENDS.update(saved)


class TestNativeBN:
    def test_bn_msm_and_batch_exp(self):
        from verifiable_mpc_tpu.groups.bn256 import BNPoint, ORDER

        g = BNPoint.generator
        n = 20
        pts = [g ** rng.randrange(1, ORDER) for _ in range(n)]
        scalars = [rng.randrange(ORDER) for _ in range(n)]
        scalars[0] = 0
        got = native.bn_msm(pts, scalars)
        expect = BNPoint.identity
        for p, s in zip(pts, scalars):
            expect = expect * (p ** s)
        assert got == expect

        exps = [0, 1, ORDER - 1, rng.randrange(ORDER)]
        assert native.bn_batch_exp(g, exps) == [g ** e for e in exps]

    def test_bn2_msm_and_batch_exp(self):
        from verifiable_mpc_tpu.groups.bn256 import BNTwistPoint, ORDER

        g2 = BNTwistPoint.generator
        n = 8
        pts = [g2 ** rng.randrange(1, ORDER) for _ in range(n)]
        scalars = [rng.randrange(ORDER) for _ in range(n)]
        got = native.bn2_msm(pts, scalars)
        expect = BNTwistPoint.identity
        for p, s in zip(pts, scalars):
            expect = expect * (p ** s)
        assert got == expect

        exps = [1, 7, rng.randrange(ORDER)]
        assert native.bn2_batch_exp(g2, exps) == [g2 ** e for e in exps]


def test_native_msm_duplicate_and_inverse_points():
    """The batch-normalized mixed-add tier's equal-point (double) and
    inverse-point (identity) branches, exercised through bucket collisions."""
    import random

    from verifiable_mpc_tpu import native
    from verifiable_mpc_tpu.groups.bn256 import ORDER, BNPoint
    from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint
    from verifiable_mpc_tpu.ops import dispatch

    rng = random.Random(12)
    g = BNPoint.generator
    p = g * 12345
    pts = [p] * 100 + [g * rng.randrange(1, ORDER) for _ in range(60)]
    sc = [7] * 100 + [rng.randrange(ORDER) for _ in range(60)]
    exp = BNPoint.identity
    for q, s in zip(pts, sc):
        exp = exp + q * s
    assert native.bn_msm(pts, sc) == exp
    # p and -p with equal scalars cancel inside one bucket
    np_ = BNPoint(p.x, -p.y, p.z, check=False)
    assert native.bn_msm([p, np_, g], [5, 5, 1]) == g

    ge = EdwardsPoint.generator
    pe = ge ** 999
    ptse = [pe] * 50 + [ge ** rng.randrange(1, ELL) for _ in range(30)]
    sce = [9] * 50 + [rng.randrange(ELL) for _ in range(30)]
    assert native.ed_msm(ptse, sce) == dispatch._host_multiexp(ptse, sce)

    es = [42] * 20 + [ORDER - 1] * 4
    be = native.bn_batch_exp(g, es)
    assert all(be[i] == g * e for i, e in enumerate(es))


def test_recode_signed4_matches_numpy():
    """C batch recode (native/ed25519.cc vmpc_recode_signed4) is
    byte-identical to the numpy oracle the kernels were validated
    against (ops/msm_pallas._digits_signed_from_u64x4_np)."""
    import numpy as np

    from verifiable_mpc_tpu.ops.msm_pallas import _digits_signed_from_u64x4_np

    rng = random.Random(77)
    half = ELL // 2
    vals = (
        [rng.randrange(ELL) for _ in range(700)]
        + [0, 1, 7, 8, 9, half - 1, half, half + 1, ELL - 1, ELL - 8]
    )
    arr = native._ints_to_u64x4(vals, ELL)
    d_np = _digits_signed_from_u64x4_np(arr, ELL)
    d_c = native.recode_signed4_arr(arr, ELL)
    assert d_c.dtype == np.int8 and d_c.shape == d_np.shape
    assert (d_np == d_c).all()
    # BN254 order too (the recode is order-generic)
    from verifiable_mpc_tpu.groups.bn256 import ORDER

    vals = [rng.randrange(ORDER) for _ in range(300)] + [0, ORDER - 1]
    arr = native._ints_to_u64x4(vals, ORDER)
    assert (
        _digits_signed_from_u64x4_np(arr, ORDER)
        == native.recode_signed4_arr(arr, ORDER)
    ).all()


def test_ed_rows_fill_t():
    """C extended-row completion: z = 1, t = x*y mod p from canonical x, y
    (the TPU engine's two-coordinate download reconstruction)."""
    import numpy as np

    from verifiable_mpc_tpu.groups.edwards import P as ED_P

    rng = random.Random(78)
    xs = [rng.randrange(ED_P) for _ in range(64)] + [0, 1, ED_P - 1]
    ys = [rng.randrange(ED_P) for _ in range(64)] + [ED_P - 1, 0, 1]
    rows = np.zeros((len(xs), 16), np.uint64)
    rows[:, 0:4] = native._ints_to_u64x4(xs, ED_P)
    rows[:, 4:8] = native._ints_to_u64x4(ys, ED_P)
    native.ed_rows_fill_t_arr(rows)
    zs = native._u64x4_to_ints(np.ascontiguousarray(rows[:, 8:12]))
    ts = native._u64x4_to_ints(np.ascontiguousarray(rows[:, 12:16]))
    for x, y, z, t in zip(xs, ys, zs, ts):
        assert z == 1 and t == x * y % ED_P


def test_ed_encode_cached_identity_keyed():
    """ops/msm_pallas.ed_encode_cached: same point list (by element ids)
    hits the cache; the host rows equal the direct conversion."""
    import numpy as np

    from verifiable_mpc_tpu.ops import msm_pallas as mp

    rng = random.Random(79)
    g = EdwardsPoint.generator
    pts = [g ** rng.randrange(1, ELL) for _ in range(16)]
    rows1, dev1 = mp.ed_encode_cached(pts)
    assert np.array_equal(rows1, native._pts_to_u64(pts))
    # a NEW list object holding the same elements is the same key
    rows2, dev2 = mp.ed_encode_cached(list(pts))
    assert rows2 is rows1 and dev2[0] is dev1[0]
    # different elements -> different entry
    other = [g ** rng.randrange(1, ELL) for _ in range(16)]
    rows3, _ = mp.ed_encode_cached(other)
    assert rows3 is not rows1


def test_recode_signed4_packed_matches_pack():
    """One-pass C recode+pack == _pack_digits(numpy recode), including the
    windows_needed trim decision."""
    import numpy as np

    from verifiable_mpc_tpu.ops.msm_pallas import (
        NWINDOWS,
        _digits_signed_from_u64x4_np,
        _pack_digits,
    )

    rng = random.Random(80)
    for vals in (
        [rng.randrange(ELL) for _ in range(600)] + [0, 1, ELL - 1],
        [rng.randrange(1 << 30) for _ in range(300)],  # short: nw trim
        [0] * 64,
    ):
        arr = native._ints_to_u64x4(vals, ELL)
        pk, wn = native.recode_signed4_packed_arr(arr, ELL)
        d_np = _digits_signed_from_u64x4_np(arr, ELL)
        assert np.array_equal(pk, _pack_digits(d_np))
        nonzero = np.flatnonzero(d_np.any(axis=1))
        expect_wn = NWINDOWS - nonzero[0] if nonzero.size else 1
        assert wn == expect_wn, (wn, expect_wn)


def test_qr_native_backends_match_python():
    """QR 1024-bit Montgomery tier (native/qr.cc): multiexp / batch-exp /
    fold value-identical to the Python pow() path (canonical residues, so
    transcripts are byte-identical too)."""
    from verifiable_mpc_tpu.groups import QuadraticResidues
    from verifiable_mpc_tpu.ops import dispatch

    grp = QuadraticResidues(l=1024)
    q = grp.order
    rng = random.Random(31)
    g = grp.generator
    bases = [g ** rng.randrange(1, q) for _ in range(48)]
    exps = [rng.randrange(q) for _ in range(44)] + [0, 1, q - 1, -7]
    assert native.qr_multiexp(grp, bases, exps) == dispatch._host_multiexp(
        bases, [int(e) for e in exps]
    )
    be = native.qr_batch_exp(g, exps)
    assert all(v == g ** e for e, v in zip(exps, be))
    c = rng.randrange(1, q)
    fl = native.qr_fold(bases[:24], bases[24:48], c)
    assert all(
        v == (a ** c) * b for a, b, v in zip(bases[:24], bases[24:], fl)
    )


def test_qr_dispatch_registration():
    """enable_native + the QR factory register the C tier for QR classes
    (created before OR after enable), and dispatched ops stay
    value-identical."""
    import verifiable_mpc_tpu
    from verifiable_mpc_tpu.groups import QuadraticResidues
    from verifiable_mpc_tpu.ops import dispatch

    assert verifiable_mpc_tpu.enable_native()
    grp = QuadraticResidues(l=1024)
    assert grp in dispatch._MSM_BACKENDS
    rng = random.Random(32)
    g = grp.generator
    q = grp.order
    bases = [g ** rng.randrange(1, q) for _ in range(40)]
    exps = [rng.randrange(q) for _ in range(40)]
    assert dispatch.multiexp(bases, exps) == dispatch._host_multiexp(
        bases, exps
    )
