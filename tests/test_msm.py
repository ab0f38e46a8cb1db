"""TPU kernel tests: batched Edwards ops, MSM, fold, batch_exp vs host group
arithmetic (SURVEY.md §7 oracle for layers 2-3)."""

import random

import pytest

from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint
from verifiable_mpc_tpu.ops import curve_ed as ced
from verifiable_mpc_tpu.ops import msm as msm_mod

rng = random.Random(777)

G = EdwardsPoint.generator


def rand_points(n):
    return [G ** rng.randrange(1, ELL) for _ in range(n)]


def test_encode_decode_roundtrip():
    pts = rand_points(5) + [EdwardsPoint.identity]
    dev = ced.encode_points(pts)
    back = ced.decode_points(dev)
    assert all(a == b for a, b in zip(back, pts))


def test_batched_add_double_matches_host():
    pts1 = rand_points(8)
    pts2 = rand_points(7) + [EdwardsPoint.identity]
    d1 = ced.encode_points(pts1)
    d2 = ced.encode_points(pts2)
    got = ced.decode_points(ced.add(d1, d2))
    expect = [a * b for a, b in zip(pts1, pts2)]
    assert got == expect
    got_dbl = ced.decode_points(ced.double(d1))
    assert got_dbl == [a * a for a in pts1]


def test_msm_matches_host():
    n = 16
    pts = rand_points(n)
    scalars = [rng.randrange(ELL) for _ in range(n)]
    scalars[0] = 0  # edge: zero scalar
    got = msm_mod.msm(pts, scalars, chunk=8)
    expect = EdwardsPoint.identity
    for p, s in zip(pts, scalars):
        expect = expect * (p ** s)
    assert got == expect


def test_msm_with_padding():
    n = 5  # not a multiple of chunk
    pts = rand_points(n)
    scalars = [rng.randrange(ELL) for _ in range(n)]
    got = msm_mod.msm(pts, scalars, chunk=8)
    expect = EdwardsPoint.identity
    for p, s in zip(pts, scalars):
        expect = expect * (p ** s)
    assert got == expect


def test_fold_matches_host():
    n = 8
    g_l = rand_points(n)
    g_r = rand_points(n)
    c = rng.randrange(ELL)
    got = msm_mod.fold(g_l, g_r, c)
    expect = [(g_l[i] ** c) * g_r[i] for i in range(n)]
    assert got == expect


def test_batch_exp_matches_host():
    exps = [0, 1, 2, ELL - 1] + [rng.randrange(ELL) for _ in range(4)]
    got = msm_mod.batch_exp(G, exps)
    expect = [G ** e for e in exps]
    assert got == expect


def test_dispatch_integration():
    """Registering the backend routes vector_commitment through the kernel."""
    from verifiable_mpc_tpu.ops import dispatch
    import verifiable_mpc_tpu.ac20.pivot as pivot

    saved = dict(dispatch._MSM_BACKENDS)
    try:
        msm_mod.register(min_batch=4, chunk=8)  # small kernel: CI compile budget
        n = 8
        pts = rand_points(n)
        x = [rng.randrange(ELL) for _ in range(n - 1)]
        gamma = rng.randrange(ELL)
        got = pivot.vector_commitment(x, gamma, pts[:-1], pts[-1])
        expect = EdwardsPoint.identity
        for p, s in zip(pts[:-1], x):
            expect = expect * (p ** s)
        expect = expect * (pts[-1] ** gamma)
        assert got == expect
    finally:
        dispatch._MSM_BACKENDS.clear()
        dispatch._MSM_BACKENDS.update(saved)
