"""Bucket-method MSM: host-side recoding/layout oracles + a tiny
interpret-mode pipeline test.

The TPU kernel shape (lanes=128, nw=32) is validated on hardware by
probes/probe_bucket.py (one Mosaic compile, persisted); here lanes/windows shrink
so the discharged interpret-mode trace stays small, mirroring the approach
of tests/test_msm_pallas.py."""

import random

import numpy as np
import pytest

from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint
from verifiable_mpc_tpu.ops import msm_bucket as mb

rng = random.Random(417)


def test_signed8_digits_reconstruct():
    scalars = [rng.randrange(ELL) for _ in range(32)] + [0, 1, ELL - 1, ELL // 2]
    digits = mb._scalar_digits_signed8(scalars, ELL)
    assert digits.shape == (mb.NW8, len(scalars))
    assert int(np.abs(digits).max()) <= 128
    for j, s in enumerate(scalars):
        val = 0
        for w in range(mb.NW8):  # MSB first
            val = (val << 8) + int(digits[w, j])
        assert val % ELL == s % ELL


def test_bucket_layout_covers_all_entries():
    n = 97
    scalars = [rng.randrange(ELL) for _ in range(n)]
    digits = mb._scalar_digits_signed8(scalars, ELL)
    perm, sgn, d = mb._bucket_layout(digits, dt=8)
    assert d % 8 == 0
    nw = digits.shape[0]
    # every nonzero digit appears exactly once, in its magnitude's column,
    # with its sign; every -1 slot is padding
    for w in range(nw):
        seen = {}
        for row in range(d):
            for lane in range(mb.LANES):
                i = int(perm[w, row, lane])
                if i < 0:
                    continue
                assert i not in seen
                seen[i] = (lane + 1, int(sgn[w, row, lane]))
        for i in range(n):
            dg = int(digits[w, i])
            if dg == 0:
                assert i not in seen
            else:
                assert seen[i] == (abs(dg), int(dg < 0))


def _small_digit_scalar(nw, maxmag):
    """Scalar whose radix-256 signed digits have magnitude <= maxmag."""
    val = 0
    for _ in range(nw):
        val = (val << 8) + rng.randrange(maxmag + 1)
    return val


def test_bucket_msm_interpret_tiny():
    """Full pipeline (layout -> gather -> accumulate -> reduce -> Horner)
    at lanes=4, nw<=2, dt=2 against the host multiexp."""
    n = 11
    g = EdwardsPoint.generator
    pts = [g ** rng.randrange(1, ELL) for _ in range(n)]
    scalars = [_small_digit_scalar(2, 4) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = (1 << 8) * 4 + 4  # max-magnitude digits
    scalars[2] = ELL - 2  # balanced negative: digits all flip sign
    got = mb._msm_bucket_generic(
        mb.mp.ED, pts, scalars, dt=2, interpret=True, lanes=4
    )
    expect = EdwardsPoint.identity
    for p, s in zip(pts, scalars):
        expect = expect * p ** s
    assert got == expect


def test_bucket_msm_register_small_falls_back():
    """register() keeps small batches on the previously-installed backend."""
    from verifiable_mpc_tpu.ops import dispatch

    saved = dict(dispatch._MSM_BACKENDS)
    try:
        calls = []

        def fake(pts, sc):
            calls.append(len(pts))
            return dispatch._host_multiexp(pts, sc)

        dispatch.register_msm_backend(EdwardsPoint, fake, 4)
        mb.register(min_batch=64)
        g = EdwardsPoint.generator
        pts = [g ** rng.randrange(1, ELL) for _ in range(8)]
        sc = [rng.randrange(ELL) for _ in range(8)]
        got = dispatch.multiexp(pts, sc)
        assert calls == [8]
        assert got == dispatch._host_multiexp(pts, sc)
    finally:
        dispatch._MSM_BACKENDS.clear()
        dispatch._MSM_BACKENDS.update(saved)
