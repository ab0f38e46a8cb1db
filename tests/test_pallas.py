"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import random

from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint
from verifiable_mpc_tpu.ops import curve_ed as ced
from verifiable_mpc_tpu.ops import pallas_kernels as pk

rng = random.Random(21)


def test_pallas_add_matches_host():
    n = 8
    g = EdwardsPoint.generator
    pts1 = [g ** rng.randrange(1, ELL) for _ in range(n)]
    pts2 = [g ** rng.randrange(1, ELL) for _ in range(n - 1)] + [
        EdwardsPoint.identity
    ]
    d1 = ced.encode_points(pts1)
    d2 = ced.encode_points(pts2)
    out = pk.pallas_add(d1, d2, block=4)
    got = ced.decode_points(out)
    expect = [a * b for a, b in zip(pts1, pts2)]
    assert got == expect
