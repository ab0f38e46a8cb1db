"""Distributed NTT tests: sharded butterflies must equal the host product."""

import random

import jax
import pytest

from verifiable_mpc_tpu.groups.bn256 import ORDER as P
from verifiable_mpc_tpu.parallel import mesh as pmesh
from verifiable_mpc_tpu.parallel.ntt_mesh import (
    four_step_poly_mul_ints,
    sharded_poly_mul_ints,
)

rng = random.Random(61)


def schoolbook(a, b, p):
    o = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            o[i + j] = (o[i + j] + ai * bj) % p
    return o


def test_sharded_poly_mul_matches_host():
    assert len(jax.devices()) >= 8
    mesh = pmesh.default_mesh(8)
    a = [rng.randrange(P) for _ in range(40)]
    b = [rng.randrange(P) for _ in range(30)]
    got = sharded_poly_mul_ints(a, b, mesh=mesh)
    assert [g % P for g in got] == schoolbook(a, b, P)


@pytest.mark.parametrize("ndev", [4, 8])
def test_four_step_poly_mul_matches_host(ndev):
    assert len(jax.devices()) >= ndev
    mesh = pmesh.default_mesh(ndev)
    a = [rng.randrange(P) for _ in range(90)]
    b = [rng.randrange(P) for _ in range(75)]  # n=256 = 16x16
    got = four_step_poly_mul_ints(a, b, mesh=mesh)
    assert [g % P for g in got] == schoolbook(a, b, P)
