"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded
MSM/fold must agree with single-device and host results (the analogue of the
reference's m=1 degenerate-mode testing trick, SURVEY.md §4)."""

import random

import jax
import pytest

from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint
from verifiable_mpc_tpu.parallel import mesh as pmesh

rng = random.Random(11)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return pmesh.default_mesh(8)


def rand_points(n):
    g = EdwardsPoint.generator
    return [g ** rng.randrange(1, ELL) for _ in range(n)]


def test_sharded_msm_matches_host(mesh8):
    n = 8 * 4 * 2
    pts = rand_points(n)
    scalars = [rng.randrange(ELL) for _ in range(n)]
    got = pmesh.sharded_msm(pts, scalars, mesh=mesh8, chunk=4)
    expect = EdwardsPoint.identity
    for p, s in zip(pts, scalars):
        expect = expect * (p ** s)
    assert got == expect


def test_sharded_msm_one_device_equals_eight(mesh8):
    n = 8 * 4
    pts = rand_points(n)
    scalars = [rng.randrange(ELL) for _ in range(n)]
    mesh1 = pmesh.default_mesh(1)
    r1 = pmesh.sharded_msm(pts, scalars, mesh=mesh1, chunk=4)
    r8 = pmesh.sharded_msm(pts, scalars, mesh=mesh8, chunk=4)
    assert r1 == r8


def test_sharded_fold_matches_host(mesh8):
    n = 16
    g_l = rand_points(n)
    g_r = rand_points(n)
    c = rng.randrange(ELL)
    got = pmesh.sharded_fold(g_l, g_r, c, mesh=mesh8)
    expect = [(g_l[i] ** c) * g_r[i] for i in range(n)]
    assert got == expect
