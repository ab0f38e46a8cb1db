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


def test_enable_multichip_routes_poly_mul_through_mesh():
    """enable_multichip registers the four-step NTT behind ops/ntt's
    poly_mul_ints ladder, so the QAP polynomial hot spots (fastpoly ->
    ntt.poly_mul_mod) shard without caller changes."""
    import verifiable_mpc_tpu
    from verifiable_mpc_tpu.ops import dispatch, ntt

    saved = (
        dict(dispatch._MSM_BACKENDS),
        dict(dispatch._FOLD_BACKENDS),
        ntt._MESH_BACKEND,
    )
    calls = []
    try:
        verifiable_mpc_tpu.enable_multichip(
            pmesh.default_mesh(4), fused=False, min_poly_len=64
        )
        fn, min_n = ntt._MESH_BACKEND
        ntt._MESH_BACKEND = (
            lambda a, b: calls.append(1) or fn(a, b),
            min_n,
        )
        a = [rng.randrange(P) for _ in range(40)]
        b = [rng.randrange(P) for _ in range(30)]
        got = ntt.poly_mul_mod(a, b, P)
        assert calls, "mesh backend not consulted"
        assert got == schoolbook(a, b, P)
        # below the threshold the host ladder keeps the call
        calls.clear()
        small = ntt.poly_mul_mod(a[:4], b[:4], P)
        assert not calls
        assert small == schoolbook(a[:4], b[:4], P)
    finally:
        dispatch._MSM_BACKENDS.clear()
        dispatch._MSM_BACKENDS.update(saved[0])
        dispatch._FOLD_BACKENDS.clear()
        dispatch._FOLD_BACKENDS.update(saved[1])
        ntt._MESH_BACKEND = saved[2]
