"""Fused Pallas kernels under shard_map on the virtual 8-device CPU mesh.

Tiny shapes + short scalars (trims the window count) keep interpret-mode
runtime bounded; the sharding logic — per-chip chunk pipeline, all_gather of
limb-major partials, tree reduction — is identical on a real slice."""

import random

import pytest

from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint
from verifiable_mpc_tpu.parallel import mesh as pm

rng = random.Random(99)


def test_sharded_msm_fused_matches_host():
    mesh = pm.default_mesh(2)
    n = 12  # pads to granule 2 dev * chunk 4 * sub 1 = 8 -> 16
    g = EdwardsPoint.generator
    pts = [g ** rng.randrange(1, ELL) for _ in range(n)]
    scalars = [rng.randrange(1 << 7) for _ in range(n)]  # ~2 windows
    scalars[0] = 0
    got = pm.sharded_msm_fused(
        pts, scalars, mesh=mesh, chunk=4, sub=1, interpret=True
    )
    expect = EdwardsPoint.identity
    for p, s in zip(pts, scalars):
        expect = expect * p ** s
    assert got == expect


def test_sharded_msm_fused_bn_matches_host():
    """BN256 G1 through the same curve-generic fused mesh machinery (the
    enable_multichip BNPoint registration: Pinocchio's proof MSMs shard
    like the Pedersen commitments)."""
    from verifiable_mpc_tpu.groups.bn256 import ORDER, BNPoint
    from verifiable_mpc_tpu.ops import bn_pallas

    mesh = pm.default_mesh(2)
    n = 10
    g = BNPoint.generator
    pts = [g ** rng.randrange(1, ORDER) for _ in range(n)]
    scalars = [rng.randrange(1 << 7) for _ in range(n)]
    scalars[1] = 0
    got = pm.sharded_msm_fused(
        pts, scalars, mesh=mesh, chunk=4, sub=1, interpret=True,
        curve=bn_pallas.BN,
    )
    expect = BNPoint.identity
    for p, s in zip(pts, scalars):
        expect = expect * p ** s
    assert got == expect


def test_sharded_fold_fused_matches_host():
    mesh = pm.default_mesh(2)
    n = 10  # pads to 16
    g = EdwardsPoint.generator
    gl = [g ** rng.randrange(1, ELL) for _ in range(n)]
    gr = [g ** rng.randrange(1, ELL) for _ in range(n)]
    c = rng.randrange(1 << 7)
    got = pm.sharded_fold_fused(
        gl, gr, c, mesh=mesh, chunk=4, sub=2, interpret=True
    )
    expect = [(gl[i] ** c) * gr[i] for i in range(n)]
    assert got == expect
