"""Fused Pallas BN256-G1 MSM/fold: oracle tests (interpret mode on CPU).

Small chunk sizes keep interpret-mode runtime bounded; the kernel itself is
shape-generic (the TPU path uses chunk=128)."""

import random

import numpy as np

from verifiable_mpc_tpu.groups.bn256 import ORDER, BNPoint
from verifiable_mpc_tpu.ops import bn_pallas as bp
from verifiable_mpc_tpu.ops import limbs as lb
from verifiable_mpc_tpu.ops import limbs_lm as lm

import jax.numpy as jnp

rng = random.Random(4321)


def _rows(vals):
    """Montgomery-domain ints -> limb-major [16, n] u32."""
    return jnp.asarray(lb.ints_to_limbs(vals).astype(np.uint32).T)


def _ints(rows):
    return lb.limbs_to_ints(np.asarray(rows).T)


def _enc_lm(pts):
    """points -> limb-major [16, n] coordinate rows via the adapter."""
    bm = bp.BN.encode(pts)
    return tuple(jnp.transpose(a, (1, 0)) for a in bm)


def test_bn_add_dbl_oracle():
    """RCB complete formulas vs the host jacobian group law, including
    identity operands and P+P (the completeness cases)."""
    k = bp._consts()
    g = BNPoint.generator
    pts_a = [g ** rng.randrange(1, ORDER) for _ in range(6)]
    pts_a += [BNPoint.identity, pts_a[0]]
    pts_b = [g ** rng.randrange(1, ORDER) for _ in range(6)]
    pts_b += [pts_a[1], pts_a[0]]  # identity+P and P+P
    out = bp.bn_add_lm(_enc_lm(pts_a), _enc_lm(pts_b), k)
    got = bp.BN.decode_many(tuple(jnp.transpose(a, (1, 0)) for a in out))
    expect = [a * b for a, b in zip(pts_a, pts_b)]
    assert got == expect

    out = bp.bn_dbl_lm(_enc_lm(pts_a), k)
    got = bp.BN.decode_many(tuple(jnp.transpose(a, (1, 0)) for a in out))
    assert got == [a * a for a in pts_a]


def test_bn_pallas_msm_matches_naive():
    n = 8
    g = BNPoint.generator
    pts = [g ** rng.randrange(1, ORDER) for _ in range(n)]
    scalars = [rng.randrange(ORDER) for _ in range(n)]  # full-width
    scalars[0] = 0  # zero-digit/identity path
    got = bp.msm(pts, scalars, chunk=8, sub=1, interpret=True)
    expect = BNPoint.identity
    for p, s in zip(pts, scalars):
        expect = expect * p ** s
    assert got == expect


def test_bn_pallas_fold_matches_host():
    n = 13  # pads to 16 = chunk 8 x sub 2
    g = BNPoint.generator
    gl = [g ** rng.randrange(1, ORDER) for _ in range(n)]
    gr = [g ** rng.randrange(1, ORDER) for _ in range(n)]
    c = rng.randrange(1 << 40)  # short scalar keeps interpret mode fast
    got = bp.fold(gl, gr, c, chunk=8, sub=2, interpret=True)
    expect = [(gl[i] ** c) * gr[i] for i in range(n)]
    assert got == expect
