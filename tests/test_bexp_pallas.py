"""Fused Pallas fixed-base batch-exp: oracle tests (interpret mode on CPU).

Short exponents trim the window count so interpret mode stays fast; the TPU
path runs the same kernel at chunk=128, nw=64."""

import random

from verifiable_mpc_tpu.groups.bn256 import BNPoint
from verifiable_mpc_tpu.groups.bn256 import ORDER as BN_ORDER
from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint
from verifiable_mpc_tpu.ops import bn_pallas as bp
from verifiable_mpc_tpu.ops import msm_pallas as mp

rng = random.Random(77)


def test_bexp_pallas_ed_matches_host():
    n = 11  # pads to 16 = chunk 8 x sub 2
    g = EdwardsPoint.generator
    base = g ** rng.randrange(1, ELL)
    exps = [rng.randrange(1 << 16) for _ in range(n)]
    exps[0] = 0  # identity lane
    got = mp.batch_exp(base, exps, chunk=8, sub=2, interpret=True)
    assert got == [base ** e for e in exps]


def test_bexp_pallas_bn_matches_host():
    n = 8
    g = BNPoint.generator
    base = g ** rng.randrange(1, BN_ORDER)
    exps = [rng.randrange(1 << 16) for _ in range(n)]
    got = bp.batch_exp(base, exps, chunk=8, sub=1, interpret=True)
    assert got == [base ** e for e in exps]


def test_bexp_comb_ed_matches_host():
    """Fixed-base comb (per-window tables, no doubling ladder): the
    dispatch backend for generator/CRS setup and SNARK keygen."""
    n = 11
    g = EdwardsPoint.generator
    base = g ** rng.randrange(1, ELL)
    exps = [rng.randrange(1 << 16) for _ in range(n)]
    exps[0] = 0  # identity lane
    exps[1] = (1 << 16) - 1  # all-max digits exercise the borrow recode
    got = mp.batch_exp_comb(base, exps, chunk=8, sub=2, interpret=True)
    assert got == [base ** e for e in exps]
    # table cache: the per-base device table was built and retained
    pk = mp._comb_point_key(mp.ED, base)
    assert any(k[: len(pk)] == pk for k in mp._COMB_TABLES)


def test_bexp_comb_bn_matches_host():
    n = 8
    g = BNPoint.generator
    base = g ** rng.randrange(1, BN_ORDER)
    exps = [rng.randrange(1 << 16) for _ in range(n)]
    exps[0] = 0
    got = bp.batch_exp_comb(base, exps, chunk=8, sub=1, interpret=True)
    assert got == [base ** e for e in exps]
