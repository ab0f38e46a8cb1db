"""Fused limb-major Pallas MSM: oracle tests (interpret mode on CPU).

Small chunk sizes keep interpret-mode runtime bounded; the kernel itself is
shape-generic (the TPU path uses chunk=128)."""

import random

from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint
from verifiable_mpc_tpu.ops import limbs_lm as lm
from verifiable_mpc_tpu.ops import msm_pallas as mp

import numpy as np
import jax.numpy as jnp

rng = random.Random(1234)


def _rows(vals):
    """ints -> limb-major [16, n] u32."""
    from verifiable_mpc_tpu.ops import limbs as lb

    return jnp.asarray(lb.ints_to_limbs(vals).T)


def _ints(rows):
    from verifiable_mpc_tpu.ops import limbs as lb

    return lb.limbs_to_ints(np.asarray(rows).T)


def test_limbs_lm_mont_mul_oracle():
    from verifiable_mpc_tpu.groups.edwards import P

    k = mp._consts()
    n = 8
    xs = [rng.randrange(P) for _ in range(n)]
    ys = [rng.randrange(P) for _ in range(n)]
    R = 1 << 256
    got = _ints(lm.mont_mul(_rows(xs), _rows(ys), k["p"], k["np"]))
    expect = [x * y * pow(R, -1, P) % P for x, y in zip(xs, ys)]
    assert got == expect


def test_limbs_lm_add_sub_mod_oracle():
    from verifiable_mpc_tpu.groups.edwards import P

    k = mp._consts()
    n = 8
    xs = [rng.randrange(P) for _ in range(n)] + [P - 1, 0]
    ys = [rng.randrange(P) for _ in range(n)] + [P - 1, 0]
    assert _ints(lm.add_mod(_rows(xs), _rows(ys), k["p"])) == [
        (x + y) % P for x, y in zip(xs, ys)
    ]
    assert _ints(lm.sub_mod(_rows(xs), _rows(ys), k["p"])) == [
        (x - y) % P for x, y in zip(xs, ys)
    ]


def test_signed_recoding_roundtrip():
    """Balanced signed-window recoding reconstructs s mod order with digit
    magnitudes <= 8, including 256-bit orders where a near-order scalar has
    top-window digit 8 (the unbalanced recoding overflowed NWINDOWS there)."""
    from verifiable_mpc_tpu.groups.bn256 import ORDER as BN_ORDER

    for order in (ELL, BN_ORDER):
        ss = [rng.randrange(order) for _ in range(500)]
        ss += [0, 1, order - 1, order // 2, order // 2 + 1, 1 << 255]
        digs = mp._scalar_digits_signed(ss, order).astype(object)
        recon = np.zeros(len(ss), dtype=object)
        for w in range(digs.shape[0]):
            recon = recon * 16 + digs[w]
        assert all(
            (int(r) - (s % order)) % order == 0 for r, s in zip(recon, ss)
        )
        assert int(np.abs(digs.astype(np.int64)).max()) <= 8


def test_pallas_msm_matches_naive():
    n = 8
    g = EdwardsPoint.generator
    pts = [g ** rng.randrange(1, ELL) for _ in range(n)]
    scalars = [rng.randrange(ELL) for _ in range(n)]  # full-width exponents
    scalars[0] = 0  # exercise the zero-digit/identity path
    got = mp.msm(pts, scalars, chunk=8, sub=1, interpret=True)
    expect = EdwardsPoint.identity
    for p, s in zip(pts, scalars):
        expect = expect * p ** s
    assert got == expect


def test_pallas_fold_matches_host():
    n = 13  # pads to 16 = chunk 8 x sub 2
    g = EdwardsPoint.generator
    gl = [g ** rng.randrange(1, ELL) for _ in range(n)]
    gr = [g ** rng.randrange(1, ELL) for _ in range(n)]
    c = rng.randrange(1 << 40)  # short scalar keeps interpret mode fast
    got = mp.fold(gl, gr, c, chunk=8, sub=2, interpret=True)
    expect = [(gl[i] ** c) * gr[i] for i in range(n)]
    assert got == expect


def test_pallas_msm_subchunks_padding_window_trim():
    n = 13  # pads to 16 = chunk 8 x sub 2; short exponents trim windows to 8
    g = EdwardsPoint.generator
    pts = [g ** rng.randrange(1, ELL) for _ in range(n)]
    scalars = [rng.randrange(1 << 30) for _ in range(n)]
    got = mp.msm(pts, scalars, chunk=8, sub=2, interpret=True)
    expect = EdwardsPoint.identity
    for p, s in zip(pts, scalars):
        expect = expect * p ** s
    assert got == expect
