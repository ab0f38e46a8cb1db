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
    """Montgomery path (kept for non-Mersenne moduli, e.g. BN254)."""
    from verifiable_mpc_tpu.groups.edwards import P

    p_limbs = lm.int_to_scalar_limbs(P)
    n_prime = lm.int_to_scalar_limbs((-pow(P, -1, 1 << 256)) % (1 << 256))
    n = 8
    xs = [rng.randrange(P) for _ in range(n)]
    ys = [rng.randrange(P) for _ in range(n)]
    R = 1 << 256
    got = _ints(lm.mont_mul(_rows(xs), _rows(ys), p_limbs, n_prime))
    expect = [x * y * pow(R, -1, P) % P for x, y in zip(xs, ys)]
    assert got == expect


def test_limbs_lm_add_sub_mod_oracle():
    from verifiable_mpc_tpu.groups.edwards import P

    p_limbs = lm.int_to_scalar_limbs(P)
    n = 8
    xs = [rng.randrange(P) for _ in range(n)] + [P - 1, 0]
    ys = [rng.randrange(P) for _ in range(n)] + [P - 1, 0]
    assert _ints(lm.add_mod(_rows(xs), _rows(ys), p_limbs)) == [
        (x + y) % P for x, y in zip(xs, ys)
    ]
    assert _ints(lm.sub_mod(_rows(xs), _rows(ys), p_limbs)) == [
        (x - y) % P for x, y in zip(xs, ys)
    ]


def test_limbs_lm_p25519_oracle():
    """Relaxed pseudo-Mersenne ops: outputs are < 2^256 and congruent mod p;
    closure under composition (outputs feed back in as relaxed inputs)."""
    from verifiable_mpc_tpu.groups.edwards import P

    n = 8
    # relaxed inputs: anywhere in [0, 2^256), including extremes
    xs = [rng.randrange(1 << 256) for _ in range(n)] + [0, (1 << 256) - 1, P, 2 * P]
    ys = [rng.randrange(1 << 256) for _ in range(n)] + [(1 << 256) - 1, 0, P - 1, 38]
    xr, yr = _rows(xs), _rows(ys)

    def check(rows, expect_fn):
        got = _ints(rows)
        for g, x, y in zip(got, xs, ys):
            assert 0 <= g < (1 << 256)
            assert g % P == expect_fn(x, y) % P

    check(lm.mul25519(xr, yr), lambda x, y: x * y)
    check(lm.add25519(xr, yr), lambda x, y: x + y)
    check(lm.sub25519(xr, yr), lambda x, y: x - y)
    check(lm.neg25519(yr), lambda x, y: -y)
    c = 2 * 0x2406D9DC56DFFCE7198E80F2EEF3D13000E0149A8283B156EBD69B9426B2F159 % P
    check(lm.mul25519_const(xr, lm.int_to_scalar_limbs(c)), lambda x, y: x * c)
    # composition: (x*y + x) - y stays in-domain and congruent
    comp = lm.sub25519(lm.add25519(lm.mul25519(xr, yr), xr), yr)
    check(comp, lambda x, y: x * y + x - y)
    # dedicated squaring == mul(a, a), on relaxed inputs incl. extremes
    check(lm.sq25519(xr), lambda x, y: x * x)


def test_limbs_lm_sq_wide_oracle():
    """sq_wide(a) == full 512-bit a^2 (the mont_sq building block)."""
    xs = [rng.randrange(1 << 256) for _ in range(8)] + [0, 1, (1 << 256) - 1]
    got = _ints(lm.sq_wide(_rows(xs)))  # limbs_to_ints is width-generic
    assert got == [x * x for x in xs]


def test_signed_recoding_roundtrip():
    """Balanced signed-window recoding reconstructs s mod order with every
    digit in [-7, 8] (the exact offset-7 nibble range _pack_digits needs),
    including 256-bit orders where a near-order scalar has top-window digit
    8 (the unbalanced recoding overflowed NWINDOWS there) and negated
    columns (s > order/2), where a single d > 8 borrow rule used to emit -8
    digits that the nibble pack silently flipped to +8."""
    from verifiable_mpc_tpu.groups.bn256 import ORDER as BN_ORDER

    for order in (ELL, BN_ORDER):
        ss = [rng.randrange(order) for _ in range(500)]
        ss += [0, 1, order - 1, order // 2, order // 2 + 1, 1 << 255]
        # scalars balanced-negated with a +8 digit somewhere: order - k*16^j*8
        ss += [(order - 8 * (1 << (4 * j))) % order for j in range(0, 60, 7)]
        digs = mp._scalar_digits_signed(ss, order).astype(object)
        recon = np.zeros(len(ss), dtype=object)
        for w in range(digs.shape[0]):
            recon = recon * 16 + digs[w]
        assert all(
            (int(r) - (s % order)) % order == 0 for r, s in zip(recon, ss)
        )
        d64 = digs.astype(np.int64)
        assert int(d64.min()) >= -7 and int(d64.max()) <= 8


def test_vectorized_recode_matches_object_path():
    """_scalar_digits_signed_any (C u64x4 conversion + vectorized recode)
    is byte-identical to the object-int reference recode, for Ed25519 and
    BN256 orders, negative ints included (dispatch passes signed ints)."""
    from verifiable_mpc_tpu.groups.bn256 import ORDER as BN_ORDER

    for order in (ELL, BN_ORDER):
        ss = [rng.randrange(order) for _ in range(300)]
        ss += [0, 1, -1, order - 1, order // 2, order // 2 + 1, -5, 1 << 255]
        ss += [(order - 8 * (1 << (4 * j))) % order for j in range(0, 60, 7)]
        got = mp._scalar_digits_signed_any(ss, order)
        expect = mp._scalar_digits_signed(ss, order)
        assert np.array_equal(got, expect), order


def test_recoded_digits_pack_roundtrip():
    """pack(unpack) is the identity on REAL recoded digits (uniform scalars:
    ~half the columns are negated, so this covers the distribution that used
    to produce -8 and corrupt every packed TPU MSM)."""
    ss = [rng.randrange(ELL) for _ in range(512)]
    digs = mp._scalar_digits_signed(ss, ELL)  # [64, 512] int8
    packed = mp._pack_digits(digs)
    un = np.asarray(mp._unpack_digits(jnp.asarray(packed), digs.shape[0]))
    assert (un == digs).all()


def test_digit_nibble_pack_roundtrip():
    """Packed-upload path: two offset-7 nibbles per byte, exact inverse."""
    d = np.random.RandomState(0).randint(-7, 9, size=(64, 37)).astype(np.int8)
    packed = mp._pack_digits(d)
    assert packed.shape == (32, 37) and packed.dtype == np.uint8
    un = np.asarray(mp._unpack_digits(jnp.asarray(packed), 64))
    assert (un == d).all()


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
