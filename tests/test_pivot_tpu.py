"""CPU-testable pieces of the TPU-resident protocol-4 engine
(ac20/pivot_tpu.py): host<->device layout converters and the vectorized
Fermat inversion / canonicalization chain (plain jnp — no Pallas, so they
run under the CPU backend).  The full resident round loop composes the
fused Pallas fold/MSM kernels and is validated on real hardware by
probes/probe_pivot_tpu.py (transcript/proof byte-identity vs the C++
resident engine) — interpret-mode at the engine's minimum shapes
(half >= 4096, chunk 128) is computationally infeasible on CPU."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from verifiable_mpc_tpu import native
from verifiable_mpc_tpu.ac20 import pivot_tpu as pt
from verifiable_mpc_tpu.groups.edwards import ELL, P as ED_P, EdwardsPoint
from verifiable_mpc_tpu.ops import limbs_lm as lm

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C toolchain"
)

rng = random.Random(4242)


def _limbs_to_int(col):
    return sum(int(col[k]) << (16 * k) for k in range(16))


def test_rows_coords_roundtrip():
    g = EdwardsPoint.generator
    pts = [g ** rng.randrange(1, ELL) for _ in range(8)]
    pts = EdwardsPoint.batch_normalize(pts)
    rows = native._pts_to_u64(pts)
    coords = pt._rows_to_coords(rows)
    assert [a.shape for a in coords] == [(8, 16)] * 4
    # canonical (normalized) coords survive the u16 download packing; the
    # two-coordinate download reconstructs t = x*y host-side (C tier)
    dl = np.stack(
        [np.asarray(coords[0]), np.asarray(coords[1])]
    ).astype(np.uint16)
    assert np.array_equal(pt._dl_to_rows(dl), rows)


def test_inv25519_canon_matches_pow():
    vals = [rng.randrange(1, ED_P) for _ in range(6)] + [1, ED_P - 1]
    arr = jnp.asarray(
        np.array([lm.int_to_scalar_limbs(v) for v in vals], np.uint32).T
    )
    inv = jax.jit(lambda a: pt._canon25519(pt._inv25519(a)))(arr)
    inv_np = np.asarray(inv)
    for i, v in enumerate(vals):
        assert _limbs_to_int(inv_np[:, i]) == pow(v, ED_P - 2, ED_P), i


def test_canon25519_reduces_relaxed_values():
    # relaxed: congruent values up to 2^256 - 1 = 2p + 37
    cases = [0, 1, ED_P - 1, ED_P, ED_P + 5, 2 * ED_P, 2 * ED_P + 37]
    arr = jnp.asarray(
        np.array([lm.int_to_scalar_limbs(v) for v in cases], np.uint32).T
    )
    out = np.asarray(jax.jit(pt._canon25519)(arr))
    for i, v in enumerate(cases):
        assert _limbs_to_int(out[:, i]) == v % ED_P, i


def test_vectorized_signed_digits_match_reference_recode():
    from verifiable_mpc_tpu.ops import msm_pallas as mp

    vals = [rng.randrange(ELL) for _ in range(200)]
    vals += [0, 1, ELL - 1, ELL // 2, ELL // 2 + 1, (1 << 252) - 1]
    arr = native._ints_to_u64x4(vals, ELL)
    got = pt._digits_signed_u64x4(arr)
    expect = mp._scalar_digits_signed(vals, ELL)
    assert np.array_equal(got, expect)


def test_fold_digits_match_fold_generic_stream():
    from verifiable_mpc_tpu.ops.msm import NWINDOWS, _scalar_digits

    c = rng.randrange(1, ELL)
    d = np.asarray(pt._fold_digits(c))
    assert d.shape == (NWINDOWS, 1)
    expect = _scalar_digits([c], ELL)[:, 0]
    assert np.array_equal(d[:, 0], expect.astype(np.int32))


def test_engine_declines_when_disabled_or_small():
    from verifiable_mpc_tpu.fields import GF

    gf = GF(ELL)
    g = EdwardsPoint.generator
    # disabled engine: always None
    saved = pt.ENABLED
    pt.ENABLED = False
    try:
        assert (
            pt.try_protocol_4_prover([g] * 8192, g, g, None, None, gf, {}, 0)
            is None
        )
    finally:
        pt.ENABLED = saved
    # enabled but too small / not a power of two
    pt.ENABLED = True
    try:
        assert not pt._engine_ok([g] * 4096, g, gf)
        assert not pt._engine_ok([g] * 8193, g, gf)
    finally:
        pt.ENABLED = saved
