"""Batched fixed-base secure exponentiation (mpc/secgroups.py):
repeat_fixed_base_public_output must be value-equivalent to n independent
secure_repeat calls — same public outputs — in both the 1-party degenerate
mode and a real 3-party in-process mesh."""

from verifiable_mpc_tpu.groups import EllipticCurve
from verifiable_mpc_tpu.mpc.runtime import mpc, run_multi
from verifiable_mpc_tpu.mpc.secgroups import (
    secure_repeat,
    secure_repeat_fixed_base,
)

GROUP = EllipticCurve("Ed25519", "projective")


async def _party():
    from verifiable_mpc_tpu.mpc.runtime import _runtime

    rt = _runtime()
    await rt.start()
    sectype = rt.SecInt(16, p=GROUP.order)
    h = GROUP.generator
    exps = [sectype(v) for v in (3, 1, 0, 7, 250, 13, 5, 99)]
    batched = await secure_repeat_fixed_base(h, exps)
    singles = [await secure_repeat(h, e) for e in exps]
    await rt.shutdown()
    ok_vals = [a == b for a, b in zip(batched, singles)]
    expect = [h ** v for v in (3, 1, 0, 7, 250, 13, 5, 99)]
    ok_expect = [a == e for a, e in zip(batched, expect)]
    return all(ok_vals) and all(ok_expect)


def test_batched_fixed_base_single_party():
    assert mpc.run(_party())


def test_batched_fixed_base_three_party():
    results = run_multi(lambda: _party(), 3)
    assert results == [True, True, True]
