"""Real comparison-gadget protocols of the MPC runtime.

Replaces the trusted-dealer ideal functionality for SecInt types
(roadmap item "replace the dealer with a real bit-decomposition protocol"):
shared random bits via the square trick, to_bits via statistical
mask-open + shared-bit ripple borrow, is_zero via an AND-tree over the
NOT bits.  Tested in 1-party degenerate mode and true 3-party SPMD
(reference test strategy, SURVEY.md §4)."""

import random

from verifiable_mpc_tpu.groups.edwards import ELL
from verifiable_mpc_tpu.mpc import shamir
from verifiable_mpc_tpu.mpc.runtime import mpc, run_multi

rng = random.Random(777)


def test_sqrt_mod():
    for p in (ELL, 2**255 - 19, 7, 13, 97):  # p%4 = 1 and 3 cases
        for _ in range(20):
            x = rng.randrange(1, p)
            s = x * x % p
            t = shamir.sqrt_mod(s, p)
            assert t * t % p == s
            assert t == min(t, p - t)  # canonical root


def _tc_bits(v, l):
    masked = v & ((1 << l) - 1)
    return [(masked >> i) & 1 for i in range(l)]


def test_random_bits_three_party():
    async def party():
        from verifiable_mpc_tpu.mpc.runtime import _runtime

        rt = _runtime()
        await rt.start()
        sec = rt.SecInt(16, p=ELL)
        bits = await rt._random_bit_shares(("test-bits",), sec.field, 12)
        opened = await rt._open_vec(("test-open",), bits)
        await rt.shutdown()
        return [int(b) for b in opened]

    results = run_multi(party, 3)
    assert results[0] == results[1] == results[2]
    assert all(b in (0, 1) for b in results[0])
    assert len(results[0]) == 12


def test_to_bits_protocol_three_party():
    l = 12
    values = [0, 1, -1, 5, -5, (1 << (l - 1)) - 1, -(1 << (l - 1)), 1234]

    async def party():
        from verifiable_mpc_tpu.mpc.runtime import _runtime

        rt = _runtime()
        await rt.start()
        sec = rt.SecInt(l, p=ELL)
        out = []
        for v in values:
            a = sec(v)
            bits = rt.to_bits(a)
            opened = await rt.output(bits)
            out.append([int(b) for b in opened])
        await rt.shutdown()
        return out

    results = run_multi(party, 3)
    assert results[0] == results[1] == results[2]
    for v, got in zip(values, results[0]):
        assert got == _tc_bits(v, l), (v, got)


def test_is_zero_three_party():
    values = [0, 1, -1, 77, -77, 255, -256]

    async def party():
        from verifiable_mpc_tpu.mpc.runtime import _runtime

        rt = _runtime()
        await rt.start()
        sec = rt.SecInt(8, p=ELL)
        out = []
        for v in values:
            z = rt.is_zero(sec(v))
            out.append(int(await rt.output(z)))
        await rt.shutdown()
        return out

    results = run_multi(party, 3)
    assert results[0] == results[1] == results[2]
    assert results[0] == [1 if v == 0 else 0 for v in values]


def test_eq_ne_single_party():
    sec = mpc.SecInt(16, p=ELL)

    async def prog():
        a, b = sec(42), sec(42)
        c = sec(-7)
        eq = await mpc.output(a == b)
        ne = await mpc.output(a != c)
        eq2 = await mpc.output(a == c)
        return int(eq), int(ne), int(eq2)

    assert mpc.run(prog()) == (1, 1, 0)


SMALL_P = 2**61 - 1  # full-width protocols: small prime keeps rounds fast


def test_secfld_is_zero_fermat_three_party():
    """SecFld zero test is the real Fermat protocol (no dealer)."""
    values = [0, 1, -1, 77, SMALL_P - 5]

    async def party():
        from verifiable_mpc_tpu.mpc.runtime import _runtime

        rt = _runtime()
        await rt.start()
        sec = rt.SecFld(SMALL_P)
        out = []
        for v in values:
            z = rt.is_zero(sec(v))
            out.append(int(await rt.output(z)))
        await rt.shutdown()
        return out

    results = run_multi(party, 3)
    assert results[0] == results[1] == results[2]
    assert results[0] == [1 if v % SMALL_P == 0 else 0 for v in values]


def test_secfld_to_bits_full_width_three_party():
    """Full-width to_bits runs the solved-bits construction (no masking
    headroom, no dealer): bits of the signed representative, two's
    complement, LSB first."""
    l = SMALL_P.bit_length()  # kappa_room < 8 -> _to_bits_full path
    values = [0, 1, 5, SMALL_P - 1, SMALL_P // 2, SMALL_P // 2 + 1, 12345]

    async def party():
        from verifiable_mpc_tpu.mpc.runtime import _runtime

        rt = _runtime()
        await rt.start()
        sec = rt.SecFld(SMALL_P)
        out = []
        for v in values:
            bits = rt.to_bits(sec(v), l=l)
            opened = await rt.output(bits)
            out.append([int(b) for b in opened])
        await rt.shutdown()
        return out

    results = run_multi(party, 3)
    assert results[0] == results[1] == results[2]
    for v, got in zip(values, results[0]):
        signed = v - SMALL_P if v > SMALL_P // 2 else v
        assert got == _tc_bits(signed, l), (v, got)


def test_secfld_gadgets_three_party():
    """The != and >= circuit gadgets on SecFld values run end-to-end on
    real protocols (VERDICT round-2 item 8): witness values recombine to
    the plain-arithmetic result."""
    import verifiable_mpc_tpu.ac20.circuit_builder as cb

    async def party():
        from verifiable_mpc_tpu.mpc.runtime import _runtime

        rt = _runtime()
        await rt.start()
        sec = rt.SecFld(SMALL_P)
        gf = sec.field
        circuit = cb.Circuit()
        a = cb.CircuitVar(sec(7), circuit, "a")
        b = cb.CircuitVar(sec(0), circuit, "b")
        ne = a != b  # check_not_zero -> is_zero (Fermat) + reciprocal
        ne.label_output("ne")
        ne2 = b != b * 0
        ne2.label_output("ne2")
        # >= via explicit small-l bit decomposition on SecFld shares:
        # statistical path (headroom OK for l=16 under a 61-bit prime)
        c = cb.CircuitVar(sec(25), circuit, "c")
        ge = c.check_bit_decomp_positive(16)
        ge.label_output("ge")
        outs = []
        for v in [ne.value, ne2.value, ge.value]:
            outs.append(int(await rt.output(v)))
        await rt.shutdown()
        return outs

    results = run_multi(party, 3)
    assert results[0] == results[1] == results[2]
    assert results[0][0] == 1  # 7 != 0
    assert results[0][1] == 0  # 0 != 0 is false
    assert results[0][2] == 1  # 25 has a positive 16-bit decomposition
