"""Injectable randomness.

The reference draws from module-level ``SystemRandom`` instances
(pivot.py:21, compressed_pivot.py:17), which makes transcript-equality tests
impossible without patching.  Here all protocol randomness flows through this
module so tests can install a deterministic generator (SURVEY.md §7 "pin
randomness by injecting fixed r/rho/gamma in test mode").
"""

from __future__ import annotations

import contextlib
import random as _random

_prng = _random.SystemRandom()


def randrange(*args):
    return _prng.randrange(*args)


def randvector(n: int, order: int, lo: int = 0) -> list:
    """n independent uniform draws from [0, order).

    With the default ``SystemRandom`` source this reads one os.urandom
    buffer and reduces 128-bit-oversized chunks mod order (statistical
    distance < 2^-128 from uniform) — per-element ``randrange`` dominates
    the Protocol-5 prover at 2^14+ blinding-vector sizes otherwise.  Under
    an injected deterministic PRNG (tests) it keeps the per-element
    ``randrange`` call pattern so seeded transcripts are reproducible.
    """
    if not isinstance(_prng, _random.SystemRandom):
        return [_prng.randrange(lo, order) for _ in range(n)]
    import os

    span = order - lo
    nbytes = (span.bit_length() + 7) // 8 + 16
    buf = os.urandom(nbytes * n)
    return [
        int.from_bytes(buf[i * nbytes : (i + 1) * nbytes], "little") % span
        + lo
        for i in range(n)
    ]


def get_prng():
    return _prng


@contextlib.contextmanager
def deterministic(seed: int):
    """Temporarily replace the protocol PRNG with a seeded one (tests only)."""
    global _prng
    saved = _prng
    _prng = _random.Random(seed)
    try:
        yield _prng
    finally:
        _prng = saved
