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
