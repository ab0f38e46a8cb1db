"""Quadratic-residue groups modulo a safe prime.

Capability parity with ``mpyc.fingroups.QuadraticResidues(l=...)`` as used by
the reference demos (/root/reference/demos/demo_zkp_ac20.py:51).  For a safe
prime p = 2q + 1 the squares mod p form a group of prime order q; 4 = 2^2
generates it.

Safe primes: well-known IETF MODP primes for the production bit lengths
(RFC 2409 group 2 for 1024 bits, RFC 3526 for 1536..4096); small bit lengths
(used by the reference's unit tests with l=64, test_pivot.py:14) are found by
deterministic search.
"""

from __future__ import annotations

import functools

from .base import FiniteGroupElement

_RFC_MODP_HEX = {
    1024: (
        "FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74"
        "020BBEA63B139B22514A08798E3404DDEF9519B3CD3A431B302B0A6DF25F1437"
        "4FE1356D6D51C245E485B576625E7EC6F44C42E9A637ED6B0BFF5CB6F406B7ED"
        "EE386BFB5A899FA5AE9F24117C4B1FE649286651ECE65381FFFFFFFFFFFFFFFF"
    ),
    1536: (
        "FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74"
        "020BBEA63B139B22514A08798E3404DDEF9519B3CD3A431B302B0A6DF25F1437"
        "4FE1356D6D51C245E485B576625E7EC6F44C42E9A637ED6B0BFF5CB6F406B7ED"
        "EE386BFB5A899FA5AE9F24117C4B1FE649286651ECE45B3DC2007CB8A163BF05"
        "98DA48361C55D39A69163FA8FD24CF5F83655D23DCA3AD961C62F356208552BB"
        "9ED529077096966D670C354E4ABC9804F1746C08CA237327FFFFFFFFFFFFFFFF"
    ),
    2048: (
        "FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74"
        "020BBEA63B139B22514A08798E3404DDEF9519B3CD3A431B302B0A6DF25F1437"
        "4FE1356D6D51C245E485B576625E7EC6F44C42E9A637ED6B0BFF5CB6F406B7ED"
        "EE386BFB5A899FA5AE9F24117C4B1FE649286651ECE45B3DC2007CB8A163BF05"
        "98DA48361C55D39A69163FA8FD24CF5F83655D23DCA3AD961C62F356208552BB"
        "9ED529077096966D670C354E4ABC9804F1746C08CA18217C32905E462E36CE3B"
        "E39E772C180E86039B2783A2EC07A28FB5C55DF06F4C52C9DE2BCBF695581718"
        "3995497CEA956AE515D2261898FA051015728E5A8AACAA68FFFFFFFFFFFFFFFF"
    ),
}


def _is_probable_prime(n: int) -> bool:
    if n < 2:
        return False
    for sp in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % sp == 0:
            return n == sp
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    # deterministic for n < 3.3e24; strong-probable-prime otherwise
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


@functools.lru_cache(maxsize=None)
def find_safe_prime(bit_length: int) -> int:
    """Deterministic safe prime of the given bit length."""
    if bit_length in _RFC_MODP_HEX:
        p = int(_RFC_MODP_HEX[bit_length], 16)
        assert _is_probable_prime(p) and _is_probable_prime((p - 1) // 2)
        return p
    # smallest safe prime >= 2^(bit_length-1), p % 4 == 3
    p = (1 << (bit_length - 1)) + 3
    while True:
        if _is_probable_prime((p - 1) // 2) and _is_probable_prime(p):
            return p
        p += 4


class QuadraticResidueElement(FiniteGroupElement):
    __slots__ = ("value",)

    modulus: int = 0  # safe prime p
    order: int = 0  # q = (p - 1) // 2

    def __init__(self, value):
        if isinstance(value, QuadraticResidueElement):
            value = value.value
        self.value = value % self.modulus

    @classmethod
    def _op(cls, a, b):
        return cls(a.value * b.value)

    @classmethod
    def _inv(cls, a):
        return cls(pow(a.value, -1, cls.modulus))

    @classmethod
    def _scalar_mul(cls, a, k: int):
        k %= cls.order
        return cls(pow(a.value, k, cls.modulus))

    def __eq__(self, other):
        if isinstance(other, QuadraticResidueElement):
            return (
                type(other).modulus == type(self).modulus
                and other.value == self.value
            )
        return NotImplemented

    def __hash__(self):
        return hash((type(self).modulus, "qr", self.value))

    def __repr__(self):
        return str(self.value)

    def __int__(self):
        return self.value


_CLASSES: list = []  # every class the factory produced (late registration)


@functools.lru_cache(maxsize=None)
def QuadraticResidues(l: int = 2048):
    """Return the QR group class for a deterministic safe prime of l bits."""
    p = find_safe_prime(l)
    name = f"QR({l})"
    cls = type(name, (QuadraticResidueElement,), {"__slots__": ()})
    cls.modulus = p
    cls.order = (p - 1) // 2
    cls.identity = cls(1)
    cls.generator = cls(4)
    _CLASSES.append(cls)
    from .. import native

    if native.REGISTERED:
        # C Montgomery/Pippenger tier (native/qr.cc); enable_native
        # registers classes created before it ran via _created_classes
        native.register_qr(cls)
    return cls


def _created_classes() -> list:
    return list(_CLASSES)
