"""Standalone Sigma-proofs for circuit gadgets.

Completes the reference's work-in-progress module
(/root/reference/verifiable_mpc/wip_sigmaproof.py): a non-interactive proof
that a Pedersen-committed value is non-zero (exercise 5.3.2.g of the TU/e
Cryptographic Protocols notes), for plain witnesses and for Shamir-shared
witnesses via the MPC runtime.

Relation: {(B; x, y) : B = g^x h^y, x != 0}.
Proof idea: if x != 0 the prover knows (1/x, -y/x) with g = B^{1/x} h^{-y/x};
a standard Sigma-protocol for that representation proves x != 0.
"""

from __future__ import annotations

from enum import Enum

from . import rng
from .ac20 import pivot
from .fields import GF


class SigmaProof(Enum):
    """Predicate of proof."""

    not_zero = 1


def commit_not_zero(x, group, y=None):
    """Pedersen-commit to x with randomizer y; returns (B, g, h, y)."""
    gf = GF(group.order)
    g = group.generator
    h = g ** rng.randrange(1, group.order)
    y = rng.randrange(group.order) if y is None else y
    B = (g ** int(x)) * (h ** y)
    return B, g, h, y


def prove_not_zero(x, y, B, g, h, group):
    """NIZK that the value inside B = g^x h^y satisfies x != 0."""
    gf = GF(group.order)
    x = gf(x)
    assert x != 0, "witness is zero; statement is false"
    # witness for the representation g = B^a h^b
    a = x ** -1
    b = -gf(y) * a
    # Sigma-protocol for representation (Okamoto style)
    u = rng.randrange(group.order)
    v = rng.randrange(group.order)
    t = (B ** u) * (h ** v)
    c = pivot.fiat_shamir_hash([t, B, g, h, "sigma not-zero"], group.order)
    r1 = gf(u) + gf(c) * a
    r2 = gf(v) + gf(c) * b
    return {"t": t, "c": c, "r1": r1, "r2": r2}


def verify_not_zero(B, g, h, proof, group):
    t, c, r1, r2 = proof["t"], proof["c"], proof["r1"], proof["r2"]
    lhs = (B ** int(r1)) * (h ** int(r2))
    rhs = t * (g ** c)
    if lhs != rhs:
        return False
    c_check = pivot.fiat_shamir_hash([t, B, g, h, "sigma not-zero"], group.order)
    return c == c_check


async def sigma_prove_not_zero_mpc(x, group):
    """MPC variant: the witness x is a secure share; commitment and
    announcement are produced with secure fixed-base multi-exponentiation
    (parity with the reference sketch wip_sigmaproof.py:25-50)."""
    from .mpc.runtime import mpc
    from .mpc.secgroups import secure_repeat

    gf = GF(group.order)
    sectype = type(x)
    g = group.generator
    # jointly sampled h: no party knows its discrete log
    h = await secure_repeat(g, mpc._random(sectype))
    y = mpc._random(sectype)
    B = await secure_repeat([g, h], [x, y])

    # shares of a = 1/x and b = -y/x
    a = x ** -1
    b = -1 * y * a
    u = mpc._random(sectype)
    v = mpc._random(sectype)
    t = await secure_repeat([B, h], [u, v])
    c = pivot.fiat_shamir_hash([t, B, g, h, "sigma not-zero"], group.order)
    r1 = await mpc.output(u + c * a, raw=True)
    r2 = await mpc.output(v + c * b, raw=True)
    proof = {"t": t, "c": c, "r1": gf(int(r1)), "r2": gf(int(r2))}
    return B, g, h, proof
