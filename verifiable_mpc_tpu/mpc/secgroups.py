"""Secure group operations: fixed-base multi-exponentiation on shares.

Parity with ``mpyc.secgroups.repeat_public_base_public_output`` as used by the
reference (mpc_ac20.py:12,35-42): each party exponentiates public bases by its
*local shares* (one batched MSM — the TPU hot spot of the MPC prover), the
per-party group elements are exchanged, and the result is Lagrange-recombined
in the exponent.
"""

from __future__ import annotations

from ..ops.dispatch import multiexp, list_mul
from . import shamir
from .runtime import SecureNumber, _runtime


def repeat_public_base_public_output(bases, exponents):
    """Public output Prod_j bases[j]^{x_j} for secret-shared exponents x.

    Returns an awaitable resolving to a public group element.
    """
    rt = _runtime()
    base_id = ("secrep", rt._next_pc())

    single = not isinstance(bases, (list, tuple))
    base_list = [bases] if single else list(bases)
    exp_list = [exponents] if single else list(exponents)
    assert len(base_list) == len(exp_list)

    sec = next((e for e in exp_list if isinstance(e, SecureNumber)), None)
    field = type(sec).field if sec is not None else None

    async def coro():
        exps = []
        for e in exp_list:
            if isinstance(e, SecureNumber):
                exps.append(int((await e._value()).value))
            else:
                exps.append(int(e))
        local = multiexp(base_list, exps)
        if rt.m == 1:
            return local
        received = await rt._exchange(base_id, local)
        lam = shamir.recombination_vector(field, rt.m)
        return list_mul([a ** int(l) for a, l in zip(received, lam)])

    return rt._task(coro())


secure_repeat = repeat_public_base_public_output
