"""Backend dispatch for the heavy group primitives.

Single integration point between the (host-side) protocol layer and the TPU
kernels: every hot operation identified in SURVEY.md §2 — Pedersen
commitments (reference pivot.py:139-145), the protocol-4 fold
(compressed_pivot.py:41-42,64), Pinocchio's proof MSMs (pynocchio.py:228-273)
— funnels through :func:`multiexp` / :func:`fold_generators`.

A TPU implementation registers itself per group class via
:func:`register_msm_backend`; otherwise a host tree-reduction is used.
"""

from __future__ import annotations

_MSM_BACKENDS = {}  # group class -> callable(points, scalars) -> point
_MIN_TPU_BATCH = 8  # below this, kernel launch overhead dominates


def register_msm_backend(group_cls, fn, min_batch: int = _MIN_TPU_BATCH):
    _MSM_BACKENDS[group_cls] = (fn, min_batch)


def _host_multiexp(bases, exponents):
    cls = type(bases[0])
    terms = [b ** e for b, e in zip(bases, exponents)]
    return _tree_reduce(cls, terms)


def _tree_reduce(cls, terms):
    # binary tree, matching the reference's mpctools.reduce shape
    # (pivot.py:26-28) without its recursion overhead
    if not terms:
        return cls.identity
    while len(terms) > 1:
        nxt = [
            cls._op(terms[i], terms[i + 1]) if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
        terms = nxt
    return terms[0]


import os as _os
import time as _time

_TIMING = bool(_os.environ.get("VMPC_ENGINE_TIMING"))


def multiexp(bases, exponents):
    """prod_i bases[i] ** exponents[i] (exponents: ints or field elements)."""
    if not bases:
        raise ValueError("empty multiexp")
    t0 = _time.perf_counter() if _TIMING and len(bases) >= 32768 else None
    cls = type(bases[0])
    backend = _MSM_BACKENDS.get(cls)
    if backend is not None and len(bases) >= backend[1]:
        # backends convert scalars themselves in ONE fused C pass
        # (native._scalars_to_u64 / msm_pallas._scalar_digits_signed_any);
        # a [int(e) ...] pre-pass here walked 2^18 objects per commitment
        out = backend[0](bases, exponents)
    else:
        out = _host_multiexp(bases, [int(e) for e in exponents])
    if t0 is not None:
        print(
            f"    [dispatch] multiexp n={len(bases)}: "
            f"{_time.perf_counter() - t0:7.3f}s",
            flush=True,
        )
    return out


_MSM_ASYNC_BACKENDS = {}  # group class -> callable(points, scalars) -> thunk


def register_msm_async_backend(group_cls, fn, min_batch: int = _MIN_TPU_BATCH):
    _MSM_ASYNC_BACKENDS[group_cls] = (fn, min_batch)


def multiexp_async(bases, exponents):
    """Launch a multiexp; returns a zero-arg callable producing the point.

    With an async-capable backend (the TPU kernels) the device work and
    result transfer overlap whatever the caller does before invoking the
    thunk — e.g. protocol 8 builds its circuit forms while the z-commitment
    MSM runs.  Otherwise computes eagerly and returns the wrapped result
    (host tiers block anyway)."""
    if not bases:
        raise ValueError("empty multiexp")
    backend = _MSM_ASYNC_BACKENDS.get(type(bases[0]))
    if backend is not None and len(bases) >= backend[1]:
        t0 = _time.perf_counter() if _TIMING and len(bases) >= 32768 else None
        thunk = backend[0](bases, exponents)
        if t0 is None:
            return thunk

        def timed():
            out = thunk()
            print(
                f"    [dispatch] multiexp_async n={len(bases)}: "
                f"{_time.perf_counter() - t0:7.3f}s to fetch",
                flush=True,
            )
            return out

        return timed
    out = multiexp(bases, exponents)
    return lambda: out


def list_mul(x):
    """Group product of a list (reference pivot.py:26-28)."""
    cls = type(x[0])
    return _tree_reduce(cls, list(x))


_FOLD_BACKENDS = {}


def register_fold_backend(group_cls, fn, min_batch: int = _MIN_TPU_BATCH):
    _FOLD_BACKENDS[group_cls] = (fn, min_batch)


def fold_generators(g_l, g_r, c: int):
    """[g_l[i]**c * g_r[i]] — the per-round generator fold of Protocol 4
    (reference compressed_pivot.py:64).

    The result is batch-normalized to canonical coordinates: the folded
    vector feeds the Fiat-Shamir hash on both prover and verifier, so its
    representation must not depend on which backend computed it."""
    cls = type(g_l[0])
    backend = _FOLD_BACKENDS.get(cls)
    if backend is not None and len(g_l) >= backend[1]:
        out = backend[0](g_l, g_r, c)
    else:
        out = [(g_l[i] ** c) * g_r[i] for i in range(len(g_l))]
    return cls.batch_normalize(out)


_BATCH_EXP_BACKENDS = {}


def register_batch_exp_backend(group_cls, fn, min_batch: int = _MIN_TPU_BATCH):
    _BATCH_EXP_BACKENDS[group_cls] = (fn, min_batch)


def batch_exp(base, exponents):
    """[base ** e for e in exponents] — fixed-base batch exponentiation
    (generator/CRS setup, reference circuit_sat_r1cs.py:47-93)."""
    exponents = [int(e) for e in exponents]
    cls = type(base)
    backend = _BATCH_EXP_BACKENDS.get(cls)
    if backend is not None and len(exponents) >= backend[1]:
        return backend[0](base, exponents)
    return [base ** e for e in exponents]
