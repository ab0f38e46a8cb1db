"""Pallas TPU kernels for the curve hot path.

The XLA path in :mod:`curve_ed` materializes every intermediate of the
9-multiply Edwards addition through HBM; this kernel fuses the whole unified
addition (all Montgomery multiplies, carries and selects) into one Pallas
program over VMEM-resident [BLOCK, 16] limb tiles — the HBM-bandwidth
optimization SURVEY.md §7 calls for on the MSM inner loop.

Runs in interpret mode on CPU (tests) and is the integration point for the
compiled Mosaic path.  Status: the current [batch, 16]-limb layout trips a
Mosaic vector-concatenate layout bug on this jaxlib ("tpu.concatenate" with
offset vpad layouts, seen on v5e) — compiled-mode requires the limb-major
layout redesign tracked in docs/ROADMAP.md.  The kernel body reuses the
exact jnp limb arithmetic from :mod:`limbs` (under `limbs.shift_accum()`),
so there is a single source of truth for the field math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import curve_ed as ced

DEFAULT_BLOCK = 256


def _add_kernel(p_ref, np_ref, td_ref, ax, ay, az, at, bx, by, bz, bt,
                ox, oy, oz, ot):
    p = (ax[:], ay[:], az[:], at[:])
    q = (bx[:], by[:], bz[:], bt[:])
    rx, ry, rz, rt = ced.add_with_constants(
        p, q, p_ref[0], np_ref[0], td_ref[0]
    )
    ox[:] = rx
    oy[:] = ry
    oz[:] = rz
    ot[:] = rt


@functools.lru_cache(maxsize=None)
def _build_add(n: int, block: int, interpret: bool):
    from . import limbs as lb

    grid = (n // block,)
    spec = pl.BlockSpec((block, 16), lambda i: (i, 0))
    const_spec = pl.BlockSpec((1, 16), lambda i: (0, 0))
    shape = jax.ShapeDtypeStruct((n, 16), jnp.uint32)
    with lb.shift_accum():  # no captured matmul constants inside the kernel
        call = pl.pallas_call(
            _add_kernel,
            grid=grid,
            in_specs=[const_spec] * 3 + [spec] * 8,
            out_specs=[spec] * 4,
            out_shape=[shape] * 4,
            interpret=interpret,
        )
        fn = jax.jit(lambda consts, a, b: tuple(call(*consts, *a, *b)))
        # force tracing now, while the shift-accum mode is active
        dummy_consts = tuple(
            jnp.zeros((1, 16), jnp.uint32) for _ in range(3)
        )
        dummy = tuple(jnp.zeros((n, 16), jnp.uint32) for _ in range(4))
        fn.lower(dummy_consts, dummy, dummy)
    return fn


def pallas_add(p, q, block: int = DEFAULT_BLOCK, interpret: bool = None):
    """Batched complete Edwards addition as a fused Pallas kernel.

    p, q: tuples of 4 coordinate tensors [n, 16] (Montgomery limbs).
    """
    import numpy as np

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = p[0].shape[0]
    block = min(block, n)
    assert n % block == 0, "batch must be a multiple of the block size"
    c = ced.ctx()
    consts = (
        jnp.asarray(np.asarray(c.p_limbs)[None]),
        jnp.asarray(np.asarray(c.n_prime_limbs)[None]),
        jnp.asarray(np.asarray(c.two_d_mont)[None]),
    )
    return _build_add(n, block, interpret)(consts, tuple(p), tuple(q))
