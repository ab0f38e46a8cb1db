"""Fused Pallas MSM kernel for Ed25519 (limb-major, VMEM-resident).

The XLA windowed MSM (ops/msm.py) materializes every Montgomery-multiply
intermediate through HBM; at n=2^14 that is ~GBs of traffic per MSM and the
kernel runs at ~1-2% of VPU peak.  This kernel fuses the whole per-chunk
pipeline — multiple-table build, per-window digit select, and one complete
Edwards addition into the window accumulators — into a single Pallas program
whose working set lives in VMEM.

Layout (see ops/limbs_lm.py): limbs on the leading axis (sublanes), the
(window x point) grid on the trailing axes (lanes).  Every carry step then
operates on a full [W, C] tile, and all limb shifts are static leading-axis
pads — the combination that sidesteps the Mosaic minor-dim concatenate bug
documented in ops/pallas_kernels.py.

Algorithm = the same 4-bit windowed MSM as ops/msm.py (reference hot spots
pivot.py:139-145, compressed_pivot.py:41-42): per 128-point chunk build the
0..15 multiple table (14 adds), gather each of the 64 windows' multiples,
and add them into persistent [L, W, C] accumulators (output revisiting across
the sequential grid).  The cheap tail (cross-lane butterfly reduction and the
64-step Horner) runs in plain XLA on the [W, C] partials.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..groups.edwards import EdwardsPoint
from . import curve_ed as ced
from . import dispatch
from . import limbs_lm as lm
from .msm import NWINDOWS, WINDOW, _pow2_pad, _scalar_digits

L = 16  # limbs
TABLE = 1 << WINDOW  # 16 multiples per point


@functools.lru_cache(maxsize=None)
def _consts():
    c = ced.ctx()
    return {
        "p": lm.int_to_scalar_limbs(int(c.p)),
        "np": tuple(int(v) for v in np.asarray(c.n_prime_limbs)),
        "two_d": tuple(int(v) for v in np.asarray(c.two_d_mont)),
        "one": tuple(int(v) for v in np.asarray(c.one_mont)),
    }


def ed_add_lm(p, q, k):
    """Complete unified Edwards addition (add-2008-hwcd-3) on limb-major
    [L,*B] coordinates; mirrors curve_ed.add_with_constants."""

    def mul(a, b):
        return lm.mont_mul(a, b, k["p"], k["np"])

    def add_(a, b):
        return lm.add_mod(a, b, k["p"])

    def sub_(a, b):
        return lm.sub_mod(a, b, k["p"])

    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    a = mul(sub_(y1, x1), sub_(y2, x2))
    b = mul(add_(y1, x1), add_(y2, x2))
    cc = mul(lm.mont_mul_const(t1, k["two_d"], k["p"], k["np"]), t2)
    d = mul(add_(z1, z1), z2)
    e = sub_(b, a)
    f = sub_(d, cc)
    g = add_(d, cc)
    h = add_(b, a)
    return (mul(e, f), mul(g, h), mul(f, g), mul(e, h))


def ed_dbl_lm(p, k):
    """Dedicated doubling (dbl-2008-hwcd, a=-1): 4 squares + 4 muls — the
    hot op of the shared-scalar fold's Horner ladder (T1 is not needed)."""

    def mul(a, b):
        return lm.mont_mul(a, b, k["p"], k["np"])

    def sq(a):
        return lm.mont_sq(a, k["p"], k["np"])

    x1, y1, z1, _ = p
    a = sq(x1)
    b = sq(y1)
    sz = sq(z1)
    c = lm.add_mod(sz, sz, k["p"])
    e = lm.sub_mod(
        lm.sub_mod(sq(lm.add_mod(x1, y1, k["p"])), a, k["p"]), b, k["p"]
    )
    g = lm.sub_mod(b, a, k["p"])  # D + B with D = -A
    f = lm.sub_mod(g, c, k["p"])
    h = lm.neg_mod(lm.add_mod(a, b, k["p"]), k["p"])  # D - B
    return (mul(e, f), mul(g, h), mul(f, g), mul(e, h))


def _identity_lm(batch_shape, k):
    zero = lm.const_rows((0,) * L, batch_shape)
    one = lm.const_rows(k["one"], batch_shape)
    return (zero, one, one, zero)


def _msm_kernel(dig_ref, px, py, pz, pt, ox, oy, oz, ot,
                tx_ref, ty_ref, tz_ref, tt_ref):
    """One grid step processes SUB sub-chunks of C points.

    The multiple tables for all SUB*C points are built in ONE Edwards-add
    sequence over [SUB, C]-shaped rows (full 8x128 VPU tiles; a [C]-shaped
    row would waste 7/8 of the sublanes), then the window accumulation walks
    the SUB sub-chunks with [W, C]-shaped rows."""
    k = _consts()
    tbl = (tx_ref, ty_ref, tz_ref, tt_ref)
    point = (px[:], py[:], pz[:], pt[:])  # [L, SUB, C]
    sub, chunk = px.shape[1], px.shape[2]

    # --- multiple tables: tbl[m] = m * P, m = 0..15, for SUB*C points -----
    for ref, arr in zip(tbl, _identity_lm((sub, chunk), k)):
        ref[0] = arr
    for ref, arr in zip(tbl, point):
        ref[1] = arr

    def tbody(m, _):
        prev = tuple(ref[m - 1] for ref in tbl)
        nxt = ed_add_lm(prev, point, k)
        for ref, arr in zip(tbl, nxt):
            ref[m] = arr
        return 0

    jax.lax.fori_loop(2, TABLE, tbody, 0)

    # --- window accumulation over the SUB sub-chunks ----------------------
    outs = (ox, oy, oz, ot)
    W = dig_ref.shape[0]
    sel_shape = (L, W, chunk)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref, arr in zip(outs, _identity_lm((W, chunk), k)):
            ref[:] = arr

    def chunk_body(s, acc):
        digs = dig_ref[:, s]  # [W, C]

        def sbody(m, sel):
            mask = (digs == m)[None]  # [1, W, C]
            out = []
            for ref, sv in zip(tbl, sel):
                # one ref load carrying both dynamic indices (a value-level
                # dynamic_slice has no Mosaic lowering)
                e = jnp.broadcast_to(ref[m, :, s][:, None], sel_shape)
                out.append(jnp.where(mask, e, sv))
            return tuple(out)

        sel = jax.lax.fori_loop(
            1, TABLE, sbody, _identity_lm((W, chunk), k)
        )
        return ed_add_lm(acc, sel, k)

    acc = tuple(ref[:] for ref in outs)
    acc = jax.lax.fori_loop(0, sub, chunk_body, acc)
    for ref, arr in zip(outs, acc):
        ref[:] = arr


@functools.lru_cache(maxsize=None)
def _build(n: int, chunk: int, sub: int, nwindows: int, interpret: bool):
    assert n % (chunk * sub) == 0
    grid = (n // (chunk * sub),)
    pt_spec = pl.BlockSpec((L, sub, chunk), lambda i: (0, i, 0))
    dig_spec = pl.BlockSpec((nwindows, sub, chunk), lambda i: (0, i, 0))
    out_spec = pl.BlockSpec((L, nwindows, chunk), lambda i: (0, 0, 0))
    out_shape = jax.ShapeDtypeStruct((L, nwindows, chunk), jnp.uint32)
    scratch = [pltpu.VMEM((TABLE, L, sub, chunk), jnp.uint32)] * 4
    call = pl.pallas_call(
        _msm_kernel,
        grid=grid,
        in_specs=[dig_spec] + [pt_spec] * 4,
        out_specs=[out_spec] * 4,
        out_shape=[out_shape] * 4,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # the window-accumulation fori_loop carries ~10 live [L, W, C]
            # temporaries; the default 16 MiB scoped-vmem budget OOMs at
            # W=64, C=128 (measured 30 MiB) — raise it (v5e VMEM is 128 MiB)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def run(points_bm, digits):
        # [n, L] batch-major coords -> limb-major [L, n//C, C]
        lmaj = tuple(
            jnp.transpose(a, (1, 0)).reshape(L, n // chunk, chunk)
            for a in points_bm
        )
        digits = digits.reshape(nwindows, n // chunk, chunk)
        partial = call(digits, *lmaj)
        # [L, W, C] -> [W, C, L] batch-major for the XLA tail
        pts = tuple(jnp.transpose(a, (1, 2, 0)) for a in partial)
        red = ced.reduce_lanes(pts, axis=1)  # [W, L]

        def horner(acc, s_w):
            for _ in range(WINDOW):
                acc = ced.double(acc)
            return ced.add(acc, s_w), None

        out, _ = jax.lax.scan(horner, ced.identity(()), red)
        return out

    return jax.jit(run)


def _fold_kernel(dig_ref, lx, ly, lz, lt, rx, ry, rz, rt,
                 ox, oy, oz, ot, tx_ref, ty_ref, tz_ref, tt_ref):
    """g_l^c * g_r with a scalar c shared across all lanes
    (reference compressed_pivot.py:64).

    Per chunk: build the 0..15 multiple table of g_l (14 adds over full
    [SUB, C] tiles), then Horner over c's 4-bit windows — 4 dedicated
    doublings plus one table add per window, digits read from SMEM."""
    k = _consts()
    tbl = (tx_ref, ty_ref, tz_ref, tt_ref)
    gl = (lx[:], ly[:], lz[:], lt[:])  # [L, SUB, C]
    sub, chunk = lx.shape[1], lx.shape[2]

    for ref, arr in zip(tbl, _identity_lm((sub, chunk), k)):
        ref[0] = arr
    for ref, arr in zip(tbl, gl):
        ref[1] = arr

    def tbody(m, _):
        prev = tuple(ref[m - 1] for ref in tbl)
        nxt = ed_add_lm(prev, gl, k)
        for ref, arr in zip(tbl, nxt):
            ref[m] = arr
        return 0

    jax.lax.fori_loop(2, TABLE, tbody, 0)

    nw = dig_ref.shape[0]

    def wbody(w, acc):
        acc = jax.lax.fori_loop(
            0, WINDOW, lambda _, a: ed_dbl_lm(a, k), acc
        )
        d = dig_ref[w, 0]
        entry = tuple(ref[d] for ref in tbl)
        return ed_add_lm(acc, entry, k)

    acc = jax.lax.fori_loop(0, nw, wbody, _identity_lm((sub, chunk), k))
    res = ed_add_lm(acc, (rx[:], ry[:], rz[:], rt[:]), k)
    for ref, arr in zip((ox, oy, oz, ot), res):
        ref[:] = arr


@functools.lru_cache(maxsize=None)
def _build_fold(n: int, chunk: int, sub: int, nw: int, interpret: bool):
    assert n % (chunk * sub) == 0
    grid = (n // (chunk * sub),)
    pt_spec = pl.BlockSpec((L, sub, chunk), lambda i: (0, i, 0))
    dig_spec = pl.BlockSpec(
        (nw, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    out_shape = jax.ShapeDtypeStruct((L, n // chunk, chunk), jnp.uint32)
    scratch = [pltpu.VMEM((TABLE, L, sub, chunk), jnp.uint32)] * 4
    call = pl.pallas_call(
        _fold_kernel,
        grid=grid,
        in_specs=[dig_spec] + [pt_spec] * 8,
        out_specs=[pt_spec] * 4,
        out_shape=[out_shape] * 4,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def run(gl_bm, gr_bm, digits):
        lmaj = tuple(
            jnp.transpose(a, (1, 0)).reshape(L, n // chunk, chunk)
            for a in gl_bm + gr_bm
        )
        out = call(digits, *lmaj)
        # back to batch-major [n, L]
        return tuple(
            jnp.transpose(a.reshape(L, n), (1, 0)) for a in out
        )

    return jax.jit(run)


def fold(g_l, g_r, c: int, chunk: int = 128, sub: int = 8,
         interpret: bool | None = None) -> list:
    """[g_l[i]**c * g_r[i]] via the fused Pallas kernel."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = len(g_l)
    assert n == len(g_r)
    target = max(chunk, _pow2_pad(n, 1))
    chunk = min(chunk, target)
    sub = max(1, min(sub, target // chunk))
    pad = target - n
    if pad:
        g_l = list(g_l) + [EdwardsPoint.identity] * pad
        g_r = list(g_r) + [EdwardsPoint.identity] * pad
    dev_l = ced.encode_points(g_l)
    dev_r = ced.encode_points(g_r)
    c = int(c)
    digits_np = _scalar_digits([c])[:, 0]  # [NWINDOWS] MSB first
    nw = max(1, -(-max(1, c.bit_length()) // WINDOW))
    digits = jnp.asarray(
        digits_np[NWINDOWS - nw:].reshape(nw, 1).astype(np.int32)
    )
    out = _build_fold(target, chunk, sub, nw, interpret)(dev_l, dev_r, digits)
    return ced.decode_points(out)[:n]


def msm(points, scalars, chunk: int = 128, sub: int = 8,
        interpret: bool | None = None):
    """prod points[i] ** scalars[i] via the fused Pallas kernel."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = len(points)
    assert n == len(scalars)
    target = max(chunk, _pow2_pad(n, 1))
    chunk = min(chunk, target)
    sub = max(1, min(sub, target // chunk))
    pad = target - n
    if pad:
        points = list(points) + [EdwardsPoint.identity] * pad
        scalars = list(scalars) + [0] * pad
    dev_pts = ced.encode_points(points)
    digits_np = _scalar_digits(scalars)  # [NWINDOWS, n] MSB first
    # trim all-zero leading windows (rounded to a sublane multiple of 8):
    # full-size scalars keep all 64, but short exponents (tests, small
    # bit-length batches) shrink the whole [L, W, C] working set
    top = max((int(s).bit_length() for s in scalars), default=1)
    windows_needed = -(-top // WINDOW)
    nw = min(NWINDOWS, max(8, -(-windows_needed // 8) * 8))
    digits = jnp.asarray(digits_np[NWINDOWS - nw:])
    out = _build(target, chunk, sub, nw, interpret)(dev_pts, digits)
    return ced.decode_point(out)


def register(min_batch: int = 512, chunk: int = 128):
    """Install the fused kernels as the Ed25519 dispatch backends."""
    dispatch.register_msm_backend(
        EdwardsPoint, lambda pts, sc: msm(pts, sc, chunk=chunk), min_batch
    )
    dispatch.register_fold_backend(
        EdwardsPoint, lambda gl, gr, c: fold(gl, gr, c, chunk=chunk), min_batch
    )
