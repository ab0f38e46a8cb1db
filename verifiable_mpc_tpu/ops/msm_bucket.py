"""Bucket-method (Pippenger) Pallas MSM — 8-bit signed windows.

The fused windowed kernel (ops/msm_pallas.py) pays ~71 group adds per point
(64 window-accumulate adds + 7 table adds) plus an 8-deep digit-select chain.
The bucket method replaces the per-point table with per-(window, bucket)
accumulators: each point costs exactly ONE add per window — 32 adds per
point at 8-bit windows — and the selection work disappears entirely (the
host pre-sorts points into bucket order, the device just gathers).

TPU mapping: 8-bit *signed* digits have magnitudes 1..128, which is exactly
the VPU lane count — bucket b lives in lane b-1, windows stack on the
sublane grid dimension.  The accumulation kernel is a fixed-shape serial
fori_loop of complete group additions over [L, NW, 128] tiles (one Mosaic
compile serves every MSM size; the host loops over depth tiles with
input/output-aliased accumulators, like ops/msm_pallas.py).  The weighted
bucket reduction sum_b b*B_b is computed as sum_b suffix(B)_b — a 7-round
Hillis-Steele suffix scan across lanes — followed by a 7-round butterfly
lane reduction and the 8-doubling Horner ladder over windows.

Cost model (n points, 128 buckets): 32 * ceil-padded(max bucket depth)
* 128 point-adds; the rectangular [depth, 128] layout wastes
(max - mean)/mean of the adds (~19% at n = 2^16, ~35% at 2^14).  Net vs the
windowed kernel: ~1.5x fewer VPU row-adds at 2^14, ~1.8x at 2^16.

Serves the same reference hot spots as ops/msm_pallas.py: Pedersen
commitments (reference pivot.py:139-145), protocol-4 A/B MSMs
(compressed_pivot.py:41-42), Pinocchio proof/key MSMs
(pynocchio.py:101-200, :228-273).  Curve-generic over the same adapters
(ED / BN / BN2).

MEASURED VERDICT (probes/probe_bucket.py / probes/probe_bucket_diag.py on the v5e
tunnel): correct but 40x SLOWER than the windowed kernel at n=2^14
(2.7k vs 109k points/s).  The algorithmic ~1.9x saving in group adds is
swamped by the data-dependent point permutation: XLA row-gathers of
[dt=8, 32, 128] x 16-u32 rows run at ~150 MB/s effective (113 ms/step
where the whole step's group math is ~4 ms), and each small host->device
index upload costs ~28 ms of tunnel latency.  The windowed kernel's
single sequential pass + in-VMEM digit select is the right shape for this
memory system.  Kept unregistered: correctness-tested reference for a
future sparsecore/DMA-pipelined gather (pltpu.make_async_copy with
SMEM-driven offsets could hide the permutation behind compute).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dispatch
from . import msm_pallas as mp
from .msm import NWINDOWS, _pow2_pad, _scalar_digits

L = mp.L
WINDOW8 = 8
NW8 = 32  # 256 / 8
LANES = 128  # bucket magnitudes 1..128 <-> VPU lanes


def _scalar_digits_signed8(scalars, order) -> np.ndarray:
    """[N] ints -> [NW8, N] int32 signed 8-bit digits in [-127, 128],
    most significant window first.

    Same balanced+borrow recoding as msm_pallas._scalar_digits_signed but
    at radix 256: scalars balanced to [-order/2, order/2], digits > 128
    borrow 256 from the next window.  Magnitudes land in 0..128 — exactly
    the bucket range."""
    reduced = np.array([int(s) % order for s in scalars], dtype=object)
    neg = reduced > order // 2
    balanced = np.where(neg, order - reduced, reduced)
    d4 = _scalar_digits(list(balanced), order).astype(np.int64)  # [64,N] MSB
    d8 = d4[0::2] * 16 + d4[1::2]  # [NW8, N] MSB first
    d8 = d8[::-1]  # LSB first for the borrow pass
    carry = np.zeros(d8.shape[1], np.int64)
    out = np.empty_like(d8)
    for w in range(NW8):
        d = d8[w] + carry
        carry = (d > LANES).astype(np.int64)
        out[w] = d - 256 * carry
    assert not carry.any(), "scalar overflow in signed radix-256 recoding"
    out[:, neg] = -out[:, neg]
    return np.ascontiguousarray(out[::-1].astype(np.int32))  # MSB first


def _bucket_layout(digits: np.ndarray, dt: int, lanes: int = LANES):
    """Signed digits [NW, n] -> (perm [NW, D, lanes], sign [NW, D, lanes], D).

    Column b of window w lists (in rows 0..count-1) the indices of points
    whose digit magnitude is b+1; -1 marks identity padding.  D = max bucket
    depth over all (window, bucket), rounded up to a multiple of dt (the
    kernel depth tile)."""
    nw, n = digits.shape
    mags = np.abs(digits)
    assert mags.max(initial=0) <= lanes, "digit magnitude exceeds bucket range"
    dmax = 1
    perms, sgns = [], []
    rows = []
    for w in range(nw):
        m = mags[w]
        counts = np.bincount(m, minlength=lanes + 1)
        dmax = max(dmax, int(counts[1:].max(initial=0)))
        order_idx = np.argsort(m, kind="stable")
        ms = m[order_idx]
        nz = ms > 0
        starts = np.zeros(lanes + 1, np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        pos = np.flatnonzero(nz) - starts[ms[nz]]
        rows.append((order_idx[nz], ms[nz] - 1, pos))
    D = -(-dmax // dt) * dt
    perm = np.full((nw, D, lanes), -1, np.int32)
    sgn = np.zeros((nw, D, lanes), np.int32)
    for w, (idx, col, pos) in enumerate(rows):
        perm[w, pos, col] = idx
        sgn[w, pos, col] = digits[w, idx] < 0
    return perm, sgn, D


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _make_accum_kernel(curve):
    nc = curve.NC

    def kernel(*refs):
        """Add DT gathered depth-slices [L, NW, lanes] into the persistent
        (window x bucket) accumulators, flipping the sign of negative-digit
        entries first.  Fixed shape: accumulators stream through aliased
        operands; the host loops over depth tiles."""
        sgn_ref = refs[0]  # [DT, NW, lanes] int32 (1 = negate)
        ents = refs[1 : 1 + nc]  # nc x [DT, L, NW, lanes]
        accin = refs[1 + nc : 1 + 2 * nc]
        accout = refs[1 + 2 * nc : 1 + 3 * nc]

        k = curve.consts()
        dt = sgn_ref.shape[0]

        def body(d, acc):
            e = tuple(r[d] for r in ents)
            e = curve.neg_where((sgn_ref[d] != 0)[None], e, k)
            return curve.add(acc, e, k)

        acc = jax.lax.fori_loop(0, dt, body, tuple(r[:] for r in accin))
        for ref, arr in zip(accout, acc):
            ref[:] = arr

    return kernel


def _make_reduce_kernel(curve):
    nc = curve.NC

    def kernel(*refs):
        """(window x bucket) accumulators [L, NW, lanes] -> one point
        [L, lanes] (lanes equal).

        sum_b b * B_b == sum_b suffix(B)_b: Hillis-Steele inclusive suffix
        scan across lanes (shifted-in values replaced by the identity), then
        a butterfly all-reduce over lanes, then Horner over the (MSB-first)
        windows with 8 doublings per step."""
        accs = refs[:nc]
        outs = refs[nc : 2 * nc]
        red = refs[2 * nc : 3 * nc]  # VMEM scratch [L, NW, lanes]

        k = curve.consts()
        nw, lanes = accs[0].shape[1], accs[0].shape[2]

        x = tuple(r[:] for r in accs)
        ident = curve.identity((nw, lanes), k)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, nw, lanes), 2)

        # suffix scan: x[b] <- sum_{j >= b} B_j
        shift = 1
        while shift < lanes:
            rolled = tuple(jnp.roll(a, -shift, axis=2) for a in x)
            valid = lane < (lanes - shift)
            masked = tuple(
                jnp.where(valid, r, i) for r, i in zip(rolled, ident)
            )
            x = curve.add(x, masked, k)
            shift *= 2

        # butterfly all-reduce: every lane <- sum_b suffix_b (= window sum)
        shift = 1
        while shift < lanes:
            x = curve.add(
                x, tuple(jnp.roll(a, shift, axis=2) for a in x), k
            )
            shift *= 2
        for ref, arr in zip(red, x):
            ref[:] = arr

        # Horner over windows: h = h^(2^8) * S_w, MSB window first
        def wbody(w, h):
            h = jax.lax.fori_loop(
                0, WINDOW8, lambda _, a: curve.dbl(a, k), h
            )
            sw = tuple(ref[:, w, :] for ref in red)  # [L, lanes]
            return curve.add(h, sw, k)

        final = jax.lax.fori_loop(0, nw, wbody, curve.identity((lanes,), k))
        for ref, arr in zip(outs, final):
            ref[:] = arr

    return kernel


@functools.lru_cache(maxsize=None)
def _accum_pallas(curve, dt: int, nw: int, lanes: int, interpret: bool):
    nc = curve.NC
    acc_shape = jax.ShapeDtypeStruct((L, nw, lanes), jnp.uint32)
    return pl.pallas_call(
        _make_accum_kernel(curve),
        out_shape=[acc_shape] * nc,
        input_output_aliases={1 + nc + i: i for i in range(nc)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _accum_call(curve, dt: int, nw: int, lanes: int, interpret: bool):
    call = _accum_pallas(curve, dt, nw, lanes, interpret)

    def step(sgn, ents, acc):
        return tuple(call(sgn, *ents, *acc))

    return jax.jit(step, donate_argnums=(2,))


@functools.lru_cache(maxsize=None)
def _gather_step_call(curve, n_ext: int, dt: int, nw: int, lanes: int,
                      interpret: bool):
    """One fused XLA program per (curve, n_ext): gather the step's bucket
    slots from the resident point array and run the accumulate kernel.

    The per-step gather is small ([dt, nw, lanes] indices); a whole-MSM
    prep program (gather + transpose + per-step slicing in one jit) made
    XLA materialize multi-GB padded temporaries and OOMed HBM at 2^14."""
    call = _accum_pallas(curve, dt, nw, lanes, interpret)

    def step(pts_ext, idx, sgn, acc):
        # idx [dt, nw, lanes] int32, identity padding already mapped to
        # n_ext - 1 on the host
        ents = []
        for a in pts_ext:  # [n_ext, L] batch-major
            g = a[idx]  # [dt, nw, lanes, L]
            ents.append(jnp.transpose(g, (0, 3, 1, 2)))  # [dt, L, nw, lanes]
        return tuple(call(sgn, *ents, *acc))

    return jax.jit(step, donate_argnums=(3,))


@functools.lru_cache(maxsize=None)
def _reduce_pallas(curve, nw: int, lanes: int, interpret: bool):
    nc = curve.NC
    out_shape = jax.ShapeDtypeStruct((L, lanes), jnp.uint32)
    return pl.pallas_call(
        _make_reduce_kernel(curve),
        out_shape=[out_shape] * nc,
        scratch_shapes=[pltpu.VMEM((L, nw, lanes), jnp.uint32)] * nc,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _reduce_call(curve, nw: int, lanes: int, interpret: bool):
    call = _reduce_pallas(curve, nw, lanes, interpret)

    def tail(acc):
        final = call(*acc)
        return tuple(a[:, 0] for a in final)

    return jax.jit(tail)


@functools.lru_cache(maxsize=None)
def _acc_init(curve, nw: int, lanes: int):
    def init():
        return curve.identity((nw, lanes), curve.consts())

    return jax.jit(init)


def _step_arrays(perm, sgn, n_ext: int, dt: int):
    """Host-side per-step index/sign tiles: [NW, D, lanes] -> list of
    ([dt, NW, lanes] idx, [dt, NW, lanes] sgn), identity slots -> n_ext-1."""
    idx = np.where(perm < 0, np.int32(n_ext - 1), perm)
    nw, d, lanes = idx.shape
    steps = d // dt
    out = []
    for s in range(steps):
        sl = slice(s * dt, (s + 1) * dt)
        out.append(
            (
                np.ascontiguousarray(idx[:, sl].transpose(1, 0, 2)),
                np.ascontiguousarray(sgn[:, sl].transpose(1, 0, 2)),
            )
        )
    return out


def _msm_bucket_generic(curve, points, scalars, dt: int = 8,
                        interpret: bool | None = None, lanes: int = LANES):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = len(points)
    assert n == len(scalars)
    digits = _scalar_digits_signed8(scalars, curve.order)  # [NW8, n] MSB 1st
    # trim all-zero leading windows; two TPU window counts (4 | 32) so each
    # curve compiles at most two accumulate kernels
    nonzero = np.flatnonzero(digits.any(axis=1))
    windows_needed = NW8 - nonzero[0] if nonzero.size else 1
    if interpret:
        nw = max(1, int(windows_needed))
    else:
        nw = 4 if windows_needed <= 4 else NW8
    digits = digits[NW8 - nw:]

    perm, sgn, d = _bucket_layout(digits, dt, lanes)
    # pad the resident point array to a power of two (+1 identity row) so
    # the fused gather+accumulate program compiles once per pow2 size
    n_ext = (_pow2_pad(n, 1) if not interpret else n) + 1
    pts_ext = curve.encode(
        list(points) + [curve.group_cls.identity] * (n_ext - n)
    )

    step_fn = _gather_step_call(curve, n_ext, dt, nw, lanes, interpret)
    acc = _acc_init(curve, nw, lanes)()
    for idx, sg in _step_arrays(perm, sgn, n_ext, dt):
        acc = step_fn(pts_ext, jnp.asarray(idx), jnp.asarray(sg), acc)
    out = _reduce_call(curve, nw, lanes, interpret)(acc)
    return curve.decode_one(out)


def msm(points, scalars, dt: int = 8, interpret: bool | None = None,
        lanes: int = LANES):
    """prod points[i] ** scalars[i] via the bucket-method kernel (Ed25519)."""
    return _msm_bucket_generic(mp.ED, points, scalars, dt, interpret, lanes)


def register(min_batch: int = 4096, dt: int = 8):
    """Install the bucket MSM for large batches (Ed25519).

    Below ~4k points the windowed kernel's lower fixed cost wins (the bucket
    reduction is ~750 row-adds regardless of n); dispatch keeps the fused
    windowed kernel for mid sizes via its own registration."""
    from ..groups.edwards import EdwardsPoint

    windowed = dispatch._MSM_BACKENDS.get(EdwardsPoint)

    def backend(pts, sc):
        if len(pts) >= min_batch:
            return msm(pts, sc, dt=dt)
        if windowed is not None:
            return windowed[0](pts, sc)
        return dispatch._host_multiexp(pts, sc)

    dispatch.register_msm_backend(
        EdwardsPoint, backend, windowed[1] if windowed else min_batch
    )
