"""Fused Pallas MSM kernels (limb-major, VMEM-resident), curve-generic.

The XLA windowed MSM (ops/msm.py) materializes every Montgomery-multiply
intermediate through HBM; at n=2^14 that is ~GBs of traffic per MSM and the
kernel runs at ~1-2% of VPU peak.  These kernels fuse the whole per-chunk
pipeline — multiple-table build, per-window digit select, and the complete
group additions into the window accumulators — into a single Pallas program
whose working set lives in VMEM.

Layout (see ops/limbs_lm.py): limbs on the leading axis (sublanes), the
(window x point) grid on the trailing axes (lanes).  Every carry step then
operates on a full [W, C] tile, and all limb shifts are static leading-axis
pads — the combination that sidesteps the Mosaic minor-dim concatenate bug
documented in ops/pallas_kernels.py.

Algorithm = 4-bit SIGNED-window MSM (reference hot spots pivot.py:139-145,
compressed_pivot.py:41-42): digits recoded to [-7, 8] so the per-chunk
multiple table is 0..8 (7 adds instead of 14) and the digit-select chain
halves; negation is a cheap coordinate sign flip.  Window multiples
accumulate into persistent [L, W, C] VMEM scratch across the sequential
grid, and the LAST grid step runs the whole tail in-kernel — butterfly lane
reduction by rolls + the windowed Horner ladder — so a single [L, C] point
leaves the kernel (the XLA tail's HBM round trips previously cost ~75% of
wall time).

The group law is pluggable: a curve adapter provides the coordinate count,
complete add/double formulas over limb-major rows, identity, and the signed
negation — Ed25519 (extended Edwards, this module) and BN254 G1
(projective Renes-Costello-Batina, ops/bn_pallas.py) share all the MSM
machinery.
"""

from __future__ import annotations

import collections
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import FiniteFieldElement
from ..groups.edwards import ELL, EdwardsPoint
from . import curve_ed as ced
from . import dispatch
from . import limbs_lm as lm
from .msm import NWINDOWS, WINDOW, _pow2_pad, _scalar_digits

L = 16  # limbs
TABLE = 1 << WINDOW  # 16 multiples per point (unsigned; fold kernel)
TABLE_S = (1 << (WINDOW - 1)) + 1  # 0..8: signed-digit MSM table


def _scalar_digits_signed(scalars, order: int = ELL) -> np.ndarray:
    """[N] ints -> [NWINDOWS, N] int32 signed 4-bit digits in [-7, 8],
    most significant window first.

    Standard signed-window recoding: a large digit borrows 16 from the next
    window, so the multiple table only needs 0..8 (halving both the
    table-build adds and the digit-select chain vs the unsigned 0..15
    table).  Scalars are first balanced to [-order/2, order/2] (s > order/2
    recodes order - s with all digits negated): for a 256-bit order a
    near-order scalar has top-window digit 8, and a borrow carry out of the
    MSB window would otherwise overflow NWINDOWS.

    The borrow threshold is per-column: columns that will be negated borrow
    at d >= 8 (pre-negation digits in [-8, 7]), the rest at d > 8 (digits in
    [-7, 8]).  After negation EVERY digit is in [-7, 8] — exactly the 16
    values an offset-7 nibble holds, which :func:`_pack_digits` relies on.
    (A single d > 8 rule would emit -8 on negated columns; packed as a
    nibble that reads back as +8 and clobbers the paired window.)"""
    reduced = np.array([int(s) % order for s in scalars], dtype=object)
    neg = reduced > order // 2
    balanced = np.where(neg, order - reduced, reduced)
    digs = _scalar_digits(list(balanced), order)[::-1].astype(np.int64)
    thresh = np.where(neg, 8, 9)
    carry = np.zeros(digs.shape[1], np.int64)
    out = np.empty_like(digs)
    for w in range(digs.shape[0]):
        d = digs[w] + carry
        carry = (d >= thresh).astype(np.int64)
        out[w] = d - 16 * carry
    assert not carry.any(), "scalar overflow in signed recoding"
    out[:, neg] = -out[:, neg]
    assert out.min(initial=0) >= -7 and out.max(initial=0) <= 8
    # int8 halves nothing in VMEM (the kernel widens to i32 on device) but
    # quarters the per-MSM host->device digit upload, which is a large part
    # of MSM wall time on the tunnel backend
    return np.ascontiguousarray(out[::-1].astype(np.int8))  # MSB first


@functools.lru_cache(maxsize=None)
def _order_limbs(order: int):
    mask = 0xFFFFFFFFFFFFFFFF
    o = np.array([(order >> (64 * i)) & mask for i in range(4)], np.uint64)
    h = np.array(
        [((order // 2) >> (64 * i)) & mask for i in range(4)], np.uint64
    )
    return o, h


def _digits_signed_from_u64x4(arr: np.ndarray, order: int) -> np.ndarray:
    """[m, 4] u64 canonical residues (< order) -> [64, m] int8 signed
    digits, byte-identical to :func:`_scalar_digits_signed` but fully
    vectorized — the object-int path costs ~1 us/scalar, real time on the
    2^17-scalar protocol rounds.  Dispatches to the C recode
    (native.recode_signed4_arr, ~30x the numpy pass at 2^18) when the
    native tier is loaded; the numpy body below is the fallback and the
    parity oracle (tests/test_msm_pallas.py)."""
    from .. import native

    if len(arr) >= 512 and native.load() is not None:
        return native.recode_signed4_arr(
            np.ascontiguousarray(arr, np.uint64), order
        )
    return _digits_signed_from_u64x4_np(arr, order)


def _digits_signed_from_u64x4_np(arr: np.ndarray, order: int) -> np.ndarray:
    """Pure-numpy body of :func:`_digits_signed_from_u64x4`."""
    o_l, h_l = _order_limbs(order)
    a = np.ascontiguousarray(arr, np.uint64)
    m = a.shape[0]
    neg = np.zeros(m, bool)
    tie = np.ones(m, bool)
    for j in (3, 2, 1, 0):
        gt = a[:, j] > h_l[j]
        lt = a[:, j] < h_l[j]
        neg |= tie & gt
        tie &= ~gt & ~lt
    bal = a.copy()
    if neg.any():
        borrow = np.zeros(m, np.uint64)
        sub = np.empty_like(a)
        for j in range(4):
            aj = a[:, j]
            sub[:, j] = o_l[j] - aj - borrow  # u64 wraparound = 2's comp
            borrow = (
                (aj > o_l[j]) | ((aj == o_l[j]) & (borrow == 1))
            ).astype(np.uint64)
        bal[neg] = sub[neg]
    # int16 throughout: a [64, m] int64 intermediate is 134 MB at the
    # 2^18-scalar commitment MSM — memory traffic, not ALU, bounds this
    digs = np.empty((64, m), np.int16)
    for j in range(4):
        col = bal[:, j]
        for k in range(16):
            digs[16 * j + k] = (
                (col >> np.uint64(4 * k)) & np.uint64(0xF)
            ).astype(np.int16)
    thresh = np.where(neg, np.int16(8), np.int16(9))
    carry = np.zeros(m, np.int16)
    for w in range(64):
        d = digs[w] + carry
        carry = (d >= thresh).astype(np.int16)
        digs[w] = d - 16 * carry
    assert not carry.any(), "scalar overflow in signed recoding"
    digs[:, neg] = -digs[:, neg]
    return np.ascontiguousarray(digs[::-1].astype(np.int8))


def _scalars_to_u64x4_any(scalars, order: int) -> np.ndarray:
    """[n,4] u64 canonical residues from an int/field scalar list, in one
    fused C pass when the leading elements are field elements (type check +
    .value + limb export); [int(s) ...] + bigint walk otherwise."""
    from .. import native

    for s in scalars[:4]:
        ff = type(s)
        if (
            isinstance(s, FiniteFieldElement)
            and getattr(ff, "modulus", 0) == order
        ):
            arr = native.vals_to_arr(scalars, ff, order, int_mode=1)
            if arr is not None:
                return arr
            break
    return native._ints_to_u64x4([int(s) for s in scalars], order)


def _scalar_digits_signed_any(scalars, order: int) -> np.ndarray:
    """Signed digit stream for arbitrary int/field scalars: C bigint ->
    u64x4 conversion + the vectorized recode when the native extension is
    present; the object-int reference path otherwise."""
    from .. import native

    if native.fastser() is not None and order.bit_length() <= 256:
        return _digits_signed_from_u64x4(
            _scalars_to_u64x4_any(scalars, order), order
        )
    return _scalar_digits_signed(scalars, order)


def _digits_packed_any(scalars, order: int):
    """(packed digits [nw/2, n] u8, nw) via the one-pass C recode+pack, or
    None when the native tier is absent (caller runs the numpy path)."""
    from .. import native

    if native.fastser() is None or order.bit_length() > 256:
        return None
    arr = _scalars_to_u64x4_any(scalars, order)
    pk, wn = native.recode_signed4_packed_arr(arr, order)
    nw = 8 if wn <= 8 else NWINDOWS
    return pk[(NWINDOWS - nw) // 2 :], nw


# ---------------------------------------------------------------------------
# Ed25519 curve adapter (extended coordinates, a=-1 unified formulas) in the
# PLAIN pseudo-Mersenne domain: field ops are limbs_lm.*25519 (x38 folding,
# ~2.6x fewer VPU ops per mul than the Montgomery REDC path used for BN254)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _consts():
    from ..groups.edwards import D, P

    return {"two_d": lm.int_to_scalar_limbs(2 * D % P)}


def ed_add_lm(p, q, k):
    """Complete unified Edwards addition (add-2008-hwcd-3) on limb-major
    [L,*B] coordinates, relaxed pseudo-Mersenne domain."""
    mul = lm.mul25519
    add_ = lm.add25519
    sub_ = lm.sub25519

    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    a = mul(sub_(y1, x1), sub_(y2, x2))
    b = mul(add_(y1, x1), add_(y2, x2))
    cc = mul(lm.mul25519_const(t1, k["two_d"]), t2)
    d = mul(add_(z1, z1), z2)
    e = sub_(b, a)
    f = sub_(d, cc)
    g = add_(d, cc)
    h = add_(b, a)
    return (mul(e, f), mul(g, h), mul(f, g), mul(e, h))


def ed_dbl_lm(p, k):
    """Dedicated doubling (dbl-2008-hwcd, a=-1): 4 squares + 4 muls — the
    hot op of the Horner ladders (T1 is not needed)."""
    mul = lm.mul25519
    sq = lm.sq25519

    x1, y1, z1, _ = p
    a = sq(x1)
    b = sq(y1)
    sz = sq(z1)
    c = lm.add25519(sz, sz)
    e = lm.sub25519(lm.sub25519(sq(lm.add25519(x1, y1)), a), b)
    g = lm.sub25519(b, a)  # D + B with D = -A
    f = lm.sub25519(g, c)
    h = lm.neg25519(lm.add25519(a, b))  # D - B
    return (mul(e, f), mul(g, h), mul(f, g), mul(e, h))


def ed_to_pre(p, k):
    """Extended (X, Y, Z, T) -> precomputed form (Y+X, Y-X, 2dT, 2Z).

    Table entries stored this way make every table add one mixed addition
    of 8 muls instead of the 9 + one const-mul of the unified formula (the
    conversion itself is 1 const-mul + 3 cheap adds, paid once per table
    entry instead of once per accumulate)."""
    x, y, z, t = p
    return (
        lm.add25519(y, x),
        lm.sub25519(y, x),
        lm.mul25519_const(t, k["two_d"]),
        lm.add25519(z, z),
    )


def ed_add_pre_lm(p, q_pre, k):
    """Mixed addition extended + precomputed -> extended (8 muls)."""
    mul = lm.mul25519
    x1, y1, z1, t1 = p
    ypx, ymx, t2d, z2 = q_pre
    a = mul(lm.sub25519(y1, x1), ymx)
    b = mul(lm.add25519(y1, x1), ypx)
    cc = mul(t1, t2d)
    d = mul(z1, z2)
    e = lm.sub25519(b, a)
    f = lm.sub25519(d, cc)
    g = lm.add25519(d, cc)
    h = lm.add25519(b, a)
    return (mul(e, f), mul(g, h), mul(f, g), mul(e, h))


class _EdAdapter:
    """Curve plug for the generic MSM/fold machinery below."""

    NC = 4  # X, Y, Z, T
    group_cls = EdwardsPoint
    order = ELL
    name = "ed25519"

    consts = staticmethod(_consts)
    add = staticmethod(ed_add_lm)
    dbl = staticmethod(ed_dbl_lm)

    # optional precomputed-table API (kernels fall back to plain add when a
    # curve adapter does not provide it, e.g. BN254 projective)
    to_pre = staticmethod(ed_to_pre)
    add_pre = staticmethod(ed_add_pre_lm)

    @staticmethod
    def pre_identity(batch_shape, k):
        """Identity (0:1:1:0) in precomputed form: (1, 1, 0, 2)."""
        one = lm.const_rows((1,) + (0,) * (L - 1), batch_shape)
        two = lm.const_rows((2,) + (0,) * (L - 1), batch_shape)
        zero = lm.const_rows((0,) * L, batch_shape)
        return (one, one, zero, two)

    @staticmethod
    def neg_where_pre(mask, q_pre, k):
        """-(ypx, ymx, t2d, z2) = (ymx, ypx, -t2d, z2) where mask."""
        ypx, ymx, t2d, z2 = q_pre
        return (
            jnp.where(mask, ymx, ypx),
            jnp.where(mask, ypx, ymx),
            jnp.where(mask, lm.neg25519(t2d), t2d),
            z2,
        )

    @staticmethod
    def identity(batch_shape, k):
        zero = lm.const_rows((0,) * L, batch_shape)
        one = lm.const_rows((1,) + (0,) * (L - 1), batch_shape)
        return (zero, one, one, zero)

    @staticmethod
    def neg_where(mask, p, k):
        """-(x, y, z, t) = (-x, y, z, -t) where mask (broadcast [1,*B])."""
        x, y, z, t = p
        return (
            jnp.where(mask, lm.neg25519(x), x),
            y,
            z,
            jnp.where(mask, lm.neg25519(t), t),
        )

    # host <-> device (plain residues: no Montgomery conversion either way)
    encode = staticmethod(ced.encode_points_plain)

    @staticmethod
    def normalize_pack(coords_lm):
        """4 x [L, n] relaxed limb-major -> [3, n, L] uint16 canonical
        affine rows (x, y, t; z = 1): batch normalization ON DEVICE.  The
        tunnel downloads at ~28 MB/s (vs 1.3 GB/s up), so shrinking the
        result from 256 relaxed bytes/point to 96 canonical bytes/point
        (and skipping the host reduction) is the dominant saving."""
        x, y, z, _t = coords_lm
        zinv = lm.inv25519(z)
        xc = lm.canon25519(lm.mul25519(x, zinv))
        yc = lm.canon25519(lm.mul25519(y, zinv))
        tc = lm.canon25519(lm.mul25519(xc, yc))
        return jnp.stack([xc, yc, tc]).transpose(0, 2, 1).astype(jnp.uint16)

    @staticmethod
    def decode_normalized(dl: np.ndarray) -> list:
        """[3, n, 16] uint16 canonical (x, y, t) -> EdwardsPoint list via
        the C row constructor (z = 1)."""
        from .. import native

        n = dl.shape[1]
        v = np.ascontiguousarray(dl, np.uint16)
        rows = np.zeros((n, 16), np.uint64)
        rows[:, 0:4] = v[0].view(np.uint64)
        rows[:, 4:8] = v[1].view(np.uint64)
        rows[:, 8] = 1
        rows[:, 12:16] = v[2].view(np.uint64)
        return native._u64_to_pts(rows)

    @staticmethod
    def encode_pre(points):
        """Host-side precomputed form (Y+X, Y-X, 2dT, 2Z) — table entries
        uploaded ready for mixed adds (comb kernel)."""
        from ..groups.edwards import D, P
        from . import limbs as _lb

        two_d = 2 * D % P
        cols = ([], [], [], [])
        for pt in points:
            cols[0].append((pt.y + pt.x) % P)
            cols[1].append((pt.y - pt.x) % P)
            cols[2].append(two_d * pt.t % P)
            cols[3].append(2 * pt.z % P)
        return tuple(jnp.asarray(_lb.ints_to_limbs(v)) for v in cols)

    @staticmethod
    def decode_one(dev):
        return ced.decode_point_plain(dev)

    @staticmethod
    def decode_many(dev):
        return ced.decode_points_plain(dev)


ED = _EdAdapter()


def _identity_lm(batch_shape, k):
    return ED.identity(batch_shape, k)


# ---------------------------------------------------------------------------
# generic fused MSM kernel
# ---------------------------------------------------------------------------


def _make_chunk_kernel(curve):
    nc = curve.NC
    has_pre = hasattr(curve, "add_pre")

    def kernel(*refs):
        """Process SUB sub-chunks of C points into the window accumulators.

        FIXED-shape (no grid): the accumulators stream in and out as aliased
        operands, so one Mosaic compile serves every MSM size — the caller
        loops over chunks on the host.  (A grid-dependent kernel recompiles
        200-450 s per distinct n: each pow2 size in a proof run paid it.)"""
        dig_ref = refs[0]
        pts_refs = refs[1 : 1 + nc]
        accin = refs[1 + nc : 1 + 2 * nc]
        accout = refs[1 + 2 * nc : 1 + 3 * nc]
        tbl = refs[1 + 3 * nc : 1 + 4 * nc]

        k = curve.consts()
        point = tuple(r[:] for r in pts_refs)  # [L, SUB, C]
        sub, chunk = point[0].shape[1], point[0].shape[2]

        # --- multiple tables: tbl[m] = m * P, m = 0..8, for SUB*C points --
        if has_pre:
            # entries stored in precomputed form: every accumulate below is
            # then one mixed add (8 muls) instead of the unified formula's
            # 9 + const-mul; the running multiple stays in extended coords
            # as the fori_loop carry
            for ref, arr in zip(tbl, curve.pre_identity((sub, chunk), k)):
                ref[0] = arr
            pre_p = curve.to_pre(point, k)
            for ref, arr in zip(tbl, pre_p):
                ref[1] = arr

            def tbody(m, cur):
                nxt = curve.add_pre(cur, pre_p, k)
                for ref, arr in zip(tbl, curve.to_pre(nxt, k)):
                    ref[m] = arr
                return nxt

            jax.lax.fori_loop(2, TABLE_S, tbody, point)
        else:
            for ref, arr in zip(tbl, curve.identity((sub, chunk), k)):
                ref[0] = arr
            for ref, arr in zip(tbl, point):
                ref[1] = arr

            def tbody(m, _):
                prev = tuple(ref[m - 1] for ref in tbl)
                nxt = curve.add(prev, point, k)
                for ref, arr in zip(tbl, nxt):
                    ref[m] = arr
                return 0

            jax.lax.fori_loop(2, TABLE_S, tbody, 0)

        # --- window accumulation over the SUB sub-chunks ------------------
        W = dig_ref.shape[0]
        sel_shape = (L, W, chunk)

        def chunk_body(s, acc):
            digs = dig_ref[:, s]  # [W, C] signed digits in [-7, 8]
            mags = jnp.abs(digs)

            def sbody(m, sel):
                mask = (mags == m)[None]  # [1, W, C]
                out = []
                for ref, sv in zip(tbl, sel):
                    # one ref load carrying both dynamic indices (a value-
                    # level dynamic_slice has no Mosaic lowering)
                    e = jnp.broadcast_to(ref[m, :, s][:, None], sel_shape)
                    out.append(jnp.where(mask, e, sv))
                return tuple(out)

            if has_pre:
                sel = jax.lax.fori_loop(
                    1, TABLE_S, sbody, curve.pre_identity((W, chunk), k)
                )
                # signed digit: negate the selected point where digit < 0
                sel = curve.neg_where_pre((digs < 0)[None], sel, k)
                return curve.add_pre(acc, sel, k)
            sel = jax.lax.fori_loop(
                1, TABLE_S, sbody, curve.identity((W, chunk), k)
            )
            sel = curve.neg_where((digs < 0)[None], sel, k)
            return curve.add(acc, sel, k)

        acc = tuple(r[:] for r in accin)
        acc = jax.lax.fori_loop(0, sub, chunk_body, acc)
        for ref, arr in zip(accout, acc):
            ref[:] = arr

    return kernel


def _make_tail_kernel(curve):
    nc = curve.NC

    def kernel(*refs):
        """Window accumulators [L, W, C] -> one point [L, C] (lanes equal):
        butterfly lane reduction by rolls + the windowed Horner ladder.
        In-kernel because the XLA tail's HBM round trips previously cost
        ~75% of MSM wall time."""
        accs = refs[:nc]
        fouts = refs[nc : 2 * nc]
        red = refs[2 * nc : 3 * nc]

        k = curve.consts()
        W, chunk = accs[0].shape[1], accs[0].shape[2]

        # butterfly all-reduce over the C lanes: after log2(C) rounds of
        # add(x, roll(x, 2^j)) every lane holds the full lane-sum
        x = tuple(ref[:] for ref in accs)
        shift = 1
        while shift < chunk:
            rolled = tuple(jnp.roll(a, shift, axis=2) for a in x)
            x = curve.add(x, rolled, k)
            shift *= 2
        for ref, arr in zip(red, x):
            ref[:] = arr

        # Horner over the (MSB-first) windows: acc = acc^16 * S_w
        def wbody(w, h):
            h = jax.lax.fori_loop(0, WINDOW, lambda _, a: curve.dbl(a, k), h)
            sw = tuple(ref[:, w, :] for ref in red)  # [L, C]
            return curve.add(h, sw, k)

        final = jax.lax.fori_loop(0, W, wbody, curve.identity((chunk,), k))
        for ref, arr in zip(fouts, final):
            ref[:] = arr

    return kernel


@functools.lru_cache(maxsize=None)
def _chunk_pallas(curve, chunk: int, sub: int, nwindows: int,
                  interpret: bool):
    """Raw per-chunk pallas_call (also composed under shard_map by
    parallel/mesh.py — keep it jit-free here)."""
    nc = curve.NC
    acc_shape = jax.ShapeDtypeStruct((L, nwindows, chunk), jnp.uint32)
    return pl.pallas_call(
        _make_chunk_kernel(curve),
        out_shape=[acc_shape] * nc,
        scratch_shapes=[pltpu.VMEM((TABLE_S, L, sub, chunk), jnp.uint32)] * nc,
        input_output_aliases={1 + nc + i: i for i in range(nc)},
        compiler_params=pltpu.CompilerParams(
            # the window-accumulation fori_loop carries ~10 live [L, W, C]
            # temporaries; the default 16 MiB scoped-vmem budget OOMs at
            # W=64, C=128 (measured 30 MiB) — raise it (v5e VMEM is 128 MiB)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def _pack_digits(digits_np: np.ndarray) -> np.ndarray:
    """[W, ...] int8 digits in [-7, 8] -> [W/2, ...] uint8, two windows per
    byte (offset-7 nibbles).  Halves the per-MSM host->device digit bytes —
    a large share of MSM wall time on the tunnel backend.  W must be even
    (the TPU path always uses 8 or 64 windows)."""
    assert digits_np.shape[0] % 2 == 0
    lo = int(digits_np.min(initial=0))
    hi = int(digits_np.max(initial=0))
    assert -7 <= lo and hi <= 8, (
        f"digit range [{lo}, {hi}] does not fit the offset-7 nibble; "
        "_scalar_digits_signed guarantees [-7, 8]"
    )
    off = digits_np.astype(np.int16) + 7  # 0..15
    return (off[0::2] | (off[1::2] << 4)).astype(np.uint8)


def _unpack_digits(packed, nwindows: int):
    """Device-side inverse of :func:`_pack_digits` -> int32 [W, ...]."""
    p32 = packed.astype(jnp.int32)
    lo = (p32 & 15) - 7
    hi = (p32 >> 4) - 7
    return jnp.stack([lo, hi], axis=1).reshape((nwindows,) + packed.shape[1:])


@functools.lru_cache(maxsize=None)
def _chunk_call(curve, chunk: int, sub: int, nwindows: int, interpret: bool,
                packed: bool = False):
    call = _chunk_pallas(curve, chunk, sub, nwindows, interpret)

    def step(digits, pts, acc):
        # digits arrive as nibble-packed uint8 (or int8 on the unpacked
        # path); the kernel works on i32 tiles, so unpack/widen on device
        d = (
            _unpack_digits(digits, nwindows)
            if packed
            else digits.astype(jnp.int32)
        )
        return tuple(call(d, *pts, *acc))

    return jax.jit(step, donate_argnums=(2,))


@functools.lru_cache(maxsize=None)
def _tail_pallas(curve, chunk: int, nwindows: int, interpret: bool):
    nc = curve.NC
    out_shape = jax.ShapeDtypeStruct((L, chunk), jnp.uint32)
    return pl.pallas_call(
        _make_tail_kernel(curve),
        out_shape=[out_shape] * nc,
        scratch_shapes=[pltpu.VMEM((L, nwindows, chunk), jnp.uint32)] * nc,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _tail_call(curve, chunk: int, nwindows: int, interpret: bool):
    call = _tail_pallas(curve, chunk, nwindows, interpret)

    def tail(acc):
        final = call(*acc)
        # ONE stacked [nc, L] output: the caller fetches the result with a
        # single host transfer — per-coordinate fetches cost a full tunnel
        # round trip each (~28 ms) and dominated MSM wall time
        return jnp.stack([a[:, 0] for a in final])

    return jax.jit(tail)


@functools.lru_cache(maxsize=None)
def _acc_init(curve, chunk: int, nwindows: int):
    def init():
        k = curve.consts()
        return curve.identity((nwindows, chunk), k)

    return jax.jit(init)


@functools.lru_cache(maxsize=None)
def _prep_call(curve, n: int, chunk: int, sub: int, dig_rows: int):
    nc = curve.NC
    steps = n // (chunk * sub)

    def prep(points_bm, digits):
        # [n, L] batch-major -> steps x (nc x [L, SUB, C]) limb-major
        lmaj = [
            jnp.transpose(a, (1, 0)).reshape(L, steps, sub, chunk)
            for a in points_bm
        ]
        pts = [
            tuple(a[:, i] for a in lmaj) for i in range(steps)
        ]
        digits = digits.reshape(dig_rows, steps, sub, chunk)
        digs = [digits[:, i] for i in range(steps)]
        return pts, digs

    return jax.jit(prep)


@functools.lru_cache(maxsize=None)
def _build_for(curve, n: int, chunk: int, sub: int, nwindows: int,
               interpret: bool, packed: bool = False):
    assert n % (chunk * sub) == 0
    steps = n // (chunk * sub)
    dig_rows = nwindows // 2 if packed else nwindows
    step_fn = _chunk_call(curve, chunk, sub, nwindows, interpret, packed)
    tail_fn = _tail_call(curve, chunk, nwindows, interpret)
    prep_fn = _prep_call(curve, n, chunk, sub, dig_rows)
    init_fn = _acc_init(curve, chunk, nwindows)

    def run(points_bm, digits):
        pts, digs = prep_fn(points_bm, digits)
        acc = init_fn()
        for i in range(steps):
            acc = step_fn(digs[i], pts[i], acc)
        return tail_fn(acc)

    return run


def _build(n, chunk, sub, nwindows, interpret):
    """Ed25519 entry (kept for bench/probe compatibility)."""
    return _build_for(ED, n, chunk, sub, nwindows, interpret)


@functools.lru_cache(maxsize=None)
def _build_for_fused(curve, n: int, chunk: int, sub: int, nwindows: int,
                     interpret: bool, packed: bool = False):
    """Whole-MSM pipeline under ONE jit: prep + every chunk step + tail.

    The per-step host loop of :func:`_build_for` pays one tunnel dispatch
    per chunk (~15 ms each — 1.9 s for a 2^18-point MSM); the Mosaic
    kernel is still compiled once per (chunk, sub, nw) shape, the outer
    XLA graph (64 custom-calls) is a cheap per-size compile."""
    assert n % (chunk * sub) == 0
    steps = n // (chunk * sub)
    call = _chunk_pallas(curve, chunk, sub, nwindows, interpret)
    tail_call = _tail_pallas(curve, chunk, nwindows, interpret)
    nc = curve.NC

    def run(points_bm, digits):
        lmaj = [
            jnp.transpose(
                jnp.transpose(a, (1, 0)).reshape(L, steps, sub, chunk),
                (1, 0, 2, 3),
            )
            for a in points_bm
        ]  # [steps, L, sub, chunk]
        d = (
            _unpack_digits(digits, nwindows)
            if packed
            else digits.astype(jnp.int32)
        )
        d = jnp.transpose(
            d.reshape(nwindows, steps, sub, chunk), (1, 0, 2, 3)
        )
        k = curve.consts()
        acc0 = curve.identity((nwindows, chunk), k)

        # lax.scan: the chunk body traces ONCE — the unrolled host loop
        # traced `steps` pallas calls, minutes of per-process tracing at
        # 2^18 sizes
        def body(acc, xs):
            return tuple(call(xs[0], *xs[1:], *acc)), 0

        acc, _ = jax.lax.scan(body, acc0, (d, *lmaj))
        fin = tail_call(*acc)
        return jnp.stack([a[:, 0] for a in fin])

    return jax.jit(run)


_ED_ENC_CACHE = collections.OrderedDict()
_ED_ENC_CACHE_MAX = 4


def ed_encode_cached(points):
    """(host [n,16] u64 rows, device 4 x [n,L] u32 coords) for an Ed25519
    point list, LRU-cached by element identity.

    One AC20 prove walks the SAME generator vector three times — the
    z-commitment MSM (circuit_sat_cb.py:100), protocol 5's A commitment
    (compressed_pivot.py:282) and the resident engine's device upload
    (pivot_tpu.py) — and production CRS vectors are reused across proves;
    each walk previously paid a full host re-encode + upload.  The value
    holds a reference to the point list, so the id-tuple key cannot alias
    a dead object.  Requires the native converter (caller falls back to
    ``curve.encode`` without it)."""
    from .. import native

    key = tuple(map(id, points))
    hit = _ED_ENC_CACHE.get(key)
    if hit is not None:
        _ED_ENC_CACHE.move_to_end(key)
        return hit[0], hit[1]
    rows = native._pts_to_u64(list(points))
    u16 = rows.view(np.uint16)  # [n, 64] little-endian: 16 limbs per coord
    dev = tuple(
        jnp.asarray(u16[:, 16 * j : 16 * (j + 1)].astype(np.uint32))
        for j in range(4)
    )
    _ED_ENC_CACHE[key] = (rows, dev, list(points))
    while len(_ED_ENC_CACHE) > _ED_ENC_CACHE_MAX:
        _ED_ENC_CACHE.popitem(last=False)
    return rows, dev


def _msm_generic(curve, points, scalars, chunk, sub, interpret, lazy=False):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = len(points)
    assert n == len(scalars)
    if sub is None:
        # two tile shapes only (each is its own Mosaic compile): the wide
        # tile amortizes launch overhead once the batch fills it
        sub = 32 if n >= 32 * chunk else 8
    # pad up to a single (chunk, sub) kernel shape: each distinct shape is a
    # separate Mosaic compile (~minutes on the TPU tunnel), and identity
    # padding costs at most one extra grid step
    target = max(chunk * sub, _pow2_pad(n, 1))
    pad = target - n
    if pad:
        points = list(points) + [curve.group_cls.identity] * pad
        scalars = list(scalars) + [0] * pad
    from .. import native

    if curve is ED and not pad and n >= 4096 and native.fastser() is not None:
        dev_pts = ed_encode_cached(points)[1]
    else:
        dev_pts = curve.encode(points)
    fast = None if interpret else _digits_packed_any(scalars, curve.order)
    if fast is not None:
        pk, nw = fast
        packed = True
        digits = jnp.asarray(pk)
    else:
        digits_np = _scalar_digits_signed_any(scalars, curve.order)  # [W, n]
        # trim all-zero leading windows (rounded to a sublane multiple of
        # 8): full-size scalars keep all 64, but short exponents (tests,
        # small bit-length batches) shrink the whole [L, W, C] working set
        nonzero = np.flatnonzero(digits_np.any(axis=1))
        windows_needed = NWINDOWS - nonzero[0] if nonzero.size else 1
        if interpret:  # exact trim keeps interpret-mode tests fast
            nw = max(1, int(windows_needed))
        else:  # two window counts only (8 | 64): own Mosaic compile each
            nw = 8 if windows_needed <= 8 else NWINDOWS
        trimmed = digits_np[NWINDOWS - nw:]
        packed = not interpret and nw % 2 == 0  # halves the digit upload
        digits = jnp.asarray(_pack_digits(trimmed) if packed else trimmed)
    out = _build_for_fused(curve, target, chunk, sub, nw, interpret, packed)(
        tuple(dev_pts), digits
    )
    if lazy:
        try:
            out.copy_to_host_async()
        except Exception:
            pass
        return lambda: curve.decode_one(tuple(np.asarray(out)))
    return curve.decode_one(tuple(np.asarray(out)))  # one [nc, L] transfer


def msm(points, scalars, chunk: int = 128, sub: int | None = None,
        interpret: bool | None = None):
    """prod points[i] ** scalars[i] via the fused Pallas kernel (Ed25519)."""
    return _msm_generic(ED, points, scalars, chunk, sub, interpret)


def msm_async(points, scalars, chunk: int = 128, sub: int | None = None):
    """Launch an Ed25519 MSM; returns a zero-arg thunk yielding the point —
    kernel compute and the result transfer overlap host work done before
    the thunk runs (dispatch.multiexp_async backend)."""
    return _msm_generic(ED, points, scalars, chunk, sub, False, lazy=True)


# ---------------------------------------------------------------------------
# generic shared-scalar fold kernel (protocol-4 generator fold)
# ---------------------------------------------------------------------------


def _make_fold_kernel(curve):
    nc = curve.NC
    has_pre = hasattr(curve, "add_pre")

    def kernel(*refs):
        """g_l^c * g_r with a scalar c shared across all lanes
        (reference compressed_pivot.py:64).

        Per chunk: build the 0..15 multiple table of g_l (14 adds over full
        [SUB, C] tiles), then Horner over c's 4-bit windows — 4 dedicated
        doublings plus one table add per window, digits read from SMEM."""
        dig_ref = refs[0]
        l_refs = refs[1 : 1 + nc]
        r_refs = refs[1 + nc : 1 + 2 * nc]
        outs = refs[1 + 2 * nc : 1 + 3 * nc]
        tbl = refs[1 + 3 * nc : 1 + 4 * nc]

        k = curve.consts()
        gl = tuple(r[:] for r in l_refs)  # [L, SUB, C]
        sub, chunk = gl[0].shape[1], gl[0].shape[2]

        if has_pre:
            # precomputed-form table: each Horner table add is one mixed
            # add (8 muls) instead of 9 + const-mul — see _make_chunk_kernel
            for ref, arr in zip(tbl, curve.pre_identity((sub, chunk), k)):
                ref[0] = arr
            pre_gl = curve.to_pre(gl, k)
            for ref, arr in zip(tbl, pre_gl):
                ref[1] = arr

            def tbody(m, cur):
                nxt = curve.add_pre(cur, pre_gl, k)
                for ref, arr in zip(tbl, curve.to_pre(nxt, k)):
                    ref[m] = arr
                return nxt

            jax.lax.fori_loop(2, TABLE, tbody, gl)
        else:
            for ref, arr in zip(tbl, curve.identity((sub, chunk), k)):
                ref[0] = arr
            for ref, arr in zip(tbl, gl):
                ref[1] = arr

            def tbody(m, _):
                prev = tuple(ref[m - 1] for ref in tbl)
                nxt = curve.add(prev, gl, k)
                for ref, arr in zip(tbl, nxt):
                    ref[m] = arr
                return 0

            jax.lax.fori_loop(2, TABLE, tbody, 0)

        nw = dig_ref.shape[0]

        def wbody(w, acc):
            acc = jax.lax.fori_loop(
                0, WINDOW, lambda _, a: curve.dbl(a, k), acc
            )
            d = dig_ref[w, 0]
            entry = tuple(ref[d] for ref in tbl)
            if has_pre:
                return curve.add_pre(acc, entry, k)
            return curve.add(acc, entry, k)

        acc = jax.lax.fori_loop(0, nw, wbody, curve.identity((sub, chunk), k))
        res = curve.add(acc, tuple(r[:] for r in r_refs), k)
        for ref, arr in zip(outs, res):
            ref[:] = arr

    return kernel


@functools.lru_cache(maxsize=None)
def _fold_pallas(curve, chunk: int, sub: int, nw: int, interpret: bool):
    """Raw fold pallas_call (FIXED shape: one Mosaic compile serves every
    fold size; also composed under shard_map by parallel/mesh.py)."""
    nc = curve.NC
    pt_shape = jax.ShapeDtypeStruct((L, sub, chunk), jnp.uint32)
    return pl.pallas_call(
        _make_fold_kernel(curve),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * nc),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * nc,
        out_shape=[pt_shape] * nc,
        scratch_shapes=[pltpu.VMEM((TABLE, L, sub, chunk), jnp.uint32)] * nc,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _fold_chunk_call(curve, chunk: int, sub: int, nw: int, interpret: bool):
    call = _fold_pallas(curve, chunk, sub, nw, interpret)

    def step(digits, gl, gr):
        return tuple(call(digits, *gl, *gr))

    return jax.jit(step)


@functools.lru_cache(maxsize=None)
def _fold_prep_call(curve, n: int, chunk: int, sub: int):
    steps = n // (chunk * sub)

    def prep(gl_bm, gr_bm):
        lmaj = [
            jnp.transpose(a, (1, 0)).reshape(L, steps, sub, chunk)
            for a in gl_bm + gr_bm
        ]
        per_step = [tuple(a[:, i] for a in lmaj) for i in range(steps)]
        return per_step

    return jax.jit(prep)


@functools.lru_cache(maxsize=None)
def _fold_finish_call(curve, n: int, chunk: int, sub: int):
    """Stack the per-step outputs into ONE [nc, n, L] device array: a single
    host transfer instead of nc*steps small ones (each synchronous pull
    costs a full tunnel round trip and dominated fold wall time)."""
    nc = curve.NC

    def finish(outs):
        coords = [
            jnp.concatenate(
                [o[c].reshape(L, sub * chunk) for o in outs], axis=1
            ).T  # [n, L] batch-major
            for c in range(nc)
        ]
        return jnp.stack(coords)

    return jax.jit(finish)


@functools.lru_cache(maxsize=None)
def _build_fold_for(curve, n: int, chunk: int, sub: int, nw: int,
                    interpret: bool):
    assert n % (chunk * sub) == 0
    nc = curve.NC
    steps = n // (chunk * sub)
    step_fn = _fold_chunk_call(curve, chunk, sub, nw, interpret)
    prep_fn = _fold_prep_call(curve, n, chunk, sub)
    finish_fn = _fold_finish_call(curve, n, chunk, sub)

    def run(gl_bm, gr_bm, digits):
        per_step = prep_fn(tuple(gl_bm), tuple(gr_bm))
        outs = []
        for both in per_step:
            gl, gr = both[:nc], both[nc:]
            outs.append(step_fn(digits, gl, gr))
        stacked = np.asarray(finish_fn(outs))  # [nc, n, L], one transfer
        return tuple(stacked)

    return run


def _build_fold(n, chunk, sub, nw, interpret):
    return _build_fold_for(ED, n, chunk, sub, nw, interpret)


def _fold_generic(curve, g_l, g_r, c, chunk, sub, interpret):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = len(g_l)
    assert n == len(g_r)
    # single (chunk, sub) kernel shape — see _msm_generic
    target = max(chunk * sub, _pow2_pad(n, 1))
    pad = target - n
    if pad:
        g_l = list(g_l) + [curve.group_cls.identity] * pad
        g_r = list(g_r) + [curve.group_cls.identity] * pad
    dev_l = curve.encode(g_l)
    dev_r = curve.encode(g_r)
    c = int(c)
    digits_np = _scalar_digits([c], curve.order)[:, 0]  # [NWINDOWS] MSB first
    c = c % curve.order
    if interpret:  # trimmed windows keep interpret-mode tests fast
        nw = max(1, -(-max(1, c.bit_length()) // WINDOW))
    else:  # fixed window count = one Mosaic compile for every challenge
        nw = NWINDOWS
    digits = jnp.asarray(
        digits_np[NWINDOWS - nw:].reshape(nw, 1).astype(np.int32)
    )
    out = _build_fold_for(curve, target, chunk, sub, nw, interpret)(
        dev_l, dev_r, digits
    )
    return curve.decode_many(out)[:n]


def fold(g_l, g_r, c: int, chunk: int = 128, sub: int = 8,
         interpret: bool | None = None) -> list:
    """[g_l[i]**c * g_r[i]] via the fused Pallas kernel (Ed25519)."""
    return _fold_generic(ED, g_l, g_r, c, chunk, sub, interpret)


# ---------------------------------------------------------------------------
# generic fixed-base batch-exponentiation kernel (generator/CRS setup,
# reference circuit_sat_r1cs.py:47-93, knowledge_of_exponent.py:50-72,
# pynocchio.py:101-200)
# ---------------------------------------------------------------------------


def _make_bexp_kernel(curve):
    nc = curve.NC
    has_pre = hasattr(curve, "add_pre")

    def kernel(*refs):
        """base ** e_i with PER-LANE exponents and a SHARED base: the 0..8
        multiple table is precomputed on host (9 points), so the kernel is
        just the signed-window Horner ladder — 4 doublings + one broadcast
        select + one addition per window, all lanes in parallel."""
        dig_ref = refs[0]  # [W, SUB, C] signed digits in [-7, 8]
        tbl = refs[1 : 1 + nc]  # nc x [TABLE_S, L, C]
        outs = refs[1 + nc : 1 + 2 * nc]

        k = curve.consts()
        nw = dig_ref.shape[0]
        sub, chunk = dig_ref.shape[1], dig_ref.shape[2]
        shape = (L, sub, chunk)

        if has_pre:
            # convert the host table to precomputed form ONCE into scratch
            # (selects must read refs: value-level dynamic indexing has no
            # Mosaic lowering) — each window add is then a mixed 8-mul add
            pre_tbl = refs[1 + 2 * nc : 1 + 3 * nc]
            for m in range(TABLE_S):
                entry = tuple(ref[m] for ref in tbl)
                for ref, arr in zip(pre_tbl, curve.to_pre(entry, k)):
                    ref[m] = arr
            sel_tbl = pre_tbl
        else:
            sel_tbl = tbl

        def wbody(w, acc):
            acc = jax.lax.fori_loop(
                0, WINDOW, lambda _, a: curve.dbl(a, k), acc
            )
            digs = dig_ref[w]  # [SUB, C]
            mags = jnp.abs(digs)

            def sbody(m, sel):
                mask = (mags == m)[None]  # [1, SUB, C]
                out = []
                for ref, sv in zip(sel_tbl, sel):
                    e = jnp.broadcast_to(ref[m][:, None, :], shape)
                    out.append(jnp.where(mask, e, sv))
                return tuple(out)

            if has_pre:
                sel = jax.lax.fori_loop(
                    1, TABLE_S, sbody, curve.pre_identity((sub, chunk), k)
                )
                sel = curve.neg_where_pre((digs < 0)[None], sel, k)
                return curve.add_pre(acc, sel, k)
            sel = jax.lax.fori_loop(
                1, TABLE_S, sbody, curve.identity((sub, chunk), k)
            )
            sel = curve.neg_where((digs < 0)[None], sel, k)
            return curve.add(acc, sel, k)

        acc = jax.lax.fori_loop(0, nw, wbody, curve.identity((sub, chunk), k))
        for ref, arr in zip(outs, acc):
            ref[:] = arr

    return kernel


@functools.lru_cache(maxsize=None)
def _bexp_pallas(curve, chunk: int, sub: int, nw: int, interpret: bool):
    nc = curve.NC
    pt_shape = jax.ShapeDtypeStruct((L, sub, chunk), jnp.uint32)
    scratch = (
        [pltpu.VMEM((TABLE_S, L, chunk), jnp.uint32)] * nc
        if hasattr(curve, "add_pre")
        else []
    )
    return pl.pallas_call(
        _make_bexp_kernel(curve),
        out_shape=[pt_shape] * nc,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _bexp_chunk_call(curve, chunk: int, sub: int, nw: int, interpret: bool,
                     packed: bool = False):
    call = _bexp_pallas(curve, chunk, sub, nw, interpret)

    def step(digits, tbl):
        d = _unpack_digits(digits, nw) if packed else digits.astype(jnp.int32)
        return tuple(call(d, *tbl))

    return jax.jit(step)


@functools.lru_cache(maxsize=None)
def _bexp_finish_call(curve, steps: int, chunk: int, sub: int):
    nc = curve.NC

    def finish(outs):
        coords = [
            jnp.concatenate(
                [o[c].reshape(L, sub * chunk) for o in outs], axis=1
            ).T
            for c in range(nc)
        ]
        return jnp.stack(coords)  # [nc, n, L]

    return jax.jit(finish)


def _batch_exp_generic(curve, base, exponents, chunk, sub, interpret):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = len(exponents)
    target = max(chunk * sub, _pow2_pad(n, 1))
    exps = [int(e) % curve.order for e in exponents] + [0] * (target - n)
    steps = target // (chunk * sub)

    # host-side table: 0..8 multiples of the shared base, lane-broadcast
    multiples = [base ** m for m in range(TABLE_S)]
    enc = curve.encode(multiples)  # nc x [TABLE_S, L] batch-major
    tbl = tuple(
        jnp.broadcast_to(jnp.asarray(a)[:, :, None], (TABLE_S, L, chunk))
        for a in enc
    )

    digits_np = _scalar_digits_signed_any(exps, curve.order)  # [W, target]
    nonzero = np.flatnonzero(digits_np.any(axis=1))
    windows_needed = NWINDOWS - nonzero[0] if nonzero.size else 1
    if interpret:  # exact trim keeps interpret-mode tests fast
        nw = max(1, int(windows_needed))
    else:
        nw = 8 if windows_needed <= 8 else NWINDOWS
    trimmed = digits_np[NWINDOWS - nw:]
    packed = not interpret and nw % 2 == 0  # halves the digit upload
    if packed:
        trimmed = _pack_digits(trimmed)
    digits = jnp.asarray(trimmed.reshape(-1, steps, sub, chunk))

    step_fn = _bexp_chunk_call(curve, chunk, sub, nw, interpret, packed)
    outs = [step_fn(digits[:, i], tbl) for i in range(steps)]
    stacked = np.asarray(
        _bexp_finish_call(curve, steps, chunk, sub)(outs)
    )
    return curve.decode_many(tuple(stacked))[:n]


def batch_exp(base, exponents, chunk: int = 128, sub: int = 8,
              interpret: bool | None = None) -> list:
    """[base ** e for e in exponents] via the fused Pallas kernel (Ed25519)."""
    return _batch_exp_generic(ED, base, exponents, chunk, sub, interpret)


# ---------------------------------------------------------------------------
# fixed-base COMB batch exponentiation: per-window precomputed tables kill
# the doubling ladder entirely.
#
# The Horner kernel above pays 4 dedicated doublings per window per lane —
# ~7/8 of its group work.  With a FIXED base the per-window multiples
# base^(16^w * d) (w < 64, |d| <= 8) are a one-time HOST precomputation
# (~512 group ops, cached per base), and the kernel is just
#     out_i = prod_w  T[w][digit_w(e_i)]
# — one table-select plus one mixed add per window, no doublings: ~4x less
# device work per exponent.  This is the hot path of generator/CRS setup
# (reference circuit_sat_r1cs.py:47-93, knowledge_of_exponent.py:50-72)
# and Pinocchio key generation (pynocchio.py:101-200).
# ---------------------------------------------------------------------------


def _make_bexp_comb_kernel(curve):
    nc = curve.NC
    has_pre = hasattr(curve, "add_pre")

    def kernel(*refs):
        """Signed-window comb: digits [W, SUB, C] select from the per-window
        host table [W * TABLE_S, L] (lane-broadcast), one add per window."""
        dig_ref = refs[0]
        tbl = refs[1 : 1 + nc]
        outs = refs[1 + nc : 1 + 2 * nc]

        k = curve.consts()
        nw = dig_ref.shape[0]
        sub, chunk = dig_ref.shape[1], dig_ref.shape[2]
        shape = (L, sub, chunk)

        def wbody(w, acc):
            digs = dig_ref[w]  # [SUB, C] in [-7, 8]
            mags = jnp.abs(digs)

            def sbody(m, sel):
                mask = (mags == m)[None]
                out = []
                for ref, sv in zip(tbl, sel):
                    # one load carrying the dynamic w*TABLE_S + m index;
                    # the table is stored lane-broadcast ([.., L, C]) so
                    # the minor dim stays the 128-lane axis (a [L] ->
                    # [L, 1, 1] shape cast has no Mosaic lowering)
                    e = jnp.broadcast_to(
                        ref[w * TABLE_S + m][:, None, :], shape
                    )
                    out.append(jnp.where(mask, e, sv))
                return tuple(out)

            if has_pre:
                sel = jax.lax.fori_loop(
                    1, TABLE_S, sbody, curve.pre_identity((sub, chunk), k)
                )
                sel = curve.neg_where_pre((digs < 0)[None], sel, k)
                return curve.add_pre(acc, sel, k)
            sel = jax.lax.fori_loop(
                1, TABLE_S, sbody, curve.identity((sub, chunk), k)
            )
            sel = curve.neg_where((digs < 0)[None], sel, k)
            return curve.add(acc, sel, k)

        acc = jax.lax.fori_loop(0, nw, wbody, curve.identity((sub, chunk), k))
        for ref, arr in zip(outs, acc):
            ref[:] = arr

    return kernel


@functools.lru_cache(maxsize=None)
def _bexp_comb_pallas(curve, chunk: int, sub: int, nw: int, interpret: bool):
    nc = curve.NC
    pt_shape = jax.ShapeDtypeStruct((L, sub, chunk), jnp.uint32)
    return pl.pallas_call(
        _make_bexp_comb_kernel(curve),
        out_shape=[pt_shape] * nc,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


_COMB_TABLES = {}  # (curve.name, nw, point-key) -> device table


def _comb_point_key(curve, base):
    b = base.normalize() if hasattr(base, "normalize") else base
    return (curve.name, repr(b))


def _comb_table_build(curve, base, nw: int):
    """Host table build for :func:`comb_table`: rows MSB-first, row w
    holding d * (16^(nw-1-w) * base) for d = 0..8, uploaded once in
    precomputed form when the curve supports mixed adds (~nw * 8 host
    group ops, cached per base — CRS/keygen flows batch-exponentiate the
    SAME group generator)."""
    ident = curve.group_cls.identity
    rows = []
    base_w = base
    for _ in range(nw):
        row = [ident, base_w]
        for _m in range(2, TABLE_S):
            row.append(row[-1] * base_w)
        rows.append(row)
        eight = row[TABLE_S - 1]  # 8 * base_w
        base_w = eight * eight  # 16 * base_w
    rows.reverse()  # MSB-first to match the trimmed digit stream
    flat = [pt for row in rows for pt in row]
    if hasattr(curve, "encode_pre"):
        enc = curve.encode_pre(flat)
    else:
        enc = curve.encode(flat)
    return tuple(jnp.asarray(a) for a in enc)


def comb_table(curve, base, nw: int):
    key = _comb_point_key(curve, base) + (nw,)
    hit = _COMB_TABLES.get(key)
    if hit is None:
        hit = _COMB_TABLES[key] = _comb_table_build(curve, base, nw)
    return hit


@functools.lru_cache(maxsize=None)
def _bexp_comb_fused(curve, steps: int, chunk: int, sub: int, nw: int,
                     interpret: bool, packed: bool):
    """Whole comb batch-exp under ONE jit (all steps + normalize/finish):
    one tunnel dispatch instead of `steps` (see _build_for_fused)."""
    call = _bexp_comb_pallas(curve, chunk, sub, nw, interpret)
    rows = nw * TABLE_S
    nc = curve.NC
    normalize = hasattr(curve, "normalize_pack")

    def run(digits, tbl):
        tb = tuple(
            jnp.broadcast_to(a[:, :, None], (rows, L, chunk)) for a in tbl
        )
        dsteps = jnp.swapaxes(digits, 0, 1)  # [steps, rows, sub, chunk]

        def body(_, d_i):
            d = (
                _unpack_digits(d_i, nw)
                if packed
                else d_i.astype(jnp.int32)
            )
            return 0, tuple(call(d, *tb))

        _, outs = jax.lax.scan(body, 0, dsteps)  # [steps, L, sub, chunk] x nc
        coords = [
            jnp.transpose(o, (1, 0, 2, 3)).reshape(L, steps * sub * chunk)
            for o in outs
        ]
        if normalize:
            return curve.normalize_pack(coords)
        return jnp.stack([jnp.transpose(a, (1, 0)) for a in coords])

    return jax.jit(run)


def _batch_exp_comb_generic(curve, base, exponents, chunk, sub, interpret):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = len(exponents)
    target = max(chunk * sub, _pow2_pad(n, 1))
    exps = [int(e) % curve.order for e in exponents] + [0] * (target - n)
    steps = target // (chunk * sub)

    digits_np = _scalar_digits_signed_any(exps, curve.order)  # [W, target]
    nonzero = np.flatnonzero(digits_np.any(axis=1))
    windows_needed = NWINDOWS - nonzero[0] if nonzero.size else 1
    if interpret:  # exact trim keeps interpret-mode tests fast
        nw = max(1, int(windows_needed))
    else:
        nw = 8 if windows_needed <= 8 else NWINDOWS
    trimmed = digits_np[NWINDOWS - nw:]
    packed = not interpret and nw % 2 == 0
    if packed:
        trimmed = _pack_digits(trimmed)
    digits = jnp.asarray(trimmed.reshape(-1, steps, sub, chunk))

    tbl = comb_table(curve, base, nw)
    out = np.asarray(
        _bexp_comb_fused(curve, steps, chunk, sub, nw, interpret, packed)(
            digits, tbl
        )
    )
    if hasattr(curve, "normalize_pack"):
        return curve.decode_normalized(out)[:n]
    return curve.decode_many(tuple(out))[:n]


def batch_exp_comb(base, exponents, chunk: int = 128, sub: int = 8,
                   interpret: bool | None = None) -> list:
    """[base ** e] via the fixed-base comb kernel (Ed25519)."""
    return _batch_exp_comb_generic(ED, base, exponents, chunk, sub, interpret)


REGISTERED = False  # set once register() installed the TPU backends


def register(min_batch: int = 512, chunk: int = 128):
    """Install the fused kernels as the Ed25519 dispatch backends."""
    global REGISTERED
    REGISTERED = True
    dispatch.register_msm_backend(
        EdwardsPoint, lambda pts, sc: msm(pts, sc, chunk=chunk), min_batch
    )
    dispatch.register_msm_async_backend(
        EdwardsPoint, lambda pts, sc: msm_async(pts, sc, chunk=chunk),
        min_batch,
    )
    dispatch.register_fold_backend(
        EdwardsPoint, lambda gl, gr, c: fold(gl, gr, c, chunk=chunk), min_batch
    )
    dispatch.register_batch_exp_backend(
        EdwardsPoint, lambda b, e: batch_exp_comb(b, e, chunk=chunk), min_batch
    )
