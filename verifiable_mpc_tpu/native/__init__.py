"""Native host tier: build (g++) and load the C++ Ed25519 library via ctypes.

The reference is pure Python (SURVEY.md preamble); this component is the
framework's own addition: a speed-of-light host path for the group
primitives, used by the dispatch layer for host-side MSM/fold/batch-exp
(e.g. when proving on CPU-only machines, or for the small per-round
commitments where kernel launch overhead dominates).

Build happens on demand with the system toolchain and is cached next to the
sources; everything degrades gracefully to the pure-Python path if no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SRCS = [
    os.path.join(_HERE, "ed25519.cc"),
    os.path.join(_HERE, "bn256.cc"),
    os.path.join(_HERE, "ntt.cc"),
]
_SO = os.path.join(_HERE, "_vmpc_native.so")

_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-fopenmp",
        "-shared",
        "-fPIC",
        "-o",
        _SO,
    ] + _SRCS
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def load():
    """Return the ctypes library handle, building if needed; None if
    unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src_mtime = max(os.path.getmtime(s) for s in _SRCS)
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.vmpc_ed_msm.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
    lib.vmpc_ed_batch_exp.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
    lib.vmpc_ed_fold.argtypes = [u64p, u64p, u64p, ctypes.c_uint64, u64p]
    lib.vmpc_ed_add.argtypes = [u64p, u64p, u64p]
    lib.vmpc_ed_scalar_mul.argtypes = [u64p, u64p, u64p]
    lib.vmpc_bn_msm.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
    lib.vmpc_bn_batch_exp.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
    lib.vmpc_bn_scalar_mul.argtypes = [u64p, u64p, u64p]
    lib.vmpc_bn2_msm.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
    lib.vmpc_bn2_batch_exp.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
    lib.vmpc_ntt_poly_mul.argtypes = [
        u64p,
        ctypes.c_uint64,
        u64p,
        ctypes.c_uint64,
        u64p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------


def _pts_to_u64(points) -> np.ndarray:
    n = len(points)
    out = np.empty((n, 16), dtype=np.uint64)
    mask = (1 << 64) - 1
    for i, p in enumerate(points):
        for j, c in enumerate((p.x, p.y, p.z, p.t)):
            out[i, 4 * j + 0] = c & mask
            out[i, 4 * j + 1] = (c >> 64) & mask
            out[i, 4 * j + 2] = (c >> 128) & mask
            out[i, 4 * j + 3] = (c >> 192) & mask
    return out


def _u64_to_pts(arr) -> list:
    from ..groups.edwards import EdwardsPoint

    out = []
    for row in arr:
        coords = []
        for j in range(4):
            v = 0
            for k in range(3, -1, -1):
                v = (v << 64) | int(row[4 * j + k])
            coords.append(v)
        out.append(EdwardsPoint(*coords))
    return out


def _scalars_to_u64(scalars, order) -> np.ndarray:
    n = len(scalars)
    out = np.empty((n, 4), dtype=np.uint64)
    mask = (1 << 64) - 1
    for i, s in enumerate(scalars):
        s = int(s) % order
        out[i, 0] = s & mask
        out[i, 1] = (s >> 64) & mask
        out[i, 2] = (s >> 128) & mask
        out[i, 3] = (s >> 192) & mask
    return out


def _u64p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


# ---------------------------------------------------------------------------
# high-level ops
# ---------------------------------------------------------------------------


def ed_msm(points, scalars):
    from ..groups.edwards import ELL

    lib = load()
    pts = _pts_to_u64(points)
    sc = _scalars_to_u64(scalars, ELL)
    out = np.zeros(16, dtype=np.uint64)
    lib.vmpc_ed_msm(_u64p(pts), _u64p(sc), len(points), _u64p(out))
    return _u64_to_pts(out[None])[0]


def ed_batch_exp(base, exponents):
    from ..groups.edwards import ELL

    lib = load()
    b = _pts_to_u64([base])
    ex = _scalars_to_u64(exponents, ELL)
    out = np.zeros((len(exponents), 16), dtype=np.uint64)
    lib.vmpc_ed_batch_exp(_u64p(b), _u64p(ex), len(exponents), _u64p(out))
    return _u64_to_pts(out)


def ed_fold(g_l, g_r, c):
    from ..groups.edwards import ELL

    lib = load()
    gl = _pts_to_u64(g_l)
    gr = _pts_to_u64(g_r)
    cc = _scalars_to_u64([c], ELL)
    out = np.zeros((len(g_l), 16), dtype=np.uint64)
    lib.vmpc_ed_fold(_u64p(gl), _u64p(gr), _u64p(cc), len(g_l), _u64p(out))
    return _u64_to_pts(out)


# ---------------------------------------------------------------------------
# BN256 (G1 + twist)
# ---------------------------------------------------------------------------


def _int_to_u64x4(v: int, out, off):
    mask = (1 << 64) - 1
    out[off + 0] = v & mask
    out[off + 1] = (v >> 64) & mask
    out[off + 2] = (v >> 128) & mask
    out[off + 3] = (v >> 192) & mask


def _u64x4_to_int(row, off) -> int:
    v = 0
    for k in range(3, -1, -1):
        v = (v << 64) | int(row[off + k])
    return v


def _bn_pts_to_u64(points) -> np.ndarray:
    out = np.empty((len(points), 12), dtype=np.uint64)
    for i, p in enumerate(points):
        for j, c in enumerate((p.x, p.y, p.z)):
            _int_to_u64x4(c.value, out[i], 4 * j)
    return out


def _u64_to_bn_pts(arr) -> list:
    from ..groups.bn256 import BNPoint

    out = []
    for row in arr:
        coords = [_u64x4_to_int(row, 4 * j) for j in range(3)]
        out.append(BNPoint(*coords, check=False))
    return out


def _bn2_pts_to_u64(points) -> np.ndarray:
    out = np.empty((len(points), 24), dtype=np.uint64)
    for i, p in enumerate(points):
        for j, c in enumerate((p.x, p.y, p.z)):
            _int_to_u64x4(c.c0, out[i], 8 * j)
            _int_to_u64x4(c.c1, out[i], 8 * j + 4)
    return out


def _u64_to_bn2_pts(arr) -> list:
    from ..groups.bn256 import BNTwistPoint, GFp2

    out = []
    for row in arr:
        coords = [
            GFp2(_u64x4_to_int(row, 8 * j), _u64x4_to_int(row, 8 * j + 4))
            for j in range(3)
        ]
        out.append(BNTwistPoint(*coords, check=False))
    return out


def bn_msm(points, scalars):
    from ..groups.bn256 import ORDER

    lib = load()
    pts = _bn_pts_to_u64(points)
    sc = _scalars_to_u64(scalars, ORDER)
    out = np.zeros(12, dtype=np.uint64)
    lib.vmpc_bn_msm(_u64p(pts), _u64p(sc), len(points), _u64p(out))
    return _u64_to_bn_pts(out[None])[0]


def bn_batch_exp(base, exponents):
    from ..groups.bn256 import ORDER

    lib = load()
    b = _bn_pts_to_u64([base])
    ex = _scalars_to_u64(exponents, ORDER)
    out = np.zeros((len(exponents), 12), dtype=np.uint64)
    lib.vmpc_bn_batch_exp(_u64p(b), _u64p(ex), len(exponents), _u64p(out))
    return _u64_to_bn_pts(out)


def bn2_msm(points, scalars):
    from ..groups.bn256 import ORDER

    lib = load()
    pts = _bn2_pts_to_u64(points)
    sc = _scalars_to_u64(scalars, ORDER)
    out = np.zeros(24, dtype=np.uint64)
    lib.vmpc_bn2_msm(_u64p(pts), _u64p(sc), len(points), _u64p(out))
    return _u64_to_bn2_pts(out[None])[0]


def bn2_batch_exp(base, exponents):
    from ..groups.bn256 import ORDER

    lib = load()
    b = _bn2_pts_to_u64([base])
    ex = _scalars_to_u64(exponents, ORDER)
    out = np.zeros((len(exponents), 24), dtype=np.uint64)
    lib.vmpc_bn2_batch_exp(_u64p(b), _u64p(ex), len(exponents), _u64p(out))
    return _u64_to_bn2_pts(out)


# ---------------------------------------------------------------------------
# exact integer polynomial products (9-prime CRT NTT)
# ---------------------------------------------------------------------------

NTT_LIMBS = 9  # 9 x u64 = 576-bit transport; values must stay < ~2^558
NTT_MAX_COEFF_BITS = 556


def _ints_to_u64x9(xs) -> np.ndarray:
    n = len(xs)
    buf = bytearray(n * 72)
    for i, x in enumerate(xs):
        buf[i * 72 : (i + 1) * 72] = int(x).to_bytes(72, "little")
    return np.frombuffer(bytes(buf), dtype=np.uint64).reshape(n, 9).copy()


def _u64x9_to_ints(arr) -> list:
    raw = np.ascontiguousarray(arr).tobytes()
    return [
        int.from_bytes(raw[i * 72 : (i + 1) * 72], "little")
        for i in range(arr.shape[0])
    ]


def ntt_poly_mul_ints(a, b) -> list:
    """Exact product of integer polynomials (coefficients < ~2^278 each so
    the CRT bound holds for the protocol fields)."""
    lib = load()
    na, nb = len(a), len(b)
    assert (
        min(na, nb) * max(max(a, default=1), 1) * max(max(b, default=1), 1)
    ).bit_length() <= NTT_MAX_COEFF_BITS, (
        "coefficients too large for exact CRT recovery"
    )
    arr_a = _ints_to_u64x9(a)
    arr_b = _ints_to_u64x9(b)
    out = np.zeros((na + nb - 1, 9), dtype=np.uint64)
    lib.vmpc_ntt_poly_mul(_u64p(arr_a), na, _u64p(arr_b), nb, _u64p(out))
    return _u64x9_to_ints(out)


def register(min_batch: int = 8):
    """Install the native library as the host dispatch backend for Ed25519
    and the BN256 curves."""
    if not available():
        return False
    from ..groups.bn256 import BNPoint, BNTwistPoint
    from ..groups.edwards import EdwardsPoint
    from ..ops import dispatch

    dispatch.register_msm_backend(EdwardsPoint, ed_msm, min_batch)
    dispatch.register_fold_backend(EdwardsPoint, ed_fold, min_batch)
    dispatch.register_batch_exp_backend(EdwardsPoint, ed_batch_exp, min_batch)
    dispatch.register_msm_backend(BNPoint, bn_msm, min_batch)
    dispatch.register_batch_exp_backend(BNPoint, bn_batch_exp, min_batch)
    dispatch.register_msm_backend(BNTwistPoint, bn2_msm, min_batch)
    dispatch.register_batch_exp_backend(BNTwistPoint, bn2_batch_exp, min_batch)
    return True
