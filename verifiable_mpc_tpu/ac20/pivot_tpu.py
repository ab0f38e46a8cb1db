"""TPU-resident engine for the Protocol-4 compression loop (Ed25519).

The dispatch-level TPU backends (ops/msm_pallas.py) convert between Python
points and device arrays at EVERY call: each fold round re-encodes the
generator vector host-side, pulls the folded result back as Python objects,
and batch-normalizes on the host.  On the tunnel-attached TPU those
conversions and synchronous pulls dominate the compression phase by an
order of magnitude (probes/probe_e2e_tpu.py).

This engine mirrors ac20/pivot_native.py's resident structure with the
TPU as the resident store: the generator vector stays ON DEVICE as
limb-row coordinate arrays across rounds (reference compressed_pivot.py:
29-86/:148-202), and each round runs

* the two A/B MSMs from the resident halves (one [2, nc, L] fetch),
* the generator fold + batch normalization (Fermat inversion, vectorized
  over the whole vector) as one jitted chain, returning the canonical
  affine rows both as the next round's resident state and as one packed
  uint16 download for the host-side Fiat-Shamir hash of g_hat,

while the O(n) scalar work (linear-form dots, z/L folds) stays on the
host C++ vector tier (native/modvec.cc) exactly as in pivot_native.
Challenges are byte-identical to the generic loop: the same
_round_challenge_resident encoding over the canonical (z=1) rows.

Below ``_CUTOVER`` the remaining rounds hand off to
compressed_pivot.protocol_4_* (which delegates to the C++ resident engine
when available): at small n the tunnel's ~25 ms round-trip floor exceeds
the host compute, so the hybrid split is the performance-correct shape
for a network-attached accelerator.
"""

from __future__ import annotations

import functools
import logging

import numpy as np

from .. import native
from ..groups.edwards import ELL, P as ED_P, EdwardsPoint
from . import pivot

logger_cp_hin = logging.getLogger("compressed_pivot_hash_inputs")
logger_cp_hout = logging.getLogger("compressed_pivot_hash_outputs")

ENABLED = False
_CUTOVER = 4096  # smallest half-size folded on the TPU

_L = 16  # 16-bit limbs per 256-bit coordinate

# VMPC_ENGINE_TIMING=1: per-step wall-clock prints (perf diagnosis)
import os as _os
import time as _time

_TIMING = bool(_os.environ.get("VMPC_ENGINE_TIMING"))


class _T:
    __slots__ = ("label", "t0")

    def __init__(self, label):
        self.label = label

    def __enter__(self):
        if _TIMING:
            self.t0 = _time.perf_counter()
        return self

    def __exit__(self, *a):
        if _TIMING:
            print(
                f"    [engine] {self.label}: "
                f"{_time.perf_counter() - self.t0:7.3f}s",
                flush=True,
            )


def enable():
    """Called by verifiable_mpc_tpu.enable_tpu()."""
    global ENABLED
    ENABLED = native.enable_scalar_tier()
    return ENABLED


# ---------------------------------------------------------------------------
# host <-> device layout: [n, 16] u64x4 rows  <->  4 x [n, L] u32 limb rows
# ---------------------------------------------------------------------------


def _rows_to_coords(rows: np.ndarray):
    """[n, 16] u64 (x, y, z, t; 4 u64 limbs each) -> 4 x [n, 16] u32
    16-bit-limb arrays (batch-major, the msm_pallas device layout).

    Little-endian viewing: each u64 limb's bytes ARE its four 16-bit limbs
    in order, so the conversion is a reinterpret + slice + widen."""
    import jax.numpy as jnp

    u16 = np.ascontiguousarray(rows, np.uint64).view(np.uint16)  # [n, 64]
    return tuple(
        jnp.asarray(u16[:, 16 * j : 16 * (j + 1)].astype(np.uint32))
        for j in range(4)
    )


def _u16_to_u64x4(limbs: np.ndarray) -> np.ndarray:
    """[n, 16] 16-bit limbs (any int dtype) -> [n, 4] u64 (little-endian
    reinterpret, see _rows_to_coords)."""
    v = np.ascontiguousarray(limbs.astype(np.uint16))
    return v.view(np.uint64)


def _dl_to_rows(dl: np.ndarray) -> np.ndarray:
    """Packed download [3, n, 16] (canonical x, y, t 16-bit limbs) ->
    [n, 16] u64 rows with z = 1 (the normalized representative)."""
    n = dl.shape[1]
    rows = np.zeros((n, 16), np.uint64)
    rows[:, 0:4] = _u16_to_u64x4(dl[0])
    rows[:, 4:8] = _u16_to_u64x4(dl[1])
    rows[:, 8] = 1  # z = 1
    rows[:, 12:16] = _u16_to_u64x4(dl[2])
    return rows


def _digits_signed_u64x4(arr: np.ndarray) -> np.ndarray:
    """[m, 4] u64 canonical residues -> [64, m] int8 signed digits (the
    vectorized recode shared with the dispatch kernels)."""
    from ..ops import msm_pallas as mp

    return mp._digits_signed_from_u64x4(arr, ELL)


# ---------------------------------------------------------------------------
# device chains (jitted per shape, cached)
# ---------------------------------------------------------------------------


def _canon25519(a):
    from ..ops import limbs_lm as lm

    return lm.canon25519(a)


def _inv25519(z):
    from ..ops import limbs_lm as lm

    return lm.inv25519(z)


@functools.lru_cache(maxsize=None)
def _fold_norm_call(half: int, chunk: int, sub: int, nw: int, want_dl: bool):
    """jitted: resident coords [2*half, L] x4 + fold digits -> next-round
    canonical resident coords [half, L] x4 (z = 1 rows, exact residues)
    and, when ``want_dl``, the [3, half, 16] u16 canonical download that
    feeds the host Fiat-Shamir hash of the folded g_hat."""
    import jax
    import jax.numpy as jnp

    from ..ops import limbs_lm as lm
    from ..ops import msm_pallas as mp

    assert half % (chunk * sub) == 0
    steps = half // (chunk * sub)
    call = mp._fold_pallas(mp.ED, chunk, sub, nw, False)

    def run(g_coords, digits):
        lmaj = [jnp.transpose(a, (1, 0)) for a in g_coords]  # [L, 2*half]
        gl = [
            jnp.transpose(
                a[:, :half].reshape(_L, steps, sub, chunk), (1, 0, 2, 3)
            )
            for a in lmaj
        ]
        gr = [
            jnp.transpose(
                a[:, half:].reshape(_L, steps, sub, chunk), (1, 0, 2, 3)
            )
            for a in lmaj
        ]

        # scan: one traced fold body (the unrolled loop traced `steps`
        # pallas calls — minutes of per-process tracing at 2^17)
        def body(_, xs):
            return 0, tuple(call(digits, *xs[:4], *xs[4:]))

        _, outs = jax.lax.scan(body, 0, (*gl, *gr))
        x, y, z, _t = (
            jnp.transpose(outs[c], (1, 0, 2, 3)).reshape(
                _L, steps * sub * chunk
            )
            for c in range(4)
        )
        zinv = _inv25519(z)
        xc = _canon25519(lm.mul25519(x, zinv))
        yc = _canon25519(lm.mul25519(y, zinv))
        tc = _canon25519(lm.mul25519(xc, yc))
        ones = lm.const_rows((1,) + (0,) * (_L - 1), (half,))
        g_next = tuple(
            jnp.transpose(a, (1, 0)) for a in (xc, yc, ones, tc)
        )
        if want_dl:
            dl = jnp.stack([xc, yc, tc]).transpose(0, 2, 1).astype(jnp.uint16)
            return g_next, dl
        return g_next

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _msm_pad_call(n_in: int, target: int):
    """jitted: append the k column and identity padding to the resident
    half [n_in - 1, L] x4 -> [target, L] x4."""
    import jax
    import jax.numpy as jnp

    pad = target - n_in
    # extended identity (0 : 1 : 1 : 0) batch-major limb rows
    zero = np.zeros((pad, _L), np.uint32)
    one = np.zeros((pad, _L), np.uint32)
    one[:, 0] = 1
    id_rows = (zero, one, one, zero)

    def run(g_half, k_enc):
        return tuple(
            jnp.concatenate([g, k, jnp.asarray(i)], axis=0)
            for g, k, i in zip(g_half, k_enc, id_rows)
        )

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _stack2_call():
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda a, b: jnp.stack([a, b]))


def _msm_resident(g_half, k_enc, scalars_u64, y_can: int):
    """One A/B commitment: MSM over [resident g_half ‖ k] with exponents
    [scalars ‖ y].  Returns the device [nc, L] result (not fetched)."""
    from ..ops import msm_pallas as mp

    n_bases = g_half[0].shape[0] + 1
    chunk = 128
    sub = 32 if n_bases >= 32 * chunk else 8
    target = max(chunk * sub, mp._pow2_pad(n_bases, 1))
    pts = _msm_pad_call(n_bases, target)(g_half, k_enc)

    with _T(f"  digits n={n_bases}"):
        rows = np.zeros((target, 4), np.uint64)
        rows[: n_bases - 1] = scalars_u64
        rows[n_bases - 1] = native._ints_to_u64x4([y_can % ELL], ELL)[0]
        digits_np = _digits_signed_u64x4(rows)
    nonzero = np.flatnonzero(digits_np.any(axis=1))
    windows_needed = mp.NWINDOWS - nonzero[0] if nonzero.size else 1
    nw = 8 if windows_needed <= 8 else mp.NWINDOWS
    trimmed = digits_np[mp.NWINDOWS - nw :]
    packed = nw % 2 == 0
    import jax.numpy as jnp

    digits = jnp.asarray(mp._pack_digits(trimmed) if packed else trimmed)
    return mp._build_for_fused(mp.ED, target, chunk, sub, nw, False, packed)(
        tuple(pts), digits
    )


def _decode_pt(arr_ncL: np.ndarray) -> EdwardsPoint:
    from ..ops import curve_ed as ced

    return ced.decode_point_plain(tuple(arr_ncL))


def _fold_digits(c: int):
    """Unsigned 4-bit windows of the fold scalar (TABLE = 16), the exact
    digit stream _fold_generic feeds the kernel."""
    import jax.numpy as jnp

    from ..ops.msm import NWINDOWS, _scalar_digits

    digits_np = _scalar_digits([int(c)], ELL)[:, 0]
    return jnp.asarray(digits_np.reshape(NWINDOWS, 1).astype(np.int32))


# ---------------------------------------------------------------------------
# engine qualification + the round loops
# ---------------------------------------------------------------------------


def _engine_ok(g_hat, k, gf):
    from . import ref_transcript

    if not ENABLED or ref_transcript.ACTIVE:
        return False
    if gf.modulus != ELL or not native.SCALAR_TIER:
        return False
    n = len(g_hat)
    if n < 2 * _CUTOVER or n & (n - 1):
        return False
    if type(k) is not EdwardsPoint or type(g_hat[0]) is not EdwardsPoint:
        return False
    if logger_cp_hin.isEnabledFor(logging.DEBUG) or logger_cp_hout.isEnabledFor(
        logging.DEBUG
    ):
        return False
    return True


def try_protocol_4_prover(g_hat, k, Q, L_tilde, z_hat, gf, proof, round_i,
                          transcript="v1", c_prev=0):
    """TPU-resident prover rounds down to _CUTOVER, then hand off; None if
    the inputs don't qualify (caller falls through, pivot_native next)."""
    if not _engine_ok(g_hat, k, gf):
        return None
    if len(z_hat) != len(g_hat) or len(L_tilde.coeffs) != len(g_hat):
        return None
    if transcript not in ("v1", "v2"):
        return None
    from . import pivot_native

    z_arr = pivot_native._scalars_or_none(z_hat, gf)
    if z_arr is None:
        return None
    l_arr, l_exact = pivot_native._form_coeffs_reduced(L_tilde.coeffs, gf)
    if l_arr is None:
        return None
    l_obj = None if l_exact else L_tilde

    from ..ops import msm_pallas as mp

    g_host = native._pts_to_u64(g_hat)  # canonical hash mirror [n, 16]
    g_dev = _rows_to_coords(g_host)
    k_enc = mp.ED.encode([k])
    order = k.order
    stack2 = _stack2_call()

    while True:
        n = g_dev[0].shape[0]
        half = n // 2
        if _TIMING:
            print(f"  [engine] round {round_i} n={n}", flush=True)
        with _T("dots"):
            y_a = native.mod_dot_arr(l_arr[half:], z_arr[:half], ELL)
            y_b = native.mod_dot_arr(l_arr[:half], z_arr[half:], ELL)
        g_lo = tuple(a[:half] for a in g_dev)
        g_hi = tuple(a[half:] for a in g_dev)
        with _T("msm_launch"):
            A_dev = _msm_resident(g_hi, k_enc, z_arr[:half], y_a)
            B_dev = _msm_resident(g_lo, k_enc, z_arr[half:], y_b)
        with _T("msm_fetch"):
            AB = np.asarray(stack2(A_dev, B_dev))  # ONE blocking fetch
        A = _decode_pt(AB[0])
        B = _decode_pt(AB[1])
        proof["A" + str(round_i)] = A
        proof["B" + str(round_i)] = B

        with _T("challenge"):
            if transcript == "v2":
                from .compressed_pivot import _round_challenge_v2

                c = c_prev = _round_challenge_v2(A, B, c_prev, order)
            else:
                c = pivot_native._round_challenge_resident(
                    A, B, g_host, k, Q, l_arr, order, l_obj
                )
        l_obj = None

        last_tpu_round = half // 2 < _CUTOVER
        # v2 challenges never hash g_hat: only the handoff state needs the
        # canonical download
        want_dl = transcript != "v2" or last_tpu_round
        fn = _fold_norm_call(half, 128, 8, mp.NWINDOWS, want_dl)
        if want_dl:
            with _T("fold_launch"):
                g_dev, dl = fn(g_dev, _fold_digits(c))
            with _T("fold_fetch"):
                dl_np = np.asarray(dl)  # ONE blocking fetch
            with _T("dl_pack"):
                g_host = _dl_to_rows(dl_np)
        else:
            with _T("fold_launch"):
                g_dev = fn(g_dev, _fold_digits(c))

        with _T("host_tail"):
            Q = A * (Q ** c) * (B ** (c ** 2))
            l_arr = native.mod_axpy_arr(c, l_arr[:half], l_arr[half:], ELL)
            z_arr = native.mod_axpy_arr(c, z_arr[half:], z_arr[:half], ELL)
        round_i += 1

        if last_tpu_round:
            break

    # hand the sub-_CUTOVER tail to the host engines (C++ resident /
    # generic), reconstructing exactly the state the generic loop would hold
    from . import compressed_pivot

    g_list = native._u64_to_pts(np.ascontiguousarray(g_host))
    L_small = pivot.LinearForm(
        [gf(v) for v in native._u64x4_to_ints(l_arr)]
    )
    z_small = [gf(v) for v in native._u64x4_to_ints(z_arr)]
    return compressed_pivot.protocol_4_prover(
        g_list, k, Q, L_small, z_small, gf, proof, round_i,
        transcript=transcript, c_prev=c_prev,
    )


def try_protocol_4_verifier(g_hat, k, Q, L_tilde, gf, proof, round_i):
    """TPU-resident verifier rounds down to _CUTOVER; None if unsuitable."""
    if not _engine_ok(g_hat, k, gf):
        return None
    if len(L_tilde.coeffs) != len(g_hat):
        return None
    from . import pivot_native

    l_arr, l_exact = pivot_native._form_coeffs_reduced(L_tilde.coeffs, gf)
    if l_arr is None:
        return None
    l_obj = None if l_exact else L_tilde

    from ..ops import msm_pallas as mp

    g_host = native._pts_to_u64(g_hat)
    g_dev = _rows_to_coords(g_host)
    order = k.order

    while True:
        n = g_dev[0].shape[0]
        half = n // 2
        A = proof["A" + str(round_i)]
        B = proof["B" + str(round_i)]
        if type(A) is not EdwardsPoint or type(B) is not EdwardsPoint:
            return None
        c = pivot_native._round_challenge_resident(
            A, B, g_host, k, Q, l_arr, order, l_obj
        )
        l_obj = None

        g_dev, dl = _fold_norm_call(half, 128, 8, mp.NWINDOWS, True)(
            g_dev, _fold_digits(c)
        )
        g_host = _dl_to_rows(np.asarray(dl))
        Q = A * (Q ** c) * (B ** (c ** 2))
        l_arr = native.mod_axpy_arr(c, l_arr[:half], l_arr[half:], ELL)
        round_i += 1

        if half // 2 < _CUTOVER:
            break

    from . import compressed_pivot

    g_list = native._u64_to_pts(np.ascontiguousarray(g_host))
    L_small = pivot.LinearForm(
        [gf(v) for v in native._u64x4_to_ints(l_arr)]
    )
    return compressed_pivot.protocol_4_verifier(
        g_list, k, Q, L_small, gf, proof, round_i
    )
