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
# smallest half-size folded on the TPU: a TPU round costs ~2 fetch
# latencies (~50-70 ms) regardless of size, the host tiers ~100 ms+ per
# round at 1024-2048 — measured crossover sits just below 1024
_CUTOVER = 1024

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
    """Packed download [2, n, 16] (canonical x, y 16-bit limbs) -> [n, 16]
    u64 rows with z = 1 and t = x*y mod p filled host-side (C tier).

    Downloading two coordinates instead of three (t is redundant for a
    z = 1 representative) cuts the engine's per-round transfer — the
    tunnel's 28 MB/s download leg — by a third; the C completion is ~ms."""
    n = dl.shape[1]
    rows = np.zeros((n, 16), np.uint64)
    rows[:, 0:4] = _u16_to_u64x4(dl[0])
    rows[:, 4:8] = _u16_to_u64x4(dl[1])
    native.ed_rows_fill_t_arr(rows)
    return rows


def _dl_start_fetch(dl):
    """Kick off the device->host copy without blocking (the transfer then
    overlaps the next round's MSM compute); np.asarray() at challenge time
    completes it."""
    try:
        dl.copy_to_host_async()
    except Exception:  # backend without async host copies: fetch later
        pass
    return dl


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
            # x, y only: the host completes t = x*y in C (_dl_to_rows)
            dl = jnp.stack([xc, yc]).transpose(0, 2, 1).astype(jnp.uint16)
            return g_next, dl
        return g_next

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _round_msms_call(half: int, nw: int, packed: bool):
    """jitted: resident coords [2*half, L] x4 + both digit streams ->
    [2, nc, L]: round r's A MSM (high half of g) and B MSM (low half) in
    ONE tunnel dispatch.

    The k^y column is deliberately absent: with it, the half+1 bases
    padded up to the next power of two — DOUBLING every A/B MSM's device
    work with identity rows (half is itself a power of two).  The caller
    multiplies k^y in on the host (one C scalar-mul; the commitment is a
    product, so the group element — and its normalized hash bytes — are
    identical)."""
    import jax
    import jax.numpy as jnp

    from ..ops import msm_pallas as mp

    chunk = 128
    sub = 32 if half >= 32 * chunk else 8
    msm = mp._build_for_fused(mp.ED, half, chunk, sub, nw, False, packed)

    def run(g_coords, digits2):
        g_hi = tuple(a[half:] for a in g_coords)
        g_lo = tuple(a[:half] for a in g_coords)
        return jnp.stack([msm(g_hi, digits2[0]), msm(g_lo, digits2[1])])

    return jax.jit(run)


def _round_msms(g_dev, z_arr: np.ndarray):
    """Launch both of round r's MSMs; returns the un-fetched [2, nc, L]
    device result (A over z[:half]/g_hi, B over z[half:]/g_lo)."""
    from ..ops import msm_pallas as mp

    half = z_arr.shape[0] // 2
    with _T(f"  digits n={half}"):
        # one C pass: recode + offset-7 nibble pack (the numpy pack alone
        # cost 0.2-1 s at the 2^18 round)
        pk, wn = native.recode_signed4_packed_arr(z_arr, ELL)
    nw = 8 if wn <= 8 else mp.NWINDOWS
    full = pk[(mp.NWINDOWS - nw) // 2 :]
    d2 = np.stack([full[:, :half], full[:, half:]])
    import jax.numpy as jnp

    digits = jnp.asarray(d2)
    return _round_msms_call(half, nw, True)(g_dev, digits)


def _k_pow(k_arr: np.ndarray, y_can: int) -> EdwardsPoint:
    """k ** y via the C scalar ladder (host tail of the identity-free
    round MSMs)."""
    lib = native.load()
    s4 = native._ints_to_u64x4([y_can % ELL], ELL)
    out = np.empty(16, np.uint64)
    lib.vmpc_ed_scalar_mul(
        native._u64p(k_arr), native._u64p(s4), native._u64p(out)
    )
    return native._u64_to_pts(out.reshape(1, 16))[0]


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

    if native.fastser() is not None:
        # id-keyed cache: the commitment MSMs already uploaded this vector
        g_host, g_dev = mp.ed_encode_cached(g_hat)
    else:
        g_host = native._pts_to_u64(g_hat)  # canonical hash mirror [n, 16]
        g_dev = _rows_to_coords(g_host)
    k_arr = np.ascontiguousarray(native._pts_to_u64([k])[0])
    order = k.order
    pending_dl = None  # fold download in flight (fetched at challenge time)

    while True:
        n = g_dev[0].shape[0]
        half = n // 2
        if _TIMING:
            print(f"  [engine] round {round_i} n={n}", flush=True)
        with _T("dots"):
            y_a = native.mod_dot_arr(l_arr[half:], z_arr[:half], ELL)
            y_b = native.mod_dot_arr(l_arr[:half], z_arr[half:], ELL)
        with _T("msm_launch"):
            AB_dev = _round_msms(g_dev, z_arr)  # one dispatch, both MSMs
        if pending_dl is not None:
            # previous round's fold download: issued async at fold time, so
            # the transfer overlapped this round's MSM compute
            with _T("dl_fetch"):
                g_host = _dl_to_rows(np.asarray(pending_dl))
            pending_dl = None
        with _T("msm_fetch"):
            AB = np.asarray(AB_dev)  # ONE blocking fetch
        A = _decode_pt(AB[0]) * _k_pow(k_arr, y_a)
        B = _decode_pt(AB[1]) * _k_pow(k_arr, y_b)
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
            pending_dl = _dl_start_fetch(dl)
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

    if pending_dl is not None:
        with _T("dl_fetch"):
            g_host = _dl_to_rows(np.asarray(pending_dl))

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

    if native.fastser() is not None:
        g_host, g_dev = mp.ed_encode_cached(g_hat)
    else:
        g_host = native._pts_to_u64(g_hat)
        g_dev = _rows_to_coords(g_host)
    order = k.order
    pending_dl = None

    while True:
        n = g_dev[0].shape[0]
        half = n // 2
        A = proof["A" + str(round_i)]
        B = proof["B" + str(round_i)]
        if type(A) is not EdwardsPoint or type(B) is not EdwardsPoint:
            return None
        if pending_dl is not None:
            g_host = _dl_to_rows(np.asarray(pending_dl))
            pending_dl = None
        c = pivot_native._round_challenge_resident(
            A, B, g_host, k, Q, l_arr, order, l_obj
        )
        l_obj = None

        g_dev, dl = _fold_norm_call(half, 128, 8, mp.NWINDOWS, True)(
            g_dev, _fold_digits(c)
        )
        pending_dl = _dl_start_fetch(dl)
        Q = A * (Q ** c) * (B ** (c ** 2))
        l_arr = native.mod_axpy_arr(c, l_arr[:half], l_arr[half:], ELL)
        round_i += 1

        if half // 2 < _CUTOVER:
            break

    if pending_dl is not None:
        g_host = _dl_to_rows(np.asarray(pending_dl))

    from . import compressed_pivot

    g_list = native._u64_to_pts(np.ascontiguousarray(g_host))
    L_small = pivot.LinearForm(
        [gf(v) for v in native._u64x4_to_ints(l_arr)]
    )
    return compressed_pivot.protocol_4_verifier(
        g_list, k, Q, L_small, gf, proof, round_i
    )
