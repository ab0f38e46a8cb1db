"""Dev probe: fused Pallas BN256-twist (G2) MSM on the real TPU —
correctness vs the host path + rate.  The interpret-mode pipeline tests are
CPU-intractable (tests/test_bn2_pallas.py), so this probe is the kernel's
validation surface: one Mosaic compile per shape, persisted in the shared
cache."""

import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_vmpc_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    print("backend:", jax.default_backend(), file=sys.stderr)

    import jax.numpy as jnp

    from verifiable_mpc_tpu.groups.bn256 import ORDER, BNTwistPoint
    from verifiable_mpc_tpu.ops import bn2_pallas as b2
    from verifiable_mpc_tpu.ops import dispatch
    from verifiable_mpc_tpu.ops import msm_pallas as mp

    rng = np.random.RandomState(13)
    g = BNTwistPoint.generator

    # --- correctness at n=128 (one chunk) ---------------------------------
    n0 = 128
    pts0 = [g ** int(e) for e in rng.randint(1, 1 << 62, n0)]
    sc0 = [int.from_bytes(rng.bytes(31), "little") % ORDER for _ in range(n0)]
    t0 = time.perf_counter()
    got = b2.msm(pts0, sc0, chunk=128, interpret=False)
    print(f"first run (compile) {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    expect = dispatch._host_multiexp(pts0, sc0)
    assert got == expect, "fused Pallas BN2 MSM mismatch vs host"
    print("msm correctness OK", file=sys.stderr)

    # --- fold + batch-exp correctness (production kernel shapes) ----------
    gl = pts0[:64]
    gr = pts0[64:128]
    c = int.from_bytes(rng.bytes(31), "little") % ORDER
    t0 = time.perf_counter()
    got_f = b2.fold(gl, gr, c, interpret=False)
    print(f"fold first (compile) {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    expect_f = [(gl[i] ** c) * gr[i] for i in range(64)]
    assert got_f == expect_f, "fused Pallas BN2 fold mismatch vs host"
    print("fold correctness OK", file=sys.stderr)

    exps = sc0[:128]
    t0 = time.perf_counter()
    got_b = b2.batch_exp(g, exps, interpret=False)
    print(f"bexp first (compile) {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    expect_b = [g ** e for e in exps]
    assert got_b == expect_b, "fused Pallas BN2 batch-exp mismatch vs host"
    print("bexp correctness OK", file=sys.stderr)

    # --- rate at n=2^13 (keygen w-term sized) ------------------------------
    n = 1 << 13
    pts_small = [g ** int(e) for e in rng.randint(1, 1 << 62, 256)]
    pts = [pts_small[i % 256] for i in range(n)]
    scalars = [int.from_bytes(rng.bytes(31), "little") % ORDER for _ in range(n)]
    dev_pts = b2.BN2.encode(pts)
    digits = jnp.asarray(mp._scalar_digits_signed(scalars, ORDER))
    kern = mp._build_for(b2.BN2, n, 128, 8, 64, False)
    t0 = time.perf_counter()
    out = kern(dev_pts, digits)
    jax.block_until_ready(out)
    print(f"n=2^13 compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    reps = 3
    variants = [
        jnp.asarray(
            mp._scalar_digits_signed([(s + i + 1) % ORDER for s in scalars], ORDER)
        )
        for i in range(reps + 2)
    ]
    for i in range(2):
        _ = [np.asarray(a) for a in kern(dev_pts, variants[i])]
    t0 = time.perf_counter()
    for i in range(reps):
        _ = [np.asarray(a) for a in kern(dev_pts, variants[2 + i])]
    t_k = (time.perf_counter() - t0) / reps
    print(
        f"fused Pallas BN2 MSM n=2^13: {t_k:.3f}s/msm -> {n/t_k:.0f} points/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
