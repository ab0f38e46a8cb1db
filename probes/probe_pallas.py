"""Dev probe: fused Pallas MSM on the real TPU — correctness + rate."""

import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_vmpc_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    print("backend:", jax.default_backend(), file=sys.stderr)

    from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint
    from verifiable_mpc_tpu.ops import curve_ed as ced
    from verifiable_mpc_tpu.ops import dispatch
    from verifiable_mpc_tpu.ops import msm_pallas as mp
    from verifiable_mpc_tpu.ops import msm as msm_mod
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    g = EdwardsPoint.generator

    # --- correctness at n=128 (one chunk) ---------------------------------
    n0 = 128
    pts0 = [g ** int(e) for e in rng.randint(1, 1 << 62, n0)]
    sc0 = [int.from_bytes(rng.bytes(31), "little") % ELL for _ in range(n0)]
    t0 = time.perf_counter()
    got = mp.msm(pts0, sc0, chunk=128, interpret=False)
    print(f"first run (compile) {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    expect = dispatch._host_multiexp(pts0, sc0)
    assert got == expect, "fused Pallas MSM mismatch vs host"
    print("correctness OK", file=sys.stderr)

    # --- rate at n=2^14 ----------------------------------------------------
    n = 1 << 14
    pts_small = [g ** int(e) for e in rng.randint(1, 1 << 62, 256)]
    pts = [pts_small[i % 256] for i in range(n)]
    scalars = [int.from_bytes(rng.bytes(31), "little") % ELL for _ in range(n)]
    dev_pts = mp.ED.encode(pts)
    digits = jnp.asarray(mp._scalar_digits_signed(scalars))
    kern = mp._build(n, 128, 8, 64, False)
    t0 = time.perf_counter()
    out = kern(dev_pts, digits)
    jax.block_until_ready(out)
    print(f"n=2^14 compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    reps = 3
    variants = [
        jnp.asarray(
            mp._scalar_digits_signed([(s + i + 1) % ELL for s in scalars])
        )
        for i in range(reps + 2)
    ]
    for i in range(2):
        _ = np.asarray(kern(dev_pts, variants[i]))
    t0 = time.perf_counter()
    for i in range(reps):
        _ = np.asarray(kern(dev_pts, variants[2 + i]))
    t_k = (time.perf_counter() - t0) / reps
    print(
        f"fused Pallas MSM n=2^14: {t_k:.3f}s/msm -> {n/t_k:.0f} points/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
