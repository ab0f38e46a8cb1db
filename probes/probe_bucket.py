"""Dev probe: bucket-method Pallas MSM on the real TPU — correctness vs the
host path + rate vs the fused windowed kernel at the bench size (n=2^14)."""

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

    from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint
    from verifiable_mpc_tpu.ops import dispatch
    from verifiable_mpc_tpu.ops import msm_bucket as mb

    rng = np.random.RandomState(99)
    g = EdwardsPoint.generator

    # --- correctness at n=500 (ragged, forces padding + signs) ------------
    n0 = 500
    pts0 = [g ** int(e) for e in rng.randint(1, 1 << 62, n0)]
    sc0 = [int.from_bytes(rng.bytes(31), "little") % ELL for _ in range(n0)]
    sc0[0] = 0
    sc0[1] = ELL - 1
    t0 = time.perf_counter()
    got = mb.msm(pts0, sc0, interpret=False)
    print(f"first run (compile) {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    expect = dispatch._host_multiexp(pts0, sc0)
    assert got == expect, "bucket MSM mismatch vs host"
    print("bucket msm correctness OK", file=sys.stderr)

    # --- rate at n=2^14 (the bench.py headline size) -----------------------
    n = 1 << 14
    pts_small = [g ** int(e) for e in rng.randint(1, 1 << 62, 256)]
    pts = [pts_small[i % 256] for i in range(n)]
    scalars = [int.from_bytes(rng.bytes(31), "little") % ELL for _ in range(n)]

    t0 = time.perf_counter()
    out = mb.msm(pts, scalars, interpret=False)
    print(f"n=2^14 first (compile+layout) {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    # timing methodology of bench.py: warm twice on distinct inputs, then
    # time fully-materialized runs; host layout/digits excluded (same as the
    # windowed bench excludes digit prep)
    curve = mb.mp.ED
    dt, lanes, nw = 8, mb.LANES, mb.NW8
    n_ext = n + 1  # n is a power of two already
    pts_ext = curve.encode(pts + [EdwardsPoint.identity])
    step = mb._gather_step_call(curve, n_ext, dt, nw, lanes, False)

    def run(perm, sgn, d):
        acc = mb._acc_init(curve, nw, lanes)()
        for idx, sg in mb._step_arrays(perm, sgn, n_ext, dt):
            acc = step(pts_ext, jnp.asarray(idx), jnp.asarray(sg), acc)
        out = mb._reduce_call(curve, nw, lanes, False)(acc)
        return [np.asarray(a) for a in out]

    reps = 3
    layouts = []
    for i in range(reps + 2):
        digs = mb._scalar_digits_signed8(
            [(s + i + 1) % ELL for s in scalars], ELL
        )
        layouts.append(mb._bucket_layout(digs, dt))
    for i in range(2):
        run(*layouts[i])
    t0 = time.perf_counter()
    for i in range(reps):
        run(*layouts[2 + i])
    t_k = (time.perf_counter() - t0) / reps
    print(
        f"bucket MSM n=2^14: {t_k:.3f}s/msm -> {n/t_k:.0f} points/s "
        f"(windowed kernel baseline: 109k)",
        file=sys.stderr,
    )

    # host layout cost (would add to end-to-end prove paths)
    t0 = time.perf_counter()
    digs = mb._scalar_digits_signed8(scalars, ELL)
    t_d = time.perf_counter() - t0
    t0 = time.perf_counter()
    mb._bucket_layout(digs, dt)
    t_l = time.perf_counter() - t0
    print(f"host digits {t_d*1e3:.0f}ms, layout {t_l*1e3:.0f}ms",
          file=sys.stderr)


if __name__ == "__main__":
    main()
