"""Isolate the bucket-MSM step cost on TPU: upload vs gather vs kernel.

The fused gather+accumulate step measured ~265 ms at [dt=8, nw=32, 128]
(probe_bucket.py) where the group math alone should be ~4 ms.  Times each
stage separately with resident device inputs."""

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
    from verifiable_mpc_tpu.ops import msm_bucket as mb

    rng = np.random.RandomState(7)
    g = EdwardsPoint.generator
    n = 1 << 14
    n_ext = n + 1
    dt, nw, lanes = 8, mb.NW8, mb.LANES
    curve = mb.mp.ED

    pts_small = [g ** int(e) for e in rng.randint(1, 1 << 62, 64)]
    pts = [pts_small[i % 64] for i in range(n)] + [EdwardsPoint.identity]
    pts_ext = tuple(jnp.asarray(np.asarray(a)) for a in curve.encode(pts))
    jax.block_until_ready(pts_ext)

    idx_np = rng.randint(0, n_ext, (dt, nw, lanes)).astype(np.int32)
    sgn_np = (rng.randint(0, 2, (dt, nw, lanes))).astype(np.int32)

    def timeit(label, fn, reps=10):
        fn()  # compile/warm
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dt_ = (time.perf_counter() - t0) / reps
        print(f"{label}: {dt_*1e3:.1f} ms", file=sys.stderr)
        return dt_

    # 1. upload only
    def upload():
        a = jnp.asarray(idx_np)
        b = jnp.asarray(sgn_np)
        jax.block_until_ready((a, b))

    timeit("idx+sgn upload", upload)

    # 2. gather+transpose only (jitted), resident idx
    idx_dev = jnp.asarray(idx_np)
    jax.block_until_ready(idx_dev)

    @jax.jit
    def gather(pts, idx):
        outs = []
        for a in pts:
            gth = a[idx]
            outs.append(jnp.transpose(gth, (0, 3, 1, 2)))
        return tuple(outs)

    def g_run():
        jax.block_until_ready(gather(pts_ext, idx_dev))

    timeit("gather+transpose", g_run)

    # 3. kernel only, resident pre-gathered tiles
    tiles = gather(pts_ext, idx_dev)
    tiles = tuple(jnp.asarray(np.asarray(t)) for t in tiles)
    sgn_dev = jnp.asarray(sgn_np)
    jax.block_until_ready((tiles, sgn_dev))
    kern = mb._accum_call(curve, dt, nw, lanes, False)
    init = mb._acc_init(curve, nw, lanes)

    state = {"acc": init()}

    def k_run():
        state["acc"] = kern(sgn_dev, tiles, state["acc"])
        jax.block_until_ready(state["acc"])

    timeit("accumulate kernel", k_run)

    # 4. fused step (the production path)
    step = mb._gather_step_call(curve, n_ext, dt, nw, lanes, False)
    state2 = {"acc": init()}

    def s_run():
        state2["acc"] = step(
            pts_ext, jnp.asarray(idx_np), jnp.asarray(sgn_np), state2["acc"]
        )
        jax.block_until_ready(state2["acc"])

    timeit("fused gather+accumulate step", s_run)

    # 5. reduce kernel
    red = mb._reduce_call(curve, nw, lanes, False)

    def r_run():
        jax.block_until_ready(red(init()))

    timeit("reduce kernel", r_run)


if __name__ == "__main__":
    main()
