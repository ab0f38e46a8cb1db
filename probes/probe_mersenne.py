"""Dev probe: where does the fused MSM wall time go after the
pseudo-Mersenne switch — per-launch overhead vs in-kernel compute?

Times (a) one chunk step repeated back-to-back, (b) the tail, (c) the full
MSM at several sub (points-per-launch) settings.
"""

import sys
import time

import numpy as np


def main():
    import jax

    from verifiable_mpc_tpu import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint
    from verifiable_mpc_tpu.ops import msm as msm_mod
    from verifiable_mpc_tpu.ops import msm_pallas as mp

    rng = np.random.RandomState(7)
    g = EdwardsPoint.generator
    n = 1 << 14
    chunk = 128
    pts_small = [g ** int(e) for e in rng.randint(1, 1 << 62, 256)]
    pts = [pts_small[i % 256] for i in range(n)]
    scalars = [int.from_bytes(rng.bytes(31), "little") % ELL for _ in range(n)]
    dev_pts = mp.ED.encode(pts)
    digits = jnp.asarray(mp._scalar_digits_signed(scalars))
    nw = msm_mod.NWINDOWS

    for sub in (8, 32):
        steps = n // (chunk * sub)
        prep = mp._prep_call(mp.ED, n, chunk, sub, nw)
        step_fn = mp._chunk_call(mp.ED, chunk, sub, nw, False)
        tail_fn = mp._tail_call(mp.ED, chunk, nw, False)
        init_fn = mp._acc_init(mp.ED, chunk, nw)

        t0 = time.perf_counter()
        ptss, digs = prep(dev_pts, digits)
        acc = init_fn()
        acc = step_fn(digs[0], ptss[0], acc)
        jax.block_until_ready(acc)
        print(f"sub={sub}: compile+first step {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.perf_counter()
        out = tail_fn(acc)
        _ = np.asarray(out)
        print(f"sub={sub}: compile+first tail {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

        # steady state: full msm
        for rep in range(3):
            t0 = time.perf_counter()
            acc = init_fn()
            for i in range(steps):
                acc = step_fn(digs[i], ptss[i], acc)
            out = tail_fn(acc)
            _ = np.asarray(out)
            dt = time.perf_counter() - t0
            print(
                f"sub={sub} rep{rep}: full msm {dt*1e3:.1f} ms "
                f"({n/dt:.0f} pts/s; {steps} steps -> {dt/steps*1e3:.2f} ms/step)",
                file=sys.stderr,
            )
        # tail alone, steady
        t0 = time.perf_counter()
        for _ in range(3):
            out = tail_fn(acc)
            _ = np.asarray(out)
        print(f"sub={sub}: tail steady {(time.perf_counter()-t0)/3*1e3:.1f} ms",
              file=sys.stderr)

        # how async is dispatch? time the launch loop without materializing
        t0 = time.perf_counter()
        acc2 = init_fn()
        for i in range(steps):
            acc2 = step_fn(digs[i], ptss[i], acc2)
        t_disp = time.perf_counter() - t0
        out = tail_fn(acc2)
        t_tail = time.perf_counter() - t0 - t_disp
        _ = np.asarray(out)
        t_all = time.perf_counter() - t0
        print(
            f"sub={sub}: step-dispatch {t_disp*1e3:.1f} ms, tail-dispatch "
            f"{t_tail*1e3:.1f} ms, +materialize -> {t_all*1e3:.1f} ms",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
