"""Dev probe: VPU throughput of u32 mul / f32 fma / mont_mul on the TPU.

Decides the fused-MSM arithmetic representation: if u32 multiply is a
fraction of f32 fma rate, an 8-bit-limb f32 representation wins despite
doubling the limb count.
"""

import sys
import time

import numpy as np


def main():
    import jax

    from verifiable_mpc_tpu import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), file=sys.stderr)

    SHAPE = (64, 1024)  # 65k elements
    ITERS = 1_000_000  # compute must dwarf the ~32 ms tunnel launch overhead

    def mk(body_fn, dtype):
        def kernel(x_ref, y_ref, o_ref):
            def body(_, x):
                return body_fn(x, y_ref[:])

            o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

        @jax.jit
        def run(x, y):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(SHAPE, dtype),
            )(x, y)

        return run

    rng = np.random.RandomState(0)
    xu = jnp.asarray(rng.randint(1, 1 << 15, SHAPE).astype(np.uint32))
    yu = jnp.asarray(rng.randint(1, 1 << 15, SHAPE).astype(np.uint32))
    xf = jnp.asarray(rng.rand(*SHAPE).astype(np.float32))
    yf = jnp.asarray(rng.rand(*SHAPE).astype(np.float32))

    cases = {
        # x*y masked like a limb product split (the mul_wide inner op)
        "u32_mul_split": (
            mk(lambda x, y: ((x * y) & 0xFFFF) + ((x * y) >> 16), jnp.uint32),
            xu, yu, 4,
        ),
        "u32_mul": (mk(lambda x, y: x * y + jnp.uint32(1), jnp.uint32), xu, yu, 2),
        "u32_add": (mk(lambda x, y: (x + y) ^ x, jnp.uint32), xu, yu, 2),
        "f32_fma": (mk(lambda x, y: x * y + x, jnp.float32), xf, yf, 2),
    }
    for name, (run, x, y, nops) in cases.items():
        out = run(x, y)
        jax.block_until_ready(out)
        # warm
        _ = np.asarray(run(x, y))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            _ = np.asarray(run(x, y))
        dt = (time.perf_counter() - t0) / reps
        rate = ITERS * np.prod(SHAPE) * nops / dt
        print(f"{name}: {dt*1e3:.2f} ms -> {rate/1e9:.1f} Gop/s", file=sys.stderr)

    # field muls on a [16, 64, 128] tile: Montgomery REDC vs pseudo-Mersenne
    from verifiable_mpc_tpu.ops import limbs_lm as lm
    from verifiable_mpc_tpu.groups.edwards import P as ED_P

    p_limbs = lm.int_to_scalar_limbs(ED_P)
    n_prime = lm.int_to_scalar_limbs((-pow(ED_P, -1, 1 << 256)) % (1 << 256))
    M_ITERS = 2000
    MB = (16, 64, 128)

    def mk_field(body_fn):
        def kernel(x_ref, y_ref, o_ref):
            y = y_ref[:]

            def body(_, x):
                return body_fn(x, y)

            o_ref[:] = jax.lax.fori_loop(0, M_ITERS, body, x_ref[:])

        @jax.jit
        def run(x, y):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(MB, jnp.uint32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )(x, y)

        return run

    field_cases = {
        "mont_mul": mk_field(lambda x, y: lm.mont_mul(x, y, p_limbs, n_prime)),
        "mul25519": mk_field(lm.mul25519),
    }
    xm = jnp.asarray(rng.randint(0, 1 << 16, MB).astype(np.uint32))
    ym = jnp.asarray(rng.randint(0, 1 << 16, MB).astype(np.uint32))
    for name, run in field_cases.items():
        out = run(xm, ym)
        jax.block_until_ready(out)
        _ = np.asarray(run(xm, ym))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            _ = np.asarray(run(xm, ym))
        dt = (time.perf_counter() - t0) / reps
        per_lane = MB[1] * MB[2]
        rate = M_ITERS * per_lane / dt
        print(
            f"{name}[16,64,128] x{M_ITERS}: {dt*1e3:.2f} ms -> "
            f"{rate/1e6:.2f} M fieldmul-lanes/s",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
