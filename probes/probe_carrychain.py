"""Carry-chain ceiling microbenchmark (VERDICT r4 #9).

The fused MSM kernel sustains ~3-5% of VPU multiply peak; ROADMAP claims
the blocker is Mosaic-level scheduling of the 16-limb multiply/carry
pipeline, which Pallas does not expose.  This probe isolates exactly that
pipeline — ops/limbs_lm.mul25519 (column products + x38 pseudo-Mersenne
fold + sequential carry) — in a standalone Pallas kernel and measures:

* ``chain``  — one dependent chain a <- a*b: the dependency shape inside a
  group add/double (the MSM inner loop), latency-exposed;
* ``ilp4``   — four independent chains interleaved in one kernel: the
  instruction-level parallelism a better scheduler could extract across
  independent field muls WITHIN the existing algorithm;
* ``raw``    — bare u32 multiply throughput on the same tile: the machine
  ceiling reference (probe_vpu.py measures the same quantity).

Interpretation: if ilp4/chain >> 1, the pipeline is latency/scheduling
bound and Mosaic-level control (or manual cross-op interleaving) is worth
real speedup; if ilp4 ~ chain ~ a large fraction of raw, the VPU is
already saturated and the >=1.5M pts/s target is compute-bound on this
representation.

Usage: python probes/probe_carrychain.py [ITERS=20000]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# ops per mul25519 on a [16, *B] operand, in units of full-[*B]-tile vector
# instructions (counted from ops/limbs_lm.py: _mul_cols 16 iters x 16-row
# product + mask/shift/accumulate, reduce25519 fold + two carry passes)
MULS_PER_FIELD_MUL = 272  # 16x16 limb products + 16 x38-fold muls
ROWOPS_PER_FIELD_MUL = 1600  # all vector ops (mul + and + shift + add)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20000

    from verifiable_mpc_tpu import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from verifiable_mpc_tpu.ops import limbs_lm as lm

    print("backend:", jax.default_backend(), file=sys.stderr)
    B = (8, 128)
    lanes = B[0] * B[1]
    shape = (16,) + B

    def mk_chain(k_chains):
        def kernel(*refs):
            ins = [r[:] for r in refs[:k_chains]]
            b = refs[k_chains][:]
            outs = refs[k_chains + 1 :]

            def body(_, st):
                return tuple(lm.mul25519(a, b) for a in st)

            res = jax.lax.fori_loop(0, iters, body, tuple(ins))
            for o, r in zip(outs, res):
                o[:] = r

        @jax.jit
        def run(*args):
            return pl.pallas_call(
                kernel,
                out_shape=[jax.ShapeDtypeStruct(shape, jnp.uint32)] * k_chains,
            )(*args)

        return run

    def mk_raw():
        def kernel(x_ref, y_ref, o_ref):
            def body(_, x):
                return x * y_ref[:] + jnp.uint32(1)

            o_ref[:] = jax.lax.fori_loop(0, iters * 64, body, x_ref[:])

        @jax.jit
        def run(x, y):
            return pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32)
            )(x, y)

        return run

    rng = np.random.RandomState(7)

    def operand():
        return jnp.asarray(rng.randint(0, 1 << 16, shape).astype(np.uint32))

    # tunnel timing methodology (see bench.py): block_until_ready is
    # unreliable and identical launches dedupe — time fully-materialized
    # runs over DISTINCT inputs, subtract nothing (compute must dwarf the
    # ~25 ms round trip, hence large ITERS)
    results = {}
    for name, k in (("chain", 1), ("ilp4", 4)):
        run = mk_chain(k)
        variants = [
            [operand() for _ in range(k)] + [operand()] for _ in range(4)
        ]
        t0 = time.perf_counter()
        _ = [np.asarray(o) for o in run(*variants[0])]
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        best = float("inf")
        for r in range(1, 4):
            t0 = time.perf_counter()
            _ = [np.asarray(o) for o in run(*variants[r])]
            best = min(best, time.perf_counter() - t0)
        fmuls = iters * k
        rate = fmuls / best  # field muls / s (per [8,128] tile = 1024 lanes)
        results[name] = rate
        print(
            f"{name}: {best:.3f}s for {fmuls} field muls x {lanes} lanes "
            f"-> {rate * lanes / 1e9:.2f} G fieldmul-lanes/s",
            file=sys.stderr,
        )

    raw = mk_raw()
    variants = [(operand(), operand()) for _ in range(4)]
    t0 = time.perf_counter()
    _ = np.asarray(raw(*variants[0]))
    print(f"raw: compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    best = float("inf")
    for r in range(1, 4):
        t0 = time.perf_counter()
        _ = np.asarray(raw(*variants[r]))
        best = min(best, time.perf_counter() - t0)
    raw_mulps = iters * 64 * 16 * lanes / best  # u32 mults/s (16 rows/iter)
    print(f"raw u32 mul: {raw_mulps/1e12:.3f} T mults/s", file=sys.stderr)

    for name, rate in results.items():
        eff_mulps = rate * MULS_PER_FIELD_MUL * lanes
        util = eff_mulps / raw_mulps
        print(
            f"{name}: {rate:.0f} field muls/s/tile, multiply-op utilization "
            f"{100*util:.1f}% of raw u32 peak "
            f"(row-op rate {rate * ROWOPS_PER_FIELD_MUL * lanes / 1e12:.3f} T/s)",
        )
    print(
        f"ilp4/chain speedup: {results['ilp4']/results['chain']:.2f}x "
        f"(>1.5 => latency/scheduling-bound; ~1 => VPU-saturated)"
    )


if __name__ == "__main__":
    main()
