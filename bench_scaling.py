"""MSM / full-prove scaling over a device mesh at ndev 1/2/4/8.

Default: the mesh-sharded MSM (parallel/mesh.py: per-shard partial MSM +
all_gather + tree reduce) at each mesh size, reporting parallel efficiency
rate(d) / (d * rate(1)).

``--prove``: the COMPLETE sharded AC20 prove (enable_multichip wires the
sharded MSM/fold into every protocol hot path) at each mesh size, with the
per-phase wall split — the prove-side scaling evidence VERDICT r4 #6 asked
for on top of the MSM-only sweep.  Proof bytes are asserted identical
across mesh sizes (same guarantee tests/test_multichip_prover.py pins).

On this environment only ONE real TPU chip exists, so the sweep runs on the
virtual 8-device CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count).
That validates the sharding/collective program end-to-end and exposes the
collective overhead trend, but absolute efficiency is bounded by the 4
physical cores backing the 8 virtual devices — a real ICI mesh has per-chip
compute. The same program runs unchanged on a TPU slice (set
SCALING_BACKEND=tpu on real multi-chip hardware).

Prints ONE JSON line:
    {"metric": "msm_mesh_scaling", "value": <efficiency@max_ndev>, ...,
     "table": {"1": rate, "2": rate, ...}}
"""

import json
import os
import sys
import time


def prove_sweep():
    """Full sharded AC20 prove at each mesh size (virtual CPU mesh)."""
    import jax

    import verifiable_mpc_tpu
    from verifiable_mpc_tpu import rng as vrng, serialization
    from verifiable_mpc_tpu.fields import GF
    from verifiable_mpc_tpu.groups import EllipticCurve
    from verifiable_mpc_tpu.parallel import mesh as pmesh
    import verifiable_mpc_tpu.ac20.circuit_builder as cb
    import verifiable_mpc_tpu.ac20.circuit_sat_cb as cs

    log2n = int(os.environ.get("SCALING_LOG2_MULS", "8"))
    n_muls = 1 << log2n
    group = EllipticCurve("Ed25519", "projective")
    gf = GF(group.order)

    circuit = cb.Circuit()
    x0 = cb.CircuitVar(gf(3), circuit, "x")
    acc = x0
    for _ in range(n_muls - 1):
        acc = acc * acc + 1
    (acc * x0).label_output("out")
    check, padding, g_length = cs.check_input_length_power_of_2(
        circuit.initial_inputs(), circuit
    )
    for i in range(padding):
        cb.CircuitVar(gf(0), circuit, "unused_" + str(i))
    xs = circuit.initial_inputs()
    with vrng.deterministic(99):
        generators = cs.create_generators(
            g_length, cs.PivotChoice.compressed, group
        )

    if os.environ.get("SCALING_PROVE_NDEV") is None:
        # one subprocess per mesh size: XLA:CPU exhausts its JIT memory
        # compiling the many per-size shard_map programs of four meshes in
        # one process (LLVM "Cannot allocate memory", round-5 run)
        import subprocess

        results = {}
        blobs = set()
        for d in (1, 2, 4, 8):
            env = dict(os.environ, SCALING_PROVE_NDEV=str(d))
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--prove"],
                capture_output=True, text=True, env=env, timeout=3600,
            )
            sys.stderr.write(r.stderr[-2000:])
            if r.returncode != 0:
                print(f"ndev={d}: FAILED", file=sys.stderr)
                continue
            line = json.loads(r.stdout.strip().splitlines()[-1])
            results[d] = line["prove_seconds"][str(d)]
            blobs.add(line["proof_digest"])
        assert len(blobs) <= 1, f"proof digests diverge: {blobs}"
        dmax = max(results)
        record = {
            "metric": "ac20_prove_mesh_scaling_efficiency",
            "value": round(
                results[min(results)] * min(results) / (results[dmax] * dmax),
                3,
            ),
            "unit": f"fraction_at_{dmax}_devices",
            "log2_muls": int(os.environ.get("SCALING_LOG2_MULS", "8")),
            "backend": "cpu",
            "prove_seconds": {str(d): t for d, t in results.items()},
        }
        print(json.dumps(record), flush=True)
        return

    ndevs = [int(os.environ["SCALING_PROVE_NDEV"])]
    times, expect = {}, None
    for d in ndevs:
        # shard only the at-scale MSMs/folds (the commitment sizes); tiny
        # compression tails stay host-side — the production split, and it
        # bounds the per-mesh XLA compile count
        verifiable_mpc_tpu.enable_multichip(
            pmesh.default_mesh(d), min_msm_batch=max(64, n_muls // 2),
            fused=False, chunk=max(1, 32 // d),
        )

        def prove():
            with vrng.deterministic(1234):
                return cs.circuit_sat_prover(
                    generators, circuit, xs, gf, cs.PivotChoice.compressed
                )

        proof = prove()  # compile + warm
        blob = serialization.dumps(proof["pivot_proof"]["z_prime"])
        if expect is None:
            expect = blob
        else:
            assert blob == expect, f"prove mismatch at ndev={d}"
        t0 = time.perf_counter()
        prove()
        times[d] = time.perf_counter() - t0
        eff = times[ndevs[0]] * ndevs[0] / (times[d] * d)
        print(
            f"ndev={d}: prove {times[d]:.2f}s (efficiency {eff:.2f})",
            file=sys.stderr,
        )
    import hashlib

    dmax = ndevs[-1]
    record = {
        "metric": "ac20_prove_mesh_scaling_efficiency",
        "value": round(times[ndevs[0]] * ndevs[0] / (times[dmax] * dmax), 3),
        "unit": f"fraction_at_{dmax}_devices",
        "log2_muls": log2n,
        "backend": jax.default_backend(),
        "prove_seconds": {str(d): round(t, 2) for d, t in times.items()},
        "proof_digest": hashlib.sha256(expect).hexdigest()[:16],
    }
    print(json.dumps(record), flush=True)


def main():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    if os.environ.get("SCALING_BACKEND", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if "--prove" in sys.argv:
        return prove_sweep()

    import numpy as np

    from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint
    from verifiable_mpc_tpu.parallel import mesh as pmesh

    log2n = int(os.environ.get("SCALING_LOG2_N", "12"))
    n = 1 << log2n
    chunk = 32
    rng = np.random.RandomState(3)
    g = EdwardsPoint.generator
    base = [g ** int(e) for e in rng.randint(1, 1 << 62, 256)]
    pts = [base[i % 256] for i in range(n)]
    scalars = [int.from_bytes(rng.bytes(31), "little") % ELL for _ in range(n)]

    ndevs = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    rates = {}
    expect = None
    for d in ndevs:
        mesh = pmesh.default_mesh(d)
        # compile + warm
        out = pmesh.sharded_msm(pts, scalars, mesh=mesh, chunk=chunk)
        if expect is None:
            expect = out
        else:
            assert out == expect, f"sharded MSM mismatch at ndev={d}"
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = pmesh.sharded_msm(pts, scalars, mesh=mesh, chunk=chunk)
        dt = (time.perf_counter() - t0) / reps
        rates[d] = n / dt
        eff = rates[d] / (d * rates[1])
        print(
            f"ndev={d}: {dt:.3f}s/msm -> {rates[d]:.0f} pts/s"
            f" (efficiency {eff:.2f})",
            file=sys.stderr,
        )

    dmax = ndevs[-1]
    record = {
        "metric": "msm_mesh_scaling_efficiency",
        "value": round(rates[dmax] / (dmax * rates[1]), 3),
        "unit": f"fraction_at_{dmax}_devices",
        "log2_n": log2n,
        "backend": jax.default_backend(),
        "points_per_sec": {str(d): round(r, 1) for d, r in rates.items()},
    }
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
