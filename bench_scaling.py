"""MSM scaling over a device mesh: points/s and efficiency at ndev 1/2/4/8.

Runs the mesh-sharded MSM (parallel/mesh.py: per-shard partial MSM +
all_gather + tree reduce) at each mesh size and reports parallel efficiency
rate(d) / (d * rate(1)).

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


def main():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    if os.environ.get("SCALING_BACKEND", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")

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
