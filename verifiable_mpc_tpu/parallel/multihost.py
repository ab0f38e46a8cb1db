"""Multi-host (DCN) leg of the sharded MSM — SURVEY.md §5.8.

Within one MPC party, a multi-host TPU pod runs one process per host under
``jax.distributed``: ICI carries the collectives inside a slice, DCN the
cross-host legs.  The sharded-MSM program itself is UNCHANGED from
parallel/mesh.py — a mesh axis laid over all global devices spans hosts
transparently under GSPMD; what multi-host adds is

* :func:`initialize` — ``jax.distributed.initialize`` bootstrap, and
* global-array construction: a host can only ``device_put`` onto its own
  addressable devices, so the partitioned bases/digits are assembled with
  ``jax.make_array_from_process_local_data`` (each process contributes the
  rows of its shard) instead of the single-process ``device_put``.

No multi-host hardware exists in this environment; the code path is
exercised end-to-end by a 2-process x 4-virtual-CPU-device dryrun
(tests/test_multihost_subprocess.py, probes/dryrun_multihost.py) — the
same degenerate-mode trick the virtual 8-device mesh uses for ICI.  On
real hardware the only change is the coordinator address and
``jax.local_devices()`` counts.
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_device_count: int | None = None,
               platform: str | None = None):
    """Bootstrap the distributed runtime (idempotent per process).

    On CPU test rigs pass ``local_device_count`` to carve virtual devices
    and ``platform="cpu"`` (the env var alone is overridden by the axon
    sitecustomize — the config update must land before the first backend
    touch); on real TPU hosts leave both None."""
    import os

    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        want = f"--xla_force_host_platform_device_count={local_device_count}"
        if "--xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    import jax

    if platform is not None:
        jax.config.update("jax_platforms", platform)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count(), len(jax.devices())


def dcn_mesh(axis: str = "shard"):
    """1-D mesh over ALL global devices, host-major: contiguous shard rows
    land on one host's devices, so the all_gather's cross-host leg moves
    exactly one partial point per host over DCN."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def _global_array(local_np: np.ndarray, mesh, spec):
    """Assemble a global array from per-process local rows."""
    import jax
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.ascontiguousarray(local_np)
    )


def sharded_msm_multihost(points, scalars, mesh=None, chunk: int = 4,
                          axis: str = "shard"):
    """MSM over a (possibly) multi-host mesh.

    ``points``/``scalars`` are the FULL vectors, replicated host-side on
    every process (the AC20 protocol state is host-replicated per party);
    each process uploads only its addressable shards.  Same kernel,
    all_gather + tree-reduce combine as parallel/mesh.sharded_msm."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ..groups.edwards import EdwardsPoint
    from ..ops import curve_ed as ced
    from ..ops import msm as msm_mod
    from . import mesh as pmesh

    mesh = mesh or dcn_mesh(axis)
    ndev = mesh.shape[axis]
    n = len(points)
    granule = ndev * chunk
    pad = (-n) % granule
    if pad:
        points = list(points) + [EdwardsPoint.identity] * pad
        scalars = list(scalars) + [0] * pad
    n += pad

    # host-side encode of the full vectors, then shard-local upload
    pts_np = [np.asarray(a) for a in ced.encode_points(points)]
    digits_np = np.asarray(msm_mod._scalar_digits(scalars))

    nproc = jax.process_count()
    pid = jax.process_index()
    rows = n // nproc
    lo, hi = pid * rows, (pid + 1) * rows
    dev_pts = tuple(
        _global_array(a[lo:hi], mesh, P(axis)) for a in pts_np
    )
    digits = _global_array(digits_np[:, lo:hi], mesh, P(None, axis))

    out = pmesh._sharded_msm_kernel(n, chunk, mesh, axis)(dev_pts, digits)
    # out_specs P(): replicated — every process holds the full result
    return ced.decode_point(tuple(np.asarray(a) for a in out))
