"""Multi-host DCN dryrun: N processes x D virtual CPU devices each.

Worker mode (spawned per "host"):
    python probes/dryrun_multihost.py --worker <pid> <nproc> <port>

Launcher mode (default): spawns the workers, waits, checks every worker
verified the sharded-MSM result against the host reduction.  This is the
degenerate-mode stand-in for a real multi-host TPU pod (SURVEY.md §5.8):
on hardware only the coordinator address changes.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NPROC = 2
LOCAL_DEVICES = 4


def worker(pid: int, nproc: int, port: int) -> int:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from verifiable_mpc_tpu.parallel import multihost

    nproc_seen, ndev = multihost.initialize(
        f"localhost:{port}", nproc, pid, local_device_count=LOCAL_DEVICES,
        platform="cpu",
    )
    assert nproc_seen == nproc, nproc_seen
    assert ndev == nproc * LOCAL_DEVICES, ndev

    import numpy as np

    from verifiable_mpc_tpu.groups.edwards import EdwardsPoint

    rng = np.random.RandomState(17)  # identical on every process
    n = 64
    g = EdwardsPoint.generator
    pts = [g ** int(e) for e in rng.randint(1, 1 << 20, n)]
    scalars = [int(s) for s in rng.randint(1, 1 << 20, n)]

    mesh = multihost.dcn_mesh()
    got = multihost.sharded_msm_multihost(pts, scalars, mesh=mesh)
    expect = EdwardsPoint.identity
    for p, s in zip(pts, scalars):
        expect = expect * (p ** s)
    assert got == expect, "multi-host sharded MSM mismatch"
    print(f"worker {pid}: ok ({nproc} processes x {LOCAL_DEVICES} devices)")
    return 0


def launch(nproc: int = NPROC, port: int = 59123) -> int:
    procs = []
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    for pid in range(nproc):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--worker",
                    str(pid),
                    str(nproc),
                    str(port),
                ],
                env=env,
            )
        )
    rcs = [p.wait(timeout=600) for p in procs]
    ok = all(rc == 0 for rc in rcs)
    print("dryrun_multihost:", "ok" if ok else f"FAILED rcs={rcs}")
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        sys.exit(worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])))
    sys.exit(launch())
