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


def worker_prove(pid: int, nproc: int, port: int) -> int:
    """Complete AC20 prove with the commitment MSMs on the DCN mesh
    (VERDICT r4 #6: the prove-side multi-host dryrun).  Every process runs
    the same SPMD prover (deterministic randomness -> identical challenges)
    and prints the proof digest; the launcher asserts they agree."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import hashlib

    from verifiable_mpc_tpu.parallel import multihost

    nproc_seen, ndev = multihost.initialize(
        f"localhost:{port}", nproc, pid, local_device_count=LOCAL_DEVICES,
        platform="cpu",
    )
    assert nproc_seen == nproc, nproc_seen

    from verifiable_mpc_tpu import rng as vrng, serialization
    from verifiable_mpc_tpu.fields import GF
    from verifiable_mpc_tpu.groups import EllipticCurve
    from verifiable_mpc_tpu.groups.edwards import EdwardsPoint
    from verifiable_mpc_tpu.ops import dispatch
    import verifiable_mpc_tpu.ac20.circuit_builder as cb
    import verifiable_mpc_tpu.ac20.circuit_sat_cb as cs

    mesh = multihost.dcn_mesh()
    dispatch.register_msm_backend(
        EdwardsPoint,
        lambda p, s: multihost.sharded_msm_multihost(p, s, mesh=mesh),
        8,
    )

    group = EllipticCurve("Ed25519", "projective")
    gf = GF(group.order)
    circuit = cb.Circuit()
    x0 = cb.CircuitVar(gf(3), circuit, "x")
    acc = x0
    for _ in range(12):
        acc = acc * acc + 1
    (acc * x0).label_output("out")
    _, padding, g_length = cs.check_input_length_power_of_2(
        circuit.initial_inputs(), circuit
    )
    for i in range(padding):
        cb.CircuitVar(gf(0), circuit, "unused_" + str(i))
    xs = circuit.initial_inputs()
    with vrng.deterministic(7):
        generators = cs.create_generators(
            g_length, cs.PivotChoice.compressed, group
        )
    with vrng.deterministic(1234):
        proof = cs.circuit_sat_prover(
            generators, circuit, xs, gf, cs.PivotChoice.compressed
        )
    verification = cs.circuit_sat_verifier(
        proof, generators, circuit, gf, cs.PivotChoice.compressed
    )
    ok = all(
        v if not isinstance(v, dict) else all(v.values())
        for v in verification.values()
    )
    assert ok, verification
    digest = hashlib.sha256(
        serialization.dumps(proof["pivot_proof"]["z_prime"])
    ).hexdigest()[:16]
    print(f"worker {pid}: prove ok digest={digest}")
    return 0


def launch(nproc: int = NPROC, port: int = 59123, prove: bool = False) -> int:
    procs = []
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    mode = "--worker-prove" if prove else "--worker"
    for pid in range(nproc):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    mode,
                    str(pid),
                    str(nproc),
                    str(port),
                ],
                env=env,
                stdout=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    rcs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        sys.stdout.write(out)
        outs.append(out)
        rcs.append(p.returncode)
    ok = all(rc == 0 for rc in rcs)
    if ok and prove:
        digests = {
            line.split("digest=")[1]
            for out in outs
            for line in out.splitlines()
            if "digest=" in line
        }
        ok = len(digests) == 1
        if not ok:
            print(f"digest mismatch across processes: {digests}")
    print("dryrun_multihost:", "ok" if ok else f"FAILED rcs={rcs}")
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        sys.exit(worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])))
    if len(sys.argv) > 1 and sys.argv[1] == "--worker-prove":
        sys.exit(
            worker_prove(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        )
    sys.exit(launch(prove="--prove" in sys.argv))
