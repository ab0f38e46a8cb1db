"""Profile the 3-party TCP AC20 prove: where do the minutes go?

Spawns parties 1..m-1 plainly and runs party 0 under cProfile, printing
its cumulative-time hot spots.  Usage:
    python probes/probe_mpc_tcp.py [log2_n=8]
"""

import cProfile
import io
import os
import pstats
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEMO = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "demos",
    "demo_zkp_mpc_ac20.py",
)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    if "--native" in sys.argv:
        import verifiable_mpc_tpu

        verifiable_mpc_tpu.enable_native()
    n = 1 << k
    m = 3
    port = 57341
    others = [
        subprocess.Popen(
            [
                sys.executable, DEMO, "--tcp", "--elliptic", f"-M{m}",
                f"-n{n}", f"-I{i}", f"--port={port}",
            ]
        )
        for i in range(1, m)
    ]

    from verifiable_mpc_tpu.mpc.transport import run_tcp_party

    sys.argv = [DEMO]
    import importlib.util

    spec = importlib.util.spec_from_file_location("demo_mpc", DEMO)
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)
    import verifiable_mpc_tpu.ac20.circuit_sat_cb as cs

    t0 = time.perf_counter()
    prof = cProfile.Profile()
    prof.enable()
    rc = run_tcp_party(
        lambda: demo._tcp_party_main(cs.PivotChoice.compressed, "Elliptic", n),
        0,
        m,
        base_port=port,
    )
    prof.disable()
    wall = time.perf_counter() - t0
    for p in others:
        p.wait(timeout=60)
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(40)
    print(s.getvalue()[:8000])
    print(f"party-0 wall: {wall:.1f}s rc={rc} n={n}")


if __name__ == "__main__":
    main()
