"""Run the multi-device shard_map test modules in a CHILD pytest process.

XLA:CPU crashes when the multi-device shard_map program class and the rest
of this suite's compiles share one process (see tests/conftest.py for the
two observed failure signatures); each side is stable in its own process.
In a full suite run, conftest skips those modules here and this wrapper
executes them in a fresh interpreter — the child collects ONLY the
multi-device modules, so its conftest leaves them unskipped.
"""

import os
import subprocess
import sys

from conftest import MULTIDEVICE_MODULES

HERE = os.path.dirname(__file__)


def test_multidevice_modules_in_child_process():
    import conftest

    if conftest.CHILD is not None:
        # full-suite mode: per-module children were launched at collection
        # time so their interpret-mode compiles overlap the main suite
        # (VERDICT r4 #8); here we only join them and check the results
        for m, proc, log_path in conftest.CHILD:
            try:
                rc = proc.wait(timeout=5400)
            except subprocess.TimeoutExpired:
                proc.kill()
                raise
            with open(log_path) as f:
                out = f.read()
            tail = out[-3000:]
            assert rc == 0, (m, tail)
            summary = [ln for ln in out.splitlines() if " passed" in ln]
            assert summary, (m, tail)
            assert "failed" not in summary[-1], (m, tail)
            print(f"child {m}: {summary[-1]}")
        return
    for m in MULTIDEVICE_MODULES:
        r = subprocess.run(
            [
                sys.executable, "-m", "pytest", "-q", "-p",
                "no:cacheprovider", os.path.join(HERE, f"{m}.py"),
            ],
            capture_output=True,
            text=True,
            # each child compiles its interpret-mode kernels fresh and
            # shares cores with whatever else runs — generous cap
            timeout=5400,
        )
        out = r.stdout
        tail = (r.stdout[-3000:], r.stderr[-1500:])
        assert r.returncode == 0, (m, tail)
        summary = [ln for ln in out.splitlines() if " passed" in ln]
        assert summary, (m, tail)
        assert "failed" not in summary[-1], (m, tail)
        print(f"child {m}: {summary[-1]}")
