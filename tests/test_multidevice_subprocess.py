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
        # full-suite mode: the child was launched at collection time so its
        # interpret-mode compiles overlap the main suite (VERDICT r4 #8);
        # here we only join it and check the result
        proc, log_path = conftest.CHILD
        try:
            rc = proc.wait(timeout=5400)
        except subprocess.TimeoutExpired:
            proc.kill()
            raise
        with open(log_path) as f:
            out = f.read()
        tail = out[-3000:]
        assert rc == 0, tail
    else:
        paths = [os.path.join(HERE, f"{m}.py") for m in MULTIDEVICE_MODULES]
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider"]
            + paths,
            capture_output=True,
            text=True,
            # the child compiles every interpret-mode kernel fresh (~45 min
            # on 4 idle cores) and shares those cores with whatever else
            # runs — a 1 h cap flaked under concurrent bench load (round 4)
            timeout=5400,
        )
        out = r.stdout
        tail = (r.stdout[-3000:], r.stderr[-1500:])
        assert r.returncode == 0, tail
    summary = [line for line in out.splitlines() if " passed" in line]
    assert summary, tail
    assert "failed" not in summary[-1], tail
    print(f"child summary: {summary[-1]}")
