"""Multi-host (DCN) dryrun in CI: 2 ``jax.distributed`` processes x 4
virtual CPU devices each, running the sharded MSM over a host-spanning
mesh (parallel/multihost.py, SURVEY.md §5.8).

Runs via the probe's launcher in fresh interpreters: jax.distributed
must initialize before any backend touch, which an in-process test under
this suite's already-initialized CPU backend cannot do."""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(__file__)
PROBE = os.path.join(HERE, os.pardir, "probes", "dryrun_multihost.py")


@pytest.mark.timeout(900)
def test_two_process_dcn_dryrun():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, PROBE],
        capture_output=True,
        text=True,
        timeout=860,
        env=env,
    )
    tail = (r.stdout[-2000:], r.stderr[-1500:])
    assert r.returncode == 0, tail
    assert "dryrun_multihost: ok" in r.stdout, tail
