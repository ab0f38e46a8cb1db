"""MPC prover integration tests.

Mirrors reference test/test_demo_zkp_mpc_ac20.py (single-party degenerate
mode across pivot/group configurations) and additionally exercises genuine
3-party SPMD execution over the in-process hub — the analogue of running the
reference demo with -M3.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demos"))

import demo_zkp_mpc_ac20 as demo
import verifiable_mpc_tpu.ac20.circuit_sat_cb as cs
from verifiable_mpc_tpu.mpc.runtime import mpc, run_multi


def _ok(verification):
    return all(demo._leaves(verification))


def test_mpc_demo_compressed_elliptic_1party():
    v = mpc.run(demo.main(cs.PivotChoice.compressed, "Elliptic", 3, verbose=False))
    assert _ok(v), v


def test_mpc_demo_pivot_elliptic_1party():
    v = mpc.run(demo.main(cs.PivotChoice.pivot, "Elliptic", 3, verbose=False))
    assert _ok(v), v


def test_mpc_demo_koe_1party():
    v = mpc.run(demo.main(cs.PivotChoice.koe, None, 3, verbose=False))
    assert _ok(v), v


def test_mpc_demo_compressed_qr_1party():
    v = mpc.run(demo.main(cs.PivotChoice.compressed, "QR", 3, verbose=False))
    assert _ok(v), v


def test_mpc_demo_pivot_qr_1party():
    v = mpc.run(demo.main(cs.PivotChoice.pivot, "QR", 3, verbose=False))
    assert _ok(v), v


def test_mpc_demo_compressed_elliptic_3party():
    results = run_multi(
        lambda: demo.main(cs.PivotChoice.compressed, "Elliptic", 3, verbose=False),
        3,
    )
    assert len(results) == 3
    for v in results:
        assert _ok(v), v
