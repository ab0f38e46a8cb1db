"""Trinocchio multi-party SNARK integration tests.

The reference ships no trinocchio test (SURVEY.md §4); here both the
single-party degenerate mode and genuine 3-party execution are covered.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demos"))

import demo_zkp_trinocchio as demo
from verifiable_mpc_tpu.mpc.runtime import mpc, run_multi


def test_trinocchio_1party():
    verifications = mpc.run(demo.main(verbose=False))
    assert all(verifications.values()), verifications


def test_trinocchio_3party():
    results = run_multi(lambda: demo.main(verbose=False), 3)
    assert len(results) == 3
    for verifications in results:
        assert all(verifications.values()), verifications


def test_trinocchio_non_zk_mode():
    verifications = mpc.run(demo.main(verbose=False, zk=False))
    assert all(verifications.values()), verifications


def test_trinocchio_zk_3party():
    results = run_multi(lambda: demo.main(verbose=False, zk=True), 3)
    for verifications in results:
        assert all(verifications.values()), verifications
