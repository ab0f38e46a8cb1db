"""Demo-as-integration tests (mirror of reference test/test_demo_zkp_ac20.py):
run the AC20 demo main() for all three pivots and assert every check passes.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demos"))

import demo_zkp_ac20 as demo
import verifiable_mpc_tpu.ac20.circuit_sat_cb as cs


def _flatten(verification):
    out = {}
    for key, value in verification.items():
        if isinstance(value, dict):
            out.update({f"{key}.{k}": v for k, v in value.items()})
        else:
            out[key] = value
    return out


def test_demo_compressed_qr():
    v = demo.main(cs.PivotChoice.compressed, n=3, group_choice="QR", verbose=False)
    assert all(_flatten(v).values()), v


def test_demo_compressed_elliptic():
    v = demo.main(cs.PivotChoice.compressed, n=3, group_choice="Elliptic", verbose=False)
    assert all(_flatten(v).values()), v


def test_demo_basic_pivot_elliptic():
    v = demo.main(cs.PivotChoice.pivot, n=3, group_choice="Elliptic", verbose=False)
    assert all(_flatten(v).values()), v


def test_demo_koe():
    v = demo.main(cs.PivotChoice.koe, n=3, verbose=False)
    assert all(_flatten(v).values()), v


def test_demo_proof_checkpoint(tmp_path):
    path = str(tmp_path / "proof.vmpc")
    v = demo.main(
        cs.PivotChoice.compressed,
        n=3,
        group_choice="Elliptic",
        verbose=False,
        save_proof=path,
    )
    assert all(_flatten(v).values()), v
    import os

    assert os.path.getsize(path) > 100
