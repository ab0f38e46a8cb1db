"""Full-prover multi-chip identity: the COMPLETE AC20 circuit-sat prove,
with its MSM/fold hot path dispatched to the mesh-sharded kernels, must
produce a byte-identical proof on a 1-device and an 8-device mesh (and to
the host backend) — SURVEY.md §4(c), the analogue of the reference's m=1
degenerate-mode testing trick.

Pinned randomness (rng.deterministic) makes the proof a pure function of
the backend's group-element VALUES: any coordinate or ordering divergence
in the sharded path would change the Fiat-Shamir transcript and the bytes.
"""

import random

import jax
import pytest

from verifiable_mpc_tpu import enable_multichip, rng, serialization
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve
from verifiable_mpc_tpu.ops import dispatch
from verifiable_mpc_tpu.parallel import mesh as pmesh
import verifiable_mpc_tpu.ac20.circuit_builder as cb
import verifiable_mpc_tpu.ac20.circuit_sat_cb as cs

prng = random.Random(7)


@pytest.fixture(autouse=True)
def _restore_dispatch():
    """enable_multichip mutates process-global backend registries."""
    from verifiable_mpc_tpu.ops import ntt

    saved = (
        dict(dispatch._MSM_BACKENDS),
        dict(dispatch._FOLD_BACKENDS),
        dict(dispatch._BATCH_EXP_BACKENDS),
        ntt._MESH_BACKEND,
    )
    yield
    dispatch._MSM_BACKENDS.clear()
    dispatch._MSM_BACKENDS.update(saved[0])
    dispatch._FOLD_BACKENDS.clear()
    dispatch._FOLD_BACKENDS.update(saved[1])
    dispatch._BATCH_EXP_BACKENDS.clear()
    dispatch._BATCH_EXP_BACKENDS.update(saved[2])
    ntt._MESH_BACKEND = saved[3]


def _setup():
    group = EllipticCurve("Ed25519", "projective")
    gf = GF(group.order)
    circuit = cb.Circuit()
    x = cb.CircuitVar(gf(3), circuit, "x")
    acc = x
    # m=4 muls -> z-vector 15, g_hat 16: small enough that the per-mesh
    # XLA compiles (persistent cache off, see fixture) stay in CI budget
    for _ in range(3):
        acc = acc * acc + 1
    (acc * x).label_output("out")
    xs = circuit.initial_inputs()
    _, padding, g_length = cs.check_input_length_power_of_2(xs, circuit)
    for i in range(padding):
        cb.CircuitVar(gf(0), circuit, f"unused_{i}")
    xs = circuit.initial_inputs()
    with rng.deterministic(99):
        generators = cs.create_generators(
            g_length, cs.PivotChoice.compressed, group
        )
    return group, gf, circuit, xs, generators


def _canon(obj):
    """Canonical (normalized) representatives: backends legitimately
    compute different projective coordinates of the SAME group elements
    (serialization round-trips exact coordinates by design — transcripts
    hash reprs).  Fiat-Shamir hash sites normalize, so the challenges and
    scalars are byte-identical; points are compared normalized."""
    if hasattr(obj, "normalize"):
        return obj.normalize()
    if isinstance(obj, list):
        return [_canon(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _canon(v) for k, v in obj.items()}
    return obj


def _prove_bytes(circuit, xs, gf, generators) -> bytes:
    with rng.deterministic(1234):
        proof = cs.circuit_sat_prover(
            generators, circuit, xs, gf, cs.PivotChoice.compressed
        )
    return serialization.dumps(_canon(proof))


def test_full_prove_identical_on_1_and_8_device_mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    group, gf, circuit, xs, generators = _setup()

    host_bytes = _prove_bytes(circuit, xs, gf, generators)

    # chunk chosen so ndev*chunk = 32 on BOTH meshes: every protocol MSM
    # (sizes 9..16) pads to the same 32-point shape -> ONE XLA compile per
    # (kernel, mesh) instead of one per size
    enable_multichip(
        pmesh.default_mesh(1), min_msm_batch=8, fused=False, chunk=32
    )
    one_dev_bytes = _prove_bytes(circuit, xs, gf, generators)

    enable_multichip(
        pmesh.default_mesh(8), min_msm_batch=8, fused=False, chunk=4
    )
    eight_dev_bytes = _prove_bytes(circuit, xs, gf, generators)

    assert host_bytes == one_dev_bytes
    assert one_dev_bytes == eight_dev_bytes

    # and the 8-device proof verifies like any other
    with rng.deterministic(1234):
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
