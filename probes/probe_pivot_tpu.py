"""Hardware validation of the TPU-resident protocol-4 engine.

Runs the full AC20 compressed prove twice at 2^K muls under the SAME
deterministic randomness — once on the C++ host tier, once with the TPU
backend (resident engine + hybrid dispatch) — and asserts

* identical z_prime (byte-level scalar equality),
* group-equal (normalized) A_i/B_i per round — the raw representatives
  legitimately differ between the C++ Pippenger and the TPU signed-window
  MSM; every hash site canonicalizes,
* both proofs verify under the TPU-enabled verifier (exercising the
  resident verifier loop).

Usage: python probes/probe_pivot_tpu.py [K=12]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import verifiable_mpc_tpu
from verifiable_mpc_tpu import rng as vrng
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve
import verifiable_mpc_tpu.ac20.circuit_builder as cb
import verifiable_mpc_tpu.ac20.circuit_sat_cb as cs


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    n_muls = 1 << K
    verifiable_mpc_tpu.enable_compile_cache()
    assert verifiable_mpc_tpu.enable_native(), "need the C++ tier"

    group = EllipticCurve("Ed25519", "projective")
    gf = GF(group.order)
    circuit = cb.Circuit()
    x = cb.CircuitVar(gf(3), circuit, "x")
    acc = x
    for _ in range(n_muls - 1):
        acc = acc * acc + 1
    (acc * x).label_output("out")
    xs = circuit.initial_inputs()
    _, padding, g_length = cs.check_input_length_power_of_2(xs, circuit)
    for i in range(padding):
        cb.CircuitVar(gf(0), circuit, f"unused_{i}")
    xs = circuit.initial_inputs()

    with vrng.deterministic(1234):
        gens = cs.create_generators(g_length, cs.PivotChoice.compressed, group)

    t0 = time.perf_counter()
    with vrng.deterministic(777):
        proof_native = cs.circuit_sat_prover(
            gens, circuit, xs, gf, cs.PivotChoice.compressed
        )
    t_native = time.perf_counter() - t0

    from verifiable_mpc_tpu.ac20 import pivot_tpu

    verifiable_mpc_tpu.enable_tpu()
    assert pivot_tpu.ENABLED, "TPU engine not enabled"

    t0 = time.perf_counter()
    with vrng.deterministic(777):
        proof_tpu = cs.circuit_sat_prover(
            gens, circuit, xs, gf, cs.PivotChoice.compressed
        )
    t_tpu_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    with vrng.deterministic(777):
        proof_tpu2 = cs.circuit_sat_prover(
            gens, circuit, xs, gf, cs.PivotChoice.compressed
        )
    t_tpu = time.perf_counter() - t0

    pn = proof_native["pivot_proof"]
    ptv = proof_tpu["pivot_proof"]
    assert ptv["z_prime"] == pn["z_prime"], (
        "z_prime mismatch: challenges diverged between engines"
    )
    rounds = sorted(
        k for k in pn if k.startswith("A") and k[1:].isdigit()
    )
    for kk in rounds:
        a_n, a_t = pn[kk].normalize(), ptv[kk].normalize()
        assert a_n == a_t, f"{kk} normalized mismatch"
        b_n = pn["B" + kk[1:]].normalize()
        b_t = ptv["B" + kk[1:]].normalize()
        assert b_n == b_t, f"B{kk[1:]} normalized mismatch"
    assert proof_tpu2["pivot_proof"]["z_prime"] == pn["z_prime"]
    print(f"engine identity OK over {len(rounds)} rounds")

    t0 = time.perf_counter()
    v = cs.circuit_sat_verifier(
        proof_tpu, gens, circuit, gf, cs.PivotChoice.compressed
    )
    t_verify = time.perf_counter() - t0
    ok = all(
        x2 if not isinstance(x2, dict) else all(x2.values())
        for x2 in v.values()
    )
    assert ok, v
    print(
        f"K={K}: native prove {t_native:.2f}s; tpu prove cold {t_tpu_cold:.2f}s"
        f" warm {t_tpu:.2f}s; tpu verify {t_verify:.2f}s; verified {ok}"
    )


if __name__ == "__main__":
    main()
