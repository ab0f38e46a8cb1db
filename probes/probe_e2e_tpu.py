"""Per-dispatch-call wall-time breakdown of a TPU-backend AC20 prove.

Wraps the registered MSM/fold/batch-exp backends with timers, runs the
bench_ac20 flow at --log2-muls K on the TPU, and prints call-count and
wall-time histograms per op and size bucket — the instrument for the
"where does the TPU end-to-end time go" analysis (VERDICT round-3 item 1).

Usage: python probes/probe_e2e_tpu.py [K] [--native]
"""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import verifiable_mpc_tpu
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve
import verifiable_mpc_tpu.ac20.circuit_builder as cb
import verifiable_mpc_tpu.ac20.circuit_sat_cb as cs
from verifiable_mpc_tpu.ops import dispatch

K = int(sys.argv[1]) if len(sys.argv) > 1 else 12
NATIVE = "--native" in sys.argv

if NATIVE:
    verifiable_mpc_tpu.enable_native()
else:
    verifiable_mpc_tpu.enable_compile_cache()
    verifiable_mpc_tpu.enable_tpu()

stats = defaultdict(lambda: [0, 0.0])


def _wrap(table, name):
    for cls, (fn, mb) in list(table.items()):
        def mk(fn, cls):
            def wrapped(*args):
                t0 = time.perf_counter()
                out = fn(*args)
                dt = time.perf_counter() - t0
                n = len(args[-1] if name == "bexp" else args[0])
                stats[(name, cls.__name__, n)][0] += 1
                stats[(name, cls.__name__, n)][1] += dt
                return out
            return wrapped
        table[cls] = (mk(fn, cls), mb)


_wrap(dispatch._MSM_BACKENDS, "msm")
_wrap(dispatch._FOLD_BACKENDS, "fold")
_wrap(dispatch._BATCH_EXP_BACKENDS, "bexp")

n_muls = 1 << K
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

t0 = time.perf_counter()
gens = cs.create_generators(g_length, cs.PivotChoice.compressed, group)
t1 = time.perf_counter()
proof = cs.circuit_sat_prover(gens, circuit, xs, gf, cs.PivotChoice.compressed)
t2 = time.perf_counter()
ver = cs.circuit_sat_verifier(proof, gens, circuit, gf, cs.PivotChoice.compressed)
t3 = time.perf_counter()

ok = all(v if not isinstance(v, dict) else all(v.values()) for v in ver.values())
print(f"\nK={K} backend={'native' if NATIVE else 'tpu'} verified={ok}")
print(f"generators {t1-t0:8.2f}s   prove {t2-t1:8.2f}s   verify {t3-t2:8.2f}s")
print(f"\n{'op':6} {'class':14} {'n':>8} {'calls':>6} {'total_s':>9} {'s/call':>9}")
acc_total = 0.0
for (name, clsname, n), (calls, total) in sorted(stats.items()):
    print(f"{name:6} {clsname:14} {n:>8} {calls:>6} {total:>9.3f} {total/calls:>9.4f}")
    acc_total += total
print(f"dispatch total: {acc_total:.2f}s")
